"""Measure the training all-reduce fan-in: bytes per gradient row.

train_full_network collects ONE row per partition per epoch
(GRAD_SCHEMA: flat dense grad + sparse embedding ids/values). At 1000
executors the driver receives 1000 such rows — this script measures
how big each row actually is at sf0.1 so the two-level-aggregation
decision (VERDICT r2 item 7) is a number, not a guess.

Run: python scripts/measure_grad_rows.py  [sf_dir]
"""

from __future__ import annotations

import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from neuroner_spark.functions.tokenize import tokenize  # noqa: E402
from neuroner_spark.model.train import (  # noqa: E402
    GRAD_SCHEMA,
    _labeled_sentences,
    _make_full_grad_fn,
)
from neuroner_spark.model.weights import LABELS, make_bundle  # noqa: E402
from neuroner_spark.session import get_spark  # noqa: E402


def measure(spark, tokens, bundle, train_embeddings, train_chars, loss="crf"):
    sentences = _labeled_sentences(tokens)
    shuffled = sentences.repartition(
        spark.sparkContext.defaultParallelism,
        F.xxhash64(F.lit(42), "doc_id", "sent_id"),
    )
    bc = spark.sparkContext.broadcast(bundle)
    label_to_idx = {l: i for i, l in enumerate(LABELS)}
    rows = shuffled.mapInPandas(
        _make_full_grad_fn(
            bc, label_to_idx, train_embeddings, loss, train_chars=train_chars
        ),
        GRAD_SCHEMA,
    ).collect()
    bc.destroy()
    sizes = []
    for r in rows:
        dense = len(r["grad"]) * 8
        sparse = (len(r["emb_ids"] or []) + len(r["emb_grad"] or [])) * 8
        sizes.append((dense + sparse, dense, sparse))
    sizes.sort(reverse=True)
    tot = np.array([s[0] for s in sizes], dtype=np.float64)
    return {
        "n_rows": len(rows),
        "dense_mb": sizes[0][1] / 1e6,
        "sparse_max_mb": max(s[2] for s in sizes) / 1e6,
        "row_max_mb": tot.max() / 1e6,
        "row_mean_mb": tot.mean() / 1e6,
        "driver_total_mb": tot.sum() / 1e6,
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("grad-rows", cores=32, shuffle_partitions=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    tokens = tokenize(docs).withColumn("label", F.lit("O")).cache()
    n_tok = tokens.count()
    uniq = tokens.select("token").distinct().count()
    print(f"corpus: {n_tok} tokens, {uniq} distinct, {sf_dir}")
    for vocab, tag in ((1 << 16, "hashed-2^16"), (None, "real-vocab")):
        if vocab is None:
            vr = [r["token"] for r in tokens.select("token").distinct().collect()]
            bundle = make_bundle({t: i + 1 for i, t in enumerate(sorted(vr))}, seed=42)
        else:
            bundle = make_bundle(vocab, seed=42)
        stats = measure(spark, tokens, bundle, train_embeddings=True, train_chars=True)
        print(f"[{tag}] vocab_size={bundle['vocab_size']}: " + ", ".join(
            f"{k}={v:.3f}" if isinstance(v, float) else f"{k}={v}" for k, v in stats.items()
        ))


if __name__ == "__main__":
    main()
