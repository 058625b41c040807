"""Bigram-LM quality scoring at corpus scale (r6): score 5M docs with
the corpus-trained LM, full-vocab vs vocab_limit, walls + plan facts
recorded — the CCNet-order gate's cost measured rather than asserted.

Input: sf0.1 documents replicated R times with per-replica token
perturbation (so the vocabulary grows with R — the shape that makes
vocab_limit matter; verbatim replicas would leave V at 31 tokens).

Writes BENCH/lm_scale.json.
Usage: python scripts/lm_scale.py [replicas] 
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def probe() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i * i % 7
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

    from pyspark.sql import functions as F

    from neuroner_spark.operators.quality_lm import bigram_lm_scores
    from neuroner_spark.session import get_spark

    spark = get_spark(
        "lm_scale", cores="32", shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    big = (
        docs.crossJoin(spark.range(reps).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(1_000_000_000))
        # per-replica suffix token grows the vocab linearly with R —
        # the regime vocab_limit exists for
        .withColumn("text", F.concat("text", F.lit(" zr"), F.col("rep").cast("string")))
        .drop("rep")
        .localCheckpoint()
    )
    n = big.count()
    out = {"n_docs": n, "legs": {}}
    for name, kw in (
        ("full_vocab", {}),
        ("vocab_limit_1000", {"vocab_limit": 1000}),
    ):
        p0 = probe()
        t0 = time.time()
        scored = bigram_lm_scores(big, **kw)
        stats = scored.agg(
            F.count("*").alias("rows"),
            F.avg("avg_nll_bits").alias("mean_bits"),
            F.sum((F.col("avg_nll_bits") > 6.0).cast("int")).alias("n_over_6"),
        ).collect()[0]
        wall = round(time.time() - t0, 3)
        out["legs"][name] = {
            "wall_s": wall,
            "docs_per_sec": round(n / wall, 1),
            "rows": int(stats["rows"]),
            "mean_bits": round(float(stats["mean_bits"]), 4),
            "n_over_6bits": int(stats["n_over_6"]),
            "probe_sec": [p0, probe()],
        }
        print(name, out["legs"][name])
        sys.stdout.flush()
    out["note"] = (
        "train+score in one plan over the same corpus; vocab_limit bounds the "
        "history/bigram count tables (broadcastable) at the cost of one extra "
        "corpus token count for the top-K set. mean_bits differs between legs "
        "by construction (UNK pooling changes the distribution)."
    )
    path = os.path.join(REPO, "BENCH", "lm_scale.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"artifact: {path}")


if __name__ == "__main__":
    main()
