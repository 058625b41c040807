"""Quiet-host A/B for the r3 bench drifts (VERDICT r3 'what's wrong'
#1/#2): simhash old exploded form vs the r3 one-aggregation form, and
the dedup_jaccard creep, at sf0.1 and at 10x scale (past the ~0.3-0.7s
per-job scheduler noise floor).  Run ALONE on an idle host; results go
into BENCH/BASELINE.md round-4 notes.

Usage: python scripts/ab_simhash.py [repeats]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from neuroner_spark.functions.text_analysis import hash64, ws_tokens


def simhash_exploded(docs, bits=16):
    """The PRE-r3 shape: one row per (doc, token, bit) — bits x the
    shuffle volume of the one-agg form; kept here only as the A/B
    baseline."""
    toks = docs.select(
        F.col("doc_id"),
        F.explode(ws_tokens(F.lower(F.col("text")))).alias("token"),
    ).select("doc_id", hash64(F.col("token")).alias("th"))
    bit_rows = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        "th",
    ).select(
        "doc_id",
        "bit",
        (F.expr("shiftright(th, bit)").bitwiseAND(F.lit(1)) * 2 - 1).alias("s"),
    )
    per_bit = bit_rows.groupBy("doc_id", "bit").agg(F.sum("s").alias("s"))
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def best_of(fn, repeats):
    best = None
    for _ in range(repeats):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from neuroner_spark.operators.dedup import ngram_jaccard_pairs, simhash
    from neuroner_spark.session import get_spark

    spark = get_spark(
        "ab_simhash",
        cores="32",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    x10_dir = tempfile.mkdtemp(prefix="ab_x10_")
    copies = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000))
        for i in range(10)
    ]
    scaled = copies[0]
    for c in copies[1:]:
        scaled = scaled.unionByName(c)
    scaled.write.mode("overwrite").parquet(f"{x10_dir}/documents.parquet")
    docs10 = spark.read.parquet(f"{x10_dir}/documents.parquet")

    # value parity first: the two forms must agree bit-for-bit
    a = simhash(docs).orderBy("doc_id").collect()
    b = simhash_exploded(docs).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["simhash"]) for r in a] == [
        (r["doc_id"], r["simhash"]) for r in b
    ], "A/B forms disagree"

    out = {"repeats": repeats, "sf_dir": sf_dir}
    out["simhash_oneagg_sf01"] = best_of(lambda: simhash(docs).count(), repeats)
    out["simhash_exploded_sf01"] = best_of(lambda: simhash_exploded(docs).count(), repeats)
    out["simhash_oneagg_x10"] = best_of(lambda: simhash(docs10).count(), repeats)
    out["simhash_exploded_x10"] = best_of(lambda: simhash_exploded(docs10).count(), repeats)
    out["dedup_jaccard_sf01"] = best_of(
        lambda: ngram_jaccard_pairs(docs, n=3, threshold=0.05, max_df=10000).count(), repeats
    )
    out["dedup_jaccard_x10"] = best_of(
        lambda: ngram_jaccard_pairs(docs10, n=3, threshold=0.05, max_df=10000).count(),
        repeats,
    )
    shutil.rmtree(x10_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
