"""spark-submit entry point for the corpus-prep pipeline (exact dedup
-> near-dup components -> decontamination -> quality gates), matching
scripts/submit_pipeline.py's contract.

Package and run:
    cd /root/repo && zip -qr /tmp/neuroner_spark.zip neuroner_spark
    spark-submit --master local[8] --py-files /tmp/neuroner_spark.zip \
        scripts/submit_corpus_prep.py --docs <documents_parquet> \
        --out <out_dir> [--replicate 10] [--max-bucket 1000]

--replicate N unions N id-shifted copies of the input first (the
throughput-measurement corpus, same trick as the x10 bench tier).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--max-bucket", type=int, default=1000)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("neuroner_spark_corpus_prep").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from neuroner_spark.plans.corpus_pipeline import run_corpus_prep

    docs = spark.read.parquet(args.docs)
    if args.replicate > 1:
        copies = [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000))
            for i in range(args.replicate)
        ]
        base = copies[0]
        for c in copies[1:]:
            base = base.unionByName(c)
        docs = base
    # benchmark = a small eval slice of the corpus itself (exercises
    # the decontamination stage deterministically)
    bench = spark.read.parquet(args.docs).filter(F.col("doc_id") < 20).select("doc_id", "text")
    t0 = time.time()
    res = run_corpus_prep(
        spark,
        docs,
        args.out,
        benchmark=bench,
        resume=not args.no_resume,
        max_bucket=args.max_bucket,
    )
    n_in = docs.count()
    n_out = res["corpus"].count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "n_docs_in": n_in,
                "n_docs_out": n_out,
                "wall_s": round(wall, 3),
                "docs_per_sec": round(n_in / wall, 2),
                "stages": [
                    {k: m.get(k) for k in ("stage", "n_rows", "wall_s", "resumed")}
                    for m in res["lineage"]
                ],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
