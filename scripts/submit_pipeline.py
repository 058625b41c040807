"""spark-submit entry point for the KG pipeline (north_rule: run via
``spark-submit --py-files``).

Package and run:
    cd /root/repo && zip -qr /tmp/neuroner_spark.zip neuroner_spark
    spark-submit --master local[8] --py-files /tmp/neuroner_spark.zip \
        scripts/submit_pipeline.py --pages <pages_parquet_dir_or_file> \
        --out <out_dir> [--use-fuzzy]

On a cluster, swap --master for the cluster manager; nothing else
changes (the engine holds no local-mode assumptions).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages parquet path (url, warc_ts, html, text, lang)")
    ap.add_argument("--out", required=True, help="output dir for stage tables + lineage")
    ap.add_argument("--use-fuzzy", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("neuroner_spark_kg").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from neuroner_spark.fixtures.gen import alias_df
    from neuroner_spark.plans.kg_pipeline import run_pipeline

    pages = spark.read.parquet(args.pages)
    t0 = time.time()
    res = run_pipeline(
        spark,
        pages,
        alias_df(spark),
        args.out,
        resume=not args.no_resume,
        use_fuzzy=args.use_fuzzy,
    )
    n_triples = res["triples"].count()
    n_pages = pages.count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "n_pages": n_pages,
                "n_triples": n_triples,
                "wall_s": round(wall, 3),
                "docs_per_sec": round(n_pages / wall, 2),
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
