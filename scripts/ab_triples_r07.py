"""A/B the round-7 triples_from_linked repartition variants.

Usage: python scripts/ab_triples_r07.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from neuroner_spark.session import get_spark

    spark = get_spark(
        "ab_triples",
        cores=cpus,
        shuffle_partitions=max(int(cpus), 8) if cpus != "*" else 32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    from pyspark.sql import functions as F

    import pandas as _pd

    n_workers = 32 if cpus == "*" else int(cpus)
    spark.range(n_workers * 2).repartition(n_workers * 2).mapInPandas(
        lambda it: (_pd.DataFrame({"x": [1]}) for _ in it), "x int"
    ).count()

    from neuroner_spark.functions.tokenize import tokenize
    from neuroner_spark.operators.gazetteer import match_mentions
    from neuroner_spark.operators.linking import link_mentions
    from neuroner_spark.plans.catalog_kg import _aliases
    from neuroner_spark.plans.kg_pipeline import canonical_map, triples_from_linked

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()
    aliases = _aliases(spark)
    d = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.col("text"),
    )
    tokens = tokenize(d.withColumnRenamed("url", "doc_id"))
    mentions = match_mentions(tokens, aliases)
    linked = link_mentions(mentions, aliases, use_fuzzy=False)
    canon = canonical_map(aliases)

    import neuroner_spark.plans.kg_pipeline as kgp

    def run(label, repartition_mode):
        kgp._R07_REPARTITION = repartition_mode
        samples = []
        n = None
        for _ in range(4):
            t0 = time.time()
            n = triples_from_linked(linked, canon, d).count()
            samples.append(round(time.time() - t0, 3))
        print(f"{label:24s} n={n} best={min(samples):.3f} samples={samples}")

    run("repartition_doc", True)
    run("no_repartition", False)
    run("repartition_doc(2)", True)
    run("no_repartition(2)", False)


if __name__ == "__main__":
    main()
