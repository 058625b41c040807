"""Capture `.explain("formatted")` for every headline bench query into
plans/r07/<name>_<tag>.txt (tag = before/after).  Measurement-only
helper for the round-7 optimization deliverables.

Usage: python scripts/capture_plans_r07.py <tag> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def build_queries(spark, sf_dir):
    from pyspark.sql import functions as F

    from neuroner_spark.functions.tokenize import tokenize
    from neuroner_spark.model.tagger import tag_tokens
    from neuroner_spark.model.weights import make_bundle
    from neuroner_spark.operators.gazetteer import match_mentions
    from neuroner_spark.operators.linking import link_mentions
    from neuroner_spark.plans import catalog_ner, catalog_relational, catalog_text
    from neuroner_spark.plans.catalog_kg import _aliases
    from neuroner_spark.plans.kg_pipeline import canonical_map, triples_from_linked

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def kg_df():
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
        return triples_from_linked(linked, canon, d)

    def tagger_df():
        tokens = tokenize(docs.select(F.col("doc_id").cast("string").alias("doc_id"), "text"))
        bundle = make_bundle(1 << 16, seed=42)
        return tag_tokens(spark, tokens, bundle)

    return {
        "kg_pipeline": kg_df,
        "neural_tagger": tagger_df,
        "pricing_summary": lambda: catalog_relational.QUERIES["pricing_summary"][0](spark, sf_dir),
        "user_sessions": lambda: catalog_relational.QUERIES["user_sessions"][0](spark, sf_dir),
        "top3_orders_per_customer": lambda: catalog_relational.QUERIES["top3_orders_per_customer"][0](spark, sf_dir),
        "dedup_jaccard": lambda: catalog_text.QUERIES["dedup_jaccard"][0](spark, sf_dir),
        "minhash_signatures": lambda: catalog_text.QUERIES["minhash_signatures"][0](spark, sf_dir),
        "simhash": lambda: catalog_text.QUERIES["simhash"][0](spark, sf_dir),
        "knn_cosine": lambda: catalog_text.q_knn_cosine(spark, sf_dir),
        "conlleval_f1": lambda: catalog_ner.QUERIES["conlleval_f1"][0](spark, sf_dir),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)

    from neuroner_spark.session import get_spark

    spark = get_spark(
        "capture_plans_r07",
        cores="8",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for name, build in build_queries(spark, sf_dir).items():
        df = build()
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name:28s} -> {path}  (Exchange mentions: {n_ex})")


if __name__ == "__main__":
    main()
