"""Re-run the PLANS.md physical-plan audit: prints pushdown/pruning/
join-strategy lines from `.explain("formatted")` for the headline
operators. Usage: python scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

INTERESTING = re.compile(
    r"PushedFilters|ReadSchema|BroadcastHashJoin|SortMergeJoin|Exchange|"
    r"HashAggregate|WindowGroupLimit|ArrowEvalPython|MapInPandas|Scan parquet|"
    r"TakeOrderedAndProject|Window"
)


def show(name: str, df) -> None:
    print(f"\n=== {name} ===")
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    for line in plan.splitlines():
        if INTERESTING.search(line):
            print(line.rstrip()[:200])


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from neuroner_spark.session import get_spark

    spark = get_spark("explain_audit", cores=4, shuffle_partitions=4,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    from neuroner_spark.functions.tokenize import tokenize
    from neuroner_spark.operators.gazetteer import match_mentions
    from neuroner_spark.plans.catalog_kg import _aliases, _mention_tokens
    from neuroner_spark.plans.catalog_relational import (
        q_pricing_summary,
        q_region_acctbal,
        q_user_sessions,
    )
    from neuroner_spark.plans.catalog_text import q_dedup_jaccard

    from neuroner_spark.plans.catalog_text import q_knn_cosine

    show("pricing_summary", q_pricing_summary(spark, sf))
    show("region_acctbal", q_region_acctbal(spark, sf))
    show("user_sessions", q_user_sessions(spark, sf))
    show("dedup_jaccard", q_dedup_jaccard(spark, sf))
    show("tokenize", tokenize(spark.read.parquet(f"{sf}/documents.parquet")))
    show("match_mentions", match_mentions(_mention_tokens(spark, sf), _aliases(spark)))
    # r2 fixes: top-k must plan as TakeOrderedAndProject (never a global
    # window); vocab_freq must have no unpartitioned WindowExec
    knn = q_knn_cosine(spark, sf)
    show("knn_cosine", knn)
    plan = knn._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, "top-k lost its TakeOrderedAndProject plan"

    # training epoch = ONE Exchange (the seeded-hash repartition) above
    # the cached sentence table; orderBy(hash).repartition() would show 2
    from pyspark.sql import functions as F

    from neuroner_spark.model.train import _labeled_sentences

    toks = _mention_tokens(spark, sf).withColumn("label", F.lit("O"))
    sentences = _labeled_sentences(toks).cache()
    sentences.count()
    epoch_df = sentences.repartition(4, F.xxhash64(F.lit(43), "doc_id", "sent_id"))
    eplan = epoch_df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in eplan, "epoch input not reading the cache"
    # count Exchanges ABOVE the cache boundary only (the cached-relation
    # description re-prints its own build plan below it)
    above_cache = eplan.split("InMemoryTableScan", 1)[0]
    n_exchange = above_cache.count("Exchange")
    print(f"\n=== training epoch ===\nExchange nodes above cache: {n_exchange}")
    assert n_exchange == 1, f"epoch plan has {n_exchange} Exchanges above the cache (want 1):\n{above_cache}"
    sentences.unpersist()
    # r4: the near-dup composition must stay equi-join-only — a
    # cartesian/nested-loop anywhere in the pair path would be the
    # quadratic killer at corpus scale
    from neuroner_spark.operators.dedup import band_pairs_from_banded, minhash_banded

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = band_pairs_from_banded(minhash_banded(docs), 1000)
    show("minhash_band_pairs", pairs)
    pplan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in pplan, "pair generation planned a cartesian product"
    assert "BroadcastNestedLoopJoin" not in pplan, "pair generation planned a nested loop"
    # decontamination: eval-set side must broadcast (LeftSemi BHJ)
    from neuroner_spark.plans.catalog_text import q_dedup_contamination

    cont = q_dedup_contamination(spark, sf)
    cplan = cont._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in cplan, "contamination lost its broadcast join"
    print("\nall plan assertions passed")


if __name__ == "__main__":
    main()
