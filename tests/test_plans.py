"""Physical-plan regression tests: the plan properties PLANS.md claims
are asserted here so a refactor cannot silently reintroduce a
scale-killer (single-partition window, lost pushdown, flipped
broadcast side, double epoch shuffle)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_topk_plans_take_ordered(spark):
    from neuroner_spark.plans.catalog_text import q_knn_cosine

    plan = _plan(q_knn_cosine(spark, SF))
    assert "TakeOrderedAndProject" in plan
    # the rank window over the k survivors must be PARTITIONED (an
    # unpartitioned WindowExec would move everything to one partition)
    wins = [l for l in plan.splitlines() if "windowspecdefinition(" in l]
    # the pmod partition key may be pre-projected to a _wN bound ref;
    # either way the first windowspecdefinition arg is a PARTITION
    # column, not a sort spec
    assert wins and all(("pmod(" in l) or ("windowspecdefinition(_w" in l) for l in wins), wins


def test_vocab_freq_has_no_global_window(spark):
    from neuroner_spark.plans.catalog_relational import q_vocab_freq

    plan = _plan(q_vocab_freq(spark, SF))
    # two-phase id assignment: the rank window is PARTITIONED by the
    # range-partition id (the range shuffle itself sits behind the
    # localCheckpoint, visible only as Scan ExistingRDD); there is no
    # unpartitioned windowspecdefinition anywhere in the final plan
    assert "Scan ExistingRDD" in plan  # checkpoint boundary exists
    wins = [l for l in plan.splitlines() if "windowspecdefinition(" in l]
    assert wins and all("_pid#" in l for l in wins), wins


def test_pricing_summary_pushdown_and_pruning(spark):
    from neuroner_spark.plans.catalog_relational import q_pricing_summary

    plan = _plan(q_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # column pruning: the 16-column lineitem scan reads only what the
    # aggregate needs
    read = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert read.count(",") <= 6, read


def test_dim_joins_are_broadcast(spark):
    from neuroner_spark.plans.catalog_relational import q_region_acctbal

    plan = _plan(q_region_acctbal(spark, SF))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_training_epoch_single_exchange(spark):
    from neuroner_spark.model.train import _labeled_sentences
    from neuroner_spark.plans.catalog_kg import _mention_tokens

    toks = _mention_tokens(spark, SF).withColumn("label", F.lit("O"))
    sentences = _labeled_sentences(toks).cache()
    sentences.count()
    epoch_df = sentences.repartition(4, F.xxhash64(F.lit(43), "doc_id", "sent_id"))
    plan = _plan(epoch_df)
    assert "InMemoryTableScan" in plan
    above_cache = plan.split("InMemoryTableScan", 1)[0]
    assert above_cache.count("Exchange") == 1, above_cache
    sentences.unpersist()


def test_tokenize_projects_before_arrow(spark):
    from neuroner_spark.functions.tokenize import tokenize

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(tokenize(docs))
    read = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    # only (doc_id, text) of the 5 document columns crosses into Arrow
    assert "doc_id" in read and "text" in read and "lang" not in read, read
