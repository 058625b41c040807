"""Milestone-0 flagship query (SURVEY.md §7 M0): documents -> normalize
(P2) -> tokenize (F1/W5) -> gazetteer mention match (J8 broadcast) ->
sentence co-occurrence triples.

The built-in gazetteer below maps the driver ``documents`` corpus's
domain terms to synthetic entity ids so the pipeline has true
positives on /root/testdata (the full alias_dict fixture is used by
the KG stages; this tiny dict is only the M0 smoke surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neuroner_spark.functions.normalize import normalize_whitespace
from neuroner_spark.functions.tokenize import tokenize
from neuroner_spark.operators.gazetteer import match_mentions

# (alias, alias_norm, entity_id, canonical_name, prior)
_BUILTIN_ALIASES = [
    ("spark", "spark", 1, "Apache Spark", 1.0),
    ("hash join", "hash join", 2, "Hash Join", 1.0),
    ("merge join", "merge join", 3, "Merge Join", 1.0),
    ("table scan", "table scan", 4, "Table Scan", 1.0),
    ("window", "window", 5, "Window Function", 1.0),
    ("stream", "stream", 6, "Stream", 1.0),
    ("vector", "vector", 7, "Vector", 1.0),
    ("customer", "customer", 8, "Customer", 1.0),
    ("query plan", "query plan", 9, "Query Plan", 1.0),
    ("sort", "sort", 10, "Sort", 1.0),
]

_ALIAS_SCHEMA = T.StructType(
    [
        T.StructField("alias", T.StringType(), False),
        T.StructField("alias_norm", T.StringType(), False),
        T.StructField("entity_id", T.LongType(), False),
        T.StructField("canonical_name", T.StringType(), False),
        T.StructField("prior", T.DoubleType(), False),
    ]
)


def builtin_alias_dict(spark: SparkSession) -> DataFrame:
    from neuroner_spark.io import local_df

    return local_df(spark, _BUILTIN_ALIASES, _ALIAS_SCHEMA)


def mentions_from_documents(spark: SparkSession, docs: DataFrame, alias_dict: DataFrame | None = None) -> DataFrame:
    """documents(doc_id, text, ...) -> linked mentions."""
    if alias_dict is None:
        alias_dict = builtin_alias_dict(spark)
    normalized = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        normalize_whitespace(F.col("text")).alias("text"),
    )
    tokens = tokenize(normalized)
    mentions = match_mentions(tokens, alias_dict)
    links = alias_dict.select(
        F.col("alias_norm"), "entity_id", "canonical_name", "prior"
    )
    return mentions.join(
        F.broadcast(links), mentions.surface_norm == links.alias_norm, "inner"
    ).drop("alias_norm")


def cooccurrence_triples(mentions: DataFrame) -> DataFrame:
    """mentions -> (subj, pred, obj, doc_id, sent_id) with
    pred='co_occurs_with'; subj<obj to dedupe symmetric pairs."""
    a = mentions.select("doc_id", "sent_id", F.col("entity_id").alias("subj"))
    b = mentions.select("doc_id", "sent_id", F.col("entity_id").alias("obj"))
    pairs = (
        a.join(b, ["doc_id", "sent_id"])
        .filter(F.col("subj") < F.col("obj"))
        .distinct()
        .withColumn("pred", F.lit("co_occurs_with"))
    )
    return pairs.select("subj", "pred", "obj", "doc_id", "sent_id")


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Flagship end-to-end query: mention extraction + co-occurrence
    triple counts over the documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mentions = mentions_from_documents(spark, docs)
    triples = cooccurrence_triples(mentions)
    return (
        triples.groupBy("subj", "pred", "obj")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "subj", "obj")
    )
