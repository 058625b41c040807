"""Table I/O seam (SURVEY §7 sandbox substitution: Iceberg -> Parquet).

All stage materialization goes through these two functions so the
production swap to Iceberg is THIS file only:

- parquet (default): plain directory tables, used everywhere in the
  sandbox (no Iceberg runtime jars present).
- iceberg: `df.writeTo(table).using("iceberg")` against a configured
  catalog; stage fingerprints then become snapshot ids (O(1)) instead
  of one-pass hashes. Selecting it without the runtime raises with the
  exact spark-submit flags needed.

Set NEURONER_TABLE_FORMAT=iceberg (plus a catalog config) to switch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

def _table_format() -> str:
    # read per call (not at import) so tests and spark-submit wrappers
    # can flip the format without re-importing the package
    return os.environ.get("NEURONER_TABLE_FORMAT", "parquet")


def _require_iceberg(spark: SparkSession) -> None:
    try:
        # attribute access on spark._jvm is lazy (returns a JavaPackage
        # without touching the classpath) — Class.forName actually loads
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception as e:
        raise RuntimeError(
            "NEURONER_TABLE_FORMAT=iceberg requires the Iceberg Spark "
            "runtime, e.g. spark-submit --packages "
            "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> "
            "--conf spark.sql.catalog.kg=org.apache.iceberg.spark.SparkCatalog "
            "--conf spark.sql.catalog.kg.type=hadoop "
            "--conf spark.sql.catalog.kg.warehouse=<path>"
        ) from e


def write_table(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    if _table_format() == "iceberg":
        _require_iceberg(df.sparkSession)
        table = path.replace("/", ".").strip(".")
        writer = df.writeTo(f"kg.{table}").using("iceberg")
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    if _table_format() == "iceberg":
        _require_iceberg(spark)
        return spark.read.format("iceberg").load("kg." + path.replace("/", ".").strip("."))
    return spark.read.parquet(path)


def _ddl_field_names(schema) -> list[str]:
    """Column names from a DDL string or StructType (top-level commas
    only — a comma inside ``array<...>``/``map<...>``/``struct<...>``
    does not split)."""
    if not isinstance(schema, str):
        return [f.name for f in schema.fields]
    names, depth, start = [], 0, 0
    for i, ch in enumerate(schema + ","):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            field = schema[start:i].strip()
            names.append(field.split()[0].strip("`"))
            start = i + 1
    return names


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Driver rows -> DataFrame as a true LocalRelation (Arrow path).

    ``spark.createDataFrame(list_of_tuples)`` pickles the rows into a
    Python RDD: every downstream broadcast build, join or collect then
    launches Python workers to re-evaluate it (measured: 0.86 s for a
    limit+collect and +0.32 s per broadcast-join on a 12-row frame at
    local[32]).  Routing the same rows through a pandas frame takes the
    Arrow ``createDataFrame`` path, which plans a LocalRelation —
    ``isLocal()`` is true, collects are driver-side (13 ms), broadcast
    builds never touch a Python worker, and the optimizer can fold or
    prune the relation.  Use for every driver-built frame on a query
    path (alias dictionaries, union-find results, probe key lists,
    partition offsets).  Falls back to the classic path only if the
    pandas conversion is rejected (exotic types).

    ``rows``: list of tuples (or an existing pandas DataFrame);
    ``schema``: DDL string or StructType — names are applied
    positionally, exactly like ``createDataFrame(rows, schema)``.
    """
    import pandas as pd

    if isinstance(rows, pd.DataFrame):
        pdf = rows
    else:
        pdf = pd.DataFrame(list(rows), columns=_ddl_field_names(schema))
    try:
        return spark.createDataFrame(pdf, schema)
    except Exception:
        # exotic value types pandas/Arrow refuse — keep the classic
        # row-pickling path as the correctness fallback
        return spark.createDataFrame(list(rows) if not isinstance(rows, pd.DataFrame) else rows.itertuples(index=False), schema)
