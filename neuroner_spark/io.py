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
