"""BRAT standoff scan + writer (SURVEY.md S2/K2).

Reference parity:
- ``src/brat_to_conll.py :: get_entities_from_brat`` (≈L85–120): parse
  ``.ann`` entity lines ``T<n>\\tType start end\\tsurface``.
- ``src/brat_to_conll.py :: check_brat_annotation_and_text_compatibility``
  (≈L125–140): hard invariant text[start:end] == surface (P4).
- ``src/conll_to_brat.py :: output_brat`` (≈L30–200): render entity
  spans back to .ann lines (K2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_brat_text(spark: SparkSession, txt_glob: str) -> DataFrame:
    """.txt wholetext -> (doc_id, text)."""
    return spark.read.text(txt_glob, wholetext=True).select(
        F.regexp_replace(F.input_file_name(), r"\.txt$", "").alias("doc_id"),
        F.col("value").alias("text"),
    )


def read_brat_ann(spark: SparkSession, ann_glob: str) -> DataFrame:
    """.ann entity (T...) lines -> (doc_id, ann_id, type, start, end, surface)."""
    lines = spark.read.text(ann_glob).select(
        F.regexp_replace(F.input_file_name(), r"\.ann$", "").alias("doc_id"),
        F.col("value"),
    )
    ents = lines.filter(F.col("value").startswith("T"))
    parts = F.split(F.col("value"), "\t")
    meta = F.split(F.element_at(parts, 2), " ")
    return ents.select(
        "doc_id",
        F.element_at(parts, 1).alias("ann_id"),
        F.element_at(meta, 1).alias("type"),
        F.element_at(meta, 2).cast("long").alias("start"),
        F.element_at(meta, 3).cast("long").alias("end"),
        F.element_at(parts, 3).alias("surface"),
    )


def annotation_violations(texts: DataFrame, anns: DataFrame) -> DataFrame:
    """P4: rows where text[start:end] != surface (must be empty;
    the reference aborts the run on any hit)."""
    joined = anns.join(texts, "doc_id")
    cut = F.expr("substring(text, cast(start + 1 as int), cast(end - start as int))")
    return joined.filter(cut != F.col("surface")).select(
        "doc_id", "ann_id", "type", "start", "end", "surface", cut.alias("actual")
    )


def write_brat_ann(spans: DataFrame, path: str) -> None:
    """K2: spans(doc_id, span_id, type, start, end, surface) -> .ann lines
    partitioned by doc (one directory per doc_id)."""
    lines = spans.select(
        "doc_id",
        F.concat_ws(
            "\t",
            F.concat(F.lit("T"), F.col("span_id").cast("string")),
            F.concat_ws(" ", "type", F.col("start").cast("string"), F.col("end").cast("string")),
            "surface",
        ).alias("value"),
    )
    lines.write.mode("overwrite").partitionBy("doc_id").text(path)
