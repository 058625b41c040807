"""CoNLL token-file scan (SURVEY.md S1).

Reference parity: ``src/dataset.py :: Dataset._parse_dataset``
(≈L40–110) — space-delimited token-per-line files, first column =
token, last column = label, optional middle passthrough columns,
blank line terminates a sentence.

Spark-first shape: Spark rows are unordered, so line order is made
explicit by reading each file ``wholetext`` (one row per file — the
FileSourceScan can then never split a file across tasks and scramble
mid-file line ranges) and exploding lines with their exact in-file
position via ``posexplode``.  Sentence ids then come from a running
sum over blank-line flags (W1), and token positions from a
row_number (W5).

At 10^12 scale CoNLL text is an ingest format only — the first job
converts to the parquet token table and everything downstream reads
that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


MAX_CONLL_FILE_BYTES = 256 << 20  # wholetext = one task + one JVM string per file


def read_conll(spark: SparkSession, path: str, max_file_bytes: int = MAX_CONLL_FILE_BYTES) -> DataFrame:
    """path (file/glob/dir of CoNLL text) ->
    tokens(doc_id, sent_id, pos, token, label, extras:array<string>).

    Size bound: ``wholetext`` makes each file ONE task and ONE JVM
    string (that is what guarantees in-file line order), so a multi-GB
    single file would serialize onto one executor thread.  Files above
    ``max_file_bytes`` (default 256 MB) raise at scan time with a
    pointer to the parquet token-table path — the scale format.  CoNLL
    text is an ingest format only; the reference's own splits are
    single-digit MB per file.
    """
    # NOTE: must be the kwarg form — in PySpark 4.1 the builder form
    # ``.option("wholetext", True).text(path)`` silently ignores the
    # option and scans line-mode, which re-opens the multi-split
    # line-scramble bug wholetext exists to prevent (found when the
    # size guard below never fired: per-LINE octet_length was tiny)
    raw = (
        spark.read.text(path, wholetext=True)
        .select(F.input_file_name().alias("doc_id"), F.col("value"))
        .select(
            "doc_id",
            F.when(
                F.octet_length("value") > max_file_bytes,
                F.raise_error(
                    F.concat(
                        F.lit(f"CoNLL file over {max_file_bytes} bytes: "),
                        F.col("doc_id"),
                        F.lit(
                            " (wholetext reads one file per task; convert"
                            " large corpora to the parquet token table)"
                        ),
                    )
                ),
            )
            .otherwise(F.col("value"))
            .alias("value"),
        )
        .select(
            "doc_id",
            F.posexplode(F.split("value", "\r?\n")).alias("line_no", "value"),
        )
    )
    w_doc = Window.partitionBy("doc_id").orderBy("line_no")
    flagged = raw.withColumn("is_blank", (F.trim("value") == "").cast("int")).withColumn(
        "sent_id",
        F.sum("is_blank").over(w_doc.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    toks = flagged.filter(F.col("is_blank") == 0).withColumn(
        "parts", F.split(F.trim("value"), " +")
    )
    w_sent = Window.partitionBy("doc_id", "sent_id").orderBy("line_no")
    return toks.select(
        "doc_id",
        "sent_id",
        (F.row_number().over(w_sent) - 1).alias("pos"),
        F.element_at("parts", 1).alias("token"),
        F.element_at("parts", -1).alias("label"),
        F.when(
            F.size("parts") > 2, F.slice("parts", 2, F.size("parts") - 2)
        ).otherwise(F.array().cast("array<string>")).alias("extras"),
    )


def write_conll(
    tokens: DataFrame,
    path: str,
    label_cols: tuple[str, ...] = ("label",),
    single_file: bool = True,
) -> None:
    """K1 sink: render the token table back to CoNLL text lines
    (ordered within each output file by sentence/pos; blank-line
    sentence separators are restored by the reader's W1 inverse —
    we emit an explicit empty line row per sentence end).

    ``single_file=True`` (default) does a global sort + coalesce(1) —
    the GOLDEN-FILE mode, single-task by design, for test corpora only.
    ``single_file=False`` is the distributed sink: docs are hash-
    repartitioned and each output file is internally ordered by
    (doc_id, sent_id, pos) with whole docs co-located — no global sort,
    no single task, byte-identical content per doc either way.
    """
    line = F.concat_ws(" ", F.col("token"), *[F.col(c) for c in label_cols])
    body = tokens.select(
        "doc_id", "sent_id", F.col("pos").cast("long").alias("ord"), line.alias("value")
    )
    seps = (
        tokens.groupBy("doc_id", "sent_id")
        .agg((F.max("pos") + 1).cast("long").alias("ord"))
        .withColumn("value", F.lit(""))
    )
    both = body.unionByName(seps)
    if single_file:
        out = both.orderBy("doc_id", "sent_id", "ord").select("value")
        out.coalesce(1).write.mode("overwrite").text(path)
    else:
        out = (
            both.repartition(F.col("doc_id"))
            .sortWithinPartitions("doc_id", "sent_id", "ord")
            .select("value")
        )
        out.write.mode("overwrite").text(path)
