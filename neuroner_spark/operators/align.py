"""Token–annotation span alignment (SURVEY.md J5 — the reference's
``src/brat_to_conll.py :: brat_to_conll`` ≈L145–220): assign BIO labels
to tokens from char-offset entity annotations.

Spark-first shape: a RANGE JOIN with a doc-equi anchor — the doc_id
equality keeps it a hash join with a per-doc interval predicate (never
an O(n²) cross product); a window over the joined tokens marks each
entity's first token B- and the rest I-. Tokens covered by no
annotation (or straddling one — the reference warns and drops those)
stay O.

Combined with sources/brat.py and sources/conll.py this reproduces the
reference's BRAT -> CoNLL preparation path end-to-end; the inverse
(CoNLL tags -> BRAT spans) is operators/spans.py + write_brat_ann.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_tokens_from_annotations(tokens: DataFrame, annotations: DataFrame) -> DataFrame:
    """tokens(doc_id, sent_id, pos, token, start, end) ×
    annotations(doc_id, ann_id, type, start, end) ->
    tokens + label (BIO).

    A token belongs to an annotation iff fully contained in its char
    span. Overlapping annotations resolve to the longest (then the
    earliest ann_id) — deterministic, mirrors the reference's
    first-match behavior on its sorted annotation list.
    """
    ann = annotations.select(
        "doc_id",
        F.col("ann_id"),
        F.col("type").alias("_type"),
        F.col("start").alias("a_start"),
        F.col("end").alias("a_end"),
    )
    joined = tokens.join(
        ann,
        (tokens.doc_id == ann.doc_id)
        & (tokens.start >= ann.a_start)
        & (tokens.end <= ann.a_end),
        "left",
    ).drop(ann.doc_id)
    # longest annotation wins per token; tie -> earliest ann_id
    w_tok = Window.partitionBy("doc_id", "sent_id", "pos").orderBy(
        F.desc(F.col("a_end") - F.col("a_start")), F.asc("ann_id")
    )
    best = (
        joined.withColumn("_rn", F.row_number().over(w_tok))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # first covered token of each annotation -> B-, others -> I-
    w_ann = Window.partitionBy("doc_id", "ann_id").orderBy("start")
    first_tok = F.row_number().over(w_ann)
    labeled = best.withColumn(
        "label",
        F.when(F.col("ann_id").isNull(), F.lit("O"))
        .when(first_tok == 1, F.concat(F.lit("B-"), F.col("_type")))
        .otherwise(F.concat(F.lit("I-"), F.col("_type"))),
    )
    return labeled.select(
        "doc_id", "sent_id", "pos", "token", "start", "end", "label"
    )
