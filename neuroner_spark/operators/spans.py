"""Entity-span extraction from tagged tokens (SURVEY.md W4).

Reference parity: ``src/conll_to_brat.py :: conll_to_brat`` (≈L30–200)
walks tokens accumulating runs of ``B-X (I-X)*`` into BRAT entity
lines.  Spark-first shape: flag-sessionization — a running sum of
"starts a new span" flags keyed by (doc, sent) gives each maximal run
a span_id, then one groupBy collapses runs into span rows.  Two
shuffles total (window + agg), both on the same (doc_id, sent_id)
keys so Catalyst reuses the exchange.

conlleval boundary semantics (SURVEY.md §7 hard-part b): a span starts
at a token iff its tag begins a chunk given the PREVIOUS tag —
B-/S- always; I-/E- when the previous token was not a continuation of
the same type (conlleval treats an "illegal" I-X after O/other-type as
a chunk start).  This matches the Perl scorer's ``start_of_chunk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neuroner_spark.functions.tags import tag_type


def starts_chunk(lab, prv):
    """conlleval start_of_chunk(prev, cur) as a Column (BIO or BIOES)."""
    typ = tag_type(lab)
    prev_continues = prv.isNotNull() & (
        (prv == F.concat(F.lit("B-"), typ)) | (prv == F.concat(F.lit("I-"), typ))
    )
    return F.when(lab == "O", F.lit(0)).when(
        lab.startswith("B-") | lab.startswith("S-"), F.lit(1)
    ).when(
        (lab.startswith("I-") | lab.startswith("E-")) & ~prev_continues, F.lit(1)
    ).otherwise(F.lit(0))


def extract_spans(
    tokens: DataFrame,
    label_col: str = "label",
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """tokens(doc_id, sent_id, pos, token, start, end, <label_col>) ->
    spans(doc_id, sent_id, span_id, type, start, end, surface, n_tokens).

    ``surface`` is the space-joined token run (reference BRAT surface
    reconstruction); char offsets are min(start)/max(end) of the run.
    """
    keys = ["doc_id", "sent_id", *extra_keys]
    w = Window.partitionBy(*keys).orderBy("pos")
    lab = F.col(label_col)
    prv = F.lag(label_col).over(w)
    flagged = tokens.withColumn("_starts", starts_chunk(lab, prv)).withColumn(
        "_span_id",
        F.sum("_starts").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    inside = flagged.filter(lab != "O")
    # collect_list order is not guaranteed after a shuffle: aggregate
    # (pos, token) structs and sort_array before joining surfaces, and
    # take the type from the min-pos struct (deterministic).
    toks = F.sort_array(
        F.collect_list(F.struct(F.col("pos"), F.col("token"), tag_type(lab).alias("typ")))
    )
    return (
        inside.groupBy(*keys, "_span_id")
        .agg(
            F.min("start").alias("start"),
            F.max("end").alias("end"),
            toks.alias("_toks"),
            F.count("*").alias("n_tokens"),
        )
        .select(
            *keys,
            F.col("_span_id").alias("span_id"),
            F.element_at("_toks", 1)["typ"].alias("type"),
            # first TOKEN position of the span — the positional anchor
            # mention consumers (near/verb predicates) must use;
            # span_id is an ordinal, not a distance-bearing position
            F.element_at("_toks", 1)["pos"].alias("tok_pos"),
            "start",
            "end",
            F.array_join(F.transform("_toks", lambda t: t["token"]), " ").alias("surface"),
            "n_tokens",
        )
    )
