"""Evaluation metrics as relational aggregations (SURVEY.md A3–A6).

Reference parity:
- A5 ``src/conlleval`` (Perl, ~315 LoC) invoked from
  ``src/evaluate.py :: evaluate_model`` — phrase-level per-type and
  overall precision/recall/FB1.  Re-expressed as: span extraction on
  gold and pred (operators/spans.py, conlleval chunk-start semantics)
  → full outer join on (doc, sent, start, end, type) → conditional
  counts.  No Perl, no subprocess, fully distributed.
- A3 confusion matrix = groupBy(gold, pred).count().
- A4 per-class token P/R/F1 with the three eval modes of
  ``src/evaluate.py :: remap_labels`` (bio | token | binary).
- A6 token accuracy.

All metrics are exact (no sampling); at 10^12 rows they are one
shuffle each on small key spaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neuroner_spark.functions.tags import tag_type
from neuroner_spark.operators.spans import extract_spans


def _prf(tp, fp, fn):
    precision = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    recall = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    f1 = F.when(
        (precision + recall) > 0, 2 * precision * recall / (precision + recall)
    ).otherwise(F.lit(0.0))
    return precision, recall, f1


def conlleval_f1(
    tokens: DataFrame, gold_col: str = "gold", pred_col: str = "pred"
) -> DataFrame:
    """A5: phrase-level P/R/F1 per entity type plus an 'ALL' row.

    tokens: (doc_id, sent_id, pos, token, start, end, <gold>, <pred>).
    Output: (type, tp, fp, fn, precision, recall, f1) — floats rounded
    to 6 decimals for cross-engine determinism.

    Plan shape (r7): ONE span-extraction pass over a side-exploded
    token frame (the old shape ran two full extraction pipelines, one
    per label column, and then a full-outer join).  A span occurrence
    key (doc, sent, start, end, type) is unique within each side (token
    runs of one sentence are disjoint in pos, so their char offsets
    can't coincide — the same invariant the old full-outer join relied
    on to stay 1:1), so the gold-vs-pred match collapses to ONE keyed
    aggregation with side flags — no join at all.  The 'ALL' row is
    derived from the tiny per-type frame (every matched key has exactly
    one type, so per-type counts sum exactly to the overall counts),
    instead of re-aggregating the matched subtree a second time.
    Exchanges: 8x2 subtree copies -> 2 (token window + per-type key);
    the match aggregation runs exchange-free on the window's doc-hash
    partitioning.
    """
    sides = tokens.select(
        "doc_id",
        "sent_id",
        "pos",
        "token",
        "start",
        "end",
        F.explode(
            F.array(
                F.struct(F.lit("g").alias("side"), F.col(gold_col).alias("lab")),
                F.struct(F.lit("p").alias("side"), F.col(pred_col).alias("lab")),
            )
        ).alias("_sl"),
    ).select(
        "doc_id",
        "sent_id",
        "pos",
        "token",
        "start",
        "end",
        F.col("_sl.side").alias("_side"),
        F.col("_sl.lab").alias("_lab"),
    )
    spans = extract_spans(sides, label_col="_lab", extra_keys=("_side",)).select(
        "doc_id", "sent_id", "start", "end", "type", "_side"
    )
    matched = spans.groupBy("doc_id", "sent_id", "start", "end", "type").agg(
        F.max(F.col("_side") == "g").alias("_g"),
        F.max(F.col("_side") == "p").alias("_p"),
    )
    # per-type AND the 'ALL' grand total from ONE rollup aggregation —
    # a separate overall branch (groupBy + union, or agg over per_type)
    # duplicates the whole extraction subtree in the plan and re-runs
    # every window/aggregation above the shuffle twice (measured: the
    # two-branch shape was SLOWER than the r6 double-extraction).
    # `type` is never NULL (tag_type of a non-O label), so the NULL
    # grouping row is unambiguously the grand total.  Edge contract:
    # on a corpus with zero gold AND zero pred spans this returns an
    # EMPTY frame (the old shape returned one ALL row with NULL
    # counts); span-bearing input is byte-identical (oracle-checked).
    counts = matched.rollup("type").agg(
        F.sum(F.when(F.col("_g") & F.col("_p"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("_g") & F.col("_p"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("_g") & ~F.col("_p"), 1).otherwise(0)).alias("fn"),
    ).withColumn("type", F.coalesce(F.col("type"), F.lit("ALL")))
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    precision, recall, f1 = _prf(tp, fp, fn)
    return counts.select(
        "type",
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def confusion_matrix(tokens: DataFrame, gold_col: str = "gold", pred_col: str = "pred") -> DataFrame:
    """A3: (gold, pred, n) counts."""
    return (
        tokens.groupBy(F.col(gold_col).alias("gold"), F.col(pred_col).alias("pred"))
        .agg(F.count("*").alias("n"))
    )


def remap_labels(col, mode: str):
    """A4 eval modes (reference ``src/evaluate.py :: remap_labels``):
    bio -> unchanged; token -> strip BIOES prefix; binary -> ENT/O."""
    if mode == "bio":
        return col
    if mode == "token":
        return tag_type(col)
    if mode == "binary":
        return F.when(col == "O", F.lit("O")).otherwise(F.lit("ENT"))
    raise ValueError(mode)


def token_prf(tokens: DataFrame, gold_col: str = "gold", pred_col: str = "pred", mode: str = "token") -> DataFrame:
    """A4: per-class token-level P/R/F1 under an eval mode."""
    df = tokens.select(
        remap_labels(F.col(gold_col), mode).alias("gold"),
        remap_labels(F.col(pred_col), mode).alias("pred"),
    )
    # One big-data pass -> tiny confusion matrix; per-class counts are
    # derived from it (no class × token blow-up at scale).
    conf = df.groupBy("gold", "pred").agg(F.count("*").alias("n"))
    as_gold = conf.groupBy(F.col("gold").alias("cls")).agg(
        F.sum(F.when(F.col("pred") == F.col("gold"), F.col("n")).otherwise(0)).alias("tp_g"),
        F.sum(F.when(F.col("pred") != F.col("gold"), F.col("n")).otherwise(0)).alias("fn"),
    )
    as_pred = conf.groupBy(F.col("pred").alias("cls")).agg(
        F.sum(F.when(F.col("gold") != F.col("pred"), F.col("n")).otherwise(0)).alias("fp"),
    )
    per_cls = (
        as_gold.join(as_pred, "cls", "full_outer")
        .filter(F.col("cls") != "O")
        .select(
            "cls",
            F.coalesce("tp_g", F.lit(0)).alias("tp"),
            F.coalesce("fp", F.lit(0)).alias("fp"),
            F.coalesce("fn", F.lit(0)).alias("fn"),
        )
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    precision, recall, f1 = _prf(tp, fp, fn)
    return per_cls.select(
        "cls",
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def token_accuracy(tokens: DataFrame, gold_col: str = "gold", pred_col: str = "pred") -> DataFrame:
    """A6: overall token accuracy."""
    return tokens.agg(
        F.round(F.avg((F.col(gold_col) == F.col(pred_col)).cast("double")), 6).alias("accuracy"),
        F.count("*").alias("n_tokens"),
    )


# --- F5: conlleval report format (render + parse) ----------------------
# The reference shells out to the Perl conlleval script and PARSES its
# text report (src/evaluate.py :: remap_labels / conll output handling).
# A5 above computes the metrics natively; these two functions close the
# format loop: render our frames into the canonical conlleval report,
# and parse any stored conlleval report (e.g. the reference's archived
# eval logs) back into rows for frame-level comparison.

def render_conlleval_report(f1_rows: list, accuracy: float, n_tokens: int) -> str:
    """Rows from ``conlleval_f1`` (dicts/Rows with type/tp/fp/fn/
    precision/recall/f1) + ``token_accuracy`` -> the canonical
    conlleval text report (same layout the Perl script prints)."""
    by_type = {r["type"]: r for r in f1_rows}
    if "ALL" not in by_type:
        raise ValueError(
            "render_conlleval_report needs the 'ALL' summary row from "
            "conlleval_f1; got types "
            f"{sorted(by_type)} (empty eval set? run conlleval_f1 on a "
            "non-empty gold/pred join first)"
        )
    overall = by_type.pop("ALL")
    n_gold = int(overall["tp"] + overall["fn"])
    n_found = int(overall["tp"] + overall["fp"])
    lines = [
        f"processed {n_tokens} tokens with {n_gold} phrases; "
        f"found: {n_found} phrases; correct: {int(overall['tp'])}.",
        (
            f"accuracy: {100 * accuracy:6.2f}%; "
            f"precision: {100 * overall['precision']:6.2f}%; "
            f"recall: {100 * overall['recall']:6.2f}%; "
            f"FB1: {100 * overall['f1']:6.2f}"
        ),
    ]
    for t in sorted(by_type):
        r = by_type[t]
        found = int(r["tp"] + r["fp"])
        lines.append(
            f"{t:>17}: "
            f"precision: {100 * r['precision']:6.2f}%; "
            f"recall: {100 * r['recall']:6.2f}%; "
            f"FB1: {100 * r['f1']:6.2f}  {found}"
        )
    return "\n".join(lines) + "\n"


def parse_conlleval_report(text: str) -> dict:
    """Parse a conlleval text report (ours or the Perl script's) ->
    {'n_tokens', 'n_phrases', 'n_found', 'n_correct', 'accuracy',
    'types': {type: {'precision', 'recall', 'f1', 'found'}}, plus an
    'ALL' entry in types}.  Percentages return as fractions."""
    import re as _re

    header = _re.search(
        r"processed\s+(\d+)\s+tokens\s+with\s+(\d+)\s+phrases;\s*"
        r"found:\s*(\d+)\s+phrases;\s*correct:\s*(\d+)",
        text,
    )
    if not header:
        raise ValueError("not a conlleval report: missing 'processed ... tokens' header")
    out = {
        "n_tokens": int(header.group(1)),
        "n_phrases": int(header.group(2)),
        "n_found": int(header.group(3)),
        "n_correct": int(header.group(4)),
        "types": {},
    }
    acc = _re.search(r"accuracy:\s*([\d.]+)%", text)
    out["accuracy"] = round(float(acc.group(1)) / 100.0, 6) if acc else None
    line_re = _re.compile(
        r"^\s*(?:(\S+):\s*)?precision:\s*([\d.]+)%;\s*recall:\s*([\d.]+)%;\s*"
        r"FB1:\s*([\d.]+)(?:\s+(\d+))?\s*$"
    )
    for line in text.splitlines():
        # the overall line carries accuracy before precision; per-type
        # lines lead with the type name
        stripped = (
            _re.sub(r"^.*accuracy:\s*[\d.]+%;\s*", "", line)
            if "accuracy:" in line
            else line
        )
        m = line_re.match(stripped)
        if not m:
            continue
        name = m.group(1) or "ALL"
        out["types"][name] = {
            "precision": round(float(m.group(2)) / 100.0, 6),
            "recall": round(float(m.group(3)) / 100.0, 6),
            "f1": round(float(m.group(4)) / 100.0, 6),
            "found": int(m.group(5)) if m.group(5) else None,
        }
    return out
