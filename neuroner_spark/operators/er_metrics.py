"""Entity-resolution quality metrics: pairwise P/R/F1 and B-cubed
P/R/F1 between a predicted clustering (e.g. ``merge_canonical_snapshots``
output) and a gold clustering — the standard ER evaluation pair
(pairwise: Menestrina et al., "Evaluating entity resolution results",
VLDB 2010; B-cubed: Bagga & Baldwin 1998).  Extends the engine's
metric family (conlleval F1, token P/R/F) to the canonicalization
stage the north rule grades on triple agreement.

Spark-first shapes (no pair materialization anywhere):
  - pairwise counts come from CLUSTER SIZES, not enumerated pairs:
    |same-pairs(A)| = sum n_c*(n_c-1)/2 over A's clusters, and the
    intersection term from the (label_a, label_g) JOINT size table —
    three keyed aggregations over an item-count-sized frame, exact,
    where naive pair enumeration is quadratic per cluster;
  - B-cubed per-item precision/recall = joint_size / cluster_size,
    computed by joining each item to its two cluster sizes and the
    joint size — three narrow-key joins + one avg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _joined(pred: DataFrame, gold: DataFrame, id_col: str) -> DataFrame:
    p = pred.select(F.col(id_col).alias("_id"), F.col(pred.columns[1]).alias("la"))
    g = gold.select(F.col(id_col).alias("_id"), F.col(gold.columns[1]).alias("lg"))
    return p.join(g, "_id")  # inner: items must appear in both


def pairwise_prf(pred: DataFrame, gold: DataFrame, id_col: str = "entity_id") -> dict:
    """Pairwise P/R/F1: over all UNORDERED ITEM PAIRS, a pair is
    'predicted' when both items share a pred label, 'true' when they
    share a gold label.  Computed from size tables — never from pairs.

    pred/gold: two-column frames (id, label).  Returns
    {'precision', 'recall', 'f1', 'n_items'} (floats; 1.0 conventions:
    empty predicted-pair set -> precision 1.0, empty true set ->
    recall 1.0)."""
    j = _joined(pred, gold, id_col)

    def same_pairs(df, *cols):
        sizes = df.groupBy(*cols).agg(F.count("*").alias("n"))
        row = sizes.agg(
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("p")
        ).collect()[0]
        return float(row["p"] or 0.0)

    n_items = j.count()
    pa = same_pairs(j, "la")
    pg = same_pairs(j, "lg")
    both = same_pairs(j, "la", "lg")
    precision = both / pa if pa else 1.0
    recall = both / pg if pg else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"precision": precision, "recall": recall, "f1": f1, "n_items": n_items}


def bcubed_prf(pred: DataFrame, gold: DataFrame, id_col: str = "entity_id") -> dict:
    """B-cubed P/R/F1: per item, precision = |pred-cluster ∩
    gold-cluster| / |pred-cluster| and recall = the same over the gold
    cluster; scores are the per-item averages.  Singleton-heavy
    clusterings are rewarded here where pairwise ignores them."""
    j = _joined(pred, gold, id_col)
    na = j.groupBy("la").agg(F.count("*").alias("n_a"))
    ng = j.groupBy("lg").agg(F.count("*").alias("n_g"))
    nj = j.groupBy("la", "lg").agg(F.count("*").alias("n_j"))
    per_item = (
        j.join(na, "la").join(ng, "lg").join(nj, ["la", "lg"])
        .select(
            (F.col("n_j") / F.col("n_a")).alias("p_i"),
            (F.col("n_j") / F.col("n_g")).alias("r_i"),
        )
    )
    row = per_item.agg(
        F.avg("p_i").alias("p"), F.avg("r_i").alias("r"), F.count("*").alias("n")
    ).collect()[0]
    p, r = float(row["p"] or 0.0), float(row["r"] or 0.0)
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1, "n_items": int(row["n"])}
