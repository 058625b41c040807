"""Entity linking: candidate generation + deterministic scoring
(SURVEY.md J8/J9 and the north_rule linking stage).

- J8 exact candidates: broadcast hash join mention.surface_norm =
  alias.alias_norm (dictionary is always the small side).
- J9 fuzzy candidates: MinHash-LSH blocking over char-3-gram count
  vectors (pyspark.ml), applied ONLY to mentions with no exact match
  (left anti first — at web scale the exact join resolves the vast
  majority, so the expensive LSH path sees a small residue).
- Scoring: deterministic prior × doc-coherence; winner per mention via
  one window rank (ties broken by entity_id for reproducibility).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_candidates(mentions: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """J8: (mention cols..., entity_id, canonical_name, prior, method='exact')."""
    # rename the dictionary key before joining: the mentions frame is a
    # join product that may itself carry an alias_norm lineage, and
    # name-collisions make F.col references ambiguous
    links = alias_dict.select(
        F.col("alias_norm").alias("_alias_norm"), "entity_id", "canonical_name", "prior"
    )
    return (
        mentions.join(
            F.broadcast(links), F.col("surface_norm") == F.col("_alias_norm"), "inner"
        )
        .drop("_alias_norm")
        .withColumn("method", F.lit("exact"))
    )


def fuzzy_candidates(
    mentions: DataFrame,
    alias_dict: DataFrame,
    jaccard_max_dist: float = 0.5,
) -> DataFrame:
    """J9: MinHash-LSH blocking for mentions with NO exact match.

    char-3-gram -> CountVectorizer(binary) -> MinHashLSH
    approxSimilarityJoin on (1 - jaccard) distance.
    """
    from pyspark.ml.feature import CountVectorizer, MinHashLSH, RegexTokenizer

    unmatched = mentions.join(
        F.broadcast(alias_dict.select("alias_norm").distinct()),
        mentions.surface_norm == F.col("alias_norm"),
        "left_anti",
    )
    if unmatched.isEmpty():
        return None

    # char-3-gram via native expr (regexp can't overlap; use transform over offsets)
    def with_grams(df, col):
        padded = F.concat(F.lit("^^"), F.col(col), F.lit("$$"))
        n = F.length(padded) - 2
        return df.withColumn(
            "grams",
            F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(padded, i, 3)),
        )

    aliases = with_grams(
        alias_dict.select("alias_norm", "entity_id", "canonical_name", "prior").distinct(),
        "alias_norm",
    )
    cands = with_grams(unmatched.select("surface_norm").distinct(), "surface_norm")
    # MinHashLSH requires >=1 non-zero entry: empty-gram rows dropped
    # up front (every non-empty gram list is in the fitted vocabulary,
    # so its vector is non-zero by construction — no row-level check).
    aliases = aliases.filter(F.size("grams") > 0)
    cands = cands.filter(F.size("grams") > 0)
    cv = CountVectorizer(inputCol="grams", outputCol="vec", binary=True, minDF=1.0)
    model = cv.fit(aliases.select("grams").union(cands.select("grams")))
    a_vec = model.transform(aliases)
    c_vec = model.transform(cands)
    lsh = MinHashLSH(inputCol="vec", outputCol="hashes", numHashTables=4, seed=42)
    lsh_model = lsh.fit(a_vec)
    joined = lsh_model.approxSimilarityJoin(c_vec, a_vec, jaccard_max_dist, distCol="jaccard_dist")
    pairs = joined.select(
        F.col("datasetA.surface_norm").alias("surface_norm"),
        F.col("datasetB.entity_id").alias("entity_id"),
        F.col("datasetB.canonical_name").alias("canonical_name"),
        F.col("datasetB.prior").alias("prior"),
        F.col("jaccard_dist"),
    )
    return (
        unmatched.join(pairs, "surface_norm")
        .withColumn("method", F.lit("fuzzy"))
        .withColumn("prior", F.col("prior") * (1.0 - F.col("jaccard_dist")))
        .drop("jaccard_dist")
    )


def link_mentions(mentions: DataFrame, alias_dict: DataFrame, use_fuzzy: bool = True) -> DataFrame:
    """Candidates -> best entity per mention.

    Score = prior * (1 + doc coherence), where coherence counts OTHER
    distinct surface forms in the same doc that are aliases of the same
    candidate entity (deterministic, no learned weights). Winner per
    mention by (score desc, entity_id asc).
    """
    cands = exact_candidates(mentions, alias_dict)
    if use_fuzzy:
        fuzzy = fuzzy_candidates(mentions, alias_dict)
        if fuzzy is not None:
            cands = cands.unionByName(fuzzy.select(*cands.columns))
    # ONE Exchange serves both windows below: hash-partitioning on
    # doc_id satisfies the clustered distribution of BOTH window keys
    # ((doc_id, entity_id) and (doc_id, sent_id, pos) — doc_id prefix),
    # so Catalyst plans sort-only (no second shuffle) for each.
    cands = cands.repartition("doc_id")
    # doc-coherence: per (doc, entity) count distinct mention surfaces.
    # As a window (not groupBy + join-back): the join-back shape would
    # re-execute the candidate subtree — tagger included — twice.
    w_support = Window.partitionBy("doc_id", "entity_id")
    scored = cands.withColumn(
        "n_surfaces", F.size(F.collect_set("surface_norm").over(w_support))
    ).withColumn("score", F.col("prior") * (1.0 + (F.col("n_surfaces") - 1) * 0.5))
    w = Window.partitionBy("doc_id", "sent_id", "pos").orderBy(
        F.desc("score"), F.asc("entity_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "n_surfaces")
    )
