"""Gazetteer mention matching via broadcast n-gram join (SURVEY.md J8,
milestone 0 stand-in for the neural tagger).

Spark-first shape: build token n-grams (n=1..MAX_N) per sentence with
``lead()`` windows (one shuffle on (doc_id, sent_id), shared with every
other sentence-window op in the stage), normalize the n-gram surface,
then BROADCAST hash join against the alias dictionary — the dictionary
is the small side by construction (dictionaries are ~10^6 rows; pages
are ~10^12).  Overlapping matches resolve longest-match-first, then
leftmost (deterministic).

No Python UDFs anywhere in this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neuroner_spark.functions.normalize import surface_norm

MAX_N = 3


def ngram_candidates(tokens: DataFrame, max_n: int = MAX_N, anchor_words: DataFrame | None = None) -> DataFrame:
    """tokens -> candidate n-grams (doc_id, sent_id, pos, n, surface,
    surface_norm, start, end) for n = 1..max_n within each sentence.

    anchor_words: optional broadcast (first_word) frame — a matching
    n-gram's normalized FIRST token must equal the first word of some
    alias, so positions failing that test are dropped BEFORE the
    explode (after the lead window, which needs full sentence order).
    On web text with a large dictionary this cuts the exploded volume
    by orders of magnitude; semantics are unchanged.
    """
    w = Window.partitionBy("doc_id", "sent_id").orderBy("pos")
    df = tokens
    for i in range(1, max_n):
        df = df.withColumn(f"_tok{i}", F.lead("token", i).over(w)).withColumn(
            f"_end{i}", F.lead("end", i).over(w)
        )
    if anchor_words is not None:
        df = df.join(
            F.broadcast(anchor_words),
            surface_norm(F.col("token")) == F.col("first_word"),
            "left_semi",
        )
    grams = []
    for n in range(1, max_n + 1):
        toks = [F.col("token")] + [F.col(f"_tok{i}") for i in range(1, n)]
        end_col = F.col("end") if n == 1 else F.col(f"_end{n-1}")
        grams.append(
            F.when(
                toks[-1].isNotNull(),
                F.struct(
                    F.lit(n).alias("n"),
                    F.concat_ws(" ", *toks).alias("surface"),
                    end_col.alias("g_end"),
                ),
            )
        )
    exploded = (
        df.withColumn("_grams", F.array(*grams))
        .select(
            "doc_id",
            "sent_id",
            "pos",
            "start",
            F.explode("_grams").alias("g"),
        )
        .filter(F.col("g").isNotNull())
        .select(
            "doc_id",
            "sent_id",
            "pos",
            F.col("g.n").alias("n"),
            F.col("g.surface").alias("surface"),
            "start",
            F.col("g.g_end").alias("end"),
        )
    )
    return exploded.withColumn("surface_norm", surface_norm(F.col("surface")))


def match_mentions(
    tokens: DataFrame, alias_dict: DataFrame, max_n: int = MAX_N, overlap: str = "containment"
) -> DataFrame:
    """tokens × alias_dict -> mentions(doc_id, sent_id, pos, n, surface,
    surface_norm, start, end) — longest-match-first, then overlap
    resolution per ``overlap``:

    - ``'containment'`` (default, matches the SQL oracle): at each
      start position only the longest hit survives, and hits strictly
      contained in a longer earlier hit are dropped.  Staggered partial
      overlaps (e.g. pos 0 n=3 and pos 2 n=3) are BOTH kept.
    - ``'greedy'``: strict left-to-right non-overlap on top of the
      containment pass — a hit is kept iff it starts after the last
      kept hit ends.  Sequential per sentence, but sentences are
      bounded, so it runs as ONE JVM-side ``aggregate`` over the
      per-sentence hit array (no UDF, no extra shuffle beyond the
      sentence groupBy).
    """
    anchors = alias_dict.select(
        F.element_at(F.split(F.col("alias_norm"), " "), 1).alias("first_word")
    ).distinct()
    cands = ngram_candidates(tokens, max_n, anchor_words=anchors)
    aliases = alias_dict.select("alias_norm").distinct()
    hits = cands.join(F.broadcast(aliases), cands.surface_norm == aliases.alias_norm, "inner").drop(
        aliases.alias_norm
    )
    # Longest-match semantics, fully relational and deterministic:
    # (1) at each start pos keep only the longest hit;
    # (2) drop hits strictly contained in a longer hit that starts
    #     earlier in the same sentence.
    # A containing hit must start within max_n-1 positions, so (2) is
    # two lag() lookups instead of a self-join — saves two shuffles on
    # the hottest stage of the pipeline (verified vs the NOT EXISTS
    # formulation by the DuckDB oracle).
    # Both windows share ONE spec (r7): partition (doc, sent), order
    # (pos, n desc).  Hits are unique per (pos, n), so the first row of
    # each pos group under this ordering IS the longest hit at that pos
    # (replacing the per-(doc,sent,pos) row_number window), and after
    # that filter rows are unique per pos, making the ordering
    # equivalent to plain (pos) for the containment lags — one
    # exchange-satisfying sort serves both window passes instead of two.
    w_sent = Window.partitionBy("doc_id", "sent_id").orderBy("pos", F.desc("n"))
    prev_pos = F.lag("pos").over(w_sent)
    longest = (
        hits.withColumn("_pp", prev_pos)
        .filter(F.col("_pp").isNull() | (F.col("_pp") != F.col("pos")))
        .drop("_pp")
    )
    contained = F.lit(False)
    for k in range(1, max_n):
        p_pos = F.lag("pos", k).over(w_sent)
        p_n = F.lag("n", k).over(w_sent)
        contained = contained | (
            p_pos.isNotNull()
            & (p_pos < F.col("pos"))
            & (p_pos + p_n >= F.col("pos") + F.col("n"))
        )
    resolved = (
        longest.withColumn("_contained", contained)
        .filter(~F.col("_contained"))
        .drop("_contained")
    )
    if overlap == "containment":
        return resolved
    if overlap != "greedy":
        raise ValueError(f"overlap must be 'containment' or 'greedy', got {overlap!r}")
    return _greedy_nonoverlap(resolved)


def _greedy_nonoverlap(mentions: DataFrame) -> DataFrame:
    """Left-to-right greedy non-overlap, fully JVM-side: collect each
    sentence's hits (sentences are bounded), fold over them sorted by
    pos keeping a hit iff it starts past the last kept end, re-explode.
    The fold is a higher-order ``aggregate`` — whole-stage-codegen'd,
    no Python on the path."""
    cols = [c for c in mentions.columns if c not in ("doc_id", "sent_id")]
    packed = mentions.groupBy("doc_id", "sent_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", *[c for c in cols if c != "pos"]))).alias(
            "_hits"
        )
    )
    kept = F.aggregate(
        F.col("_hits"),
        F.struct(
            F.lit(-1).cast("int").alias("last_end"),
            F.array().cast(
                packed.schema["_hits"].dataType.simpleString()
            ).alias("kept"),
        ),
        lambda acc, h: F.when(
            h["pos"] > acc["last_end"],
            F.struct(
                (h["pos"] + h["n"] - 1).cast("int").alias("last_end"),
                F.array_append(acc["kept"], h).alias("kept"),
            ),
        ).otherwise(acc),
        lambda acc: acc["kept"],
    )
    return (
        packed.select("doc_id", "sent_id", F.explode(kept).alias("h"))
        .select("doc_id", "sent_id", "h.pos", *[f"h.{c}" for c in cols if c != "pos"])
    )
