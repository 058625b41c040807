"""Corpus-trained n-gram LM quality scoring (the CCNet/FineWeb
perplexity gate, SURVEY.md §2 extension set): train a smoothed bigram
LM on the corpus itself with one pass, score every document by its
average negative log-likelihood, and gate on the score.  CCNet does
this with a pretrained KenLM 5-gram; the Spark-first re-expression is
a bigram LM whose count tables ARE DataFrames, so training is two
map-side-combined aggregations and scoring is two equi-joins — no
model file, no Python, no UDF.

Plan shape at 10^12 docs:
  - bigram pair construction is ROW-LOCAL (arrays_zip of two slices of
    the token array — no window, no shuffle; a lag-window formulation
    would shuffle the whole corpus by doc_id for nothing);
  - history/bigram count tables are groupBys on token keys with
    partial aggregation — the only corpus-sized shuffles, both keyed
    well (token frequency skew is bounded by ``vocab_limit``);
  - scoring joins the pair stream against the two count tables on
    token keys; with ``vocab_limit`` set the tables are bounded
    (≤ limit+1 and ≤ limit²) and typically broadcastable;
  - the per-doc reduce is a groupBy(doc_id) avg.

Smoothing: add-alpha over the observed vocabulary,
P(w|h) = (c(h,w) + α) / (c(h·) + α·V), V = |observed token types|.
Scores are in bits (log2); perplexity = 2^bits.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK = "<unk>"


def _bigram_pairs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, prev, tok) — one row per adjacent token pair, built inside
    the row (zero shuffle)."""
    a = F.split(F.col(text_col), " ")
    n = F.size(a)
    z = F.arrays_zip(
        F.slice(a, 1, F.greatest(n - 1, F.lit(0))).alias("prev"),
        F.slice(a, 2, F.greatest(n - 1, F.lit(0))).alias("tok"),
    )
    return docs.select(F.col(id_col), F.explode(z).alias("p")).select(
        id_col, F.col("p.prev").alias("prev"), F.col("p.tok").alias("tok")
    )


def bigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    vocab_limit: int | None = None,
    broadcast_counts: bool | None = None,
) -> DataFrame:
    """Score each doc under a bigram LM trained on the same corpus.

    Returns one row PER INPUT DOC (left join — docs with < 2 tokens
    come back with n_bigrams=0 and NULL scores, never dropped):
      (id, n_bigrams, avg_nll_bits, ppl)
    where avg_nll_bits = round(mean −log2 P(tok|prev), 4) and
    ppl = round(2^avg_nll_bits, 2) (computed from the ROUNDED bits so
    an external re-implementation agrees to the printed digits).

    ``vocab_limit``: keep only the top-K tokens by corpus frequency
    (ties broken by token string); everything else becomes UNK before
    counting — the knob that bounds both count tables at web scale.

    ``broadcast_counts`` (r6, measured at 5M docs): hint the
    history/bigram count tables broadcast in the scoring joins.  The
    BENCH/lm_crossover.json legs showed AQE planning the scoring joins
    as SortMergeJoins even with tiny count tables — which shuffles the
    corpus-sized PAIR STREAM for nothing; the explicit hint keeps the
    pair stream in place.  Default (None) resolves to True when
    ``vocab_limit`` bounds the tables (≤ limit+1 and ≤ observed
    bigrams of the kept vocab) and False otherwise (an unbounded
    bigram table is corpus-vocab-sized — hinting it broadcast at web
    scale would OOM the driver; AQE decides from runtime stats there).
    """
    if broadcast_counts is None:
        broadcast_counts = vocab_limit is not None
    pairs = _bigram_pairs(docs, id_col, text_col)
    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    if vocab_limit is not None:
        # ONE corpus-wide count table feeds everything below: the top-K
        # keep set AND the smoothing denominator V (r6 review fix —
        # the previous shape re-aggregated the corpus for the vocab
        # union and ran a corpus-wide anti-join just to detect one OOV
        # token; V = min(types, K) + [types > K] needs only the count)
        counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
        keep = counts.orderBy(F.desc("c"), F.asc("tok")).limit(vocab_limit).select("tok")
        # both UNK rewrites broadcast the SAME keep plan (alias-only
        # difference -> Catalyst's exchange reuse serves one build)
        ka, kb = keep.alias("_ka"), keep.alias("_kb")
        pairs = (
            pairs.join(F.broadcast(ka), F.col("prev") == F.col("_ka.tok"), "left")
            .withColumn(
                "prev",
                F.when(F.col("_ka.tok").isNotNull(), F.col("prev")).otherwise(F.lit(UNK)),
            )
            .drop(F.col("_ka.tok"))
            .join(F.broadcast(kb), pairs.tok == F.col("_kb.tok"), "left")
            .select(
                id_col,
                "prev",
                F.when(F.col("_kb.tok").isNotNull(), pairs.tok)
                .otherwise(F.lit(UNK))
                .alias("tok"),
            )
        )
        v_frame = counts.agg(F.count("*").cast("double").alias("nt")).select(
            (
                F.least(F.col("nt"), F.lit(float(vocab_limit)))
                + (F.col("nt") > vocab_limit).cast("double")
            ).alias("V")
        )
    else:
        v_frame = toks.agg(F.count_distinct("tok").cast("double").alias("V"))

    history = pairs.groupBy("prev").agg(F.count("*").alias("ch"))
    bigrams = pairs.groupBy("prev", "tok").agg(F.count("*").alias("cb"))
    if broadcast_counts:
        history, bigrams = F.broadcast(history), F.broadcast(bigrams)
    scored = (
        pairs.join(bigrams, ["prev", "tok"])
        .join(history, "prev")
        .crossJoin(F.broadcast(v_frame))
        .select(
            id_col,
            (
                -F.log((F.col("cb") + F.lit(alpha)) / (F.col("ch") + F.lit(alpha) * F.col("V")))
                / math.log(2.0)
            ).alias("nll_bits"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("nb"), F.avg("nll_bits").alias("anll")
    )
    bits = F.round(F.col("anll"), 4)
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("nb"), F.lit(0)).alias("n_bigrams"),
        bits.alias("avg_nll_bits"),
        F.round(F.pow(F.lit(2.0), bits), 2).alias("ppl"),
    )


def lm_quality_gate(
    docs: DataFrame,
    max_bits: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    vocab_limit: int | None = None,
) -> DataFrame:
    """Keep docs whose LM score is at most ``max_bits`` (repetitive
    boilerplate scores LOW, rare-word gibberish scores HIGH — CCNet
    gates on the high-perplexity tail; docs too short to score pass).
    Returns the kept ids via a semi join — text never reshuffles."""
    ok = bigram_lm_scores(docs, id_col, text_col, alpha, vocab_limit).filter(
        F.col("avg_nll_bits").isNull() | (F.col("avg_nll_bits") <= max_bits)
    )
    return docs.join(ok.select(id_col), id_col, "left_semi")
