"""Corpus-trained bigram LM quality scoring (CCNet-style gate).

Verified against an independent pure-Python reference implementation
in this file (dict counting + math.log2), not against the operator's
own expressions.
"""

import math

import pytest
from pyspark.sql import functions as F

from neuroner_spark.operators.quality_lm import (
    UNK,
    bigram_lm_scores,
    lm_quality_gate,
)

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat"),
    (3, "a rare zebra quux"),
    (4, "the the the the"),
    (5, "solo"),  # < 2 tokens: must come back with NULL score
    (6, "the mat"),
]


def _ref_scores(rows, alpha=0.5, vocab_limit=None):
    """Independent reference: returns {doc_id: (n_bigrams, bits, ppl)}."""
    toks = {i: t.split(" ") for i, t in rows}
    if vocab_limit is not None:
        freq = {}
        for ts in toks.values():
            for t in ts:
                freq[t] = freq.get(t, 0) + 1
        keep = set(
            t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_limit]
        )
        had_oov = any(t not in keep for ts in toks.values() for t in ts)
        vocab = keep | ({UNK} if had_oov else set())
        toks = {i: [t if t in keep else UNK for t in ts] for i, ts in toks.items()}
    else:
        vocab = set(t for ts in toks.values() for t in ts)
    V = float(len(vocab))
    hist, big = {}, {}
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            hist[a] = hist.get(a, 0) + 1
            big[(a, b)] = big.get((a, b), 0) + 1
    out = {}
    for i, ts in toks.items():
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            out[i] = (0, None, None)
            continue
        nll = [
            -math.log((big[(a, b)] + alpha) / (hist[a] + alpha * V)) / math.log(2.0)
            for a, b in pairs
        ]
        bits = round(sum(nll) / len(nll), 4)
        out[i] = (len(pairs), bits, round(2.0 ** bits, 2))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _collect_scores(df):
    return {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll_bits"], r["ppl"])
        for r in df.collect()
    }


def test_scores_match_reference(spark, docs_df):
    got = _collect_scores(bigram_lm_scores(docs_df))
    want = _ref_scores(DOCS)
    assert set(got) == {i for i, _ in DOCS}  # every input doc present
    for i in got:
        assert got[i][0] == want[i][0], i
        if want[i][1] is None:
            assert got[i][1] is None and got[i][2] is None
        else:
            assert got[i][1] == pytest.approx(want[i][1], abs=1e-9), i
            assert got[i][2] == pytest.approx(want[i][2], abs=1e-9), i


def test_vocab_limit_unks_match_reference(spark, docs_df):
    got = _collect_scores(bigram_lm_scores(docs_df, vocab_limit=3))
    want = _ref_scores(DOCS, vocab_limit=3)
    for i in got:
        assert got[i][0] == want[i][0], i
        if want[i][1] is not None:
            assert got[i][1] == pytest.approx(want[i][1], abs=1e-9), i


def test_repetition_scores_low_gibberish_high(spark, docs_df):
    got = _collect_scores(bigram_lm_scores(docs_df))
    # "the the the the" (pure repetition of the most common token) must
    # score strictly lower than the rare-word doc "a rare zebra quux".
    assert got[4][1] < got[3][1]


def test_gate_keeps_low_bits_and_short_docs(spark, docs_df):
    scores = _collect_scores(bigram_lm_scores(docs_df))
    cut = scores[3][1] - 0.001  # just below the gibberish doc's score
    kept = {r["doc_id"] for r in lm_quality_gate(docs_df, max_bits=cut).collect()}
    assert 3 not in kept  # gibberish dropped
    assert 5 in kept  # unscorable short doc passes
    assert kept == {i for i, s in scores.items() if s[1] is None or s[1] <= cut}
