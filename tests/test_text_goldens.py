"""Byte-identical extracted text per url (BASELINE.json input_hint
per-row invariant; FIXTURES.md pages_text_golden): the normalization
output for the 500-page fixture is frozen as parquet and compared
byte-for-byte every run."""

import os

from pyspark.sql import functions as F

from neuroner_spark.fixtures.gen import pages_df
from neuroner_spark.plans.kg_pipeline import normalize_pages

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "pages_text_golden.parquet")


def test_normalized_text_bytes_match_golden(spark):
    norm = normalize_pages(pages_df(spark, 500)).select(
        F.col("doc_id").alias("url"), "text"
    )
    got = {r["url"]: r["text"] for r in norm.collect()}
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        norm.coalesce(1).write.parquet(GOLDEN)
        import pytest

        pytest.skip("golden frozen on first run")
    want = {r["url"]: r["text"] for r in spark.read.parquet(GOLDEN).collect()}
    assert set(got) == set(want)
    mismatches = [u for u in want if got[u].encode("utf-8") != want[u].encode("utf-8")]
    assert mismatches == [], mismatches[:5]


def test_html_extraction_consistent_with_text(spark):
    """The html binary decodes to exactly the page text (modulo the P2
    whitespace collapse applied by the extractor)."""
    from neuroner_spark.functions.multimodal import html_to_text

    pages = pages_df(spark, 200)
    extracted = html_to_text(pages)
    import re

    for r in extracted.select("text", "text_from_html").collect():
        assert r["text_from_html"] == re.sub(r"\s+", " ", r["text"]).strip()


# --- second tokenizer behind the seam: Treebank-style rules ------------
def test_treebank_tokenizer(spark):
    """tokenize_text_treebank: contraction splits, whole abbreviations,
    numbers with separators, hyphen compounds — all offset-exact, and
    selectable by INI name via resolve_tokenizer."""
    import pytest

    from neuroner_spark.functions.tokenize import (
        resolve_tokenizer,
        tokenize,
        tokenize_text,
        tokenize_text_treebank,
    )

    text = "Don't buy state-of-the-art U.S.A. gear for 1,234.56 dollars. Wait... it's cheap!"
    toks = tokenize_text_treebank(text)
    surfaces = [t[2] for t in toks]
    assert surfaces == [
        "Do", "n't", "buy", "state-of-the-art", "U.S.A.", "gear", "for",
        "1,234.56", "dollars", ".", "Wait", "...", "it", "'s", "cheap", "!",
    ]
    # offset invariant holds for every token incl. split contractions
    assert all(text[s:e] == tok for _, _, tok, s, e in toks)
    # '.' ends the sentence; the U.S.A. abbreviation does not
    sent_of = {t[2]: t[0] for t in toks}
    assert sent_of["U.S.A."] == 0 and sent_of["Wait"] == 1
    # the default tokenizer treats the same text very differently
    assert "n't" not in [t[2] for t in tokenize_text(text)]
    # INI-name resolution + the Spark seam end-to-end
    assert resolve_tokenizer("regex") is None
    assert resolve_tokenizer("treebank") is tokenize_text_treebank
    with pytest.raises(ValueError):
        resolve_tokenizer("stanford-not-installed")
    docs = spark.createDataFrame([("d1", "Don't stop.")], "doc_id string, text string")
    rows = sorted(
        tokenize(docs, tokenize_fn=tokenize_text_treebank).collect(),
        key=lambda r: (r["sent_id"], r["pos"]),
    )
    assert [r["token"] for r in rows] == ["Do", "n't", "stop", "."]
    assert [(r["start"], r["end"]) for r in rows] == [(0, 2), (2, 5), (6, 10), (10, 11)]


# --- pluggable tokenizer seam (reference `tokenizer` INI param) --------
def test_pluggable_tokenizer_seam(spark):
    from neuroner_spark.functions.tokenize import tokenize

    # nested def -> cloudpickle ships it by value to the workers
    def _whitespace_tokenizer(text):
        import re

        return [
            (0, i, m.group(0), m.start(), m.end())
            for i, m in enumerate(re.finditer(r"\S+", text))
        ]

    docs = spark.createDataFrame([("d1", "Hello world. Bye")], "doc_id string, text string")
    rows = sorted(
        tokenize(docs, tokenize_fn=_whitespace_tokenizer).collect(),
        key=lambda r: (r["sent_id"], r["pos"]),
    )
    assert [r["token"] for r in rows] == ["Hello", "world.", "Bye"]
    assert [(r["start"], r["end"]) for r in rows] == [(0, 5), (6, 12), (13, 16)]
    # default (pinned regex) path unchanged: sentence split at '.'
    dflt = sorted(tokenize(docs).collect(), key=lambda r: (r["sent_id"], r["pos"]))
    assert [r["token"] for r in dflt] == ["Hello", "world", ".", "Bye"]
    assert [r["sent_id"] for r in dflt] == [0, 0, 0, 1]
