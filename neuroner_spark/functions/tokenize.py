"""Deterministic sentence segmentation + tokenization (SURVEY.md F1/W5).

Reference parity: ``src/brat_to_conll.py ::
get_sentences_and_tokens_from_spacy`` (≈L20–45) emits, per document,
sentences of tokens each carrying its char offset (`token.idx`).  The
sandbox has no spaCy, and at 100 TB a C-extension NLP pipeline per row
is the wrong shape anyway; the default is a pinned, pure-regex
tokenizer whose output is a deterministic function of the text bytes
(golden-file-frozen), and a second real implementation —
Treebank-style rules (``tokenize_text_treebank``) — ships behind the
same seam, selectable by the reference's ``tokenizer`` INI name via
``resolve_tokenizer``.

Design for scale:
- ONE Arrow-batched pandas UDF per document batch returning
  ``array<struct<sent_id,pos,token,start,end>>``; then a JVM-side
  ``posexplode``.  No per-row Python, no driver collect.
- Offsets are char offsets into the (length-preserving normalized)
  document text, half-open [start, end) — the P4 invariant
  ``substring(text, start+1, end-start) == token`` holds by
  construction and is asserted in tests.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Pinned token pattern: word runs | single non-space punctuation.
TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
# Sentence boundary: ., !, ? followed by whitespace (or end).
SENT_END = {".", "!", "?"}

TOKEN_STRUCT = T.StructType(
    [
        T.StructField("sent_id", T.LongType(), False),
        T.StructField("pos", T.IntegerType(), False),
        T.StructField("token", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
    ]
)


def tokenize_text(text: str) -> list[tuple[int, int, str, int, int]]:
    """Pure function: text -> [(sent_id, pos, token, start, end)].

    A sentence ends at a '.', '!' or '?' token; position counters reset.
    Deterministic, offset-exact, unicode-aware (\\w covers letters and
    digits in any script).
    """
    out: list[tuple[int, int, str, int, int]] = []
    sent_id = 0
    pos = 0
    for m in TOKEN_RE.finditer(text):
        tok = m.group(0)
        out.append((sent_id, pos, tok, m.start(), m.end()))
        if tok in SENT_END:
            sent_id += 1
            pos = 0
        else:
            pos += 1
    return out


# --- second tokenizer behind the seam: Treebank-style rules ----------
# Reimplemented from the published Penn Treebank tokenization
# conventions (Marcus et al. 1993; the rule set behind
# `tokenizer=stanford/spacy` in the reference INI): ellipses and
# double-dashes are single tokens, letter-dot abbreviations (U.S.A.,
# e.g.) stay whole, numbers keep internal ,.: separators, hyphenated
# compounds stay joined, and clitic contractions split (do|n't, it|'s).
# Offset-exact like the default tokenizer; same sentence contract.
TREEBANK_RE = re.compile(
    r"\.\.\.|--"
    r"|(?:[^\W\d_]\.){2,}"  # U.S.A., e.g., i.e.
    r"|\d+(?:[.,:]\d+)*"  # 1,234.56 / 12:30
    r"|\w+(?:[-']\w+)*"  # words, hyphen/apostrophe compounds
    r"|[^\w\s]",
    re.UNICODE,
)
_CONTRACTION_RE = re.compile(r"(?i)(n't|'s|'re|'ve|'ll|'d|'m)$")


def tokenize_text_treebank(text: str) -> list[tuple[int, int, str, int, int]]:
    """Treebank-style tokenizer: text -> [(sent_id, pos, token, start,
    end)].  Pure, deterministic, offset-exact (the P4 substring
    invariant holds for every emitted token, including both halves of a
    split contraction).  A letter-dot abbreviation token never ends a
    sentence (so a true sentence ending in 'U.S.' won't split — the
    documented Treebank trade-off)."""
    out: list[tuple[int, int, str, int, int]] = []
    sent_id = 0
    pos = 0

    def emit(tok: str, start: int, end: int) -> None:
        nonlocal sent_id, pos
        out.append((sent_id, pos, tok, start, end))
        if tok in SENT_END:
            sent_id += 1
            pos = 0
        else:
            pos += 1

    for m in TREEBANK_RE.finditer(text):
        tok = m.group(0)
        c = _CONTRACTION_RE.search(tok) if "'" in tok else None
        if c and c.start() > 0:
            emit(tok[: c.start()], m.start(), m.start() + c.start())
            emit(tok[c.start() :], m.start() + c.start(), m.end())
        else:
            emit(tok, m.start(), m.end())
    return out


TOKENIZERS = {
    # None = the pinned-regex vectorized fast path in tokenize()
    "regex": None,
    "treebank": tokenize_text_treebank,
}


def resolve_tokenizer(name: str):
    """Reference ``tokenizer`` INI param -> tokenize_fn for
    ``tokenize()`` (None selects the default fast path)."""
    if name not in TOKENIZERS:
        raise ValueError(f"unknown tokenizer {name!r}; known: {sorted(TOKENIZERS)}")
    return TOKENIZERS[name]


def _make_custom_batches(tokenize_fn):
    """Generic Arrow-batched wrapper around an injected tokenizer
    (the reference's ``tokenizer`` INI param seam: spaCy/CoreNLP-style
    callables drop in without touching the operator).  ``tokenize_fn``:
    text -> [(sent_id, pos, token, start, end)]."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, counts = [], []
            rows: list[tuple[int, int, str, int, int]] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue
                r = tokenize_fn(text)
                rows.extend(r)
                doc_ids.append(doc_id)
                counts.append(len(r))
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(np.asarray(doc_ids, dtype=object), counts),
                    "sent_id": np.asarray([r[0] for r in rows], dtype=np.int64),
                    "pos": np.asarray([r[1] for r in rows], dtype=np.int32),
                    "token": [r[2] for r in rows],
                    "start": np.asarray([r[3] for r in rows], dtype=np.int64),
                    "end": np.asarray([r[4] for r in rows], dtype=np.int64),
                }
            )

    return gen


# --- vectorized ASCII fast path (r7, guide §4: shrink the Python
# boundary's per-row CPU).  The char-class lookup tables are built
# FROM the pinned regex itself, so per-char parity with `\w` / `\s`
# holds by construction; word runs + single punct chars are exactly
# TOKEN_RE's alternatives for ASCII input.  Non-ASCII docs (where \w
# depends on the Unicode tables) keep the reference finditer loop.
def _ascii_luts():
    import numpy as np

    word = np.zeros(128, dtype=bool)
    space = np.zeros(128, dtype=bool)
    for i in range(128):
        c = chr(i)
        word[i] = bool(re.fullmatch(r"\w", c, re.UNICODE))
        space[i] = bool(re.fullmatch(r"\s", c, re.UNICODE))
    end_codes = np.array(sorted(ord(c) for c in SENT_END), dtype=np.uint8)
    return word, ~word & ~space, end_codes


_ASCII_WORD, _ASCII_PUNCT, _SENT_END_CODES = _ascii_luts()


def _tokenize_ascii_block(texts: list, doc_ids: list) -> pd.DataFrame:
    """ONE numpy pass over a whole batch of ASCII docs (measured ~2.7x
    the reference loop's throughput at the sf0.1 corpus shape).  The
    texts are joined with '\\n' (a `\\s` char — never part of a token,
    so no token spans a doc boundary); token offsets come back
    doc-relative, and the per-doc sentence/position counters are
    reconstructed with cumsum/accumulate resets at doc starts."""
    import numpy as np

    mega = "\n".join(texts)
    arr = np.frombuffer(mega.encode("ascii"), dtype=np.uint8)
    n = arr.shape[0]
    empty = {
        "doc_id": np.empty(0, dtype=object),
        "sent_id": np.empty(0, dtype=np.int64),
        "pos": np.empty(0, dtype=np.int32),
        "token": [],
        "start": np.empty(0, dtype=np.int64),
        "end": np.empty(0, dtype=np.int64),
    }
    if n == 0:
        return pd.DataFrame(empty)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    doc_off = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=doc_off[1:])
    w = _ASCII_WORD[arr]
    p = _ASCII_PUNCT[arr]
    prev_w = np.empty(n, dtype=bool)
    prev_w[0] = False
    prev_w[1:] = w[:-1]
    next_w = np.empty(n, dtype=bool)
    next_w[-1] = False
    next_w[:-1] = w[1:]
    run_starts = np.flatnonzero(w & ~prev_w)
    run_ends = np.flatnonzero(w & ~next_w) + 1
    p_idx = np.flatnonzero(p)
    starts = np.concatenate([run_starts, p_idx])
    ends = np.concatenate([run_ends, p_idx + 1])
    order = np.argsort(starts, kind="stable")
    starts = starts[order]
    ends = ends[order]
    m = starts.shape[0]
    if m == 0:
        return pd.DataFrame(empty)
    # doc index per token, and each doc's first global token index
    d = np.searchsorted(doc_off, starts, side="right") - 1
    first = np.flatnonzero(np.diff(d, prepend=-1))
    counts = np.diff(first, append=m)
    first_tok = np.repeat(first, counts)
    idx = np.arange(m, dtype=np.int64)
    is_end = (ends - starts == 1) & np.isin(arr[starts], _SENT_END_CODES)
    # sent_id: shifted cumsum of sentence ends, rebased per doc
    c = np.zeros(m, dtype=np.int64)
    np.cumsum(is_end[:-1], out=c[1:])
    sent_ids = c - c[first_tok]
    # pos: tokens since max(last sentence end, doc start) — the same
    # reset-to-0 rule the reference loop applies
    prev_end = np.maximum.accumulate(np.where(is_end, idx, -1))
    prev_shift = np.empty(m, dtype=np.int64)
    prev_shift[0] = -1
    prev_shift[1:] = prev_end[:-1]
    poss = (idx - np.maximum(prev_shift, first_tok - 1) - 1).astype(np.int32)
    sl, el = starts.tolist(), ends.tolist()
    tokens = [mega[s:e] for s, e in zip(sl, el)]
    off = doc_off[d]
    return pd.DataFrame(
        {
            "doc_id": np.asarray(doc_ids, dtype=object)[d],
            "sent_id": sent_ids,
            "pos": poss,
            "token": tokens,
            "start": starts - off,
            "end": ends - off,
        }
    )


def _tokenize_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    # columnar assembly (lists per column, doc ids via repeat) — ~2x
    # cheaper than building a tuple per token; ASCII docs take the
    # batch-vectorized numpy path above
    import numpy as np

    for pdf in batches:
        ascii_texts: list = []
        ascii_ids: list = []
        doc_ids, counts = [], []
        sids: list[int] = []
        poss: list[int] = []
        toks: list[str] = []
        starts: list[int] = []
        ends: list[int] = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            if text is None:
                continue
            if text.isascii():
                ascii_texts.append(text)
                ascii_ids.append(doc_id)
                continue
            sent_id = 0
            pos = 0
            n = 0
            for m in TOKEN_RE.finditer(text):
                tok = m.group(0)
                sids.append(sent_id)
                poss.append(pos)
                toks.append(tok)
                starts.append(m.start())
                ends.append(m.end())
                n += 1
                if tok in SENT_END:
                    sent_id += 1
                    pos = 0
                else:
                    pos += 1
            doc_ids.append(doc_id)
            counts.append(n)
        if ascii_texts:
            yield _tokenize_ascii_block(ascii_texts, ascii_ids)
        if doc_ids:
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(np.asarray(doc_ids, dtype=object), counts),
                    "sent_id": np.asarray(sids, dtype=np.int64),
                    "pos": np.asarray(poss, dtype=np.int32),
                    "token": toks,
                    "start": np.asarray(starts, dtype=np.int64),
                    "end": np.asarray(ends, dtype=np.int64),
                }
            )


TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("sent_id", T.LongType(), False),
        T.StructField("pos", T.IntegerType(), False),
        T.StructField("token", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
    ]
)


def tokenize(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenize_fn=None,
) -> DataFrame:
    """docs(id, text) -> tokens(doc_id, sent_id, pos, token, start, end).

    Input is projected to exactly two columns before the UDF stage so
    parquet column pruning applies and Arrow batches stay small.

    ``tokenize_fn`` (optional): text -> [(sent_id, pos, token, start,
    end)] — the pluggable-tokenizer seam mirroring the reference's
    ``tokenizer`` INI param (spaCy vs CoreNLP).  Default (None) is the
    pinned regex tokenizer via a vectorized fast path; the injected fn
    must be picklable (module-level) and deterministic.
    """
    narrow = docs.select(
        F.col(id_col).cast("string").alias("doc_id"), F.col(text_col).alias("text")
    )
    # defensive re-shard (salted on doc-id hash, the north-star rule):
    # a pathologically under-split input — one giant gzip member, a
    # single-row-group parquet — would otherwise run the WHOLE Arrow
    # tokenize stage on a handful of tasks (measured: the sf0.1 test
    # file is one split, serializing the pipeline's dominant CPU
    # stage).  Well-sharded inputs skip the shuffle entirely.
    sc = docs.sparkSession.sparkContext
    target = sc.defaultParallelism
    if narrow.rdd.getNumPartitions() < max(2, target // 2):
        narrow = narrow.repartition(target, F.xxhash64("doc_id"))
    fn = _tokenize_batches if tokenize_fn is None else _make_custom_batches(tokenize_fn)
    return narrow.mapInPandas(fn, schema=TOKENS_SCHEMA)
