"""Text analytics for training-data pipelines: quality scoring,
language-ID heuristic, token counting, fingerprinting (SURVEY.md §2
extension set; all JVM-side column expressions — no Python).

These run per-document at 10^12 scale, so each one is a narrow
projection over a single parquet scan: no shuffles, no UDFs, full
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ASCII-pinned token pattern — identical semantics in Spark (Java regex)
# and DuckDB (RE2), used wherever an oracle compares token counts.
ASCII_TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

# Tiny pinned stopword lists per language (deterministic lang-ID
# heuristic; words from the public multilingual stopword corpora —
# NLTK / stopwords-iso — trimmed to the 10 most frequent).  Dict ORDER
# is the deterministic tie-break order of ``lang_guess``.
#
# CONTRACT: this is a sandbox stand-in for a real CCNet/fastText
# language model.  Only the listed languages (plus the script-routed
# zh/ja/th/ko — see SCRIPT_ROUTES) can be returned; a document in any
# OTHER language misroutes to its nearest stopword neighbor (often
# 'en' on zero scores).  r6 narrowing (r5 verdict Missing #1): the
# unsegmented scripts (zh/ja/th) and Hangul no longer depend on
# whitespace tokens — they are detected by Unicode-script character
# ratios BEFORE the stopword argmax, so a keep_lang='en' gate no
# longer leaks or arbitrarily drops CJK/Thai pages.  The residual
# misroute surface is now: uncovered ALPHABETIC languages (e.g. el,
# ar, he, hi — addable as ranges or stopword rows), and mixed-script
# pages below every ratio threshold.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "zu", "ist", "nicht", "ein", "mit", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "est", "que", "pour"],
    "it": ["il", "di", "che", "e", "la", "per", "un", "in", "sono", "non"],
    "pt": ["o", "de", "que", "e", "em", "um", "para", "com", "uma", "os"],
    "nl": ["de", "het", "een", "van", "en", "dat", "op", "te", "zijn", "met"],
    "sv": ["och", "att", "det", "som", "en", "på", "är", "av", "för", "med"],
    "da": ["og", "i", "det", "at", "en", "den", "til", "er", "som", "af"],
    "no": ["og", "i", "det", "at", "en", "til", "er", "som", "på", "ikke"],
    "fi": ["ja", "on", "ei", "että", "se", "hän", "oli", "mutta", "joka", "kun"],
    "pl": ["i", "w", "nie", "na", "się", "z", "do", "to", "że", "jest"],
    "tr": ["ve", "bir", "bu", "da", "için", "ile", "çok", "ama", "gibi", "daha"],
    "id": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "dari", "dalam"],
    "ru": ["и", "в", "не", "на", "я", "что", "он", "с", "как", "это"],
}


# Unicode script ranges for the whitespace-free scripts (public
# Unicode block data).  BMP-only on purpose: Spark (Java regex) and
# DuckDB (RE2) both accept literal-char ranges in a class, so the SAME
# generated pattern runs on both engines.
SCRIPT_RANGES = {
    "kana": "぀-ヿ",                 # Hiragana + Katakana
    "thai": "฀-๿",                 # Thai block
    "hangul": "가-힯ᄀ-ᇿ",  # syllables + jamo
    "han": "一-鿿㐀-䶿",     # CJK Unified + Ext A
    # alphabetic scripts whose stopwords are not in STOPWORDS: routing
    # by script is coarser than a stopword model (ar stands for every
    # Arabic-script language incl. fa/ur; hi for every Devanagari
    # language incl. mr/ne — documented residual of the contract) but
    # strictly better than the latin-stopword misroute they got before
    "greek": "Ͱ-Ͽ",
    "arabic": "؀-ۿݐ-ݿ",      # Arabic + Supplement
    "hebrew": "֐-׿",
    "devanagari": "ऀ-ॿ",
}

# Routing order MATTERS and is part of the contract: kana first (Japanese
# text is majority kanji — Han ratio alone would misroute ja -> zh; any
# kana presence is the standard ja/zh discriminator), then the
# mutually-exclusive-script ratios.  Thresholds: 0.05 for kana
# (particles/okurigana are a minority of chars), 0.30 for a dominant
# script (web pages carry latin boilerplate — URLs, nav, numbers).
SCRIPT_ROUTES = [
    ("kana", "ja", 0.05),
    ("thai", "th", 0.30),
    ("hangul", "ko", 0.30),
    ("han", "zh", 0.30),
    ("greek", "el", 0.30),
    ("arabic", "ar", 0.30),
    ("hebrew", "he", 0.30),
    ("devanagari", "hi", 0.30),
]


def script_ratio(text: Column, script: str) -> Column:
    """Fraction of non-whitespace chars in the given Unicode script.
    Two regexp_replace passes, JVM-side, no tokenization — works on
    unsegmented text.  Denominator floored at 1 (ANSI-mode-safe; an
    empty doc scores 0.0 everywhere and falls through to the stopword
    argmax)."""
    rng = SCRIPT_RANGES[script]
    n_script = F.length(F.regexp_replace(text, f"[^{rng}]", ""))
    n_chars = F.length(F.regexp_replace(text, r"\s", ""))
    return n_script.cast("double") / F.greatest(n_chars, F.lit(1))


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization (split on single space — parity-pinned)."""
    return F.split(text, " ")


def n_ws_tokens(text: Column) -> Column:
    return F.size(ws_tokens(text))


def n_regex_tokens(text: Column) -> Column:
    """BPE-ish regex token count (ASCII-pinned for oracle parity)."""
    return F.size(F.regexp_extract_all(text, F.lit(ASCII_TOKEN_RE), 0))


def avg_token_len(text: Column) -> Column:
    toks = ws_tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    """Fraction of chars that are ASCII punctuation."""
    n_punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
    return F.when(F.length(text) > 0, n_punct.cast("double") / F.length(text)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = ws_tokens(F.lower(text))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + punctuation band
    + stopword presence. Deterministic and monotone-documented."""
    n = n_ws_tokens(text)
    len_ok = F.when((n >= 10) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) < 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    sw_ok = F.when(stopword_ratio(text, "en") > 0.01, F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((len_ok + punct_ok + sw_ok) / 3.0, 6)


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    """Stopword-overlap score per language (n-gram-free heuristic that
    is exactly reproducible in ANSI SQL)."""
    toks = ws_tokens(F.lower(text))
    out = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        out.append((lang, F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))))
    return out


def lang_guess(text: Column) -> Column:
    """Language ID: Unicode-script ratio routing for the whitespace-free
    scripts (``SCRIPT_ROUTES`` — zh/ja/th/ko, r6), then argmax over the
    stopword-overlap scores with deterministic tie-break = ``STOPWORDS``
    dict order (en first — the same rule the ``lang_id`` oracle
    generates from the same tables).  Pure column expressions: two
    regexp passes per script plus one stopword-filter pass per language
    over the token array — linear per doc, JVM-side, no shuffle.

    See the ``STOPWORDS`` contract note for the residual misroute
    surface (uncovered alphabetic languages).  Callers gating a corpus
    (``run_corpus_prep(keep_lang=...)``) must not read the gate's row
    counts as language truth for uncovered languages."""
    scores = lang_scores(text)
    expr = None
    for script, lang, thr in SCRIPT_ROUTES:
        cond = script_ratio(text, script) >= thr
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    for i, (lang, s) in enumerate(scores[:-1]):
        cond = None
        for _, s2 in scores[i + 1 :]:
            c = s >= s2
            cond = c if cond is None else (cond & c)
        expr = expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit(scores[-1][0]))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the lowercase, whitespace-collapsed
    text (exact-dedup key; md5 is identical in Spark and DuckDB)."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(norm)


def hash64(col: Column, salt: int = 0, fast: bool = False) -> Column:
    """Engine-portable 60-bit hash: first 15 hex chars of md5, parsed
    base-16. Used for shingle/simhash parity with DuckDB
    (xxhash64 would be Spark-only).

    ``fast=True`` is the PRODUCTION path: JVM ``xxhash64`` folded into
    the same non-negative 60-bit domain — ~3x cheaper per scan, same
    collision behavior, but values differ from the md5 family, so the
    DuckDB oracles pin ``fast=False``."""
    salted = F.concat(F.lit(f"{salt}:"), col) if salt else col
    if fast:
        return F.pmod(F.xxhash64(salted), F.lit(1 << 60)).cast("long")
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def hash28(col: Column, salt: int = 0, fast: bool = False) -> Column:
    """28-bit variant (first 7 hex chars) for universal-hash arithmetic
    (a*x+b mod p): keeps a*x within int64 under ANSI mode (Spark 4
    default) and within DuckDB BIGINT.  ``fast=True`` as in hash64."""
    salted = F.concat(F.lit(f"{salt}:"), col) if salt else col
    if fast:
        return F.pmod(F.xxhash64(salted), F.lit(1 << 28)).cast("long")
    return F.conv(F.substring(F.md5(salted), 1, 7), 16, 10).cast("long")


def repetition_metrics(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1 'repetition
    removal'): per document, the duplicate-word fraction, the most-
    frequent-word fraction, and the most-frequent-bigram fraction —
    the standard quality gate that drops boilerplate/spam pages before
    LLM training.

    Plan shape at 10^12 docs: one posexplode + one lead window keyed by
    (doc, pos) + two per-doc hash aggregations joined on doc_id — all
    JVM-side, shuffles keyed by doc_id only (no global stage).
    Output: (doc_id, n_words, dup_word_frac, top_word_frac,
    top_bigram_frac, flagged).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    )
    wc = toks.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    wstat = wc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.count("*").cast("long").alias("n_distinct"),
        F.max("c").cast("long").alias("max_word"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.withColumn("w2", F.lead("w").over(w))
        .filter(F.col("w2").isNotNull())
        .withColumn("b", F.concat_ws(" ", F.col("w"), F.col("w2")))
    )
    bstat = (
        bg.groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.max("c").cast("long").alias("max_bigram"),
        )
    )
    top_word = F.col("max_word") / F.col("n_words")
    top_bigram = F.col("max_bigram") / F.col("n_bigrams")
    # LEFT join: single-word docs have no bigrams but must still get a
    # row (a quality gate that silently drops docs from its own output
    # passes/blocks them unexamined); bigram columns stay null there
    return (
        wstat.join(bstat, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.round(1.0 - F.col("n_distinct") / F.col("n_words"), 6).alias("dup_word_frac"),
            F.round(top_word, 6).alias("top_word_frac"),
            F.round(top_bigram, 6).alias("top_bigram_frac"),
            ((top_word > 0.2) | (F.coalesce(top_bigram, F.lit(0.0)) > 0.18)).alias("flagged"),
        )
    )
