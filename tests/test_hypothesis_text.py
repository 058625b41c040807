"""Property-based tests (hypothesis) for the pure text functions —
the byte-stability contract of the tokenizer (SURVEY §7 hard part d)
and the length-preservation contract of P2 normalization."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from neuroner_spark.functions.tokenize import SENT_END, TOKEN_RE, tokenize_text

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # any unicode, no surrogates
    max_size=300,
)


@settings(max_examples=300, deadline=None)
@given(texts)
def test_tokenize_offsets_always_exact(text):
    toks = tokenize_text(text)
    for _sid, _pos, tok, s, e in toks:
        assert text[s:e] == tok


@settings(max_examples=300, deadline=None)
@given(texts)
def test_tokenize_covers_every_non_space_char(text):
    toks = tokenize_text(text)
    covered = set()
    for _sid, _pos, tok, s, e in toks:
        covered.update(range(s, e))
    for i, ch in enumerate(text):
        if TOKEN_RE.match(ch) and not ch.isspace():
            # every char that can start a token is inside some token
            assert any(i in covered for i in [i]), (i, ch)


@settings(max_examples=300, deadline=None)
@given(texts)
def test_treebank_tokenize_offsets_and_order(text):
    """The second tokenizer honors the same contracts as the default:
    offset-exact tokens, monotone (sent_id, pos) numbering."""
    from neuroner_spark.functions.tokenize import tokenize_text_treebank

    toks = tokenize_text_treebank(text)
    prev_sid, prev_pos = 0, -1
    for sid, pos, tok, s, e in toks:
        assert text[s:e] == tok
        assert tok  # never empty (a zero-width contraction split would be a bug)
        assert sid >= prev_sid
        if sid == prev_sid:
            assert pos == prev_pos + 1
        else:
            assert pos == 0
        prev_sid, prev_pos = sid, pos


@settings(max_examples=300, deadline=None)
@given(texts)
def test_tokenize_sentence_and_pos_monotone(text):
    toks = tokenize_text(text)
    prev_sid, prev_pos = 0, -1
    for sid, pos, tok, _s, _e in toks:
        assert sid >= prev_sid
        if sid == prev_sid:
            assert pos == prev_pos + 1
        else:
            assert pos == 0
        prev_sid, prev_pos = sid, pos
    # sentence increments exactly at sentence-ending punctuation tokens
    bumps = sum(1 for _sid, _pos, tok, _s, _e in toks[:-1] if tok in SENT_END)
    if toks:
        assert toks[-1][0] <= bumps + (0 if toks[-1][2] in SENT_END else 0) + toks[0][0] + len(toks)


@settings(max_examples=300, deadline=None)
@given(texts)
def test_python_normalization_reference_is_length_preserving(text):
    # P2's contract mirrored in python: every unicode ws -> one space
    normalized = re.sub(r"\s", " ", text)
    assert len(normalized) == len(text)


def test_url_canonicalization(spark):
    """Canonical url collapses tracking/fragment variants; host/domain/
    path decomposition is pure column expressions."""
    from pyspark.sql import functions as F

    from neuroner_spark.functions.urls import canonical_url, url_domain, url_host, url_path

    rows = [
        ("https://WWW.Example.com/a/b/?utm_source=x&utm_medium=y#frag",),
        ("https://example.com/a/b/",),
        ("https://example.com/a/b?gclid=123",),
        ("http://news.example.co/path/page?id=7&fbclid=zz",),
        ("https://example.com/",),
    ]
    df = spark.createDataFrame(rows, "url string").select(
        "url",
        canonical_url(F.col("url")).alias("canon"),
        url_host(F.col("url")).alias("host"),
        url_domain(F.col("url")).alias("domain"),
        url_path(F.col("url")).alias("path"),
    )
    got = {r["url"]: r for r in df.collect()}
    # the three variants of /a/b collapse to ONE canonical form
    canons = {got[r[0]]["canon"] for r in rows[:3]}
    assert canons == {"https://example.com/a/b"}, canons
    # review regressions: 'href=' / '/ref=' must NOT match the tracking
    # pattern; multiple leading tracking params leave no dangling '?&'
    extra = spark.createDataFrame(
        [
            ("https://ex.com/p?href=abc&x=1",),
            ("https://ex.com/dp/ref=sr_1_1?x=2",),
            ("https://ex.com/p?utm_a=1&utm_b=2&x=1",),
            ("https://ex.com/p?x=1",),
        ],
        "url string",
    ).select("url", canonical_url(F.col("url")).alias("canon"))
    e = {r["url"]: r["canon"] for r in extra.collect()}
    assert e["https://ex.com/p?href=abc&x=1"] == "https://ex.com/p?href=abc&x=1"
    assert e["https://ex.com/dp/ref=sr_1_1?x=2"] == "https://ex.com/dp/ref=sr_1_1?x=2"
    assert e["https://ex.com/p?utm_a=1&utm_b=2&x=1"] == "https://ex.com/p?x=1"
    assert e["https://ex.com/p?x=1"] == "https://ex.com/p?x=1"
    assert got[rows[0][0]]["host"] == "example.com"
    assert got[rows[3][0]]["host"] == "news.example.co"
    assert got[rows[3][0]]["domain"] == "example.co"
    assert got[rows[3][0]]["path"] == "/path/page"
    assert got[rows[4][0]]["path"] == "/"


def test_url_domain_psl(spark):
    """Public-suffix-aware registrable domains: two-label public
    suffixes keep three labels; the two-label heuristic remains the
    fallback for ordinary TLDs and unknown suffixes."""
    from pyspark.sql import functions as F

    from neuroner_spark.functions.urls import url_domain

    cases = {
        "https://www.bbc.co.uk/news": "bbc.co.uk",
        "https://a.b.example.co.uk/": "example.co.uk",
        "http://shop.example.com.au/x": "example.com.au",
        "https://www.example.com/": "example.com",
        "https://news.example.co/p": "example.co",
        "https://sub.deep.example.org/": "example.org",
        "https://city.gov.uk/": "city.gov.uk",
        "http://localhost/x": "localhost",
        "https://co.uk/": "co.uk",  # bare suffix: no registrable domain
        # ADVICE r3: ports must not corrupt the label slicing
        "https://www.bbc.co.uk:8080/news": "bbc.co.uk",
        "http://example.com:80/": "example.com",
        # *.kawasaki.jp wildcard class: registrable at the 4th label
        "http://shop.example.kawasaki.jp/x": "shop.example.kawasaki.jp",
        "http://example.kawasaki.jp/": "example.kawasaki.jp",  # == suffix
        "https://www.city.kawasaki.jp/": "city.kawasaki.jp",  # !exception
        "https://sub.city.kawasaki.jp/": "city.kawasaki.jp",
        "http://a.b.yokohama.jp/": "a.b.yokohama.jp",
        # *.tld wildcards: registrable at the 3rd label
        "http://example.com.bd/": "example.com.bd",
        "https://deep.example.org.np/": "example.org.np",
        # !www.ck exception: fires for the bare host too — url_host's
        # www-strip is conditional on the host not being a PSL
        # exception rule (r5 ADVICE fix), so 'www.ck' stays registrable
        "http://sub.www.ck/": "www.ck",
        "http://www.ck/": "www.ck",
        # ordinary jp 2LD list still applies
        "https://www.example.co.jp/": "example.co.jp",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string").select(
        "url", url_domain(F.col("url")).alias("domain")
    )
    got = {r["url"]: r["domain"] for r in df.collect()}
    assert got == cases


def test_canonical_url_idempotent_property(spark):
    """Property: canonical_url is idempotent — canonicalizing a
    canonical form is a no-op (generated url battery, one Spark job)."""
    import itertools

    from pyspark.sql import functions as F

    from neuroner_spark.functions.urls import canonical_url

    hosts = ["Example.com", "www.news.site.co", "a.b.c.d.org"]
    paths = ["/", "/x", "/x/y/", "/dp/ref=sr_1"]
    queries = ["", "?utm_a=1", "?x=1&utm_b=2", "?utm_a=1&utm_b=2&x=3", "?href=q", "?x=1#frag"]
    urls = [
        (f"https://{h}{p}{q}",) for h, p, q in itertools.product(hosts, paths, queries)
    ]
    df = spark.createDataFrame(urls, "url string").select(
        canonical_url(F.col("url")).alias("c1")
    ).select("c1", canonical_url(F.col("c1")).alias("c2"))
    bad = df.filter(F.col("c1") != F.col("c2")).collect()
    assert bad == [], bad[:5]


def test_canonical_url_psl_exception_www(spark):
    """r6 (r5 ADVICE): canonical_url's www-strip shares url_host's
    PSL-exception conditional — the registrable !www.ck host must not
    collapse onto the bare wildcard TLD in the dedup key."""
    from pyspark.sql import functions as F

    from neuroner_spark.functions.urls import canonical_url

    cases = {
        "http://www.ck/x": "http://www.ck/x",
        "http://WWW.ck/x?utm_a=1": "http://www.ck/x",
        "http://www.ck:8080/x": "http://www.ck:8080/x",
        "http://www.example.com/x": "http://example.com/x",
        "http://www.co.uk/x": "http://co.uk/x",  # not an exception rule
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string").select(
        "url", canonical_url(F.col("url")).alias("c")
    )
    got = {r["url"]: r["c"] for r in df.collect()}
    assert got == cases


def test_lang_guess_widened_and_misroute_contract(spark):
    """r5: the stopword table covers 15 languages; dict order is the
    tie-break; a language OUTSIDE the table misroutes to some covered
    code (the documented contract — the gate must never be read as
    truth for uncovered languages)."""
    from pyspark.sql import functions as F

    from neuroner_spark.functions.text_analysis import STOPWORDS, lang_guess

    samples = {
        "en": "the cat sat on the mat and it is happy that for now",
        "de": "der hund ist nicht mit der katze und das ist ein problem auf dauer",
        "es": "el perro que corre por la calle no es un gato y es feliz",
        "fr": "le chien est dans les rues et il faut que pour des raisons",
        "it": "il cane che corre per la strada non sono un gatto e il problema",
        "pt": "o cachorro que corre em uma rua para o parque com os amigos",
        "nl": "de hond is een dier dat van het park op te gaan zijn met",
        "sv": "hunden och katten är det som en av de bästa på gatan för med",
        "pl": "to jest pies i nie ma go w domu na pewno się z tego że",
        "ru": "я не знаю что он в доме и на улице с этим как это",
    }
    rows = [(lang, text) for lang, text in samples.items()]
    df = spark.createDataFrame(rows, "lang string, text string").select(
        "lang", lang_guess(F.col("text")).alias("guess")
    )
    got = {r["lang"]: r["guess"] for r in df.collect()}
    assert got == {lang: lang for lang in samples}
    # uncovered language (Czech): misroutes to SOME covered code —
    # deterministic, but NOT 'cs' (the contract callers must know)
    cz = spark.createDataFrame(
        [("toto je velmi krásný den a slunce svítí na oblohu",)], "text string"
    ).select(lang_guess(F.col("text")).alias("guess"))
    assert cz.collect()[0]["guess"] in STOPWORDS


def test_lang_guess_unsegmented_scripts(spark):
    """r6 (r5 verdict Missing #1): zh/ja/th/ko are detected by
    Unicode-script character ratios, not whitespace tokens — including
    pages with latin boilerplate (URLs, nav), the Common-Crawl shape.
    ja wins over zh via kana presence even on majority-kanji text."""
    from pyspark.sql import functions as F

    from neuroner_spark.functions.text_analysis import lang_guess

    samples = [
        # pure unsegmented text
        ("zh", "今天天气很好我们去公园散步吧这里的风景非常美丽大家都很开心"),
        ("ja", "今日はとても良い天気ですので公園へ散歩に行きましょう"),
        ("th", "วันนี้อากาศดีมากเราไปเดินเล่นที่สวนสาธารณะกันเถอะ"),
        ("ko", "오늘은 날씨가 좋아서 공원에 산책하러 갑니다 모두 즐겁습니다"),
        # with latin boilerplate below the 0.70 latin share the 0.30
        # threshold implies (URLs + nav text)
        ("zh", "首页 新闻 http://example.com 今天天气很好我们去公园散步吧风景美丽 menu login"),
        ("ja", "ホーム 2024 http://example.jp 今日はとても良い天気です散歩に行きましょう login"),
        ("th", "home วันนี้อากาศดีมากเราไปเดินเล่นที่สวนกันเถอะ http://x.th"),
        # majority-kanji Japanese: kana discriminates ja from zh
        ("ja", "東京大学の研究所は新技術を開発した点が高く評価されています"),
        # an English page with a couple of CJK chars stays en
        ("en", "the word 東京 means tokyo and it is the capital of japan for now"),
        # r6 widening: alphabetic scripts without stopword rows route
        # by script too (el/ar/he/hi)
        ("el", "σήμερα ο καιρός είναι πολύ καλός και πάμε στο πάρκο για βόλτα"),
        ("ar", "الطقس جميل اليوم لنذهب إلى الحديقة للتنزه مع الأصدقاء"),
        ("he", "מזג האוויר יפה היום בואו נלך לפארק לטייל עם חברים"),
        ("hi", "आज मौसम बहुत अच्छा है चलो पार्क में घूमने चलते हैं"),
    ]
    df = spark.createDataFrame(
        [(l, t) for l, t in samples], "lang string, text string"
    ).select("lang", lang_guess(F.col("text")).alias("guess"))
    for r in df.collect():
        assert r["guess"] == r["lang"], (r["lang"], r["guess"])


def test_lang_id_oracle_parity_on_scripts(spark, tmp_path):
    """The generated SQL_LANG_ID agrees with lang_guess ON THE SCRIPT
    BRANCH too (the driver's sf0.01 corpus is latin-only, so its
    oracle run never exercises it): mixed CJK/Thai/latin fixture,
    Spark vs DuckDB over the same parquet."""
    import duckdb
    from pyspark.sql import functions as F

    from neuroner_spark.functions.text_analysis import lang_guess
    from neuroner_spark.plans.catalog_text import SQL_LANG_ID

    rows = [
        ("zh", "今天天气很好我们去公园散步吧这里的风景非常美丽"),
        ("ja", "今日はとても良い天気ですので公園へ散歩に行きましょう"),
        ("ja", "東京大学の研究所は新技術を開発した点が評価されています"),
        ("th", "วันนี้อากาศดีมากเราไปเดินเล่นที่สวนสาธารณะกันเถอะ"),
        ("ko", "오늘은 날씨가 좋아서 공원에 산책하러 갑니다"),
        ("ar", "الطقس جميل اليوم لنذهب إلى الحديقة للتنزه"),
        ("el", "σήμερα ο καιρός είναι πολύ καλός και πάμε στο πάρκο"),
        ("en", "the cat sat on the mat and it is happy that for now"),
        ("de", "der hund ist nicht mit der katze und das ist ein problem"),
        ("en", "the word 東京 means tokyo and it is the capital of japan"),
        ("mixed", "首页 news http://example.com 今天天气很好我们去公园散步吧 login"),
        ("empty", ""),
    ]
    pq = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, "lang string, text string").coalesce(1).write.parquet(pq)
    got_spark = {
        (r["lang"], r["guess"]): r["n"]
        for r in spark.read.parquet(pq)
        .select("lang", lang_guess(F.col("text")).alias("guess"))
        .groupBy("lang", "guess")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    got_duck = {
        (lang, guess): n for lang, guess, n in con.sql(SQL_LANG_ID).fetchall()
    }
    assert got_spark == got_duck
