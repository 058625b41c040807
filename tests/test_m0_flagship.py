"""Milestone-0 end-to-end smoke: documents -> tokens -> mentions -> triples."""

from pyspark.sql import functions as F

from neuroner_spark.fixtures.gen import pages_df
from neuroner_spark.functions.normalize import normalize_whitespace
from neuroner_spark.functions.tokenize import tokenize, tokenize_text
from neuroner_spark.plans.flagship import flagship, mentions_from_documents

SF = "/root/testdata/sf0.001"


def test_tokenize_offsets_pure():
    toks = tokenize_text("Alpha beta. Gamma!")
    assert toks[0] == (0, 0, "Alpha", 0, 5)
    # sentence id increments after '.'
    sent_ids = {t[0] for t in toks}
    assert sent_ids == {0, 1}
    # offset invariant
    text = "Alpha beta. Gamma!"
    for _sid, _pos, tok, s, e in toks:
        assert text[s:e] == tok


def test_tokenize_df_offset_invariant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    norm = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        normalize_whitespace(F.col("text")).alias("text"),
    )
    toks = tokenize(norm)
    joined = toks.join(norm, "doc_id")
    # P4 invariant: substring(text, start+1, end-start) == token
    bad = joined.filter(
        F.expr("substring(text, cast(start+1 as int), cast(end-start as int))") != F.col("token")
    ).count()
    assert bad == 0


def test_flagship_returns_triples(spark):
    out = flagship(spark, SF)
    rows = out.collect()
    assert len(rows) > 0
    assert set(out.columns) == {"subj", "pred", "obj", "n_docs"}
    assert all(r["subj"] < r["obj"] for r in rows)


def test_mentions_on_pages_fixture(spark):
    from neuroner_spark.fixtures.gen import alias_df

    pages = pages_df(spark, 100).withColumnRenamed("url", "doc_id")
    mentions = mentions_from_documents(spark, pages, alias_df(spark))
    assert mentions.count() > 0
