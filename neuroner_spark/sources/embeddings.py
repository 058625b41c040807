"""Pretrained-embedding text scan (SURVEY.md S3).

Reference parity: ``src/utils_nlp.py :: load_pretrained_token_embeddings``
(≈L45–75) — GloVe-format lines ``token v1 ... v100`` into a token ->
vector map, with the fallback probes of ``is_token_in_pretrained_
embeddings`` (exact -> lowercase -> digits->0, SURVEY P1/J3).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_embedding_text(spark: SparkSession, path: str, dim: int = 100) -> DataFrame:
    """GloVe-format text -> (token, vector:array<float>)."""
    raw = spark.read.text(path)
    parts = F.split(F.col("value"), " ")
    return raw.select(
        F.element_at(parts, 1).alias("token"),
        F.slice(parts, 2, dim).cast("array<float>").alias("vector"),
    ).filter(F.size("vector") == dim)


def vocab_embedding_matrix(
    vocab: dict[str, int], emb_df: DataFrame, stats: dict | None = None
) -> np.ndarray:
    """Build the [vocab_size+1, dim] init matrix driver-side with the
    reference's probe order (exact, lowercase, digits->0); rows with no
    hit stay zero (the reference uses random init there — we use zeros
    for determinism).  J2 embedding lookup then happens inside the
    tagger UDF via fancy-indexing on the broadcast matrix.

    The embedding table is SEMI-JOINED to the vocab's probe keys before
    the collect, so driver memory is O(vocab), never O(embedding file)
    — a GloVe-840B-scale table (2.2M x 300) stays on the executors.
    ``stats`` (optional out-param) records ``n_collected`` for tests.
    """
    import re

    probe_keys = set()
    for tok in vocab:
        probe_keys.add(tok)
        probe_keys.add(tok.lower())
        probe_keys.add(re.sub(r"\d", "0", tok.lower()))
    spark = emb_df.sparkSession
    from neuroner_spark.io import local_df

    keys_df = local_df(spark, [(k,) for k in probe_keys], "token string")
    # dropDuplicates: real GloVe files contain duplicate token lines —
    # keep one row per token so the O(vocab) bound below is exact
    pruned = emb_df.join(F.broadcast(keys_df), "token", "left_semi").dropDuplicates(["token"])
    collected = pruned.collect()
    # the semi join caps the collect at the 3 probe variants per token
    assert len(collected) <= 3 * len(vocab), (len(collected), len(vocab))
    if stats is not None:
        stats["n_collected"] = len(collected)
    rows = {r["token"]: r["vector"] for r in collected}
    if rows:
        dim = len(next(iter(rows.values())))
    else:
        # all-OOV vocab: take the real width from the table itself, not
        # a silent 100-dim fallback (wrong-width matrix downstream)
        first = emb_df.select(F.size("vector").alias("d")).limit(1).collect()
        dim = int(first[0]["d"]) if first else 100
    mat = np.zeros((len(vocab) + 1, dim), dtype=np.float32)
    for tok, idx in vocab.items():
        vec = rows.get(tok) or rows.get(tok.lower()) or rows.get(re.sub(r"\d", "0", tok.lower()))
        if vec is not None:
            mat[idx] = vec
    return mat


def pretrained_membership(vocab_df: DataFrame, emb_df: DataFrame) -> DataFrame:
    """J3/J4: vocab tokens labeled by pretrained membership via the
    probe chain — left semi/anti joins, fully relational."""
    emb_tokens = emb_df.select("token").distinct()
    exact = vocab_df.join(emb_tokens, "token", "left_semi").withColumn("probe", F.lit("exact"))
    rest = vocab_df.join(emb_tokens, "token", "left_anti")
    lower = (
        rest.join(emb_tokens, F.lower(rest.token) == emb_tokens.token, "left_semi")
        .withColumn("probe", F.lit("lower"))
    )
    rest2 = rest.join(emb_tokens, F.lower(rest.token) == emb_tokens.token, "left_anti")
    digits = (
        rest2.join(
            emb_tokens,
            F.regexp_replace(F.lower(rest2.token), r"\d", "0") == emb_tokens.token,
            "left_semi",
        ).withColumn("probe", F.lit("digits0"))
    )
    oov = rest2.join(
        emb_tokens,
        F.regexp_replace(F.lower(rest2.token), r"\d", "0") == emb_tokens.token,
        "left_anti",
    ).withColumn("probe", F.lit("oov"))
    return exact.unionByName(lower).unionByName(digits).unionByName(oov)
