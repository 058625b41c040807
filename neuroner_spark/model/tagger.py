"""Distributed BiLSTM-CRF tagging as ONE Arrow-batched mapInPandas
stage (SURVEY.md D1 — the core operator).

Reference parity: ``src/train.py :: prediction_step`` feeds the TF
graph one sentence at a time (batch size 1).  Here:

- Sentences are assembled JVM-side (groupBy + sort_array(collect_list))
  — one shuffle keyed by (doc_id, sent_id).
- A **salted repartition** on xxhash64(doc_id, sent_id) spreads the
  sentences of huge documents / hot hosts uniformly before the Python
  stage (north_rule skew handling: AQE fixes join skew, NOT UDF-stage
  skew — the salt is mandatory at 10^12 pages).
- Inside the UDF each Arrow batch (thousands of sentences) is sorted
  by length and processed in padded sub-batches, so the numpy BiLSTM
  runs [B,T,...] tensors with minimal padding waste.
- Weights travel once per executor via ``SparkContext.broadcast``.

No per-row Python anywhere: encode/forward/decode are whole-array ops.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neuroner_spark.model.bilstm_crf import forward_scores, viterbi_decode

MAX_WORD_LEN = 20
SUB_BATCH = 256

TAGGED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("sent_id", T.LongType(), False),
        T.StructField("pos", T.IntegerType(), False),
        T.StructField("token", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("label", T.StringType(), False),
    ]
)


def _encode_batch(sent_tokens: list[list[str]], vocab: dict[str, int]):
    """tokens -> (token_ids [B,T], char_ids [B,T,W], lengths [B],
    word_lengths [B,T]) — vectorized padding."""
    B = len(sent_tokens)
    lengths = np.array([len(s) for s in sent_tokens], dtype=np.int64)
    Tmax = max(1, int(lengths.max()))
    token_ids = np.zeros((B, Tmax), dtype=np.int64)
    char_ids = np.zeros((B, Tmax, MAX_WORD_LEN), dtype=np.int64)
    word_lengths = np.zeros((B, Tmax), dtype=np.int64)
    for b, sent in enumerate(sent_tokens):
        for t, tok in enumerate(sent):
            token_ids[b, t] = vocab.get(tok, 0)
            w = min(len(tok), MAX_WORD_LEN)
            word_lengths[b, t] = w
            for j in range(w):
                o = ord(tok[j])
                char_ids[b, t, j] = o if o < 128 else 0
    return token_ids, char_ids, lengths, word_lengths


def make_tag_fn(bundle_bc):
    """Build the mapInPandas function over sentence rows
    (doc_id, sent_id, toks: list[dict(pos, token, start, end)])."""

    def tag_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bundle = bundle_bc.value
        arrays, vocab, labels = bundle["arrays"], bundle["vocab"], bundle["labels"]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # sort by sentence length -> padded sub-batches waste little
            order = np.argsort([len(t) for t in pdf["toks"]], kind="stable")
            out_rows: list[pd.DataFrame] = []
            for s in range(0, len(order), SUB_BATCH):
                idx = order[s : s + SUB_BATCH]
                sents = pdf.iloc[idx]
                sent_tokens = [[w["token"] for w in toks] for toks in sents["toks"]]
                token_ids, char_ids, lengths, word_lengths = _encode_batch(sent_tokens, vocab)
                scores = forward_scores(token_ids, char_ids, lengths, word_lengths, arrays)
                pred = viterbi_decode(scores, lengths, arrays["crf_transitions"])
                recs = {
                    "doc_id": [], "sent_id": [], "pos": [], "token": [],
                    "start": [], "end": [], "label": [],
                }
                for bi, (_, row) in enumerate(sents.iterrows()):
                    for t, w in enumerate(row["toks"]):
                        recs["doc_id"].append(row["doc_id"])
                        recs["sent_id"].append(row["sent_id"])
                        recs["pos"].append(w["pos"])
                        recs["token"].append(w["token"])
                        recs["start"].append(w["start"])
                        recs["end"].append(w["end"])
                        recs["label"].append(labels[pred[bi, t]])
                out_rows.append(pd.DataFrame(recs))
            yield pd.concat(out_rows, ignore_index=True)

    return tag_batches


def tag_tokens(spark: SparkSession, tokens: DataFrame, bundle: dict, n_partitions: int | None = None) -> DataFrame:
    """tokens(doc_id, sent_id, pos, token, start, end) ->
    tagged(..., label) — BIOES labels from the broadcast model."""
    sentences = (
        tokens.groupBy("doc_id", "sent_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "token", "start", "end"))
            ).alias("toks")
        )
    )
    if n_partitions is None:
        n_partitions = spark.sparkContext.defaultParallelism * 2
    # salt on the sentence key: sentences of one huge doc (hot host)
    # spread across ALL partitions instead of hot-spotting one task
    salted = sentences.repartition(n_partitions, F.xxhash64("doc_id", "sent_id"))
    bundle_bc = spark.sparkContext.broadcast(bundle)
    return salted.mapInPandas(make_tag_fn(bundle_bc), schema=TAGGED_SCHEMA)
