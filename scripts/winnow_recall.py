"""Winnowing pair-recall vs k on a PLANTED PARTIAL-OVERLAP corpus
(r5 verdict #4).

The r5 k-sweep measured dedup recall on 10-CLONE clusters — whole-doc
duplicates, which the banded stage already owns.  Winnowing's actual
job is partial overlap: documents sharing a SUBSTRING (quotation,
mirror fragment, templated span) inside otherwise-distinct text.  This
script plants exactly that and measures, per k in {8, 16, 25} (w=4):

- pair recall at min_shared in {1, 2, 8} per planted-overlap length,
- false pairs (doc pairs linked at min_shared that share NO planted
  span — on a clone-free shared-vocabulary corpus these are the
  "common k-gram" links the r5 500k run warned about),
- over-cap (dropped) fingerprint buckets and wall.

Paper guarantee (Schleimer et al. 2003, §3): any shared substring of
length >= t = k + w - 1 chars yields >= 1 shared fingerprint — so
recall at min_shared=1 must be 1.0 for every planted span longer than
t, and the table prints t beside each k so the reader can check the
boundary row.  min_shared > 1 trades that guarantee for precision; the
expected shared-fp count for an L-char overlap is ~2(L-k+1)/(w+1), so
the L where recall@8 turns on scales linearly with k.

Corpus (deterministic, seed 7): 2,000 docs x 150 words drawn Zipf from
a 5,000-word vocabulary (shared vocab, zero planted clones), 60 planted
pairs per overlap length in {4, 8, 16, 32, 64} words (~24-390 chars).

Usage: python scripts/winnow_recall.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

SEED = 7
N_DOCS = 2000
DOC_WORDS = 150
VOCAB = 5000
PAIRS_PER_LEN = 60
OVERLAP_WORDS = [4, 8, 16, 32, 64]
KS = [8, 16, 25]
W = 4
MIN_SHARED = [1, 2, 8]
MAX_BUCKET = 1000


def build_corpus():
    rng = np.random.default_rng(SEED)
    # Zipf-ish vocab: word i has weight 1/(i+1); words are 3-8 chars
    lens = rng.integers(3, 9, size=VOCAB)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = ["".join(rng.choice(letters, size=n)) for n in lens]
    weights = 1.0 / np.arange(1, VOCAB + 1)
    weights /= weights.sum()
    docs = [
        list(rng.choice(vocab, size=DOC_WORDS, p=weights)) for _ in range(N_DOCS)
    ]
    planted = []  # (a, b, L_words, span_chars)
    used: set[int] = set()
    for L in OVERLAP_WORDS:
        for _ in range(PAIRS_PER_LEN):
            while True:
                a, b = rng.integers(0, N_DOCS, size=2)
                if a != b and a not in used and b not in used:
                    break
            used.update((int(a), int(b)))
            start = int(rng.integers(0, DOC_WORDS - L))
            span = docs[a][start : start + L]
            pos = int(rng.integers(0, DOC_WORDS - L))
            docs[b][pos : pos + L] = span
            planted.append(
                (int(min(a, b)), int(max(a, b)), L, len(" ".join(span)))
            )
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    return rows, planted


def main() -> None:
    from pyspark.sql import functions as F

    from neuroner_spark.operators.dedup import capped_buckets, winnowing_fingerprints
    from neuroner_spark.session import get_spark

    spark = get_spark(
        "winnow_recall", cores="16", shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    rows, planted = build_corpus()
    docs = spark.createDataFrame(rows, "doc_id long, text string").localCheckpoint()
    planted_set = {(a, b): (L, ch) for a, b, L, ch in planted}
    span_chars = {}
    for _, _, L, ch in planted:
        span_chars.setdefault(L, []).append(ch)

    out = {
        "corpus": {
            "n_docs": N_DOCS, "doc_words": DOC_WORDS, "vocab": VOCAB,
            "pairs_per_len": PAIRS_PER_LEN, "overlap_words": OVERLAP_WORDS,
            "mean_span_chars": {
                str(L): round(float(np.mean(v)), 1) for L, v in span_chars.items()
            },
            "seed": SEED,
        },
        "w": W, "max_bucket": MAX_BUCKET,
        "guarantee": "shared substring >= t = k+w-1 chars -> >=1 shared fp "
                     "(Schleimer et al. 2003); recall@min_shared=1 must be 1.0 "
                     "above t",
        "results": {},
    }
    for k in KS:
        t0 = time.time()
        fps = winnowing_fingerprints(docs, k=k, w=W, fast_hash=True)
        kept, giants = capped_buckets(fps, ["fp"], MAX_BUCKET)
        a = kept.select(F.col("doc_id").alias("a"), "fp")
        b = kept.select(F.col("doc_id").alias("b"), "fp")
        pairs = (
            a.join(b, "fp")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("n_shared"))
        )
        got = {(r["a"], r["b"]): r["n_shared"] for r in pairs.collect()}
        n_giants = giants.count()
        wall = round(time.time() - t0, 1)
        per_len = {}
        for L in OVERLAP_WORDS:
            keys = [p for p, (pl, _) in planted_set.items() if pl == L]
            per_len[str(L)] = {
                f"recall@{m}": round(
                    sum(1 for p in keys if got.get(p, 0) >= m) / len(keys), 3
                )
                for m in MIN_SHARED
            }
        false_pairs = {
            f"false_pairs@{m}": sum(
                1 for p, n in got.items() if n >= m and p not in planted_set
            )
            for m in MIN_SHARED
        }
        out["results"][f"k={k}"] = {
            "t_chars": k + W - 1,
            "wall_sec": wall,
            "giant_fp_buckets_dropped": n_giants,
            "recall_by_overlap_words": per_len,
            **false_pairs,
        }
        print(f"k={k}: wall {wall}s giants {n_giants} {per_len} {false_pairs}")
        sys.stdout.flush()

    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH", "winnow_recall.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"artifact: {path}")


if __name__ == "__main__":
    main()
