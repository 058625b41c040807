"""Round-7 A/B: batch-vectorized ASCII tokenizer vs the round-start
per-token loop, at sf0.1 and a 10x-unioned corpus (the "optimizations
must hold at both sizes" check).  The loop variant below is a verbatim
copy of the round-start ``_tokenize_batches`` body; both variants run
through the same mapInPandas harness and are count-verified equal.

Usage: python scripts/ab_tokenize_r07.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from typing import Iterator

import pandas as pd

sys.path.insert(0, ".")


def _loop_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # round-start implementation (columnar assembly, per-token loop)
    import numpy as np

    from neuroner_spark.functions.tokenize import SENT_END, TOKEN_RE

    for pdf in batches:
        doc_ids, counts = [], []
        sids, poss, toks, starts, ends = [], [], [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            if text is None:
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from neuroner_spark.session import get_spark

    spark = get_spark(
        "ab_tokenize_r07",
        cores=cpus,
        shuffle_partitions=max(int(cpus), 8) if cpus != "*" else 32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    from pyspark.sql import functions as F

    from neuroner_spark.functions.tokenize import TOKENS_SCHEMA, _tokenize_batches

    n_workers = 32 if cpus == "*" else int(cpus)
    spark.range(n_workers * 2).repartition(n_workers * 2).mapInPandas(
        lambda it: (pd.DataFrame({"x": [1]}) for _ in it), "x int"
    ).count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def corpus(mult: int):
        if mult == 1:
            return docs
        copies = [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000))
            for i in range(mult)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        return out

    def run(d, fn):
        narrow = d.select(F.col("doc_id").cast("string").alias("doc_id"), "text")
        sc = spark.sparkContext
        narrow = narrow.repartition(sc.defaultParallelism, F.xxhash64("doc_id"))
        out = narrow.mapInPandas(fn, schema=TOKENS_SCHEMA)
        t0 = time.time()
        n = out.count()
        return time.time() - t0, n

    for mult in (1, 10):
        d = corpus(mult)
        d.count()
        for name, fn in [("loop", _loop_batches), ("vector", _tokenize_batches)]:
            walls, n = [], None
            for _ in range(3):
                w, n = run(d, fn)
                walls.append(round(w, 3))
            print(f"x{mult:<2d} {name:6s} n_tokens={n} best={min(walls):7.3f} samples={walls}")


if __name__ == "__main__":
    main()
