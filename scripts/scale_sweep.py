"""Scale-anomaly sweep: run every registry query at sf0.1 and on an
N-times id-shifted union of the same tables, flag superlinear wall
time or pair-blowup row growth.

This is the tool that caught the r4 dedup_embedding hole (10x vectors
-> 108x pairs): replicate-by-id-shift plus ONE cold run per scale is
the cheapest quadratic-shape detector — per-query best-of benchmarks
hid it for three rounds because the toy inputs never had hot blocks.

Usage: python scripts/scale_sweep.py [factor] [sf_dir]
Prints one line per query: name, x1 wall/rows, xN wall/rows, FLAG when
wall grows > 4x past the noise floor or rows grow > 3N x.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# id column to shift per table; None = dimension side, copied once
TABLE_IDS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "user_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "customer": None,
    "supplier": None,
    "part": None,
    "nation": None,
    "region": None,
}


# known-and-documented scale behaviors (printed but not counted as
# failures): the EXACT jaccard generator's output is the true pair
# set, and a replicate-by-N corpus really has ~N^2/2 jaccard-1.0
# pairs per clone group (see ngram_jaccard_pairs' docstring — the
# pipeline runs exact_dedup first / near_dedup_corpus instead)
EXPECTED_FLAGS = {"dedup_jaccard"}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    import __spark_entry__

    from pyspark.sql import functions as F

    from neuroner_spark.session import get_spark

    spark = get_spark(
        "scale_sweep",
        cores="32",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    xdir = tempfile.mkdtemp(prefix=f"sweep_x{factor}_")
    for t, idc in TABLE_IDS.items():
        src = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        if idc is None:
            scaled = src
        else:
            copies = [
                src.withColumn(idc, F.col(idc) + F.lit(i * 1_000_000_000))
                for i in range(factor)
            ]
            scaled = copies[0]
            for c in copies[1:]:
                scaled = scaled.unionByName(c)
        scaled.write.mode("overwrite").parquet(f"{xdir}/{t}.parquet")
    n_flags = 0
    for name, fn in __spark_entry__.queries().items():
        try:
            t0 = time.time()
            n1 = fn(spark, sf_dir).count()
            t1 = time.time() - t0
            t0 = time.time()
            nx = fn(spark, xdir).count()
            tx = time.time() - t0
            flag = tx > 4 * max(t1, 0.5) or (n1 and nx > 3 * factor * n1)
            expected = name in EXPECTED_FLAGS
            n_flags += bool(flag and not expected)
            suffix = "  <-- FLAG (expected, documented)" if (flag and expected) else (
                "  <-- FLAG" if flag else ""
            )
            print(f"{name}: x1={t1:.2f}s/{n1} x{factor}={tx:.2f}s/{nx}{suffix}")
        except Exception as e:  # keep sweeping past a broken query
            n_flags += 1
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:140]}  <-- FLAG")
        sys.stdout.flush()
    shutil.rmtree(xdir, ignore_errors=True)
    print(f"\n{n_flags} flagged")
    sys.exit(1 if n_flags else 0)


if __name__ == "__main__":
    main()
