"""vocab_limit broadcast-vs-SMJ crossover for the bigram-LM gate
(r6 candidate #5): the operator's scale note says the count tables are
"typically broadcastable" once ``vocab_limit`` bounds them — this
measures that claim at 5M docs instead of asserting it.

Per leg (one JVM, legs sequential — the corpus frame is rebuilt per
leg so nothing is warm-cached across limits): score the corpus under
vocab_limit in {None, 2k, 20k, 200k}, record
  - wall for the full score+reduce (count of finite-ppl docs),
  - history/bigram count-table sizes (the broadcast candidates),
  - the FINAL AQE plan's join strategies (BroadcastHashJoin vs
    SortMergeJoin occurrences) read off the executed plan.

Corpus: sf0.1 documents replicated with id-shift + suffix perturbation
(the degenerate-replication trap lesson) — identical replicas would
collapse the bigram tables and hide the SMJ side entirely.

Writes BENCH/lm_crossover.json.
Usage: python scripts/lm_crossover.py [replicate]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def probe() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i * i % 7
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from neuroner_spark.operators.quality_lm import bigram_lm_scores
    from neuroner_spark.session import get_spark

    spark = get_spark(
        "lm_crossover", cores="32", shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    docs = (
        base.crossJoin(spark.range(reps).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(1_000_000_000))
        .withColumn("text", F.concat(F.col("text"), F.lit(" zl"), F.col("rep").cast("string")))
        .drop("rep")
        .repartition(64, F.xxhash64("doc_id"))
        .localCheckpoint()
    )
    n_docs = docs.count()

    legs = []
    for limit in (None, 2_000, 20_000, 200_000):
        p0 = probe()
        t0 = time.time()
        scores = bigram_lm_scores(docs, vocab_limit=limit)
        # one action whose executed plan CONTAINS the scoring joins:
        # the final AQE plan then records what the joins actually ran as
        cnt_df = scores.filter(F.col("ppl").isNotNull()).groupBy().count()
        n_scored = cnt_df.collect()[0][0]
        wall = round(time.time() - t0, 3)
        plan = cnt_df._jdf.queryExecution().executedPlan().toString()
        # count-table sizes (the broadcast candidates) — measured after
        # the timed leg so the wall is the production path only
        pairs_tables = {}
        if limit is None:
            from neuroner_spark.operators.quality_lm import _bigram_pairs

            pr = _bigram_pairs(docs, "doc_id", "text")
            pairs_tables = {
                "history_rows": pr.select("prev").distinct().count(),
                "bigram_rows": pr.select("prev", "tok").distinct().count(),
            }
        legs.append(
            {
                "vocab_limit": limit,
                "wall_s": wall,
                "n_scored": n_scored,
                "probe_sec": [p0, probe()],
                "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
                "sort_merge_joins": plan.count("SortMergeJoin"),
                **pairs_tables,
            }
        )
        print(json.dumps(legs[-1]))
        sys.stdout.flush()

    out = {
        "n_docs": n_docs,
        "replicate": reps,
        "legs": legs,
        "note": "join counts are from the FINAL adaptive plan of the scoring "
                "action; the crossover claim holds when bounded-vocab legs "
                "run the count-table joins as broadcasts and the unbounded "
                "leg falls back to SMJ",
    }
    with open(os.path.join(REPO, "BENCH", "lm_crossover.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "legs"}))


if __name__ == "__main__":
    main()
