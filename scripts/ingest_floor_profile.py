"""Decompose the incremental snapshot-ingest wall (r6 candidate #1):
the two-size gate in BENCH/incremental_dedup_scale.json measured
efficiency ~0.36 from p2->p8 and attributed it to a fixed-cost floor —
this profile names the floor per SUB-STAGE so the attribution is a
measurement, not an inference.

Per leg (fresh JVM, p in {2, 8}, interleaved rounds, probes):
  band_snapshot   minhash_banded(snapshot) materialized
  band_index      store groupBy(band_id, band_hash) -> min doc
  corpus_hits     snapshot-bands x index equi-join, groupBy doc
  within_batch    near_dedup_from_banded over the survivors
plus the partition counts each stage actually ran with — the
conditional re-shard / under-split hypotheses are checked here.

Setup mirrors scripts/incremental_dedup_scale.py at store 400k /
snapshot 50k (sf0.1 docs replicated with perturbed text).

Writes BENCH/ingest_floor_profile.json.
Usage: python scripts/ingest_floor_profile.py [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

JOB = """
import json, sys, time
sys.path.insert(0, {repo!r})

def probe():
    t0 = time.perf_counter(); x = 0
    for i in range(2_000_000): x += i * i % 7
    return round(time.perf_counter() - t0, 3)

store_bands, snap_dir, cpus = sys.argv[1], sys.argv[2], sys.argv[3]
from neuroner_spark.session import get_spark
from pyspark.sql import functions as F
from neuroner_spark.operators.dedup import minhash_banded, near_dedup_from_banded

spark = get_spark("floor_profile", cores=cpus, shuffle_partitions=int(cpus),
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
snap = spark.read.parquet(snap_dir)
corpus_banded = spark.read.parquet(store_bands)
p0 = probe()
walls, parts = {{}}, {{}}
parts["snap_read"] = snap.rdd.getNumPartitions()

t = time.time()
banded_new = minhash_banded(snap, fast_hash=True).persist()
n_banded = banded_new.count()
walls["band_snapshot"] = round(time.time() - t, 3)
parts["banded_new"] = banded_new.rdd.getNumPartitions()

t = time.time()
band_index = corpus_banded.groupBy("band_id", "band_hash").agg(
    F.min("doc_id").alias("first_doc")).persist()
n_index = band_index.count()
walls["band_index"] = round(time.time() - t, 3)
parts["band_index"] = band_index.rdd.getNumPartitions()

t = time.time()
hits = (banded_new.join(band_index, ["band_id", "band_hash"])
        .groupBy("doc_id").agg(F.min("first_doc").alias("dup_of")).persist())
n_hits = hits.count()
walls["corpus_hits"] = round(time.time() - t, 3)

t = time.time()
all_new = snap.select(F.col("doc_id").cast("long").alias("doc_id")).distinct()
surviving = banded_new.join(hits.select("doc_id"), "doc_id", "left_anti")
surv_docs = all_new.join(hits.select("doc_id"), "doc_id", "left_anti")
it_log = []
within = near_dedup_from_banded(surviving, surv_docs, 1000, iteration_log=it_log)
n_within = within.count()
walls["within_batch"] = round(time.time() - t, 3)
walls["within_cc"] = round(sum(x["wall_sec"] for x in it_log), 3)

out = {{"walls": walls, "parts": parts, "probe_sec": [p0, probe()],
        "n": {{"banded_new": n_banded, "band_index": n_index,
               "corpus_hits": n_hits, "within": n_within}}}}
print(json.dumps(out))
"""


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from neuroner_spark.operators.dedup import minhash_banded
    from neuroner_spark.session import get_spark

    spark = get_spark(
        "floor_profile_prep", cores="32", shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n_base = base.count()
    root = tempfile.mkdtemp(prefix="floor_profile_")

    def replicas(reps: int, id_offset: int, suffix: str, reverse: bool = False):
        text = F.col("text")
        if reverse:
            text = F.array_join(F.reverse(F.split(F.col("text"), " ")), " ")
        return (
            base.crossJoin(spark.range(reps).withColumnRenamed("id", "rep"))
            .withColumn(
                "doc_id",
                F.col("doc_id") + (F.col("rep") + F.lit(id_offset)) * F.lit(1_000_000_000),
            )
            .withColumn(
                "text", F.concat(text, F.lit(f" {suffix}"), F.col("rep").cast("string"))
            )
            .drop("rep")
        )

    store_bands = os.path.join(root, "store_bands")
    store_docs = replicas(80, 0, "zrep").repartition(64, F.xxhash64("doc_id"))
    minhash_banded(store_docs, fast_hash=True).write.mode("overwrite").parquet(store_bands)
    snap_dir = os.path.join(root, "snapshot")
    snap = (
        replicas(5, 1000, "zsnapdup")
        .unionByName(replicas(5, 2000, "zfresh", reverse=True))
        .repartition(32, F.xxhash64("doc_id"))
    )
    snap.write.mode("overwrite").parquet(snap_dir)
    n_store, n_snap = 80 * n_base, snap.count()
    spark.stop()

    job = JOB.format(repo=REPO)
    legs: dict[int, list] = {2: [], 8: []}
    for _ in range(rounds):
        for cpus in (8, 2):
            p = subprocess.run(
                [sys.executable, "-c", job, store_bands, snap_dir, str(cpus)],
                capture_output=True, text=True, timeout=3600,
            )
            lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
            if not lines:
                print(p.stdout[-2000:], p.stderr[-2000:])
                raise SystemExit(f"p{cpus} leg failed")
            r = json.loads(lines[-1])
            legs[cpus].append(r)
            print(f"p{cpus}:", json.dumps(r))
            sys.stdout.flush()

    import statistics

    def med(cpus, key):
        return round(statistics.median(x["walls"][key] for x in legs[cpus]), 3)

    stages = ["band_snapshot", "band_index", "corpus_hits", "within_batch"]
    summary = {
        s: {
            "p2_median_s": med(2, s),
            "p8_median_s": med(8, s),
            "speedup_2_to_8": round(med(2, s) / max(med(8, s), 1e-9), 2),
        }
        for s in stages
    }
    out = {
        "n_store": n_store,
        "n_snapshot": n_snap,
        "rounds": rounds,
        "legs": {f"p{c}": v for c, v in legs.items()},
        "stage_summary": summary,
        "note": "speedup_2_to_8 near 4 = compute-bound stage; near 1 = the "
                "fixed-cost floor the two-size gate measures",
    }
    path = os.path.join(REPO, "BENCH", "ingest_floor_profile.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary, indent=1))
    shutil.rmtree(root)


if __name__ == "__main__":
    main()
