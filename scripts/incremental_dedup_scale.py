"""Scale evidence for the r6 incremental snapshot dedup
(`run_incremental_snapshot`): the claim is that ingesting a new crawl
snapshot costs O(snapshot) work against a SIGNATURE STORE, never a
rescan of old text — so the measurement sweeps the STORE size at a
fixed snapshot and compares against the full re-dedup it replaces.

Setup per store size R (sf0.1's 5k base docs replicated R times with
unique suffix tokens — perturbed text, the degenerate-replication
trap lesson): the store holds the banded signatures of R*5k ingested
docs as bands/snapshot=0.  The snapshot is fixed at 50k docs of three
planted kinds: 25k near-replicas of store docs (-> dup_of_corpus),
25k word-REVERSED docs in 5-member clusters (novel vs the store —
3-gram shingles are order-sensitive — but near-dups of each other ->
~20k dup_of_batch + ~5k kept).

Legs (fresh JVM each, pure-python load probes bracketing; size legs
and two-size legs INTERLEAVED across rounds — a single leg per
configuration reads CC-path run variance as a trend):
  - incremental ingest at store sizes 100k / 200k / 400k (p=32):
    wall growth with store size should be the band-index aggregation
    only (sublinear in wall, nothing text-sized);
  - FULL re-dedup (`near_dedup_corpus`) of store+snapshot at the
    largest size: the wall the incremental path replaces;
  - the north-rule two-size treatment (p=2 vs p=8) at the largest
    store, with per-leg CC walls: at a 50k-doc snapshot the wall is
    dominated by parallelism-INDEPENDENT cost (CC rounds + per-job
    scheduler latency), so the efficiency number here measures the
    fixed-cost floor — the compute core's scaling is evidenced by the
    5M-doc corpus_scaling run, and the CC decomposition in this
    artifact is what shows the difference is floor, not plan.

Writes BENCH/incremental_dedup_scale.json.
Usage: python scripts/incremental_dedup_scale.py [snapshot_per_kind] [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

JOB = """
import json, sys, time
sys.path.insert(0, {repo!r})

def probe():
    t0 = time.perf_counter(); x = 0
    for i in range(2_000_000): x += i * i % 7
    return round(time.perf_counter() - t0, 3)

mode, store_dir, snap_dir, cpus = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
from neuroner_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("incr_scale", cores=cpus, shuffle_partitions=int(cpus),
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
snap = spark.read.parquet(snap_dir)
p0 = probe()
t0 = time.time()
if mode == "incremental":
    from neuroner_spark.plans.corpus_pipeline import run_incremental_snapshot
    it_log = []
    r = run_incremental_snapshot(spark, snap, store_dir, snapshot_id=1,
                                 fast_hash=True, iteration_log=it_log)
    wall = round(time.time() - t0, 3)
    cc_wall = round(sum(x["wall_sec"] for x in it_log), 3)
    out = {{"wall_s": wall, "n_kept": r["n_kept"],
            "n_dup_of_corpus": r["n_dup_of_corpus"],
            "n_dup_of_batch": r["n_dup_of_batch"],
            "cc_rounds": len(it_log), "cc_wall_s": cc_wall}}
else:  # full re-dedup of store text + snapshot (what incremental replaces)
    from neuroner_spark.operators.dedup import near_dedup_corpus
    store_docs = spark.read.parquet(sys.argv[5])
    both = store_docs.unionByName(snap)
    res = near_dedup_corpus(both, fast_hash=True, warn_giants=False)
    keeps = res.filter("keep").count()
    wall = round(time.time() - t0, 3)
    out = {{"wall_s": wall, "keeps": keeps, "n_docs": both.count()}}
out["probe_sec"] = [p0, probe()]
print(json.dumps(out))
"""


def main() -> None:
    per_kind = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from neuroner_spark.operators.dedup import minhash_banded
    from neuroner_spark.session import get_spark

    spark = get_spark(
        "incr_scale_prep", cores="32", shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n_base = base.count()
    root = tempfile.mkdtemp(prefix="incr_scale_")

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

    store_sizes = {}
    for R in (20, 40, 80):
        sdir = os.path.join(root, f"store_r{R}")
        docs_dir = os.path.join(root, f"storedocs_r{R}")
        ingested = replicas(R, 0, "zrep").repartition(64, F.xxhash64("doc_id"))
        ingested.write.mode("overwrite").parquet(docs_dir)
        minhash_banded(
            spark.read.parquet(docs_dir), fast_hash=True
        ).write.mode("overwrite").parquet(os.path.join(sdir, "bands", "snapshot=0"))
        store_sizes[R] = {"store_dir": sdir, "docs_dir": docs_dir, "n_store": R * n_base}

    snap_reps = max(1, per_kind // n_base)
    snap_dir = os.path.join(root, "snapshot")
    snap = (
        # near-replicas of store docs (rep ids beyond every store's range)
        replicas(snap_reps, 1000, "zsnapdup")
        # word-reversed 5-member-cluster batches of fresh content
        .unionByName(replicas(snap_reps, 2000, "zfresh", reverse=True))
        .repartition(32, F.xxhash64("doc_id"))
    )
    snap.write.mode("overwrite").parquet(snap_dir)
    n_snap = snap.count()
    spark.stop()

    job = JOB.format(repo=REPO)

    def run(mode: str, store_dir: str, extra: list[str], cpus: int = 32) -> dict:
        p = subprocess.run(
            [sys.executable, "-c", job, mode, store_dir, snap_dir, str(cpus), *extra],
            capture_output=True, text=True, timeout=7200,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-2000:])
            raise SystemExit(f"{mode} {store_dir} failed")
        r = json.loads(line[-1])
        print(mode, os.path.basename(store_dir), json.dumps(r))
        sys.stdout.flush()
        return r

    import statistics

    # interleaved rounds (the repo's two-size protocol lesson): the CC
    # path swings 1.2-4x run to run, so a single leg per size reads as
    # a store-size trend that isn't there — rounds hit every size
    # under the same drift and the medians compare
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    samples: dict[int, list] = {cfg["n_store"]: [] for cfg in store_sizes.values()}
    for _ in range(rounds):
        for R, cfg in store_sizes.items():
            samples[cfg["n_store"]].append(run("incremental", cfg["store_dir"], []))
    incr = {}
    for n_store, legs in samples.items():
        incr[n_store] = {
            "wall_s_median": round(statistics.median(r["wall_s"] for r in legs), 3),
            "wall_s_samples": [r["wall_s"] for r in legs],
            "probe_sec": [r["probe_sec"] for r in legs],
            **{k: legs[0][k] for k in ("n_kept", "n_dup_of_corpus", "n_dup_of_batch")},
        }
    big = store_sizes[80]
    full = run("full", big["store_dir"], [big["docs_dir"]])

    # the north-rule two-size treatment for the NEW path: same snapshot
    # ingest at N=2 and 4N=8 cores against the largest store,
    # interleaved legs (this box's 32 shared vCPUs only genuinely
    # offer ~4x hardware up to p=8 — BENCH/BASELINE.md convention)
    two_size = {2: [], 8: []}
    for _ in range(rounds):
        for cpus in (8, 2):
            two_size[cpus].append(run("incremental", big["store_dir"], [], cpus=cpus))
    med2 = statistics.median(r["wall_s"] for r in two_size[2])
    med8 = statistics.median(r["wall_s"] for r in two_size[8])

    out = {
        "n_snapshot": n_snap,
        "snapshot_kinds": {
            "near_replicas_of_store": snap_reps * n_base,
            "fresh_reversed_clusters": snap_reps * n_base,
            "cluster_size_fresh": snap_reps,
        },
        "incremental_by_store_size": incr,
        "full_rededup_at_largest": full,
        "speedup_vs_full_at_largest": round(
            full["wall_s"] / incr[big["n_store"]]["wall_s_median"], 2
        ),
        "two_size_at_largest": {
            "p2_wall_s": [r["wall_s"] for r in two_size[2]],
            "p8_wall_s": [r["wall_s"] for r in two_size[8]],
            "p2_cc_wall_s": [r.get("cc_wall_s") for r in two_size[2]],
            "p8_cc_wall_s": [r.get("cc_wall_s") for r in two_size[8]],
            "p2_probes": [r["probe_sec"] for r in two_size[2]],
            "p8_probes": [r["probe_sec"] for r in two_size[8]],
            "efficiency_2_to_8_median": round(med2 / med8 / 4, 3),
        },
        "note": "incremental wall growth with store size is the band-index "
                "aggregation only (no text-sized input); full re-dedup "
                "rescans and re-bands every ingested doc",
    }
    shutil.rmtree(root, ignore_errors=True)
    path = os.path.join(REPO, "BENCH", "incremental_dedup_scale.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
