"""Measured benefit of ``compact_band_store`` (r6): snapshot-ingest
wall against a RAW band store vs the same store compacted.

The setup where compaction collapses rows is the documented seeding
path (`run_incremental_snapshot` docstring): snapshot 0 is a batch
corpus-prep run's ``banded`` stage, which is PRE-dedup — every doc's
bands, near-dup clusters and boilerplate included — so band keys are
shared by many docs.  Here the seed is sf0.1's 5k docs replicated R
times VERBATIM (every replica shares all bands -> raw rows ~ R x
keys), the worst honest case for the raw store and the shape a
boilerplate-heavy crawl seed actually has.  Post-seed snapshots append
only kept docs, whose bands are unique by construction (sharing a
band means rejection), so the raw/compacted gap is set at seeding and
persists until compaction folds it.

Legs (fresh JVM each, interleaved across rounds, pure-python load
probes): the SAME 50k-doc snapshot ingested against (a) the raw
seeded store, (b) the compacted store.  Identical decisions asserted
between the legs (min-fold associativity), walls + store row/file
counts recorded.

Writes BENCH/compaction_scale.json.
Usage: python scripts/compaction_scale.py [replicas] [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
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

store_dir, snap_dir, cpus = sys.argv[1], sys.argv[2], sys.argv[3]
from neuroner_spark.session import get_spark
spark = get_spark("compact_scale", cores=cpus, shuffle_partitions=int(cpus),
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
snap = spark.read.parquet(snap_dir)
p0 = probe()
t0 = time.time()
from neuroner_spark.plans.corpus_pipeline import run_incremental_snapshot
r = run_incremental_snapshot(spark, snap, store_dir, snapshot_id=1, fast_hash=True)
wall = round(time.time() - t0, 3)
dec = sorted((x["doc_id"], x["status"], x["dup_of"])
             for x in r["decisions"].collect())
import hashlib
dhash = hashlib.md5(json.dumps(dec).encode()).hexdigest()
print(json.dumps({{"wall_s": wall, "n_kept": r["n_kept"],
                   "n_dup_of_corpus": r["n_dup_of_corpus"],
                   "n_dup_of_batch": r["n_dup_of_batch"],
                   "decisions_md5": dhash,
                   "probe_sec": [p0, probe()]}}))
"""


def main() -> None:
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from neuroner_spark.operators.dedup import minhash_banded
    from neuroner_spark.plans.corpus_pipeline import compact_band_store
    from neuroner_spark.session import get_spark

    spark = get_spark(
        "compact_scale_prep", cores="32", shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n_base = base.count()
    root = tempfile.mkdtemp(prefix="compact_scale_")

    # seed: R verbatim replicas, banded PRE-dedup (the batch `banded`
    # stage shape) — one snapshot=0 partition per replica so the raw
    # store also carries the many-partition layout a long crawl has
    seed = (
        base.crossJoin(spark.range(R).withColumnRenamed("id", "rep"))
        .withColumn(
            "doc_id",
            F.col("doc_id") + F.col("rep") * F.lit(1_000_000_000),
        )
        .drop("rep")
    )
    raw_store = os.path.join(root, "raw_store")
    minhash_banded(seed, fast_hash=True).repartition(64).write.mode(
        "overwrite"
    ).parquet(os.path.join(raw_store, "bands", "snapshot=0"))

    comp_store = os.path.join(root, "comp_store")
    shutil.copytree(raw_store, comp_store)
    t0 = time.time()
    info = compact_band_store(spark, comp_store, prune=True)
    compact_wall = round(time.time() - t0, 3)

    def count_files(d):
        return sum(len(fs) for _, _, fs in os.walk(d))

    stores = {
        "raw": {"dir": raw_store, "files": count_files(raw_store)},
        "compacted": {"dir": comp_store, "files": count_files(comp_store)},
    }

    # snapshot: near-replicas of seed docs + fresh reversed clusters
    snap_reps = max(1, 25_000 // n_base)
    rev = F.array_join(F.reverse(F.split(F.col("text"), " ")), " ")

    def replicas(id_offset, suffix, text_col):
        return (
            base.crossJoin(spark.range(snap_reps).withColumnRenamed("id", "rep"))
            .withColumn(
                "doc_id",
                F.col("doc_id") + (F.col("rep") + F.lit(id_offset)) * F.lit(1_000_000_000),
            )
            .withColumn(
                "text",
                F.concat(text_col, F.lit(f" {suffix}"), F.col("rep").cast("string")),
            )
            .drop("rep")
        )

    snap_dir = os.path.join(root, "snapshot")
    replicas(2000, "zsnapdup", F.col("text")).unionByName(
        replicas(4000, "zfresh", rev)
    ).repartition(32, F.xxhash64("doc_id")).write.mode("overwrite").parquet(snap_dir)
    spark.stop()

    job = JOB.format(repo=REPO)

    def run(store_dir: str) -> dict:
        p = subprocess.run(
            [sys.executable, "-c", job, store_dir, snap_dir, "32"],
            capture_output=True, text=True, timeout=7200,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-2000:])
            raise SystemExit(f"leg failed for {store_dir}")
        r = json.loads(line[-1])
        print(os.path.basename(store_dir), json.dumps(r))
        sys.stdout.flush()
        return r

    legs = {"raw": [], "compacted": []}
    for _ in range(rounds):
        for kind in ("raw", "compacted"):
            legs[kind].append(run(stores[kind]["dir"]))
            # retried snapshot partitions must not leak between legs
            for sub in ("bands/snapshot=1", "decisions/snapshot=1"):
                shutil.rmtree(os.path.join(stores[kind]["dir"], sub), ignore_errors=True)

    hashes = {r["decisions_md5"] for rs in legs.values() for r in rs}
    assert len(hashes) == 1, f"decision divergence between legs: {hashes}"

    med = {k: statistics.median(r["wall_s"] for r in rs) for k, rs in legs.items()}
    out = {
        "seed": {"replicas": R, "n_docs": R * n_base,
                 "n_raw_band_rows": info["n_raw_rows"],
                 "n_band_keys": info["n_band_keys"],
                 "row_collapse": round(info["n_raw_rows"] / max(1, info["n_band_keys"]), 2)},
        "compact_wall_s": compact_wall,
        "store_files": {k: v["files"] for k, v in stores.items()},
        "ingest_wall_s": {
            k: {"median": round(med[k], 3),
                "samples": [r["wall_s"] for r in rs],
                "probes": [r["probe_sec"] for r in rs]}
            for k, rs in legs.items()
        },
        "speedup_raw_over_compacted": round(med["raw"] / med["compacted"], 2),
        "decisions_identical_across_legs": True,
        "counts": {k: legs["raw"][0][k] for k in
                   ("n_kept", "n_dup_of_corpus", "n_dup_of_batch")},
        "note": "seed is a pre-dedup batch `banded` stage (the documented "
                "seeding path) — the case where raw band rows >> band keys; "
                "post-seed appends are key-unique by construction so the gap "
                "persists until compaction folds it",
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "compaction_scale.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
