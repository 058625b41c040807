"""Scale evidence for the r6 SimHash Hamming-dedup path
(`simhash_near_dedup`): wall at two parallelism levels (N=2 and 4N=8
cores — the repo's scaling convention, BENCH/BASELINE.md: this box's
32 vCPUs are shared, a busy loop gains only ~2.3x from 8->32, so 4x
hardware genuinely exists only up to ~8) on a 500k-doc
perturbed-replica corpus, plus one p=32 throughput leg and a same-box
A/B against the MinHash banded path (`near_dedup_corpus`) on the SAME
corpus — the two methods answer the same question (near-dup keeps)
with different evidence, so their walls and keep counts belong side
by side.

Corpus shape matches scripts/corpus_scaling.py: every sf0.1 document
replicated `replicate` times with a unique suffix token, so replicas
are textually distinct but signature-near — each base doc becomes a
~replicate-member near-dup cluster.  The simhash leg runs
max_bucket=2*replicate: over-cap block values are DROPPED (a simhash
block match is partial evidence — the first run of this script proved
star-edging them chains unrelated docs, 500k docs -> 184 keeps), so
the cap must sit above the expected near-cluster size or the cluster's
own blocks starve; within-cluster pairing is the method's inherent
O(cluster^2) term, which is why exact-signature piles compress first.
Fresh JVM per leg (subprocess) so JIT/cache state can't leak across
sizes; per-leg pure-python load probes recorded so a loaded leg is
visible in the artifact.

Usage: python scripts/simhash_dedup_scale.py [replicate] [sf_dir]
Writes BENCH/simhash_dedup_scale.json.
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

cpus, corpus_dir, method, max_bucket = (
    sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]))
from neuroner_spark.session import get_spark
spark = get_spark("simhash_scale", cores=cpus, shuffle_partitions=int(cpus),
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
docs = spark.read.parquet(corpus_dir)
n_docs = docs.count()
p0 = probe()
t0 = time.time()
it_log = []
# stage walls: sub-0.8 small-corpus efficiency is a serial-share
# question, so the artifact must say WHERE the wall sits — the
# signature/banded scan (parallel), the CC rounds (many small jobs,
# mostly per-job fixed cost), or the pair+join remainder
if method == "simhash":
    from neuroner_spark.operators.dedup import simhash, simhash_near_dedup
    sig = simhash(docs, bits=64, fast_hash=True).localCheckpoint()
    t_scan = round(time.time() - t0, 3)
    out = simhash_near_dedup(docs, bits=64, max_hamming=3, fast_hash=True,
                             max_bucket=max_bucket, iteration_log=it_log,
                             signatures=sig)
else:
    from neuroner_spark.operators.dedup import minhash_banded, near_dedup_from_banded
    from pyspark.sql import functions as F
    banded = minhash_banded(docs, n=3, bands=4, fast_hash=True).localCheckpoint()
    t_scan = round(time.time() - t0, 3)
    out = near_dedup_from_banded(
        banded, docs.select(F.col("doc_id")).distinct(), max_bucket=max_bucket,
        iteration_log=it_log)
keeps = out.filter("keep").count()
wall = round(time.time() - t0, 3)
p1 = probe()
cc_wall = round(sum(r["wall_sec"] for r in it_log), 3)
print(json.dumps({{"wall_s": wall, "keeps": keeps, "n_docs": n_docs,
                   "cc_rounds": len(it_log), "probe_sec": [p0, p1],
                   "stage_walls": {{"scan": t_scan, "cc_rounds": cc_wall,
                                    "pair_join": round(wall - t_scan - cc_wall, 3)}}}}))
"""


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from neuroner_spark.session import get_spark

    spark = get_spark(
        "simhash_scale_prep", cores="32", shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    corpus_dir = tempfile.mkdtemp(prefix=f"simhash_x{replicate}_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    big = (
        docs.crossJoin(spark.range(replicate).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(1_000_000_000))
        .withColumn("text", F.concat(F.col("text"), F.lit(" zrep"), F.col("rep").cast("string")))
        .drop("rep")
        .repartition(64, F.xxhash64("doc_id"))
    )
    big.write.mode("overwrite").parquet(corpus_dir)
    spark.stop()

    job = JOB.format(repo=REPO)

    # simhash: over-cap blocks DROP, so the cap must exceed the
    # planted cluster size (replicate) plus key-collision slack;
    # minhash: giant buckets star-edge safely (band match = whole-doc
    # evidence), so the production cap of 50 stands
    sim_bucket, min_bucket = 2 * replicate, 50

    def run(cpus: int, method: str, max_bucket: int) -> dict:
        p = subprocess.run(
            [sys.executable, "-c", job, str(cpus), corpus_dir, method, str(max_bucket)],
            capture_output=True, text=True, timeout=7200,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-2000:])
            raise SystemExit(f"{method} cpus={cpus} failed")
        r = json.loads(line[-1])
        print(f"{method} p={cpus}: wall {r['wall_s']}s keeps {r['keeps']} "
              f"cc_rounds {r['cc_rounds']} probes {r['probe_sec']}")
        sys.stdout.flush()
        return r

    # interleave sizes so hypervisor drift hits both legs alike
    legs = {8: [], 2: []}
    for _ in range(rounds):
        for cpus in (8, 2):
            legs[cpus].append(run(cpus, "simhash", sim_bucket))
    through32 = run(32, "simhash", sim_bucket)
    minhash32 = run(32, "minhash", min_bucket)
    shutil.rmtree(corpus_dir, ignore_errors=True)

    med8 = statistics.median(r["wall_s"] for r in legs[8])
    med2 = statistics.median(r["wall_s"] for r in legs[2])
    best8 = min(legs[8], key=lambda r: sum(r["probe_sec"]))
    best2 = min(legs[2], key=lambda r: sum(r["probe_sec"]))
    n_docs = legs[8][0]["n_docs"]
    out = {
        "replicate": replicate,
        "n_docs": n_docs,
        "simhash_max_bucket": sim_bucket,
        "minhash_max_bucket": min_bucket,
        "simhash_wall_s": {"p2": [r["wall_s"] for r in legs[2]],
                           "p8": [r["wall_s"] for r in legs[8]]},
        "simhash_probes": {"p2": [r["probe_sec"] for r in legs[2]],
                           "p8": [r["probe_sec"] for r in legs[8]]},
        "simhash_keeps": legs[8][0]["keeps"],
        "cc_rounds": legs[8][0]["cc_rounds"],
        # per-stage walls of the lowest-load leg at each size: where
        # the serial share sits (scan parallelizes; CC rounds are
        # per-job fixed cost; pair_join is the remainder)
        "stage_walls": {"p2": best2["stage_walls"], "p8": best8["stage_walls"],
                        "p32": through32["stage_walls"]},
        "simhash_wall_s_p32": through32["wall_s"],
        "docs_per_sec_p32": round(n_docs / through32["wall_s"], 1),
        # N -> 4N scaling efficiency, median and lowest-load pair
        "efficiency_2_to_8_median": round(med2 / med8 / 4, 3),
        "efficiency_2_to_8_best_pair": round(best2["wall_s"] / best8["wall_s"] / 4, 3),
        "minhash_wall_s_p32": minhash32["wall_s"],
        "minhash_keeps": minhash32["keeps"],
    }
    suffix = "" if replicate == 100 else f"_x{replicate}"
    path = os.path.join(REPO, "BENCH", f"simhash_dedup_scale{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
