"""Corpus-prep scaling at a size where COMPUTE dominates the stage
barriers (r4 verdict #6).

The r4 two-size decomposition at 50k docs measured F ~= 33 s of
fixed stage-barrier cost vs C ~= 2.6 s of parallel compute — the
claimed efficiency rested on extrapolating T = F + C/p.  This script
replaces the extrapolation with a direct measurement: the FULL
materialized corpus-prep pipeline on a replicate-1000x corpus
(5M docs from sf0.1), run at local[2] and local[8] in fresh JVMs
(same N->4N convention as scripts/bench_scaling.py: the host's 32
vCPUs are shared, so 4x hardware genuinely exists only up to ~8),
efficiency = (T_2 / T_8) / 4.

r6 (r5 verdict #6): MEDIAN-OF-3 legs, interleaved (8,2,8,2,8,2) so a
load drift hits both sizes symmetrically, each leg bracketed by its
own pure-python load probes inside the fresh JVM; efficiency is
reported from the median pair, the best (lowest-load) pair, and every
leg's raw walls + probes are recorded.  The per-stage analysis names
the stages whose median wall does NOT scale (speedup < 2 from p=2 to
p=8) — the residual serial share, instead of an unattributed band.

The replicated corpus is written ONCE and shared by all runs; each
leg gets a fresh out_dir so nothing resumes.  Writes
BENCH/corpus_scaling.json.

Usage: python scripts/corpus_scaling.py [replicate] [sf_dir] [legs]
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

JOB = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from neuroner_spark.session import get_spark

def probe_once():
    t0 = time.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i * i % 7
    return round(time.perf_counter() - t0, 3)

cpus = int(sys.argv[1])
corpus = sys.argv[2]
spark = get_spark("corpus_scaling", cores=cpus, shuffle_partitions=max(cpus, 8),
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
from neuroner_spark.plans.corpus_pipeline import run_corpus_prep

docs = spark.read.parquet(corpus)
n_docs = docs.count()  # warm the scan; not part of the timed pipeline
out = tempfile.mkdtemp(prefix=f"corpus_scale_{{cpus}}_")
p_before = probe_once()
t0 = time.time()
# max_bucket=100: the 1000-clone clusters must take the star-edge
# path (bucket size ~replicate); pairing them would be the exact
# quadratic the cap exists to prevent
res = run_corpus_prep(spark, docs, out, max_bucket=100)
n_final = res["corpus"].count()
wall = time.time() - t0
p_after = probe_once()
# per-stage decomposition: a stage whose wall does NOT shrink with p
# (or that writes with 1-2 partitions) is the serial share that caps
# Amdahl efficiency — the thing to find at 1000-executor scale
stages = [{{"stage": m["stage"], "wall_s": m.get("wall_s"),
            "n_rows": m.get("n_rows"), "n_parts": m.get("n_partitions")}}
          for m in res["lineage"]]
shutil.rmtree(out, ignore_errors=True)
print(json.dumps({{"cpus": cpus, "n_docs": n_docs, "n_final": n_final,
                   "wall_s": round(wall, 1),
                   "docs_per_sec": round(n_docs / wall, 1),
                   "probe_sec": [p_before, p_after],
                   "stages": stages}}))
"""


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_legs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from neuroner_spark.session import get_spark

    spark = get_spark(
        "corpus_scaling_prep", cores="32", shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    corpus_dir = tempfile.mkdtemp(prefix=f"corpus_x{replicate}_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # replicas must be TEXTUALLY distinct (a unique suffix token) or
    # the pipeline's FIRST stage — exact dedup on the md5 fingerprint —
    # collapses the 1000 copies immediately and no downstream stage
    # ever sees 5M docs (measured: 5M identical-text replicas ran the
    # whole pipeline in 28 s because only the fingerprint groupBy
    # scaled).  With distinct suffixes the clone clusters instead
    # exercise the banding + giant-star-edge near-dup path — the
    # boilerplate-heavy shape of a real crawl.
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
    legs = {8: [], 2: []}
    for rep in range(n_legs):
        for cpus in (8, 2):  # interleaved: drift hits both sizes
            p = subprocess.run(
                [sys.executable, "-c", job, str(cpus), corpus_dir],
                capture_output=True, text=True, timeout=7200,
            )
            line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
            if not line:
                print(p.stdout[-2000:], p.stderr[-2000:])
                raise SystemExit(f"cpus={cpus} leg {rep} failed")
            r = json.loads(line[-1])
            legs[cpus].append(r)
            print(f"leg {rep} p={cpus}: wall {r['wall_s']}s probes {r['probe_sec']}")
            sys.stdout.flush()
    shutil.rmtree(corpus_dir, ignore_errors=True)

    import statistics

    med2 = statistics.median(r["wall_s"] for r in legs[2])
    med8 = statistics.median(r["wall_s"] for r in legs[8])
    eff_median = round(med2 / med8 / 4, 3)
    # best pair = each size's lowest-load leg (min of mean probe),
    # the closest this box gets to a quiet measurement
    best2 = min(legs[2], key=lambda r: sum(r["probe_sec"]))
    best8 = min(legs[8], key=lambda r: sum(r["probe_sec"]))
    eff_best = round(best2["wall_s"] / best8["wall_s"] / 4, 3)

    # name the serial share: per-stage median walls, stages whose
    # speedup < 2 from p=2 to p=8 are the non-scaling residue
    def stage_medians(rs):
        by = {}
        for r in rs:
            for st in r["stages"]:
                by.setdefault(st["stage"], []).append(st["wall_s"] or 0.0)
        return {k: round(statistics.median(v), 1) for k, v in by.items()}

    st2, st8 = stage_medians(legs[2]), stage_medians(legs[8])
    serial_stages = {
        k: {"p2_s": st2[k], "p8_s": st8[k],
            "speedup": round(st2[k] / st8[k], 2) if st8[k] else None}
        for k in st2
        if st8.get(k) and st2[k] / st8[k] < 2.0
    }
    out = {
        "replicate": replicate,
        "n_docs": legs[8][0]["n_docs"],
        "n_legs": n_legs,
        "legs_local2": legs[2],
        "legs_local8": legs[8],
        "wall_median": {"local2": med2, "local8": med8},
        "efficiency_2_to_8_median": eff_median,
        "best_pair": {"local2": best2["wall_s"], "local8": best8["wall_s"],
                      "probes": [best2["probe_sec"], best8["probe_sec"]]},
        "efficiency_2_to_8_best_pair": eff_best,
        "stage_medians": {"local2": st2, "local8": st8},
        "non_scaling_stages_speedup_lt2": serial_stages,
    }
    print(json.dumps(out))
    json.dump(out, open(os.path.join(REPO, "BENCH", "corpus_scaling.json"), "w"), indent=1)


if __name__ == "__main__":
    main()
