"""Scale-anomaly sweep: run every registry query at sf0.1 and on an
N-times id-shifted union of the same tables, flag superlinear wall
time or pair-blowup row growth — gated against a COMMITTED
expectations file so only NEW anomalies fail the round.

This is the tool that caught the r4 dedup_embedding hole (10x vectors
-> 108x pairs): replicate-by-id-shift plus ONE cold run per scale is
the cheapest quadratic-shape detector — per-query best-of benchmarks
hid it for three rounds because the toy inputs never had hot blocks.

Usage:
  python scripts/scale_sweep.py [factor] [sf_dir]     # gate vs expectations
  python scripts/scale_sweep.py --update [factor]     # re-commit expectations
  python scripts/scale_sweep.py --flagship [factor]   # 3 flagship E2E compositions
                                                      # at a deep factor (default 100)

Gating rules (plain run):
- ROW RATIO (deterministic): each query's rows_xN/rows_x1 must match
  the committed ratio in scripts/scale_expectations.json within 25%
  (replicated inputs -> deterministic outputs; any drift is a real
  semantic/scale change). Queries missing from the file fall back to
  the generic blowup rule rows_xN > 3*factor*rows_x1.
- WALL (noisy): flag when wall grows past 1.5x LINEAR (i.e. more than
  1.5*factor past a 0.5 s noise floor — at factor 10 a 10x wall is
  linear scaling, not an anomaly), unless the query is in
  expected_wall_flags (documented quadratics: the exact-jaccard
  generator's output IS quadratic per clone group — see
  ngram_jaccard_pairs' docstring; pipelines run exact_dedup first).

Results are written to BENCH/sweep_x{factor}.json each run so the
round's sweep is a recorded artifact, not a transient stdout.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EXPECTATIONS = os.path.join(REPO, "scripts", "scale_expectations.json")
ROW_RATIO_TOL = 1.25

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


def _session(name: str):
    from neuroner_spark.session import get_spark

    return get_spark(
        name,
        cores="32",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def _replicate(
    spark, sf_dir: str, factor: int, xdir: str, tables=None, perturb_text=False
) -> None:
    """``perturb_text`` (flagship tier only — the plain sweep's
    committed row ratios assume identical-text replicas): append a
    unique replica token to documents.text, because identical replicas
    collapse at the FIRST exact-dedup and nothing downstream ever sees
    the replicated scale (the r5 degenerate-replication trap — the
    un-perturbed 100x corpus_prep leg measured 42k docs/sec because
    every stage after exact saw 5k docs).  With the suffix, clone
    clusters exercise the banding + giant-star near-dup path — the
    boilerplate shape of a real crawl (same recipe as
    scripts/corpus_scaling.py)."""
    from pyspark.sql import functions as F

    for t, idc in TABLE_IDS.items():
        if tables is not None and t not in tables:
            continue
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
            if perturb_text and t == "documents":
                scaled = scaled.withColumn(
                    "text",
                    F.concat(
                        F.col("text"), F.lit(" zrep"),
                        (F.col(idc) / F.lit(1_000_000_000)).cast("long").cast("string"),
                    ),
                )
        scaled.write.mode("overwrite").parquet(f"{xdir}/{t}.parquet")


def sweep(factor: int, sf_dir: str, update: bool) -> int:
    import __spark_entry__

    spark = _session("scale_sweep")
    exp = {"factor": factor, "row_ratio": {}, "expected_wall_flags": ["dedup_jaccard"]}
    if os.path.exists(EXPECTATIONS) and not update:
        exp = json.load(open(EXPECTATIONS))
        if exp.get("factor") != factor:
            print(
                f"note: expectations committed at factor {exp.get('factor')}, "
                f"running at {factor} — row-ratio gate degrades to the generic rule"
            )
    xdir = tempfile.mkdtemp(prefix=f"sweep_x{factor}_")
    _replicate(spark, sf_dir, factor, xdir)
    n_flags = 0
    results = {}
    new_ratios = {}
    for name, fn in __spark_entry__.queries().items():
        try:
            t0 = time.time()
            n1 = fn(spark, sf_dir).count()
            t1 = time.time() - t0
            t0 = time.time()
            nx = fn(spark, xdir).count()
            tx = time.time() - t0
            ratio = round(nx / n1, 4) if n1 else None
            new_ratios[name] = ratio
            reasons = []
            committed = exp["row_ratio"].get(name) if exp.get("factor") == factor else None
            if committed and ratio:
                if ratio > committed * ROW_RATIO_TOL or ratio < committed / ROW_RATIO_TOL:
                    reasons.append(f"row ratio {ratio} vs committed {committed}")
            elif n1 and nx > 3 * factor * n1:
                reasons.append(f"row blowup {ratio}x at factor {factor}")
            if tx > 1.5 * factor * max(t1, 0.5):
                if name in exp.get("expected_wall_flags", []):
                    reasons.append("wall superlinear (expected, documented)")
                else:
                    reasons.append(f"wall {t1:.2f}->{tx:.2f}s")
            new = [r for r in reasons if "expected" not in r]
            n_flags += bool(new)
            suffix = f"  <-- FLAG ({'; '.join(reasons)})" if new else (
                f"  ({reasons[0]})" if reasons else ""
            )
            results[name] = {
                "x1_sec": round(t1, 2), "x1_rows": n1,
                "xN_sec": round(tx, 2), "xN_rows": nx,
                "row_ratio": ratio, "flags": new,
            }
            print(f"{name}: x1={t1:.2f}s/{n1} x{factor}={tx:.2f}s/{nx}{suffix}")
        except Exception as e:  # keep sweeping past a broken query
            n_flags += 1
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:140]}  <-- FLAG")
        sys.stdout.flush()
    shutil.rmtree(xdir, ignore_errors=True)
    out = os.path.join(REPO, "BENCH", f"sweep_x{factor}.json")
    json.dump({"factor": factor, "sf_dir": sf_dir, "n_flags": n_flags,
               "results": results}, open(out, "w"), indent=1)
    print(f"\n{n_flags} flagged (new anomalies only); artifact: {out}")
    if update:
        # preserve unrelated committed gates (e.g. the flagship floors)
        if os.path.exists(EXPECTATIONS):
            exp = json.load(open(EXPECTATIONS))
        exp.update(
            {"factor": factor, "row_ratio": new_ratios,
             "expected_wall_flags": exp.get("expected_wall_flags", ["dedup_jaccard"])}
        )
        json.dump(exp, open(EXPECTATIONS, "w"), indent=1)
        print(f"expectations re-committed: {EXPECTATIONS}")
    return n_flags


def flagship(factor: int, sf_dir: str, update: bool = False) -> int:
    """Deep-scale tier: the three flagship E2E compositions only, at
    ``factor``x documents (default 100 -> 500k docs from sf0.1).

    r6 (r5 verdict #2): no longer merely informational — each leg is
    bracketed by its own load probes (same pure-python probe as
    bench.py) and GATED on a committed load-corrected docs/sec floor in
    scale_expectations.json, like the 10x sweep's ratio gates.  Each
    leg also records per-stage walls (corpus-prep lineage incl. per-CC-
    iteration rounds; cumulative action walls for the others) so a
    56->150 s swing like r5's kg leg is attributable from the artifact
    alone: load factor up = the box, stage wall up at flat load = the
    plan.  ``--update`` re-commits the floors at 0.5x the measured
    load-corrected throughput (headroom for honest noise, tight enough
    to catch a 2x plan regression)."""
    from pyspark.sql import functions as F

    spark = _session("flagship_sweep")
    idle_floor = float(os.environ.get("SPARK_GRAFT_PROBE_IDLE_FLOOR", "0.10"))

    def probe_once() -> float:
        t0 = time.perf_counter()
        x = 0
        for i in range(2_000_000):
            x += i * i % 7
        return round(time.perf_counter() - t0, 3)

    xdir = tempfile.mkdtemp(prefix=f"flagship_x{factor}_")
    _replicate(spark, sf_dir, factor, xdir, tables={"documents"}, perturb_text=True)
    docs = spark.read.parquet(f"{xdir}/documents.parquet")
    n_docs = docs.count()
    results = {}

    def _release_pinned_blocks():
        # the three legs share one JVM; localCheckpoint blocks pinned by
        # a finished leg (kg's mention frame alone is GBs deserialized)
        # have no DataFrame handle left to unpersist, and carrying them
        # into the next leg's peak is what OOMed the corpus leg on an
        # idle box (r6 session 5) — release EVERYTHING between legs
        jsc = spark.sparkContext._jsc
        for rdd in jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    def run(name, fn):
        p0 = probe_once()
        t0 = time.time()
        n, stages = fn()
        dt = time.time() - t0
        _release_pinned_blocks()
        p1 = probe_once()
        lf = round(((p0 + p1) / 2) / idle_floor, 2)
        dps = round(n_docs / dt, 1)
        results[name] = {
            "sec": round(dt, 1), "rows": n,
            "docs_per_sec": dps,
            "probe_sec": [p0, p1],
            "load_factor": lf,
            # the normalization rule the r5 adjudication used
            # (wall / load_factor): what the leg would do on an idle box
            "docs_per_sec_load_corrected": round(dps * max(lf, 1.0), 1),
            "stage_walls": stages,
        }
        print(f"{name}: {dt:.1f}s, {n} rows, {dps:.0f} docs/sec, load {lf}")
        sys.stdout.flush()

    def near_dedup():
        from neuroner_spark.operators.dedup import near_dedup_corpus

        cc_log: list = []
        out = near_dedup_corpus(docs, n=3, bands=4, max_bucket=1000, iteration_log=cc_log)
        kept = out.filter("keep").count()
        # replicate-invariance: clone clusters must fully collapse —
        # the kept count may not scale with the replication factor
        assert kept < n_docs / max(factor / 2, 1), (
            f"near-dup failed to collapse clones: {kept} kept of {n_docs}"
        )
        return kept, {"cc_iterations": cc_log}

    def kg_gazetteer():
        from neuroner_spark.functions.tokenize import tokenize
        from neuroner_spark.operators.gazetteer import match_mentions
        from neuroner_spark.operators.linking import link_mentions
        from neuroner_spark.plans.catalog_kg import _aliases
        from neuroner_spark.plans.kg_pipeline import canonical_map, triples_from_linked

        stages = {}
        t = time.time()
        aliases = _aliases(spark)
        d = docs.select(
            F.col("doc_id").cast("string").alias("url"),
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.col("text"),
        )
        tokens = tokenize(d.withColumnRenamed("url", "doc_id"))
        mentions = match_mentions(tokens, aliases)
        linked = link_mentions(mentions, aliases, use_fuzzy=False)
        canon = canonical_map(aliases)
        stages["construct_and_canonical_map"] = round(time.time() - t, 1)
        # triples_from_linked localCheckpoints the linked-mention frame
        # (it branches 4x below) — this wall IS the tokenize -> match ->
        # link materialization, the heaviest stage of the leg.  r6
        # profiling: construction + canonical_map are < 4 s at 500k
        # docs; the r5 56->150 s "kg leg swing" lived here.
        t = time.time()
        triples = triples_from_linked(linked, canon, d)
        stages["materialize_mentions_localCheckpoint"] = round(time.time() - t, 1)
        # CUMULATIVE prefix walls (each count recomputes its upstream —
        # lineage is unmaterialized by design here): wall_mentions
        # includes the tokenize work, wall_triples the whole leg.  The
        # deltas attribute a swing to a stage; the recompute overhead is
        # the price of leaving the hot path unmaterialized.
        t = time.time()
        mentions.count()
        stages["cum_mentions"] = round(time.time() - t, 1)
        t = time.time()
        n = triples.count()
        stages["triples_after_mentions_warm"] = round(time.time() - t, 1)
        return n, stages

    def corpus_prep():
        from neuroner_spark.plans.corpus_pipeline import run_corpus_prep

        wdir = tempfile.mkdtemp(prefix="flagship_corpus_")
        try:
            res = run_corpus_prep(spark, docs, wdir)
            n = res["corpus"].count()
            # the materialized pipeline records real per-stage walls
            stages = {
                m["stage"]: {
                    k: m[k] for k in ("wall_s", "n_rows", "cc_iterations") if k in m
                }
                for m in res["lineage"]
            }
            return n, stages
        finally:
            shutil.rmtree(wdir, ignore_errors=True)

    run("near_dedup_corpus", near_dedup)
    run("kg_gazetteer", kg_gazetteer)
    run("corpus_prep_materialized", corpus_prep)
    shutil.rmtree(xdir, ignore_errors=True)

    with open(EXPECTATIONS) as f:
        exp = json.load(f)
    floors = exp.get("flagship_min_docs_per_sec_load_corrected", {})
    if update:
        exp["flagship_min_docs_per_sec_load_corrected"] = {
            name: round(r["docs_per_sec_load_corrected"] * 0.5, 1)
            for name, r in results.items()
        }
        with open(EXPECTATIONS, "w") as f:
            json.dump(exp, f, indent=1)
        print("flagship floors re-committed")
        floors = exp["flagship_min_docs_per_sec_load_corrected"]
    failures = [
        f"{name}: load-corrected {r['docs_per_sec_load_corrected']} docs/sec "
        f"< committed floor {floors[name]}"
        for name, r in results.items()
        if name in floors and r["docs_per_sec_load_corrected"] < floors[name]
    ]
    out = os.path.join(REPO, "BENCH", f"flagship_x{factor}.json")
    json.dump(
        {
            "factor": factor, "n_docs": n_docs,
            "probe_idle_floor_sec": idle_floor,
            "gate_floors": floors, "gate_failures": failures,
            "results": results,
        },
        open(out, "w"), indent=1,
    )
    print(f"artifact: {out}")
    for msg in failures:
        print("GATE FAIL", msg)
    return 1 if failures else 0


def main() -> None:
    args = [a for a in sys.argv[1:]]
    update = "--update" in args
    deep = "--flagship" in args
    args = [a for a in args if not a.startswith("--")]
    if deep:
        factor = int(args[0]) if args else 100
        sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
        sys.exit(flagship(factor, sf_dir, update))
    factor = int(args[0]) if args else 10
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    sys.exit(1 if sweep(factor, sf_dir, update) else 0)


if __name__ == "__main__":
    main()
