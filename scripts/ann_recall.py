"""ANN recall curves (r4 verdict #5): the numbers a user needs before
trusting the probe-limiting knobs at scale.

1. IVF recall@10 vs nprobe (1, 2, 4, 8, 16 of 16 cells) on the sf0.01
   embeddings: the coarse quantizer is fit ONCE with the Spark
   operator (``ivf_index``, KMeans seed=42); per-query probing is then
   swept driver-side over the collected (bounded, 500-row) assignment
   — after a parity check that the driver-side candidate set equals
   ``ivf_topk``'s Spark output for a probe query, so the sweep
   measures the real operator's index.

2. LSH pair recall vs n_tables (1, 2, 4, 8) against exact cosine
   ground truth.  The raw sf0.01 embeddings are near-orthogonal (max
   pairwise cos ~0.44), where hyperplane LSH recall is low BY DESIGN —
   so the sweep also plants seeded noisy clones at cos ~0.9 / 0.95 /
   0.99 (the near-dup regime the operator exists for) and reports
   recall per similarity band.  Signatures come from the Spark
   operator (``lsh_all_signatures``) — collected (bounded) and swept
   driver-side by masking tables.

3. (r6, r5 verdict #7) The same IVF sweep on a CLUSTERED fixture —
   the realistic corpus shape: 5,000 vectors in 50 Zipf-sized
   Gaussian clusters (within-cluster cos ~0.9) + 10% uniform
   background, seed 11.  The r5 curves measured the near-orthogonal
   FLOOR case where every cell holds ~uniform neighbors; on clustered
   data the true top-k co-locate with the query's cell, so the
   nprobe knob should buy recall much faster.  Recorded beside the
   floor curves as ``ivf_clustered``.

Writes BENCH/ann_recall.json and prints the tables.

Usage: python scripts/ann_recall.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CELLS = 16
K = 10
N_QUERIES = 25
N_PLANES = 8
DIM = 64
N_TABLES = 8
CLONES_PER_LEVEL = 40
# relative-noise sigma s gives cos ~ 1/sqrt(1+s^2): s=0.14 -> ~0.99,
# s=0.33 -> ~0.95, s=0.48 -> ~0.90 (measured means recorded in the
# artifact as planted_pair_mean_cos)
NOISE_LEVELS = {"cos~0.99": 0.14, "cos~0.95": 0.33, "cos~0.9": 0.48}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from neuroner_spark.operators.similarity import (
        ivf_index,
        ivf_topk,
        lsh_all_signatures,
    )
    from neuroner_spark.session import get_spark

    spark = get_spark(
        "ann_recall", cores="8", shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    n = len(ids)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = Xn @ Xn.T

    # ---------- 1. IVF recall@K vs nprobe ----------
    assigned, centroids = ivf_index(emb, k=N_CELLS, seed=42)
    cell_rows = assigned.select("vec_id", "cell").collect()
    cell = np.zeros(n, dtype=np.int64)
    idx_of = {int(v): i for i, v in enumerate(ids)}
    for r in cell_rows:
        cell[idx_of[int(r["vec_id"])]] = r["cell"]

    # parity check: driver-side candidates == the Spark operator's
    # output for one query at nprobe=4
    q0 = X[0]
    d = centroids - q0[None, :]
    probe4 = np.argsort((d * d).sum(axis=1))[:4]
    mask = np.isin(cell, probe4)
    scored = (Xn[mask] @ (q0 / np.linalg.norm(q0))).round(6)
    cand_ids = ids[mask]
    order = np.lexsort((cand_ids, -scored))[:K]
    mine = [(int(cand_ids[i]), float(scored[i])) for i in order]
    spark_rows = ivf_topk(emb, q0.tolist(), k=K, n_cells=N_CELLS, nprobe=4, seed=42).collect()
    theirs = [(int(r["vec_id"]), float(r["cos_sim"])) for r in
              sorted(spark_rows, key=lambda r: r["rank"])]
    assert mine == theirs, f"driver-side IVF sweep diverges from ivf_topk:\n{mine}\n{theirs}"

    def sweep_recall(X_, cos_, centroids_, cell_, rng_):
        n_ = len(X_)
        queries = rng_.choice(n_, size=N_QUERIES, replace=False)
        rec = {}
        for nprobe in [1, 2, 4, 8, 16]:
            hits = 0
            for qi in queries:
                q = X_[qi]
                exact = np.argsort(-np.where(np.arange(n_) == qi, -np.inf, cos_[qi]))[:K]
                d = centroids_ - q[None, :]
                probes = np.argsort((d * d).sum(axis=1))[:nprobe]
                in_probe = np.isin(cell_, probes)
                hits += sum(1 for j in exact if in_probe[j])
            rec[nprobe] = round(hits / (K * len(queries)), 4)
        return rec

    rng = np.random.default_rng(7)
    ivf_recall = sweep_recall(X, cos, centroids, cell, rng)
    print("IVF recall@10 vs nprobe (16 cells, floor corpus):", ivf_recall)

    # ---------- 1b. IVF recall on a planted-cluster fixture ----------
    rngc = np.random.default_rng(11)
    N_CL, N_CLUSTERS, BG_FRAC, SIGMA = 5000, 50, 0.10, 0.35
    centers_c = rngc.standard_normal((N_CLUSTERS, DIM))
    centers_c /= np.linalg.norm(centers_c, axis=1, keepdims=True)
    zipf_w = 1.0 / np.arange(1, N_CLUSTERS + 1)
    zipf_w /= zipf_w.sum()
    n_core = int(N_CL * (1 - BG_FRAC))
    labels = rngc.choice(N_CLUSTERS, size=n_core, p=zipf_w)
    core = centers_c[labels] + SIGMA / np.sqrt(DIM) * rngc.standard_normal((n_core, DIM))
    bg = rngc.standard_normal((N_CL - n_core, DIM))
    core_n = core / np.linalg.norm(core, axis=1, keepdims=True)
    mean_intra = float(np.mean([core_n[i] @ centers_c[labels[i]] for i in range(500)]))
    Xc = np.vstack([core, bg])
    perm = rngc.permutation(N_CL)
    Xc = Xc[perm]
    emb_c = spark.createDataFrame(
        [(int(i), Xc[i].tolist()) for i in range(N_CL)],
        "vec_id long, embedding array<double>",
    )
    assigned_c, centroids_c = ivf_index(emb_c, k=N_CELLS, seed=42)
    cell_c = np.zeros(N_CL, dtype=np.int64)
    for r in assigned_c.select("vec_id", "cell").collect():
        cell_c[int(r["vec_id"])] = r["cell"]
    Xc_n = Xc / np.linalg.norm(Xc, axis=1, keepdims=True)
    cos_c = Xc_n @ Xc_n.T
    ivf_recall_clustered = sweep_recall(Xc, cos_c, centroids_c, cell_c, rngc)
    print("IVF recall@10 vs nprobe (16 cells, clustered fixture):", ivf_recall_clustered)

    # ---------- 2. LSH pair recall vs n_tables ----------
    # plant seeded noisy clones so the near-dup regime is populated
    clones = []
    clone_pairs = {lvl: [] for lvl in NOISE_LEVELS}
    next_id = int(ids.max()) + 1
    base_choice = rng.choice(n, size=CLONES_PER_LEVEL * len(NOISE_LEVELS), replace=False)
    pos = 0
    all_vecs = [(int(v), X[i].tolist()) for i, v in enumerate(ids)]
    for lvl, noise in NOISE_LEVELS.items():
        for _ in range(CLONES_PER_LEVEL):
            bi = base_choice[pos]; pos += 1
            v = X[bi] + noise * np.linalg.norm(X[bi]) / np.sqrt(DIM) * rng.standard_normal(DIM)
            all_vecs.append((next_id, v.tolist()))
            clone_pairs[lvl].append((int(ids[bi]), next_id))
            next_id += 1
    big = spark.createDataFrame(all_vecs, "vec_id long, embedding array<double>")
    sigs = lsh_all_signatures(big, n_planes=N_PLANES, dim=DIM, n_tables=N_TABLES)
    sig_rows = sigs.collect()
    sig_map = {}
    for r in sig_rows:
        sig_map[(int(r["vec_id"]), int(r["table"]))] = int(r["sig"])
    Xa = np.array([v for _, v in all_vecs])
    Xa_n = Xa / np.linalg.norm(Xa, axis=1, keepdims=True)
    aid = [i for i, _ in all_vecs]

    def same_bucket(a, b, t_used):
        return any(sig_map[(a, t)] == sig_map[(b, t)] for t in range(t_used))

    # measured cosine per planted pair (the noise levels are nominal)
    pair_cos = {}
    idx_all = {v: i for i, v in enumerate(aid)}
    for lvl, pairs in clone_pairs.items():
        pair_cos[lvl] = float(np.mean([
            Xa_n[idx_all[a]] @ Xa_n[idx_all[b]] for a, b in pairs
        ]))
    lsh_recall = {}
    for t_used in [1, 2, 4, 8]:
        lsh_recall[t_used] = {
            lvl: round(
                sum(same_bucket(a, b, t_used) for a, b in pairs) / len(pairs), 4
            )
            for lvl, pairs in clone_pairs.items()
        }
        # the weak-similarity regime, for honesty: true pairs at
        # cos >= 0.3 among the RAW corpus
        raw_true = [(int(ids[i]), int(ids[j])) for i in range(n) for j in range(i + 1, n)
                    if cos[i, j] >= 0.3]
        if raw_true:
            lsh_recall[t_used]["raw cos>=0.3"] = round(
                sum(same_bucket(a, b, t_used) for a, b in raw_true) / len(raw_true), 4
            )
    print("LSH pair recall vs n_tables:", json.dumps(lsh_recall, indent=1))

    # ---------- 3. IVF-PQ (r6): ADC recall on 32x-compressed codes ----
    # same pattern as the IVF sweep: the index (cells + residual
    # codebooks + codes) is built ONCE by the Spark operator, parity-
    # checked against ``ivfpq_search`` for one query, then swept
    # driver-side over the collected codes.  Pool = 4k candidates by
    # ADC distance, exact-cosine re-rank (what the operator does).
    from neuroner_spark.operators.similarity import ivfpq_index, ivfpq_search

    M_PQ, NBITS = 8, 8

    def ivfpq_sweep(emb_df, X_, cos_, rng_):
        codes_df, cents, books = ivfpq_index(
            emb_df, n_cells=N_CELLS, m=M_PQ, nbits=NBITS, seed=42
        )
        code_rows = codes_df.collect()
        n_ = len(X_)
        id2i = {}
        for i, r in enumerate(emb_df.select("vec_id").orderBy("vec_id").collect()):
            id2i[int(r["vec_id"])] = i
        codes_a = np.zeros((n_, M_PQ), dtype=np.int64)
        cell_a = np.zeros(n_, dtype=np.int64)
        ids_a = np.zeros(n_, dtype=np.int64)
        for r in code_rows:
            i = id2i[int(r["vec_id"])]
            codes_a[i] = r["codes"]
            cell_a[i] = r["cell"]
            ids_a[i] = r["vec_id"]
        Xn_ = X_ / np.linalg.norm(X_, axis=1, keepdims=True)
        dsub = X_.shape[1] // M_PQ
        jj = np.arange(M_PQ)

        def adc_pool(qi, nprobe, pool, exclude_self=True):
            q = Xn_[qi]
            probes = np.argsort(((cents - q[None, :]) ** 2).sum(1))[:nprobe]
            mask = np.isin(cell_a, probes)
            if exclude_self:
                mask &= np.arange(n_) != qi
            idxs = np.nonzero(mask)[0]
            d2 = np.zeros(len(idxs))
            for c in np.unique(cell_a[idxs]):
                rq = (q - cents[c]).reshape(M_PQ, dsub)
                lut = np.stack([((rq[j][None] - books[j]) ** 2).sum(1) for j in range(M_PQ)])
                sel = cell_a[idxs] == c
                d2[sel] = lut[jj[None, :], codes_a[idxs[sel]]].sum(1)
            order = np.lexsort((ids_a[idxs], d2))[:pool]
            return idxs[order]

        # parity: driver-side == ivfpq_search for query 0 at nprobe=4
        # (self NOT excluded — the operator searches the full corpus,
        # where query 0 is a member and scores cos=1.0)
        pool_idx = adc_pool(0, 4, 4 * K, exclude_self=False)
        sc = cos_[0, pool_idx].round(6)
        order = np.lexsort((ids_a[pool_idx], -sc))[:K]
        mine = [(int(ids_a[pool_idx[i]]), float(sc[i])) for i in order]
        srows = ivfpq_search(
            codes_df, cents, books, emb_df, X_[0].tolist(), k=K, nprobe=4
        ).collect()
        theirs = [
            (int(r["vec_id"]), float(r["cos_sim"]))
            for r in sorted(srows, key=lambda r: r["rank"])
        ]
        assert mine == theirs, f"driver-side IVF-PQ diverges from ivfpq_search:\n{mine}\n{theirs}"

        queries = rng_.choice(n_, size=N_QUERIES, replace=False)
        rec = {}
        for pool in (4 * K, 16 * K):
            for nprobe in [1, 2, 4, 8, 16]:
                hits = 0
                for qi in queries:
                    exact = np.argsort(
                        -np.where(np.arange(n_) == qi, -np.inf, cos_[qi])
                    )[:K]
                    got = set(adc_pool(qi, nprobe, pool)[:pool])
                    # exact re-rank keeps any true neighbor in the pool
                    hits += sum(1 for j in exact if j in got)
                rec.setdefault(pool, {})[nprobe] = round(hits / (K * len(queries)), 4)
        return rec

    ivfpq_recall = ivfpq_sweep(emb.select("vec_id", "embedding"), X, cos, np.random.default_rng(7))
    print("IVF-PQ recall@10 vs nprobe by pool (m=8, floor corpus):", ivfpq_recall)
    ivfpq_recall_clustered = ivfpq_sweep(emb_c, Xc, cos_c, np.random.default_rng(13))
    print("IVF-PQ recall@10 vs nprobe by pool (m=8, clustered fixture):", ivfpq_recall_clustered)

    # sanity gates: recall must be monotone in the knob, and exhaustive
    # settings must be lossless (nprobe = n_cells -> exact top-k)
    for name, rec in [("floor", ivf_recall), ("clustered", ivf_recall_clustered)]:
        vals = [rec[p] for p in [1, 2, 4, 8, 16]]
        assert vals == sorted(vals), f"IVF {name} recall not monotone in nprobe: {vals}"
        assert vals[-1] == 1.0, f"IVF {name} full probe must be exact, got {vals[-1]}"
    for lvl in NOISE_LEVELS:
        curve = [lsh_recall[t][lvl] for t in [1, 2, 4, 8]]
        assert curve == sorted(curve), f"LSH recall not monotone for {lvl}: {curve}"
    # PQ pool-limited recall: monotone within a small tolerance (a
    # fixed 4k pool can swap one true neighbor out when an extra cell
    # contributes an ADC-closer false candidate)
    for name, rec in [("floor", ivfpq_recall), ("clustered", ivfpq_recall_clustered)]:
        for pool, curve in rec.items():
            vals = [curve[p] for p in [1, 2, 4, 8, 16]]
            assert all(b >= a - 0.02 for a, b in zip(vals, vals[1:])), (
                f"IVF-PQ {name} pool={pool} recall degrades with nprobe: {vals}"
            )
        # the pool is the distortion-recovery knob: at full probe a
        # 4x-bigger pool must not lose recall
        assert rec[16 * K][16] >= rec[4 * K][16], rec
    out = {
        "ivf": {"n_cells": N_CELLS, "k": K, "n_queries": N_QUERIES,
                "recall_at_k_vs_nprobe": ivf_recall,
                "note": "near-orthogonal sf corpus: the FLOOR case"},
        "ivf_clustered": {
            "n_cells": N_CELLS, "k": K, "n_queries": N_QUERIES,
            "fixture": {"n_vectors": N_CL, "n_clusters": N_CLUSTERS,
                        "zipf_sizes": True, "background_frac": BG_FRAC,
                        "sigma": SIGMA, "seed": 11,
                        "mean_core_cos_to_center": round(mean_intra, 4)},
            "recall_at_k_vs_nprobe": ivf_recall_clustered,
            "note": "planted Zipf Gaussian clusters: the realistic corpus shape"},
        "ivfpq": {
            "n_cells": N_CELLS, "k": K, "n_queries": N_QUERIES,
            "m": M_PQ, "nbits": NBITS, "rerank_pools": [4 * K, 16 * K],
            "compression_vs_float32": f"{DIM * 4 // M_PQ}x",
            "recall_at_k_vs_nprobe_by_pool": ivfpq_recall,
            "recall_at_k_vs_nprobe_by_pool_clustered": ivfpq_recall_clustered,
            "note": "ADC over m-byte codes + exact re-rank of the candidate pool. "
                    "On the clustered fixture the recall ceiling is WITHIN-CELL "
                    "quantization noise, not probing — the 4k pool plateaus and "
                    "the 16k pool is the knob that recovers it; on the floor "
                    "corpus nprobe dominates and the pools coincide."},
        "lsh": {"n_planes": N_PLANES, "n_tables_swept": [1, 2, 4, 8],
                "planted_pair_mean_cos": {k: round(v, 4) for k, v in pair_cos.items()},
                "recall_vs_n_tables": lsh_recall},
        "sf_dir": sf_dir,
    }
    path = os.path.join(REPO, "BENCH", "ann_recall.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"artifact: {path}")


if __name__ == "__main__":
    main()
