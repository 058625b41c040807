"""Entity-importance ranking over the materialized KG: PageRank as
iterative DataFrame joins (Page et al. 1999; the standard MapReduce
formulation), the analytics consumer of the triple store's entity/edge
tables — same execution discipline as ``operators/components.py``
(localCheckpoint per round so the plan never grows, one action per
round for the convergence check).

Scale shape at 10^9-node graphs:
  - the edge table is the only corpus-sized frame; each iteration is
    ONE equi-join (ranks x out-degrees on src) + ONE groupBy(dst) sum
    — both shuffles keyed on node id, and the join side reuses the
    same partitioning every round (AQE + exchange reuse);
  - out-degrees are computed once, up front;
  - dangling mass (nodes with no out-edges) is ONE scalar agg per
    round, redistributed uniformly — without it rank leaks and the
    result diverges from the true eigenvector;
  - convergence check = L1 delta, one action per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    undirected: bool = False,
    iteration_log: list | None = None,
) -> DataFrame:
    """edges(src, dst) -> (node, rank), sum(rank) == 1.

    ``undirected``: symmetrize first (co-occurrence graphs are
    undirected; verb-predicate graphs are directed).
    ``iteration_log``: appends {'iter', 'l1_delta', 'wall_sec'} per
    round (the components.py observability contract).
    """
    import time

    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    if undirected:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()

    # Per-round checkpoint RELEASE (r6 session 5): each round pins a
    # node-sized rank frame in executor storage, and DataFrame handles
    # can't unpersist a localCheckpoint's internal RDD (the r5
    # streaming-leak class) — without release, max_iter=25 at 5M nodes
    # pinned ~25 deserialized frames and OOMed an 8 GB heap.  The ids
    # each round REGISTERS are diffed off the JVM's persistent-RDD map,
    # and the PREVIOUS round's ids are freed once the new frame (and
    # the delta check reading both) is materialized — live frames are
    # then bounded at 2 regardless of iteration count, which is what a
    # 10^9-node run on a real cluster needs too.
    jsc = edges.sparkSession.sparkContext._jsc

    def _pinned_ids() -> set:
        return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}

    def _release(ids: set) -> None:
        live = jsc.getPersistentRDDs()
        for rid in ids:
            if live.containsKey(rid):
                live.get(rid).unpersist(False)

    prev_round_ids: set = set()
    for i in range(max_iter):
        t0 = time.time()
        with_deg = ranks.join(out_deg, ranks.node == out_deg.src, "left")
        # dangling nodes (no out-edges) donate their mass uniformly —
        # folded in as a LAZY broadcast scalar (a collect here would be
        # an extra driver action per round; at small graphs the
        # per-round actions, not the joins, are the wall)
        dang_frame = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
        )
        contribs = (
            with_deg.filter(F.col("deg").isNotNull())
            .select("node", (F.col("rank") / F.col("deg")).alias("share"))
            .join(e, F.col("node") == e.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("inflow"))
        )
        before_ids = _pinned_ids()
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang_frame))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("_dang") / n
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        # the L1-delta convergence check is the round's ONLY driver
        # action; fixed-iteration callers (tol<=0) skip it entirely
        delta = None
        if tol > 0:
            delta = (
                ranks.withColumnRenamed("rank", "r0")
                .join(new_ranks, "node")
                .agg(F.sum(F.abs(F.col("rank") - F.col("r0"))))
                .collect()[0][0]
            )
        # old ranks fed this round's join (and the delta above) — dead now
        _release(prev_round_ids)
        prev_round_ids = _pinned_ids() - before_ids - prev_round_ids
        ranks = new_ranks
        if iteration_log is not None:
            entry = {"iter": i, "wall_sec": round(time.time() - t0, 3)}
            if delta is not None:
                entry["l1_delta"] = float(delta)
            iteration_log.append(entry)
        if delta is not None and delta < tol:
            break
    return ranks


def entity_pagerank(spark, store_dir: str, pred: str = "co_occurs_with", **kw) -> DataFrame:
    """Rank canonical entities by PageRank over one predicate's edge
    set from the incremental triple store (``read_kg_triples`` view, so
    retired ids are already resolved).  Co-occurrence predicates are
    undirected; verb predicates directed."""
    from neuroner_spark.plans.kg_pipeline import SYMMETRIC_PREDS, read_kg_triples

    triples = read_kg_triples(spark, store_dir).filter(F.col("pred") == pred)
    edges = triples.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    return pagerank(edges, undirected=pred in SYMMETRIC_PREDS, **kw)


def link_edges(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src, dst) url-level hyperlink edges from the pages table's raw
    ``html`` binary — the web link graph a Common-Crawl corpus carries
    alongside its text.  Entirely JVM-side: decode + one
    ``regexp_extract_all`` over href attributes + explode; no UDF, no
    shuffle (the explode preserves the scan's partitioning).

    Relative hrefs (no scheme) are resolved against the source page's
    scheme://host; fragment-only and javascript/mailto pseudo-links are
    dropped.  Output is NOT distinct()ed — edge multiplicity is signal
    for weighted consumers; ``host_graph`` aggregates it.

    Contract: double-quoted href attributes only (the normalized form
    crawl extractors emit); single-quoted/unquoted attributes need a
    second regex alternative here — one line, same plan shape."""
    html_txt = F.decode(F.col(html_col), "UTF-8")
    hrefs = F.regexp_extract_all(html_txt, F.lit(r'href="([^"#]+)'), 1)
    base = F.regexp_extract(F.col(url_col), r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)", 1)
    raw = pages.select(
        F.col(url_col).alias("src"), base.alias("_base"), F.explode(hrefs).alias("_h")
    ).filter(~F.col("_h").rlike(r"^(javascript:|mailto:|data:)"))
    resolved = F.when(F.col("_h").rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), F.col("_h")).otherwise(
        F.concat(
            F.col("_base"),
            F.when(F.col("_h").startswith("/"), F.col("_h")).otherwise(
                F.concat(F.lit("/"), F.col("_h"))
            ),
        )
    )
    return raw.select("src", resolved.alias("dst")).filter(F.col("dst") != F.col("src"))


def host_graph(edges: DataFrame) -> DataFrame:
    """url-level link edges -> weighted host-level graph
    (src_host, dst_host, n_links), self-host edges dropped.  One
    map-side-combined groupBy on the host pair — at crawl scale the
    output is hosts², bounded far below the url-level edge count."""
    from neuroner_spark.functions.urls import url_host

    return (
        edges.select(
            url_host(F.col("src")).alias("src"), url_host(F.col("dst")).alias("dst")
        )
        .filter((F.col("src") != F.col("dst")) & (F.col("dst") != ""))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_links"))
    )


def host_pagerank(pages: DataFrame, **kw) -> DataFrame:
    """Host-importance ranking over the crawl's own hyperlink graph:
    link extraction -> host aggregation -> ``pagerank``.  The id space
    is xxhash64(host) (collision-negligible at crawl scale); returns
    (host, rank) by joining the ranks back to the distinct host table
    (one broadcast-sized join at host cardinality)."""
    hg = host_graph(link_edges(pages)).localCheckpoint()
    ids = (
        hg.select(F.col("src").alias("host"))
        .unionByName(hg.select(F.col("dst").alias("host")))
        .distinct()
        .select("host", F.xxhash64("host").alias("node"))
    )
    ranks = pagerank(
        hg.select(F.xxhash64("src").alias("src"), F.xxhash64("dst").alias("dst")), **kw
    )
    return ranks.join(ids, "node").select("host", "rank")
