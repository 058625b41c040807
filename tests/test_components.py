"""J10 connected components vs a single-machine union-find golden."""

from neuroner_spark.fixtures.gen import sameas_df
from neuroner_spark.operators.components import connected_components


def test_connected_components_matches_union_find(spark):
    edges, golden = sameas_df(spark, n_clusters=30)
    edge_rows = edges.collect()
    nodes_in_edges = {r["src"] for r in edge_rows} | {r["dst"] for r in edge_rows}
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert set(got) == nodes_in_edges
    for node, comp in got.items():
        assert comp == golden[node], (node, comp, golden[node])


def test_two_triangles_and_chain(spark):
    rows = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (20, 21), (21, 22), (22, 23), (23, 24)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20, 22: 20, 23: 20, 24: 20,
    }


def test_canonical_map_distributed_fallback_matches_unionfind(spark):
    """small_threshold=0 forces the distributed large-star/small-star
    path; its output must equal the driver union-find's exactly."""
    from neuroner_spark.fixtures.gen import alias_df
    from neuroner_spark.plans.kg_pipeline import canonical_map

    aliases = alias_df(spark)
    fast = {(r["entity_id"], r["canonical_id"]) for r in canonical_map(aliases).collect()}
    dist = {
        (r["entity_id"], r["canonical_id"])
        for r in canonical_map(aliases, small_threshold=0).collect()
    }
    assert fast == dist and len(fast) > 0


def test_cc_driver_fast_path_matches_star_loop(spark):
    """r6 small_threshold driver union-find vs the forced distributed
    star loop: identical (node, component) output — including self
    loops (node must still appear) and the min-root invariant."""
    edges, golden = sameas_df(spark, n_clusters=40)
    with_self = edges.union(
        spark.createDataFrame([(999_999, 999_999)], "src long, dst long")
    )
    log_fast, log_dist = [], []
    fast = {
        (r["node"], r["component"])
        for r in connected_components(with_self, iteration_log=log_fast).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(
            with_self, iteration_log=log_dist, small_threshold=0
        ).collect()
    }
    assert fast == dist and (999_999, 999_999) in fast
    # the fast path really ran driver-side, the forced path really looped
    assert len(log_fast) == 1 and log_fast[0].get("mode") == "driver"
    assert len(log_dist) >= 1 and "mode" not in log_dist[0]
