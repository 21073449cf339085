"""Connected-components tests (extensions/graph.py)."""

from __future__ import annotations

import random

from train_reports_etl_spark.extensions.graph import connected_components, dedup_clusters


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in range(n_nodes)}


def test_chain_collapses_to_one_component(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (3, 4)], ["u", "v"])
    out = {r.node: r.component for r in connected_components(edges).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0}


def test_two_components_and_isolated_nodes(spark):
    edges = spark.createDataFrame([(10, 11), (11, 12), (20, 21)], ["u", "v"])
    nodes = spark.createDataFrame([(i,) for i in (10, 11, 12, 20, 21, 99)], ["node"])
    out = {r.node: r.component for r in connected_components(edges, nodes=nodes).collect()}
    assert out == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 99: 99}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(80)]
    edges = [(u, v) for u, v in edges if u != v]
    expected = _uf_components(n, edges)
    df = spark.createDataFrame(edges, ["u", "v"])
    nodes = spark.range(n).withColumnRenamed("id", "node")
    got = {r.node: r.component for r in connected_components(df, nodes=nodes).collect()}
    assert got == expected


def test_dedup_clusters_sizes_and_reps(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 3), (2, 5, 2), (7, 8, 4)], ["doc_a", "doc_b", "n_shared"]
    )
    docs = spark.createDataFrame([(i,) for i in range(10)], ["doc_id"])
    out = {r.doc_id: (r.cluster_rep, r.cluster_size) for r in dedup_clusters(pairs, docs).collect()}
    assert out[1] == (1, 3) and out[2] == (1, 3) and out[5] == (1, 3)
    assert out[7] == (7, 2) and out[8] == (7, 2)
    assert out[0] == (0, 1) and out[9] == (9, 1)


def test_long_chain_converges_in_logarithmic_rounds(spark):
    """A 200-node sorted-id chain is the adversarial case for label
    propagation (needs 200 rounds); large-star/small-star must finish
    well under the max_iter cap and still find one component."""
    edges = spark.createDataFrame([(i, i + 1) for i in range(200)], ["u", "v"])
    out = connected_components(edges, max_iter=25).collect()
    assert {r.component for r in out} == {0}
    assert len(out) == 201


def test_many_small_components_random(spark):
    import random as _r

    rng = _r.Random(123)
    # 50 disjoint cliques of 4, ids shuffled so components interleave
    ids = list(range(2000, 2200))
    rng.shuffle(ids)
    edges, expect = [], {}
    for c in range(50):
        grp = sorted(ids[c * 4:(c + 1) * 4])
        rep = grp[0]
        for m in grp:
            expect[m] = rep
        edges += [(grp[0], grp[1]), (grp[1], grp[2]), (grp[2], grp[3])]
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == expect


def test_distributed_path_matches_driver_finish(spark):
    """Force the fully-distributed path (threshold=0) and check it
    agrees exactly with the bounded driver union-find finish."""
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(300)]
    df = spark.createDataFrame(edges, ["u", "v"])
    dist = {
        r.node: r.component
        for r in connected_components(df, driver_finish_threshold=0).collect()
    }
    drv = {r.node: r.component for r in connected_components(df).collect()}
    assert dist == drv


def test_threshold_crossing_mid_iteration(spark):
    """A graph that starts above the driver threshold must contract
    and finish correctly when it drops below mid-loop."""
    # long chain: 3000 symmetric edges > threshold 2000 initially
    edges = [(i, i + 1) for i in range(1500)]
    df = spark.createDataFrame(edges, ["u", "v"])
    out = connected_components(df, driver_finish_threshold=2000).collect()
    assert {r.component for r in out} == {0}
    assert len(out) == 1501


def test_connected_components_under_ansi(spark):
    """The fixed-point probe's checksum must not overflow-raise on
    ANSI-on sessions (SUM of xxhash64 longs did; bit_xor cannot)."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        from train_reports_etl_spark.extensions.graph import connected_components

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], ["u", "v"]
        )
        # threshold=0 forces the distributed rounds (where _sig runs
        # every round), not the driver finish
        comp = {
            r.node: r.component
            for r in connected_components(edges, driver_finish_threshold=0).collect()
        }
        assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_bfs_hops_chain_and_cutoff(spark):
    from train_reports_etl_spark.extensions.graph import bfs_hops

    # chain 1-2-3-4-5, star 10-{11,12}, isolated 99
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12)], ["u", "v"]
    )
    seeds = spark.createDataFrame([(1,), (10,)], ["n"])
    out = {r.node: r.hops for r in bfs_hops(edges, seeds, max_hops=10).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 10: 0, 11: 1, 12: 1}
    # hop cutoff: distance > max_hops is absent (undirected: 5 reaches 3 backward)
    out2 = {r.node: r.hops for r in bfs_hops(edges, seeds, max_hops=2).collect()}
    assert out2 == {1: 0, 2: 1, 3: 2, 10: 0, 11: 1, 12: 1}
    # seed-only graph edge case: empty frontier short-circuits
    lonely = spark.createDataFrame([(99,)], ["n"])
    out3 = {r.node: r.hops for r in bfs_hops(edges, lonely, max_hops=3).collect()}
    assert out3 == {99: 0}
