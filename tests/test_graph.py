"""PageRank (operators/graph.py): structural properties the catalog
oracle doesn't state explicitly."""

from __future__ import annotations

from forklift_spark.operators import graph as G


def _rank(spark, nodes, edges, n, iters=5):
    ndf = spark.createDataFrame([(x,) for x in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    out = G.pagerank(ndf, edf, n, iterations=iters)
    return {r.node: r.rank for r in out.collect()}


def test_symmetric_cycle_stays_uniform(spark):
    # 0 -> 1 -> 2 -> 0: perfectly symmetric, ranks must stay equal
    ranks = _rank(spark, [0, 1, 2], [(0, 1), (1, 2), (2, 0)], 3)
    assert len(set(ranks.values())) == 1
    # and the uniform value keeps (almost) all mass: teleport floor only
    assert abs(3 * ranks[0] - G.RANK_SCALE) < 100


def test_star_graph_concentrates_rank_on_hub(spark):
    # all spokes link to the hub; hub links back to one spoke
    spokes = list(range(1, 6))
    edges = [(s, 0) for s in spokes] + [(0, 1)]
    ranks = _rank(spark, [0] + spokes, edges, 6)
    assert ranks[0] > max(ranks[s] for s in spokes)
    assert ranks[1] > ranks[2]  # the hub's one out-link is favored


def test_dangling_mass_redistributes_uniformly(spark):
    # 1 has no out-links: its mass is shared with every node (the
    # published random-surfer treatment), not dropped
    ranks_a = _rank(spark, [0, 1], [(0, 1)], 2)
    ranks_b = _rank(spark, [0, 1], [(0, 1)], 2)
    assert ranks_a == ranks_b  # bit-identical across runs
    # mass conserved up to integer floors: < N units per division site
    assert sum(ranks_a.values()) > G.RANK_SCALE - 100
    assert sum(ranks_a.values()) <= G.RANK_SCALE
    assert min(ranks_a.values()) > 0  # teleport keeps everyone positive
    # node 0 receives ONLY teleport + dangling share; node 1 additionally
    # receives 0's full contribution -> strictly richer
    assert ranks_a[1] > ranks_a[0]


def test_duplicate_edges_collapse(spark):
    # the same edge listed twice must not double the contribution
    once = _rank(spark, [0, 1, 2], [(0, 1), (1, 2), (2, 0)], 3)
    dup = _rank(spark, [0, 1, 2], [(0, 1), (0, 1), (1, 2), (2, 0)], 3)
    assert once == dup


# -- transitive_closure (pointer doubling) ---------------------------------


def _closure(spark, edges, max_doublings=4):
    edf = spark.createDataFrame(edges, "child long, parent long")
    out = G.transitive_closure(edf, max_doublings=max_doublings)
    return {(r.descn, r.anc): r.dist for r in out.collect()}


def test_closure_deep_chain_converges_in_log_rounds(spark):
    # chain 0 <- 1 <- ... <- 12: depth 12 needs 4 doublings (2^4 = 16),
    # a one-hop-per-round walk would need 12
    edges = [(i, i - 1) for i in range(1, 13)]
    cl = _closure(spark, edges, max_doublings=4)
    assert cl[(12, 0)] == 12  # full-depth pair present with exact dist
    assert cl[(5, 3)] == 2
    # closure size of a chain: n*(n+1)/2 pairs over 13 nodes
    assert len(cl) == 12 * 13 // 2


def test_closure_raises_instead_of_partial(spark):
    # depth 12 > 2^2 hops: must raise, never return a partial closure
    import pytest

    edges = [(i, i - 1) for i in range(1, 13)]
    with pytest.raises(RuntimeError, match="not converged"):
        _closure(spark, edges, max_doublings=2)


def test_closure_tree_rollup_pairs(spark):
    # 4-ary-style tree: 0 -> (1,2), 1 -> (3,4): every (desc, anc) once
    edges = [(1, 0), (2, 0), (3, 1), (4, 1)]
    cl = _closure(spark, edges)
    assert cl == {
        (1, 0): 1, (2, 0): 1, (3, 1): 1, (4, 1): 1, (3, 0): 2, (4, 0): 2,
    }


# -- bfs_hops --------------------------------------------------------------


def _bfs(spark, nodes, edges, sources, rounds):
    ndf = spark.createDataFrame([(x,) for x in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(x,) for x in sources], "node long")
    out = G.bfs_hops(ndf, edf, sdf, rounds=rounds)
    return {r.node: r.dist for r in out.collect()}


def test_bfs_multi_source_takes_min(spark):
    # path 0 -> 1 -> 2 -> 3 with sources {0, 3}: node 2 is 2 hops from 0
    # but 3 is its own source; distances are min over sources
    d = _bfs(spark, [0, 1, 2, 3], [(0, 1), (1, 2), (2, 3)], [0, 3], rounds=4)
    assert d == {0: 0, 1: 1, 2: 2, 3: 0}


def test_bfs_unreached_is_minus_one(spark):
    # 9 is disconnected; 2 is beyond the round horizon
    d = _bfs(spark, [0, 1, 2, 9], [(0, 1), (1, 2)], [0], rounds=1)
    assert d == {0: 0, 1: 1, 2: -1, 9: -1}


def test_bfs_direction_respected(spark):
    # edges are directed: source downstream of a node cannot reach it
    d = _bfs(spark, [0, 1], [(0, 1)], [1], rounds=3)
    assert d == {0: -1, 1: 0}


# -- kcore -----------------------------------------------------------------


def _kcore(spark, nodes, edges, k, max_rounds=12):
    ndf = spark.createDataFrame([(x,) for x in nodes], "node long")
    edf = spark.createDataFrame(edges, "a long, b long")
    out = G.kcore(ndf, edf, k=k, max_rounds=max_rounds)
    return {r.node: (r.in_core, r.core_deg, r.peel_round) for r in out.collect()}


def test_kcore_k4_plus_pendant(spark):
    # K4 is a 3-core; the pendant (4) and the isolated node (9) peel in
    # round 1; K4 members keep degree 3 inside the core
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    got = _kcore(spark, [0, 1, 2, 3, 4, 9], k4 + [(3, 4)], k=3)
    assert got[4] == (False, None, 1)
    assert got[9] == (False, None, 1)
    for n in (0, 1, 2, 3):
        assert got[n] == (True, 3, None)


def test_kcore_cascade_peel_rounds(spark):
    # path 0-1-2-3-4 under k=2: ends peel first, cascade inward —
    # peel_round records the cascade order
    path = [(i, i + 1) for i in range(4)]
    got = _kcore(spark, list(range(5)), path, k=2)
    assert got[0][2] == 1 and got[4][2] == 1
    assert got[1][2] == 2 and got[3][2] == 2
    assert got[2][2] == 3
    assert all(not v[0] for v in got.values())


def test_kcore_raises_when_not_converged(spark):
    import pytest

    path = [(i, i + 1) for i in range(9)]
    with pytest.raises(RuntimeError, match="not converged"):
        _kcore(spark, list(range(10)), path, k=2, max_rounds=2)


def test_kcore_whole_graph_is_core(spark):
    # triangle under k=2: nothing peels (the empty-peeled branch)
    tri = [(0, 1), (1, 2), (0, 2)]
    got = _kcore(spark, [0, 1, 2], tri, k=2)
    assert all(v == (True, 2, None) for v in got.values())


# -- random_walks ----------------------------------------------------------


def _walks(spark, edges, starts, length):
    edf = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame([(x,) for x in starts], "node long")
    out = G.random_walks(edf, sdf, length=length)
    return {r.start: (r.final, r.path, r.steps) for r in out.collect()}


def test_walks_deterministic_and_edge_following(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 1)]
    a = _walks(spark, edges, [0, 1, 2], 4)
    b = _walks(spark, edges, [0, 1, 2], 4)
    assert a == b  # hash-seeded: bit-identical across runs
    for start, (final, path, steps) in a.items():
        hops = [int(x) for x in path.split("->")]
        assert hops[0] == start and hops[-1] == final and steps == len(hops) - 1
        for u, v in zip(hops, hops[1:]):
            assert (u, v) in edges  # every hop is a real edge


def test_walks_dangling_freezes(spark):
    # 1 has no out-edges: the walk from 0 stops there, steps stop advancing
    got = _walks(spark, [(0, 1)], [0, 1], 4)
    assert got[0] == (1, "0->1", 1)
    assert got[1] == (1, "1", 0)


def test_closure_dag_shortest_distance_is_deterministic(spark):
    # diamond DAG: 3 reaches 0 via 3->1->0 (len 2) and directly 3->0
    # (len 1) — dist must be the SHORTEST path, not join-order roulette
    edges = [(1, 0), (2, 0), (3, 1), (3, 0)]
    cl = _closure(spark, edges)
    assert cl[(3, 0)] == 1
    assert cl[(3, 1)] == 1 and cl[(1, 0)] == 1
