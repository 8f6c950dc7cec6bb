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
