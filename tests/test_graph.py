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
