"""Iterative graph operators: PageRank over a link graph.

No reference counterpart (taskrabbit/forklift moves flat rows); this is
the graph-centrality pass a web-derived corpus pipeline uses for
quality weighting (rank domains/pages by link authority before
sampling). Sibling of ``connected_components`` in operators/dedup.py;
same iteration discipline — materialize the edge list once, cut
lineage per round, size iteration parallelism to the graph.

Engine-exact iteration: floating-point PageRank is summation-order
dependent, so a distributed run could never hash-match an oracle.
Ranks here are INTEGER-SCALED (units of 1e-12 of total probability):
contributions are floor divisions, damping is integer multiply/floor
divide, and integer addition is associative at any parallelism — a
fixed iteration count yields bit-identical ranks in every engine. The
catalog oracle replays all iterations as unrolled SQL CTEs.

Dangling nodes (no out-links) redistribute their mass uniformly each
round (the published treatment — Page et al.'s random surfer jumps from
a sink to a random page; plain evaporation deflates regions fed through
dangling-adjacent nodes and changes the RANKING, not just the scale).
The per-node share is dm div N in integer units, so only the sub-unit
remainder (< N units of 1e-12) evaporates; the (1-d)/N teleport keeps
every node's rank positive. The oracle replays the dangling term
round-for-round.

Scale (100 TB / billion-edge graphs): edges shuffle-partition on the
source for the contribution join and on the target for the sum —
two exchanges per iteration, each over the edge list only; ranks are
one row per node. Per-round ``localCheckpoint`` keeps the plan flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000_000_000  # ranks in units of 1e-12
DAMPING_NUM, DAMPING_DEN = 85, 100  # d = 0.85 as an exact ratio


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_nodes: int,
    iterations: int = 5,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Integer-scaled PageRank: ``iterations`` fixed rounds of
    r' = (1-d)*SCALE/N + d * sum(r_src // outdeg_src) with every
    division a floor division on non-negative integers.

    ``n_nodes`` is a bounded scalar (same contract as HWM reads).
    Returns DataFrame(node, rank) with rank summing to <= SCALE
    (integer floors account for the small gap)."""
    nodes = nodes.select(F.col(node_col).alias("node"))
    edges = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # src -> (dst, outdeg) resolved once; each round only re-joins ranks.
    fanout = edges.join(deg, "src").localCheckpoint(eager=True)

    teleport = (RANK_SCALE * (DAMPING_DEN - DAMPING_NUM)) // (DAMPING_DEN * n_nodes)
    ranks = nodes.select("node", F.lit(RANK_SCALE // n_nodes).alias("rank"))
    for _ in range(iterations):
        # `div` is true integer division (double `/` + cast can round
        # across an integer boundary once operands pass ~2^46).
        contrib = (
            fanout.join(ranks, fanout.src == ranks.node)
            .select("dst", F.expr("rank div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        # dangling mass: rank held by nodes with no out-links, shared
        # uniformly (dm div N per node — a 1-row broadcast scalar)
        dang = (
            ranks.join(deg, ranks.node == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("_dm"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                F.expr(
                    f"{teleport}L + (({DAMPING_NUM} * (coalesce(s, 0L) "
                    f"+ _dm div {n_nodes}L)) div {DAMPING_DEN})"
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
