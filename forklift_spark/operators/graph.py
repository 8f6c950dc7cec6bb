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


def transitive_closure(
    edges: DataFrame,
    max_doublings: int = 4,
    child_col: str = "child",
    parent_col: str = "parent",
    agg: str = "min",
    weight_col: str | None = None,
) -> DataFrame:
    """All (descendant, ancestor, dist) pairs of a DAG/forest by pointer
    doubling: each round composes the closure-so-far with itself, so
    reachable distance doubles per round — O(log depth) rounds where the
    naive loop (and a recursive CTE) needs O(depth). ``dist`` is the
    SHORTEST path length: each compose keeps min(dist) per pair
    (min-plus squaring), which is deterministic on general DAGs where a
    pair can be reached by paths of different lengths — a keep-any
    dedup would return whichever duplicate the shuffle happened to
    order first. Convergence therefore tracks (pair count, Σdist):
    pairs can stop appearing while shortest distances are still
    shrinking.

    Scale: each round is one self-join of the closure keyed on the join
    column — pairs-count × log-depth total shuffle volume; per-round
    ``localCheckpoint`` cuts lineage exactly like ``pagerank``. Raises
    if the closure is still changing after ``max_doublings`` rounds
    (2^max_doublings hops) instead of returning a partial closure.

    ``agg="max"`` switches to MAX-PLUS squaring — ``dist`` becomes the
    LONGEST path (critical-path semantics; converges on DAGs, where
    every path is simple). ``weight_col`` seeds each edge's dist from
    that column instead of 1 (weighted paths; composition still sums).
    The (pairs, Σdist) convergence probe is agg-agnostic: under max the
    per-pair dist is nondecreasing, so equality is still a fixpoint."""
    fagg = F.max if agg == "max" else F.min
    seed = F.col(weight_col) if weight_col else F.lit(1)
    cl = (
        edges.select(
            F.col(child_col).alias("descn"),
            F.col(parent_col).alias("anc"),
            seed.alias("dist"),
        )
        .groupBy("descn", "anc")
        .agg(fagg("dist").alias("dist"))
        .localCheckpoint(eager=True)
    )

    def _state(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("dist"), F.lit(0)).alias("sd"),
        ).collect()[0]
        return row["n"], row["sd"]

    st = _state(cl)
    for _ in range(max_doublings):
        hop = cl.alias("a").join(
            cl.alias("b"), F.col("a.anc") == F.col("b.descn")
        ).select(
            F.col("a.descn").alias("descn"),
            F.col("b.anc").alias("anc"),
            (F.col("a.dist") + F.col("b.dist")).alias("dist"),
        )
        cl = (
            cl.unionByName(hop)
            .groupBy("descn", "anc")
            .agg(fagg("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        st2 = _state(cl)
        if st2 == st:
            return cl
        st = st2
    # one more compose must change nothing (neither pairs nor shortest
    # distances), else the depth exceeded 2^rounds
    hop = cl.alias("a").join(
        cl.alias("b"), F.col("a.anc") == F.col("b.descn")
    ).select(
        F.col("a.descn").alias("descn"),
        F.col("b.anc").alias("anc"),
        (F.col("a.dist") + F.col("b.dist")).alias("dist"),
    )
    fixpoint = (
        cl.unionByName(hop).groupBy("descn", "anc").agg(fagg("dist").alias("dist"))
    )
    if _state(fixpoint) != st:
        raise RuntimeError(
            f"transitive_closure: not converged after {max_doublings} doublings"
        )
    return cl


def bfs_hops(
    nodes: DataFrame,
    edges: DataFrame,
    sources: DataFrame,
    rounds: int,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Minimum hop distance from any source node within ``rounds`` hops
    (multi-source BFS as synchronous Bellman-Ford relaxation: each round
    relaxes every edge once — dist' = min(dist, min_in(dist_src + 1))).
    Unreached nodes get dist -1. Integer arithmetic throughout, so a
    fixed round count is bit-identical at any parallelism and an oracle
    can unroll the rounds. Scale: one edge-keyed join + one min-agg per
    round; ranks-frame is one row per node; lineage cut per round."""
    nodes = nodes.select(F.col(node_col).alias("node"))
    edges = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).dropDuplicates(["src", "dst"]).localCheckpoint(eager=True)
    dist = nodes.join(
        sources.select(F.col(node_col).alias("node"), F.lit(0).alias("dist")),
        "node",
        "left",
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        relax = (
            edges.join(dist, edges.src == dist.node)
            .filter(F.col("dist").isNotNull())
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("nd"))
            .groupBy("node")
            .agg(F.min("nd").alias("nd"))
        )
        dist = (
            dist.join(relax, "node", "left")
            .select("node", F.least("dist", "nd").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist.select("node", F.coalesce("dist", F.lit(-1)).alias("dist"))


def kcore(
    nodes: DataFrame,
    edges: DataFrame,
    k: int,
    max_rounds: int = 12,
    node_col: str = "node",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """k-core decomposition by synchronous peeling over UNDIRECTED
    edges: each round removes every node whose degree within the
    surviving subgraph is < k, until a fixpoint — what remains is the
    k-core (maximal subgraph of min-degree k). Returns one row per node:
    ``in_core``, ``core_deg`` (degree inside the final core; NULL if
    peeled) and ``peel_round`` (the round that removed it; NULL if it
    survived) — peel_round is the coreness-ordering signal a curation
    pipeline uses to rank nodes by structural robustness.

    Synchronous peeling is deterministic (no tie-break order), so a
    fixed round count is engine-exact and an oracle can unroll the
    rounds (idempotent once converged). Peeling can need MANY rounds on
    pathological graphs (a path peels two ends per round), so
    non-convergence within ``max_rounds`` RAISES rather than returning
    a superset of the core. Scale: each round is one edge-keyed
    semi-join + degree agg; lineage cut per round."""
    und = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    sym = (
        und.select(F.col("a").alias("node"), F.col("b").alias("nb"))
        .unionByName(und.select(F.col("b").alias("node"), F.col("a").alias("nb")))
        .dropDuplicates(["node", "nb"])
        .localCheckpoint(eager=True)
    )
    alive = nodes.select(F.col(node_col).alias("node")).localCheckpoint(eager=True)
    peeled = []  # (frame of nodes, round) accumulated per round
    converged = False
    for i in range(1, max_rounds + 1):
        deg = (
            sym.join(alive.withColumnRenamed("node", "nb"), "nb")
            .join(alive, "node")
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("dg"))
        )
        new_alive = deg.filter(F.col("dg") >= k).select("node").localCheckpoint(
            eager=True
        )
        removed = alive.join(new_alive, "node", "left_anti").select(
            "node", F.lit(i).alias("peel_round")
        ).localCheckpoint(eager=True)
        alive = new_alive
        if removed.limit(1).count() == 0:
            converged = True
            break
        peeled.append(removed)
    if not converged:
        raise RuntimeError(f"kcore: peeling not converged after {max_rounds} rounds")
    core_deg = (
        sym.join(alive.withColumnRenamed("node", "nb"), "nb")
        .join(alive, "node")
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_deg"))
    )
    out = nodes.select(F.col(node_col).alias("node")).join(core_deg, "node", "left")
    if peeled:
        rounds = peeled[0]
        for fr in peeled[1:]:
            rounds = rounds.unionByName(fr)
    else:  # the whole graph already was a k-core: nothing peeled
        rounds = nodes.select(
            F.col(node_col).alias("node"), F.lit(1).alias("peel_round")
        ).limit(0)
    return (
        out.join(rounds, "node", "left")
        .select(
            "node",
            F.col("peel_round").isNull().alias("in_core"),
            "core_deg",
            "peel_round",
        )
    )


def random_walks(
    edges: DataFrame,
    starts: DataFrame,
    length: int,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    seed: str = "rw",
) -> DataFrame:
    """Deterministic truncated random walks (the DeepWalk/node2vec
    corpus-generation step): one walk per start node; at step s from
    node u the next hop is neighbor index md5(seed:s:u:start) % outdeg
    over the dst-sorted adjacency list — a hash in place of an RNG, so
    the walk corpus is reproducible at any parallelism AND an
    independent engine can replay every hop. A dangling node ends the
    walk (steps stop advancing). Returns (start, final, path, steps)
    with path as a '->'-joined node string.

    Scale: the indexed adjacency is one window pass over edges; each of
    the ``length`` steps is one (node-keyed) join of the walk frontier
    against it — walk count × length total join rows, never edge-count
    × length."""
    from pyspark.sql import Window
    from forklift_spark.functions.hashing import md5_long

    nb = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .dropDuplicates(["src", "dst"])
        .withColumn(
            "idx",
            F.row_number().over(Window.partitionBy("src").orderBy("dst")) - 1,
        )
        .withColumn("od", F.count(F.lit(1)).over(Window.partitionBy("src")))
        .localCheckpoint(eager=True)
    )
    walk = starts.select(
        F.col(node_col).alias("start"),
        F.col(node_col).alias("cur"),
        F.col(node_col).cast("string").alias("path"),
        F.lit(0).alias("steps"),
    )
    for s in range(1, length + 1):
        pick = md5_long(
            F.concat(
                F.lit(f"{seed}:{s}:"),
                F.col("cur").cast("string"),
                F.lit(":"),
                F.col("start").cast("string"),
            )
        )
        walk = (
            walk.join(
                nb,
                (walk.cur == nb.src) & (nb.idx == pick % nb.od),
                "left",
            )
            .select(
                "start",
                F.coalesce("dst", "cur").alias("cur"),
                F.when(
                    F.col("dst").isNotNull(),
                    F.concat(F.col("path"), F.lit("->"), F.col("dst").cast("string")),
                )
                .otherwise(F.col("path"))
                .alias("path"),
                F.when(F.col("dst").isNotNull(), F.col("steps") + 1)
                .otherwise(F.col("steps"))
                .alias("steps"),
            )
            .localCheckpoint(eager=True)
        )
    return walk.select("start", F.col("cur").alias("final"), "path", "steps")
