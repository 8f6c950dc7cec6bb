"""Graph queries: PageRank link authority over a derived link graph.

The documents table stands in for a crawled page set: each page links
to 1-3 others through a deterministic closed form of its doc_id (same
fixture philosophy as the fake payloads/URLs), giving a reproducible
directed graph with varied out-degrees, dangling nodes (self-link
filtered away), and hubs. The operator under test is the REAL iterative
engine (operators/graph.py) — integer-scaled arithmetic makes a fixed
iteration count bit-identical at any parallelism, so the oracle can
replay ALL rounds as unrolled SQL CTEs. An oracle-backed iterative
algorithm: the hash certifies edge derivation, degree handling,
teleport, damping, and five full propagation rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from forklift_spark import tables
from forklift_spark.operators import graph as G
from forklift_spark.queries import query

_ITERATIONS = 5
_SCALE = G.RANK_SCALE


def _pagerank_ctes(iterations: int) -> str:
    parts = [
        "WITH nn AS (SELECT count(*) AS n FROM documents),",
        "ed AS (",
        "  SELECT DISTINCT doc_id AS src,",
        "         (doc_id * (2 * k + 5) + k) % nn.n AS dst",
        "  FROM documents, nn, (SELECT unnest(range(1, 4)) AS k) ks",
        "  WHERE k <= 1 + doc_id % 3",
        "    AND (doc_id * (2 * k + 5) + k) % nn.n <> doc_id",
        "),",
        "deg AS (SELECT src, count(*) AS outdeg FROM ed GROUP BY src),",
        f"r0 AS (SELECT doc_id AS node, {_SCALE} // nn.n AS rank FROM documents, nn),",
    ]
    for i in range(1, iterations + 1):
        parts += [
            f"c{i} AS (",
            f"  SELECT ed.dst, sum(r{i-1}.rank // deg.outdeg) AS s",
            f"  FROM ed JOIN deg USING (src) JOIN r{i-1} ON r{i-1}.node = ed.src",
            "  GROUP BY ed.dst",
            "),",
            # dangling mass of round i-1, shared uniformly (dm // n each)
            f"g{i} AS (",
            f"  SELECT coalesce(sum(r.rank), 0) AS dm FROM r{i-1} r",
            "  LEFT JOIN deg ON deg.src = r.node WHERE deg.src IS NULL",
            "),",
            f"r{i} AS (",
            f"  SELECT d.doc_id AS node,",
            f"    ({_SCALE} * {G.DAMPING_DEN - G.DAMPING_NUM}) // ({G.DAMPING_DEN} * nn.n)",
            f"      + ({G.DAMPING_NUM} * (coalesce(c{i}.s, 0) + g{i}.dm // nn.n)) // {G.DAMPING_DEN} AS rank",
            f"  FROM documents d CROSS JOIN nn CROSS JOIN g{i} LEFT JOIN c{i} ON c{i}.dst = d.doc_id",
            "),",
        ]
    parts[-1] = parts[-1].rstrip(",")  # close the final CTE without a comma
    return "\n".join(parts)


def _pagerank_oracle(iterations: int) -> str:
    return (
        _pagerank_ctes(iterations)
        + f"\nSELECT node, CAST(rank AS BIGINT) AS rank_e12 FROM r{iterations}"
    )


PAGERANK_ORACLE = _pagerank_oracle(_ITERATIONS)


# --------------------------------------------------------------------------
# q_pagerank — five integer-exact PageRank rounds over the derived link
# graph; the oracle unrolls every round (c1/r1 .. c5/r5 CTEs) and must
# match rank-for-rank.
# --------------------------------------------------------------------------
@query("q_pagerank", PAGERANK_ORACLE)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    n = docs.count()  # bounded scalar (node count), same contract as HWM reads
    nodes = docs.select(F.col("doc_id").alias("node"))
    edges = (
        docs.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.sequence(F.lit(1), (F.lit(1) + F.col("doc_id") % 3).cast("int"))
            ).alias("k"),
        )
        .select(
            "src",
            ((F.col("src") * (2 * F.col("k") + 5) + F.col("k")) % n).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    ranks = G.pagerank(nodes, edges, n, iterations=_ITERATIONS)
    return ranks.select("node", F.col("rank").alias("rank_e12"))


# --------------------------------------------------------------------------
# q_domain_authority — cross-family composition: PageRank link authority
# aggregated to registrable domains (the web family's closed-form
# domains), temperature-flattened into sampling weights (the same
# decimal-sqrt mix discipline as q_temperature_mix). "Sample sources by
# link authority" — graph + web + assembly stitched end to end, and the
# oracle replays ALL of it: five unrolled PageRank rounds, the domain
# rollup, and the flattened budget arithmetic.
# --------------------------------------------------------------------------
_EPOCH_TOKENS = 1_000_000

DOMAIN_AUTHORITY_ORACLE = _pagerank_ctes(_ITERATIONS) + f""",
dom AS (
  SELECT d.doc_id,
    concat(d.source, '.',
      CASE d.doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
           WHEN 2 THEN 'co.uk' ELSE 'io' END) AS domain
  FROM documents d
), auth AS (
  SELECT dom.domain,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(r{_ITERATIONS}.rank) AS BIGINT) AS authority
  FROM r{_ITERATIONS} JOIN dom ON dom.doc_id = r{_ITERATIONS}.node
  GROUP BY dom.domain
), w AS (
  SELECT *, CAST(sqrt(CAST(authority AS DOUBLE)) AS DECIMAL(28,9)) AS w_dec
  FROM auth
)
SELECT domain, n_docs, authority,
  round(CAST(w_dec AS DOUBLE) / CAST(sum(w_dec) OVER () AS DOUBLE), 9) AS share,
  CAST(floor(CAST(w_dec AS DOUBLE) / CAST(sum(w_dec) OVER () AS DOUBLE)
             * {_EPOCH_TOKENS}) AS BIGINT) AS epoch_tokens
FROM w
"""


@query("q_domain_authority", DOMAIN_AUTHORITY_ORACLE)
def q_domain_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = tables.load(spark, sf_dir, "documents")
    n = docs.count()  # bounded scalar (node count)
    nodes = docs.select(F.col("doc_id").alias("node"))
    edges = (
        docs.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.sequence(F.lit(1), (F.lit(1) + F.col("doc_id") % 3).cast("int"))
            ).alias("k"),
        )
        .select(
            "src",
            ((F.col("src") * (2 * F.col("k") + 5) + F.col("k")) % n).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    ranks = G.pagerank(nodes, edges, n, iterations=_ITERATIONS)
    dom = docs.select(
        "doc_id",
        F.concat(
            F.col("source"), F.lit("."),
            F.when(F.col("doc_id") % 4 == 0, "com")
            .when(F.col("doc_id") % 4 == 1, "org")
            .when(F.col("doc_id") % 4 == 2, "co.uk")
            .otherwise("io"),
        ).alias("domain"),
    )
    auth = (
        ranks.join(dom, ranks.node == dom.doc_id)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("rank").cast("bigint").alias("authority"),
        )
    )
    w = auth.withColumn(
        "w_dec", F.sqrt(F.col("authority").cast("double")).cast("decimal(28,9)")
    )
    total = F.sum("w_dec").over(W.partitionBy())
    share = F.col("w_dec").cast("double") / total.cast("double")
    return w.select(
        "domain", "n_docs", "authority",
        F.round(share, 9).alias("share"),
        F.floor(share * _EPOCH_TOKENS).cast("bigint").alias("epoch_tokens"),
    )


# --------------------------------------------------------------------------
# q_triangle_count — per-node triangle participation over the derived
# link graph (undirected), counted by DEGREE ORDERING: every edge is
# oriented from its lower-(degree, id) endpoint to the higher one, so
# each triangle has exactly one topological (a < b < c) orientation and
# is enumerated once by the wedge join. The classic bound: total wedges
# under degree ordering is O(m^1.5) regardless of hubs — a hub's
# postings never fan out as wedge centers, which is what makes this
# shape survive power-law graphs at 100 TB (plain (src join src) is
# quadratic in the hub degree). Integer-exact; the oracle replays the
# orientation and both joins.
# --------------------------------------------------------------------------
TRIANGLE_ORACLE = """
WITH nn AS (SELECT count(*) AS n FROM documents),
ed AS (
  SELECT DISTINCT doc_id AS src,
         (doc_id * (2 * k + 5) + k) % nn.n AS dst
  FROM documents, nn, (SELECT unnest(range(1, 4)) AS k) ks
  WHERE k <= 1 + doc_id % 3
    AND (doc_id * (2 * k + 5) + k) % nn.n <> doc_id
),
und AS (
  SELECT src AS u, dst AS v FROM ed
  UNION
  SELECT dst, src FROM ed
),
deg AS (SELECT u, count(*) AS d FROM und GROUP BY u),
o AS (
  SELECT und.u AS a, und.v AS b
  FROM und
  JOIN deg da ON da.u = und.u
  JOIN deg db ON db.u = und.v
  WHERE da.d < db.d OR (da.d = db.d AND und.u < und.v)
),
tri AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM o e1
  JOIN o e2 ON e2.a = e1.b
  JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b
),
pernode AS (
  SELECT node, count(*) AS n_triangles
  FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY node
)
SELECT CAST(node AS BIGINT) AS node,
       CAST(n_triangles AS BIGINT) AS n_triangles
FROM pernode
"""


@query("q_triangle_count", TRIANGLE_ORACLE)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    n = docs.count()  # bounded scalar (node count)
    edges = (
        docs.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.sequence(F.lit(1), (F.lit(1) + F.col("doc_id") % 3).cast("int"))
            ).alias("k"),
        )
        .select(
            "src",
            ((F.col("src") * (2 * F.col("k") + 5) + F.col("k")) % n).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    und = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
    )
    und = und.persist()  # degree agg + orientation join + wedge closure
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    da = deg.select(F.col("u").alias("_ua"), F.col("d").alias("da"))
    db = deg.select(F.col("u").alias("_ub"), F.col("d").alias("db"))
    o = (
        und.join(da, und.u == da._ua)
        .join(db, und.v == db._ub)
        .filter(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("u") < F.col("v")))
        )
        .select(F.col("u").alias("a"), F.col("v").alias("b"))
    )
    o = o.persist()  # three-way self-join
    e1 = o.select(F.col("a").alias("a"), F.col("b").alias("b"))
    e2 = o.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    e3 = o.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    pernode = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return pernode.select(F.col("node").cast("bigint").alias("node"), "n_triangles")


# --------------------------------------------------------------------------
# q_bom_explode — bill-of-materials explosion + rollup over a derived
# part hierarchy (parent(p) = (p-1) div 4 — a 4-ary tree rooted at part
# 0, depth ~log4 N so it DEEPENS with SF). The operator is
# transitive_closure (operators/graph.py): pointer DOUBLING, O(log
# depth) self-join rounds where a recursive CTE walks one level per
# step — the distributed closure shape for deep hierarchies. Rollups:
# node depth, subtree size, direct children, exact-decimal subtree
# retail value. The oracle computes the same closure with a genuinely
# recursive CTE — two different algorithms, one fixpoint; the hash
# certifies the doubling loses/invents no pairs.
# --------------------------------------------------------------------------
BOM_ORACLE = """
WITH RECURSIVE cl AS (
  SELECT p_partkey AS descn, (p_partkey - 1) // 4 AS anc, 1 AS dist
  FROM part WHERE p_partkey >= 1
  UNION ALL
  SELECT cl.descn, (cl.anc - 1) // 4, cl.dist + 1
  FROM cl WHERE cl.anc >= 1
), allp AS (
  SELECT * FROM cl
  UNION ALL
  SELECT p_partkey, p_partkey, 0 FROM part
), agg AS (
  SELECT allp.anc AS p_partkey,
    CAST(count(*) AS BIGINT) AS subtree_size,
    CAST(count(*) FILTER (WHERE allp.dist = 1) AS BIGINT) AS n_children,
    CAST(SUM(CAST(p.p_retailprice AS DECIMAL(14,2))) AS DOUBLE) AS subtree_retail
  FROM allp JOIN part p ON p.p_partkey = allp.descn
  GROUP BY allp.anc
), dep AS (
  SELECT descn AS p_partkey, CAST(max(dist) AS BIGINT) AS depth
  FROM allp GROUP BY descn
)
SELECT a.p_partkey, d.depth, a.subtree_size, a.n_children, a.subtree_retail
FROM agg a JOIN dep d USING (p_partkey)
"""


@query("q_bom_explode", BOM_ORACLE)
def q_bom_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.functions.exact import MONEY, dec

    part = tables.load(spark, sf_dir, "part")
    edges = part.filter(F.col("p_partkey") >= 1).select(
        F.col("p_partkey").alias("child"),
        F.expr("(p_partkey - 1) div 4").alias("parent"),
    )
    cl = G.transitive_closure(edges, max_doublings=4)
    allp = cl.unionByName(
        part.select(
            F.col("p_partkey").alias("descn"),
            F.col("p_partkey").alias("anc"),
            F.lit(0).alias("dist"),
        )
    )
    retail = part.select("p_partkey", dec("p_retailprice", MONEY).alias("pr"))
    agg = (
        allp.join(retail, allp.descn == retail.p_partkey)
        .groupBy("anc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("subtree_size"),
            F.sum((F.col("dist") == 1).cast("bigint")).cast("bigint").alias("n_children"),
            F.sum("pr").cast("double").alias("subtree_retail"),
        )
    )
    dep = allp.groupBy("descn").agg(F.max("dist").cast("bigint").alias("depth"))
    return (
        agg.join(dep, agg.anc == dep.descn)
        .select(
            F.col("anc").alias("p_partkey"),
            "depth",
            "subtree_size",
            "n_children",
            "subtree_retail",
        )
    )


# --------------------------------------------------------------------------
# q_bfs_hops — multi-source BFS reachability over the derived link graph
# (the crawl-frontier / seed-distance pass: how many hops is each page
# from a trusted seed set). Synchronous relaxation, integer hop counts,
# fixed 4 rounds — the oracle unrolls every round (r1/d1 .. r4/d4) with
# explicit CASE min-merges (no reliance on either engine's
# least()-vs-NULL semantics). Unreached nodes report -1.
# --------------------------------------------------------------------------
_BFS_ROUNDS = 4
_BFS_SRC_MOD = 83


def _bfs_oracle(rounds: int) -> str:
    parts = [
        "WITH nn AS (SELECT count(*) AS n FROM documents),",
        "ed AS (",
        "  SELECT DISTINCT doc_id AS src,",
        "         (doc_id * (2 * k + 5) + k) % nn.n AS dst",
        "  FROM documents, nn, (SELECT unnest(range(1, 4)) AS k) ks",
        "  WHERE k <= 1 + doc_id % 3",
        "    AND (doc_id * (2 * k + 5) + k) % nn.n <> doc_id",
        "),",
        f"d0 AS (SELECT doc_id AS node, CASE WHEN doc_id % {_BFS_SRC_MOD} = 0 THEN 0 END AS dist FROM documents),",
    ]
    for i in range(1, rounds + 1):
        parts += [
            f"r{i} AS (",
            f"  SELECT e.dst AS node, min(d.dist + 1) AS nd",
            f"  FROM ed e JOIN d{i-1} d ON d.node = e.src",
            "  WHERE d.dist IS NOT NULL GROUP BY e.dst",
            "),",
            # MATERIALIZED: DuckDB inlines plain CTEs per reference; a{i}
            # references a{i-1} three times, so unhinted rounds expand
            # EXPONENTIALLY (measured: file-handle exhaustion at 12 rounds)
            f"d{i} AS MATERIALIZED (",
            "  SELECT d.node,",
            "    CASE WHEN d.dist IS NULL THEN r.nd",
            "         WHEN r.nd IS NULL THEN d.dist",
            "         WHEN r.nd < d.dist THEN r.nd ELSE d.dist END AS dist",
            f"  FROM d{i-1} d LEFT JOIN r{i} r ON r.node = d.node",
            "),",
        ]
    parts[-1] = parts[-1].rstrip(",")
    return "\n".join(parts) + (
        f"\nSELECT node, CAST(coalesce(dist, -1) AS BIGINT) AS dist FROM d{rounds}"
    )


BFS_ORACLE = _bfs_oracle(_BFS_ROUNDS)


@query("q_bfs_hops", BFS_ORACLE)
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    n = docs.count()  # bounded scalar (node count), same contract as q_pagerank
    nodes = docs.select(F.col("doc_id").alias("node"))
    edges = (
        docs.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.sequence(F.lit(1), (F.lit(1) + F.col("doc_id") % 3).cast("int"))
            ).alias("k"),
        )
        .select(
            "src",
            ((F.col("src") * (2 * F.col("k") + 5) + F.col("k")) % n).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    sources = nodes.filter(F.col("node") % _BFS_SRC_MOD == 0)
    dist = G.bfs_hops(nodes, edges, sources, rounds=_BFS_ROUNDS)
    return dist.select("node", F.col("dist").cast("bigint").alias("dist"))


# --------------------------------------------------------------------------
# q_kcore — k-core decomposition (k=3) of the undirected link graph by
# synchronous peeling (operators/graph.kcore): in_core membership, the
# degree inside the final core, and the peel round for removed nodes
# (the coreness-ordering signal). Synchronous peeling has no tie-break
# order, so the oracle unrolls 12 rounds (measured: 8 needed at sf0.01,
# 10 at sf0.1; converged rounds are idempotent no-ops) — the engine
# RAISES if the graph hasn't converged by then rather than returning a
# superset of the core.
# --------------------------------------------------------------------------
_KCORE_K = 3
_KCORE_ROUNDS = 12

_UND_EDGES_CTE = """nn AS (SELECT count(*) AS n FROM documents),
ed0 AS (
  SELECT DISTINCT doc_id AS src,
         (doc_id * (2 * k + 5) + k) % nn.n AS dst
  FROM documents, nn, (SELECT unnest(range(1, 4)) AS k) ks
  WHERE k <= 1 + doc_id % 3
    AND (doc_id * (2 * k + 5) + k) % nn.n <> doc_id
),
ed AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM ed0),
sym AS MATERIALIZED (SELECT a AS node, b AS nb FROM ed UNION ALL SELECT b, a FROM ed)"""


def _kcore_oracle(k: int, rounds: int) -> str:
    parts = [
        "WITH " + _UND_EDGES_CTE + ",",
        "a0 AS (SELECT doc_id AS node FROM documents),",
    ]
    for i in range(1, rounds + 1):
        parts += [
            # MATERIALIZED: DuckDB inlines plain CTEs per reference; a{i}
            # references a{i-1} three times, so unhinted rounds expand
            # EXPONENTIALLY (measured: file-handle exhaustion at 12 rounds)
            f"d{i} AS MATERIALIZED (",
            f"  SELECT s.node, count(*) AS dg FROM sym s",
            f"  JOIN a{i-1} x ON x.node = s.node JOIN a{i-1} y ON y.node = s.nb",
            "  GROUP BY s.node",
            "),",
            f"a{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE dg >= {k}),",
            f"rm{i} AS (SELECT node, {i} AS pr FROM a{i-1}",
            f"  WHERE node NOT IN (SELECT node FROM a{i})),",
        ]
    parts += [
        "rmall AS (" + " UNION ALL ".join(
            f"SELECT * FROM rm{i}" for i in range(1, rounds + 1)
        ) + "),",
        "cd AS (",
        "  SELECT s.node, count(*) AS core_deg FROM sym s",
        f"  JOIN a{rounds} x ON x.node = s.node JOIN a{rounds} y ON y.node = s.nb",
        "  GROUP BY s.node",
        ")",
    ]
    return "\n".join(parts) + """
SELECT n.node, rmall.pr IS NULL AS in_core,
  CAST(cd.core_deg AS BIGINT) AS core_deg,
  CAST(rmall.pr AS BIGINT) AS peel_round
FROM a0 n LEFT JOIN rmall USING (node) LEFT JOIN cd USING (node)"""


KCORE_ORACLE = _kcore_oracle(_KCORE_K, _KCORE_ROUNDS)


@query("q_kcore", KCORE_ORACLE)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    n = docs.count()  # bounded scalar, same contract as q_pagerank
    nodes = docs.select(F.col("doc_id").alias("node"))
    ed0 = (
        docs.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.sequence(F.lit(1), (F.lit(1) + F.col("doc_id") % 3).cast("int"))
            ).alias("k"),
        )
        .select(
            "src",
            ((F.col("src") * (2 * F.col("k") + 5) + F.col("k")) % n).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    und = ed0.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).dropDuplicates(["a", "b"])
    out = G.kcore(nodes, und, k=_KCORE_K, max_rounds=_KCORE_ROUNDS)
    return out.select(
        "node",
        "in_core",
        F.col("core_deg").cast("bigint").alias("core_deg"),
        F.col("peel_round").cast("bigint").alias("peel_round"),
    )


# --------------------------------------------------------------------------
# q_random_walks — deterministic truncated random walks over the link
# graph (operators/graph.random_walks): the DeepWalk/node2vec corpus
# generator with a seeded hash in place of the RNG, so the emitted walk
# corpus is reproducible at any parallelism and the oracle replays every
# hop (indexed adjacency + 4 unrolled step joins, hash % outdeg next-hop
# choice, dangling nodes freeze the walk).
# --------------------------------------------------------------------------
_WALK_LEN = 4


def _walks_oracle(length: int) -> str:
    from forklift_spark.functions.hashing import md5_long_sql

    parts = [
        "WITH nn AS (SELECT count(*) AS n FROM documents),",
        "ed AS (",
        "  SELECT DISTINCT doc_id AS src,",
        "         (doc_id * (2 * k + 5) + k) % nn.n AS dst",
        "  FROM documents, nn, (SELECT unnest(range(1, 4)) AS k) ks",
        "  WHERE k <= 1 + doc_id % 3",
        "    AND (doc_id * (2 * k + 5) + k) % nn.n <> doc_id",
        "),",
        "nb AS (",
        "  SELECT src, dst,",
        "    row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,",
        "    count(*) OVER (PARTITION BY src) AS od",
        "  FROM ed",
        "),",
        "w0 AS (SELECT doc_id AS start, doc_id AS cur,",
        "       CAST(doc_id AS VARCHAR) AS path, 0 AS steps FROM documents),",
    ]
    for s in range(1, length + 1):
        pick = md5_long_sql(
            f"'rw:{s}:' || CAST(w.cur AS VARCHAR) || ':' || CAST(w.start AS VARCHAR)"
        )
        parts += [
            f"w{s} AS (",
            "  SELECT w.start,",
            "    coalesce(nb.dst, w.cur) AS cur,",
            "    CASE WHEN nb.dst IS NOT NULL",
            "         THEN w.path || '->' || CAST(nb.dst AS VARCHAR)",
            "         ELSE w.path END AS path,",
            "    w.steps + CASE WHEN nb.dst IS NOT NULL THEN 1 ELSE 0 END AS steps",
            f"  FROM w{s-1} w LEFT JOIN nb",
            f"    ON nb.src = w.cur AND nb.idx = {pick} % nb.od",
            "),",
        ]
    parts[-1] = parts[-1].rstrip(",")
    return "\n".join(parts) + (
        f"\nSELECT start, cur AS final, path, CAST(steps AS BIGINT) AS steps FROM w{length}"
    )


WALKS_ORACLE = _walks_oracle(_WALK_LEN)


@query("q_random_walks", WALKS_ORACLE)
def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    n = docs.count()
    edges = (
        docs.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.sequence(F.lit(1), (F.lit(1) + F.col("doc_id") % 3).cast("int"))
            ).alias("k"),
        )
        .select(
            "src",
            ((F.col("src") * (2 * F.col("k") + 5) + F.col("k")) % n).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    starts = docs.select(F.col("doc_id").alias("node"))
    walks = G.random_walks(edges, starts, length=_WALK_LEN)
    return walks.select(
        "start", "final", "path", F.col("steps").cast("bigint").alias("steps")
    )


# --------------------------------------------------------------------------
# q_link_predict — link prediction over the synthetic doc graph (the
# q_triangle_count edge set): for every NON-adjacent pair with at
# least one common neighbor, common-neighbor count and the Adamic-Adar
# score sum(1/ln(deg(z))) over shared neighbors z, top 20. Wedge
# enumeration (e1=(z,a), e2=(z,b), a<b) through each center z —
# centers of degree 1 cannot form a wedge, so ln(deg) >= ln(2) by
# construction; at 100 TB a hub center fans deg^2 wedges, which a
# degree cap / neighborhood sample bounds (documented, not needed at
# catalog grain). Engine exactness: ln() is bit-identical across
# engines on exact-integer doubles (the DSIR finding), so per-center
# contributions quantize to floor(1e9/ln(d)) BIGINTs and the pair
# score is an order-independent integer sum. Existing edges leave via
# anti-join; (score, cn, a, b) ordering is total, so LIMIT 20 is
# deterministic.
# --------------------------------------------------------------------------
LINK_PREDICT_ORACLE = """
WITH nn AS (SELECT count(*) AS n FROM documents),
ed AS (
  SELECT DISTINCT doc_id AS src,
         (doc_id * (2 * k + 5) + k) % nn.n AS dst
  FROM documents, nn, (SELECT unnest(range(1, 4)) AS k) ks
  WHERE k <= 1 + doc_id % 3
    AND (doc_id * (2 * k + 5) + k) % nn.n <> doc_id
),
und AS (
  SELECT src AS u, dst AS v FROM ed
  UNION
  SELECT dst, src FROM ed
),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u),
w AS (
  SELECT e1.u AS z, e1.v AS a, e2.v AS b
  FROM und e1 JOIN und e2 ON e1.u = e2.u AND e1.v < e2.v
),
sc AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cn,
    CAST(SUM(CAST(floor(1e9 / ln(CAST(deg.d AS DOUBLE))) AS BIGINT)) AS BIGINT)
      AS aa_e9
  FROM w JOIN deg ON deg.u = w.z
  GROUP BY a, b
),
cand AS (
  SELECT sc.* FROM sc
  WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.u = sc.a AND und.v = sc.b)
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, cn, aa_e9
FROM cand ORDER BY aa_e9 DESC, cn DESC, a, b LIMIT 20
"""


@query("q_link_predict", LINK_PREDICT_ORACLE)
def q_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    n = docs.count()  # bounded scalar (node count)
    edges = (
        docs.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.sequence(F.lit(1), (F.lit(1) + F.col("doc_id") % 3).cast("int"))
            ).alias("k"),
        )
        .select(
            "src",
            ((F.col("src") * (2 * F.col("k") + 5) + F.col("k")) % n).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    und = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
        .persist()  # wedge join + anti-join + degree agg
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    e1 = und.select(F.col("u").alias("z"), F.col("v").alias("a"))
    e2 = und.select(F.col("u").alias("z"), F.col("v").alias("b"))
    wedges = e1.join(e2, "z").filter(F.col("a") < F.col("b"))
    sc = (
        wedges.join(deg.withColumnRenamed("u", "z"), "z")
        .withColumn(
            "contrib",
            F.expr("cast(floor(1e9 / ln(cast(d as double))) as bigint)"),
        )
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cn"),
            F.sum("contrib").cast("bigint").alias("aa_e9"),
        )
    )
    cand = sc.join(
        und,
        (sc["a"] == und["u"]) & (sc["b"] == und["v"]),
        "left_anti",
    )
    return cand.orderBy(F.col("aa_e9").desc(), F.col("cn").desc(), "a", "b").limit(20)


# --------------------------------------------------------------------------
# q_modularity — Newman modularity of a GIVEN node partition (here:
# the doc's source) over the synthetic doc graph — the community-
# quality metric that scores whether sources form graph communities.
#   Q = sum_c [ L_c/m - (D_c/2m)^2 ]
# is rational, so the per-community contribution is published as the
# INTEGER numerator over the common denominator M2^2 (M2 = 2m = the
# directed edge count): M2^2 * Q_c = 2*M2*L_c - D_c^2 — exact BIGINT
# end to end, with one final IEEE division for the readable double.
# Both directions of every undirected edge are counted once each, so
# intra-community rows halve to L_c without parity loss. One scalar
# 1-row M2 frame broadcasts (q11/q15 shape); everything else is
# equi-joins on node id and one per-community rollup.
# --------------------------------------------------------------------------
MODULARITY_ORACLE = """
WITH nn AS (SELECT count(*) AS n FROM documents),
ed AS (
  SELECT DISTINCT doc_id AS src,
         (doc_id * (2 * k + 5) + k) % nn.n AS dst
  FROM documents, nn, (SELECT unnest(range(1, 4)) AS k) ks
  WHERE k <= 1 + doc_id % 3
    AND (doc_id * (2 * k + 5) + k) % nn.n <> doc_id
),
und AS (
  SELECT src AS u, dst AS v FROM ed
  UNION
  SELECT dst, src FROM ed
),
m2 AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM und),
com AS (SELECT doc_id, source FROM documents),
deg AS (
  SELECT c.source, CAST(count(*) AS BIGINT) AS d_c,
         CAST(count(DISTINCT und.u) AS BIGINT) AS n_nodes
  FROM und JOIN com c ON c.doc_id = und.u
  GROUP BY c.source
),
intra AS (
  SELECT cu.source, CAST(count(*) // 2 AS BIGINT) AS l_c
  FROM und
  JOIN com cu ON cu.doc_id = und.u
  JOIN com cv ON cv.doc_id = und.v
  WHERE cu.source = cv.source
  GROUP BY cu.source
)
SELECT d.source, d.n_nodes, d.d_c, COALESCE(i.l_c, 0) AS l_c, m2.m2,
  CAST(2 * m2.m2 * COALESCE(i.l_c, 0) - d.d_c * d.d_c AS BIGINT) AS q_num,
  CAST(2 * m2.m2 * COALESCE(i.l_c, 0) - d.d_c * d.d_c AS DOUBLE)
    / CAST(m2.m2 * m2.m2 AS DOUBLE) AS q_part
FROM deg d LEFT JOIN intra i ON i.source = d.source CROSS JOIN m2
"""


@query("q_modularity", MODULARITY_ORACLE)
def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    n = docs.count()  # bounded scalar (node count)
    edges = (
        docs.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.sequence(F.lit(1), (F.lit(1) + F.col("doc_id") % 3).cast("int"))
            ).alias("k"),
        )
        .select(
            "src",
            ((F.col("src") * (2 * F.col("k") + 5) + F.col("k")) % n).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    und = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
        .persist()  # M2 count + degree rollup + intra join
    )
    com = F.broadcast(docs.select("doc_id", "source"))
    m2 = und.agg(F.count(F.lit(1)).cast("bigint").alias("m2"))
    deg = (
        und.join(com, und["u"] == com["doc_id"])
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("d_c"),
            F.countDistinct("u").cast("bigint").alias("n_nodes"),
        )
    )
    cu = com.select(F.col("doc_id").alias("_u"), F.col("source").alias("su"))
    cv = com.select(F.col("doc_id").alias("_v"), F.col("source").alias("sv"))
    intra = (
        und.join(F.broadcast(cu), und["u"] == F.col("_u"))
        .join(F.broadcast(cv), und["v"] == F.col("_v"))
        .filter(F.col("su") == F.col("sv"))
        .groupBy(F.col("su").alias("source"))
        .agg(F.expr("cast(count(*) div 2 as bigint)").alias("l_c"))
    )
    out = (
        deg.join(intra, "source", "left")
        .withColumn("l_c", F.coalesce("l_c", F.lit(0).cast("bigint")))
        .crossJoin(F.broadcast(m2))  # 1-row scalar edge count
    )
    return out.select(
        "source",
        "n_nodes",
        "d_c",
        "l_c",
        "m2",
        F.expr("cast(2 * m2 * l_c - d_c * d_c as bigint)").alias("q_num"),
        (
            F.expr("cast(2 * m2 * l_c - d_c * d_c as double)")
            / F.expr("cast(m2 * m2 as double)")
        ).alias("q_part"),
    )


# --------------------------------------------------------------------------
# q_critical_path — critical-path analysis (CPM) over a synthesized
# multi-path task DAG (task k depends on k div 2 AND k div 3 — a
# genuine DAG where longest != shortest, unlike the BOM tree): each
# task's earliest start = the LONGEST duration-weighted ancestor
# chain, finish = start + own duration. Runs as MAX-PLUS pointer
# doubling (transitive_closure(agg="max", weight_col=...) — the same
# O(log depth) squaring as the BOM closure with the semiring swapped;
# converges because DAG paths are simple). The oracle replays longest
# paths with a recursive CTE using UNION dedup on (descn, anc, dist)
# — path-choice sequences collapse to distinct triples, bounding the
# recursion. Integer durations 1 + k % 5.
# --------------------------------------------------------------------------
CRITICAL_PATH_ORACLE = """
WITH RECURSIVE t AS (
  SELECT p_partkey AS k, 1 + p_partkey % 5 AS dur
  FROM part WHERE p_partkey >= 1 AND p_partkey < 500
), e AS (
  SELECT k AS child, k // 2 AS parent FROM t WHERE k >= 2
  UNION
  SELECT k, k // 3 FROM t WHERE k >= 2 AND k // 3 >= 1 AND k // 3 <> k // 2
), cl AS (
  SELECT e.child AS descn, e.parent AS anc, td.dur AS dist
  FROM e JOIN t td ON td.k = e.parent
  UNION
  SELECT cl.descn, e.parent, cl.dist + td.dur
  FROM cl JOIN e ON e.child = cl.anc JOIN t td ON td.k = e.parent
), mx AS (
  SELECT descn, max(dist) AS dist FROM cl GROUP BY descn, anc
), es AS (
  SELECT descn, CAST(max(dist) AS BIGINT) AS es,
    CAST(count(*) AS BIGINT) AS n_anc
  FROM mx GROUP BY descn
)
SELECT t.k AS task, CAST(t.dur AS BIGINT) AS dur,
  COALESCE(es.n_anc, 0) AS n_anc,
  COALESCE(es.es, 0) AS es,
  COALESCE(es.es, 0) + t.dur AS finish
FROM t LEFT JOIN es ON es.descn = t.k
"""


@query("q_critical_path", CRITICAL_PATH_ORACLE)
def q_critical_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = tables.load(spark, sf_dir, "part")
    t = part.filter((F.col("p_partkey") >= 1) & (F.col("p_partkey") < 500)).select(
        F.col("p_partkey").alias("k"), (1 + F.col("p_partkey") % 5).alias("dur")
    )
    e2 = t.filter(F.col("k") >= 2).select(
        F.col("k").alias("child"), F.expr("k div 2").alias("parent")
    )
    e3 = t.filter(
        (F.col("k") >= 2)
        & (F.expr("k div 3") >= 1)
        & (F.expr("k div 3") != F.expr("k div 2"))
    ).select(F.col("k").alias("child"), F.expr("k div 3").alias("parent"))
    pd_ = t.select(F.col("k").alias("parent"), F.col("dur").alias("w"))
    edges = e2.unionByName(e3).join(F.broadcast(pd_), "parent")
    cl = G.transitive_closure(edges, max_doublings=4, agg="max", weight_col="w")
    es = cl.groupBy("descn").agg(
        F.max("dist").cast("bigint").alias("es"),
        F.count(F.lit(1)).cast("bigint").alias("n_anc"),
    )
    return (
        t.join(es, t["k"] == es["descn"], "left")
        .select(
            F.col("k").alias("task"),
            F.col("dur").cast("bigint").alias("dur"),
            F.coalesce("n_anc", F.lit(0)).cast("bigint").alias("n_anc"),
            F.coalesce("es", F.lit(0)).cast("bigint").alias("es"),
            (F.coalesce("es", F.lit(0)) + F.col("dur")).cast("bigint").alias("finish"),
        )
    )


# --------------------------------------------------------------------------
# q_label_propagation — synchronous label-propagation community
# detection (Raghavan et al. 2007) over the synthetic doc graph, THREE
# unrolled rounds: each node adopts the most frequent label among its
# neighbors, ties broken by MIN label — fully deterministic, so the
# oracle replays every round as a CTE (the pagerank/BPE pattern for
# iterative operators). Isolated-in-round nodes keep their label via
# left join. Complements q_modularity (which SCORES a given partition —
# LPA FINDS one). Scale: per round one neighbor-label rollup + one
# per-node window argmax — O(E) shuffle per round, no all-pairs.
# --------------------------------------------------------------------------
def _lpa_round_sql(prev: str, out: str) -> str:
    return f"""
{out}_cnt AS (
  SELECT e.u AS node, l.label AS nl, COUNT(*) AS cnt
  FROM und e JOIN {prev} l ON l.node = e.v
  GROUP BY e.u, l.label
), {out}_pick AS (
  SELECT node, nl,
    ROW_NUMBER() OVER (PARTITION BY node ORDER BY cnt DESC, nl ASC) AS rn
  FROM {out}_cnt
), {out} AS (
  SELECT p.node, COALESCE(k.nl, p.label) AS label
  FROM {prev} p LEFT JOIN {out}_pick k ON k.node = p.node AND k.rn = 1
)"""


LPA_ORACLE = f"""
WITH nn AS (SELECT count(*) AS n FROM documents),
ed AS (
  SELECT DISTINCT doc_id AS src,
         (doc_id * (2 * k + 5) + k) % nn.n AS dst
  FROM documents, nn, (SELECT unnest(range(1, 4)) AS k) ks
  WHERE k <= 1 + doc_id % 3
    AND (doc_id * (2 * k + 5) + k) % nn.n <> doc_id
),
und AS (
  SELECT src AS u, dst AS v FROM ed
  UNION
  SELECT dst, src FROM ed
),
l0 AS (SELECT doc_id AS node, doc_id AS label FROM documents),
{_lpa_round_sql('l0', 'l1')},
{_lpa_round_sql('l1', 'l2')},
{_lpa_round_sql('l2', 'l3')}
SELECT node, CAST(label AS BIGINT) AS community FROM l3 ORDER BY node
"""


@query("q_label_propagation", LPA_ORACLE)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = tables.load(spark, sf_dir, "documents")
    n = docs.count()  # bounded scalar (node count), same as q_modularity
    ed = (
        docs.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.sequence(F.lit(1), (F.lit(1) + F.col("doc_id") % 3).cast("int"))
            ).alias("k"),
        )
        .select(
            "src",
            ((F.col("src") * (2 * F.col("k") + 5) + F.col("k")) % n).alias("dst"),
        )
        .filter(F.col("dst") != F.col("src"))
        .distinct()
    )
    und = (
        ed.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(ed.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
        .localCheckpoint()  # 3 rounds reuse the edge set — cut the lineage
    )
    labels = docs.select(F.col("doc_id").alias("node"), F.col("doc_id").alias("label"))
    w = W.partitionBy("node").orderBy(F.col("cnt").desc(), F.col("nl").asc())
    for _ in range(3):
        cnt = (
            und.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"), F.col("label").alias("nl"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        pick = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("nl").alias("new_label"))
        )
        labels = (
            labels.join(pick, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
            )
            .localCheckpoint()  # synchronous rounds: pin each generation
        )
    return labels.select(
        "node", F.col("label").cast("bigint").alias("community")
    ).orderBy("node")
