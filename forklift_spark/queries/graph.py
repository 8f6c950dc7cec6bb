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


def _pagerank_oracle(iterations: int) -> str:
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
            f"r{i} AS (",
            f"  SELECT d.doc_id AS node,",
            f"    ({_SCALE} * {G.DAMPING_DEN - G.DAMPING_NUM}) // ({G.DAMPING_DEN} * nn.n)",
            f"      + ({G.DAMPING_NUM} * coalesce(c{i}.s, 0)) // {G.DAMPING_DEN} AS rank",
            f"  FROM documents d CROSS JOIN nn LEFT JOIN c{i} ON c{i}.dst = d.doc_id",
            "),",
        ]
    parts[-1] = parts[-1].rstrip(",")  # close the final CTE without a comma
    parts.append(
        f"SELECT node, CAST(rank AS BIGINT) AS rank_e12 FROM r{iterations}"
    )
    return "\n".join(parts)


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
