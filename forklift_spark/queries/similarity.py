"""Similarity-search queries over the embeddings table, oracle-checked.

The oracles replay the exact algorithms (decimal dot products, md5
hyperplane signs) in DuckDB — parallel unnest zips the two vectors, and
decimal SUM is order-independent, so scores are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from forklift_spark import tables
from forklift_spark.operators import similarity as S
from forklift_spark.queries import query

_NQ = 10  # query vectors: vec_id < 10
_K = 5

# DuckDB fragments ----------------------------------------------------------
# pairwise exact decimal dot via zipped unnest, then double cosine.
# NOTE: floats must go through DOUBLE before the decimal cast — DuckDB's
# direct FLOAT->DECIMAL scales in float32 and is lossy; FLOAT->DOUBLE is
# exact and DOUBLE->DECIMAL rounds identically in both engines...
# ...EXCEPT at exact decimal ties: a float32 element whose expansion
# ends exactly at the 9th decimal (e.g. 0.1494140625) rounds HALF_UP in
# Spark but half-even in DuckDB (2 such elements exist at sf0.1, none at
# the sf0.01 gate). The cosine templates here survive because every
# consumer rounds its final score to 9dp and the per-pair perturbation
# is <= 1e-9*|x|; UNROUNDED sums must use the tie-safe integer
# quantization instead — see q_label_centroids/q_array_funcs, and
# functions/exact.py for the general rule.
_PAIR_DOT = """
  SELECT ia, ib,
    CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(10,9)) * CAST(CAST(y AS DOUBLE) AS DECIMAL(10,9))) AS DOUBLE) AS dot
  FROM (
    SELECT a.vec_id AS ia, b.vec_id AS ib,
           unnest(a.embedding) AS x, unnest(b.embedding) AS y
    FROM {A} a, {B} b {COND}
  ) z GROUP BY ia, ib
"""

_NORMS = """
  SELECT vec_id,
    sqrt(CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(10,9)) * CAST(CAST(v AS DOUBLE) AS DECIMAL(10,9))) AS DOUBLE)) AS nrm
  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) z
  GROUP BY vec_id
"""


def _brute_oracle() -> str:
    dots = _PAIR_DOT.format(
        A="(SELECT * FROM embeddings WHERE vec_id < %d)" % _NQ,
        B="(SELECT * FROM embeddings WHERE vec_id >= %d)" % _NQ,
        COND="",
    )
    return f"""
WITH norms AS ({_NORMS}),
dots AS ({dots}),
scored AS (
  SELECT d.ia AS query_id, d.ib AS neighbor_id,
         d.dot / (na.nrm * nb.nrm) AS cos_sim
  FROM dots d JOIN norms na ON d.ia = na.vec_id
              JOIN norms nb ON d.ib = nb.vec_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cos_sim, 9) AS cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_K}
"""


@query("q_ann_bruteforce_topk", _brute_oracle())
def q_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.load(spark, sf_dir, "embeddings")
    out = S.brute_force_topk(
        emb.filter(F.col("vec_id") < _NQ),
        emb.filter(F.col("vec_id") >= _NQ),
        k=_K,
    )
    return out.withColumn("rank", F.col("rank").cast("int"))


# --------------------------------------------------------------------------
# q_ann_lsh_topk — hyperplane-LSH bucketed ANN (the scale path). The
# oracle replays the md5 hyperplane signs + decimal sums, so the bucket
# assignment — and therefore the candidate set — matches exactly.
# --------------------------------------------------------------------------
_BITS = 4


def _lsh_oracle() -> str:
    sign = (
        "CASE WHEN CAST('0x' || substr(md5('h' || s || ':' || CAST(i - 1 AS VARCHAR)), 1, 15) AS BIGINT) & 1 = 1 "
        "THEN 1 ELSE -1 END"
    )
    return f"""
WITH ex AS (
  SELECT vec_id, unnest(embedding) AS v,
         unnest(range(1, len(embedding) + 1)) AS i
  FROM embeddings
), sums AS (
  SELECT e.vec_id, s.s,
    sum(CAST(CAST(e.v AS DOUBLE) AS DECIMAL(10,9)) * ({sign})) AS tot
  FROM ex e CROSS JOIN (SELECT unnest(range(0, {_BITS})) AS s) s
  GROUP BY e.vec_id, s.s
), sig AS (
  SELECT vec_id,
    CAST(sum(CASE WHEN tot >= 0 THEN 1 << s ELSE 0 END) AS INT) AS bucket
  FROM sums GROUP BY vec_id
),
norms AS ({_NORMS}),
dots AS ({_PAIR_DOT.format(
    A="(SELECT e.*, g.bucket FROM embeddings e JOIN sig g USING (vec_id) WHERE vec_id < %d)" % _NQ,
    B="(SELECT e.*, g.bucket FROM embeddings e JOIN sig g USING (vec_id) WHERE vec_id >= %d)" % _NQ,
    COND="WHERE a.bucket = b.bucket")}),
scored AS (
  SELECT d.ia AS query_id, d.ib AS neighbor_id,
         d.dot / (na.nrm * nb.nrm) AS cos_sim
  FROM dots d JOIN norms na ON d.ia = na.vec_id
              JOIN norms nb ON d.ib = nb.vec_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cos_sim, 9) AS cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_K}
"""


@query("q_ann_lsh_topk", _lsh_oracle())
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.load(spark, sf_dir, "embeddings")
    out = S.lsh_topk(
        emb.filter(F.col("vec_id") < _NQ),
        emb.filter(F.col("vec_id") >= _NQ),
        k=_K,
        bits=_BITS,
    )
    return out.withColumn("rank", F.col("rank").cast("int"))


# --------------------------------------------------------------------------
# q_embedding_dedup — cosine near-duplicate pairs (exact baseline on a
# bounded sample; the LSH-bucketed variant is the scale path and is
# exercised through q_ann_lsh_topk's identical bucket machinery).
# --------------------------------------------------------------------------
_THRESH = 0.40  # top of the corpus's cosine range (max ~0.44); yields real pairs at every SF
_SAMPLE = 200


def _emb_dedup_oracle() -> str:
    dots = _PAIR_DOT.format(
        A="(SELECT * FROM embeddings WHERE vec_id < %d)" % _SAMPLE,
        B="(SELECT * FROM embeddings WHERE vec_id < %d)" % _SAMPLE,
        COND="WHERE a.vec_id < b.vec_id",
    )
    return f"""
WITH norms AS ({_NORMS}),
dots AS ({dots})
SELECT d.ia AS id_a, d.ib AS id_b,
       round(d.dot / (na.nrm * nb.nrm), 9) AS cos_sim
FROM dots d JOIN norms na ON d.ia = na.vec_id
            JOIN norms nb ON d.ib = nb.vec_id
WHERE d.dot / (na.nrm * nb.nrm) >= {_THRESH}
"""


@query("q_embedding_dedup", _emb_dedup_oracle())
def q_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _SAMPLE)
    return S.embedding_dedup_pairs(emb, threshold=_THRESH)


# --------------------------------------------------------------------------
# q_embedding_dedup_lsh — THE scale path for embedding near-dup pairs:
# LSH-bucketed candidate generation over the FULL embeddings table (no
# sample bound), equi-join on the hyperplane bucket, exact cosine within
# bucket. No CartesianProduct anywhere in the plan; candidate volume is
# sum of per-bucket squares, never N². The oracle replays the md5
# hyperplane signs, so the bucket assignment — and thus the candidate
# pair set — matches exactly.
#
# The bit count SELF-TUNES to corpus size: bits = max(4, ceil(log2(
# ceil(N / 125)))) keeps expected bucket occupancy ~125 at any SF, so
# per-bucket candidate work stays bounded and total candidates grow
# O(N), not O(N²). Fixed bits measured 10x data -> ~50x runtime at sf1
# (the r4 scale-stress run) — THE fixed-parameter LSH scale bug; the
# oracle computes the identical formula in SQL, so bucket assignment
# still matches at every SF. The N it needs is one metadata-cheap
# count — a bounded driver scalar, same class as HWM.
# --------------------------------------------------------------------------
_DEDUP_OCCUPANCY = 125  # target vectors/bucket (the measured sf0.1 working point)

# SQL twin of _dedup_bits(): evaluated inside the oracle so both engines
# derive the same bit count from the same table
_DEDUP_BITS_SQL = (
    # greatest(1, m) mirrors _dedup_bits()'s max(1, m) floor so the two
    # formulas agree on an empty table (log2(0) would error/NULL here
    # while the Python twin returns 4)
    "(SELECT greatest(4, CAST(ceil(log2(CAST(greatest(1, (count(*) + 124) // 125)"
    " AS DOUBLE))) AS INT)) FROM embeddings WHERE 1=1)"
)


def _dedup_bits(n: int) -> int:
    import math

    m = max(1, (n + _DEDUP_OCCUPANCY - 1) // _DEDUP_OCCUPANCY)
    return max(4, math.ceil(math.log2(m)))


def _emb_dedup_lsh_oracle() -> str:
    sign = (
        "CASE WHEN CAST('0x' || substr(md5('h' || s || ':' || CAST(i - 1 AS VARCHAR)), 1, 15) AS BIGINT) & 1 = 1 "
        "THEN 1 ELSE -1 END"
    )
    dots = _PAIR_DOT.format(
        A="(SELECT e.*, g.bucket FROM embeddings e JOIN sig g USING (vec_id))",
        B="(SELECT e.*, g.bucket FROM embeddings e JOIN sig g USING (vec_id))",
        COND="WHERE a.bucket = b.bucket AND a.vec_id < b.vec_id",
    )
    return f"""
WITH ex AS (
  SELECT vec_id, unnest(embedding) AS v,
         unnest(range(1, len(embedding) + 1)) AS i
  FROM embeddings
), sums AS (
  SELECT e.vec_id, s.s,
    sum(CAST(CAST(e.v AS DOUBLE) AS DECIMAL(10,9)) * ({sign})) AS tot
  FROM ex e CROSS JOIN (SELECT unnest(range(0, {_DEDUP_BITS_SQL})) AS s) s
  GROUP BY e.vec_id, s.s
), sig AS (
  SELECT vec_id,
    CAST(sum(CASE WHEN tot >= 0 THEN 1 << s ELSE 0 END) AS INT) AS bucket
  FROM sums GROUP BY vec_id
),
norms AS ({_NORMS}),
dots AS ({dots})
SELECT d.ia AS id_a, d.ib AS id_b,
       round(d.dot / (na.nrm * nb.nrm), 9) AS cos_sim
FROM dots d JOIN norms na ON d.ia = na.vec_id
            JOIN norms nb ON d.ib = nb.vec_id
WHERE d.dot / (na.nrm * nb.nrm) >= {_THRESH}
"""


@query("q_embedding_dedup_lsh", _emb_dedup_lsh_oracle())
def q_embedding_dedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    emb = tables.load(spark, sf_dir, "embeddings")
    # the signed corpus is WRITTEN once as a bucket-partitioned catalog
    # table and reused by both self-join branches — the 100 TB shape
    # (signatures shared across dedup/ANN/hybrid, no recompute, and the
    # bucketed scan replaces the candidate join's Exchange)
    bits = _dedup_bits(emb.count())  # self-tuning (header comment)
    tag = hashlib.md5(f"{sf_dir}:{bits}".encode()).hexdigest()[:8]
    sigs = S.signature_table(
        emb, f"sig_embeddings_{tag}", bits=bits
    )
    return S.embedding_dedup_pairs(
        emb, threshold=_THRESH, bits=bits, signatures=sigs
    )


# --------------------------------------------------------------------------
# q_ann_ivf_topk — IVF coarse-quantizer ANN (the bucketed scale path:
# centroid cells + n_probe search). Everything is deterministic — the
# centroids are the n_cells lowest-id corpus vectors, cell assignment is
# an exact-decimal argmax (ties to the lowest cell), query probes rank
# cells by the double-cast dot (ties to the highest cell, matching
# reverse(array_sort)) — so the whole pipeline replays in SQL: the
# argmax is a row_number()=1 over (dot DESC, cell ASC). Recall floor is
# additionally pinned by tests/test_similarity_ivf.py.
# --------------------------------------------------------------------------
_IVF_CELLS = 8
_IVF_PROBE = 2


def _ivf_oracle() -> str:
    cdot = _PAIR_DOT.format(
        A="(SELECT * FROM embeddings WHERE vec_id >= %d)" % _NQ,
        B="cents",
        COND="",
    ).replace("b.vec_id AS ib", "b.cell AS ib").replace("b.embedding", "b.emb")
    qdot = _PAIR_DOT.format(
        A="(SELECT * FROM embeddings WHERE vec_id < %d)" % _NQ,
        B="cents",
        COND="",
    ).replace("b.vec_id AS ib", "b.cell AS ib").replace("b.embedding", "b.emb")
    pair = _PAIR_DOT.format(
        A="(SELECT e.*, a.cell FROM embeddings e JOIN assign a USING (vec_id))",
        B="(SELECT e.*, p.cell FROM embeddings e JOIN probes p USING (vec_id))",
        COND="WHERE a.cell = b.cell",
    )
    return f"""
WITH cents AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
         embedding AS emb
  FROM embeddings WHERE vec_id >= {_NQ}
  ORDER BY vec_id LIMIT {_IVF_CELLS}
), cn2 AS (
  SELECT cell,
    CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(10,9)) * CAST(CAST(v AS DOUBLE) AS DECIMAL(10,9))) AS DOUBLE) AS n2
  FROM (SELECT cell, unnest(emb) AS v FROM cents) z GROUP BY cell
), cdots AS ({cdot}),
assign AS (
  SELECT ia AS vec_id, ib AS cell FROM (
    SELECT c.ia, c.ib,
           row_number() OVER (PARTITION BY c.ia
                              ORDER BY (2 * c.dot - n.n2) DESC, c.ib) AS rn
    FROM cdots c JOIN cn2 n ON c.ib = n.cell
  ) WHERE rn = 1
), qdots AS ({qdot}),
probes AS (
  SELECT ia AS vec_id, ib AS cell FROM (
    SELECT q.ia, q.ib,
           row_number() OVER (PARTITION BY q.ia
                              ORDER BY (2 * q.dot - n.n2) DESC, q.ib DESC) AS rn
    FROM qdots q JOIN cn2 n ON q.ib = n.cell
  ) WHERE rn <= {_IVF_PROBE}
),
norms AS ({_NORMS}),
dots AS ({pair}),
scored AS (
  SELECT DISTINCT d.ib AS query_id, d.ia AS neighbor_id,
         d.dot / (nb.nrm * na.nrm) AS cos_sim
  FROM dots d JOIN norms na ON d.ia = na.vec_id
              JOIN norms nb ON d.ib = nb.vec_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cos_sim, 9) AS cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_K}
"""


@query("q_ann_ivf_topk", _ivf_oracle())
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.load(spark, sf_dir, "embeddings")
    out = S.ivf_topk(
        emb.filter(F.col("vec_id") < _NQ),
        emb.filter(F.col("vec_id") >= _NQ),
        k=_K,
        n_cells=_IVF_CELLS,
        n_probe=_IVF_PROBE,
    )
    return out.withColumn("rank", F.col("rank").cast("int"))


# --------------------------------------------------------------------------
# q_ann_lsh_multitable — 3 independent hash tables union their
# candidates (the recall lever). Table t draws its hyperplane seeds from
# [t*bits, (t+1)*bits), so the oracle replays every table's md5 signs
# and unions the per-table candidate pairs with DISTINCT. Recall
# monotonicity is additionally pinned in tests/test_similarity_ivf.py.
# --------------------------------------------------------------------------
_N_TABLES = 3


def _lsh_multitable_oracle() -> str:
    sign = (
        "CASE WHEN CAST('0x' || substr(md5('h' || (t.t * {b} + s.s) || ':' || CAST(i - 1 AS VARCHAR)), 1, 15) AS BIGINT) & 1 = 1 "
        "THEN 1 ELSE -1 END"
    ).format(b=_BITS)
    return f"""
WITH ex AS (
  SELECT vec_id, unnest(embedding) AS v,
         unnest(range(1, len(embedding) + 1)) AS i
  FROM embeddings
), sums AS (
  SELECT e.vec_id, t.t, s.s,
    sum(CAST(CAST(e.v AS DOUBLE) AS DECIMAL(10,9)) * ({sign})) AS tot
  FROM ex e
  CROSS JOIN (SELECT unnest(range(0, {_N_TABLES})) AS t) t
  CROSS JOIN (SELECT unnest(range(0, {_BITS})) AS s) s
  GROUP BY e.vec_id, t.t, s.s
), sig AS (
  SELECT vec_id, t,
    CAST(sum(CASE WHEN tot >= 0 THEN 1 << s ELSE 0 END) AS INT) AS bucket
  FROM sums GROUP BY vec_id, t
), cand AS (
  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
  FROM sig q JOIN sig c ON q.t = c.t AND q.bucket = c.bucket
  WHERE q.vec_id < {_NQ} AND c.vec_id >= {_NQ}
),
norms AS ({_NORMS}),
dots AS ({_PAIR_DOT.format(
    A="(SELECT e.* FROM embeddings e WHERE vec_id < %d)" % _NQ,
    B="(SELECT e.* FROM embeddings e WHERE vec_id >= %d)" % _NQ,
    COND="WHERE EXISTS (SELECT 1 FROM cand WHERE cand.qid = a.vec_id AND cand.nid = b.vec_id)")}),
scored AS (
  SELECT d.ia AS query_id, d.ib AS neighbor_id,
         d.dot / (na.nrm * nb.nrm) AS cos_sim
  FROM dots d JOIN norms na ON d.ia = na.vec_id
              JOIN norms nb ON d.ib = nb.vec_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cos_sim, 9) AS cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_K}
"""


@query("q_ann_lsh_multitable", _lsh_multitable_oracle())
def q_ann_lsh_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.load(spark, sf_dir, "embeddings")
    out = S.lsh_topk(
        emb.filter(F.col("vec_id") < _NQ),
        emb.filter(F.col("vec_id") >= _NQ),
        k=_K,
        bits=_BITS,
        n_tables=_N_TABLES,
    )
    return out.withColumn("rank", F.col("rank").cast("int"))


# --------------------------------------------------------------------------
# q_kmeans_clusters — Lloyd k-means over the embeddings table
# (deterministic seed + decimal centroid sums -> reproducible fit). An
# iterative algorithm has no single-statement SQL equivalent -> rows-only
# check; determinism and inertia descent are pinned in
# tests/test_similarity_ivf.py.
# --------------------------------------------------------------------------
@query("q_kmeans_clusters")
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.load(spark, sf_dir, "embeddings")
    return S.kmeans_fit_assign(emb, k=8, iters=3)


# --------------------------------------------------------------------------
# q_embedding_quantize — per-vector int8 scalar quantization audit: the
# storage/bandwidth operator for a 100 TB embedding store (float32 ->
# uint8 cuts ANN shuffle and scan volume 4x; dequantization error bounds
# the recall loss). Reports each vector's quantization range and the max
# absolute reconstruction error. Pure scan-side array math, no shuffle.
# Engine-exactness: every multiply feeds a division (no FMA-contractible
# a+b*c anywhere — see NOTES_r2 lesson 8), round() is ties-away in both
# engines for the non-negative operand, and min/max over identical
# element values are order-free.
# --------------------------------------------------------------------------
QUANT_ORACLE = """
WITH pre AS (
  SELECT vec_id,
    CAST(list_min(embedding) AS DOUBLE) AS mn,
    CAST(list_max(embedding) AS DOUBLE) AS mx,
    embedding
  FROM embeddings
)
SELECT vec_id, mn, mx,
  list_max(list_transform(embedding, x ->
    abs(CAST(x AS DOUBLE) - (mn +
      (round(((CAST(x AS DOUBLE) - mn) * 255.0) / (mx - mn)) * (mx - mn)) / 255.0))
  )) AS max_abs_err
FROM pre
"""


@query("q_embedding_quantize", QUANT_ORACLE)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.load(spark, sf_dir, "embeddings")
    pre = emb.select(
        "vec_id",
        F.array_min("embedding").cast("double").alias("mn"),
        F.array_max("embedding").cast("double").alias("mx"),
        "embedding",
    )

    def err(x):
        xd = x.cast("double")
        q = F.round(((xd - F.col("mn")) * F.lit(255.0)) / (F.col("mx") - F.col("mn")))
        deq = F.col("mn") + (q * (F.col("mx") - F.col("mn"))) / F.lit(255.0)
        return F.abs(xd - deq)

    return pre.select(
        "vec_id",
        "mn",
        "mx",
        F.array_max(F.transform("embedding", err)).alias("max_abs_err"),
    )


# --------------------------------------------------------------------------
# q_knn_classify — k-NN label prediction: majority vote among the exact
# top-k neighbors (ties -> smallest label, deterministic), with the vote
# count as confidence. The "similarity search application" entry: the
# neighbor list is the verified q_ann_bruteforce_topk result, so this
# adds one broadcast label join + one per-query majority aggregation.
# --------------------------------------------------------------------------
KNN_ORACLE = f"""
WITH topk AS ({_brute_oracle()}),
votes AS (
  SELECT t.query_id, e.label, count(*) AS n_votes
  FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
  GROUP BY t.query_id, e.label
), best AS (
  SELECT query_id, label, n_votes,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY n_votes DESC, label) AS rn
  FROM votes
)
SELECT b.query_id, b.label AS predicted, CAST(b.n_votes AS INT) AS n_votes,
  q.label AS actual
FROM best b JOIN embeddings q ON q.vec_id = b.query_id
WHERE b.rn = 1
"""


@query("q_knn_classify", KNN_ORACLE)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = tables.load(spark, sf_dir, "embeddings")
    topk = q_ann_bruteforce_topk(spark, sf_dir)
    labels = emb.select("vec_id", "label")
    votes = (
        topk.join(
            F.broadcast(labels.withColumnRenamed("vec_id", "neighbor_id")),
            "neighbor_id",
        )
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("n_votes").desc(), "label")
    best = votes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    actual = labels.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("actual")
    )
    return best.join(F.broadcast(actual), "query_id").select(
        "query_id",
        F.col("label").alias("predicted"),
        F.col("n_votes").cast("int").alias("n_votes"),
        "actual",
    )


# --------------------------------------------------------------------------
# q_ann_pq_topk — product-quantization ANN: codebooks k-means-trained per
# subspace, corpus encoded to m=8 codes (~30x smaller than the float
# vectors ANN would otherwise shuffle), per-query ADC lookup tables, and
# exact-cosine rescore of the double-ranked candidates. Iterative
# training -> rows-only check; determinism and the recall floor vs brute
# force are pinned in tests/test_similarity_ivf.py.
# --------------------------------------------------------------------------
@query("q_ann_pq_topk")
def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _NQ)
    corpus = emb.filter(F.col("vec_id") >= _NQ)
    # train on a deterministic ~1/3 subsample: codebook quality needs a
    # representative sample, not the full corpus (standard PQ practice —
    # at 100 TB you train on thousands of vectors, encode billions)
    train = corpus.filter(F.col("vec_id") % 3 == 0)
    # iters=1 keeps the gate entry fast; recall floors are pinned on
    # the operator itself in tests (iters is a quality knob, not a
    # correctness one for a rows-only entry)
    books = S.pq_train(train, m=8, k=16, iters=1)
    enc = S.pq_encode(corpus, books)
    out = S.pq_adc_topk(queries, enc, books, k=_K)
    return out


# --------------------------------------------------------------------------
# q_ann_ivfpq_topk — the composed billion-scale index: IVF cells bound
# WHICH rows a query touches (cell equi-join, n_probe/n_cells of the
# corpus), PQ codes bound WHAT each row costs (m byte-lookups, no float
# dot). Rows-only (trained codebooks); recall floors pinned in
# tests/test_similarity_ivf.py. On this synthetic corpus the embeddings
# are uniform-random — the hostile case for IVF (neighbors spread evenly
# over cells), so recall here is probe-bounded; clustered real corpora
# are the design target.
# --------------------------------------------------------------------------
@query("q_ann_ivfpq_topk")
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _NQ)
    corpus = emb.filter(F.col("vec_id") >= _NQ)
    return S.ivfpq_topk(queries, corpus, k=_K, n_probe=5)


# --------------------------------------------------------------------------
# q_hybrid_search — vector + keyword retrieval: exact cosine top-20
# candidates re-ranked with a keyword boost from the documents table
# (cos_sim + 0.05 if the doc mentions the term), top-5 per query. The
# RAG-stack retrieval shape: ANN candidates cheap, lexical features
# joined only for the candidate set (Q x 20 rows — broadcast), never the
# corpus. Boost arithmetic is one double add on already-exact values ->
# engine-identical.
# --------------------------------------------------------------------------
_HYBRID_CAND = 20
_HYBRID_BOOST = 0.05


def _hybrid_oracle() -> str:
    cand = _brute_oracle().replace(f"rank <= {_K}", f"rank <= {_HYBRID_CAND}")
    return f"""
WITH topk AS ({cand}),
hybrid AS (
  SELECT t.query_id, t.neighbor_id,
    round(t.cos_sim + CASE WHEN d.text LIKE '%data%' THEN {_HYBRID_BOOST} ELSE 0.0 END, 9) AS score
  FROM topk t JOIN documents d ON d.doc_id = t.neighbor_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id) AS rank
  FROM hybrid
)
SELECT query_id, neighbor_id, score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_K}
"""


@query("q_hybrid_search", _hybrid_oracle())
def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = tables.load(spark, sf_dir, "embeddings")
    docs = tables.load(spark, sf_dir, "documents")
    cand = S.brute_force_topk(
        emb.filter(F.col("vec_id") < _NQ),
        emb.filter(F.col("vec_id") >= _NQ),
        k=_HYBRID_CAND,
    )
    boosted = cand.join(
        docs.select(
            F.col("doc_id").alias("neighbor_id"),
            F.col("text").contains("data").alias("_kw"),
        ),
        "neighbor_id",
    ).select(
        "query_id",
        "neighbor_id",
        F.round(
            F.col("cos_sim")
            + F.when(F.col("_kw"), F.lit(_HYBRID_BOOST)).otherwise(F.lit(0.0)),
            9,
        ).alias("score"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), "neighbor_id")
    return (
        boosted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _K)
        .withColumn("rank", F.col("rank").cast("int"))
    )


# --------------------------------------------------------------------------
# q_label_centroids — per-label mean embedding (class centroids), long
# form (label, pos, mean): posexplode -> one (label, dim) aggregation
# with exact decimal sums -> engine-identical means at any parallelism.
# The aggregation every embedding-classification / cluster-profiling
# pass needs; long-form output keeps the oracle a plain GROUP BY.
# --------------------------------------------------------------------------
# Quantization is ROUND(v*1e9) -> BIGINT, NOT CAST(v AS DECIMAL(10,9)):
# float32 elements are dyadic rationals whose decimal expansion can tie
# EXACTLY at the 9th decimal (e.g. 0.1494140625), and the engines break
# that tie differently (Spark BigDecimal HALF_UP vs DuckDB half-even on
# double->decimal casts) — measured: 2 tie elements at sf0.1, one of
# which red-rowed the label-8 mean. ROUND on the scaled double rounds
# half-away-from-zero in BOTH engines (verified on the tie values), so
# integer sums are bit-identical by construction.
CENTROID_ORACLE = """
SELECT label, i - 1 AS pos,
  CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 1e9) AS BIGINT)) AS DOUBLE)
    / (CAST(COUNT(*) AS DOUBLE) * 1e9) AS mean_v,
  COUNT(*) AS n
FROM (
  SELECT label, unnest(embedding) AS v,
         unnest(range(1, len(embedding) + 1)) AS i
  FROM embeddings
) z
GROUP BY label, pos
"""


@query("q_label_centroids", CENTROID_ORACLE)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.load(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    )
    return exploded.groupBy("label", "pos").agg(
        (
            F.sum(
                F.round(F.col("v").cast("double") * F.lit(1e9)).cast("bigint")
            ).cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(1e9))
        ).alias("mean_v"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# q_semantic_dedup — SemDeDup (Abbas et al. 2023): prune semantically
# redundant documents by embedding similarity, composed entirely from
# verified operators: LSH-bucketed cosine pairs over the FULL table
# (reusing the persisted signature table — zero recompute) -> connected
# components over the pair graph (pointer-doubling min-label) -> one
# survivor per semantic cluster (min id). Output: every clustered
# vector with its cluster representative, cluster size, and whether a
# dedup pass keeps it. The oracle replays the pairs SQL and computes
# the same fixpoint with a recursive CTE, so the hash certifies the
# full prune decision, not just the pair list.
# --------------------------------------------------------------------------
def _semantic_dedup_oracle() -> str:
    return f"""
WITH RECURSIVE pairs AS (
  {_emb_dedup_lsh_oracle()}
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), nodes AS (
  SELECT DISTINCT src AS id FROM edges
), reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.src, rr.r FROM reach rr JOIN edges e ON e.dst = rr.id
), comp AS (
  SELECT id AS vec_id, min(r) AS component FROM reach GROUP BY id
)
SELECT c.vec_id, c.component, s.n AS cluster_size,
  c.vec_id = c.component AS is_survivor
FROM comp c
JOIN (SELECT component, count(*) AS n FROM comp GROUP BY component) s
  ON s.component = c.component
"""


@query("q_semantic_dedup", _semantic_dedup_oracle())
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from forklift_spark.operators import dedup as DD

    emb = tables.load(spark, sf_dir, "embeddings")
    # same signature table q_embedding_dedup_lsh builds — when both run
    # in one session the sign pass is paid once (write-once, reuse)
    bits = _dedup_bits(emb.count())  # self-tuning (see q_embedding_dedup_lsh)
    tag = hashlib.md5(f"{sf_dir}:{bits}".encode()).hexdigest()[:8]
    sigs = S.signature_table(emb, f"sig_embeddings_{tag}", bits=bits)
    pairs = S.embedding_dedup_pairs(
        emb, threshold=_THRESH, bits=bits, signatures=sigs
    )
    comp = DD.connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("id").alias("vec_id"),
        "component",
        "cluster_size",
        (F.col("id") == F.col("component")).alias("is_survivor"),
    )


# --------------------------------------------------------------------------
# q_mmr_diversify — Maximal Marginal Relevance re-ranking (Carbonell &
# Goldstein 1998): from each query's brute-force top-20 candidates,
# iteratively select 5 results maximizing 0.7*relevance - 0.3*max
# similarity to the already-selected set — the standard redundancy
# suppressor for RAG context assembly (top-k alone returns five copies
# of the same fact). All scores are the 9dp-rounded exact-decimal
# cosines both engines already agree on, so the greedy argmax (with id
# tiebreak) is engine-deterministic, and the ORACLE UNROLLS ALL FIVE
# SELECTION ROUNDS as CTEs — an oracle-backed iterative re-ranker, like
# q_pagerank. Scale shape: candidate generation is the ANN problem
# (bounded query side), MMR itself touches only Q*20 rows and Q*20*19
# bounded pair sims.
# --------------------------------------------------------------------------
_MMR_CAND = 20
_MMR_K = 5


def _mmr_oracle() -> str:
    dots = _PAIR_DOT.format(
        A="(SELECT * FROM embeddings WHERE vec_id < %d)" % _NQ,
        B="(SELECT * FROM embeddings WHERE vec_id >= %d)" % _NQ,
        COND="",
    )
    parts = [f"""
WITH norms AS MATERIALIZED ({_NORMS}),
dots AS MATERIALIZED ({dots}),
scored AS (
  SELECT d.ia AS query_id, d.ib AS neighbor_id,
         d.dot / (na.nrm * nb.nrm) AS cos_sim
  FROM dots d JOIN norms na ON d.ia = na.vec_id
              JOIN norms nb ON d.ib = nb.vec_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
), cand AS MATERIALIZED (
  SELECT query_id, neighbor_id, round(cos_sim, 9) AS rel, rank
  FROM ranked WHERE rank <= {_MMR_CAND}
), cp AS MATERIALIZED (
  SELECT DISTINCT least(a.neighbor_id, b.neighbor_id) AS ia,
                  greatest(a.neighbor_id, b.neighbor_id) AS ib
  FROM cand a JOIN cand b
    ON a.query_id = b.query_id AND a.neighbor_id < b.neighbor_id
), pd AS MATERIALIZED (
  SELECT ia, ib,
    CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(10,9)) * CAST(CAST(y AS DOUBLE) AS DECIMAL(10,9))) AS DOUBLE) AS dot
  FROM (
    SELECT p.ia, p.ib, unnest(ea.embedding) AS x, unnest(eb.embedding) AS y
    FROM cp p JOIN embeddings ea ON ea.vec_id = p.ia
              JOIN embeddings eb ON eb.vec_id = p.ib
  ) z GROUP BY ia, ib
), cs0 AS MATERIALIZED (
  SELECT ia, ib, round(pd.dot / (na.nrm * nb.nrm), 9) AS sim
  FROM pd JOIN norms na ON pd.ia = na.vec_id
          JOIN norms nb ON pd.ib = nb.vec_id
), cs AS MATERIALIZED (
  SELECT ia, ib, sim FROM cs0 UNION ALL SELECT ib, ia, sim FROM cs0
), sel1 AS (
  SELECT query_id, neighbor_id, 1 AS mmr_rank, rel,
         round(0.7 * rel, 9) AS mmr_score
  FROM cand WHERE rank = 1
)"""]
    for t in range(2, _MMR_K + 1):
        parts.append(f""",
rem{t} AS (
  SELECT c.query_id, c.neighbor_id, c.rel FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM sel{t-1} s
                    WHERE s.query_id = c.query_id
                      AND s.neighbor_id = c.neighbor_id)
), pen{t} AS (
  SELECT r.query_id, r.neighbor_id, max(cs.sim) AS mx
  FROM rem{t} r
  JOIN sel{t-1} s ON s.query_id = r.query_id
  JOIN cs ON cs.ia = r.neighbor_id AND cs.ib = s.neighbor_id
  GROUP BY 1, 2
), pick{t} AS (
  SELECT query_id, neighbor_id, {t} AS mmr_rank, rel,
         round(m, 9) AS mmr_score
  FROM (
    SELECT r.query_id, r.neighbor_id, r.rel,
      0.7 * r.rel - 0.3 * p.mx AS m,
      row_number() OVER (PARTITION BY r.query_id
                         ORDER BY 0.7 * r.rel - 0.3 * p.mx DESC,
                                  r.neighbor_id) AS rk
    FROM rem{t} r JOIN pen{t} p
      ON p.query_id = r.query_id AND p.neighbor_id = r.neighbor_id
  ) WHERE rk = 1
), sel{t} AS (
  SELECT * FROM sel{t-1} UNION ALL SELECT * FROM pick{t}
)""")
    parts.append(f"""
SELECT query_id, neighbor_id, CAST(mmr_rank AS INT) AS mmr_rank,
       rel AS relevance, mmr_score
FROM sel{_MMR_K}""")
    return "".join(parts)


@query("q_mmr_diversify", _mmr_oracle())
def q_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from forklift_spark.operators.similarity import dot_exact, norm_exact

    emb = tables.load(spark, sf_dir, "embeddings")
    cand = S.brute_force_topk(
        emb.filter(F.col("vec_id") < _NQ),
        emb.filter(F.col("vec_id") >= _NQ),
        k=_MMR_CAND,
    ).select("query_id", "neighbor_id", F.col("cos_sim").alias("rel"), "rank")
    cand = cand.persist()

    # pairwise candidate sims: distinct unordered id pairs across queries
    # (shared between queries), exact decimal cosine rounded like rel
    cp = (
        cand.alias("a")
        .join(
            cand.alias("b"),
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.neighbor_id") < F.col("b.neighbor_id")),
        )
        .select(
            F.col("a.neighbor_id").alias("ia"), F.col("b.neighbor_id").alias("ib")
        )
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    cs0 = (
        cp.join(ea, "ia")
        .join(eb, "ib")
        .select(
            "ia",
            "ib",
            F.round(
                dot_exact(F.col("va"), F.col("vb"))
                / (norm_exact(F.col("va")) * norm_exact(F.col("vb"))),
                9,
            ).alias("sim"),
        )
    )
    cs = cs0.unionByName(
        cs0.select(F.col("ib").alias("ia"), F.col("ia").alias("ib"), "sim")
    ).persist()

    sel = cand.filter(F.col("rank") == 1).select(
        "query_id",
        "neighbor_id",
        F.lit(1).alias("mmr_rank"),
        "rel",
        F.round(F.lit(0.7) * F.col("rel"), 9).alias("mmr_score"),
    )
    # materialize the (Q*t)-row selected set each round: without the cut,
    # round t's plan re-embeds every earlier round's join tree and
    # codegen cost compounds (measured ~30s/round at sf0.01)
    sel = sel.localCheckpoint()
    for t in range(2, _MMR_K + 1):
        sel_ids = sel.select("query_id", F.col("neighbor_id").alias("sel_id"))
        rem = cand.join(
            sel.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_anti"
        ).select("query_id", "neighbor_id", "rel")
        pen = (
            rem.join(sel_ids, "query_id")
            .join(
                cs,
                (F.col("ia") == F.col("neighbor_id"))
                & (F.col("ib") == F.col("sel_id")),
            )
            .groupBy("query_id", "neighbor_id")
            .agg(F.max("sim").alias("mx"))
        )
        m = F.lit(0.7) * F.col("rel") - F.lit(0.3) * F.col("mx")
        wk = W.partitionBy("query_id").orderBy(m.desc(), F.col("neighbor_id"))
        pick = (
            rem.join(pen, ["query_id", "neighbor_id"])
            .withColumn("rk", F.row_number().over(wk))
            .filter(F.col("rk") == 1)
            .select(
                "query_id",
                "neighbor_id",
                F.lit(t).alias("mmr_rank"),
                "rel",
                F.round(m, 9).alias("mmr_score"),
            )
        )
        sel = sel.unionByName(pick).localCheckpoint()
    return sel.select(
        "query_id",
        "neighbor_id",
        F.col("mmr_rank").cast("int").alias("mmr_rank"),
        F.col("rel").alias("relevance"),
        "mmr_score",
    )


# --------------------------------------------------------------------------
# q_ann_recall — retrieval-quality EVALUATION of the approximate index:
# recall@K of the LSH top-K against the brute-force ground truth, per
# query (n_matched, integer basis-point recall, and where the true
# top-1 landed in the approximate ranking; -1 = missed). This is the
# eval harness every ANN deployment runs before trusting an index —
# here as a first-class oracle-checked query: the oracle replays BOTH
# pipelines (exact decimal dots for the full ranking, md5-hyperplane
# signatures + bucket-restricted dots for the approximate one) and the
# metric arithmetic is all-integer, so the hash certifies ground truth,
# index behavior, AND the scoring. Scale: the brute-force side is the
# bounded-query-set shape of q_ann_bruteforce_topk; everything after
# the two top-K frames is a K-row-per-query join.
# --------------------------------------------------------------------------
def _rank_pipeline_ctes() -> str:
    """Shared oracle CTE prefix: exact (rx) and LSH-bucketed (ra) top-K
    cosine rankings over the same query/corpus split — reused by
    q_ann_recall and q_ndcg_eval so both evaluations certify the SAME
    replayed pipelines."""
    sign = (
        "CASE WHEN CAST('0x' || substr(md5('h' || s || ':' || CAST(i - 1 AS VARCHAR)), 1, 15) AS BIGINT) & 1 = 1 "
        "THEN 1 ELSE -1 END"
    )
    dots_x = _PAIR_DOT.format(
        A="(SELECT * FROM embeddings WHERE vec_id < %d)" % _NQ,
        B="(SELECT * FROM embeddings WHERE vec_id >= %d)" % _NQ,
        COND="",
    )
    dots_a = _PAIR_DOT.format(
        A="(SELECT e.*, g.bucket FROM embeddings e JOIN sig g USING (vec_id) WHERE vec_id < %d)" % _NQ,
        B="(SELECT e.*, g.bucket FROM embeddings e JOIN sig g USING (vec_id) WHERE vec_id >= %d)" % _NQ,
        COND="WHERE a.bucket = b.bucket",
    )
    return f"""
WITH norms AS ({_NORMS}),
ex AS (
  SELECT vec_id, unnest(embedding) AS v,
         unnest(range(1, len(embedding) + 1)) AS i
  FROM embeddings
), sums AS (
  SELECT e.vec_id, s.s,
    sum(CAST(CAST(e.v AS DOUBLE) AS DECIMAL(10,9)) * ({sign})) AS tot
  FROM ex e CROSS JOIN (SELECT unnest(range(0, {_BITS})) AS s) s
  GROUP BY e.vec_id, s.s
), sig AS (
  SELECT vec_id,
    CAST(sum(CASE WHEN tot >= 0 THEN 1 << s ELSE 0 END) AS INT) AS bucket
  FROM sums GROUP BY vec_id
),
dx AS ({dots_x}),
rx AS (
  SELECT * FROM (
    SELECT d.ia AS query_id, d.ib AS neighbor_id,
      row_number() OVER (PARTITION BY d.ia
        ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.ib) AS rank
    FROM dx d JOIN norms na ON d.ia = na.vec_id
              JOIN norms nb ON d.ib = nb.vec_id
  ) WHERE rank <= {_K}
),
da AS ({dots_a}),
ra AS (
  SELECT * FROM (
    SELECT d.ia AS query_id, d.ib AS neighbor_id,
      row_number() OVER (PARTITION BY d.ia
        ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.ib) AS rank
    FROM da d JOIN norms na ON d.ia = na.vec_id
              JOIN norms nb ON d.ib = nb.vec_id
  ) WHERE rank <= {_K}
)"""


def _ann_recall_oracle() -> str:
    return f"""{_rank_pipeline_ctes()},
m AS (
  SELECT x.query_id, count(*) AS n_matched
  FROM rx x JOIN ra a USING (query_id, neighbor_id)
  GROUP BY x.query_id
),
nx AS (SELECT query_id, count(*) AS n_exact FROM rx GROUP BY 1),
na_ AS (SELECT query_id, count(*) AS n_approx FROM ra GROUP BY 1),
t1 AS (
  SELECT x.query_id, coalesce(a.rank, -1) AS top1_rank_in_approx
  FROM rx x LEFT JOIN ra a USING (query_id, neighbor_id)
  WHERE x.rank = 1
)
SELECT nx.query_id,
  CAST(nx.n_exact AS BIGINT) AS n_exact,
  CAST(coalesce(na_.n_approx, 0) AS BIGINT) AS n_approx,
  CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_matched,
  CAST(10000 * coalesce(m.n_matched, 0) // nx.n_exact AS BIGINT) AS recall_bp,
  CAST(t1.top1_rank_in_approx AS BIGINT) AS top1_rank_in_approx
FROM nx
LEFT JOIN na_ USING (query_id)
LEFT JOIN m USING (query_id)
JOIN t1 USING (query_id)
"""


@query("q_ann_recall", _ann_recall_oracle())
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.load(spark, sf_dir, "embeddings")
    q_side = emb.filter(F.col("vec_id") < _NQ)
    c_side = emb.filter(F.col("vec_id") >= _NQ)
    exact = S.brute_force_topk(q_side, c_side, k=_K).select(
        "query_id", "neighbor_id", F.col("rank").alias("rx")
    ).localCheckpoint(eager=False)
    approx = S.lsh_topk(q_side, c_side, k=_K, bits=_BITS).select(
        "query_id", "neighbor_id", F.col("rank").alias("ra")
    ).localCheckpoint(eager=False)
    nx = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    na = approx.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_approx"))
    m = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    t1 = (
        exact.filter(F.col("rx") == 1)
        .join(approx, ["query_id", "neighbor_id"], "left")
        .select("query_id", F.coalesce("ra", F.lit(-1)).alias("top1_rank_in_approx"))
    )
    return (
        nx.join(na, "query_id", "left")
        .join(m, "query_id", "left")
        .join(t1, "query_id")
        .select(
            "query_id",
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.coalesce("n_approx", F.lit(0)).cast("bigint").alias("n_approx"),
            F.coalesce("n_matched", F.lit(0)).cast("bigint").alias("n_matched"),
            F.expr("10000 * coalesce(n_matched, 0) div n_exact")
            .cast("bigint")
            .alias("recall_bp"),
            F.col("top1_rank_in_approx").cast("bigint").alias("top1_rank_in_approx"),
        )
    )


# --------------------------------------------------------------------------
# q_ndcg_eval — graded ranking quality of the LSH pipeline vs
# brute-force truth: NDCG@K, the metric that (unlike q_ann_recall's
# set recall) penalizes the approximate list for ORDERING its hits
# wrong. Truth grades are derived from the exact ranking (rank r of K
# -> gain K+1-r, misses 0); DCG discounts by 1/log2(position+1).
# Engine exactness: log2 factors through ln (bit-identical across
# engines on exact-integer doubles — the DSIR finding), the whole
# per-position term is ONE SHARED SQL expression evaluated by both
# engines and floored to integer 1e-9 units, so per-query DCG/IDCG
# are order-independent BIGINT sums. Both replayed pipelines are the
# SAME CTE prefix q_ann_recall certifies (_rank_pipeline_ctes).
# --------------------------------------------------------------------------
def _dcg_term(g: str, p: str) -> str:
    """floor(1e9 * g * ln(2)/ln(p+1)) — identical expression tree in
    both engines => identical doubles => identical floor."""
    return (
        f"cast(floor(1e9 * (cast({g} as double) * ln(2e0)"
        f" / ln(cast({p} + 1 as double)))) as bigint)"
    )


def _ndcg_oracle() -> str:
    idcg = _dcg_term(f"({_K} + 1 - rank)", "rank")
    dcg = _dcg_term(f"coalesce({_K} + 1 - x.rank, 0)", "a.rank")
    return f"""{_rank_pipeline_ctes()},
gx AS (
  SELECT query_id, CAST(SUM({idcg}) AS BIGINT) AS idcg_e9 FROM rx GROUP BY 1
),
ga AS (
  SELECT a.query_id, count(*) AS n_approx,
    CAST(SUM({dcg}) AS BIGINT) AS dcg_e9
  FROM ra a LEFT JOIN rx x USING (query_id, neighbor_id)
  GROUP BY 1
)
SELECT gx.query_id,
  CAST(coalesce(ga.n_approx, 0) AS BIGINT) AS n_approx,
  CAST(coalesce(ga.dcg_e9, 0) AS BIGINT) AS dcg_e9,
  gx.idcg_e9,
  CAST(10000 * coalesce(ga.dcg_e9, 0) // gx.idcg_e9 AS BIGINT) AS ndcg_bp
FROM gx LEFT JOIN ga USING (query_id)
"""


@query("q_ndcg_eval", _ndcg_oracle())
def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.load(spark, sf_dir, "embeddings")
    q_side = emb.filter(F.col("vec_id") < _NQ)
    c_side = emb.filter(F.col("vec_id") >= _NQ)
    exact = (
        S.brute_force_topk(q_side, c_side, k=_K)
        .select("query_id", "neighbor_id", F.col("rank").alias("rx"))
        .localCheckpoint(eager=False)
    )
    approx = S.lsh_topk(q_side, c_side, k=_K, bits=_BITS).select(
        "query_id", "neighbor_id", F.col("rank").alias("ra")
    )
    gx = exact.groupBy("query_id").agg(
        F.expr(f"cast(sum({_dcg_term(f'({_K} + 1 - rx)', 'rx')}) as bigint)")
        .alias("idcg_e9")
    )
    ga = (
        approx.join(exact, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_approx"),
            F.expr(
                f"cast(sum({_dcg_term(f'coalesce({_K} + 1 - rx, 0)', 'ra')}) as bigint)"
            ).alias("dcg_e9"),
        )
    )
    return (
        gx.join(ga, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_approx", F.lit(0)).cast("bigint").alias("n_approx"),
            F.coalesce("dcg_e9", F.lit(0)).cast("bigint").alias("dcg_e9"),
            "idcg_e9",
            F.expr("10000 * coalesce(dcg_e9, 0) div idcg_e9")
            .cast("bigint")
            .alias("ndcg_bp"),
        )
    )
