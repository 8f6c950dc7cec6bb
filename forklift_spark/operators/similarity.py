"""Similarity search over embedding columns (array<float>).

No reference counterpart; the scale-path operators a training-data
pipeline needs. Everything is built-in higher-order functions
(zip_with/aggregate/transform) — JVM-side, no Python in the hot path.

Determinism: reported scores are computed in DECIMAL (inputs rounded to
decimal(10,9), exact order-independent sums) then cast to double, so
they are bit-identical at any parallelism and against the SQL oracle.
A float32 embedding carries <8 significant digits, so the 9-digit
rounding is lossless. The exact path costs ~4x a double sum, so every
operator scores candidates with a cheap double dot first and rescores
only the rows that reach the output (threshold band for dedup, top
k+margin for ANN) — the hot loop stays in double, the answer stays
exact.

- brute-force top-k: queries × corpus equi-free join. Correct baseline;
  cost Q×N — fine for small Q (broadcast the queries side), the
  benchmark for ANN recall.
- hyperplane-LSH buckets: 1-bit-per-seed random-hyperplane signature
  (signs derived from md5, not an RNG, so every engine agrees), bucket
  equi-join, exact cosine within bucket. At 100 TB: signature is one
  projection pass; the join shuffles on the bucket key; multi-probe =
  more seeds/tables, still no cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from forklift_spark.functions.hashing import HEX_CHARS

# element cast: embeddings are unit-ish floats (|v| < 10), and float32
# carries < 8 significant digits, so decimal(10,9) is lossless. The
# product is decimal(21,18); the accumulator decimal(20,18) (|dot| < 100)
# is re-cast each step because Spark's decimal '+' would otherwise widen
# precision past 38 and silently drop scale (breaking oracle exactness).
VEC_DEC = "decimal(10,9)"
ACC_DEC = "decimal(20,18)"


def dot_exact(a: Column, b: Column) -> Column:
    """Exact decimal dot product of two float arrays, as double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast(VEC_DEC) * y.cast(VEC_DEC))
    acc = F.aggregate(
        prods, F.lit(0).cast(ACC_DEC), lambda s, p: (s + p).cast(ACC_DEC)
    )
    return acc.cast("double")


def dot_fast(a: Column, b: Column) -> Column:
    """Double dot product — cheap prefilter path, NOT order-deterministic
    to the last ulp. Relative error is bounded by ~dims*eps (< 1e-13 for
    64 dims); use with an epsilon band and rescore survivors with
    ``dot_exact`` when the output value must match the oracle."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda s, p: s + p)


# prefilter band: double-dot relative error bound (64 dims * 2^-52 per op,
# with |cos| <= 1) is < 1e-12; 1e-9 gives a 1000x safety margin while
# still rejecting essentially every non-matching pair.
FAST_FILTER_EPS = 1e-9


def norm_exact(a: Column) -> Column:
    """sqrt of the exact self-dot — IEEE-deterministic double."""
    return F.sqrt(dot_exact(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot_exact(a, b) / (norm_exact(a) * norm_exact(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    queries is broadcast (small side by construction); the corpus streams
    once with its norm computed a single time per vector (not per pair —
    at Q queries that's a Q× saving on the dominant decimal work).
    Returns (query_id, neighbor_id, cos_sim, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(dot_fast(F.col(vec_col), F.col(vec_col))).alias("qf"),
    )
    corpus = corpus.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism, id_col
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(dot_fast(F.col(vec_col), F.col(vec_col))).alias("cf"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        "qv",
        "cv",
        (dot_fast(F.col("qv"), F.col("cv")) / (F.col("qf") * F.col("cf"))).alias(
            "cos_fast"
        ),
    )
    return _exact_rescore_topk(scored, k)


# double-prefilter margin for top-k: exact rescoring is restricted to the
# double-ranked top (k + margin) candidates per query. The double cosine is
# within ~1e-13 of the exact value, so a pair outside the margin would need
# >margin distinct cosines packed inside that error band to displace a true
# top-k row — not a realistic geometry; the oracle hash-check guards it.
TOPK_RESCORE_MARGIN = 8


def _exact_rescore_topk(scored_fast: DataFrame, k: int) -> DataFrame:
    """Shared tail of the top-k operators: rank candidates by the cheap
    double cosine, exact-rescore only the top (k + margin) per query, then
    re-rank on the exact decimal value the output reports.

    Zero-norm vectors (cosine undefined; 0/0 = NaN, which Spark orders
    ABOVE every real double in a desc sort — a NaN row would take rank 1
    and the exact decimal rescore would divide by zero) are excluded
    from candidacy."""
    from pyspark.sql import Window as W

    wf = W.partitionBy("query_id").orderBy(
        F.col("cos_fast").desc(), F.col("neighbor_id")
    )
    short = (
        scored_fast.filter(~F.isnan("cos_fast"))
        .withColumn("rf", F.row_number().over(wf))
        .filter(F.col("rf") <= k + TOPK_RESCORE_MARGIN)
        .select("query_id", "neighbor_id", "qv", "cv")
    )
    return _exact_rescore_tail(short, k)


def _exact_rescore_tail(short: DataFrame, k: int, int_rank: bool = False) -> DataFrame:
    """Common final stage of EVERY top-k operator: exact-decimal cosine
    over an already-shortlisted (query_id, neighbor_id, qv, cv) frame,
    re-rank desc with neighbor_id tiebreak, keep k, round to 9dp (the
    decimal->double conversion may differ by 1 ulp between engines;
    ranking uses the exact value)."""
    from pyspark.sql import Window as W

    scored = short.select(
        "query_id",
        "neighbor_id",
        (
            dot_exact(F.col("qv"), F.col("cv"))
            / (norm_exact(F.col("qv")) * norm_exact(F.col("cv")))
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("cos_sim", F.round("cos_sim", 9))
    )
    return out.withColumn("rank", F.col("rank").cast("int")) if int_rank else out


def _hyperplane_signs(seed: int, dims: int) -> list[int]:
    """Deterministic ±1 per (hyperplane seed, dimension) — md5-derived,
    identical to the SQL oracle's CAST('0x'||substr(md5(...))) & 1.
    Computed driver-side (hashlib md5 == every engine's md5) and shipped
    as a literal array: dims×bits hashes once, instead of per row×element."""
    import hashlib

    out = []
    for d in range(dims):
        h = int(hashlib.md5(f"h{seed}:{d}".encode()).hexdigest()[:HEX_CHARS], 16)
        out.append((h & 1) * 2 - 1)
    return out


def _lsh_bucket_seeded(vec: Column, bits: int, seed_offset: int, dims: int = 64) -> Column:
    """Hyperplane signature over seeds [seed_offset, seed_offset+bits) —
    disjoint offsets give independent hash tables."""
    bucket = F.lit(0)
    for s in range(bits):
        signs = F.array(
            *[F.lit(v).cast(VEC_DEC) for v in _hyperplane_signs(seed_offset + s, dims)]
        )
        prods = F.zip_with(vec, signs, lambda v, g: v.cast(VEC_DEC) * g)
        tot = F.aggregate(
            prods, F.lit(0).cast(ACC_DEC), lambda a, p: (a + p).cast(ACC_DEC)
        )
        bucket = bucket + F.when(tot >= 0, F.lit(1 << s)).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_bucket(vec: Column, bits: int, dims: int = 64) -> Column:
    """Random-hyperplane signature: bit s = sign(Σ_d ±1·v_d) with the
    ±1 pattern keyed by (s, d). Exact decimal sums -> portable buckets."""
    return _lsh_bucket_seeded(vec, bits, 0, dims)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 4,
    n_tables: int = 1,
) -> DataFrame:
    """ANN top-k: exact cosine ranking restricted to the query's LSH
    bucket(s). Recall < 1 by design; ``n_tables`` independent hash
    tables (disjoint hyperplane seed ranges) union their candidates —
    the standard recall lever: P(miss) decays exponentially in tables.
    The candidate join is an equi-join on (table, bucket) — the plan
    that survives a 2000-executor corpus scan; corpus cost is one extra
    signature column and candidate-set growth, never a cross join."""

    def buckets(vec: Column) -> Column:
        # table t uses hyperplane seeds [t*bits, (t+1)*bits) — independent
        # sign families per table
        return F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    _lsh_bucket_seeded(vec, bits, t * bits).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(dot_fast(F.col(vec_col), F.col(vec_col))).alias("qf"),
        F.explode(buckets(F.col(vec_col))).alias("tb"),
    ).select("query_id", "qv", "qf", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    corpus = corpus.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism, id_col
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(dot_fast(F.col(vec_col), F.col(vec_col))).alias("cf"),
        F.explode(buckets(F.col(vec_col))).alias("tb"),
    ).select(
        "neighbor_id", "cv", "cf", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket")
    # the decimal signature pass dominates; persist so repeated searches
    # against the same corpus pay it once (at scale: a signed corpus table)
    ).persist()
    joined = c.join(F.broadcast(q), ["tbl", "bucket"])
    if n_tables > 1:
        # a (query, neighbor) pair can meet in several tables; with one
        # table buckets partition the corpus, so the pairs are unique and
        # the dedup shuffle would be pure overhead
        joined = joined.dropDuplicates(["query_id", "neighbor_id"])
    scored = joined.select(
        "query_id",
        "neighbor_id",
        "qv",
        "cv",
        (dot_fast(F.col("qv"), F.col("cv")) / (F.col("qf") * F.col("cf"))).alias(
            "cos_fast"
        ),
    )
    return _exact_rescore_topk(scored, k)


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Assign each vector to its NEAREST centroid by squared L2 —
    argmin ||x-c||² = argmax (2·<x,c> − ||c||²); the raw-dot shortcut
    this replaced dropped the −||c||² term, so a large-norm centroid
    absorbed nearly every vector regardless of direction, collapsing the
    IVF partition (and its n_probe/n_cells cost bound). Both the dot and
    the centroid self-norm run in the same exact-decimal machinery, cast
    to double only for the final 2·dot − ||c||² comparison (identical
    IEEE arithmetic to the SQL oracle). ``centroids`` is a small
    driver-side list shipped as literals (at scale: a k-means fit on a
    sample, still < a few thousand cells — broadcast-sized by
    construction). Ties break to the lowest cell id (array_position
    returns the FIRST index of the max, and centroids are in cell-id
    order). Scores stay in one named array column — a chained
    when/otherwise argmax nests the running best into both branches of
    every step and blows the expression tree up ~2^k (see
    kmeans_assign)."""
    scores = []
    for _cid, cvec in centroids:
        carr = F.array(*[F.lit(float(x)).cast(VEC_DEC) for x in cvec])
        prods = F.zip_with(F.col(vec_col), carr, lambda v, c: v.cast(VEC_DEC) * c)
        dot = F.aggregate(
            prods, F.lit(0).cast(ACC_DEC), lambda a, p: (a + p).cast(ACC_DEC)
        )
        cn2 = F.aggregate(
            F.zip_with(carr, carr, lambda a, b: a * b),
            F.lit(0).cast(ACC_DEC),
            lambda a, p: (a + p).cast(ACC_DEC),
        )
        scores.append(
            F.lit(2.0) * dot.cast("double") - cn2.cast("double")
        )
    cids = F.array(*[F.lit(int(cid)) for cid, _ in centroids])
    idx = F.array_position(F.col("_scores"), F.array_max("_scores")).cast("int")
    return (
        df.withColumn("_scores", F.array(*scores))
        .withColumn(out_col, F.element_at(cids, idx).cast("int"))
        .drop("_scores")
    )


def deterministic_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, n_cells: int
) -> list[tuple[int, list[float]]]:
    """Seed centroids deterministically: the n_cells lowest-id vectors
    (reproducible across engines/runs — no RNG; a production pipeline
    would run sampled k-means and persist the model)."""
    rows = corpus.orderBy(id_col).limit(n_cells).collect()
    return [(i, list(r[vec_col])) for i, r in enumerate(rows)]


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """IVF ANN: corpus partitioned into centroid cells, each query probes
    its ``n_probe`` nearest cells, exact cosine ranking within the probed
    cells. The candidate join is an equi-join on the cell id — at 100 TB
    the corpus side shuffles once on ``cell`` (or is written bucketed by
    cell), and each query touches n_probe/n_cells of the data."""
    cents = deterministic_centroids(corpus, id_col, vec_col, n_cells)
    c = ivf_assign(
        corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism, id_col),
        cents,
        vec_col,
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(dot_fast(F.col(vec_col), F.col(vec_col))).alias("cf"),
        "cell",
    )
    # per-query probe list: rank all cells by dot(query, centroid)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(dot_fast(F.col(vec_col), F.col(vec_col))).alias("qf"),
    )
    probes = None
    for cid, cvec in cents:
        carr = F.array(*[F.lit(float(x)).cast(VEC_DEC) for x in cvec])
        prods = F.zip_with(F.col("qv"), carr, lambda v, g: v.cast(VEC_DEC) * g)
        dot = F.aggregate(
            prods, F.lit(0).cast(ACC_DEC), lambda a, p: (a + p).cast(ACC_DEC)
        )
        cn2 = F.aggregate(
            F.zip_with(carr, carr, lambda a, b: a * b),
            F.lit(0).cast(ACC_DEC),
            lambda a, p: (a + p).cast(ACC_DEC),
        )
        # same nearest-cell metric as ivf_assign (2·dot − ||c||²)
        score = F.lit(2.0) * dot.cast("double") - cn2.cast("double")
        entry = F.struct(score.alias("s"), F.lit(cid).alias("cell"))
        probes = F.array(entry) if probes is None else F.concat(probes, F.array(entry))
    q = q.withColumn(
        "cell",
        F.explode(
            F.slice(
                F.transform(
                    F.reverse(F.array_sort(probes)), lambda e: e.getField("cell")
                ),
                1,
                n_probe,
            )
        ),
    )
    scored = c.join(F.broadcast(q), "cell").select(
        "query_id",
        "neighbor_id",
        "qv",
        "cv",
        (dot_fast(F.col("qv"), F.col("cv")) / (F.col("qf") * F.col("cf"))).alias(
            "cos_fast"
        ),
    )
    return _exact_rescore_topk(scored, k)


def signature_table(
    df: DataFrame,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 4,
    n_buckets: int = 8,
    reuse: bool = True,
) -> DataFrame:
    """Materialize the signed corpus ONCE as a catalog table bucketed by
    the LSH bucket: (_id, _v, _n, bucket). The decimal signature is the
    expensive per-row pass of every LSH consumer (dedup, ANN, hybrid
    search) — at 100 TB it must be paid at write time and REUSED, not
    recomputed per query or per self-join branch. Because the table is
    bucketed on ``bucket``, the candidate self-join needs no Exchange:
    the bucketed scan IS the shuffle, paid once here.

    ``reuse=True`` (default) returns the existing table when this
    session already built it — callers derive the table name from their
    source identity, so an existing table IS the signature of the same
    corpus. Pass ``reuse=False`` to force a rebuild after the source
    mutated under the same name.

    Returns the table-backed DataFrame (every reference is a plain scan).
    """
    from forklift_spark.operators.skew import write_bucketed

    if reuse and df.sparkSession.catalog.tableExists(table):
        return df.sparkSession.table(table)
    proj = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.sqrt(dot_fast(F.col(vec_col), F.col(vec_col))).alias("_n"),
        lsh_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    write_bucketed(proj, table, "bucket", n_buckets)
    return df.sparkSession.table(table)


def embedding_dedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    bits: int = 0,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs by cosine >= threshold.

    bits=0 -> exact all-pairs (the oracle-checkable baseline; quadratic,
    keep for samples/audits). bits>0 -> LSH-bucketed candidates (the
    scale path; misses cross-bucket pairs by design).

    Candidate pairs are scored twice: a cheap double dot prunes (with an
    epsilon band so no true pair is lost), then the few survivors are
    rescored with the exact decimal dot that the reported ``cos_sim``
    requires. The exact path costs ~4x the double path, and survivors
    are a vanishing fraction of candidates, so the dedup runs at double
    speed while the output stays bit-identical to the oracle.

    ``signatures``: a pre-built signed corpus (from ``signature_table``)
    with columns (_id, _v, _n, bucket). When given, the signature pass is
    skipped entirely — both self-join branches scan the bucketed table,
    which is the 100 TB shape (signatures written once, reused across
    dedup/ANN/hybrid queries)."""
    if signatures is not None:
        if not bits:
            raise ValueError("signatures imply the LSH path; pass bits>0")
        proj = signatures
    else:
        df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
        proj = df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            F.sqrt(dot_fast(F.col(vec_col), F.col(vec_col))).alias("_n"),
        )
        if bits:
            # one-shot callers: persist so the self-join's two branches
            # don't each recompute the signature (the table-backed variant
            # above is the durable form of the same idea)
            proj = proj.withColumn("bucket", lsh_bucket(F.col("_v"), bits)).persist()
    a = proj.select(
        F.col("_id").alias("id_a"),
        F.col("_v").alias("va"),
        F.col("_n").alias("fa"),
        *(["bucket"] if bits else []),
    )
    b = proj.select(
        F.col("_id").alias("id_b"),
        F.col("_v").alias("vb"),
        F.col("_n").alias("fb"),
        *(["bucket"] if bits else []),
    )
    if bits:
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    survivors = pairs.filter(
        dot_fast(F.col("va"), F.col("vb")) / (F.col("fa") * F.col("fb"))
        >= threshold - FAST_FILTER_EPS
    )
    return (
        survivors.withColumn(
            "cos_sim",
            dot_exact(F.col("va"), F.col("vb"))
            / (norm_exact(F.col("va")) * norm_exact(F.col("vb"))),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 9).alias("cos_sim"))
    )


def kmeans_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Assign each vector to the nearest centroid by squared L2 (ties to
    the first centroid in list order, i.e. the lowest cluster id) — one
    JVM projection over centroid literals, the same broadcast-free shape
    as ``ivf_assign``.

    The k distances are projected into ONE named array column and the
    argmin is array_min + array_position over that column. A chained
    when(d_i < best)/otherwise fold looks equivalent but nests the
    running best expression into both branches of every step — the tree
    (and codegen) doubles per centroid, ~2^k blowup (measured: 22 s for
    k=8 x 3 Lloyd iterations at sf0.01; ~3 s this way)."""
    vnorm2 = dot_fast(F.col(vec_col), F.col(vec_col))
    dists = []
    for _cid, cvec in centroids:
        carr = F.array(*[F.lit(float(x)) for x in cvec])
        cn2 = float(sum(x * x for x in cvec))
        dists.append(vnorm2 - 2.0 * dot_fast(F.col(vec_col), carr) + F.lit(cn2))
    cids = F.array(*[F.lit(int(cid)) for cid, _ in centroids])
    out = df.withColumn("_dists", F.array(*dists))
    idx = F.array_position(F.col("_dists"), F.array_min("_dists")).cast("int")
    return (
        out.withColumn(out_col, F.element_at(cids, idx).cast("int"))
        .withColumn("sq_dist", F.array_min("_dists").cast("double"))
        .drop("_dists")
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
) -> list[tuple[int, list[float]]]:
    """Lloyd's k-means over an embedding column, built for the corpus
    scale path: the single-subspace (m=1) case of the joint ``pq_train``
    trainer — each iteration is one assignment-plus-aggregation job with
    centroids shipped as broadcast data (identical plan every round, so
    codegen caches instead of recompiling per iteration). The only
    driver-side data is the k x dims centroid matrix — bounded and tiny
    (it plays the role of the model object). Initialization is the
    ``deterministic_centroids`` seed and centroid updates use exact
    decimal sums, so the fit is reproducible across runs, partitionings,
    and engines. A cluster that loses all members keeps its previous
    centroid (standard empty-cluster handling)."""
    books = pq_train(df, id_col, vec_col, m=1, k=k, iters=iters, dims=None)
    return list(enumerate(books[0]))


def kmeans_fit_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Fit + final assignment: (id, cluster, sq_dist)."""
    cents = kmeans_fit(df, id_col, vec_col, k, iters)
    return kmeans_assign(df, cents, id_col, vec_col).select(
        id_col, "cluster", F.round("sq_dist", 6).alias("sq_dist")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the 100 TB embedding-store compression path.
# A 64-dim float32 vector (256 B) becomes m=8 uint4-ish codes (8 B) — the
# corpus that ANN scans/shuffles shrinks ~30x, and approximate distances
# come from per-query lookup tables instead of full dot products
# (asymmetric distance computation, ADC). Jegou et al., "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011.
# ---------------------------------------------------------------------------
def _unit(vec: Column) -> Column:
    """L2-normalized copy of a vector column (zero vectors stay zero).
    PQ shortlists rank by squared-L2 ADC distance while the operators'
    output contract is COSINE — on unit vectors the two orderings
    coincide (spherical quantization, the standard cosine-PQ recipe);
    on raw vectors a large-norm true neighbor can be pushed out of the
    L2 shortlist systematically."""
    n = F.sqrt(dot_fast(vec, vec))
    return F.transform(vec, lambda x: F.when(n > 0, x.cast("double") / n).otherwise(F.lit(0.0)))


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    dims: int | None = 64,
    normalize: bool = True,
) -> list[list[list[float]]]:
    """Train per-subspace codebooks: split each vector into m contiguous
    subvectors and k-means each subspace independently (deterministic
    seeds + exact decimal centroid updates — reproducible fits). The
    model is m x k x (dims/m) floats driver-side — ~4 KB at the defaults,
    the same bounded-model contract as kmeans_fit/ivf centroids.
    ``dims=None`` infers the width from the first vector (one bounded
    row fetch).

    All m subspaces train JOINTLY: the corpus is exploded once into
    (j, subvector) rows and every Lloyd iteration is ONE assignment
    projection + ONE (j, cluster, pos) aggregation covering all
    subspaces — m x fewer sequential jobs than looping kmeans_fit per
    subspace (measured 15 s -> ~2 s at sf0.01 for m=8, and the win grows
    with m; job-launch latency, not data volume, dominated the loop).
    Per-subspace centroids reach the executors as broadcast data, one
    row per subspace."""
    if dims is None:
        dims = len(df.select(vec_col).first()[0])
    sub = dims // m
    src = vec_col
    if normalize:  # spherical PQ: quantize directions (see _unit)
        df = df.withColumn("_pqn", _unit(F.col(vec_col)))
        src = "_pqn"
    # one pass: (id, j, sv) for all m subspaces; persisted across iters
    sv_df = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.array(*[F.slice(F.col(src), j * sub + 1, sub) for j in range(m)])
        ).alias("j", "sv"),
    ).persist()
    # deterministic seeds: subvectors of the k lowest-id vectors (one
    # bounded collect for all subspaces)
    seed_rows = df.orderBy(id_col).limit(k).collect()
    books: list[list[list[float]]] = [
        [list(r[src])[j * sub : (j + 1) * sub] for r in seed_rows]
        for j in range(m)
    ]
    spark = df.sparkSession
    # per-iteration centroids ship as broadcast DATA, not literals: a
    # literal nested array changes value every iteration, so each Lloyd
    # round would codegen a brand-new plan (~3 s/iter measured at m=8
    # k=16 — and O(m*k*sub) expression size, catastrophic at real-world
    # k=256); as data the plan is identical across iterations and
    # codegen-caches (~1 s/iter warm)
    dists = F.transform(
        F.col("cents"),
        lambda c: F.aggregate(
            F.zip_with(
                F.col("sv"), c, lambda v, x: (v.cast("double") - x) * (v.cast("double") - x)
            ),
            F.lit(0.0),
            lambda a, d: a + d,
        ),
    )
    for _ in range(iters):
        cents_df = spark.createDataFrame(
            [(j, books[j]) for j in range(m)], "j int, cents array<array<double>>"
        )
        rows = (
            sv_df.join(F.broadcast(cents_df), "j")
            .withColumn("_d", dists)
            .select(
                "j",
                (F.array_position(F.col("_d"), F.array_min("_d")) - 1)
                .cast("int")
                .alias("cluster"),
                F.posexplode(F.col("sv")).alias("pos", "x"),
            )
            .groupBy("j", "cluster", "pos")
            .agg(
                (F.sum(F.col("x").cast(VEC_DEC)) / F.count(F.lit(1)))
                .cast("double")
                .alias("m")
            )
            .collect()  # bounded: m*k*sub rows (1024 at the defaults)
        )
        upd: dict[tuple[int, int], list[float]] = {}
        for r in rows:
            upd.setdefault((r["j"], r["cluster"]), [0.0] * sub)[r["pos"]] = r["m"]
        books = [
            [upd.get((j, c), books[j][c]) for c in range(k)] for j in range(m)
        ]
    sv_df.unpersist()
    return books


def _sq_dist_double(vec: Column, center: list[float]) -> Column:
    carr = F.array(*[F.lit(float(x)) for x in center])
    diffs = F.zip_with(vec, carr, lambda v, c: (v.cast("double") - c) * (v.cast("double") - c))
    return F.aggregate(diffs, F.lit(0.0), lambda a, d: a + d)


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Encode each vector as m nearest-codeword indices (0-based) — in
    the same (unit-normalized, see _unit) space the codebooks were
    trained in. One projection pass; each subspace's argmin uses the
    named-array-column pattern (NOTES_r2 lesson 6 — never a
    when/otherwise fold). Keeps the original vector column for exact
    rescoring."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    out = df
    if normalize:
        out = out.withColumn("_pqn", _unit(F.col(vec_col)))
    src = "_pqn" if normalize else vec_col
    for j, book in enumerate(codebooks):
        sv = F.slice(F.col(src), j * sub + 1, sub)
        out = out.withColumn(f"_pqd{j}", F.array(*[_sq_dist_double(sv, c) for c in book]))
    codes = F.array(
        *[
            (
                F.array_position(F.col(f"_pqd{j}"), F.array_min(f"_pqd{j}")) - 1
            ).cast("int")
            for j in range(m)
        ]
    )
    drops = [f"_pqd{j}" for j in range(m)] + (["_pqn"] if normalize else [])
    return out.withColumn("codes", codes).drop(*drops)


def _query_luts(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    cents: list[tuple[int, list[float]]] | None = None,
    n_probe: int = 0,
    normalize: bool = True,
) -> DataFrame:
    """Collect the bounded query side (same contract as the broadcast in
    brute-force top-k: queries are few by construction) and precompute
    each query's m x k ADC lookup table — and, when ``cents`` is given,
    its n_probe nearest IVF cells — in plain Python. Shipping the tables
    as DATA instead of m*k nested column expressions keeps the
    corpus-side plan to one zip_with/aggregate pair; the expression form
    codegen'd ~130 higher-order functions per plan and its compile time
    dwarfed actual sf0.01 execution (measured 8.6 s -> ~1 s). All sums
    run left-to-right in the same order the column expressions did, so
    the doubles are bit-identical to the previous form."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    out = []
    for r in queries.select(id_col, vec_col).collect():
        v = [float(x) for x in r[vec_col]]
        if normalize:  # LUT lives in the codebooks' unit space (_unit);
            # probes + the rescore vector qv stay RAW
            n = sum(x * x for x in v) ** 0.5
            nv = [x / n for x in v] if n > 0 else v
        else:
            nv = v
        lut = [
            [
                sum((nv[j * sub + t] - c[t]) ** 2 for t in range(sub))
                for c in codebooks[j]
            ]
            for j in range(m)
        ]
        if cents is None:
            out.append((r[id_col], v, lut))
        else:
            # nearest-cell metric 2·dot − ||c||² (argmin L2, same as
            # ivf_assign); descending score, ties to the higher cell id —
            # matches the reverse(array_sort(struct(s, cell))) ordering
            scored = sorted(
                (
                    (
                        2.0 * sum(a * b for a, b in zip(v, cvec))
                        - sum(c * c for c in cvec),
                        cid,
                    )
                    for cid, cvec in cents
                ),
                reverse=True,
            )
            for _s, cid in scored[:n_probe]:
                out.append((r[id_col], v, lut, cid))
    schema = "query_id bigint, qv array<double>, lut array<array<double>>"
    if cents is not None:
        schema += ", cell int"
    return queries.sparkSession.createDataFrame(out, schema)


def _adc_approx() -> Column:
    """Asymmetric distance: sum of m lookup-table reads, one per code."""
    return F.aggregate(
        F.zip_with(
            F.col("codes"), F.col("lut"), lambda c, sl: F.element_at(sl, c + 1)
        ),
        F.lit(0.0),
        lambda a, d: a + d,
    )


def pq_adc_topk(
    queries: DataFrame,
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    margin: int = 40,
) -> DataFrame:
    """ANN top-k over PQ codes via asymmetric distance: each query
    precomputes an m x k lookup table of subspace distances (driver-side
    — the query side is bounded and broadcast anyway), the corpus side
    sums m table lookups per row — no dot products against the corpus at
    all. The double-ranked top (k + margin) candidates are exact-rescored
    with the decimal cosine the output reports (same contract as
    lsh/brute top-k; recall, not exactness, is the approximation —
    pinned in tests)."""
    q = _query_luts(queries, codebooks, id_col, vec_col)
    joined = (
        encoded.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "codes"
        )
        # zero-norm vectors have no defined cosine (see _exact_rescore_topk)
        .filter(dot_fast(F.col("cv"), F.col("cv")) > 0)
        .crossJoin(F.broadcast(q))
    )
    approx = _adc_approx()
    from pyspark.sql import Window as W

    wf = W.partitionBy("query_id").orderBy(F.col("_approx").asc(), F.col("neighbor_id"))
    short = (
        joined.withColumn("_approx", approx)
        .withColumn("rf", F.row_number().over(wf))
        .filter(F.col("rf") <= k + margin)
        .select("query_id", "neighbor_id", "qv", "cv")
    )
    return _exact_rescore_tail(short, k, int_rank=True)


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 3,
    m: int = 8,
    codes: int = 16,
    train_iters: int = 1,
    margin: int = 40,
) -> DataFrame:
    """IVF-PQ: the composed billion-scale ANN architecture (Faiss's
    default index family). The coarse quantizer (IVF cells) bounds WHICH
    rows a query touches — n_probe/n_cells of the corpus via a cell
    equi-join — and product quantization bounds WHAT each touched row
    costs — m table lookups over 8-byte codes instead of a 256-byte
    float dot. Residual-free variant (codes quantize the raw vectors):
    at this dimensionality the recall cost vs residual-PQ is small and
    the encode pass stays a single projection.

    Candidates are ADC-scored, and the double-ranked top (k + margin)
    per query are exact-decimal rescored — same output contract as every
    other top-k here (approximation affects recall only, pinned in
    tests/test_similarity_ivf.py)."""
    from pyspark.sql import Window as W

    cents = deterministic_centroids(corpus, id_col, vec_col, n_cells)
    books = pq_train(corpus, id_col, vec_col, m=m, k=codes, iters=train_iters)
    enc = pq_encode(
        ivf_assign(
            corpus.repartition(
                corpus.sparkSession.sparkContext.defaultParallelism, id_col
            ),
            cents,
            vec_col,
        ),
        books,
        id_col,
        vec_col,
    )
    # per-query probe cells (double centroid scores — probing is a recall
    # lever, not an exactness contract) + per-subspace ADC lookup tables,
    # both precomputed driver-side over the bounded query set
    q = _query_luts(queries, books, id_col, vec_col, cents=cents, n_probe=n_probe)
    joined = (
        enc.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
            "codes", "cell",
        )
        .filter(dot_fast(F.col("cv"), F.col("cv")) > 0)
        # no dedup needed: each corpus row has exactly ONE cell and each
        # query's probe cells are distinct, so (query, neighbor) pairs
        # are unique by construction — a dropDuplicates here was a pure
        # full-candidate-set shuffle
        .join(F.broadcast(q), "cell")
    )
    approx = _adc_approx()
    wf = W.partitionBy("query_id").orderBy(F.col("_approx").asc(), F.col("neighbor_id"))
    short = (
        joined.withColumn("_approx", approx)
        .withColumn("rf", F.row_number().over(wf))
        .filter(F.col("rf") <= k + margin)
        .select("query_id", "neighbor_id", "qv", "cv")
    )
    return _exact_rescore_tail(short, k, int_rank=True)
