"""Count-Min Sketch: bounded-memory frequency estimation (Cormode &
Muthukrishnan 2005).

No reference counterpart (taskrabbit/forklift delegates aggregation to
MySQL); this is the frequency-sketch half of the sketch toolbox next to
the HLL distinct-count rollups in operators/layout.py. Use it when the
key universe is too large to materialize exact counts per consumer —
the sketch is a fixed ``depth x width`` grid of counters (kilobytes)
that any number of downstream heavy-hitter / point-query passes can
share, and two sketches of disjoint corpus shards merge by cell-wise
addition (the same mergeability story as HLL).

Determinism: hashing is the engine-portable seeded-md5 family
(functions/hashing.py), so an independent engine can replay the entire
sketch cell-for-cell — the catalog oracle does exactly that.

Scale design (100 TB):
- build is two aggregations: exact per-key partial counts first (the
  map-side combine collapses within-partition repetition before
  anything shuffles), then ``depth`` rows per *distinct* key into the
  (row, bucket) grid — the wide shuffle moves distinct keys, not
  occurrences.
- the finished sketch is ``depth * width`` rows regardless of corpus
  size; lookups broadcast it, so probing N keys is a map-side join.
- estimates are upper bounds: est >= true count always; overestimate
  is bounded by (2N / width) per row with probability 1 - 2^-depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from forklift_spark.functions.hashing import md5_long, md5_long_seeded

CMS_DEPTH = 4
CMS_WIDTH = 512


def _bucket_array(key: str, depth: int, width: int):
    """Array of the key's seeded-md5 address per hash row (shared by the
    CMS grid and the Bloom bit positions); posexplode yields
    (row, bucket) pairs."""
    return F.array(*[md5_long_seeded(key, i) % width for i in range(depth)])


def cms_build(
    counts: DataFrame,
    key_col: str,
    weight_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch from pre-aggregated (key, count) rows ->
    DataFrame(row, bucket, cell). Callers aggregate occurrences to
    per-key counts first so the grid aggregation shuffles distinct
    keys, not raw occurrences."""
    pairs = counts.select(
        F.col(weight_col).alias("_w"),
        F.posexplode(_bucket_array(key_col, depth, width)).alias("row", "bucket"),
    )
    return pairs.groupBy("row", "bucket").agg(F.sum("_w").alias("cell"))


def cms_lookup(
    cms: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate each probe key against the sketch: the estimate is
    the MIN over hash rows of the addressed cells. The sketch is
    broadcast (depth*width rows by construction), so probing never
    shuffles the probe side."""
    addressed = probes.select(
        key_col,
        F.posexplode(_bucket_array(key_col, depth, width)).alias("row", "bucket"),
    )
    joined = addressed.join(F.broadcast(cms), ["row", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce("cell", F.lit(0))).alias("cms_est")
    )


# --------------------------------------------------------------------------
# Bloom filter: broadcastable set-membership prefilter
# --------------------------------------------------------------------------

BLOOM_BITS = 4096
BLOOM_HASHES = 5


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_hashes: int = BLOOM_HASHES,
    n_bits: int = BLOOM_BITS,
) -> DataFrame:
    """Build a Bloom filter over a bounded key set -> DataFrame(pos) of
    DISTINCT set bit positions (<= n_hashes * |keys| rows, kilobytes —
    the broadcastable representation; a bitmask packs it further but
    the position set joins directly). Seeded-md5 addressing, so an
    independent engine replays the filter bit-for-bit."""
    return (
        keys.select(
            F.explode(_bloom_positions(key_col, n_hashes, n_bits)).alias("pos")
        )
        .distinct()
    )


def _bloom_positions(key: str, n_hashes: int, n_bits: int):
    return _bucket_array(key, n_hashes, n_bits)


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    n_hashes: int = BLOOM_HASHES,
    n_bits: int = BLOOM_BITS,
) -> DataFrame:
    """Probe every row's key against the filter: candidate iff ALL
    n_hashes addressed bits are set (count of matched positions ==
    n_hashes). The filter side is broadcast; the probe side never
    shuffles — this is the scan-side prefilter that lets a 100 TB
    corpus skip the expensive exact-membership join for the ~100% of
    rows the filter rejects. No false negatives ever; false positives
    at the standard (1 - e^(-kn/m))^k rate. Probe keys are deduplicated
    (membership is per key, not per row)."""
    addressed = probes.select(key_col).distinct().select(
        key_col,
        F.explode(_bloom_positions(key_col, n_hashes, n_bits)).alias("pos"),
    )
    hits = (
        addressed.join(F.broadcast(bloom.withColumn("_set", F.lit(1))), "pos", "left")
        .groupBy(key_col)
        .agg((F.count("_set") == n_hashes).alias("bloom_candidate"))
    )
    return hits


# --------------------------------------------------------------------------
# Quantile sketch: mergeable log-binned histogram (the fixed-memory
# quantile estimator every 100 TB profiling pass needs — an exact
# percentile is a global sort; percentile_approx is engine-specific and
# oracle-unverifiable). Buckets are base-2 octaves refined by
# ``mantissa_bits`` sub-buckets: a positive BIGINT v lands in
# [lo, hi] where lo keeps the top mantissa_bits+1 significant bits of v
# and hi fills the truncated low bits with ones. Relative width of every
# bucket is <= 2^-mantissa_bits, so any rank-r interpolated estimate is
# within that relative error of the true rank statistic. Bucketing is
# integer-only (bit length via bin(), shifts via pow-of-2 division) —
# engine-portable, no floats anywhere.
#
# Mergeability: a sketch is (lo, hi, cnt) rows; shard sketches merge by
# summing cnt per bucket — associative/commutative, so per-executor
# partials, per-shard sketches, and the global sketch are the same
# object (test-pinned).
#
# Scale: the bucket space is bounded by construction (64 octaves x
# 2^mantissa_bits), so the groupBy shuffles a few thousand cells at
# most; quantile extraction runs a window over that bounded table, never
# over the data.
# --------------------------------------------------------------------------
QSKETCH_MANTISSA_BITS = 5


def qsketch_build(
    df: DataFrame,
    value: str,
    mantissa_bits: int = QSKETCH_MANTISSA_BITS,
    by: tuple[str, ...] = (),
) -> DataFrame:
    """(*by, lo, hi, cnt) log-histogram of a positive BIGINT column.

    With ``by`` keys this is the per-group profile: one bounded bucket
    set per key, aggregated in a single keyed shuffle."""
    bits = F.length(F.bin(F.col(value)))
    shift = F.greatest(bits - F.lit(mantissa_bits + 1), F.lit(0))
    # 2^shift as BIGINT: pow() is exact for these exponents (< 2^53).
    step = F.pow(F.lit(2.0), shift.cast("double")).cast("bigint")
    return (
        df.select(
            *by,
            (F.col(value).cast("bigint") - F.pmod(F.col(value).cast("bigint"), step))
            .alias("lo"),
            step.alias("_step"),
        )
        .select(*by, "lo", (F.col("lo") + F.col("_step") - 1).alias("hi"))
        .groupBy(*by, "lo", "hi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def qsketch_merge(*sketches: DataFrame, by: tuple[str, ...] = ()) -> DataFrame:
    """Merge shard sketches: cell-wise count addition."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*by, "lo", "hi").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def qsketch_quantiles(
    sketch: DataFrame, pcts: list[int], by: tuple[str, ...] = ()
) -> DataFrame:
    """Rank-interpolated quantile estimates from a sketch (per ``by``
    group when keys are given).

    For each pct, rank r = ceil(n * pct / 100) (integer arithmetic), the
    owning bucket is the first with cumulative count >= r, and the
    estimate interpolates integer-exactly inside [lo, hi]. The cum
    window partitions by the group keys (ungrouped: one bounded bucket
    table, see module note); the pct list and per-group totals are
    broadcast."""
    from pyspark.sql import Window as W

    spark = sketch.sparkSession
    w = (W.partitionBy(*by) if by else W).orderBy("lo")
    cum = sketch.withColumn(
        "cum", F.sum("cnt").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    tot = sketch.groupBy(*by).agg(F.sum("cnt").cast("bigint").alias("n"))
    q = spark.createDataFrame([(p,) for p in pcts], "pct int")
    ranks = tot.crossJoin(F.broadcast(q)).select(
        *by, "pct", "n", F.expr("(n * pct + 99) div 100").alias("r")
    )
    cond = F.col("c.cum") >= F.col("r.r")
    for k in by:
        cond = cond & (F.col(f"c.{k}") == F.col(f"r.{k}"))
    # ungrouped: bounded bucket table -> broadcast. Grouped: the key
    # equality carries the join (hash-partitioned, range as post-filter),
    # so high-cardinality key spaces never broadcast.
    cum_side = cum.alias("c") if by else F.broadcast(cum.alias("c"))
    owner = (
        ranks.alias("r")
        .join(cum_side, cond)
        .groupBy(*[F.col(f"r.{k}") for k in by], "r.pct", "r.n", "r.r")
        .agg(F.min_by(F.struct("c.lo", "c.hi", "c.cnt", "c.cum"), "c.lo").alias("b"))
    )
    return owner.select(
        *by,
        F.col("pct").cast("bigint").alias("pct"),
        "n",
        F.col("r").cast("bigint").alias("r"),
        # overflow-guarded interpolation: (hi-lo)*(r-base) can pass 2^63
        # for wide buckets with large counts (nanosecond-epoch or byte
        # values at real scale) and would silently wrap; when the product
        # cannot fit, fall to the SAME IEEE double expression both
        # engines evaluate identically (accuracy stays far inside the
        # 2^-mantissa_bits bucket-width bound either way)
        F.expr(
            "b.lo + (CASE WHEN (b.hi - b.lo) <= 4611686018427387904 div greatest(r - (b.cum - b.cnt), 1) THEN ((b.hi - b.lo) * (r - (b.cum - b.cnt))) div b.cnt ELSE CAST(FLOOR(CAST(b.hi - b.lo AS DOUBLE) * CAST(r - (b.cum - b.cnt) AS DOUBLE) / CAST(b.cnt AS DOUBLE)) AS BIGINT) END)"
        ).alias("est"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch with set algebra
# ---------------------------------------------------------------------------

KMV_HASH_SPACE = 1 << 60  # md5_long values are uniform on [0, 2^60)


def kmv_sketch(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """The k smallest 60-bit md5 values of the DISTINCT keys — a
    fixed-k, mergeable distinct-count sketch (Bar-Yossef et al. 2002 /
    the theta-sketch family). Deterministic by construction (same md5,
    same order on every engine), so oracles replay it value-for-value.

    Plan: distinct-hash aggregation, then TakeOrderedAndProject — each
    partition keeps its own k smallest and the driver merges k-sized
    heaps; nothing resembling a global sort materializes. Sketches of
    shards MERGE by unioning rows and re-taking the k smallest, which
    is how a 100 TB scan builds per-partition sketches and combines
    them in one reduce.

    NULL keys are excluded inside the operator: md5_long(NULL) is NULL,
    and Spark's ascending sort puts NULLs FIRST while DuckDB's default
    is NULLS LAST — without the filter a NULL would occupy a k-minimum
    slot on one engine only (ADVICE r3). Mirror the exclusion in any
    kmv-based oracle (DISTINCT ... WHERE key IS NOT NULL)."""
    h = md5_long(F.col(key_col).cast("string"))
    return (
        df.select(h.alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(k: int, *sketches: DataFrame) -> DataFrame:
    """Union sketch: the k smallest over the combined sketch rows —
    KMV's closure under set union (lossless: equals the sketch of the
    unioned base data)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """1-row (n_sketch, h_max, est) frame: exact count when the sketch
    holds fewer than k values (every distinct key is present), else the
    unbiased DV estimator (k-1) * 2^60 / h_k. The numerator is one
    exact double literal so both engines evaluate the same IEEE
    division."""
    numer = float((k - 1) * KMV_HASH_SPACE)
    return sketch.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sketch"),
        F.max("h").alias("h_max"),
    ).select(
        "n_sketch",
        "h_max",
        F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
        .otherwise(F.lit(numer) / F.col("h_max").cast("double"))
        .alias("est"),
    )
