"""Data-layout operators: Z-order clustering + small-file compaction.

No reference counterpart (forklift's layout story is a MySQL secondary
index, `transports/mysql.rb:122`); on immutable columnar storage layout
IS the index. Two operators:

- ``zorder_sort``: sort by an interleaved-bit (Morton) key over N
  columns so parquet row-groups get tight min/max ranges on EVERY
  z-dimension — multi-dimensional data skipping without an index. Pure
  JVM bit arithmetic; the sort is the only shuffle.
- ``compact``: rewrite a table directory into ~target-size files. At
  100 TB the small-files problem (per-file open cost, scheduler
  pressure) dominates incremental-upsert workloads; periodic compaction
  is the standard fix.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # bits per dimension; 2 dims -> 32-bit z-value


def _to_rank(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale a numeric column to an integer rank in [0, 2^bits).

    NULLs rank 0 (an explicit policy: null propagation would otherwise
    make frac NULL and least() silently pick max_rank, scattering null
    rows into the max corner of the curve — measured accident, now a
    deliberate min-corner cluster)."""
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    max_rank = (1 << bits) - 1
    return F.coalesce(
        F.least(F.floor(frac * F.lit(max_rank + 1)).cast("long"), F.lit(max_rank)),
        F.lit(0),
    )


def _interleave(ranks: list[Column], bits: int) -> Column:
    """Morton code: bit j of dimension d lands at position j*D + d."""
    z = F.lit(0).cast("long")
    ndims = len(ranks)
    for j in range(bits):
        for d, r in enumerate(ranks):
            bit = F.shiftright(r, j).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, j * ndims + d)
    return z


def zorder_sort(df: DataFrame, cols: list[str], bits: int = Z_BITS) -> DataFrame:
    """Order rows by the Morton code of ``cols`` (numeric/date/timestamp).

    Write the result with file-per-partition and every z-dimension gets
    clustered min/max ranges per file — the poor-man's Z-order OPTIMIZE,
    expressed as one projection + one range sort (a single shuffle).
    Column ranges are computed in the same job (window-free agg + cross
    join of one row — broadcast).

    File granularity: control with the writer's ``maxRecordsPerFile``
    option (AQE coalesces small range partitions, so partition count
    alone doesn't bound file size; record-split files stay z-contiguous
    because the sort is total).
    """
    # total interleaved width must fit a signed 64-bit long: with D
    # dimensions the top bit lands at position bits*D - 1, so bits is
    # capped at 63 // D (4 cols at the default 16 bits would push dim 3's
    # top bit into the SIGN bit — those rows sort first, anti-clustered —
    # and Java's shiftleft masks shifts >= 64 back onto low positions)
    bits = min(bits, 63 // len(cols))
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"__hi_{c}")]
    bounds = df.agg(*aggs)
    with_bounds = df.crossJoin(F.broadcast(bounds))
    ranks = [
        _to_rank(F.col(c).cast("double"), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits)
        for c in cols
    ]
    z = _interleave(ranks, bits)
    return (
        with_bounds.withColumn("__z", z)
        .orderBy("__z")
        .drop("__z", *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])
    )


def compact(
    spark,
    table_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ceil(size/target) files via an
    atomic staging swap (same publish idiom as the upsert writer).
    Returns the new file count. Driver-side work is metadata-only."""
    import shutil
    import uuid

    size = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(table_path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size / target_file_bytes))
    df = spark.read.parquet(table_path)
    staging = f"{table_path}.__compact__{uuid.uuid4().hex[:8]}"
    df.repartition(n_files).write.mode("overwrite").parquet(staging)
    old = f"{table_path}.__old__{uuid.uuid4().hex[:8]}"
    os.rename(table_path, old)
    os.rename(staging, table_path)
    shutil.rmtree(old, ignore_errors=True)
    return n_files


def distinct_sketch_rollup(
    df,
    fine_keys: list[str],
    coarse_keys: list[str],
    count_col: str,
):
    """Mergeable approximate-distinct rollup (Datasketches HLL).

    The 100 TB pattern for COUNT(DISTINCT) over hierarchies: materialize
    the fine grain ONCE as sketches, then answer every coarser grain by
    merging sketches — no rescan of the raw data, and merging is
    register-wise max so it parallelizes as an ordinary partial
    aggregate. An exact distinct at the coarse grain would re-shuffle
    the full key set per query; this ships kilobyte sketches instead.

    Returns (fine_df, coarse_df): the fine grain with its estimate and
    retained sketch (the persistable intermediate), and the coarse
    rollup estimated from merged sketches.
    """
    from pyspark.sql import functions as F

    fine = df.groupBy(*fine_keys).agg(F.hll_sketch_agg(count_col).alias("sk"))
    fine_est = fine.withColumn("approx_distinct", F.hll_sketch_estimate("sk"))
    coarse = (
        fine.groupBy(*coarse_keys)
        .agg(F.hll_union_agg("sk").alias("sk"))
        .withColumn("approx_distinct", F.hll_sketch_estimate("sk"))
        .drop("sk")
    )
    return fine_est, coarse


# --------------------------------------------------------------------------
# Table fingerprint: order-independent multiset checksum for copy /
# migration validation. Comparing a 100 TB source against its replica
# with EXCEPT or a sorted diff is a full shuffle of both sides; the
# fingerprint reduces each side to `buckets` rows (bucket, n_rows,
# xor-of-row-hashes) computed scan-side — compare the two tiny frames
# and any difference localizes to a bucket (re-fingerprint that bucket
# with more buckets to bisect further). XOR is commutative/associative
# (order-independent at any parallelism) and self-inverse — a flipped
# pair of rows cancels in the checksum but not in n_rows, so the
# (count, xor) PAIR is the verdict. Hashing is the engine-portable md5
# family, so an INDEPENDENT engine can fingerprint its side (the oracle
# replays it; that is exactly the cross-system copy-validation story).
# Nulls: concat_ws drops nulls silently (ambiguous), so every column is
# null-sentineled before concatenation.
# --------------------------------------------------------------------------
def table_fingerprint(
    df: DataFrame, cols: list[str], buckets: int = 16
) -> DataFrame:
    from forklift_spark.functions.hashing import md5_long

    # length-prefixed fields: a bare separator is ambiguous the moment a
    # value can contain it (('a\x01b','c') vs ('a','b\x01c') would hash
    # equal — the FALSE-MATCH direction a copy validator must never
    # take), and a null sentinel collides with the same literal string.
    # "len:value" framing removes both; NULL is the one frame ("-1:")
    # no real value can produce.
    def field(c):
        v = F.col(c).cast("string")
        return F.when(
            v.isNull(), F.lit("-1:")
        ).otherwise(F.concat(F.length(v).cast("string"), F.lit(":"), v))

    canon = F.concat_ws("\x01", *[field(c) for c in cols])
    h = md5_long(canon)
    return (
        df.select(F.pmod(h, F.lit(buckets)).alias("bucket"), h.alias("_h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr("bit_xor(_h)").alias("checksum"),
        )
    )
