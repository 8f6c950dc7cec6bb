"""Skew and co-location tools: salted joins + bucketed tables.

The reference never joins (SURVEY §2.3), so it has no skew story; at
100 TB these are the two levers that keep shuffle-bound joins alive:

- ``salted_join``: explode a hot-keyed build side over N salts so one
  reducer doesn't take the whole key. AQE's skew-join split handles
  moderate skew automatically; salting is the explicit form for extreme
  single-key skew (a web-crawl domain, a null-heavy FK) where even one
  AQE split is larger than an executor.
- ``write_bucketed`` / co-located reads: persist both sides bucketed by
  the join key so repeated joins run with NO exchange at all — the
  parquet/catalog analog of the reference's "do the work where the data
  lives" stance (`patterns/mysql_patterns.rb:168-177`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join on ``key`` with the left side salted over ``n_salt`` shards.

    left rows get a salt derived from a row hash (uniform, no RNG
    state); right rows are replicated once per salt value. Result set is
    identical to ``left.join(right, key, how)`` — only the shuffle
    distribution changes: each (key, salt) shard is 1/n of the hot key.

    Cost model: replicates the *right* side n_salt×, so use with a
    small-ish build side that still can't broadcast — the classic
    mid-size-dimension × skewed-fact shape.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    lhs = left.withColumn("__salt", salt)
    rhs = right.withColumn(
        "__salt",
        F.explode(F.transform(F.sequence(F.lit(0), F.lit(n_salt - 1)), lambda i: i.cast("long"))),
    )
    out = lhs.join(rhs, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist as a catalog table bucketed (and sorted) by the join key.
    Two tables bucketed the same way join with zero Exchange — the scan
    itself is the shuffle, paid once at write time.

    Overwrite must survive an ORPHANED location: with an in-memory
    session catalog, a previous process's managed-table directory
    outlives the catalog entry and saveAsTable then fails with
    LOCATION_ALREADY_EXISTS — drop the table AND clear a leftover local
    location first (a persistent metastore deployment only needs the
    DROP)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    local = wh.removeprefix("file:") if wh.startswith("file:") else (
        wh if wh.startswith("/") else None
    )
    if local:
        import shutil

        shutil.rmtree(f"{local.rstrip('/')}/{table.lower()}", ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def detect_skew(
    df: DataFrame,
    key: str,
    min_share: float = 0.01,
) -> DataFrame:
    """Hot-key audit for a prospective join/aggregation key: per-key row
    count and share of the table, keeping keys whose share exceeds
    ``min_share``. The operational preflight for choosing between a
    plain join, AQE skew splitting, and ``salted_join`` — at 100 TB you
    run this ONCE on a sample or the previous day's partition, not per
    query. One aggregation + one scalar subquery (broadcast total); the
    share division is a single IEEE double op, so the report is
    engine-reproducible."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    # total derives from the (tiny) per-key aggregate — a df.count()
    # here would scan the full table a second time
    total = counts.agg(F.sum("n").alias("_t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n").cast("double") / F.col("_t").cast("double"))
        .filter(F.col("share") >= min_share)
        .select(key, "n", "share")
    )


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    right_ts: str,
    lo: str,
    hi: str,
    bin_seconds: int,
) -> DataFrame:
    """Range join as an equi-join: rows of ``right`` whose ``right_ts``
    (epoch seconds) falls in ``left``'s half-open window [lo, hi),
    with ``keys`` equality.

    A raw inequality-predicate join sort-merges on the keys alone and
    re-filters every same-key pair — per-key quadratic, the classic
    100 TB range-join trap. Binning makes it an equi-join: the left
    window explodes to its covered time bins (ceil(span/bin)+1 rows,
    a small constant for bounded windows), the right side computes one
    bin scan-side, and the join runs on (keys..., bin) — hash-
    partitioned, AQE-splittable, skew-handled like any other equi-join.
    The exact [lo, hi) predicate re-applies post-join; each right row
    has exactly one bin, so no pair can match twice (no dedup pass).
    """
    # guard hi <= lo: Spark's sequence(start, stop) infers step -1 when
    # start > stop, so one inverted/corrupt window would explode into a
    # DESCENDING bin range (potentially millions of rows) instead of
    # matching nothing — the exact per-row quadratic this operator exists
    # to prevent
    lb = left.withColumn(
        "_bin",
        F.explode(
            F.when(
                F.col(hi) > F.col(lo),
                F.sequence(
                    F.floor(F.col(lo) / bin_seconds),
                    F.floor((F.col(hi) - 1) / bin_seconds),
                ),
            ).otherwise(F.expr("array()"))
        ),
    )
    rb = right.withColumn("_bin", F.floor(F.col(right_ts) / bin_seconds))
    return (
        lb.join(rb, [*keys, "_bin"])
        .filter((F.col(right_ts) >= F.col(lo)) & (F.col(right_ts) < F.col(hi)))
        .drop("_bin")
    )
