"""Test-table catalog: load the driver's parquet tables and register views.

The driver's data lives at /root/testdata/sf{0.001,0.01,0.1}/<table>.parquet
(see TESTDATA.md). Every query entry point takes (spark, sf_dir) and loads
through here so filter pushdown / column pruning reach the parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (region=5 rows, nation=25 rows always; supplier/part grow slowly).
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Older testdata generations wrote events.ts as TIMESTAMP(NANOS),
        # which Spark rejects by default (PARQUET_TYPE_ILLEGAL). nanosAsLong
        # is a runtime-settable SQLConf, so set it here rather than relying
        # on the caller's session builder — the driver harness (and any
        # external caller) builds its own SparkSession without our
        # session.py configs.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The NTZ->TIMESTAMP cast below is value-identical to the DuckDB oracle
    # only under a UTC session timezone. Enforce it here (runtime-settable)
    # instead of assuming the caller's session was built by session.py —
    # on a non-UTC host every unix_micros/window query would silently
    # shift by the tz offset vs. the oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Per-session memo of the LAZY DataFrame (optimization r9, guide
    # §1.2): repeated loads of the same static path were re-running
    # parquet schema inference every call — measured 135 ms/call warm vs
    # 23 ms with a known schema, across 300+ load calls per bench sweep.
    # This caches ONLY the unresolved plan + schema (the same thing
    # register_views does once per session); no rows are cached — every
    # action on the returned frame still scans the parquet files. Keyed
    # on the directory's mtime so a rewritten table re-infers.
    cache = spark.__dict__.setdefault("_forklift_table_plan_cache", {})
    try:
        key = (path, os.path.getmtime(path))
    except OSError:
        key = None
    if key is not None and key in cache:
        return cache[key]
    df = _normalize_timestamps(spark.read.parquet(path), name)
    if key is not None:
        cache[key] = df
    return df


def _normalize_timestamps(df: DataFrame, name: str) -> DataFrame:
    """Normalize time columns so every query sees session-tz TIMESTAMP.

    Two generations of driver testdata exist:
    - TIMESTAMP(NANOS): under nanosAsLong the column arrives as LongType
      (nanos) and we truncate to micros — bit-identical to DuckDB's
      TIMESTAMP_NS -> TIMESTAMP.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads TIMESTAMP_NTZ,
      which many chrono builtins (unix_micros, window, ...) reject. Cast to
      TIMESTAMP — with the UTC session timezone this is value-identical to
      DuckDB's naive TIMESTAMP read of the same file.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        # LongType-ts reinterpretation is an events-only data-generation
        # quirk — any other table with a legitimate BIGINT 'ts' column must
        # NOT be silently reinterpreted as nano-timestamps.
        if name == "events" and field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(
                field.name, F.col(field.name).cast(T.TimestampType())
            )
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view so spark.sql() can address it.

    Idempotent; re-registering repoints the view at the new sf_dir.
    """
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
