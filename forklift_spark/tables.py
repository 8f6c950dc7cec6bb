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
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, read as nano-longs
        # (session sets spark.sql.legacy.parquet.nanosAsLong); truncate to
        # micros — bit-identical to DuckDB's TIMESTAMP_NS -> TIMESTAMP.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view so spark.sql() can address it.

    Idempotent; re-registering repoints the view at the new sf_dir.
    """
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
