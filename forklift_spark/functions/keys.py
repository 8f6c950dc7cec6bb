"""Surrogate-key generation (SURVEY §7 hard part 2).

The reference's lazy CREATE defaults an ``id bigint AUTO_INCREMENT``
primary key (`transports/mysql.rb:112-121`). Spark has no sequence;
the two honest substitutes, offered explicitly:

- ``monotonic``: ``monotonically_increasing_id()`` — unique, ordered
  within partitions, NON-CONTIGUOUS (partition id in the high bits).
  O(1), no shuffle; the right default at scale.
- ``dense``: contiguous 1..N via zipWithIndex-style two-phase count —
  one extra job to count per-partition sizes, then a mapPartitions
  offset add. Contiguous like AUTO_INCREMENT, but assigning it is a
  full pass; use only when the contract truly needs gap-free ids.

Both diverge from MySQL in one way that cannot be bridged: ids are
assigned per-batch, not transactionally across writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_surrogate_key(
    df: DataFrame, name: str = "id", mode: str = "monotonic", start: int = 1
) -> DataFrame:
    if mode == "monotonic":
        return df.withColumn(name, F.monotonically_increasing_id() + F.lit(start))
    if mode == "dense":
        rdd = df.rdd.zipWithIndex()
        out = rdd.map(lambda pair: (*pair[0], pair[1] + start))
        from pyspark.sql import types as T

        schema = T.StructType(
            list(df.schema.fields) + [T.StructField(name, T.LongType(), False)]
        )
        return df.sparkSession.createDataFrame(out, schema)
    raise ValueError(f"unknown surrogate key mode {mode!r}")
