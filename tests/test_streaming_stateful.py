"""applyInPandasWithState operators driven across micro-batches.

Two availableNow runs share one checkpoint: the second run restores the
state store, so keys seen in run 1 stay deduped in run 2 — the
cross-restart guarantee the operator promises.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from forklift_spark.streaming import streaming_dedup, streaming_running_counts

SCHEMA = T.StructType(
    [
        T.StructField("fingerprint", T.StringType()),
        T.StructField("doc_id", T.LongType()),
    ]
)


def _run(spark, src_dir, ckpt, out_dir, op):
    """availableNow run into a parquet file sink (file sinks support
    checkpoint recovery; memory sinks don't)."""
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (
        op(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _write(spark, src_dir, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src_dir)


def test_streaming_dedup_first_seen_wins_across_batches(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    op = lambda s: streaming_dedup(s.groupBy("fingerprint"), SCHEMA)  # noqa: E731

    out = str(tmp_path / "out")
    # batch 1: fp 'a' twice (ids 1,2), fp 'b' once
    _write(spark, src, [("a", 1), ("a", 2), ("b", 3)])
    _run(spark, src, ckpt, out, op)
    got = {
        (r["fingerprint"], r["doc_id"])
        for r in spark.read.parquet(out).collect()
    }
    assert {fp for fp, _ in got} == {"a", "b"}
    assert len(got) == 2

    # batch 2 (state restored from checkpoint): 'a' again + new 'c'
    _write(spark, src, [("a", 9), ("c", 4)])
    _run(spark, src, ckpt, out, op)
    got2 = {
        (r["fingerprint"], r["doc_id"])
        for r in spark.read.parquet(out).collect()
    } - got
    assert got2 == {("c", 4)}  # 'a' stays deduped across the restart


def test_streaming_running_counts_accumulate(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    op = lambda s: streaming_running_counts(  # noqa: E731
        s.groupBy("fingerprint"), "fingerprint"
    )

    out = str(tmp_path / "out")
    _write(spark, src, [("a", 1), ("a", 2), ("b", 3)])
    _run(spark, src, ckpt, out, op)
    rows1 = [(r["fingerprint"], r["total"]) for r in spark.read.parquet(out).collect()]
    assert dict(rows1) == {"a": 2, "b": 1}

    _write(spark, src, [("a", 9), ("c", 4)])
    _run(spark, src, ckpt, out, op)
    rows_all = [(r["fingerprint"], r["total"]) for r in spark.read.parquet(out).collect()]
    got2 = dict(set(rows_all) - set(rows1))
    assert got2 == {"a": 3, "c": 1}  # 'a' resumed at 2 from state
