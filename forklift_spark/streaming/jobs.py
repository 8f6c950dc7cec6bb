"""Streaming jobs: incremental sync, watermark windows, session windows.

Scale notes: state size is the thing to bound. Watermarks cap window
state; the upsert sink processes one micro-batch at a time (the batch
writer's anti-join plan, so a failed batch is retried idempotently —
foreachBatch gives at-least-once, upsert-by-pk makes it effectively
exactly-once on the table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_incremental_sync(
    spark: SparkSession,
    source_path: str,
    dest_writer,
    dest_table: str,
    schema,
    primary_key: str = "id",
    matcher: str = "updated_at",
    watermark_delay: str = "1 hour",
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Continuous incremental_pipe: stream new files from source_path,
    watermark on the matcher column (late rows beyond the delay are
    dropped — the reference's `WHERE matcher > hwm` semantics,
    `patterns/mysql_patterns.rb:95`), upsert each micro-batch by pk.
    """

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dest_writer.write(batch_df, dest_table, mode="upsert", primary_key=primary_key)

    stream = (
        spark.readStream.schema(schema)
        .parquet(source_path)
        .withWatermark(matcher, watermark_delay)
    )
    writer = stream.writeStream.foreachBatch(merge).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich an event stream with a dimension
    table. The static side is broadcast per micro-batch (re-read each
    batch, so slowly-changing dims pick up updates); no state store is
    involved — the streaming analog of the broadcast dim join every
    batch query here uses."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), key, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "1 hour",
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: match right events to left
    events on ``key`` when the right event lands within ``within`` AFTER
    the left event (click→purchase attribution). Both sides carry
    watermarks + the time-bound condition, so the state store evicts
    rows once they can no longer match — bounded state on an infinite
    stream (without the bound, stream-stream join state grows forever).
    """
    from pyspark.sql import functions as F

    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}")
        )
    )
    return l.join(r, cond, "inner")


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window aggregation (same expressions as the
    batch q_window_tumbling). Works on a readStream or batch frame.

    The value sum aggregates in DECIMAL and casts back to double — a
    raw double sum's result depends on state-merge order, which would
    break exact stream==batch parity (and the oracle check on the
    stream-executed catalog entry)."""
    from forklift_spark.functions.exact import MONEY, dec

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value", MONEY)).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("wstart"), key_col, "n", "total_value")
    )


def sessionized(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """session_window-based sessionization — the managed-state streaming
    form of the batch q_sessionize (lag+cumsum)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sw"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
