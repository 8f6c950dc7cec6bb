"""Time-series / event-stream queries over the events table.

The reference's closest analog is HWM incremental sync (SURVEY §2.4 maps
it to watermark semantics); these queries add the windowed/stateful
operators a streaming-ready engine needs, each as a *batch* plan with an
oracle. The streaming variants (readStream + watermark) reuse the same
expressions — see forklift_spark/streaming/.

Scale notes: tumbling windows and sessionization shuffle once on the
grouping key; the as-of join is the union+running-last trick (sort within
user partitions, no cross join, no pandas); the range join bounds its
explosion with an equi-key on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from forklift_spark import tables
from forklift_spark.functions.exact import MONEY, dec
from forklift_spark.queries import query

# --------------------------------------------------------------------------
# q_window_tumbling — 1-hour tumbling windows per event_type
# (F.window == epoch-aligned time_bucket).
# --------------------------------------------------------------------------
TUMBLING_ORACLE = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@query("q_window_tumbling", TUMBLING_ORACLE)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value", MONEY)).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "total_value")
    )


# --------------------------------------------------------------------------
# q_sessionize — 30-minute-gap sessions per user: lag + cumulative
# session counter, then per-user session stats. The batch equivalent of
# streaming session_window(ts, '30 minutes').
# --------------------------------------------------------------------------
SESSION_ORACLE = """
WITH g AS (
  SELECT user_id, ts, event_id,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
              OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > 1800000000
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
    THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id, ts,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT user_id, CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM s GROUP BY user_id
"""


@query("q_sessionize", SESSION_ORACLE)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # full-microsecond gap: cast-to-long FLOORS to seconds while the
    # oracle compared full-precision intervals, so a boundary gap like
    # 1800.8s split sessions in one engine only (measured trap; every
    # other query here already floors/keeps precision on BOTH sides)
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    # the cumsum window carries the SAME event_id tiebreak as the marker
    # window: on (user, ts) ties the engines may order differently and a
    # tie-ordered cumsum would invent or merge sessions nondeterministically
    wc = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sess = marked.withColumn("session_id", F.sum("new_session").over(wc))
    return sess.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# q_asof_join — for each purchase, the most recent click of the same
# user at-or-before its timestamp. Spark: union-both-sides + running
# last_value(ignorenulls) over (user, ts) — scalable as-of (one shuffle
# on user_id, no pandas merge_asof, no cross join). Oracle: correlated
# top-1 subquery.
# --------------------------------------------------------------------------
ASOF_ORACLE = """
SELECT p.event_id, p.user_id, p.ts,
  (SELECT c.event_id FROM events c
   WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
FROM events p WHERE p.event_type = 'purchase'
"""


@query("q_asof_join", ASOF_ORACLE)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_left"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        "event_id",
        F.lit(1).alias("is_left"),
    )
    # same-instant click sorts before the purchase (is_left 0 < 1) so
    # `<=` semantics hold; click_id in the sort makes ties deterministic.
    u = clicks.unionByName(purchases)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_left", "click_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        u.withColumn("last_click", F.last("click_id", ignorenulls=True).over(w))
        .filter(F.col("is_left") == 1)
        .select(
            "event_id", "user_id", "ts", F.col("last_click").alias("click_id")
        )
    )


# --------------------------------------------------------------------------
# q_range_join — for each error event, clicks of the same user in the
# preceding hour, executed as a BINNED range join (operators/skew.py):
# the window explodes to its two covered hour-bins, clicks compute one
# bin scan-side, and the join is a plain (user, bin) equi-join with the
# exact [lo, hi) predicate re-applied — per-key quadratic behavior of a
# raw inequality join never materializes. Unmatched errors re-enter via
# a left join-back so the count-zero semantics match the oracle.
# --------------------------------------------------------------------------
RANGE_ORACLE = """
SELECT e.event_id, COUNT(c.event_id) AS clicks_before
FROM events e
LEFT JOIN events c
  ON c.user_id = e.user_id AND c.event_type = 'click'
  AND c.ts >= e.ts - INTERVAL '1 hour' AND c.ts < e.ts
WHERE e.event_type = 'error'
GROUP BY e.event_id
"""


@query("q_range_join", RANGE_ORACLE)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.operators.skew import binned_range_join

    ev = tables.load(spark, sf_dir, "events")
    # microsecond timeline: unix_timestamp() FLOORS to seconds, which
    # would both admit clicks a hair older than 1h and drop same-second
    # clicks the full-precision oracle counts (measured trap); the bin
    # operator is unit-agnostic, so bins are 1h of MICROseconds
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id",
        (F.unix_micros("ts") - 3600 * 1_000_000).alias("lo"),
        F.unix_micros("ts").alias("hi"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("cts"),
        F.col("event_id").alias("cid"),
    )
    matched = binned_range_join(
        errors, clicks, keys=["user_id"], right_ts="cts",
        lo="lo", hi="hi", bin_seconds=3600 * 1_000_000,
    )
    counts = matched.groupBy("event_id").agg(F.count("cid").alias("n"))
    return (
        errors.select("event_id")
        .join(counts, "event_id", "left")
        .select(
            "event_id",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("clicks_before"),
        )
    )


# --------------------------------------------------------------------------
# q_event_funnel — sequential funnel (windowFunnel semantics): per user,
# does an INCREASING view -> click -> purchase subsequence exist? The
# naive all-global-minimums comparison is wrong-by-intent: a user with
# click@t1 < view@t2 < click@t3 < purchase@t4 DID convert via (t2,t3,t4)
# but first_click < first_view flags them false. Correct recurrence:
# first view, then the earliest click AFTER it, then the earliest
# purchase after THAT — three user-keyed aggregations (each a single
# shuffle with map-side partial agg; no self-join explosion, no window).
# --------------------------------------------------------------------------
FUNNEL_ORACLE = """
WITH fv AS (
  SELECT user_id, min(ts) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
), fc AS (
  SELECT e.user_id, min(e.ts) AS first_click
  FROM events e JOIN fv ON fv.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > fv.first_view
  GROUP BY e.user_id
), fp AS (
  SELECT e.user_id, min(e.ts) AS first_purchase
  FROM events e JOIN fc ON fc.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > fc.first_click
  GROUP BY e.user_id
), users AS (
  SELECT DISTINCT user_id FROM events
)
SELECT u.user_id, fv.first_view, fc.first_click, fp.first_purchase,
  (fp.first_purchase IS NOT NULL) AS converted
FROM users u
LEFT JOIN fv USING (user_id)
LEFT JOIN fc USING (user_id)
LEFT JOIN fp USING (user_id)
"""


@query("q_event_funnel", FUNNEL_ORACLE)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fc = (
        ev.filter(F.col("event_type") == "click")
        .join(fv, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .filter(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    per_user = (
        ev.select("user_id").distinct()
        .join(fv, "user_id", "left")
        .join(fc, "user_id", "left")
        .join(fp, "user_id", "left")
    )
    # the recurrence guarantees first_view < first_click < first_purchase
    # whenever the chain completes, so conversion is just the last link
    converted = F.col("first_purchase").isNotNull()
    return per_user.select(
        "user_id", "first_view", "first_click", "first_purchase",
        converted.alias("converted"),
    )


# --------------------------------------------------------------------------
# q_trailing_range_window — RANGE frame keyed on event time (trailing
# 7 days per customer), distinct from the ROWS frames elsewhere. The
# frame bound is epoch-seconds arithmetic so both engines agree exactly.
# --------------------------------------------------------------------------
TRAILING_ORACLE = """
SELECT o_orderkey, o_custkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
    OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
          RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS trailing_7d,
  count(*)
    OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
          RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW)
    AS n_7d
FROM orders
"""


@query("q_trailing_range_window", TRAILING_ORACLE)
def q_trailing_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from forklift_spark.functions.exact import MONEY, dec

    orders = tables.load(spark, sf_dir, "orders").withColumn(
        "__epoch", F.unix_timestamp("o_orderdate")
    )
    # 7 CALENDAR days at date grain = current date + 6 prior (518400s);
    # an inclusive 604800 PRECEDING frame covers eight dates (the
    # conventional rolling-7D window, e.g. pandas closed='right', is
    # (t-7d, t])
    w = (
        W.partitionBy("o_custkey")
        .orderBy("__epoch")
        .rangeBetween(-518400, W.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice", MONEY)).over(w).cast("double").alias("trailing_7d"),
        F.count(F.lit(1)).over(w).alias("n_7d"),
    )


# --------------------------------------------------------------------------
# q_stream_windowed_counts — the windowed aggregation EXECUTED AS A
# STREAM (availableNow over staged files -> memory sink), oracle-checked
# against the SAME batch SQL as q_window_tumbling: complete output mode
# emits every window at termination (append-mode watermarking would hold
# back the trailing ones), and the stream's sum is decimal-exact, so the
# streaming execution must reproduce the batch result bit-for-bit.
# --------------------------------------------------------------------------
@query("q_stream_windowed_counts", TUMBLING_ORACLE)
def q_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    from forklift_spark.streaming.jobs import windowed_counts

    events = tables.load(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="fk_stream_src_")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    sink = f"stream_win_{uuid.uuid4().hex[:8]}"
    from forklift_spark.streaming.jobs import (
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    with scoped_shuffle_partitions(
        spark, stream_state_partitions(spark, src)
    ):
        q = (
            windowed_counts(stream)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), \
            "stream did not finish; sink would be partial"
    return spark.table(sink)


# --------------------------------------------------------------------------
# q_stream_stateful_counts — custom keyed state via applyInPandasWithState
# EXECUTED ACROSS REAL MICRO-BATCH BOUNDARIES: the source is staged as 8
# parquet files read 2-per-trigger (availableNow honors
# maxFilesPerTrigger as batch boundaries), so per-key state genuinely
# persists and accumulates across ~4 batches — the cross-batch property
# a single-batch availableNow run would not exercise. Each batch emits
# the cumulative per-key total so far (append mode); the final total per
# key is MAX(total), which must equal the batch COUNT(*) regardless of
# file/batch arrival order — counts are order-independent, making this
# custom stateful operator oracle-checkable.
# --------------------------------------------------------------------------
STATEFUL_COUNT_ORACLE = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS total
FROM events GROUP BY event_type
"""


@query("q_stream_stateful_counts", STATEFUL_COUNT_ORACLE)
def q_stream_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    from forklift_spark.streaming.stateful import streaming_running_counts

    events = tables.load(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="fk_stream_state_")
    events.repartition(8).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    sink = f"stream_state_{uuid.uuid4().hex[:8]}"
    from forklift_spark.streaming.jobs import (
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    with scoped_shuffle_partitions(
        spark, stream_state_partitions(spark, src)
    ):
        q = (
            streaming_running_counts(
                stream.groupBy("event_type"), "event_type"
            )
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(sink)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), \
            "stream did not finish; sink would be partial"
    return (
        spark.table(sink)
        .groupBy("event_type")
        .agg(F.max("total").alias("total"))
    )


# --------------------------------------------------------------------------
# q_stream_stream_join — watermarked stream-stream inner join EXECUTED IN
# THE STREAMING ENGINE (click->purchase attribution within 1 hour, same
# user). Inner-join output is emitted on match (the watermark bounds
# state retention, not result emission), so an availableNow run over the
# staged source yields exactly the batch join — oracle-checkable. The
# batch twin of this plan is a plain time-bounded self-join; what the
# streaming execution adds at scale is bounded state: rows evict once
# the watermark passes their match window, so the join runs on infinite
# streams in finite memory.
# --------------------------------------------------------------------------
SS_JOIN_ORACLE = """
SELECT l.event_id AS click_id, r.event_id AS purchase_id,
       l.user_id AS user_id, l.ts AS click_ts, r.ts AS purchase_ts
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
WHERE l.event_type = 'click' AND r.event_type = 'purchase'
"""


@query("q_stream_stream_join", SS_JOIN_ORACLE)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    from forklift_spark.streaming.jobs import stream_stream_join

    events = tables.load(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="fk_stream_ssj_")
    events.write.mode("overwrite").parquet(src)

    def side(event_type: str) -> DataFrame:
        return (
            spark.readStream.schema(events.schema)
            .parquet(src)
            .filter(F.col("event_type") == event_type)
            .select("event_id", "user_id", "ts")
        )

    joined = stream_stream_join(
        side("click"), side("purchase"), key="user_id", within="1 hour"
    ).select(
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("purchase_id"),
        F.col("l.user_id").alias("user_id"),
        F.col("l.ts").alias("click_ts"),
        F.col("r.ts").alias("purchase_ts"),
    )
    sink = f"stream_ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
    )
    from forklift_spark.streaming.jobs import (
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    with scoped_shuffle_partitions(
        spark, stream_state_partitions(spark, src)
    ):
        qq = q.start()
        assert qq.awaitTermination(600), \
            "stream did not finish; sink would be partial"
    return spark.table(sink)


# --------------------------------------------------------------------------
# q_stream_incremental_sync — the reference's incremental_pipe run as a
# CONTINUOUS stream (streaming/jobs.py stream_incremental_sync): the
# source backlog arrives 2-files-per-micro-batch and each batch upserts
# into a parquet warehouse by pk through the real writer (anti-join +
# atomic staging swap per batch). The destination is pre-seeded with
# STALE versions (value = -1) of part of the data; the stream must
# replace every stale row and insert everything else, so the final
# warehouse state equals the source exactly — an append-only sink or a
# broken pk-merge would leave -1 rows or duplicates. Upsert is
# last-writer-wins per pk and every pk arrives exactly once, so the
# result is independent of batch/file arrival order.
# --------------------------------------------------------------------------
STREAM_SYNC_ORACLE = """
SELECT event_id, ts, value FROM events WHERE event_id < 3000
"""


@query("q_stream_incremental_sync", STREAM_SYNC_ORACLE)
def q_stream_incremental_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from forklift_spark.streaming.jobs import stream_incremental_sync
    from forklift_spark.writer import ParquetTableWriter

    ev = (
        tables.load(spark, sf_dir, "events")
        .filter(F.col("event_id") < 3000)
        .select("event_id", "ts", "value")
    )
    root = tempfile.mkdtemp(prefix="fk_stream_sync_")
    src = os.path.join(root, "src")
    ev.repartition(6).write.mode("overwrite").parquet(src)

    writer = ParquetTableWriter(spark, os.path.join(root, "wh"))
    stale = ev.filter(F.col("event_id") % 2 == 0).withColumn(
        "value", F.lit(-1.0)
    )
    writer.write(stale, "events_sync", mode="overwrite")

    q = stream_incremental_sync(
        spark,
        src,
        writer,
        "events_sync",
        ev.schema,
        primary_key="event_id",
        matcher="ts",
        checkpoint_dir=os.path.join(root, "ckpt"),
        max_files_per_trigger=2,
    )
    assert q.awaitTermination(600), "stream did not finish; sink would be partial"
    return writer.read("events_sync")


# --------------------------------------------------------------------------
# q_gap_fill — resample to an hourly grid per user and forward-fill
# (LOCF) missing buckets. The grid is generated with sequence()+explode
# per user (no driver-side calendar), the fill is last(ignorenulls)
# over an ordered user partition — one shuffle on user_id; at 100 TB the
# grid explode is proportional to the output, not the input.
# --------------------------------------------------------------------------
GAP_FILL_ORACLE = """
WITH agg AS (
  SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS b,
         SUM(CAST(value AS DECIMAL(14,2))) AS v
  FROM events GROUP BY 1, 2
), rng AS (
  SELECT user_id, min(b) AS lo, max(b) AS hi FROM agg GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(range(lo, hi + 1)) AS b FROM rng
), j AS (
  SELECT g.user_id, g.b, a.v FROM grid g LEFT JOIN agg a USING (user_id, b)
)
SELECT user_id, make_timestamp(b * 3600 * 1000000) AS bstart,
  v IS NULL AS filled,
  CAST(last_value(v IGNORE NULLS) OVER (
    PARTITION BY user_id ORDER BY b ROWS UNBOUNDED PRECEDING
  ) AS DOUBLE) AS value_sum
FROM j
"""


@query("q_gap_fill", GAP_FILL_ORACLE)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    agg = ev.groupBy(
        "user_id", (F.unix_timestamp("ts") / 3600).cast("long").alias("b")
    ).agg(F.sum(dec("value", MONEY)).alias("v"))
    rng = agg.groupBy("user_id").agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
    grid = rng.select("user_id", F.explode(F.sequence("lo", "hi")).alias("b"))
    j = grid.join(agg, ["user_id", "b"], "left")
    w = W.partitionBy("user_id").orderBy("b").rowsBetween(W.unboundedPreceding, 0)
    return j.select(
        "user_id",
        F.timestamp_seconds(F.col("b") * 3600).alias("bstart"),
        F.col("v").isNull().alias("filled"),
        F.last("v", ignorenulls=True).over(w).cast("double").alias("value_sum"),
    )


# --------------------------------------------------------------------------
# q_hll_user_rollup — daily distinct users materialized as mergeable HLL
# sketches, rolled up to (event_type) totals by sketch union. Approximate
# by design -> rows-only check; the error bound (<5% vs exact) and
# merge-consistency (union of dailies ~= direct global sketch) are pinned
# in tests/test_layout.py.
# --------------------------------------------------------------------------
@query("q_hll_user_rollup")
def q_hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.operators.layout import distinct_sketch_rollup

    ev = tables.load(spark, sf_dir, "events").withColumn(
        "day", F.to_date(F.date_trunc("day", "ts"))
    )
    _fine, coarse = distinct_sketch_rollup(
        ev, ["event_type", "day"], ["event_type"], "user_id"
    )
    return coarse


# --------------------------------------------------------------------------
# q_ohlc_bars — resample each event_type to 6-hour OHLC bars: open/close
# are the first/last reading in the bucket (row_number over (ts, event_id)
# — ties deterministic), high/low/volume are plain extremes/sums. One
# window + one aggregation, both partitioned by (type, bucket): bounded
# state, no global order. The financial-bar shape every time-series
# store ships (e.g. TimescaleDB ohlc / candlestick_agg).
# --------------------------------------------------------------------------
OHLC_ORACLE = """
WITH seq AS (
  SELECT event_type,
    time_bucket(INTERVAL '6 hours', ts) AS bar,
    CAST(value AS DECIMAL(12,2)) AS v,
    row_number() OVER (PARTITION BY event_type, time_bucket(INTERVAL '6 hours', ts)
                       ORDER BY ts, event_id) AS rn_a,
    row_number() OVER (PARTITION BY event_type, time_bucket(INTERVAL '6 hours', ts)
                       ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, bar,
  CAST(MAX(CASE WHEN rn_a = 1 THEN v END) AS DOUBLE) AS open,
  CAST(MAX(v) AS DOUBLE) AS high,
  CAST(MIN(v) AS DOUBLE) AS low,
  CAST(MAX(CASE WHEN rn_d = 1 THEN v END) AS DOUBLE) AS close,
  COUNT(*) AS n,
  CAST(SUM(v) AS DOUBLE) AS volume
FROM seq
GROUP BY event_type, bar
"""


@query("q_ohlc_bars", OHLC_ORACLE)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    v = dec("value", "decimal(12,2)")
    seq = ev.select(
        "event_type",
        F.window("ts", "6 hours").start.alias("bar"),
        v.alias("v"),
        "ts",
        "event_id",
    )
    wa = W.partitionBy("event_type", "bar").orderBy("ts", "event_id")
    wd = W.partitionBy("event_type", "bar").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    seq = seq.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return seq.groupBy("event_type", "bar").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("v"))).cast("double").alias("open"),
        F.max("v").cast("double").alias("high"),
        F.min("v").cast("double").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("v"))).cast("double").alias("close"),
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("double").alias("volume"),
    )


# --------------------------------------------------------------------------
# q_asof_nearest — nearest-neighbor as-of: for each purchase, the click of
# the same user closest in time within ±30 min, in EITHER direction (the
# pandas merge_asof direction='nearest' semantics). Built from two
# running-extreme passes over the same user-partitioned union — backward
# (last click at-or-before) and forward (first click at-or-after) — then
# an arithmetic choice by absolute distance. Tie policy (identical in the
# oracle's ORDER BY): equal distance prefers the earlier (backward)
# click; equal timestamp prefers the largest event_id. One shuffle on
# user_id, no joins at all.
# --------------------------------------------------------------------------
ASOF_NEAREST_ORACLE = """
SELECT p.event_id, p.user_id, p.ts,
  (SELECT c.event_id FROM events c
   WHERE c.user_id = p.user_id AND c.event_type = 'click'
     AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 1800 * 1000000
   ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)), c.ts, c.event_id DESC
   LIMIT 1) AS click_id
FROM events p WHERE p.event_type = 'purchase'
"""


@query("q_asof_nearest", ASOF_NEAREST_ORACLE)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_left"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        "event_id",
        F.lit(1).alias("is_left"),
    )
    u = clicks.unionByName(purchases).withColumn("t_us", F.unix_micros("ts"))
    # backward: among clicks sorted before the purchase, the running last —
    # (ts asc, is_left, click_id asc) puts the largest id of a same-ts
    # group nearest the purchase row, matching the oracle's id DESC pick
    wb = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_left", "click_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    # forward: clicks sorted after, first upcoming — click_id DESC within a
    # same-ts group for the same tie policy; is_left DESC keeps same-
    # instant clicks (is_left=0) AFTER the purchase row in this ordering
    # so a zero-distance click is seen by the backward pass, not twice
    wf = (
        W.partitionBy("user_id")
        .orderBy("ts", F.col("is_left").desc(), F.col("click_id").desc())
        .rowsBetween(0, W.unboundedFollowing)
    )
    click_t = F.when(F.col("is_left") == 0, F.col("t_us"))
    click_i = F.when(F.col("is_left") == 0, F.col("click_id"))
    ann = (
        u.withColumn("bt", F.last(click_t, ignorenulls=True).over(wb))
        .withColumn("bi", F.last(click_i, ignorenulls=True).over(wb))
        .withColumn("ft", F.first(click_t, ignorenulls=True).over(wf))
        .withColumn("fi", F.first(click_i, ignorenulls=True).over(wf))
        .filter(F.col("is_left") == 1)
    )
    tol = 1800 * 1_000_000
    db = F.col("t_us") - F.col("bt")  # >= 0
    df_ = F.col("ft") - F.col("t_us")  # >= 0
    b_ok = F.col("bt").isNotNull() & (db <= tol)
    f_ok = F.col("ft").isNotNull() & (df_ <= tol)
    chosen = (
        F.when(b_ok & (~f_ok | (db <= df_)), F.col("bi"))
        .when(f_ok, F.col("fi"))
        .otherwise(F.lit(None))
    )
    return ann.select(
        "event_id", "user_id", "ts", chosen.alias("click_id")
    )


# --------------------------------------------------------------------------
# q_window_hopping — sliding (hopping) windows: 1-hour windows every 30
# minutes, so each event contributes to two windows. Spark's F.window
# with a slide duration == the union of slide-offset tumbling bucketings
# (how the oracle states it). Completes the window-type family next to
# tumbling (q_window_tumbling) and session (q_sessionize).
# --------------------------------------------------------------------------
HOPPING_ORACLE = """
SELECT wstart, event_type, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type, value
  FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '1 hour', ts - INTERVAL '30 minutes')
           + INTERVAL '30 minutes' AS wstart,
         event_type, value
  FROM events
) z
GROUP BY wstart, event_type
"""


@query("q_window_hopping", HOPPING_ORACLE)
def q_window_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value", MONEY)).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "total_value")
    )


# --------------------------------------------------------------------------
# q_stream_sessionize — session windows EXECUTED IN THE STREAMING ENGINE
# (session_window managed state, availableNow -> memory sink, complete
# mode) oracle-checked against the batch gaps-and-islands SQL. Session
# semantics follow session_window: a session's window is [first_ts,
# last_ts + gap), and an event arriving EXACTLY gap after the previous
# one starts a NEW session (half-open window overlap), hence the >= in
# the oracle's break condition (the batch q_sessionize keeps lag-based
# > semantics; both are deterministic, the pair documents the boundary
# difference).
# --------------------------------------------------------------------------
STREAM_SESSION_ORACLE = """
WITH m AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), g AS (
  SELECT user_id, ts,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id,
  min(ts) AS session_start,
  max(ts) + INTERVAL 30 MINUTE AS session_end,
  CAST(count(*) AS BIGINT) AS n_events
FROM g GROUP BY user_id, sid
"""


@query("q_stream_sessionize", STREAM_SESSION_ORACLE)
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    from forklift_spark.streaming.jobs import sessionized

    events = tables.load(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="fk_stream_sess_")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    sink = f"stream_sess_{uuid.uuid4().hex[:8]}"
    from forklift_spark.streaming.jobs import (
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    with scoped_shuffle_partitions(
        spark, stream_state_partitions(spark, src)
    ):
        q = (
            sessionized(stream, gap="30 minutes")
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), \
            "stream did not finish; sink would be partial"
    return spark.table(sink)


# --------------------------------------------------------------------------
# q_interval_merge — gaps-and-islands interval union: each event opens a
# deterministic interval [ts, ts + 10..40 min); overlapping or touching
# intervals per user merge into islands, and the per-user rollup reports
# island count, total covered time, and the longest island. The classic
# availability/coverage computation (uptime windows, session stitching,
# sensor validity ranges). A new island starts where the interval's
# start exceeds the running max of every PRECEDING end — one window
# pass, partitioned by user: no self-join, and at 100 TB the only
# shuffle is the per-user repartition the window needs. All arithmetic
# in integer epoch microseconds; ties broken by event_id so the prefix
# max is engine-deterministic.
# --------------------------------------------------------------------------
INTERVAL_MERGE_ORACLE = """
WITH iv AS (
  SELECT user_id, event_id,
    epoch_us(ts) AS s,
    epoch_us(ts) + (600 + (event_id % 7) * 300) * 1000000 AS e
  FROM events
), flagged AS (
  SELECT *,
    CASE WHEN max(e) OVER (
        PARTITION BY user_id ORDER BY s, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      ) >= s THEN 0 ELSE 1 END AS new_island
  FROM iv
), islands AS (
  SELECT *, sum(new_island) OVER (
      PARTITION BY user_id ORDER BY s, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS island_id
  FROM flagged
), merged AS (
  SELECT user_id, island_id, min(s) AS s, max(e) AS e,
         count(*) AS n_events
  FROM islands GROUP BY user_id, island_id
)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_intervals,
  CAST(sum(e - s) AS BIGINT) AS covered_us,
  CAST(max(e - s) AS BIGINT) AS longest_us,
  CAST(sum(n_events) AS BIGINT) AS n_events
FROM merged GROUP BY user_id
"""


@query("q_interval_merge", INTERVAL_MERGE_ORACLE)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = tables.load(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + (F.lit(600) + (F.col("event_id") % 7) * 300) * 1_000_000
        ).alias("e"),
    )
    order = W.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_e = F.max("e").over(order.rowsBetween(W.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island", F.when(prev_max_e >= F.col("s"), 0).otherwise(1)
    )
    islands = flagged.withColumn(
        "island_id",
        F.sum("new_island").over(order.rowsBetween(W.unboundedPreceding, 0)),
    )
    merged = islands.groupBy("user_id", "island_id").agg(
        F.min("s").alias("s"), F.max("e").alias("e"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum(F.col("e") - F.col("s")).cast("bigint").alias("covered_us"),
        F.max(F.col("e") - F.col("s")).cast("bigint").alias("longest_us"),
        F.sum("n_ev").cast("bigint").alias("n_events"),
    )


# --------------------------------------------------------------------------
# q_decayed_engagement — recency-weighted activity scoring with an EXACT
# half-life: each event contributes floor(value*1000) milli-units
# weighted by 2^(16 - min(days_old, 16)) — i.e. halving per day of age,
# saturating at 16 days — so the per-user score is a plain BIGINT sum:
# order-independent at any parallelism and replayable by the oracle
# (double pow(0.5, d) sums would be partition-order roulette). days_old
# is measured against the corpus max date, a 1-row broadcast scalar.
# The normalized double score divides the identical integer once at the
# end. The standard "recent activity ranks higher" feature of feed
# ranking / churn models, in the engine-exact discipline.
# --------------------------------------------------------------------------
_DECAY_CAP = 16

DECAYED_ENGAGEMENT_ORACLE = f"""
WITH mx AS (SELECT max(CAST(ts AS DATE)) AS maxd FROM events),
w AS (
  SELECT user_id,
    CAST(FLOOR(value * 1000) AS BIGINT)
      * (CAST(1 AS BIGINT) << ({_DECAY_CAP} - LEAST(
          date_diff('day', CAST(ts AS DATE), mx.maxd), {_DECAY_CAP})))
      AS wv
  FROM events, mx
)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(wv) AS BIGINT) AS score_scaled,
  CAST(sum(wv) AS DOUBLE) / {(1 << _DECAY_CAP) * 1000}.0 AS score
FROM w GROUP BY user_id
"""


@query("q_decayed_engagement", DECAYED_ENGAGEMENT_ORACLE)
def q_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.to_date("ts")).alias("maxd"))
    days = F.datediff(F.col("maxd"), F.to_date("ts"))
    # 2^(cap - d) via double pow: exact for exponents 0..16, cast exact
    wv = F.floor(F.col("value") * 1000).cast("bigint") * F.pow(
        F.lit(2.0),
        (F.lit(_DECAY_CAP) - F.least(days, F.lit(_DECAY_CAP))).cast("double"),
    ).cast("bigint")
    return (
        ev.crossJoin(F.broadcast(mx))  # 1-row scalar max-date frame
        .select("user_id", wv.alias("wv"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("wv").cast("bigint").alias("score_scaled"),
            (F.sum("wv").cast("double") / float((1 << _DECAY_CAP) * 1000)).alias(
                "score"
            ),
        )
    )


# --------------------------------------------------------------------------
# q_stream_late_audit — WATERMARK LATE-DATA ACCOUNTING executed in the
# streaming engine: a mostly-time-ordered stream (one week per
# micro-batch, files read oldest-first by mtime) carries stragglers
# that arrive two batches after their event week; a 3-day watermark on
# 1-day tumbling windows drops the too-late ones and withholds the
# trailing windows in append mode. The oracle replays Spark's MEASURED
# semantics end to end: the watermark EFFECTIVE while batch i is
# filtered derives from data through batch i-2 (global-watermark
# propagation lags one trigger — pinned empirically: the one-batch-lag
# model mis-drops 49 rows, the two-batch model matches the sink
# row-for-row), a row survives while its window end exceeds that
# watermark, and only windows whose end <= final watermark are emitted.
# The '__unaccounted__' row reconciles totals (dropped late rows +
# withheld trailing windows) so nothing disappears silently. No fixture
# row lands exactly on a window-end == watermark boundary (watermarks
# inherit microsecond offsets, window ends are midnight), so the <-vs-<=
# boundary is not load-bearing here.
# --------------------------------------------------------------------------
_LATE_DELAY_DAYS = 3
_LATE_BATCHES = 6

STREAM_LATE_ORACLE = f"""
WITH e AS (
  SELECT event_id, ts,
    CAST(floor(date_diff('day', TIMESTAMP '2024-01-01', ts) / 7) AS INT) AS w
  FROM events
), b AS (
  SELECT event_id, ts,
    CASE WHEN event_id % 97 = 0 AND w <= 3 THEN w + 2
         ELSE least(w, {_LATE_BATCHES - 1}) END AS batch
  FROM e
), mx AS (
  SELECT batch, max(ts) AS mts FROM b GROUP BY batch
), eff AS (
  SELECT b1.batch,
    (SELECT max(m.mts) FROM mx m WHERE m.batch <= b1.batch - 2)
      - INTERVAL {_LATE_DELAY_DAYS} DAY AS wm
  FROM (SELECT DISTINCT batch FROM b) b1
), fin AS (
  SELECT max(mts) - INTERVAL {_LATE_DELAY_DAYS} DAY AS fwm FROM mx
), acc AS (
  SELECT date_trunc('day', b.ts) AS day, count(*) AS n
  FROM b JOIN eff USING (batch)
  WHERE eff.wm IS NULL OR date_trunc('day', b.ts) + INTERVAL 1 DAY > eff.wm
  GROUP BY 1
), em AS (
  SELECT strftime(day, '%Y-%m-%d') AS day, CAST(n AS BIGINT) AS n_rows
  FROM acc, fin WHERE day + INTERVAL 1 DAY <= fin.fwm
)
SELECT day, n_rows FROM em
UNION ALL
SELECT '__unaccounted__',
  CAST((SELECT count(*) FROM events) - (SELECT sum(n_rows) FROM em) AS BIGINT)
"""


@query("q_stream_late_audit", STREAM_LATE_ORACLE)
def q_stream_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    ev = tables.load(spark, sf_dir, "events").select("event_id", "ts")
    ev = ev.withColumn(
        "w", F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7)
    ).withColumn(
        "batch",
        F.when(
            (F.col("event_id") % 97 == 0) & (F.col("w") <= 3), F.col("w") + 2
        )
        .otherwise(F.least(F.col("w"), F.lit(_LATE_BATCHES - 1)))
        .cast("int"),
    )
    # stage one file per micro-batch with INCREASING mtimes: the file
    # source processes oldest-first, so batch order (the thing watermark
    # evolution depends on) is deterministic. ONE partitioned write
    # stages all 6 batches (optimization r8, guide §1.2: the old
    # 6-iteration filter+coalesce(1) loop scanned events six times);
    # hash-repartition on batch puts each batch value in exactly one
    # task, so every batch dir holds exactly one file, and partitionBy
    # moves `batch` to the dir name leaving (event_id, ts) in the file —
    # the same per-file bytes the loop produced. Batch contents (and so
    # watermark evolution and results) are unchanged: aggregation and
    # max-ts-per-batch are row-order-insensitive.
    src = tempfile.mkdtemp(prefix="fk_stream_late_")
    t0 = 1_700_000_000
    staged = tempfile.mkdtemp(prefix="fk_stream_late_tmp_")
    (
        ev.select("event_id", "ts", "batch")
        .repartition("batch")
        .write.mode("overwrite")
        .partitionBy("batch")
        .parquet(staged)
    )
    for i in range(_LATE_BATCHES):
        bdir = os.path.join(staged, f"batch={i}")
        part = next(f for f in os.listdir(bdir) if f.endswith(".parquet"))
        dst = os.path.join(src, f"batch{i}.parquet")
        os.rename(os.path.join(bdir, part), dst)
        os.utime(dst, (t0 + i * 10, t0 + i * 10))
    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", f"{_LATE_DELAY_DAYS} days")
        .groupBy(F.window("ts", "1 day").alias("win"))
        .count()
    )
    sink = f"stream_late_{uuid.uuid4().hex[:8]}"
    from forklift_spark.streaming.jobs import (
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    # state partitions derived from the staged input size (guide §2):
    # every micro-batch pays one task per state partition, and this
    # query runs 6 of them
    with scoped_shuffle_partitions(
        spark, stream_state_partitions(spark, src)
    ):
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(sink)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), \
            "stream did not finish; sink would be partial"
    emitted = spark.table(sink).select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day"),
        F.col("count").cast("bigint").alias("n_rows"),
    ).localCheckpoint()
    total = ev.count()
    unacc = emitted.agg(
        (F.lit(total) - F.sum("n_rows")).cast("bigint").alias("n_rows")
    ).select(F.lit("__unaccounted__").alias("day"), "n_rows")
    return emitted.unionByName(unacc)


# --------------------------------------------------------------------------
# q_attribution — position-based (U-shaped) multi-touch attribution:
# every purchase credits the click/view touchpoints of the same user in
# the 7 days before it — 40% to the first touch, 40% to the last, 20%
# split across the middles (1 touch takes 100%, 2 split 50/50). All
# credit is INTEGER basis points: middles get 2000 div (n-2) bp each
# and the sub-bp remainder goes to the first touch (documented,
# deterministic — float shares would drift per engine), and attributed
# value is cents x bp (BIGINT), so every sum is order-independent.
# Ties in touch order break on event_id. Scale: the touch join is
# user-keyed (per-user activity windows bound the pair fan-out — the
# binned_range_join regime); the rollup is a tiny (channel, position)
# aggregate.
# --------------------------------------------------------------------------
def position_credit_bp():
    """U-shaped multi-touch credit in integer basis points over (pos, n)
    columns: 40/20/40 first/middles/last; 1 touch takes all, 2 split
    evenly, and the middle pool's integer-division remainder goes to
    the first touch — so credits per conversion sum to EXACTLY 10000 bp
    for every n (conservation is property-tested)."""
    mid_bp = F.expr("2000 div (n - 2)")
    return (
        F.when(F.col("n") == 1, 10000)
        .when(F.col("n") == 2, 5000)
        .when(F.col("pos") == 1, F.lit(6000) - mid_bp * (F.col("n") - 2))
        .when(F.col("pos") == F.col("n"), 4000)
        .otherwise(mid_bp)
    )


ATTRIBUTION_ORACLE = """
WITH conv AS (
  SELECT event_id AS pid, user_id, ts AS pts,
    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), touch AS (
  SELECT event_id AS tid, user_id, ts AS tts, event_type AS channel
  FROM events WHERE event_type IN ('click', 'view')
), pairs AS (
  SELECT c.pid, c.cents, t.tid, t.channel,
    row_number() OVER (PARTITION BY c.pid ORDER BY t.tts, t.tid) AS pos,
    count(*) OVER (PARTITION BY c.pid) AS n
  FROM conv c JOIN touch t
    ON t.user_id = c.user_id
   AND t.tts < c.pts AND t.tts >= c.pts - INTERVAL 7 DAY
), credit AS (
  SELECT pid, cents, tid, channel, n,
    CASE WHEN pos = 1 THEN 'first' WHEN pos = n THEN 'last' ELSE 'mid' END AS position,
    CASE
      WHEN n = 1 THEN 10000
      WHEN n = 2 THEN 5000
      WHEN pos = 1 THEN 4000 + 2000 - (2000 // (n - 2)) * (n - 2)
      WHEN pos = n THEN 4000
      ELSE 2000 // (n - 2)
    END AS bp
  FROM pairs
)
SELECT channel, position,
  CAST(count(*) AS BIGINT) AS n_touches,
  CAST(sum(bp) AS BIGINT) AS total_bp,
  CAST(sum(cents * bp) AS BIGINT) AS attributed_e4cents
FROM credit GROUP BY channel, position
"""


@query("q_attribution", ATTRIBUTION_ORACLE)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from forklift_spark.functions.exact import dec

    ev = tables.load(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("pts"),
        (dec("value", "decimal(12,2)") * 100).cast("bigint").alias("cents"),
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("tid"),
        F.col("user_id").alias("tu"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
    )
    pairs = conv.join(
        touch,
        (F.col("tu") == F.col("cu"))
        & (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 7 DAYS")),
    )
    w = W.partitionBy("pid")
    ranked = pairs.select(
        "pid", "cents", "tid", "channel",
        F.row_number().over(w.orderBy("tts", "tid")).alias("pos"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    credit = ranked.select(
        "cents", "channel",
        F.when(F.col("pos") == 1, "first")
        .when(F.col("pos") == F.col("n"), "last")
        .otherwise("mid")
        .alias("position"),
        position_credit_bp().alias("bp"),
    )
    return credit.groupBy("channel", "position").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.sum("bp").cast("bigint").alias("total_bp"),
        F.sum(F.col("cents") * F.col("bp")).cast("bigint").alias("attributed_e4cents"),
    )


# --------------------------------------------------------------------------
# q_ewma_smooth — exponentially weighted moving average over the daily
# mean value per event type (the forecast-smoothing / anomaly-baseline
# primitive). EWMA is a SEQUENTIAL recursion (e_d depends on e_{d-1}),
# which distributed SQL cannot window — here it runs as ONE JVM
# `aggregate` HOF fold over each type's sorted day array (types are few,
# days are bounded; the same bounded-fold contract as q_subword_encode),
# while the oracle replays the recursion with a recursive CTE — two
# different recursion mechanisms, one fixpoint. All state is INTEGER:
# daily mean = cents div count, e_d = (3·x_d·1000 + 7·e_{d-1}) div 10
# (alpha = 0.3 as an exact ratio, state in milli-cents) — double decay
# would accumulate engine-specific rounding over the chain.
# --------------------------------------------------------------------------
EWMA_ORACLE = """
WITH RECURSIVE d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) // count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), o AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM d
), r AS (
  SELECT event_type, day, x, rn, x * 1000 AS e FROM o WHERE rn = 1
  UNION ALL
  SELECT o.event_type, o.day, o.x, o.rn, (3 * o.x * 1000 + 7 * r.e) // 10
  FROM r JOIN o ON o.event_type = r.event_type AND o.rn = r.rn + 1
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
  x AS day_cents, CAST(e AS BIGINT) AS ewma_e3
FROM r
"""


@query("q_ewma_smooth", EWMA_ORACLE)
def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.functions.exact import dec

    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            (dec("value", "decimal(12,2)") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.expr("sum(cents) div count(*)").alias("x"))
    )
    arr = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("a")
    )
    folded = arr.select(
        "event_type",
        F.expr(
            """
            aggregate(
              slice(a, 2, greatest(size(a) - 1, 0)),
              array(struct(a[0].day AS day, a[0].x AS x, a[0].x * 1000L AS e)),
              (acc, v) -> concat(acc, array(struct(
                v.day AS day, v.x AS x,
                (3L * v.x * 1000L + 7L * element_at(acc, -1).e) div 10L AS e)))
            )
            """
        ).alias("f"),
    )
    out = folded.select("event_type", F.explode("f").alias("r"))
    return out.select(
        "event_type",
        F.col("r.day").alias("day"),
        F.col("r.x").cast("bigint").alias("day_cents"),
        F.col("r.e").cast("bigint").alias("ewma_e3"),
    )


# --------------------------------------------------------------------------
# q_sequence_pattern — CEP-style event-sequence pattern detection (the
# MATCH_RECOGNIZE use case): each user's time-ordered event types
# collapse to a symbol string (v/c/p/s/e by first letter), and a
# regular expression counts funnel occurrences — here one-or-more
# views, then up to three clicks, ending in a purchase
# ('v+c{0,3}p'). The regex is restricted to the Java/RE2 shared
# subset (the web-family discipline), so DuckDB replays the SAME
# pattern over the SAME collapsed strings — cross-engine certification
# of the sequence semantics. Order ties break on event_id. One window
# pass to order, one per-user fold; the symbol string is bounded by
# per-user activity.
# --------------------------------------------------------------------------
_SEQ_PATTERN = "v+c{0,3}p"

SEQ_PATTERN_ORACLE = f"""
WITH o AS (
  SELECT user_id, substr(event_type, 1, 1) AS sym, ts, event_id
  FROM events
), s AS (
  SELECT user_id, string_agg(sym, '' ORDER BY ts, event_id) AS seq
  FROM o GROUP BY user_id
)
SELECT user_id,
  CAST(length(seq) AS BIGINT) AS n_events,
  CAST(len(regexp_extract_all(seq, '{_SEQ_PATTERN}')) AS BIGINT) AS n_matches,
  length(regexp_extract(seq, '{_SEQ_PATTERN}')) > 0 AS converted
FROM s
"""


@query("q_sequence_pattern", SEQ_PATTERN_ORACLE)
def q_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    o = ev.select(
        "user_id",
        F.substring("event_type", 1, 1).alias("sym"),
        "ts",
        "event_id",
    )
    s = o.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "sym"))),
                lambda x: x["sym"],
            ),
            "",
        ).alias("seq")
    )
    return s.select(
        "user_id",
        F.length("seq").cast("bigint").alias("n_events"),
        F.size(F.expr(f"regexp_extract_all(seq, '{_SEQ_PATTERN}', 0)"))
        .cast("bigint")
        .alias("n_matches"),
        (F.length(F.regexp_extract("seq", _SEQ_PATTERN, 0)) > 0).alias("converted"),
    )


# --------------------------------------------------------------------------
# q_stream_enrich — STREAM-TO-STATIC enrichment join executed in the
# streaming engine: the events stream (staged files, availableNow)
# joins a static dimension (the deterministic user->cohort frame) per
# micro-batch — the standard streaming-enrichment shape, where the
# static side broadcasts into every trigger. Joining and aggregating
# in the engine must reproduce the batch join bit-for-bit (counts and
# exact decimal sums are order-independent), so the oracle is simply
# the batch equivalent — certifying that batch/stream join semantics
# agree, the property a lambda-architecture migration depends on.
# --------------------------------------------------------------------------
STREAM_ENRICH_ORACLE = """
WITH dim AS (
  SELECT DISTINCT user_id,
    CASE WHEN user_id % 3 = 0 THEN 'core' WHEN user_id % 3 = 1 THEN 'growth'
         ELSE 'lapsed' END AS cohort
  FROM events
)
SELECT d.cohort, e.event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events e JOIN dim d USING (user_id)
GROUP BY d.cohort, e.event_type
"""


@query("q_stream_enrich", STREAM_ENRICH_ORACLE)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    from forklift_spark.functions.exact import dec

    ev = tables.load(spark, sf_dir, "events")
    dim = ev.select("user_id").distinct().select(
        "user_id",
        F.when(F.col("user_id") % 3 == 0, "core")
        .when(F.col("user_id") % 3 == 1, "growth")
        .otherwise("lapsed")
        .alias("cohort"),
    )
    src = tempfile.mkdtemp(prefix="fk_stream_enrich_")
    ev.select("event_id", "user_id", "event_type", "value").repartition(
        6
    ).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    enriched = stream.join(F.broadcast(dim), "user_id").groupBy(
        "cohort", "event_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(dec("value", "decimal(12,2)")).alias("tv"),
    )
    sink = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    from forklift_spark.streaming.jobs import (
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    with scoped_shuffle_partitions(
        spark, stream_state_partitions(spark, src)
    ):
        q = (
            enriched.writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), \
            "stream did not finish; sink would be partial"
    return spark.table(sink).select(
        "cohort", "event_type", "n_events",
        F.col("tv").cast("double").alias("total_value"),
    )


# --------------------------------------------------------------------------
# q_sliding_distinct — trailing 7-day distinct users (and event volume)
# per observed day: the sliding-window COUNT DISTINCT that plain window
# functions cannot express (DISTINCT is not frame-able). Spark shape:
# each event EXPLODES into the 7 window-end days it contributes to
# (a bounded W-fold fanout of keys, not payloads), then one
# (day, user) distinct aggregation — the scalable alternative to a
# per-day range join, whose same-key pair re-filtering is per-day
# quadratic at scale. Window-end days are semi-joined to observed days
# (bounded frame, broadcast). The ORACLE replays the *range-join*
# formulation — two different algorithms, one fixpoint, so a hash
# match certifies the explode fanout covers exactly [day, day+6].
# --------------------------------------------------------------------------
SLIDING_DISTINCT_ORACLE = """
WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS u7,
  COUNT(*) AS n7
FROM d JOIN events e
  ON CAST(e.ts AS DATE) BETWEEN d.day - INTERVAL 6 DAY AND d.day
GROUP BY 1
"""


@query("q_sliding_distinct", SLIDING_DISTINCT_ORACLE)
def q_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    days = ev.select(F.col("ts").cast("date").alias("day"), "user_id")
    expl = days.select(
        "user_id",
        F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("wday"),
    )
    actual = days.select("day").distinct()
    return (
        expl.join(F.broadcast(actual), expl["wday"] == actual["day"], "left_semi")
        .groupBy("wday")
        .agg(
            F.countDistinct("user_id").alias("u7"),
            F.count(F.lit(1)).alias("n7"),
        )
        .select(F.date_format("wday", "yyyy-MM-dd").alias("day"), "u7", "n7")
    )


# --------------------------------------------------------------------------
# q_cusum_changepoint — two-sided CUSUM drift detection over the daily
# event volume per type (the classic changepoint/monitoring chart):
#   sp_d = max(0, sp_{d-1} + x_d - mean - k)   (upward drift)
#   sn_d = max(0, sn_{d-1} + mean - x_d - k)   (downward drift)
# with slack k = 5% of the per-type mean and alarm threshold h = mean.
# CUSUM is a sequential recursion (like EWMA), so it runs as ONE JVM
# `aggregate` HOF fold over each type's sorted day array (types are
# few, days bounded — the bounded-fold contract), while the oracle
# replays the recursion with a recursive CTE. All state is INTEGER
# milli-events (x·1000, mean_e3 = 1000·total div n_days) — double
# state would accumulate engine-specific rounding along the chain.
# --------------------------------------------------------------------------
CUSUM_ORACLE = """
WITH RECURSIVE d AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
  FROM events GROUP BY 1, 2
), st AS (
  SELECT event_type,
    CAST((1000 * SUM(x)) // COUNT(*) AS BIGINT) AS mean_e3
  FROM d GROUP BY 1
), o AS (
  SELECT d.event_type, d.day, d.x, st.mean_e3, st.mean_e3 // 20 AS k_e3,
    row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS rn
  FROM d JOIN st USING (event_type)
), r AS (
  SELECT event_type, day, x, rn, mean_e3, k_e3,
    greatest(0, x * 1000 - mean_e3 - k_e3) AS sp,
    greatest(0, mean_e3 - x * 1000 - k_e3) AS sn
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.event_type, o.day, o.x, o.rn, o.mean_e3, o.k_e3,
    greatest(0, r.sp + o.x * 1000 - o.mean_e3 - o.k_e3),
    greatest(0, r.sn + o.mean_e3 - o.x * 1000 - o.k_e3)
  FROM r JOIN o ON o.event_type = r.event_type AND o.rn = r.rn + 1
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, x,
  CAST(sp AS BIGINT) AS sp_e3, CAST(sn AS BIGINT) AS sn_e3,
  (sp > mean_e3 OR sn > mean_e3) AS alarm
FROM r
"""


@query("q_cusum_changepoint", CUSUM_ORACLE)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    arr = (
        daily.groupBy("event_type")
        .agg(F.array_sort(F.collect_list(F.struct("day", "x"))).alias("a"))
        .withColumn(
            "mean_e3",
            F.expr("(1000L * aggregate(a, 0L, (s, v) -> s + v.x)) div size(a)"),
        )
        .withColumn("k_e3", F.expr("mean_e3 div 20L"))
    )
    folded = arr.select(
        "event_type",
        "mean_e3",
        F.expr(
            """
            aggregate(
              a,
              struct(
                cast(array() as array<struct<day:string,x:bigint,sp:bigint,sn:bigint>>)
                  AS r,
                0L AS sp, 0L AS sn),
              (acc, v) -> struct(
                concat(acc.r, array(struct(
                  v.day AS day, v.x AS x,
                  greatest(0L, acc.sp + v.x * 1000L - mean_e3 - k_e3) AS sp,
                  greatest(0L, acc.sn + mean_e3 - v.x * 1000L - k_e3) AS sn))) AS r,
                greatest(0L, acc.sp + v.x * 1000L - mean_e3 - k_e3) AS sp,
                greatest(0L, acc.sn + mean_e3 - v.x * 1000L - k_e3) AS sn)
            ).r
            """
        ).alias("f"),
    )
    out = folded.select("event_type", "mean_e3", F.explode("f").alias("r"))
    return out.select(
        "event_type",
        F.col("r.day").alias("day"),
        F.col("r.x").alias("x"),
        F.col("r.sp").alias("sp_e3"),
        F.col("r.sn").alias("sn_e3"),
        ((F.col("r.sp") > F.col("mean_e3")) | (F.col("r.sn") > F.col("mean_e3")))
        .alias("alarm"),
    )


# --------------------------------------------------------------------------
# q_seasonal_decompose — classical additive decomposition of the daily
# revenue series per event type: trend = centered 7-day moving average
# (full windows only — edges stay NULL rather than decay-biased),
# seasonal = day-of-week mean of the detrended series, residual = the
# rest. All state INTEGER cents: the moving average and DOW means use
# true integer division (measured: Spark `div` and DuckDB `//` BOTH
# truncate toward zero on negatives, so detrended sums divide
# identically). Day-of-week parity: Spark weekday() (Mon=0) ==
# DuckDB isodow - 1. Two window passes partitioned by type + one
# bounded DOW join — the scalable decomposition shape (no global
# sort; each type's series stays in one partition stream).
# --------------------------------------------------------------------------
SEASONAL_ORACLE = """
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, day, x,
    CASE WHEN COUNT(*) OVER w = 7
         THEN CAST(SUM(x) OVER w // 7 AS BIGINT) END AS trend
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), dt AS (
  SELECT *, x - trend AS detr, isodow(day) - 1 AS dow FROM t
), s AS (
  SELECT event_type, dow,
    CAST(SUM(detr) // COUNT(detr) AS BIGINT) AS seasonal
  FROM dt WHERE detr IS NOT NULL GROUP BY 1, 2
)
SELECT dt.event_type, strftime(dt.day, '%Y-%m-%d') AS day, dt.x AS x_cents,
  dt.trend, s.seasonal, dt.detr - s.seasonal AS residual
FROM dt LEFT JOIN s ON s.event_type = dt.event_type AND s.dow = dt.dow
"""


@query("q_seasonal_decompose", SEASONAL_ORACLE)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.functions.exact import dec

    ev = tables.load(spark, sf_dir, "events")
    d = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            (dec("value", "decimal(12,2)") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("x"))
    )
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    t = d.select(
        "event_type",
        "day",
        "x",
        F.when(F.count(F.lit(1)).over(w) == 7, F.sum("x").over(w)).alias("ma7"),
    ).withColumn("trend", F.expr("ma7 div 7").cast("bigint"))
    dt = t.select(
        "event_type",
        "day",
        "x",
        "trend",
        (F.col("x") - F.col("trend")).alias("detr"),
        F.weekday("day").alias("dow"),
    )
    s = (
        dt.filter(F.col("detr").isNotNull())
        .groupBy("event_type", "dow")
        .agg(F.expr("sum(detr) div count(detr)").cast("bigint").alias("seasonal"))
    )
    return (
        dt.join(F.broadcast(s), ["event_type", "dow"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("x").alias("x_cents"),
            "trend",
            "seasonal",
            (F.col("detr") - F.col("seasonal")).alias("residual"),
        )
    )


# --------------------------------------------------------------------------
# q_process_mining — the eventually-follows matrix over user traces
# (the alpha-miner / process-discovery input): for each ordered pair
# of distinct activities (a, b), how many users' FIRST occurrence of a
# strictly precedes their first occurrence of b, with support in basis
# points of the user population. Strict < on first timestamps is the
# deterministic order relation — exact-microsecond ties count as
# neither-precedes on BOTH engines, so no tiebreak column is needed
# (min_by/arg_min tie behavior is engine-nondeterministic and
# deliberately avoided). Shape: one (user, activity) first-occurrence
# rollup, a per-user self-join bounded by the activity alphabet
# (|A|^2 pairs per user, |A| = 5 here), one pair rollup.
# --------------------------------------------------------------------------
PROCESS_MINING_ORACLE = """
WITH firsts AS (
  SELECT user_id, event_type, min(ts) AS ft
  FROM events GROUP BY 1, 2
), tot AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
pairs AS (
  SELECT a.event_type AS act_a, b.event_type AS act_b,
    count(*) AS n_users_ab
  FROM firsts a JOIN firsts b
    ON a.user_id = b.user_id AND a.event_type <> b.event_type
  WHERE a.ft < b.ft
  GROUP BY 1, 2
)
SELECT act_a, act_b, CAST(n_users_ab AS BIGINT) AS n_users_ab,
  CAST(10000 * n_users_ab // tot.n_users AS BIGINT) AS support_bp
FROM pairs, tot
"""


@query("q_process_mining", PROCESS_MINING_ORACLE)
def q_process_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id", "event_type").agg(F.min("ts").alias("ft"))
    tot = ev.agg(F.countDistinct("user_id").alias("n_users"))
    a = firsts.select(
        "user_id", F.col("event_type").alias("act_a"), F.col("ft").alias("fa")
    )
    b = firsts.select(
        "user_id", F.col("event_type").alias("act_b"), F.col("ft").alias("fb")
    )
    pairs = (
        a.join(b, "user_id")
        .filter((F.col("act_a") != F.col("act_b")) & (F.col("fa") < F.col("fb")))
        .groupBy("act_a", "act_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users_ab"))
    )
    return pairs.crossJoin(F.broadcast(tot)).select(  # 1-row scalar population
        "act_a",
        "act_b",
        "n_users_ab",
        F.expr("10000 * n_users_ab div n_users").alias("support_bp"),
    )


# --------------------------------------------------------------------------
# q_holt_forecast — Holt's linear-trend (double exponential) smoothing
# over the daily revenue series per event type, the forecasting
# upgrade of q_ewma_smooth: two coupled integer states in milli-cents
#   l_d = (3·x_d·1000 + 7·(l + b)) div 10     (alpha = 0.3)
#   b_d = (2·(l_d - l) + 8·b) div 10          (beta  = 0.2)
# initialized l_1 = x_1·1000, b_1 = 0, with the 7-day-ahead forecast
# l + 7·b published per day. Sequential two-state recursion == one JVM
# `aggregate` HOF fold per type's sorted day array; the oracle replays
# it with a recursive CTE (two recursion mechanisms, one fixpoint).
# Negative trends divide identically in both engines (div/'//'
# truncation parity, measured for q_seasonal_decompose).
# --------------------------------------------------------------------------
HOLT_ORACLE = """
WITH RECURSIVE d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), o AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM d
), r AS (
  SELECT event_type, day, x, rn, x * 1000 AS l, CAST(0 AS BIGINT) AS b
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.event_type, o.day, o.x, o.rn,
    (3 * o.x * 1000 + 7 * (r.l + r.b)) // 10,
    (2 * ((3 * o.x * 1000 + 7 * (r.l + r.b)) // 10 - r.l) + 8 * r.b) // 10
  FROM r JOIN o ON o.event_type = r.event_type AND o.rn = r.rn + 1
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, x AS day_cents,
  CAST(l AS BIGINT) AS l_e3, CAST(b AS BIGINT) AS b_e3,
  CAST(l + 7 * b AS BIGINT) AS fc7_e3
FROM r
"""


@query("q_holt_forecast", HOLT_ORACLE)
def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.functions.exact import dec

    ev = tables.load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            (dec("value", "decimal(12,2)") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("x"))
    )
    arr = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("a")
    )
    folded = arr.select(
        "event_type",
        F.expr(
            """
            aggregate(
              slice(a, 2, greatest(size(a) - 1, 0)),
              struct(
                array(struct(a[0].day AS day, a[0].x AS x,
                             a[0].x * 1000L AS l, 0L AS b)) AS r,
                a[0].x * 1000L AS l, 0L AS b),
              (acc, v) -> struct(
                concat(acc.r, array(struct(
                  v.day AS day, v.x AS x,
                  (3L * v.x * 1000L + 7L * (acc.l + acc.b)) div 10L AS l,
                  (2L * ((3L * v.x * 1000L + 7L * (acc.l + acc.b)) div 10L
                         - acc.l) + 8L * acc.b) div 10L AS b))) AS r,
                (3L * v.x * 1000L + 7L * (acc.l + acc.b)) div 10L AS l,
                (2L * ((3L * v.x * 1000L + 7L * (acc.l + acc.b)) div 10L
                       - acc.l) + 8L * acc.b) div 10L AS b)
            ).r
            """
        ).alias("f"),
    )
    out = folded.select("event_type", F.explode("f").alias("r"))
    return out.select(
        "event_type",
        F.col("r.day").alias("day"),
        F.col("r.x").alias("day_cents"),
        F.col("r.l").alias("l_e3"),
        F.col("r.b").alias("b_e3"),
        (F.col("r.l") + 7 * F.col("r.b")).alias("fc7_e3"),
    )


# --------------------------------------------------------------------------
# q_stream_merge_manifest — the streaming MERGE sink EXECUTED IN THE
# STREAMING ENGINE: a 3-file feed (with one file re-shipping a subset of
# another — identical rows, the retry/replay shape) is consumed one file
# per trigger by stream_merge_manifest, each micro-batch committing a
# partition-pruned manifest MERGE. The oracle is the DISTINCT feed:
# upsert-by-key must land every key exactly once no matter how files
# interleave (order-independent by construction — the replayed rows are
# byte-identical, so any arrival order converges to the same table).
# In-query asserts pin one manifest commit per micro-batch.
# --------------------------------------------------------------------------
STREAM_MERGE_ORACLE = """
WITH feed AS (
  SELECT event_id, event_type, value FROM events WHERE event_id % 2 = 0
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM feed GROUP BY event_type ORDER BY event_type
"""


@query("q_stream_merge_manifest", STREAM_MERGE_ORACLE)
def q_stream_merge_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from forklift_spark.manifest import ManifestTable
    from forklift_spark.streaming.jobs import stream_merge_manifest

    ev = tables.load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    import os as _os

    feed_dir = tempfile.mkdtemp(prefix="fk_stream_merge_feed_")
    evens = ev.filter(F.col("event_id") % 2 == 0)
    # three files: two disjoint halves + a byte-identical replay of part
    # of the second (the at-least-once duplicate-delivery shape). ONE
    # partitioned write stages all three (optimization r8, guide §1.2:
    # the old 3×filter+coalesce(1) loop scanned the feed three times);
    # hash-repartition on the file tag keeps one file per tag, renames
    # set increasing mtimes so trigger order stays deterministic. File
    # CONTENTS are identical to the loop's (the merge is additionally
    # order-independent by construction — see oracle note above).
    staged = tempfile.mkdtemp(prefix="fk_stream_merge_staged_")
    feed3 = evens.withColumn(
        "__f",
        F.when(F.col("event_id") % 4 == 2, F.lit(0)).otherwise(F.lit(1)),
    ).unionByName(
        evens.filter(F.col("event_id") % 8 == 0).withColumn("__f", F.lit(2))
    )
    (
        feed3.repartition("__f")
        .write.mode("overwrite")
        .partitionBy("__f")
        .parquet(staged)
    )
    t0 = 1_700_000_000
    for i in range(3):
        bdir = _os.path.join(staged, f"__f={i}")
        part = next(
            f for f in _os.listdir(bdir) if f.endswith(".parquet")
        )
        dst = _os.path.join(feed_dir, f"feed{i}.parquet")
        _os.rename(_os.path.join(bdir, part), dst)
        _os.utime(dst, (t0 + i * 10, t0 + i * 10))
    t = ManifestTable(
        spark, tempfile.mkdtemp(prefix="fk_stream_merge_tbl_"), "events_merged"
    )
    q = stream_merge_manifest(
        spark,
        feed_dir,
        t,
        on="event_id",
        partition_by="event_type",
        schema=evens.schema,
        checkpoint_dir=tempfile.mkdtemp(prefix="fk_stream_merge_ckpt_"),
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    assert t.current_version() == 3, t.history()  # create + 2 merges, 1/batch
    return (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", MONEY)).cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q_seasonal_anomaly — anomaly detection on the seasonal-decomposition
# RESIDUAL: a day is anomalous when residual^2 * n^2 > 4 * (n*SUM(r^2)
# - SUM(r)^2) — i.e. |residual| exceeds 2 population sigmas of its
# type's residual distribution. Every SUM is exact BIGINT (order-free);
# the comparison happens in doubles built from those identical integers,
# and IEEE multiply/compare on identical operands is engine-identical —
# so the anomaly FLAG itself is exact, not approximately thresholded.
# Composes the verified decompose machinery (trend/seasonal/residual
# integer cents). The monitoring shape for '3-sigma after seasonality',
# which a plain z-score on raw values can't do (weekday swings would
# drown real anomalies). 2 sigma on this synthetic series flags a
# handful of days at every SF (3 sigma flags none — pinned by the
# exceedance census in the round notes).
# --------------------------------------------------------------------------
SEASONAL_ANOM_ORACLE = """
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, day, x,
    CASE WHEN COUNT(*) OVER w = 7
         THEN CAST(SUM(x) OVER w // 7 AS BIGINT) END AS trend
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), dt AS (
  SELECT *, x - trend AS detr, isodow(day) - 1 AS dow FROM t
), s AS (
  SELECT event_type, dow,
    CAST(SUM(detr) // COUNT(detr) AS BIGINT) AS seasonal
  FROM dt WHERE detr IS NOT NULL GROUP BY 1, 2
), r AS (
  SELECT dt.event_type, dt.day, dt.detr - s.seasonal AS resid
  FROM dt JOIN s ON s.event_type = dt.event_type AND s.dow = dt.dow
  WHERE dt.detr IS NOT NULL
), stats AS (
  SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(resid) AS BIGINT) AS s1,
    CAST(SUM(resid * resid) AS BIGINT) AS s2
  FROM r GROUP BY event_type
)
SELECT r.event_type, strftime(r.day, '%Y-%m-%d') AS day,
  CAST(r.resid AS BIGINT) AS resid_cents, st.n
FROM r JOIN stats st ON st.event_type = r.event_type
WHERE CAST(r.resid AS DOUBLE) * CAST(r.resid AS DOUBLE)
        * CAST(st.n AS DOUBLE) * CAST(st.n AS DOUBLE)
      > 4.0 * (CAST(st.n AS DOUBLE) * CAST(st.s2 AS DOUBLE)
               - CAST(st.s1 AS DOUBLE) * CAST(st.s1 AS DOUBLE))
ORDER BY r.event_type, r.day
"""


@query("q_seasonal_anomaly", SEASONAL_ANOM_ORACLE)
def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.functions.exact import dec

    ev = tables.load(spark, sf_dir, "events")
    d = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            (dec("value", "decimal(12,2)") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("x"))
    )
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    t = d.select(
        "event_type", "day", "x",
        F.when(F.count(F.lit(1)).over(w) == 7, F.sum("x").over(w)).alias("ma7"),
    ).withColumn("trend", F.expr("ma7 div 7").cast("bigint"))
    dt = t.select(
        "event_type", "day", "x", "trend",
        (F.col("x") - F.col("trend")).alias("detr"),
        F.weekday("day").alias("dow"),
    )
    s = (
        dt.filter(F.col("detr").isNotNull())
        .groupBy("event_type", "dow")
        .agg(F.expr("sum(detr) div count(detr)").cast("bigint").alias("seasonal"))
    )
    r = (
        dt.join(F.broadcast(s), ["event_type", "dow"])
        .filter(F.col("detr").isNotNull())
        .select(
            "event_type", "day",
            (F.col("detr") - F.col("seasonal")).alias("resid"),
        )
    )
    stats = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("resid").cast("bigint").alias("s1"),
        F.sum(F.col("resid") * F.col("resid")).cast("bigint").alias("s2"),
    )
    rd = F.col("resid").cast("double")
    nd = F.col("n").cast("double")
    return (
        r.join(F.broadcast(stats), "event_type")
        .filter(
            rd * rd * nd * nd
            > F.lit(4.0)
            * (
                nd * F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double")
            )
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("resid").cast("bigint").alias("resid_cents"),
            "n",
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# q_manifest_stream_source — the manifest format as a REGISTERED Spark
# streaming source (Python DataSource API, forklift_spark/datasource.py):
# spark.readStream.format("forklift_manifest") tails the table's CDC
# feed with manifest versions as offsets. The query builds three
# versions — create (inserts), merge+dv (exact dv-diff delete+insert
# per updated key), dv delete — drains the stream from genesis with an
# availableNow trigger into a parquet sink (no driver materialization),
# and aggregates the change events by (_change_type, event_type). The
# oracle derives the exact expected event multiset from the source
# table: a missed dv diff, a replayed offset, or leakage from the
# layout-only gate breaks counts and value sums.
# --------------------------------------------------------------------------
MANIFEST_STREAM_SOURCE_ORACLE = """
WITH base AS (
  SELECT event_id, event_type, CAST(value AS DOUBLE) AS value
  FROM events WHERE event_id % 2 = 0
),
ins AS (
  SELECT event_type, value FROM base                              -- create
  UNION ALL
  SELECT event_type, value + 1000 FROM base WHERE event_id % 10 = 0 -- merge
),
del AS (
  SELECT event_type, value FROM base WHERE event_id % 10 = 0      -- old rows
  UNION ALL
  SELECT event_type,
         CASE WHEN event_id % 10 = 0 THEN value + 1000 ELSE value END
  FROM base WHERE event_id % 14 = 0                               -- dv delete
)
SELECT _change_type, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM (
  SELECT 'insert' AS _change_type, * FROM ins
  UNION ALL
  SELECT 'delete' AS _change_type, * FROM del
)
GROUP BY _change_type, event_type
ORDER BY _change_type, event_type
"""


@query("q_manifest_stream_source", MANIFEST_STREAM_SOURCE_ORACLE)
def q_manifest_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from forklift_spark.datasource import ManifestDataSource
    from forklift_spark.manifest import ManifestTable

    try:
        spark.dataSource.register(ManifestDataSource)
    except Exception:
        pass  # already registered in this session

    ev = tables.load(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("value").cast("double").alias("value")
    )
    base = ev.filter(F.col("event_id") % 2 == 0)
    root = tempfile.mkdtemp(prefix="fk_stream_src_")
    t = ManifestTable(spark, root, "ev")
    t.create(base, partition_by="event_type")                      # v1
    t.merge(
        base.filter(F.col("event_id") % 10 == 0)
            .withColumn("value", F.col("value") + 1000),
        on="event_id", use_dv=True,                                # v2
    )
    t.delete(F.col("event_id") % 14 == 0, use_dv=True)             # v3

    out = tempfile.mkdtemp(prefix="fk_stream_src_out_")
    q = (
        spark.readStream.format("forklift_manifest")
        .option("table", "ev").option("cdc", "true")
        .option("starting_version", "0")
        .load(root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation",
                tempfile.mkdtemp(prefix="fk_stream_src_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    feed = spark.read.parquet(out)
    return (
        feed.groupBy("_change_type", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(dec("value", MONEY)).cast("double").alias("total_value"),
        )
        .orderBy("_change_type", "event_type")
    )


# --------------------------------------------------------------------------
# q_delta_stream_source — a DELTA LAKE table as a registered Spark
# streaming source (Python DataSource API,
# forklift_spark/delta_datasource.py): spark.readStream.format(
# "deltalite").option("cdc","true") tails the _delta_log with versions
# as offsets — the Delta counterpart of q_manifest_stream_source and
# the streaming twin of DeltaLiteTable.changelog(). The publisher is
# the native-DV lakehouse sync: three manifest commits (create,
# merge+dv, delete+dv) each synced as one Delta version, so the feed
# must reproduce exact dv-diff events THROUGH the exported log
# (deletion vectors decoded Spark-free in the planner, partition
# values injected from the log). The oracle derives the expected event
# multiset from the source table: a missed dv diff, a replayed offset,
# or a double-applied re-add breaks counts and value sums.
# --------------------------------------------------------------------------
DELTA_STREAM_SOURCE_ORACLE = """
WITH base AS (
  SELECT event_id, event_type, CAST(value AS DOUBLE) AS value
  FROM events WHERE event_id % 2 = 1
),
ins AS (
  SELECT event_type, value FROM base                              -- create
  UNION ALL
  SELECT event_type, value + 500 FROM base WHERE event_id % 9 = 0 -- merge
),
del AS (
  SELECT event_type, value FROM base WHERE event_id % 9 = 0       -- old rows
  UNION ALL
  SELECT event_type,
         CASE WHEN event_id % 9 = 0 THEN value + 500 ELSE value END
  FROM base WHERE event_id % 13 = 0                               -- dv delete
)
SELECT _change_type, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM (
  SELECT 'insert' AS _change_type, * FROM ins
  UNION ALL
  SELECT 'delete' AS _change_type, * FROM del
)
GROUP BY _change_type, event_type
ORDER BY _change_type, event_type
"""


@query("q_delta_stream_source", DELTA_STREAM_SOURCE_ORACLE)
def q_delta_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from forklift_spark.connections.deltalite import (
        sync_manifest_to_delta,
    )
    from forklift_spark.delta_datasource import DeltaLiteDataSource
    from forklift_spark.manifest import ManifestTable

    try:
        spark.dataSource.register(DeltaLiteDataSource)
    except Exception:
        pass  # already registered in this session

    ev = tables.load(spark, sf_dir, "events").select(
        "event_id", "event_type",
        F.col("value").cast("double").alias("value")
    )
    base = ev.filter(F.col("event_id") % 2 == 1)
    root = tempfile.mkdtemp(prefix="fk_delta_stream_")
    t = ManifestTable(spark, os.path.join(root, "src"), "ev")
    dest = os.path.join(root, "pub")
    t.create(base, partition_by="event_type")
    sync_manifest_to_delta(t, dest, dv_mode="native")          # delta v0
    t.merge(
        base.filter(F.col("event_id") % 9 == 0)
            .withColumn("value", F.col("value") + 500),
        on="event_id", use_dv=True,
    )
    sync_manifest_to_delta(t, dest, dv_mode="native")          # delta v1
    t.delete(F.col("event_id") % 13 == 0, use_dv=True)
    sync_manifest_to_delta(t, dest, dv_mode="native")          # delta v2

    out = tempfile.mkdtemp(prefix="fk_delta_stream_out_")
    q = (
        spark.readStream.format("deltalite")
        .option("cdc", "true")
        .option("starting_version", "-1")  # replay from genesis (v0)
        .load(dest)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation",
                tempfile.mkdtemp(prefix="fk_delta_stream_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    feed = spark.read.parquet(out)
    return (
        feed.groupBy("_change_type", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(dec("value", MONEY)).cast("double").alias("total_value"),
        )
        .orderBy("_change_type", "event_type")
    )


# --------------------------------------------------------------------------
# q_iceberg_stream_source — an ICEBERG v2 table as a registered Spark
# streaming source (Python DataSource API,
# forklift_spark/iceberg_datasource.py): spark.readStream.format(
# "iceberglite").option("cdc","true") tails the snapshot history with
# snapshot ids as offsets — completing the lakehouse stream-source
# triple (manifest / deltalite / iceberglite). Publisher: the
# native-DV sync (create, merge+dv, delete+dv -> three snapshots whose
# masks export as REAL v2 position deletes); the feed must reproduce
# exact position-delete diffs through the exported metadata, decoded
# Spark-free (pure-Python Avro codec) in the planner. Oracle: the
# expected event multiset derived from the source table.
# --------------------------------------------------------------------------
ICEBERG_STREAM_SOURCE_ORACLE = """
WITH base AS (
  SELECT event_id, event_type, CAST(value AS DOUBLE) AS value
  FROM events WHERE event_id % 3 = 0
),
ins AS (
  SELECT event_type, value FROM base                              -- create
  UNION ALL
  SELECT event_type, value + 700 FROM base WHERE event_id % 12 = 0 -- merge
),
del AS (
  SELECT event_type, value FROM base WHERE event_id % 12 = 0      -- old rows
  UNION ALL
  SELECT event_type,
         CASE WHEN event_id % 12 = 0 THEN value + 700 ELSE value END
  FROM base WHERE event_id % 21 = 0                               -- dv delete
)
SELECT _change_type, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM (
  SELECT 'insert' AS _change_type, * FROM ins
  UNION ALL
  SELECT 'delete' AS _change_type, * FROM del
)
GROUP BY _change_type, event_type
ORDER BY _change_type, event_type
"""


@query("q_iceberg_stream_source", ICEBERG_STREAM_SOURCE_ORACLE)
def q_iceberg_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from forklift_spark.connections.iceberglite import (
        sync_manifest_to_iceberg,
    )
    from forklift_spark.iceberg_datasource import IcebergLiteDataSource
    from forklift_spark.manifest import ManifestTable

    try:
        spark.dataSource.register(IcebergLiteDataSource)
    except Exception:
        pass  # already registered in this session

    ev = tables.load(spark, sf_dir, "events").select(
        "event_id", "event_type",
        F.col("value").cast("double").alias("value")
    )
    base = ev.filter(F.col("event_id") % 3 == 0)
    root = tempfile.mkdtemp(prefix="fk_ice_stream_")
    t = ManifestTable(spark, os.path.join(root, "src"), "ev")
    dest = os.path.join(root, "pub")
    t.create(base, partition_by="event_type")
    sync_manifest_to_iceberg(t, dest, dv_mode="native")       # snap 1
    t.merge(
        base.filter(F.col("event_id") % 12 == 0)
            .withColumn("value", F.col("value") + 700),
        on="event_id", use_dv=True,
    )
    sync_manifest_to_iceberg(t, dest, dv_mode="native")       # snap 2
    t.delete(F.col("event_id") % 21 == 0, use_dv=True)
    sync_manifest_to_iceberg(t, dest, dv_mode="native")       # snap 3

    out = tempfile.mkdtemp(prefix="fk_ice_stream_out_")
    q = (
        spark.readStream.format("iceberglite")
        .option("cdc", "true")
        .option("starting_snapshot_id", "0")  # genesis sentinel
        .load(dest)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation",
                tempfile.mkdtemp(prefix="fk_ice_stream_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    feed = spark.read.parquet(out)
    return (
        feed.groupBy("_change_type", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(dec("value", MONEY)).cast("double").alias("total_value"),
        )
        .orderBy("_change_type", "event_type")
    )
