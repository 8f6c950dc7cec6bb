"""Statistical analytics queries (SURVEY.md §2.3 capability goals).

The reference pushes aggregate SQL straight to MySQL
(`/root/reference/lib/forklift/transports/mysql.rb:28` — "SQL
transformations are done exactly as they are written"), so any aggregate
MySQL can express is part of the surface a user would port. These queries
cover the statistical slice: central moments, correlation, outlier
detection, time-weighted means, and histograms.

Engine-exact reproducibility: built-in ``stddev``/``corr`` are single-pass
streaming aggregates whose float result depends on partition order, so a
Spark run and the DuckDB oracle would disagree in the last ulp. Instead
every statistic here is derived from DECIMAL power sums (order-independent,
exact — see functions.exact) with the *same* IEEE double expression applied
to those sums in both engines, giving bit-identical results at any
parallelism.

Scale notes (100 TB):
- power sums are plain map-side-partial aggregates: one shuffle of a few
  decimal cells per group, never a second pass over the data.
- z-score joins the per-group stats back via broadcast (group cardinality
  is tiny by construction); the score itself is scan-side arithmetic.
- the histogram is equi-width: pass 1 reduces to two scalars (min/max),
  pass 2 is scan-side bucketing + one groupBy. No global sort, no global
  window anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from forklift_spark import tables
from forklift_spark.functions.exact import MONEY, QTY, dec
from forklift_spark.queries import query

# Natural scale for events.value (generated at 2dp; see TESTDATA.md).
VALUE = "decimal(12,2)"


# --------------------------------------------------------------------------
# q_stats_moments — mean / sample variance / stddev / correlation per group,
# derived from exact decimal power sums (n, Σx, Σx², Σxy) so the doubles are
# reproducible across engines and parallelism.
# --------------------------------------------------------------------------
Q_STATS_MOMENTS_ORACLE = """
WITH sums AS (
  SELECT l_returnflag,
    COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sq,
    CAST(SUM(CAST(l_quantity AS DECIMAL(14,2)) * CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sqq,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sp,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS spp,
    CAST(SUM(CAST(l_quantity AS DECIMAL(14,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sqp
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  sq / CAST(n AS DOUBLE) AS mean_qty,
  (sqq - (sq * sq) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var_qty,
  sqrt((sqq - (sq * sq) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) AS std_qty,
  round(
    (sqp - (sq * sp) / CAST(n AS DOUBLE))
      / (sqrt(sqq - (sq * sq) / CAST(n AS DOUBLE)) * sqrt(spp - (sp * sp) / CAST(n AS DOUBLE))),
    12) AS corr_qty_price
FROM sums
"""


@query("q_stats_moments", Q_STATS_MOMENTS_ORACLE)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    q = dec("l_quantity", QTY)
    p = dec("l_extendedprice", MONEY)
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sq"),
        F.sum(q * q).cast("double").alias("sqq"),
        F.sum(p).cast("double").alias("sp"),
        F.sum(p * p).cast("double").alias("spp"),
        F.sum(q * p).cast("double").alias("sqp"),
    )
    n_d = F.col("n").cast("double")
    var_qty = (F.col("sqq") - (F.col("sq") * F.col("sq")) / n_d) / (
        F.col("n") - F.lit(1)
    ).cast("double")
    # Two engine-stability rules, both measured at sf0.001:
    # 1. every multiply feeds a division — `a*b - c*d` is the fused-
    #    multiply-add shape and contraction-compiled engines evaluate it
    #    in one rounding vs the JVM's two;
    # 2. Σp² exceeds 2^53 decimal UNITS (7e16 at scale 4), so its
    #    decimal->double cast legitimately rounds differently per engine
    #    (BigDecimal.doubleValue is correctly rounded; a scaled-hugeint
    #    conversion is not) — the last ulp of corr is therefore not
    #    engine-defined, and the output is rounded to 12 dp on both
    #    sides. mean/var/std touch only sums inside the exact range and
    #    stay unrounded.
    corr = F.round(
        (F.col("sqp") - (F.col("sq") * F.col("sp")) / n_d)
        / (
            F.sqrt(F.col("sqq") - (F.col("sq") * F.col("sq")) / n_d)
            * F.sqrt(F.col("spp") - (F.col("sp") * F.col("sp")) / n_d)
        ),
        12,
    )
    return sums.select(
        "l_returnflag",
        "n",
        (F.col("sq") / n_d).alias("mean_qty"),
        var_qty.alias("var_qty"),
        F.sqrt(var_qty).alias("std_qty"),
        corr.alias("corr_qty_price"),
    )


# --------------------------------------------------------------------------
# q_zscore_outliers — per-type standardized score; rows beyond the cut are
# anomalies. Stats come from one power-sum aggregate; the (tiny) per-type
# stats table joins back broadcast, so the 100 TB plan is scan + one small
# shuffle — no window, no second full pass.
# --------------------------------------------------------------------------
Q_ZSCORE_ORACLE = """
WITH stats AS (
  SELECT event_type,
    COUNT(*) AS n,
    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s1,
    CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s2
  FROM events
  GROUP BY event_type
)
SELECT e.event_id, e.event_type,
  CAST(CAST(e.value AS DECIMAL(12,2)) AS DOUBLE) AS value,
  (CAST(CAST(e.value AS DECIMAL(12,2)) AS DOUBLE) - s.s1 / CAST(s.n AS DOUBLE))
    / sqrt((s.s2 - (s.s1 * s.s1) / CAST(s.n AS DOUBLE)) / CAST(s.n - 1 AS DOUBLE))
    AS zscore
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE abs(
  (CAST(CAST(e.value AS DECIMAL(12,2)) AS DOUBLE) - s.s1 / CAST(s.n AS DOUBLE))
    / sqrt((s.s2 - (s.s1 * s.s1) / CAST(s.n AS DOUBLE)) / CAST(s.n - 1 AS DOUBLE))
) > 2.5
"""


@query("q_zscore_outliers", Q_ZSCORE_ORACLE)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    v = dec("value", VALUE)
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast("double").alias("s1"),
        F.sum(v * v).cast("double").alias("s2"),
    )
    n_d = F.col("n").cast("double")
    mean = F.col("s1") / n_d
    std = F.sqrt(
        (F.col("s2") - (F.col("s1") * F.col("s1")) / n_d)
        / (F.col("n") - F.lit(1)).cast("double")
    )
    val_d = v.cast("double")
    z = (val_d - mean) / std
    # event_type cardinality is tiny (a handful of types at any SF), so the
    # stats side is always broadcastable — explicit hint is safe here, unlike
    # the SF-scaling dims un-hinted in round 2 (VERDICT r1 item 5).
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            val_d.alias("value"),
            z.alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) > 2.5)
    )


# --------------------------------------------------------------------------
# q_time_weighted_avg — TWA per event_type: each reading holds until the
# next one, so the mean weights each value by its holding interval. The
# standard irregular-time-series statistic (e.g. TimescaleDB time_weight).
# Lead() needs a per-type time order; partitioned by event_type this is one
# bounded-state window. At 100 TB with few very hot types you'd pre-split
# into (type, day) ranges and stitch the boundary interval from the next
# range's head — same algebra, documented here since the test corpus
# doesn't need it.
# --------------------------------------------------------------------------
Q_TWA_ORACLE = """
WITH seq AS (
  SELECT event_type,
    CAST(value AS DECIMAL(12,2)) AS v,
    epoch_us(ts) AS t_us,
    lead(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS t_next
  FROM events
)
SELECT event_type,
  CAST(SUM(v * ((t_next - t_us) // 1000)) AS DOUBLE)
    / CAST(SUM((t_next - t_us) // 1000) AS DOUBLE) AS twa_value,
  COUNT(*) AS n_intervals,
  CAST(SUM((t_next - t_us) // 1000) AS BIGINT) AS total_ms
FROM seq
WHERE t_next IS NOT NULL
GROUP BY event_type
"""


@query("q_time_weighted_avg", Q_TWA_ORACLE)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        dec("value", VALUE).alias("v"),
        F.unix_micros("ts").alias("t_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    # weight in (floor-truncated) milliseconds, not micros: Σ(v*dt) must fit
    # double's 2^53 exact-integer range for the decimal→double cast to round
    # identically in both engines — in micros the sum leaves that range
    # (engines then legitimately disagree in the last ulp; measured).
    dt = F.expr("(t_next - t_us) div 1000")
    return seq.groupBy("event_type").agg(
        (F.sum(F.col("v") * dt).cast("double") / F.sum(dt).cast("double")).alias(
            "twa_value"
        ),
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(dt).alias("total_ms"),
    )


# --------------------------------------------------------------------------
# q_equiwidth_histogram — 20-bucket equi-width histogram of extended price.
# Pass 1 reduces the table to two scalars (min/max); pass 2 buckets scan-side
# and aggregates. Equi-DEPTH (ntile) needs a global sort, which is exactly
# the single-task pattern round 1 flagged in q_zipf — equi-width gives the
# distribution shape with two scalable passes instead.
# --------------------------------------------------------------------------
Q_HISTOGRAM_ORACLE = """
WITH bounds AS (
  SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx FROM lineitem
)
SELECT
  CAST(least(19, floor(((l_extendedprice - mn) * 20.0) / (mx - mn))) AS BIGINT)
    AS bucket,
  COUNT(*) AS n,
  MIN(l_extendedprice) AS lo,
  MAX(l_extendedprice) AS hi,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS total
FROM lineitem, bounds
GROUP BY bucket
"""


@query("q_equiwidth_histogram", Q_HISTOGRAM_ORACLE)
def q_equiwidth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    )
    p = F.col("l_extendedprice")
    # min/max and the raw prices are untouched doubles, so the bucket index
    # is the same IEEE expression in both engines — no aggregation-order
    # dependence anywhere before the decimal total.
    bucket = F.least(
        F.lit(19), F.floor(((p - F.col("mn")) * F.lit(20.0)) / (F.col("mx") - F.col("mn")))
    ).cast("long")
    return (
        li.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(p).alias("lo"),
            F.max(p).alias("hi"),
            F.sum(dec("l_extendedprice", MONEY)).cast("double").alias("total"),
        )
    )


# --------------------------------------------------------------------------
# q_event_debounce — drop events that repeat within a quiet interval of the
# previous event for the same (user, type): the batch twin of the stateful
# streaming dedup (streaming/stateful.py), standard telemetry double-fire
# cleanup. One window partitioned by the natural key — bounded state, no
# global ordering anywhere.
# --------------------------------------------------------------------------
Q_DEBOUNCE_ORACLE = """
WITH seq AS (
  SELECT event_id, user_id, event_type, ts,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY user_id, event_type ORDER BY ts, event_id
    ) AS gap_us
  FROM events
)
SELECT event_id, user_id, event_type, ts
FROM seq
WHERE gap_us IS NULL OR gap_us > 300000000
"""


@query("q_event_debounce", Q_DEBOUNCE_ORACLE)
def q_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    return (
        ev.withColumn("gap_us", gap)
        .filter(F.col("gap_us").isNull() | (F.col("gap_us") > 300_000_000))
        .select("event_id", "user_id", "event_type", "ts")
    )


# --------------------------------------------------------------------------
# q_winsorize — robust-statistics cleaning: clamp a heavy-tailed metric to
# its per-group [p05, p95] band and report how much was clipped. The
# percentile pass reduces each group to two scalars which join back
# broadcast; the clamp itself picks one of three already-exact doubles
# (raw, p05, p95 — Spark `percentile` == DuckDB `quantile_cont` bit-exact,
# see q_percentiles), so only the final mean needs the decimal treatment.
# --------------------------------------------------------------------------
Q_WINSORIZE_ORACLE = """
WITH pct AS (
  SELECT l_returnflag,
    quantile_cont(l_extendedprice, 0.05) AS p05,
    quantile_cont(l_extendedprice, 0.95) AS p95
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
  COUNT(*) AS n,
  CAST(SUM(CASE WHEN l.l_extendedprice < p.p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
  CAST(SUM(CASE WHEN l.l_extendedprice > p.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
  CAST(SUM(CAST(greatest(p.p05, least(p.p95, l.l_extendedprice)) AS DECIMAL(18,6))) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS mean_winsorized
FROM lineitem l JOIN pct p ON l.l_returnflag = p.l_returnflag
GROUP BY l.l_returnflag
"""


@query("q_winsorize", Q_WINSORIZE_ORACLE)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    pct = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.05)").alias("p05"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
    )
    p = F.col("l_extendedprice")
    clamped = F.greatest(F.col("p05"), F.least(F.col("p95"), p))
    return (
        li.join(F.broadcast(pct), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(p < F.col("p05"), 1).otherwise(0)).alias("n_low"),
            F.sum(F.when(p > F.col("p95"), 1).otherwise(0)).alias("n_high"),
            (
                F.sum(clamped.cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_winsorized"),
        )
    )


# --------------------------------------------------------------------------
# q_rolling_anomaly — deviation from each event-type's trailing 1-hour
# mean (range frame over epoch seconds, current row excluded: "how far is
# this reading from its own recent history"). Frame sums are decimal ->
# the rolling mean is exact at any parallelism; the frame is value-based
# (RANGE), so epoch ties land in the same frame in both engines. Bounded
# per-type window state — the streaming twin is a watermarked sliding agg.
# --------------------------------------------------------------------------
Q_ROLLING_ANOMALY_ORACLE = """
WITH seq AS (
  SELECT event_id, event_type, ts,
    CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS value,
    CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS roll_sum,
    COUNT(*) OVER w AS roll_n
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
               RANGE BETWEEN 3599999999 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, event_type, value,
  value - roll_sum / CAST(roll_n AS DOUBLE) AS deviation
FROM seq
WHERE roll_n >= 5
  AND abs(value - roll_sum / CAST(roll_n AS DOUBLE)) > 150.0
"""


@query("q_rolling_anomaly", Q_ROLLING_ANOMALY_ORACLE)
def q_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    # microsecond grain: a second-grain frame spanned 3601 wall seconds
    # AND excluded every same-second peer from "recent history", not just
    # the current row; (t - 1h, t) in exact microseconds is the stated
    # trailing-hour-excluding-the-current-instant definition
    w = (
        W.partitionBy("event_type")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-(3600 * 1_000_000 - 1), -1)
    )
    v = dec("value", VALUE)
    roll_sum = F.sum(v).over(w).cast("double")
    roll_n = F.count(F.lit(1)).over(w)
    dev = v.cast("double") - roll_sum / roll_n.cast("double")
    return (
        ev.select(
            "event_id",
            "event_type",
            v.cast("double").alias("value"),
            dev.alias("deviation"),
            roll_n.alias("_n"),
        )
        .filter((F.col("_n") >= 5) & (F.abs(F.col("deviation")) > 150.0))
        .drop("_n")
    )


# --------------------------------------------------------------------------
# q_grouped_ols — per-type linear trend of event value over time, fitted
# INSIDE a pandas UDF (applyInPandas) yet still oracle-exact: the pandas
# side accumulates int64 cents/hours (exact, order-free) and applies the
# same FMA-immune closed form as the SQL. The template for custom Python
# operators that must pass the correctness gate (see functions/mlfit.py).
# --------------------------------------------------------------------------
Q_OLS_ORACLE = """
WITH prep AS (
  SELECT event_type AS "group",
    (epoch_us(ts) - 1704067200000000) // 3600000000 AS x,
    CAST(round(value * 100) AS BIGINT) AS y
  FROM events
), sums AS (
  SELECT "group", COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM prep GROUP BY "group"
)
-- zero-variance-x guard mirrors mlfit._ols_fit: a group whose xs are all
-- equal gets slope 0 / intercept mean (a bare division would emit
-- NaN/Inf here but 0/mean in the pandas fitter — an engine divergence)
SELECT "group", n,
  CASE WHEN (CAST(sxx AS DOUBLE) - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) = 0 THEN 0.0
    ELSE (CAST(sxy AS DOUBLE) - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / CAST(n AS DOUBLE))
      / (CAST(sxx AS DOUBLE) - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))
  END AS slope,
  CASE WHEN (CAST(sxx AS DOUBLE) - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) = 0
    THEN CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
    ELSE CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
      - (((CAST(sxy AS DOUBLE) - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / CAST(n AS DOUBLE))
          / (CAST(sxx AS DOUBLE) - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)))
         * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
  END AS intercept,
  CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y
FROM sums
"""


@query("q_grouped_ols", Q_OLS_ORACLE)
def q_grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.functions.mlfit import grouped_ols

    ev = tables.load(spark, sf_dir, "events")
    return grouped_ols(ev, "event_type", "ts", "value")


# --------------------------------------------------------------------------
# q_retention_cohorts — weekly cohort retention: users grouped by first-
# activity week, counted in each subsequent week they return. Two
# aggregations (first-activity per user; distinct users per cohort-week
# offset) joined on user — the canonical product-analytics rollup, and a
# double-aggregation shape distinct from q13's. Weeks are integer
# epoch-day arithmetic (epoch_us // 86400e6 // 7): no weekofyear/locale
# ambiguity between engines, and weekly granularity fits the test
# corpus's one-month span (monthly degenerates to one cell).
# --------------------------------------------------------------------------
Q_RETENTION_ORACLE = """
WITH activity AS (
  SELECT DISTINCT user_id,
    (epoch_us(ts) // 86400000000) // 7 AS wk
  FROM events
), cohort AS (
  SELECT user_id, min(wk) AS cohort_wk FROM activity GROUP BY user_id
)
SELECT c.cohort_wk, a.wk - c.cohort_wk AS week_offset,
  COUNT(DISTINCT a.user_id) AS n_active
FROM activity a JOIN cohort c ON a.user_id = c.user_id
GROUP BY c.cohort_wk, week_offset
"""


@query("q_retention_cohorts", Q_RETENTION_ORACLE)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    wk = F.expr("(unix_micros(ts) div 86400000000) div 7")
    activity = ev.select("user_id", wk.alias("wk")).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        activity.join(cohort, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


# --------------------------------------------------------------------------
# q_event_transitions — first-order Markov transition matrix over each
# user's event sequence: P(next=b | cur=a) as exact integer counts and an
# exact-division probability. One lag window per user + one aggregation —
# the n-gram language model over behavioral sequences (session-path
# mining, anomaly priors for sequences).
# --------------------------------------------------------------------------
Q_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT event_type AS cur,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), pairs AS (
  SELECT cur, nxt, COUNT(*) AS n FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
), totals AS (
  SELECT cur, SUM(n) AS tot FROM pairs GROUP BY cur
)
SELECT p.cur, p.nxt, p.n,
  CAST(p.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS prob
FROM pairs p JOIN totals t ON p.cur = t.cur
"""


@query("q_event_transitions", Q_TRANSITIONS_ORACLE)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    totals = pairs.groupBy("cur").agg(F.sum("n").alias("tot"))
    return pairs.join(F.broadcast(totals), "cur").select(
        "cur",
        "nxt",
        "n",
        (F.col("n").cast("double") / F.col("tot").cast("double")).alias("prob"),
    )


# --------------------------------------------------------------------------
# q_cooccurrence_lift — association mining without logs: for event-type
# pairs co-occurring in the same (user, hour) context, lift =
# P(a,b) / (P(a) P(b)) computed as the exact integer-count expression
# (nab * nctx) / (na * nb). Integer products stay far under 2^53 and
# every multiply feeds a division -> engine-identical doubles (the PMI
# log transform is monotone in lift, so ranking by lift IS ranking by
# PMI — without the non-reproducible transcendental).
# --------------------------------------------------------------------------
Q_LIFT_ORACLE = """
WITH ctx AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS hr, event_type
  FROM events
), n_ctx AS (
  SELECT COUNT(DISTINCT (user_id, hr)) AS nc FROM ctx
), singles AS (
  SELECT event_type, COUNT(*) AS n1 FROM ctx GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS nab
  FROM ctx a JOIN ctx b
    ON a.user_id = b.user_id AND a.hr = b.hr AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.nab,
  (CAST(p.nab AS DOUBLE) * CAST(n.nc AS DOUBLE))
    / (CAST(sa.n1 AS DOUBLE) * CAST(sb.n1 AS DOUBLE)) AS lift
FROM pairs p
JOIN singles sa ON sa.event_type = p.type_a
JOIN singles sb ON sb.event_type = p.type_b
CROSS JOIN n_ctx n
"""


@query("q_cooccurrence_lift", Q_LIFT_ORACLE)
def q_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    ctx = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 3600000000").alias("hr"),
        "event_type",
    ).distinct()
    n_ctx = ctx.select("user_id", "hr").distinct().agg(
        F.count(F.lit(1)).alias("nc")
    )
    singles = ctx.groupBy("event_type").agg(F.count(F.lit(1)).alias("n1"))
    a = ctx.select("user_id", "hr", F.col("event_type").alias("type_a"))
    b = ctx.select("user_id", "hr", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, ["user_id", "hr"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("nab"))
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("n1").alias("na"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("n1").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_ctx))
        .select(
            "type_a",
            "type_b",
            "nab",
            (
                (F.col("nab").cast("double") * F.col("nc").cast("double"))
                / (F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# q_mad_robust — median absolute deviation per group: the robust scale
# estimator that outlier-heavy metrics need (stddev is itself corrupted
# by the outliers it should flag). Two exact-percentile passes — the
# median reduces each group to one scalar which joins back broadcast,
# then the deviation median runs over the same grouping. Spark
# `percentile` == DuckDB `quantile_cont` bit-exact (q_percentiles).
# --------------------------------------------------------------------------
Q_MAD_ORACLE = """
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med_price
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag, m.med_price,
  quantile_cont(abs(l.l_extendedprice - m.med_price), 0.5) AS mad_price,
  COUNT(*) AS n
FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
GROUP BY l.l_returnflag, m.med_price
"""


@query("q_mad_robust", Q_MAD_ORACLE)
def q_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("med_price")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag", "med_price")
        .agg(
            F.expr("percentile(abs(l_extendedprice - med_price), 0.5)").alias(
                "mad_price"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
# q_null_imputation — mean-imputation of missing metrics: nulls (here
# synthesized on a deterministic subset, the test tables ship complete)
# are filled from their group's non-null decimal mean; the output flags
# which rows were imputed. Group means reduce to a broadcast join-back —
# scan-shaped, the standard feature-cleaning pass before model training.
# --------------------------------------------------------------------------
Q_IMPUTE_ORACLE = """
WITH holes AS (
  SELECT event_id, event_type,
    CASE WHEN event_id % 7 = 0 THEN NULL
         ELSE CAST(value AS DECIMAL(12,2)) END AS v
  FROM events
), means AS (
  SELECT event_type,
    CAST(SUM(v) AS DOUBLE) / CAST(COUNT(v) AS DOUBLE) AS mean_v
  FROM holes GROUP BY event_type
)
SELECT h.event_id, h.event_type,
  coalesce(CAST(h.v AS DOUBLE), m.mean_v) AS value,
  (h.v IS NULL) AS imputed
FROM holes h JOIN means m ON h.event_type = m.event_type
"""


@query("q_null_imputation", Q_IMPUTE_ORACLE)
def q_null_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    holes = ev.select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(dec("value", VALUE))
        .alias("v"),
    )
    means = holes.groupBy("event_type").agg(
        (F.sum("v").cast("double") / F.count("v").cast("double")).alias("mean_v")
    )
    return (
        holes.join(F.broadcast(means), "event_type")
        .select(
            "event_id",
            "event_type",
            F.coalesce(F.col("v").cast("double"), F.col("mean_v")).alias("value"),
            F.col("v").isNull().alias("imputed"),
        )
    )


# --------------------------------------------------------------------------
# q_heavy_hitters_cms — Count-Min Sketch heavy hitters over the corpus
# vocabulary: build the 4x512 seeded-md5 sketch from exact per-token
# counts (operators/sketch.py), then point-estimate the exact top-20
# tokens against it. Output pairs the exact count with the sketch
# estimate (est >= exact always; equality means no collision in some
# hash row). The oracle replays the ENTIRE sketch cell-for-cell in
# DuckDB — same tokenization, same seeded-md5 bucket addressing, same
# min-over-rows estimate — so the hash certifies the full sketch
# pipeline, not just the output shape.
# --------------------------------------------------------------------------
from forklift_spark.queries.dedup import NORM as _NORM  # noqa: E402

_CMS_H = (
    "CAST('0x' || substr(md5(concat('s', CAST({i} AS VARCHAR), ':', {t})), 1, 15) AS BIGINT) % 512"
)

CMS_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split({_NORM}, ' ')) AS t FROM documents
), cnt AS (
  SELECT t, count(*) AS c FROM tok WHERE t <> '' GROUP BY t
), hrows AS (
  SELECT unnest(range(0, 4)) AS i
), cms AS (
  SELECT i, {_CMS_H.format(i='i', t='t')} AS b, sum(c) AS cell
  FROM cnt CROSS JOIN hrows GROUP BY 1, 2
), top AS (
  SELECT t, c FROM cnt ORDER BY c DESC, t LIMIT 20
), est AS (
  SELECT top.t, top.c, min(cms.cell) AS est
  FROM top CROSS JOIN hrows
  JOIN cms ON cms.i = hrows.i AND cms.b = {_CMS_H.format(i='hrows.i', t='top.t')}
  GROUP BY 1, 2
)
SELECT t AS token, CAST(c AS BIGINT) AS exact_cnt, CAST(est AS BIGINT) AS cms_est
FROM est
"""


@query("q_heavy_hitters_cms", CMS_ORACLE)
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.operators import sketch as K
    from forklift_spark.operators.text import words

    docs = tables.load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(words("text")).alias("token")).filter(
        F.col("token") != ""
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    cms = K.cms_build(counts, "token", "cnt", depth=4, width=512)
    probes = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(20)
    est = K.cms_lookup(cms, probes.select("token"), "token", depth=4, width=512)
    return probes.join(est, "token").select(
        "token",
        F.col("cnt").cast("long").alias("exact_cnt"),
        F.col("cms_est").cast("long").alias("cms_est"),
    )


# --------------------------------------------------------------------------
# q_equidepth_histogram — equal-frequency (decile) histogram: exact
# interpolated decile boundaries reduce the corpus to ONE 9-value row
# (the same exact-percentile machinery as q_percentiles), broadcast back
# for scan-side bucket assignment, then one groupBy. The equi-depth
# companion to q_equiwidth_histogram that avoids the global sort an
# ntile formulation would need — at 100 TB the only full-data passes
# are the percentile aggregate and the bucketing scan.
# --------------------------------------------------------------------------
_DECILES = [round(0.1 * i, 1) for i in range(1, 10)]

EQUIDEPTH_ORACLE = f"""
WITH b AS (
  SELECT quantile_cont(value, {_DECILES}) AS bs FROM events
), assigned AS (
  SELECT e.value, 1 + len(list_filter(b.bs, x -> e.value > x)) AS bucket
  FROM events e CROSS JOIN b
)
SELECT bucket,
  CAST(count(*) AS BIGINT) AS n_rows,
  min(value) AS lo,
  max(value) AS hi
FROM assigned GROUP BY bucket
"""


@query("q_equidepth_histogram", EQUIDEPTH_ORACLE)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events").select("value")
    frac = ", ".join(str(d) for d in _DECILES)
    bounds = ev.agg(F.expr(f"percentile(value, array({frac}))").alias("bs"))
    assigned = ev.crossJoin(F.broadcast(bounds)).select(
        "value",
        (1 + F.size(F.filter("bs", lambda x: F.col("value") > x))).alias("bucket"),
    )
    return assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


# --------------------------------------------------------------------------
# q_stream_cms_build — the Count-Min grid MAINTAINED BY THE STREAMING
# ENGINE: the token stream (staged files, availableNow) explodes into
# (row, bucket) cell increments and the sketch is a streaming groupBy
# aggregation in complete mode. Because CMS cells are plain sums, the
# streamed grid must equal the batch-built sketch cell-for-cell — the
# oracle replays the batch build in DuckDB, certifying that streaming
# sketch maintenance converges to the batch sketch (the mergeability
# property live, not just asserted).
# --------------------------------------------------------------------------
STREAM_CMS_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split({_NORM}, ' ')) AS t FROM documents
), cnt AS (
  SELECT t, count(*) AS c FROM tok WHERE t <> '' GROUP BY t
), hrows AS (
  SELECT unnest(range(0, 4)) AS i
)
SELECT i AS row, {_CMS_H.format(i='i', t='t')} AS bucket,
       CAST(sum(c) AS BIGINT) AS cell
FROM cnt CROSS JOIN hrows GROUP BY 1, 2
"""


@query("q_stream_cms_build", STREAM_CMS_ORACLE)
def q_stream_cms_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    from forklift_spark.operators.sketch import _bucket_array
    from forklift_spark.operators.text import words

    from forklift_spark.streaming.jobs import (
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    docs = tables.load(spark, sf_dir, "documents")
    src = tempfile.mkdtemp(prefix="fk_stream_cms_")
    docs.select("doc_id", "text").repartition(8).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    cells = (
        stream.select(F.explode(words("text")).alias("token"))
        .filter(F.col("token") != "")
        .select(F.posexplode(_bucket_array("token", 4, 512)).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cell"))
    )
    sink = f"stream_cms_{uuid.uuid4().hex[:8]}"
    # Data-derived state partitions, same scoping as the other stateful
    # stream queries (optimization r9, VERDICT r8 item 3): the complete-
    # mode grid is 4x512 cells, but the state-store partition count pins
    # to spark.sql.shuffle.partitions at batch 0 — at 32 cores every one
    # of the 4 micro-batches paid 32 state commits over a few MB of
    # staged input. The r8 A/B that left this query alone ran at 8
    # cores, where the effect is 4x smaller.
    with scoped_shuffle_partitions(
        spark, stream_state_partitions(spark, src)
    ):
        q = (
            cells.writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), (
            "stream did not finish; sketch would be partial"
        )
    return spark.table(sink).select(
        "row", "bucket", F.col("cell").cast("long").alias("cell")
    )


# --------------------------------------------------------------------------
# q_hll_portable — HyperLogLog with every step oracle-replayable: the
# production rollup (operators/layout.py) rightly uses Spark's native
# Datasketches HLL (binary sketches, rows-only check); this portable
# twin certifies the sketch MATH cross-engine. 60-bit md5 hashes split
# into 256 buckets + a 52-bit field whose leading-zero count (via the
# engine-portable bin() length) gives rho; registers are max(rho); the
# '__all__' row is the register-wise-max MERGE of all groups (the
# mergeability property live); and the harmonic sum is kept EXACT by
# scaling to integers (sum of 2^(53-M) fits in a BIGINT), so the only
# double op is one final division. Raw estimate (no small/large-range
# correction — documented) sits next to the exact distinct count.
# --------------------------------------------------------------------------
_HLL_H = "CAST('0x' || substr(md5('h:' || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)"
# computed once in Python and embedded as the SAME scientific-notation
# double literal on both sides: plain decimal literals parse as DECIMAL
# (not DOUBLE) in both engines, with different division semantics
_HLL_ALPHA = repr((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 9007199254740992.0)

HLL_PORTABLE_ORACLE = f"""
WITH h AS (
  SELECT event_type, {_HLL_H} % 256 AS bucket, {_HLL_H} // 256 AS rest
  FROM events
), rho AS (
  SELECT event_type, bucket,
    CASE WHEN rest = 0 THEN 53 ELSE 52 - length(bin(rest)) + 1 END AS r
  FROM h
), regs AS (
  SELECT event_type, bucket, max(r) AS m FROM rho GROUP BY 1, 2
), merged AS (
  SELECT '__all__' AS event_type, bucket, max(m) AS m FROM regs GROUP BY 2
), allregs AS (
  SELECT * FROM regs UNION ALL SELECT * FROM merged
), agg AS (
  SELECT event_type,
    CAST(count(*) AS BIGINT) AS n_registers_set,
    (256 - count(*)) * 9007199254740992 + sum(CAST(1 AS BIGINT) << (53 - m)) AS s_scaled
  FROM allregs GROUP BY 1
), exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY 1
  UNION ALL
  SELECT '__all__', CAST(count(DISTINCT user_id) AS BIGINT) FROM events
)
SELECT a.event_type, a.n_registers_set,
  CAST(a.s_scaled AS BIGINT) AS s_scaled,
  round({_HLL_ALPHA} / a.s_scaled, 6) AS raw_estimate,
  e.exact_distinct
FROM agg a JOIN exact e USING (event_type)
"""


@query("q_hll_portable", HLL_PORTABLE_ORACLE)
def q_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events").select("event_type", "user_id")
    # Spark renders md5_long via conv(); the '0x'-cast form is DuckDB-only
    h_spark = (
        "CAST(conv(substr(md5('h:' || CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    )
    h = ev.selectExpr(
        "event_type",
        f"{h_spark} % 256 AS bucket",
        f"{h_spark} div 256 AS rest",
    )
    rho = h.selectExpr(
        "event_type", "bucket",
        "CASE WHEN rest = 0 THEN 53 ELSE 52 - length(bin(rest)) + 1 END AS r",
    )
    regs = rho.groupBy("event_type", "bucket").agg(F.max("r").alias("m"))
    merged = regs.groupBy("bucket").agg(F.max("m").alias("m")).select(
        F.lit("__all__").alias("event_type"), "bucket", "m"
    )
    allregs = regs.select("event_type", "bucket", "m").unionByName(merged)
    agg = allregs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_registers_set"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - m)")).alias("sum_set"),
    ).selectExpr(
        "event_type", "n_registers_set",
        "(256 - n_registers_set) * 9007199254740992 + sum_set AS s_scaled",
    )
    exact = (
        ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").cast("bigint").alias("exact_distinct"))
        .unionByName(
            ev.agg(F.count_distinct("user_id").cast("bigint").alias("exact_distinct"))
            .select(F.lit("__all__").alias("event_type"), "exact_distinct")
        )
    )
    return agg.join(exact, "event_type").selectExpr(
        "event_type", "n_registers_set",
        "CAST(s_scaled AS BIGINT) AS s_scaled",
        f"round({_HLL_ALPHA} / s_scaled, 6) AS raw_estimate",
        "exact_distinct",
    )


# --------------------------------------------------------------------------
# q_quantile_sketch — mergeable log-binned quantile estimation
# (operators/sketch.py:qsketch_build). The bounded-memory alternative to
# a global-sort exact percentile: integer-only bucketing (bit length +
# power-of-2 steps, both engine-portable), bounded bucket table, rank
# interpolation in integer arithmetic. The oracle rebuilds the ENTIRE
# sketch and replays the rank extraction, certifying bucket boundaries,
# counts, and the interpolation formula cell-for-cell. Guaranteed
# relative error <= 2^-5 per estimate (mantissa_bits=5); accuracy vs the
# true rank statistic is test-pinned (tests/test_sketch.py).
# --------------------------------------------------------------------------
_QS_CENTS = "CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)"
_QS_PCTS = (25, 50, 75, 90, 99)

QSKETCH_ORACLE = f"""
WITH v AS (
  SELECT {_QS_CENTS} AS v FROM orders
), b AS (
  SELECT v,
    greatest(length(bin(v)) - 6, 0) AS shift
  FROM v
), e AS (
  SELECT v, CAST(pow(2.0, shift) AS BIGINT) AS step FROM b
), buckets AS (
  SELECT v - (v % step) AS lo, v - (v % step) + step - 1 AS hi,
    CAST(count(*) AS BIGINT) AS cnt
  FROM e GROUP BY 1, 2
), cum AS (
  SELECT lo, hi, cnt,
    SUM(cnt) OVER (ORDER BY lo ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM buckets
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM buckets
), ranks AS (
  SELECT pct, n, (n * pct + 99) // 100 AS r
  FROM (VALUES (25), (50), (75), (90), (99)) AS q(pct) CROSS JOIN tot
), owner AS (
  SELECT r.pct, r.n, r.r, min(c.lo) AS lo
  FROM ranks r JOIN cum c ON c.cum >= r.r
  GROUP BY r.pct, r.n, r.r
)
SELECT CAST(o.pct AS BIGINT) AS pct, o.n, CAST(o.r AS BIGINT) AS r,
  CAST(c.lo + (CASE WHEN (c.hi - c.lo) <= 4611686018427387904 // greatest(o.r - (c.cum - c.cnt), 1) THEN ((c.hi - c.lo) * (o.r - (c.cum - c.cnt))) // c.cnt ELSE CAST(FLOOR(CAST(c.hi - c.lo AS DOUBLE) * CAST(o.r - (c.cum - c.cnt) AS DOUBLE) / CAST(c.cnt AS DOUBLE)) AS BIGINT) END) AS BIGINT) AS est
FROM owner o JOIN cum c ON o.lo = c.lo
"""


@query("q_quantile_sketch", QSKETCH_ORACLE)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.operators.sketch import qsketch_build, qsketch_quantiles

    orders = tables.load(spark, sf_dir, "orders")
    vals = orders.select(F.expr(_QS_CENTS).alias("v"))
    return qsketch_quantiles(qsketch_build(vals, "v"), list(_QS_PCTS))


# --------------------------------------------------------------------------
# q_grouped_quantiles — per-key quantile estimation from the same
# mergeable log-binned sketch, the properly-partitioned 100 TB shape:
# one keyed shuffle builds every group's bounded bucket set, the cum
# window partitions BY KEY (never a global window), and the owner join
# rides the key equality (hash join; the rank range is a post-filter) so
# high-cardinality key spaces never broadcast. Oracle replays per-key
# buckets, windowed cumulative counts, and rank interpolation.
# --------------------------------------------------------------------------
GROUPED_Q_ORACLE = f"""
WITH v AS (
  SELECT o_orderpriority AS grp, {_QS_CENTS} AS v FROM orders
), e AS (
  SELECT grp, v,
    CAST(pow(2.0, greatest(length(bin(v)) - 6, 0)) AS BIGINT) AS step
  FROM v
), buckets AS (
  SELECT grp, v - (v % step) AS lo, v - (v % step) + step - 1 AS hi,
    CAST(count(*) AS BIGINT) AS cnt
  FROM e GROUP BY 1, 2, 3
), cum AS (
  SELECT grp, lo, hi, cnt,
    SUM(cnt) OVER (PARTITION BY grp ORDER BY lo
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM buckets
), tot AS (
  SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n FROM buckets GROUP BY grp
), ranks AS (
  SELECT grp, pct, n, (n * pct + 99) // 100 AS r
  FROM (VALUES (50), (90), (99)) AS q(pct) CROSS JOIN tot
), owner AS (
  SELECT r.grp, r.pct, r.n, r.r, min(c.lo) AS lo
  FROM ranks r JOIN cum c ON c.grp = r.grp AND c.cum >= r.r
  GROUP BY r.grp, r.pct, r.n, r.r
)
SELECT o.grp, CAST(o.pct AS BIGINT) AS pct, o.n, CAST(o.r AS BIGINT) AS r,
  CAST(c.lo + (CASE WHEN (c.hi - c.lo) <= 4611686018427387904 // greatest(o.r - (c.cum - c.cnt), 1) THEN ((c.hi - c.lo) * (o.r - (c.cum - c.cnt))) // c.cnt ELSE CAST(FLOOR(CAST(c.hi - c.lo AS DOUBLE) * CAST(o.r - (c.cum - c.cnt) AS DOUBLE) / CAST(c.cnt AS DOUBLE)) AS BIGINT) END) AS BIGINT) AS est
FROM owner o JOIN cum c ON o.grp = c.grp AND o.lo = c.lo
"""


@query("q_grouped_quantiles", GROUPED_Q_ORACLE)
def q_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.operators.sketch import qsketch_build, qsketch_quantiles

    orders = tables.load(spark, sf_dir, "orders")
    vals = orders.select(
        F.col("o_orderpriority").alias("grp"), F.expr(_QS_CENTS).alias("v")
    )
    return qsketch_quantiles(
        qsketch_build(vals, "v", by=("grp",)), [50, 90, 99], by=("grp",)
    )


# --------------------------------------------------------------------------
# q_stream_qsketch — the log-binned quantile sketch MAINTAINED BY THE
# STREAMING ENGINE: order values arrive in staged micro-batches and the
# bucket grid is a streaming groupBy in complete mode. Bucket counts are
# plain sums, so the streamed sketch must equal the batch-built sketch
# cell-for-cell (the same live-mergeability certification as
# q_stream_cms_build, for the quantile-profiling sketch). The oracle
# replays the batch bucket build.
# --------------------------------------------------------------------------
STREAM_QSKETCH_ORACLE = f"""
WITH v AS (
  SELECT {_QS_CENTS} AS v FROM orders
), e AS (
  SELECT v, CAST(pow(2.0, greatest(length(bin(v)) - 6, 0)) AS BIGINT) AS step
  FROM v
)
SELECT v - (v % step) AS lo, v - (v % step) + step - 1 AS hi,
  CAST(count(*) AS BIGINT) AS cnt
FROM e GROUP BY 1, 2
"""


@query("q_stream_qsketch", STREAM_QSKETCH_ORACLE)
def q_stream_qsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    orders = tables.load(spark, sf_dir, "orders")
    src = tempfile.mkdtemp(prefix="fk_stream_qs_")
    orders.select(F.expr(_QS_CENTS).alias("v")).repartition(8).write.mode(
        "overwrite"
    ).parquet(src)
    stream = (
        spark.readStream.schema("v long")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    bits = F.length(F.bin(F.col("v")))
    step = F.pow(F.lit(2.0), F.greatest(bits - F.lit(6), F.lit(0)).cast("double")).cast(
        "bigint"
    )
    cells = (
        stream.select(
            (F.col("v") - F.pmod("v", step)).alias("lo"), step.alias("_step")
        )
        .select("lo", (F.col("lo") + F.col("_step") - 1).alias("hi"))
        .groupBy("lo", "hi")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sink = f"stream_qs_{uuid.uuid4().hex[:8]}"
    from forklift_spark.streaming.jobs import (
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    with scoped_shuffle_partitions(
        spark, stream_state_partitions(spark, src)
    ):
        q = (
            cells.writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), \
            "stream did not finish; sketch would be partial"
    return spark.table(sink).select(
        "lo", "hi", F.col("cnt").cast("long").alias("cnt")
    )


# --------------------------------------------------------------------------
# q_k_anonymity — re-identification risk audit (Sweeney's k-anonymity):
# group the table by its quasi-identifier combination and report the
# group-size distribution plus which equivalence classes fall below
# k=5 (every row in such a class is re-identifiable within < k
# candidates). The acctbal quasi-identifier is generalized to $100
# bands scan-side (floor of an IEEE-exact double division — portable).
# Plan: one keyed aggregation, then a bounded size-histogram
# aggregation — scan + two tiny shuffles at any scale. The governance
# preflight before releasing a curated dataset with demographic-like
# columns.
# --------------------------------------------------------------------------
_KANON_K = 5

KANON_ORACLE = f"""
WITH q AS (
  SELECT c_nationkey, c_mktsegment,
    CAST(FLOOR(c_acctbal / 100.0) AS BIGINT) * 100 AS bal_band
  FROM customer
), classes AS (
  SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS sz
  FROM q GROUP BY 1, 2, 3
)
SELECT CAST(sz AS BIGINT) AS group_size,
  CAST(count(*) AS BIGINT) AS n_groups,
  CAST(sz * count(*) AS BIGINT) AS n_rows,
  (sz < {_KANON_K}) AS below_k
FROM classes GROUP BY sz
"""


@query("q_k_anonymity", KANON_ORACLE)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tables.load(spark, sf_dir, "customer")
    classes = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            (F.floor(F.col("c_acctbal") / 100.0) * 100).alias("bal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return classes.groupBy("sz").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        (F.col("sz") * F.count(F.lit(1))).cast("bigint").alias("n_rows"),
    ).select(
        F.col("sz").cast("bigint").alias("group_size"),
        "n_groups",
        "n_rows",
        (F.col("sz") < _KANON_K).alias("below_k"),
    )


# --------------------------------------------------------------------------
# q_l_diversity — the companion governance audit to q_k_anonymity
# (Machanavajjhala et al.): a release is l-diverse when every
# quasi-identifier equivalence class carries at least l DISTINCT values
# of the sensitive attribute — k-anonymity alone fails when a class is
# large but homogeneous (everyone in it shares the secret). Classes are
# the same (nation, segment, $100-balance-band) triple; the sensitive
# attribute is the customer's order priority. Reported as a bounded
# histogram over l (classes with no orders have l = 0). Plan: one
# equi-join customer->orders, two keyed aggregations, one bounded
# histogram — every stage partitions by its key at 100 TB.
# --------------------------------------------------------------------------
_LDIV_L = 3

LDIV_ORACLE = f"""
WITH q AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
    CAST(FLOOR(c_acctbal / 100.0) AS BIGINT) * 100 AS bal_band
  FROM customer
), sz AS (
  SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS n_cust
  FROM q GROUP BY 1, 2, 3
), lv AS (
  SELECT q.c_nationkey, q.c_mktsegment, q.bal_band,
    count(DISTINCT o.o_orderpriority) AS l
  FROM q JOIN orders o ON o.o_custkey = q.c_custkey
  GROUP BY 1, 2, 3
), classes AS (
  SELECT sz.n_cust, coalesce(lv.l, 0) AS l
  FROM sz LEFT JOIN lv USING (c_nationkey, c_mktsegment, bal_band)
)
SELECT CAST(l AS BIGINT) AS l_distinct,
  CAST(count(*) AS BIGINT) AS n_classes,
  CAST(sum(n_cust) AS BIGINT) AS n_customers,
  (l < {_LDIV_L}) AS below_l
FROM classes GROUP BY l
"""


@query("q_l_diversity", LDIV_ORACLE)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tables.load(spark, sf_dir, "customer")
    orders = tables.load(spark, sf_dir, "orders")
    q = cust.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        (F.floor(F.col("c_acctbal") / 100.0) * 100).alias("bal_band"),
    )
    keys = ["c_nationkey", "c_mktsegment", "bal_band"]
    sz = q.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_cust"))
    lv = (
        q.join(orders, q.c_custkey == orders.o_custkey)
        .groupBy(*keys)
        .agg(F.countDistinct("o_orderpriority").alias("l"))
    )
    classes = sz.join(lv, keys, "left").select(
        "n_cust", F.coalesce(F.col("l"), F.lit(0)).alias("l")
    )
    return classes.groupBy("l").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("n_cust").cast("bigint").alias("n_customers"),
    ).select(
        F.col("l").cast("bigint").alias("l_distinct"),
        "n_classes",
        "n_customers",
        (F.col("l") < _LDIV_L).alias("below_l"),
    )


# --------------------------------------------------------------------------
# q_kmv_distinct — KMV (k-minimum-values) distinct sketches WITH SET
# ALGEBRA: per-segment cardinality estimates, a lossless union sketch,
# and an intersection estimate via the matched fraction of the union
# sketch — the capability HLL lacks (HLL unions but cannot intersect).
# Keys are (user, day) pairs; segments are click vs purchase events.
# Every sketch value is a deterministic md5, TakeOrderedAndProject
# keeps per-partition top-k heaps (no global sort), and the oracle
# rebuilds all three sketches value-for-value, so the hash certifies
# sketch construction, merge closure, the DV estimator arithmetic, and
# the exact-when-small fallback. exact_n rides along for an in-row
# error audit.
# --------------------------------------------------------------------------
_KMV_K = 64
_KMV_NUMER = float((_KMV_K - 1) * (1 << 60))  # (k-1) * 2^60, one exact double


def _kmv_oracle() -> str:
    from forklift_spark.functions.hashing import md5_long_sql

    h = md5_long_sql("key")
    def est(t: str) -> str:
        return (
            f"CASE WHEN {t}.ns < {_KMV_K} THEN CAST({t}.ns AS DOUBLE) "
            f"ELSE {_KMV_NUMER!r} / CAST({t}.hm AS DOUBLE) END"
        )
    return f"""
WITH keys AS (
  SELECT event_type,
    user_id || '@' || date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS key
  FROM events WHERE event_type IN ('click', 'purchase')
), ha AS (SELECT DISTINCT {h} AS h FROM keys WHERE event_type = 'click'),
hb AS (SELECT DISTINCT {h} AS h FROM keys WHERE event_type = 'purchase'),
ska AS (SELECT h FROM ha ORDER BY h LIMIT {_KMV_K}),
skb AS (SELECT h FROM hb ORDER BY h LIMIT {_KMV_K}),
sku AS (
  SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb)
  ORDER BY h LIMIT {_KMV_K}
),
ea AS (SELECT count(*) AS ns, max(h) AS hm FROM ska),
eb AS (SELECT count(*) AS ns, max(h) AS hm FROM skb),
eu AS (SELECT count(*) AS ns, max(h) AS hm FROM sku),
mt AS (
  SELECT count(*) AS m FROM sku
  WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)
),
na AS (SELECT count(*) AS c FROM ha),
nb AS (SELECT count(*) AS c FROM hb),
nu AS (SELECT count(*) AS c FROM (SELECT h FROM ha UNION SELECT h FROM hb)),
ni AS (SELECT count(*) AS c FROM ha WHERE h IN (SELECT h FROM hb))
SELECT 'click' AS set_name, CAST(na.c AS BIGINT) AS exact_n,
       CAST(ea.ns AS BIGINT) AS n_sketch, {est("ea")} AS est
FROM ea, na
UNION ALL
SELECT 'purchase', CAST(nb.c AS BIGINT), CAST(eb.ns AS BIGINT), {est("eb")}
FROM eb, nb
UNION ALL
SELECT 'union', CAST(nu.c AS BIGINT), CAST(eu.ns AS BIGINT), {est("eu")}
FROM eu, nu
UNION ALL
SELECT 'intersection', CAST(ni.c AS BIGINT), CAST(mt.m AS BIGINT),
  CASE WHEN eu.ns < {_KMV_K} THEN CAST(mt.m AS DOUBLE)
       ELSE CAST(mt.m AS DOUBLE) * ({est("eu")})
            / {float(_KMV_K)!r} END AS est
FROM eu, mt, ni
"""


@query("q_kmv_distinct", _kmv_oracle())
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.functions.hashing import md5_long
    from forklift_spark.operators import sketch as K

    ev = tables.load(spark, sf_dir, "events")
    key = F.concat(
        F.col("user_id").cast("string"),
        F.lit("@"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast("string"),
    )
    keys = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_type", key.alias("key")
    )
    ha = (
        keys.filter(F.col("event_type") == "click")
        .select(md5_long(F.col("key")).alias("h"))
        .distinct()
        .persist()
    )
    hb = (
        keys.filter(F.col("event_type") == "purchase")
        .select(md5_long(F.col("key")).alias("h"))
        .distinct()
        .persist()
    )
    ska = ha.orderBy("h").limit(_KMV_K).persist()
    skb = hb.orderBy("h").limit(_KMV_K).persist()
    sku = K.kmv_merge(_KMV_K, ska, skb).persist()

    def seg_row(name: str, hashes: DataFrame, sk: DataFrame) -> DataFrame:
        exact = hashes.agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
        return (
            K.kmv_estimate(sk, _KMV_K)
            .crossJoin(F.broadcast(exact))  # 1-row scalar frames
            .select(
                F.lit(name).alias("set_name"), "exact_n",
                F.col("n_sketch"), "est",
            )
        )

    hu = ha.unionByName(hb).distinct()
    matched = (
        sku.join(ska, "h", "left_semi")
        .join(skb, "h", "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    exact_i = ha.join(hb, "h", "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_n")
    )
    eu = K.kmv_estimate(sku, _KMV_K)
    inter_row = (
        eu.crossJoin(F.broadcast(matched))  # 1-row scalar frames
        .crossJoin(F.broadcast(exact_i))
        .select(
            F.lit("intersection").alias("set_name"),
            "exact_n",
            F.col("m").alias("n_sketch"),
            F.when(F.col("n_sketch") < _KMV_K, F.col("m").cast("double"))
            .otherwise(
                F.col("m").cast("double") * F.col("est") / F.lit(float(_KMV_K))
            )
            .alias("est"),
        )
    )
    return (
        seg_row("click", ha, ska)
        .unionByName(seg_row("purchase", hb, skb))
        .unionByName(seg_row("union", hu, sku))
        .unionByName(inter_row)
    )


# --------------------------------------------------------------------------
# q_welch_ab — A/B experiment analysis end to end: deterministic traffic
# split (variant = md5(user) % 2 — the idempotent bucketing a real
# experiment framework uses, so a user re-lands in the same arm on every
# scan), then a per-event-type two-sample Welch t-test on value. All
# moments come from exact decimal power sums (order-independent at any
# parallelism); t and the Welch–Satterthwaite df are final double
# expressions shared verbatim with the oracle, rounded at 9 dp because
# the (s2 - s1²/n) shape is contraction-sensitive (see q_stats_moments).
# Scale shape: one scan, one tiny (type × variant) aggregate, one
# broadcast self-join — no window, no second pass.
# --------------------------------------------------------------------------
_VARIANT_SQL = (
    "CAST('0x' || substr(md5(concat('u:', CAST(user_id AS VARCHAR))), 1, 15) AS BIGINT) % 2"
)

WELCH_AB_ORACLE = f"""
WITH s AS (
  SELECT event_type, {_VARIANT_SQL} AS variant,
    COUNT(*) AS n,
    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s1,
    CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s2
  FROM events
  GROUP BY 1, 2
), m AS (
  SELECT event_type, variant, n,
    s1 / CAST(n AS DOUBLE) AS mean,
    (s2 - (s1 * s1) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var
  FROM s
), w AS (
  SELECT a.event_type,
    a.n AS n_a, b.n AS n_b,
    a.mean AS mean_a, b.mean AS mean_b,
    a.var / CAST(a.n AS DOUBLE) + b.var / CAST(b.n AS DOUBLE) AS se2,
    a.var / CAST(a.n AS DOUBLE) AS va, b.var / CAST(b.n AS DOUBLE) AS vb
  FROM m a JOIN m b ON a.event_type = b.event_type
  WHERE a.variant = 0 AND b.variant = 1
)
SELECT event_type,
  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  round(mean_a, 9) AS mean_a, round(mean_b, 9) AS mean_b,
  round((mean_a - mean_b) / sqrt(se2), 9) AS t_stat,
  round(se2 * se2 / (va * va / CAST(n_a - 1 AS DOUBLE)
                     + vb * vb / CAST(n_b - 1 AS DOUBLE)), 9) AS welch_df,
  abs((mean_a - mean_b) / sqrt(se2)) > 1.96 AS significant
FROM w
"""


@query("q_welch_ab", WELCH_AB_ORACLE)
def q_welch_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.functions.hashing import md5_long

    ev = tables.load(spark, sf_dir, "events")
    v = dec("value", VALUE)
    s = (
        ev.withColumn(
            "variant",
            md5_long(F.concat(F.lit("u:"), F.col("user_id").cast("string"))) % 2,
        )
        .groupBy("event_type", "variant")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).cast("double").alias("s1"),
            F.sum(v * v).cast("double").alias("s2"),
        )
    )
    n_d = F.col("n").cast("double")
    m = s.select(
        "event_type",
        "variant",
        "n",
        (F.col("s1") / n_d).alias("mean"),
        (
            (F.col("s2") - (F.col("s1") * F.col("s1")) / n_d)
            / (F.col("n") - F.lit(1)).cast("double")
        ).alias("var"),
    )
    a = m.filter(F.col("variant") == 0).select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("mean").alias("mean_a"),
        (F.col("var") / F.col("n").cast("double")).alias("va"),
    )
    b = m.filter(F.col("variant") == 1).select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("mean").alias("mean_b"),
        (F.col("var") / F.col("n").cast("double")).alias("vb"),
    )
    se2 = F.col("va") + F.col("vb")
    t = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2)
    df = (se2 * se2) / (
        F.col("va") * F.col("va") / (F.col("n_a") - F.lit(1)).cast("double")
        + F.col("vb") * F.col("vb") / (F.col("n_b") - F.lit(1)).cast("double")
    )
    return a.join(b, "event_type").select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("mean_a", 9).alias("mean_a"),
        F.round("mean_b", 9).alias("mean_b"),
        F.round(t, 9).alias("t_stat"),
        F.round(df, 9).alias("welch_df"),
        (F.abs(t) > F.lit(1.96)).alias("significant"),
    )


# --------------------------------------------------------------------------
# q_psi_drift — Population Stability Index between a reference and a
# current period (the standard production drift monitor for a corpus or
# feature pipeline): per event type, decile bins are fitted on the
# REFERENCE window only, both windows are bucketed against those frozen
# boundaries, and PSI = Σ (pc − pr)·ln(pc/pr) with add-one (Laplace)
# smoothing so an empty current bin stays finite. Boundaries are
# DISCRETE rank-selected values — the read value at per-type rank
# ceil(d·n/10) under a (value, event_id) total order — NOT interpolated
# percentiles: Spark `percentile` and DuckDB `quantile_cont` interpolate
# with different FP groupings (measured 29.8 vs 29.800000000000004 on
# this very column), so an interpolated edge can land epsilon across a
# data value on one engine only (ADVICE r3); a read value is
# bit-identical by construction. Engine exactness: the ln argument is
# ONE division of two exact integer products (ln bit-parity on such
# doubles is measured — see q_dsir_weights), each bin's contribution is
# quantized to 1e-12 units at the 10-bin frame, and the per-type total
# is a BIGINT sum — order-independent at any parallelism. Scale shape:
# the fit is a per-type rank window (the q_quantile_normalize documented
# trade), then one bucketing scan per window with the 9-edge frame
# broadcast; no global sort.
# --------------------------------------------------------------------------
_PSI_SPLIT = "2024-01-15"

PSI_ORACLE = f"""
WITH ref AS (
  SELECT event_type, value, event_id FROM events WHERE ts < TIMESTAMP '{_PSI_SPLIT}'
), cur AS (
  SELECT event_type, value FROM events WHERE ts >= TIMESTAMP '{_PSI_SPLIT}'
), rkd AS (
  SELECT event_type, value,
    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ref
), b AS (
  SELECT event_type, list(bv ORDER BY d) AS bs
  FROM (
    SELECT r.event_type, d.d, r.value AS bv
    FROM rkd r
    JOIN (SELECT unnest(range(1, 10)) AS d) d
      ON r.rk = (d.d * r.n + 9) // 10
  )
  GROUP BY event_type
), rb AS (
  SELECT r.event_type, 1 + len(list_filter(b.bs, x -> r.value > x)) AS bucket,
         count(*) AS nr
  FROM ref r JOIN b USING (event_type) GROUP BY 1, 2
), cb AS (
  SELECT c.event_type, 1 + len(list_filter(b.bs, x -> c.value > x)) AS bucket,
         count(*) AS nc
  FROM cur c JOIN b USING (event_type) GROUP BY 1, 2
), tot AS (
  SELECT event_type,
    (SELECT count(*) FROM ref r WHERE r.event_type = b.event_type) AS tr,
    (SELECT count(*) FROM cur c WHERE c.event_type = b.event_type) AS tc
  FROM b
), bins AS (
  SELECT t.event_type, g.bucket,
    coalesce(rb.nr, 0) + 1 AS nr, coalesce(cb.nc, 0) + 1 AS nc,
    t.tr + 10 AS tr, t.tc + 10 AS tc
  FROM tot t
  CROSS JOIN (SELECT unnest(range(1, 11)) AS bucket) g
  LEFT JOIN rb ON rb.event_type = t.event_type AND rb.bucket = g.bucket
  LEFT JOIN cb ON cb.event_type = t.event_type AND cb.bucket = g.bucket
), contrib AS (
  SELECT event_type,
    CAST(round(
      (CAST(nc AS DOUBLE) / CAST(tc AS DOUBLE)
       - CAST(nr AS DOUBLE) / CAST(tr AS DOUBLE))
      * ln(CAST(nc * tr AS DOUBLE) / CAST(nr * tc AS DOUBLE)) * 1e12
    ) AS BIGINT) AS c_e12
  FROM bins
)
SELECT event_type,
  CAST((SELECT tr - 10 FROM bins b2 WHERE b2.event_type = contrib.event_type LIMIT 1) AS BIGINT) AS n_ref,
  CAST((SELECT tc - 10 FROM bins b2 WHERE b2.event_type = contrib.event_type LIMIT 1) AS BIGINT) AS n_cur,
  CAST(sum(c_e12) AS BIGINT) AS psi_e12,
  sum(c_e12) > 200000000000 AS drifted
FROM contrib GROUP BY event_type
"""


@query("q_psi_drift", PSI_ORACLE)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = tables.load(spark, sf_dir, "events")
    split = F.lit(_PSI_SPLIT).cast("timestamp")
    ref = ev.filter(F.col("ts") < split).select("event_type", "value")
    cur = ev.filter(F.col("ts") >= split).select("event_type", "value")
    # discrete rank-selected decile edges (see header comment): the value
    # at per-type rank ceil(d*n/10), derived by the INVERSE index map
    # (each rank serves deciles d in (10*(rk-1)/n, 10*rk/n]) — no join
    ranked = ev.filter(F.col("ts") < split).select(
        "event_type",
        "value",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("value", "event_id"))
        .alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("n"),
    )
    edges = (
        ranked.select(
            "event_type",
            F.col("value").alias("bv"),
            F.expr("(10 * (rk - 1)) div n + 1").alias("d_lo"),
            F.expr("least((10 * rk) div n, 9L)").alias("d_hi"),
        )
        .filter(F.col("d_hi") >= F.col("d_lo"))
        .select(
            "event_type", F.explode(F.expr("sequence(d_lo, d_hi)")).alias("d"), "bv"
        )
    )
    bounds = edges.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "bv"))), lambda s: s["bv"]
        ).alias("bs")
    )

    def bucketed(df: DataFrame, out: str) -> DataFrame:
        return (
            df.join(F.broadcast(bounds), "event_type")
            .select(
                "event_type",
                (1 + F.size(F.filter("bs", lambda x: F.col("value") > x))).alias(
                    "bucket"
                ),
            )
            .groupBy("event_type", "bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    rb = bucketed(ref, "nr")
    cb = bucketed(cur, "nc")
    tot = (
        ref.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("tr"))
        .join(cur.groupBy("event_type").agg(F.count(F.lit(1)).alias("tc")), "event_type")
    )
    grid = tot.select(
        "event_type", "tr", "tc", F.explode(F.sequence(F.lit(1), F.lit(10))).alias("bucket")
    )
    bins = (
        grid.join(rb, ["event_type", "bucket"], "left")
        .join(cb, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            (F.coalesce("nr", F.lit(0)) + 1).alias("nr"),
            (F.coalesce("nc", F.lit(0)) + 1).alias("nc"),
            (F.col("tr") + 10).alias("trs"),
            (F.col("tc") + 10).alias("tcs"),
        )
    )
    term = (
        F.col("nc").cast("double") / F.col("tcs").cast("double")
        - F.col("nr").cast("double") / F.col("trs").cast("double")
    ) * F.log(
        (F.col("nc") * F.col("trs")).cast("double")
        / (F.col("nr") * F.col("tcs")).cast("double")
    )
    contrib = bins.select(
        "event_type",
        "trs",
        "tcs",
        F.round(term * F.lit(1e12)).cast("long").alias("c_e12"),
    )
    return contrib.groupBy("event_type").agg(
        (F.first("trs") - F.lit(10)).cast("long").alias("n_ref"),
        (F.first("tcs") - F.lit(10)).cast("long").alias("n_cur"),
        F.sum("c_e12").cast("long").alias("psi_e12"),
        (F.sum("c_e12") > F.lit(200_000_000_000)).alias("drifted"),
    )


# --------------------------------------------------------------------------
# q_join_size_est — sketch-based join-cardinality estimation (the query-
# optimizer primitive: predict |A ⋈ B| before running the join).
# |orders ⋈ lineitem| on orderkey is Σ_k cA(k)·cB(k); the estimator
# hash-samples the KEY SPACE at rate 1/16 (md5 threshold — both sides
# sample the SAME keys, which is what makes frequency products
# observable) and scales the sampled product sum by 16 — integer-exact,
# so est = 16·Σ_sample is reproducible and the oracle replays sketch
# AND ground truth. The exact side is computed from per-key counts
# (group-join-sum, never the materialized join). Scale: two scans +
# key-keyed aggregates; the sampled side touches 1/16 of the key space.
# --------------------------------------------------------------------------
_JSE_RATE_LOG2 = 4  # sample keys where hash < 2^(60-4): rate 1/16
_JSE_THRESHOLD = 1 << (60 - _JSE_RATE_LOG2)

JOIN_SIZE_ORACLE = f"""
WITH ca AS (
  SELECT o_orderkey AS k, count(*) AS c FROM orders GROUP BY 1
), cb AS (
  SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1
), j AS (
  SELECT ca.k, ca.c * cb.c AS p,
    CAST('0x' || substr(md5(CAST(ca.k AS VARCHAR)), 1, 15) AS BIGINT)
      < {_JSE_THRESHOLD} AS sampled
  FROM ca JOIN cb USING (k)
)
SELECT 'orders_x_lineitem' AS join_name,
  CAST(sum(p) AS BIGINT) AS exact_rows,
  CAST({1 << _JSE_RATE_LOG2} * sum(p) FILTER (sampled) AS BIGINT) AS est_rows,
  CAST(count(*) FILTER (sampled) AS BIGINT) AS n_sampled_keys,
  round(abs(CAST({1 << _JSE_RATE_LOG2} * sum(p) FILTER (sampled) AS DOUBLE)
            - CAST(sum(p) AS DOUBLE)) / CAST(sum(p) AS DOUBLE), 9) AS rel_err
FROM j
"""


@query("q_join_size_est", JOIN_SIZE_ORACLE)
def q_join_size_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.functions.hashing import md5_long

    ca = (
        tables.load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    cb = (
        tables.load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    j = ca.join(cb, "k").select(
        (F.col("ca") * F.col("cb")).alias("p"),
        (md5_long(F.col("k").cast("string")) < _JSE_THRESHOLD).alias("sampled"),
    )
    scale = 1 << _JSE_RATE_LOG2
    agg = j.agg(
        F.sum("p").cast("bigint").alias("exact_rows"),
        (F.lit(scale) * F.sum(F.when(F.col("sampled"), F.col("p")).otherwise(0)))
        .cast("bigint")
        .alias("est_rows"),
        F.sum(F.col("sampled").cast("bigint")).cast("bigint").alias("n_sampled_keys"),
    )
    return agg.select(
        F.lit("orders_x_lineitem").alias("join_name"),
        "exact_rows",
        "est_rows",
        "n_sampled_keys",
        F.round(
            F.abs(F.col("est_rows").cast("double") - F.col("exact_rows").cast("double"))
            / F.col("exact_rows").cast("double"),
            9,
        ).alias("rel_err"),
    )


# --------------------------------------------------------------------------\n# q_quantile_normalize — per-group quantile normalization: each event
# type's values are mapped onto the GLOBAL value distribution at
# centile grain (rank r of n in its group -> the global
# ceil(100*r/n)-centile boundary value), the batch-effect correction
# used to make per-source feature distributions comparable before
# training. Boundaries are DISCRETE global percentiles — the actual
# value at global rank ceil(c*N/100) under a total (value, event_id)
# order — because Spark `percentile` and DuckDB `quantile_cont`
# interpolate with different floating-point groupings (measured here:
# 29.8 vs 29.800000000000004); rank selection is pure BIGINT
# arithmetic and the boundary is a READ value, bit-identical by
# construction. Spark derives each global rank's centile set by the
# INVERSE index map (explode of [c_lo..c_hi] — no join), the oracle
# by the forward join — two formulations, one boundary table. The
# boundary extraction's global window is rank-extraction over the
# (bounded) boundary count at scale via qsketch; documented trade.
# --------------------------------------------------------------------------
QUANTILE_NORM_ORACLE = """
WITH nn AS (SELECT COUNT(*) AS N FROM events),
g AS (
  SELECT value, row_number() OVER (ORDER BY value, event_id) AS grk FROM events
),
c AS (SELECT unnest(range(1, 101)) AS c),
b AS (
  SELECT c.c, g.value AS bv
  FROM c CROSS JOIN nn JOIN g ON g.grk = (c.c * nn.N + 99) // 100
),
r AS (
  SELECT event_id, event_type, value,
    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT r.event_id, r.event_type, r.value,
  CAST((100 * rk + n - 1) // n AS BIGINT) AS centile,
  b.bv AS norm
FROM r JOIN b ON b.c = (100 * rk + n - 1) // n
"""


@query("q_quantile_normalize", QUANTILE_NORM_ORACLE)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = tables.load(spark, sf_dir, "events")
    g = ev.select(
        "value",
        "event_id",
        F.row_number().over(W.orderBy("value", "event_id")).alias("grk"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("N"),
    )
    # inverse index map: global rank grk serves centiles c with
    # ceil(c*N/100) == grk, i.e. c in (100*(grk-1)/N, 100*grk/N]
    b = (
        g.select(
            F.col("value").alias("bv"),
            F.expr("(100 * (grk - 1)) div N + 1").alias("c_lo"),
            F.expr("least((100 * grk) div N, 100L)").alias("c_hi"),
        )
        .filter(F.col("c_hi") >= F.col("c_lo"))
        .select(F.explode(F.expr("sequence(c_lo, c_hi)")).alias("c"), "bv")
    )
    wr = W.partitionBy("event_type").orderBy("value", "event_id")
    wn = W.partitionBy("event_type")
    r = ev.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    ).withColumn("centile", F.expr("(100 * rk + n - 1) div n"))
    return (
        r.join(F.broadcast(b), r["centile"] == b["c"])  # bounded 100-row frame
        .select("event_id", "event_type", "value", "centile", F.col("bv").alias("norm"))
    )


# --------------------------------------------------------------------------
# q_dp_release — the Laplace mechanism for a private count release,
# replayed deterministically: per-cell noise is drawn by inverting the
# Laplace CDF at a HASH-derived uniform (md5 of the cell key onto a
# 52-bit dyadic rational), so both engines reproduce the identical
# draw. NOTE the privacy caveat, stated plainly: a seed derived from
# the protected data is NOT differential privacy — this query
# certifies the MECHANISM ARITHMETIC (scale b = sensitivity/epsilon =
# 1/0.5, inverse-CDF transform, non-negative clamp) that a production
# release would run with a real RNG, and the audit view deliberately
# publishes true counts beside released ones for exactly that reason.
# Engine exactness: u is an exact dyadic rational in (0,1), |2u-1| and
# 1-|2u-1| are exact, ln is bit-identical on identical doubles, and
# the final floor lands on integer 1e-6 units — one shared SQL
# expression evaluated by both engines.
# --------------------------------------------------------------------------
_DP_POW52 = 1 << 52
_DP_U = (
    "(CAST(CAST('0x' || substr(md5('dp:' || event_type), 1, 13) AS BIGINT)"
    f" % {_DP_POW52 - 1} + 1 AS DOUBLE) / {float(_DP_POW52)!r})"
)
_DP_NOISE_E6 = (
    f"CAST(floor(1e6 * (-2e0 * (CASE WHEN {_DP_U} >= 5e-1 THEN 1e0 ELSE -1e0 END)"
    f" * ln(1e0 - abs(2e0 * {_DP_U} - 1e0)))) AS BIGINT)"
)

DP_RELEASE_ORACLE = f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true,
  {_DP_NOISE_E6} AS noise_e6,
  greatest(0, COUNT(*) * 1000000 + {_DP_NOISE_E6}) AS released_e6
FROM events GROUP BY event_type
"""


@query("q_dp_release", DP_RELEASE_ORACLE)
def q_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    # Spark: '0x..' literal cast is DuckDB-only; conv() is the Spark twin
    u = (
        f"(CAST(CAST(conv(substr(md5('dp:' || event_type), 1, 13), 16, 10) AS BIGINT)"
        f" % {_DP_POW52 - 1} + 1 AS DOUBLE) / {float(_DP_POW52)!r})"
    )
    noise = (
        f"CAST(floor(1e6 * (-2e0 * (CASE WHEN {u} >= 5e-1 THEN 1e0 ELSE -1e0 END)"
        f" * ln(1e0 - abs(2e0 * {u} - 1e0)))) AS BIGINT)"
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true"),
        F.expr(noise).alias("noise_e6"),
        F.expr(f"greatest(0L, count(*) * 1000000L + {noise})").alias("released_e6"),
    )


# --------------------------------------------------------------------------
# q_benford_audit — Benford's-law first-digit audit (the classic
# fabricated-data / fraud screen): observed first-significant-digit
# counts of o_totalprice vs the Benford expectation P(d)=log10(1+1/d),
# with per-digit chi-square contributions. Exactness discipline: the
# nine Benford probabilities are 1e-9-quantized INTEGER literals (no
# cross-engine log10), expected counts are integer products, and each
# chi-square term is computed in double on bit-identical operands then
# 1e-9-requantized — so the sum is order-exact. First digit via string
# head of the absolute cents value (no FP log tricks).
# --------------------------------------------------------------------------
_BENFORD_Q = {
    1: 301029996, 2: 176091259, 3: 124938737, 4: 96910013,
    5: 79181246, 6: 66946790, 7: 57991947, 8: 51152522, 9: 45757491,
}
_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {q}" for d, q in _BENFORD_Q.items()
)

BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0
), obs AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM digits GROUP BY digit
), tot AS (
  SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs
), scored AS (
  SELECT o.digit, o.n_obs, t.n,
         CASE o.digit {_BENFORD_CASE} END AS p_q
  FROM obs o, tot t
)
SELECT digit, n_obs,
  CAST(n * p_q AS DOUBLE) / 1e9 AS expected,
  CAST(ROUND(
    ((CAST(n_obs AS DOUBLE) - CAST(n * p_q AS DOUBLE) / 1e9)
     * (CAST(n_obs AS DOUBLE) - CAST(n * p_q AS DOUBLE) / 1e9))
    / (CAST(n * p_q AS DOUBLE) / 1e9) * 1e9
  ) AS BIGINT) AS chi2_contrib_q
FROM scored
ORDER BY digit
"""


@query("q_benford_audit", BENFORD_ORACLE)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables.load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = orders.select(
        F.substring(
            (dec("o_totalprice", MONEY) * 100).cast("bigint").cast("string"),
            1, 1,
        ).cast("bigint").alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    tot = obs.agg(F.sum("n_obs").cast("bigint").alias("n"))
    p_q = F.create_map(
        *[x for d, q in _BENFORD_Q.items() for x in (F.lit(d), F.lit(q))]
    )[F.col("digit")].cast("bigint")
    scored = obs.crossJoin(F.broadcast(tot)).withColumn("p_q", p_q)
    expected = (F.col("n") * F.col("p_q")).cast("double") / F.lit(1e9)
    dev = F.col("n_obs").cast("double") - expected
    return scored.select(
        "digit",
        "n_obs",
        expected.alias("expected"),
        F.round(dev * dev / expected * F.lit(1e9)).cast("bigint").alias(
            "chi2_contrib_q"
        ),
    ).orderBy("digit")
