"""Prefix-filtered set-similarity join (losslessness vs the naive
all-pairs join), degree-ordered triangle counting, and interval-merge
boundary semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from forklift_spark.operators import dedup as D


def _naive_jaccard_pairs(df, id_col, text_col, shingle_n, num, den):
    """All-pairs inverted-index join with the same integer threshold —
    the quadratic ground truth prefix filtering must reproduce."""
    toks = D.hashed_shingles(df, id_col, text_col, shingle_n).select(id_col, "h1")
    a = toks.select(F.col(id_col).alias("id_a"), "h1")
    b = toks.select(F.col(id_col).alias("id_b"), "h1")
    inter = (
        a.join(b, "h1")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("uni", F.col("na") + F.col("nb") - F.col("inter"))
        .filter(F.col("inter") * den >= F.col("uni") * num)
        .select("id_a", "id_b", "inter", "uni")
    )


def test_prefix_jaccard_lossless_vs_naive(spark):
    # corpus engineered around the t=1/2 boundary: identical pair,
    # superset pair at exactly 1/2, pair just below, disjoint docs
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # jacc 1.0 with 1
        (3, "alpha beta gamma delta epsilon zeta eta theta "
            "one two three four five six"),  # extended copy
        (4, "red green blue cyan magenta yellow"),
        (5, "red green blue cyan violet umber"),  # partial overlap
        (6, "totally different words entirely here now"),
        (7, "x"),  # sub-shingle-length doc -> whole-text shingle
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b, r.inter, r.uni)
        for r in D.prefix_jaccard_pairs(df, "doc_id", "text", 2, 1, 2).collect()
    }
    want = {
        (r.id_a, r.id_b, r.inter, r.uni)
        for r in _naive_jaccard_pairs(df, "doc_id", "text", 2, 1, 2).collect()
    }
    assert got == want
    assert (1, 2) in {(a, b) for a, b, *_ in got}  # the exact duplicate pair


def test_prefix_jaccard_threshold_boundary_exact(spark):
    # A has 4 distinct 1-gram tokens, B = A + 4 junk -> jaccard exactly
    # 4/8 = 1/2: the >= boundary must include it; C = A + 5 junk ->
    # 4/9 < 1/2 excluded. Integer predicate, no float roundoff.
    rows = [
        (1, "a b c d"),
        (2, "a b c d j1 j2 j3 j4"),
        (3, "a b c d k1 k2 k3 k4 k5"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r.id_a, r.id_b): (r.inter, r.uni)
        for r in D.prefix_jaccard_pairs(df, "doc_id", "text", 1, 1, 2).collect()
    }
    assert pairs.get((1, 2)) == (4, 8)
    assert (1, 3) not in pairs


def test_triangle_count_known_graph(spark, oracle):
    import forklift_spark.queries  # noqa: F401  (registration)
    from forklift_spark.queries.graph import q_triangle_count

    # the catalog query at sf: spot-check against DuckDB once here too
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    got = {
        (r.node, r.n_triangles) for r in q_triangle_count(spark, sf).collect()
    }
    from forklift_spark.queries.graph import TRIANGLE_ORACLE

    want = set(map(tuple, oracle.execute(TRIANGLE_ORACLE).fetchall()))
    assert got == want
    # sanity on a hand graph: K4 plus a pendant — every K4 node is in
    # C(3,2)=3 triangles, the pendant in none
    edges = [(a, b) for a in range(4) for b in range(4) if a < b] + [(0, 9)]
    und = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], ["u", "v"]
    ).distinct()
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    da = deg.select(F.col("u").alias("_ua"), F.col("d").alias("da"))
    db = deg.select(F.col("u").alias("_ub"), F.col("d").alias("db"))
    o = (
        und.join(da, und.u == da._ua)
        .join(db, und.v == db._ub)
        .filter(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("u") < F.col("v")))
        )
        .select(F.col("u").alias("a"), F.col("v").alias("b"))
    )
    e2 = o.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    e3 = o.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        o.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    assert tri.count() == 4  # K4 has exactly 4 triangles, counted once each


def test_interval_merge_touching_intervals_merge(spark):
    import datetime

    from forklift_spark.queries.timeseries import q_interval_merge  # noqa: F401

    # direct mini-check of the island rule: touching (prev end == next
    # start) merges, a 1-us gap splits
    from pyspark.sql import Window as W

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base, 0, 10),
        (1, base + datetime.timedelta(microseconds=10), 1, 5),  # touches
        (1, base + datetime.timedelta(microseconds=16), 2, 5),  # 1us gap
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "dur"])
    iv = df.select(
        "user_id", "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.col("dur")).alias("e"),
    )
    order = W.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_e = F.max("e").over(order.rowsBetween(W.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island", F.when(prev_max_e >= F.col("s"), 0).otherwise(1)
    )
    islands = flagged.withColumn(
        "island_id", F.sum("new_island").over(order.rowsBetween(W.unboundedPreceding, 0))
    )
    n = islands.select("island_id").distinct().count()
    assert n == 2
