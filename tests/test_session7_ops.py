"""Unit pins for the seventh-session operators: the adversarial edge
cases the sf0.01 corpus may not exercise — equal-point skyline twins
and local-prune losslessness, NFD packing branches (oversized file,
exact fit), and the greedy BPE merge on long same-symbol runs (where a
string-replace replay provably diverges from the fold)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _brute_skyline(rows):
    out = []
    for r in rows:
        dominated = any(
            s[1] <= r[1] and s[2] >= r[2] and (s[1] < r[1] or s[2] > r[2])
            for s in rows
        )
        if not dominated:
            out.append(r)
    return sorted(out)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_skyline_prune_matches_brute_force(spark, seed):
    import random

    from forklift_spark.queries.analytics import _skyline_prune

    rng = random.Random(seed)
    rows = [
        (i, float(rng.randint(1, 12)), rng.randint(1, 12)) for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["p_partkey", "p_retailprice", "p_size"])
    df = df.withColumn("bkt", F.pmod(F.hash("p_partkey"), F.lit(8)))
    got = sorted(
        tuple(r)
        for r in _skyline_prune(_skyline_prune(df, ["bkt"]).drop("bkt"), [])
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    )
    assert got == _brute_skyline(rows)


def test_skyline_keeps_equal_point_twins(spark):
    from forklift_spark.queries.analytics import _skyline_prune

    rows = [(1, 5.0, 9), (2, 5.0, 9), (3, 5.0, 8), (4, 4.0, 9)]
    # (4.0, 9) dominates both twins (cheaper, same size) -> only row 4
    df = spark.createDataFrame(rows, ["p_partkey", "p_retailprice", "p_size"])
    got = sorted(r.p_partkey for r in _skyline_prune(df, []).collect())
    assert got == [4]
    # without the dominator the twins BOTH stay (neither dominates the other)
    df2 = spark.createDataFrame(rows[:3], ["p_partkey", "p_retailprice", "p_size"])
    got2 = sorted(r.p_partkey for r in _skyline_prune(df2, []).collect())
    assert got2 == [1, 2]


def test_nfd_packing_branches(spark):
    # cap 100: sizes sorted desc = [250(oversized), 60, 50, 40, 30]
    # NFD: [250] | [60] +40 fits -> [60,40] wait order is desc:
    # 250 -> bin1(250); 60 -> new bin2(60); 50 -> 60+50>100 new bin3(50);
    # 40 -> 50+40<=100 bin3(90); 30 -> 90+30>100 new bin4(30)
    df = spark.createDataFrame(
        [(0, s) for s in [250, 60, 50, 40, 30]], ["chunk", "sz"]
    )
    arr = df.select(
        F.array_sort(
            F.collect_list(F.struct((-F.col("sz")).alias("nsz"), "chunk", "sz"))
        ).alias("a")
    )
    loads = arr.select(
        F.expr(
            """
            aggregate(
              a,
              cast(array() as array<bigint>),
              (loads, v) -> if(
                size(loads) > 0 AND element_at(loads, -1) + v.sz <= 100,
                concat(slice(loads, 1, size(loads) - 1),
                       array(element_at(loads, -1) + v.sz)),
                concat(loads, array(v.sz)))
            ) AS loads
            """
        )
    ).collect()[0].loads
    assert loads == [250, 60, 90, 30]


@pytest.mark.parametrize(
    "word,pair,expect",
    [
        ("aaaaaa", ("a", "a"), ["aa", "aa", "aa"]),  # replace() would give [aa,a,aa,a]
        ("aaaaa", ("a", "a"), ["aa", "aa", "a"]),
        ("ababab", ("a", "b"), ["ab", "ab", "ab"]),
        ("xabay", ("a", "b"), ["x", "ab", "a", "y"]),
    ],
)
def test_bpe_merge_fold_greedy_nonoverlapping(spark, word, pair, expect):
    from forklift_spark.queries.text import _BPE_MERGE_FOLD

    df = spark.createDataFrame([(list(word), pair[0], pair[1])], ["s", "lft", "rgt"])
    got = df.select(F.expr(_BPE_MERGE_FOLD).alias("m")).collect()[0].m
    assert got == expect


def test_bpe_merge_duckdb_replay_matches_fold(spark):
    """The oracle's list_reduce replay and the Spark fold agree on the
    run cases — the exact divergence class the string-replace replay
    fails (documented in the q_bpe_train docstring)."""
    import duckdb

    for word, lft, rgt in [("aaaaaa", "a", "a"), ("ababab", "a", "b")]:
        spark_got = (
            spark.createDataFrame([(list(word), lft, rgt)], ["s", "lft", "rgt"])
            .select(F.expr(_fold()).alias("m"))
            .collect()[0]
            .m
        )
        duck_got = duckdb.sql(
            f"""
            SELECT string_split(list_reduce(
              {list(word)!r}::VARCHAR[], (acc, y) ->
              CASE WHEN (acc = '{lft}' OR ends_with(acc, ' ' || '{lft}'))
                        AND y = '{rgt}'
                   THEN left(acc, length(acc) - length('{lft}')) || '{lft}' || '{rgt}'
                   ELSE acc || ' ' || y END), ' ')
            """
        ).fetchall()[0][0]
        assert spark_got == duck_got


def _fold():
    from forklift_spark.queries.text import _BPE_MERGE_FOLD

    return _BPE_MERGE_FOLD


def test_max_plus_closure_longest_path_on_diamond(spark):
    """Diamond with unequal arms: 1->2->4 (long arm via weights) and
    1->3->4 — max-plus must report the LONGEST weighted path where the
    default min-plus reports the shortest."""
    from forklift_spark.operators import graph as G

    # child -> parent edges with weights (weight = cost of the parent hop)
    rows = [(4, 2, 10), (4, 3, 1), (2, 1, 1), (3, 1, 1)]
    edges = spark.createDataFrame(rows, ["child", "parent", "w"])
    longest = {
        (r.descn, r.anc): r.dist
        for r in G.transitive_closure(
            edges, max_doublings=3, agg="max", weight_col="w"
        ).collect()
    }
    shortest = {
        (r.descn, r.anc): r.dist
        for r in G.transitive_closure(
            edges, max_doublings=3, agg="min", weight_col="w"
        ).collect()
    }
    assert longest[(4, 1)] == 11  # via the 10-weight arm then 1
    assert shortest[(4, 1)] == 2  # via the 1-weight arm then 1
    assert longest[(4, 2)] == 10 and longest[(4, 3)] == 1
