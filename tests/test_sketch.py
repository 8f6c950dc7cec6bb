"""Count-Min Sketch (operators/sketch.py): estimate bounds and shard
mergeability — the properties the catalog oracle doesn't state
explicitly."""

from __future__ import annotations

from pyspark.sql import functions as F

from forklift_spark.operators import sketch as K


def _counts(spark, rows):
    return spark.createDataFrame(rows, "k string, c long")


def test_cms_estimate_is_upper_bound_for_every_key(spark):
    # skewed vocabulary: a few hot keys + a long tail forcing collisions
    rows = [(f"hot{i}", 1000 - i) for i in range(5)]
    rows += [(f"tail{i}", 1 + i % 3) for i in range(300)]
    counts = _counts(spark, rows)
    cms = K.cms_build(counts, "k", "c", depth=4, width=64)  # narrow -> collisions
    est = K.cms_lookup(cms, counts.select("k"), "k", depth=4, width=64)
    joined = {r.k: (r.c, r.cms_est) for r in counts.join(est, "k").collect()}
    assert len(joined) == 305
    assert all(est >= exact for exact, est in joined.values())
    # hot keys stay well-separated from the tail even with collisions
    assert all(joined[f"hot{i}"][1] >= 900 for i in range(5))


def test_cms_grid_is_bounded_and_cells_conserve_mass(spark):
    counts = _counts(spark, [(f"k{i}", i + 1) for i in range(100)])
    cms = K.cms_build(counts, "k", "c", depth=4, width=32).collect()
    assert len(cms) <= 4 * 32
    total = sum(r.c for r in counts.collect())
    per_row = {}
    for r in cms:
        per_row[r.row] = per_row.get(r.row, 0) + r.cell
    # every hash row sees the full mass exactly once
    assert set(per_row) == {0, 1, 2, 3}
    assert all(v == total for v in per_row.values())


def test_cms_shards_merge_by_cellwise_addition(spark):
    a = _counts(spark, [("x", 5), ("y", 7), ("z", 1)])
    b = _counts(spark, [("x", 3), ("w", 9)])
    merged_input = _counts(spark, [("x", 8), ("y", 7), ("z", 1), ("w", 9)])
    cms_a = K.cms_build(a, "k", "c", depth=4, width=32)
    cms_b = K.cms_build(b, "k", "c", depth=4, width=32)
    merged = (
        cms_a.unionByName(cms_b)
        .groupBy("row", "bucket")
        .agg(F.sum("cell").alias("cell"))
    )
    direct = K.cms_build(merged_input, "k", "c", depth=4, width=32)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_never_false_negative_and_fp_rate_sane(spark):
    members = spark.createDataFrame([(f"m{i}",) for i in range(50)], "k string")
    others = spark.createDataFrame([(f"x{i}",) for i in range(500)], "k string")
    bloom = K.bloom_build(members, "k", n_hashes=5, n_bits=4096)
    hit = {
        r.k: r.bloom_candidate
        for r in K.bloom_probe(
            bloom, members.unionByName(others), "k", n_hashes=5, n_bits=4096
        ).collect()
    }
    assert all(hit[f"m{i}"] for i in range(50))  # no false negatives, ever
    fps = sum(hit[f"x{i}"] for i in range(500))
    # m=4096, n=50, k=5 -> theoretical fp ~ 1e-6; allow generous slack
    assert fps <= 2


def test_bloom_position_set_is_bounded(spark):
    members = spark.createDataFrame([(f"m{i}",) for i in range(50)], "k string")
    n_pos = K.bloom_build(members, "k", n_hashes=5, n_bits=4096).count()
    assert n_pos <= 5 * 50


def test_bloom_probe_dedupes_repeated_keys(spark):
    members = spark.createDataFrame([("a",)], "k string")
    probes = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    bloom = K.bloom_build(members, "k")
    out = {r.k: r.bloom_candidate for r in K.bloom_probe(bloom, probes, "k").collect()}
    assert out == {"a": True, "b": False}


# -- quantile sketch -------------------------------------------------------


def _vals(spark, xs):
    return spark.createDataFrame([(int(x),) for x in xs], "v long")


def test_qsketch_relative_error_bound(spark):
    # log-spaced + clustered values across 4 octaves
    xs = [17, 100, 101, 102, 950, 1000, 5000, 50000, 50001] * 40
    sk = K.qsketch_build(_vals(spark, xs), "v")
    est = {r.pct: r.est for r in K.qsketch_quantiles(sk, [25, 50, 75, 90, 99]).collect()}
    xs_sorted = sorted(xs)
    n = len(xs)
    for pct, e in est.items():
        r = (n * pct + 99) // 100
        true = xs_sorted[r - 1]
        assert abs(e - true) <= max(true * 2 ** -5, 1), (pct, e, true)


def test_qsketch_bucket_width_is_relative(spark):
    sk = K.qsketch_build(_vals(spark, [1, 2, 3, 63, 64, 65, 2**40, 2**40 + 7]), "v")
    for r in sk.collect():
        width = r.hi - r.lo + 1
        assert r.lo % width == 0  # aligned power-of-2 bucket
        assert width <= max(r.lo >> 5, 1) or r.lo < 64  # <= 2^-5 relative


def test_qsketch_shards_merge_to_global(spark):
    xs = [(i * 37) % 9973 + 1 for i in range(2000)]
    whole = K.qsketch_build(_vals(spark, xs), "v")
    shards = [K.qsketch_build(_vals(spark, xs[i::3]), "v") for i in range(3)]
    merged = K.qsketch_merge(*shards)
    a = {(r.lo, r.hi): r.cnt for r in whole.collect()}
    b = {(r.lo, r.hi): r.cnt for r in merged.collect()}
    assert a == b
    qa = {r.pct: r.est for r in K.qsketch_quantiles(whole, [50, 90]).collect()}
    qb = {r.pct: r.est for r in K.qsketch_quantiles(merged, [50, 90]).collect()}
    assert qa == qb


def test_qsketch_grouped_matches_per_group_ungrouped(spark):
    xs = [("a", (i * 13) % 997 + 1) for i in range(600)]
    xs += [("b", (i * 7) % 89 + 1) for i in range(400)]
    df = spark.createDataFrame(xs, "grp string, v long")
    grouped = K.qsketch_quantiles(
        K.qsketch_build(df, "v", by=("grp",)), [50, 90], by=("grp",)
    )
    got = {(r.grp, r.pct): (r.n, r.r, r.est) for r in grouped.collect()}
    for g in ("a", "b"):
        solo = K.qsketch_quantiles(
            K.qsketch_build(df.filter(F.col("grp") == g), "v"), [50, 90]
        )
        for r in solo.collect():
            assert got[(g, r.pct)] == (r.n, r.r, r.est)


def test_qsketch_handles_nanosecond_scale_values(spark):
    # (hi-lo)*(r-base) would overflow int64 for these buckets; the
    # guarded interpolation must stay in range and inside the bucket
    base = 1_700_000_000_000_000_000
    xs = [base + (i * 7919) % 10**15 for i in range(3000)]
    sk = K.qsketch_build(_vals(spark, xs), "v")
    est = {r.pct: r.est for r in K.qsketch_quantiles(sk, [50, 99]).collect()}
    xs_sorted = sorted(xs)
    n = len(xs)
    for pct, e in est.items():
        r = (n * pct + 99) // 100
        true = xs_sorted[r - 1]
        assert e > 0
        assert abs(e - true) <= max(true >> 5, 1), (pct, e, true)


# ---------------------------------------------------------------------------
# KMV distinct sketch
# ---------------------------------------------------------------------------


def test_kmv_merge_equals_direct_sketch(spark):
    from pyspark.sql import functions as F

    from forklift_spark.operators import sketch as K

    df = spark.range(0, 5000).select(F.col("id").cast("string").alias("k"))
    a = df.filter(F.col("k").cast("long") % 3 != 0)
    b = df.filter(F.col("k").cast("long") % 3 != 1)  # overlapping shards
    direct = K.kmv_sketch(a.unionByName(b), "k", 32)
    merged = K.kmv_merge(32, K.kmv_sketch(a, "k", 32), K.kmv_sketch(b, "k", 32))
    assert sorted(r.h for r in direct.collect()) == sorted(
        r.h for r in merged.collect()
    )


def test_kmv_estimate_exact_when_small_and_bounded_error(spark):
    from pyspark.sql import functions as F

    from forklift_spark.operators import sketch as K

    small = spark.range(0, 20).select(F.col("id").cast("string").alias("k"))
    row = K.kmv_estimate(K.kmv_sketch(small, "k", 64), 64).collect()[0]
    assert row.n_sketch == 20 and row.est == 20.0
    big = spark.range(0, 20000).select(F.col("id").cast("string").alias("k"))
    est = K.kmv_estimate(K.kmv_sketch(big, "k", 256), 256).collect()[0].est
    # KMV relative std error ~ 1/sqrt(k-2) ≈ 6.3% at k=256; allow 4 sigma
    assert abs(est - 20000) / 20000 < 0.25


def test_kmv_excludes_null_keys(spark):
    # ADVICE r3: Spark sorts NULLs first ascending, DuckDB last — a NULL
    # hash must never occupy a k-minimum slot on either engine
    from forklift_spark.operators import sketch as K

    df = spark.createDataFrame(
        [(str(i),) for i in range(20)] + [(None,), (None,)], "k string"
    )
    sk = K.kmv_sketch(df, "k", k=8).collect()
    assert len(sk) == 8
    assert all(r.h is not None for r in sk)
    # estimate path unaffected by the null rows
    est = K.kmv_estimate(K.kmv_sketch(df, "k", k=64), 64).first()
    assert est.n_sketch == 20  # exact when n < k, nulls excluded
