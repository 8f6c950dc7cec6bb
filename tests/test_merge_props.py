"""Property-based CDC/SCD2 semantics: random change batches vs an
executable dict model (hypothesis) — same strategy as the writer's
property tests, applied to the merge patterns."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from forklift_spark.patterns import cdc_apply, scd2_merge

keys = st.integers(min_value=0, max_value=5)
bals = st.sampled_from([0.0, 1.5, 2.0, -3.25])

base_rows = st.dictionaries(keys, bals, max_size=4)


@st.composite
def change_batches(draw):
    n = draw(st.integers(min_value=0, max_value=8))
    out = []
    used_ts = set()
    for _ in range(n):
        ts = draw(
            st.integers(min_value=1, max_value=50).filter(lambda t: t not in used_ts)
        )
        used_ts.add(ts)  # unique ts -> the model's ordering is unambiguous
        out.append((draw(keys), draw(st.sampled_from("IUD")), draw(bals), ts))
    return out


def _cdc_model(base: dict, changes):
    latest = {}
    for k, op, bal, ts in changes:
        if k not in latest or ts > latest[k][2]:
            latest[k] = (op, bal, ts)
    out = dict(base)
    for k, (op, bal, _) in latest.items():
        if op == "D":
            out.pop(k, None)
        else:
            out[k] = bal
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(base=base_rows, changes=change_batches())
def test_cdc_apply_matches_model(spark, base, changes):
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)], "k long, bal double"
    ).filter("k IS NOT NULL")
    ch_df = spark.createDataFrame(
        changes or [(None, None, None, None)], "k long, op string, bal double, ts long"
    ).filter("k IS NOT NULL")
    got = {r.k: r.bal for r in cdc_apply(base_df, ch_df, key="k").collect()}
    assert got == _cdc_model(base, changes)


@st.composite
def scd2_updates(draw):
    ks = draw(st.sets(keys, max_size=4))
    return {k: draw(bals) for k in ks}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(base=base_rows, upd=scd2_updates())
def test_scd2_merge_matches_model(spark, base, upd):
    T0, T1 = dt.datetime(1995, 1, 1), dt.datetime(1998, 1, 1)
    dim = spark.createDataFrame(
        [(k, v, T0, None) for k, v in base.items()] or [(None, None, None, None)],
        "k long, bal double, valid_from timestamp, valid_to timestamp",
    ).filter("k IS NOT NULL")
    up = spark.createDataFrame(
        [(k, v, T1) for k, v in upd.items()] or [(None, None, None)],
        "k long, bal double, ts timestamp",
    ).filter("k IS NOT NULL")
    got = {(r.k, r.bal, r.valid_from, r.valid_to) for r in
           scd2_merge(dim, up, key="k", attrs=["bal"]).collect()}

    want = set()
    for k, v in base.items():
        if k in upd and upd[k] != v:
            want.add((k, v, T0, T1))          # closed
            want.add((k, upd[k], T1, None))   # opened
        else:
            want.add((k, v, T0, None))        # untouched or no-op
    for k, v in upd.items():
        if k not in base:
            want.add((k, v, T1, None))        # brand-new key
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    windows=st.lists(
        st.tuples(keys, st.integers(0, 100), st.integers(0, 80)), max_size=6
    ),
    points=st.lists(st.tuples(keys, st.integers(0, 200)), max_size=12),
    bin_s=st.sampled_from([7, 16, 60]),
)
def test_binned_range_join_matches_naive(spark, windows, points, bin_s):
    from pyspark.sql import functions as F

    from forklift_spark.operators.skew import binned_range_join

    left = spark.createDataFrame(
        [(i, f"k{k}", lo, lo + span + 1) for i, (k, lo, span) in enumerate(windows)]
        or [(None, None, None, None)],
        "lid long, k string, lo long, hi long",
    ).filter("lid IS NOT NULL")
    right = spark.createDataFrame(
        [(f"k{k}", t) for k, t in points] or [(None, None)], "k string, rts long"
    ).filter("k IS NOT NULL")
    binned = binned_range_join(
        left, right, keys=["k"], right_ts="rts", lo="lo", hi="hi", bin_seconds=bin_s
    ).select("lid", "rts")
    naive = (
        left.join(right, "k")
        .filter((F.col("rts") >= F.col("lo")) & (F.col("rts") < F.col("hi")))
        .select("lid", "rts")
    )
    assert sorted(map(tuple, binned.collect())) == sorted(map(tuple, naive.collect()))
