"""Optimization r9 internals: the fused apply_changes scope probe.

apply_changes now answers emptiness + per-side merge scope with ONE
union probe action (``_paired_scope_probe``) instead of two isEmpty
jobs + two scope collects. These tests pin the regimes the fusion must
keep byte-identical to the separate-probe path: bounded sides, a side
overflowing the probe bound, an empty side decided by the probe, and
the unprunable-tombstones fallback (no fusion possible).
"""

import pytest
from pyspark.sql import functions as F

from forklift_spark.manifest import ManifestTable


@pytest.fixture()
def base_df(spark):
    return spark.range(30).select(
        F.col("id").alias("k"),
        (F.col("id") % 3 + 1).cast("int").alias("y"),
        (F.col("id") * 10).cast("long").alias("v"),
    )


@pytest.fixture()
def table(spark, tmp_path, base_df):
    t = ManifestTable(spark, str(tmp_path), "t")
    t.create(base_df, partition_by="y")
    return t


def _state(t):
    return sorted((r.k, r.y, r.v) for r in t.read().collect())


def test_fused_probe_overflow_side_matches_bounded(spark, tmp_path, base_df):
    """One side past _PRUNE_KEYS_BOUND (coarse scope fallback) and one
    bounded side produce the same table state as a roomy bound."""
    expected = None
    for bound in (100_000, 2):  # roomy, then force upsert-side overflow
        t = ManifestTable(spark, str(tmp_path / f"b{bound}"), "t")
        t.create(base_df, partition_by="y")
        t._PRUNE_KEYS_BOUND = bound
        ups = spark.createDataFrame(
            [(k, int(k % 3 + 1), k * 1000 + 1) for k in range(5)],
            "k long, y int, v long",
        )
        tombs = spark.createDataFrame([(29, 3)], "k long, y int")
        stats = t.apply_changes(ups, tombs, on="k", use_dv=True)
        assert stats["files_rewritten"] == 0
        got = _state(t)
        assert (0, 1, 0) not in got and (0, 1, 1) in got
        assert not any(k == 29 for k, _y, _v in got)
        if expected is None:
            expected = got
        else:
            assert got == expected


def test_fused_probe_decides_emptiness(table, spark):
    """An empty side contributes zero probe rows: the probe alone must
    classify it (no isEmpty job), including the both-empty noop."""
    v0 = table.current_version()
    empty_ups = spark.createDataFrame([], "k long, y int, v long")
    empty_tombs = spark.createDataFrame([], "k long, y int")
    # both empty -> noop, no version bump
    stats = table.apply_changes(empty_ups, empty_tombs, on="k")
    assert table.current_version() == v0
    assert stats["rows_masked"] == 0 and stats["files_written"] == 0
    # tombstones-only batch through the fused path
    tombs = spark.createDataFrame([(3, 1)], "k long, y int")
    table.apply_changes(empty_ups, tombs, on="k", use_dv=True)
    assert table.current_version() == v0 + 1
    assert 3 not in {r.k for r in table.read().collect()}
    # upserts-only batch (tombstones present but empty)
    ups = spark.createDataFrame([(100, 2, 5)], "k long, y int, v long")
    table.apply_changes(ups, empty_tombs, on="k", use_dv=True)
    assert table.current_version() == v0 + 2
    assert (100, 5) in {(r.k, r.v) for r in table.read().collect()}


def test_unprunable_tombstones_fall_back(table, spark):
    """Tombstones without the partition column can't ride the fused
    probe (scope = whole live set); the fallback path must still apply
    both sides in one commit."""
    v0 = table.current_version()
    ups = spark.createDataFrame([(1, 2, 999)], "k long, y int, v long")
    tombs = spark.createDataFrame([(4,)], "k long")  # no y column
    table.apply_changes(ups, tombs, on="k", use_dv=True)
    assert table.current_version() == v0 + 1
    got = {(r.k, r.v) for r in table.read().collect()}
    assert (1, 999) in got and not any(k == 4 for k, _v in got)


def test_fused_probe_single_action(table, spark):
    """The bounded two-sided probe is ONE collect job (plus the commit
    machinery): pin the per-commit job count so a regression back to
    per-side probes/isEmpty shows up structurally."""
    sc = spark.sparkContext
    ups = spark.createDataFrame([(1, 2, 999)], "k long, y int, v long")
    tombs = spark.createDataFrame([(4, 2)], "k long, y int")
    sc.setJobGroup("fused_apply", "fused_apply")
    table.apply_changes(ups, tombs, on="k", use_dv=True)
    jobs = len(sc.statusTracker().getJobIdsForGroup("fused_apply"))
    sc.setJobGroup(None, None)
    # measured 8 on the dv path (probe, key-frame broadcast, hits ckpt,
    # dv collect x2, snapshot write x2, commit write); the pre-fusion
    # path measured 13. Headroom for scheduler variance, not for a
    # probe regression.
    assert jobs <= 10, f"apply_changes commit ran {jobs} jobs"
