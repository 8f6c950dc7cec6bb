"""Delta row-level version-diff changelog (no CDF required).

Logs built BY HAND from PROTOCOL.md action shapes (same discipline as
tests/test_deltalite.py). Contract under test:

- inserts = rows live in `to` but not `from`; deletes = the reverse
- DV growth -> deletes of newly-masked positions; DV shrink -> inserts
- O(changed files): untouched (path, dvId) logical files never enter
  the scan (asserted via last_changelog_stats)
- additive schema evolution null-fills the old side; a dropped column
  refuses loudly
- net=True cancels compaction echoes
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from forklift_spark.connections.deltalite import (
    DeltaLiteTable,
    DeltaUnsupported,
)
from tests.test_delta_dv import _i_descriptor, _v3_protocol
from tests.test_deltalite import (
    SCHEMA,
    _add,
    _commit,
    _meta_action,
    _one_parquet_file,
)


def _feed(df):
    return sorted((r.k, r.v, r._change_type) for r in df.collect())


def _mk(spark, tdir, name, lo, hi, tag):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit(tag), F.col("id")).alias("v"),
    ).coalesce(1).sortWithinPartitions("k")
    _one_parquet_file(spark, df, os.path.join(tdir, name))


@pytest.fixture()
def two_file_table(spark, tmp_path):
    """v0: f1 (k 0..4, p=1) + f2 (k 10..14, p=2)."""
    tdir = str(tmp_path / "t")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    _mk(spark, tdir, "f1.parquet", 0, 5, "a")
    _mk(spark, tdir, "f2.parquet", 10, 15, "b")
    _commit(log, 0, [_v3_protocol(), _meta_action(),
                     _add("f1.parquet", {"p": "1"}),
                     _add("f2.parquet", {"p": "2"})])
    return tdir


def test_changelog_append_only_is_inserts(spark, two_file_table):
    tdir = two_file_table
    _mk(spark, tdir, "f3.parquet", 20, 22, "c")
    _commit(os.path.join(tdir, "_delta_log"), 1,
            [_add("f3.parquet", {"p": "3"})])
    t = DeltaLiteTable(spark, tdir)
    assert _feed(t.changelog(0, 1)) == [
        (20, "c20", "insert"), (21, "c21", "insert")]
    st = t.last_changelog_stats
    assert st["scanned_old"] == 0 and st["scanned_new"] == 1
    assert st["files_old"] == 2 and st["files_new"] == 3


def test_changelog_dv_growth_and_shrink(spark, two_file_table):
    tdir = two_file_table
    log = os.path.join(tdir, "_delta_log")
    # v1: mask f1 positions {1, 3}  (k=1, k=3 — file sorted by k)
    a = _add("f1.parquet", {"p": "1"})
    a["add"]["deletionVector"] = _i_descriptor([1, 3])
    _commit(log, 1, [a])
    # v2: new mask {1} — position 3 is UN-deleted (restore)
    b = _add("f1.parquet", {"p": "1"})
    b["add"]["deletionVector"] = _i_descriptor([1])
    _commit(log, 2, [b])
    t = DeltaLiteTable(spark, tdir)
    assert _feed(t.changelog(0, 1)) == [
        (1, "a1", "delete"), (3, "a3", "delete")]
    st = t.last_changelog_stats
    # f2's logical file is identical on both sides: never scanned
    assert st["scanned_old"] == 1 and st["scanned_new"] == 1
    assert _feed(t.changelog(1, 2)) == [(3, "a3", "insert")]
    # whole range nets the intermediate restore away
    assert _feed(t.changelog(0, 2)) == [(1, "a1", "delete")]


def test_changelog_rewrite_raw_vs_net(spark, two_file_table):
    tdir = two_file_table
    log = os.path.join(tdir, "_delta_log")
    # compaction: f1 rewritten as f1b with the same rows + one extra
    _mk(spark, tdir, "f1b.parquet", 0, 6, "a")
    _commit(log, 1, [
        {"remove": {"path": "f1.parquet", "dataChange": False}},
        _add("f1b.parquet", {"p": "1"}),
    ])
    t = DeltaLiteTable(spark, tdir)
    raw = _feed(t.changelog(0, 1))
    assert len([r for r in raw if r[2] == "delete"]) == 5
    assert len([r for r in raw if r[2] == "insert"]) == 6
    assert _feed(t.changelog(0, 1, net=True)) == [(5, "a5", "insert")]


def test_changelog_additive_schema_evolution(spark, tmp_path):
    tdir = str(tmp_path / "t")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    _mk(spark, tdir, "f1.parquet", 0, 2, "a")
    _commit(log, 0, [_v3_protocol(), _meta_action(partition_cols=()),
                     _add("f1.parquet", {})])
    # v1: metaData gains column w; f1 removed, f2 (with w) added
    wide = SCHEMA.add("w", "string")
    meta = _meta_action(partition_cols=())
    meta["metaData"]["schemaString"] = json.dumps(wide.jsonValue())
    df = spark.range(5, 7).select(
        F.col("id").alias("k"),
        F.concat(F.lit("n"), F.col("id")).alias("v"),
        F.lit(9).cast("int").alias("p"),
        F.lit("yes").alias("w"),
    ).coalesce(1)
    _one_parquet_file(spark, df, os.path.join(tdir, "f2.parquet"))
    _commit(log, 1, [meta,
                     {"remove": {"path": "f1.parquet",
                                 "dataChange": True}},
                     _add("f2.parquet", {})])
    t = DeltaLiteTable(spark, tdir)
    rows = sorted((r.k, r.w, r._change_type)
                  for r in t.changelog(0, 1).collect())
    # deleted old rows read under the NEW schema with w null-filled
    assert rows == [(0, None, "delete"), (1, None, "delete"),
                    (5, "yes", "insert"), (6, "yes", "insert")]


def test_changelog_column_drop_refuses(spark, tmp_path):
    tdir = str(tmp_path / "t")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    _mk(spark, tdir, "f1.parquet", 0, 2, "a")
    _commit(log, 0, [_v3_protocol(), _meta_action(partition_cols=()),
                     _add("f1.parquet", {})])
    import pyspark.sql.types as T
    narrow = T.StructType([f for f in SCHEMA.fields if f.name != "v"])
    meta = _meta_action(partition_cols=())
    meta["metaData"]["schemaString"] = json.dumps(narrow.jsonValue())
    _commit(log, 1, [meta])
    with pytest.raises(DeltaUnsupported, match="drop/rename"):
        DeltaLiteTable(spark, tdir).changelog(0, 1)


def test_files_and_history_metadata_tables(spark, two_file_table):
    t = DeltaLiteTable(spark, two_file_table)
    f = {r.path: r for r in t.files().collect()}
    assert set(f) == {"f1.parquet", "f2.parquet"}
    assert f["f1.parquet"].partition == {"p": "1"}
    assert f["f1.parquet"].dv_cardinality == 0
    a = _add("f1.parquet", {"p": "1"})
    a["add"]["deletionVector"] = _i_descriptor([1, 3])
    _commit(os.path.join(two_file_table, "_delta_log"), 1,
            [a, {"commitInfo": {"operation": "DELETE",
                                "timestamp": 1700000099000}}])
    f = {r.path: r for r in t.files().collect()}
    assert f["f1.parquet"].dv_cardinality == 2
    h = {r.version: r for r in t.history().collect()}
    assert h[0].n_adds == 2 and h[0].n_removes == 0
    assert h[1].operation == "DELETE"
    assert h[1].timestamp_ms == 1700000099000
