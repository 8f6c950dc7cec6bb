"""Row-level snapshot-diff changelog over spec-built Iceberg tables.

Fixtures are written BY HAND from the Iceberg v2 spec (same discipline
as tests/test_iceberglite.py — reader pinned to the specification, not
this engine's writer): metadata.json + Avro manifest lists/manifests
via the pure-Python codec, parquet data/delete files via pyarrow so row
positions are exact. The changelog contract under test:

- inserts  = rows live in `to` but not in `from`
- deletes  = rows live in `from` but not in `to`
- O(changed files): retained files are scanned ONLY when targeted by a
  changed position-delete file (asserted via last_changelog_stats)
- equality-delete churn widens to all retained files (value predicates)
- a vacuumed changed delete file refuses loudly
- net=True cancels rewrite echoes (compaction nets to zero)
"""

from __future__ import annotations

import os

import pytest

from forklift_spark.connections.iceberglite import (
    IcebergLiteConnection,
    IcebergLiteTable,
    IcebergUnsupported,
)

from test_iceberglite import (
    _entry,
    _manifest,
    _manifest_list,
    _metadata_v2,
    _mkdirs,
    _snap,
    _write_parquet,
)


def _feed_rows(df):
    return sorted((r.k, r.cat, r.val, r._change_type) for r in df.collect())


def _two_snap_table(spark, tdir, *, snap2_data_entries,
                    snap2_delete_entries=(), snap1_extra_entries=()):
    """snapshot 1: data file A (k=1..4); snapshot 2: caller-specified."""
    _mkdirs(tdir)
    a = os.path.join(tdir, "data", "a.parquet")
    _write_parquet(a, {"k": [1, 2, 3, 4],
                       "cat": ["x", "x", "y", "y"],
                       "val": [1.0, 2.0, 3.0, 4.0]})
    m1 = _manifest(tdir, "m1.avro",
                   [_entry(a, seq=1, rows=4)] + list(snap1_extra_entries))
    l1 = _manifest_list(tdir, "l1.avro", [(m1, 0, 1)])
    m2 = _manifest(tdir, "m2.avro", list(snap2_data_entries))
    manifests2 = [(m2, 0, 2)]
    if snap2_delete_entries:
        md = _manifest(tdir, "md.avro", list(snap2_delete_entries))
        manifests2.append((md, 1, 2))
    l2 = _manifest_list(tdir, "l2.avro", manifests2)
    _metadata_v2(tdir, [_snap(1, 1, l1), _snap(2, 2, l2)], current=2)
    return a


def test_changelog_append_only_is_inserts(spark, tmp_path):
    tdir = str(tmp_path / "t")
    _mkdirs(tdir)
    b = os.path.join(tdir, "data", "b.parquet")
    _write_parquet(b, {"k": [5, 6], "cat": ["z", "z"],
                       "val": [5.0, 6.0]})
    a = _two_snap_table(
        spark, tdir,
        snap2_data_entries=[_entry(b, seq=2, rows=2)],
        snap1_extra_entries=())
    # snap2 keeps A live too: rebuild m2 with both files
    m2 = _manifest(tdir, "m2.avro",
                   [_entry(a, seq=1, rows=4), _entry(b, seq=2, rows=2)])
    t = IcebergLiteTable(spark, tdir)
    feed = _feed_rows(t.changelog(1, 2))
    assert feed == [(5, "z", 5.0, "insert"), (6, "z", 6.0, "insert")]
    st = t.last_changelog_stats
    assert st["files_added"] == 1 and st["files_removed"] == 0
    assert st["retained_scanned"] == 0 and st["widened_reason"] is None


def test_changelog_pos_delete_scans_only_targeted_file(spark, tmp_path):
    tdir = str(tmp_path / "t")
    _mkdirs(tdir)
    b = os.path.join(tdir, "data", "b.parquet")
    _write_parquet(b, {"k": [5, 6, 7], "cat": ["z", "z", "w"],
                       "val": [5.0, 6.0, 7.0]})
    d = os.path.join(tdir, "data", "del.parquet")
    _write_parquet(d, {"file_path": [b, b], "pos": [0, 2]})
    a = _two_snap_table(spark, tdir, snap2_data_entries=[])
    # snap1: A+B live; snap2: A+B + pos-delete hitting B rows 0,2
    m1 = _manifest(tdir, "m1.avro",
                   [_entry(a, seq=1, rows=4), _entry(b, seq=1, rows=3)])
    m2 = _manifest(tdir, "m2.avro",
                   [_entry(a, seq=1, rows=4), _entry(b, seq=1, rows=3)])
    md = _manifest(tdir, "md.avro",
                   [_entry(d, seq=2, content=1, rows=2)])
    l1 = _manifest_list(tdir, "l1.avro", [(m1, 0, 1)])
    l2 = _manifest_list(tdir, "l2.avro", [(m2, 0, 2), (md, 1, 2)])
    _metadata_v2(tdir, [_snap(1, 1, l1), _snap(2, 2, l2)], current=2,
                 version=2)
    t = IcebergLiteTable(spark, tdir)
    feed = _feed_rows(t.changelog(1, 2))
    assert feed == [(5, "z", 5.0, "delete"), (7, "w", 7.0, "delete")]
    st = t.last_changelog_stats
    # A is retained but untargeted: it must NOT be in the scan set
    assert st["files_retained"] == 2 and st["retained_scanned"] == 1
    assert st["widened_reason"] is None
    # sanity: full snapshots agree with the feed
    assert len(t.read(snapshot_id=1).collect()) == 7
    assert len(t.read(snapshot_id=2).collect()) == 5


def test_changelog_rewrite_raw_vs_net(spark, tmp_path):
    tdir = str(tmp_path / "t")
    _mkdirs(tdir)
    # compaction: A (k=1..4) rewritten to A2 (same rows) + one new row
    a2 = os.path.join(tdir, "data", "a2.parquet")
    _write_parquet(a2, {"k": [1, 2, 3, 4, 9],
                        "cat": ["x", "x", "y", "y", "n"],
                        "val": [1.0, 2.0, 3.0, 4.0, 9.0]})
    _two_snap_table(spark, tdir,
                    snap2_data_entries=[_entry(a2, seq=2, rows=5)])
    t = IcebergLiteTable(spark, tdir)
    raw = _feed_rows(t.changelog(1, 2))
    # raw feed: 4 delete echoes + 5 inserts
    assert len([r for r in raw if r[3] == "delete"]) == 4
    assert len([r for r in raw if r[3] == "insert"]) == 5
    net = _feed_rows(t.changelog(1, 2, net=True))
    assert net == [(9, "n", 9.0, "insert")]


def test_changelog_equality_delete_widens(spark, tmp_path):
    tdir = str(tmp_path / "t")
    _mkdirs(tdir)
    d = os.path.join(tdir, "data", "eqdel.parquet")
    _write_parquet(d, {"k": [2, 3]})
    a = _two_snap_table(spark, tdir, snap2_data_entries=[])
    m2 = _manifest(tdir, "m2.avro", [_entry(a, seq=1, rows=4)])
    md = _manifest(tdir, "md.avro",
                   [_entry(d, seq=2, content=2, rows=2, eq_ids=[1])])
    l2 = _manifest_list(tdir, "l2.avro", [(m2, 0, 2), (md, 1, 2)])
    _metadata_v2(
        tdir,
        [_snap(1, 1, _manifest_list(tdir, "l1b.avro",
                                    [(_manifest(tdir, "m1.avro",
                                                [_entry(a, seq=1, rows=4)]),
                                      0, 1)])),
         _snap(2, 2, l2)], current=2, version=2)
    t = IcebergLiteTable(spark, tdir)
    feed = _feed_rows(t.changelog(1, 2))
    assert feed == [(2, "x", 2.0, "delete"), (3, "y", 3.0, "delete")]
    st = t.last_changelog_stats
    assert st["widened_reason"] == "equality-delete set changed"
    assert st["retained_scanned"] == st["files_retained"] == 1


def test_changelog_vacuumed_delete_file_refuses(spark, tmp_path):
    tdir = str(tmp_path / "t")
    _mkdirs(tdir)
    b = os.path.join(tdir, "data", "b.parquet")
    _write_parquet(b, {"k": [5], "cat": ["z"], "val": [5.0]})
    d = os.path.join(tdir, "data", "del.parquet")
    _write_parquet(d, {"file_path": [b], "pos": [0]})
    a = _two_snap_table(spark, tdir, snap2_data_entries=[])
    m1 = _manifest(tdir, "m1.avro",
                   [_entry(a, seq=1, rows=4), _entry(b, seq=1, rows=1)])
    m2 = _manifest(tdir, "m2.avro",
                   [_entry(a, seq=1, rows=4), _entry(b, seq=1, rows=1)])
    md = _manifest(tdir, "md.avro", [_entry(d, seq=2, content=1, rows=1)])
    l1 = _manifest_list(tdir, "l1.avro", [(m1, 0, 1)])
    l2 = _manifest_list(tdir, "l2.avro", [(m2, 0, 2), (md, 1, 2)])
    _metadata_v2(tdir, [_snap(1, 1, l1), _snap(2, 2, l2)], current=2,
                 version=2)
    os.remove(d)
    with pytest.raises(IcebergUnsupported, match="cannot be reconstructed"):
        IcebergLiteTable(spark, tdir).changelog(1, 2)


def test_changelog_connection_surface_and_empty_range(spark, tmp_path):
    tdir = str(tmp_path / "tbls" / "t")
    a = _two_snap_table(spark, tdir, snap2_data_entries=[])
    m2 = _manifest(tdir, "m2.avro", [_entry(a, seq=1, rows=4)])
    conn = IcebergLiteConnection({"path": str(tmp_path / "tbls")}, spark,
                                 "ice")
    feed = conn.changelog("t", 1, 2)
    assert feed.count() == 0
    assert [f for f in feed.columns] == ["k", "cat", "val", "_change_type"]


def test_files_and_history_metadata_tables(spark, tmp_path):
    tdir = str(tmp_path / "t")
    _mkdirs(tdir)
    b = os.path.join(tdir, "data", "b.parquet")
    _write_parquet(b, {"k": [5, 6, 7], "cat": ["z", "z", "w"],
                       "val": [5.0, 6.0, 7.0]})
    d = os.path.join(tdir, "data", "del.parquet")
    _write_parquet(d, {"file_path": [b], "pos": [0]})
    a = _two_snap_table(spark, tdir, snap2_data_entries=[])
    m2 = _manifest(tdir, "m2.avro",
                   [_entry(a, seq=1, rows=4), _entry(b, seq=2, rows=3)])
    md = _manifest(tdir, "md.avro", [_entry(d, seq=2, content=1, rows=1)])
    l2 = _manifest_list(tdir, "l2.avro", [(m2, 0, 2), (md, 1, 2)])
    _metadata_v2(tdir, [
        __import__("tests.test_iceberglite", fromlist=["_snap"])._snap(
            1, 1, os.path.join(tdir, "metadata", "l1.avro")),
        __import__("tests.test_iceberglite", fromlist=["_snap"])._snap(
            2, 2, l2),
    ], current=2, version=2)
    t = IcebergLiteTable(spark, tdir)
    f = {(r.content, os.path.basename(r.path)): r
         for r in t.files().collect()}
    assert ("data", "a.parquet") in f and ("data", "b.parquet") in f
    assert ("pos_delete", "del.parquet") in f
    assert f[("data", "b.parquet")].record_count == 3
    assert f[("data", "b.parquet")].seq == 2
    h = sorted((r.snapshot_id, r.operation)
               for r in t.history().collect())
    assert h == [(1, "append"), (2, "append")]


def test_branch_tag_refs_resolution(spark, tmp_path):
    """spec `refs`: read(ref=) resolves branches/tags; unknown names
    list what exists; the publisher keeps `main` on head and expiry
    drops refs that would dangle."""
    import json as _json

    from pyspark.sql import functions as F

    from forklift_spark.connections.iceberglite import (
        expire_iceberg_export_snapshots,
        sync_manifest_to_iceberg,
    )
    from forklift_spark.manifest import ManifestTable

    src = ManifestTable(spark, str(tmp_path / "m"), "t")
    src.create(spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("p"),
        (F.col("id") * 10).alias("v")), partition_by="p")
    dest = str(tmp_path / "pub")
    sync_manifest_to_iceberg(src, dest)                      # snap 1
    t = IcebergLiteTable(spark, dest)
    assert t.metadata()["refs"]["main"]["snapshot-id"] == 1

    # pin a tag at snapshot 1 (as an external tool would)
    mf = t._resolve_metadata_file()
    meta = _json.load(open(mf))
    meta["refs"]["v1.0"] = {"snapshot-id": 1, "type": "tag"}
    _json.dump(meta, open(mf, "w"))

    src.merge(spark.createDataFrame([(100, 0, 1000)],
                                    "k long, p int, v long"), on="k")
    sync_manifest_to_iceberg(src, dest)                      # snap 2
    t = IcebergLiteTable(spark, dest)
    assert t.metadata()["refs"]["main"]["snapshot-id"] == 2
    assert t.metadata()["refs"]["v1.0"]["snapshot-id"] == 1  # untouched
    assert t.read(ref="main").count() == 11
    assert t.read(ref="v1.0").count() == 10
    with pytest.raises(ValueError, match="v1.0"):
        t.read(ref="v2.0")  # unknown: lists existing refs
    with pytest.raises(ValueError, match="AT MOST ONE"):
        t.read(snapshot_id=1, ref="main")

    # two more snapshots, then expire past the tag: it must not dangle
    for i in (101, 102):
        src.merge(spark.createDataFrame([(i, 0, i)],
                                        "k long, p int, v long"), on="k")
        sync_manifest_to_iceberg(src, dest)                  # snaps 3-4
    expire_iceberg_export_snapshots(spark, dest, keep_last=2)
    t = IcebergLiteTable(spark, dest)
    refs = t.metadata()["refs"]
    assert refs["main"]["snapshot-id"] == 4
    assert "v1.0" not in refs
