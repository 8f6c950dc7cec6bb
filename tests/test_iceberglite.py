"""Iceberg spec-v1/v2 reader: tables built BY HAND from the public spec.

Every fixture here writes metadata.json / Avro manifest lists / Avro
manifests / parquet data+delete files directly from the spec's shapes —
never through an Iceberg writer — so the reader is pinned to the
specification, not to this engine's own output (same discipline as
tests/test_deltalite.py). The Avro bytes come from the pure-Python
codec the reader itself uses for decode; the parquet files come from
pyarrow so row positions are exact.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from forklift_spark.connections.iceberglite import (
    MANIFEST_ENTRY_SCHEMA,
    MANIFEST_FILE_SCHEMA,
    IcebergLiteConnection,
    IcebergLiteTable,
    IcebergUnsupported,
    iceberg_type_to_spark,
)
from forklift_spark.functions import avrocodec as av

# ---------------------------------------------------------------------------
# spec-shaped builders
# ---------------------------------------------------------------------------


def _write_parquet(path, cols: dict) -> int:
    table = pa.table(cols)
    pq.write_table(table, path)
    return table.num_rows


def _manifest(tdir, name, entries) -> str:
    p = os.path.join(tdir, "metadata", name)
    av.write_container_file(p, json.dumps(MANIFEST_ENTRY_SCHEMA), entries)
    return p


def _entry(path, *, status=1, seq=None, content=0, rows=0, eq_ids=None):
    return {
        "status": status, "snapshot_id": 7, "sequence_number": seq,
        "data_file": {
            "content": content, "file_path": path,
            "file_format": "PARQUET", "partition": {},
            "record_count": rows,
            "file_size_in_bytes": os.path.getsize(path),
            "equality_ids": eq_ids,
        }}


def _manifest_list(tdir, name, manifests) -> str:
    p = os.path.join(tdir, "metadata", name)
    av.write_container_file(
        p, json.dumps(MANIFEST_FILE_SCHEMA),
        [{"manifest_path": mp, "manifest_length": os.path.getsize(mp),
          "partition_spec_id": 0, "content": content,
          "sequence_number": seq, "min_sequence_number": seq,
          "added_snapshot_id": 7}
         for mp, content, seq in manifests])
    return p


SCHEMA_FIELDS = [
    {"id": 1, "name": "k", "required": True, "type": "long"},
    {"id": 2, "name": "cat", "required": False, "type": "string"},
    {"id": 3, "name": "val", "required": False, "type": "double"},
]


def _metadata_v2(tdir, snapshots, current, version=1,
                 extra=None) -> str:
    meta = {
        "format-version": 2, "table-uuid": "00000000-feed-face-0000-0",
        "location": tdir, "last-sequence-number": 99,
        "last-updated-ms": 1700000000000, "last-column-id": 3,
        "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0,
                     "fields": SCHEMA_FIELDS}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "current-snapshot-id": current,
        "snapshots": snapshots,
        **(extra or {}),
    }
    p = os.path.join(tdir, "metadata", f"v{version}.metadata.json")
    with open(p, "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(tdir, "metadata", "version-hint.text"),
              "w") as fh:
        fh.write(str(version))
    return p


def _snap(sid, seq, manifest_list, ts=1700000000000):
    return {"snapshot-id": sid, "sequence-number": seq,
            "timestamp-ms": ts,
            "manifest-list": manifest_list,
            "summary": {"operation": "append"}, "schema-id": 0}


def _mkdirs(tdir):
    os.makedirs(os.path.join(tdir, "metadata"), exist_ok=True)
    os.makedirs(os.path.join(tdir, "data"), exist_ok=True)


def _rows(df):
    return sorted((r.k, r.cat, r.val) for r in df.collect())


# ---------------------------------------------------------------------------
# v1: inline schema + inline manifests list
# ---------------------------------------------------------------------------

def test_v1_table_reads(spark, tmp_path):
    tdir = str(tmp_path / "t1")
    _mkdirs(tdir)
    d1 = os.path.join(tdir, "data", "f1.parquet")
    _write_parquet(d1, {"k": [1, 2], "cat": ["a", "b"], "val": [1.0, 2.0]})
    m1 = _manifest(tdir, "m1.avro", [_entry(d1, rows=2)])
    meta = {
        "format-version": 1, "table-uuid": "u", "location": tdir,
        "last-updated-ms": 0, "last-column-id": 3,
        "schema": {"type": "struct", "fields": SCHEMA_FIELDS},
        "partition-spec": [],
        "current-snapshot-id": 7,
        "snapshots": [{"snapshot-id": 7, "timestamp-ms": 0,
                       "manifests": [m1]}],
    }
    with open(os.path.join(tdir, "metadata", "v1.metadata.json"),
              "w") as fh:
        json.dump(meta, fh)
    t = IcebergLiteTable(spark, tdir)
    got = t.read()
    assert _rows(got) == [(1, "a", 1.0), (2, "b", 2.0)]
    # required -> non-nullable in the converted schema (Spark's file
    # scan then relaxes nullability, as it does for any parquet read)
    declared, _ = t.schema_struct(t.metadata())
    assert declared["k"].nullable is False
    assert declared["cat"].nullable is True


# ---------------------------------------------------------------------------
# v2: snapshots, time travel, status=DELETED exclusion
# ---------------------------------------------------------------------------

def _two_snapshot_table(spark, tdir):
    _mkdirs(tdir)
    d1 = os.path.join(tdir, "data", "f1.parquet")
    d2 = os.path.join(tdir, "data", "f2.parquet")
    _write_parquet(d1, {"k": [1, 2], "cat": ["a", "b"], "val": [1.0, 2.0]})
    _write_parquet(d2, {"k": [3], "cat": ["c"], "val": [3.0]})
    m1 = _manifest(tdir, "m1.avro", [_entry(d1, rows=2)])
    m2 = _manifest(tdir, "m2.avro", [_entry(d2, rows=1)])
    l1 = _manifest_list(tdir, "snap-100.avro", [(m1, 0, 1)])
    l2 = _manifest_list(tdir, "snap-200.avro", [(m1, 0, 1), (m2, 0, 2)])
    _metadata_v2(tdir, [_snap(100, 1, l1), _snap(200, 2, l2)], 200)


def test_v2_current_and_time_travel(spark, tmp_path):
    tdir = str(tmp_path / "t2")
    _two_snapshot_table(spark, tdir)
    t = IcebergLiteTable(spark, tdir)
    assert _rows(t.read()) == [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]
    assert _rows(t.read(snapshot_id=100)) == [(1, "a", 1.0), (2, "b", 2.0)]
    with pytest.raises(ValueError, match="snapshot 999"):
        t.read(snapshot_id=999)


def test_v2_deleted_status_entries_are_excluded(spark, tmp_path):
    tdir = str(tmp_path / "t3")
    _mkdirs(tdir)
    d1 = os.path.join(tdir, "data", "f1.parquet")
    d2 = os.path.join(tdir, "data", "f2.parquet")
    _write_parquet(d1, {"k": [1], "cat": ["a"], "val": [1.0]})
    _write_parquet(d2, {"k": [2], "cat": ["b"], "val": [2.0]})
    m = _manifest(tdir, "m1.avro", [
        _entry(d1, status=0, rows=1),
        _entry(d2, status=2, rows=1),  # DELETED: f2 not in this snapshot
    ])
    lst = _manifest_list(tdir, "snap-1.avro", [(m, 0, 3)])
    _metadata_v2(tdir, [_snap(300, 3, lst)], 300)
    assert _rows(IcebergLiteTable(spark, tdir).read()) == [(1, "a", 1.0)]


# ---------------------------------------------------------------------------
# v2 position deletes (sequence-gated)
# ---------------------------------------------------------------------------

def test_position_deletes_apply_by_file_and_pos(spark, tmp_path):
    tdir = str(tmp_path / "t4")
    _mkdirs(tdir)
    d1 = os.path.join(tdir, "data", "f1.parquet")
    d2 = os.path.join(tdir, "data", "f2.parquet")
    _write_parquet(d1, {"k": [1, 2, 3], "cat": ["a", "b", "c"],
                        "val": [1.0, 2.0, 3.0]})
    _write_parquet(d2, {"k": [4, 5], "cat": ["d", "e"], "val": [4.0, 5.0]})
    # delete f1 pos 1 (k=2) and f2 pos 0 (k=4)
    pd1 = os.path.join(tdir, "data", "del1.parquet")
    _write_parquet(pd1, {"file_path": [d1, d2], "pos": [1, 0]})
    dm = _manifest(tdir, "dm.avro",
                   [_entry(pd1, content=1, rows=2, seq=5)])
    m = _manifest(tdir, "m.avro",
                  [_entry(d1, rows=3, seq=1), _entry(d2, rows=2, seq=1)])
    lst = _manifest_list(tdir, "snap-1.avro", [(m, 0, 1), (dm, 1, 5)])
    _metadata_v2(tdir, [_snap(400, 5, lst)], 400)
    got = IcebergLiteTable(spark, tdir).read()
    assert _rows(got) == [(1, "a", 1.0), (3, "c", 3.0), (5, "e", 5.0)]


def test_position_deletes_apply_with_space_in_table_path(spark, tmp_path):
    # _metadata.file_path is a percent-ENCODED URI; a raw compare
    # against the manifests' literal paths never matches when the
    # table dir holds a space etc., and the delete silently does not
    # apply — the exact corruption mode the Delta reader's
    # _decoded_path() fix closed (ADVICE r7). Pin the decode here too.
    tdir = str(tmp_path / "ice table")
    _mkdirs(tdir)
    d1 = os.path.join(tdir, "data", "f1.parquet")
    _write_parquet(d1, {"k": [1, 2, 3], "cat": ["a", "b", "c"],
                        "val": [1.0, 2.0, 3.0]})
    pd1 = os.path.join(tdir, "data", "del1.parquet")
    _write_parquet(pd1, {"file_path": [d1], "pos": [1]})
    m = _manifest(tdir, "m.avro", [_entry(d1, rows=3, seq=1)])
    dm = _manifest(tdir, "dm.avro",
                   [_entry(pd1, content=1, rows=1, seq=5)])
    lst = _manifest_list(tdir, "snap-1.avro", [(m, 0, 1), (dm, 1, 5)])
    _metadata_v2(tdir, [_snap(400, 5, lst)], 400)
    got = IcebergLiteTable(spark, tdir).read()
    assert _rows(got) == [(1, "a", 1.0), (3, "c", 3.0)]


def test_position_deletes_apply_with_relative_table_path(
        spark, tmp_path, monkeypatch):
    # a relative table path must not break the path-keyed delete join
    # (the reader abspaths it up front)
    tdir = str(tmp_path / "trel")
    _mkdirs(tdir)
    d1 = os.path.join(tdir, "data", "f1.parquet")
    _write_parquet(d1, {"k": [1, 2], "cat": ["a", "b"], "val": [1.0, 2.0]})
    pd1 = os.path.join(tdir, "data", "del1.parquet")
    _write_parquet(pd1, {"file_path": [d1], "pos": [0]})
    # manifests carry table-RELATIVE file paths: resolution must go
    # through the abspath'd table root, not the process cwd
    e1 = _entry(d1, rows=2, seq=1)
    e1["data_file"]["file_path"] = "data/f1.parquet"
    ed = _entry(pd1, content=1, rows=1, seq=5)
    ed["data_file"]["file_path"] = "data/del1.parquet"
    m = _manifest(tdir, "m.avro", [e1])
    dm = _manifest(tdir, "dm.avro", [ed])
    lst = _manifest_list(tdir, "snap-1.avro", [(m, 0, 1), (dm, 1, 5)])
    _metadata_v2(tdir, [_snap(400, 5, lst)], 400)
    monkeypatch.chdir(tmp_path)
    got = IcebergLiteTable(spark, "trel").read()
    assert _rows(got) == [(2, "b", 2.0)]


def test_position_delete_older_than_data_file_does_not_apply(spark,
                                                             tmp_path):
    # spec: a position delete applies to data files with data sequence
    # number <= the delete's; a REWRITTEN file with a newer sequence
    # number must keep its rows
    tdir = str(tmp_path / "t5")
    _mkdirs(tdir)
    d1 = os.path.join(tdir, "data", "f1.parquet")
    _write_parquet(d1, {"k": [1, 2], "cat": ["a", "b"], "val": [1.0, 2.0]})
    pd1 = os.path.join(tdir, "data", "del1.parquet")
    _write_parquet(pd1, {"file_path": [d1], "pos": [0]})
    m = _manifest(tdir, "m.avro", [_entry(d1, rows=2, seq=9)])  # newer
    dm = _manifest(tdir, "dm.avro",
                   [_entry(pd1, content=1, rows=1, seq=5)])  # older
    lst = _manifest_list(tdir, "snap-1.avro", [(m, 0, 9), (dm, 1, 5)])
    _metadata_v2(tdir, [_snap(500, 9, lst)], 500)
    got = IcebergLiteTable(spark, tdir).read()
    assert _rows(got) == [(1, "a", 1.0), (2, "b", 2.0)]


def test_sequence_number_inheritance_from_manifest(spark, tmp_path):
    # entries with null sequence_number inherit the manifest's (v2 spec
    # inheritance) — the pos delete at seq 5 must hit the inherited
    # seq-1 data file
    tdir = str(tmp_path / "t6")
    _mkdirs(tdir)
    d1 = os.path.join(tdir, "data", "f1.parquet")
    _write_parquet(d1, {"k": [1, 2], "cat": ["a", "b"], "val": [1.0, 2.0]})
    pd1 = os.path.join(tdir, "data", "del1.parquet")
    _write_parquet(pd1, {"file_path": [d1], "pos": [1]})
    m = _manifest(tdir, "m.avro", [_entry(d1, rows=2, seq=None)])
    dm = _manifest(tdir, "dm.avro",
                   [_entry(pd1, content=1, rows=1, seq=None)])
    lst = _manifest_list(tdir, "snap-1.avro", [(m, 0, 1), (dm, 1, 5)])
    _metadata_v2(tdir, [_snap(600, 5, lst)], 600)
    assert _rows(IcebergLiteTable(spark, tdir).read()) == [(1, "a", 1.0)]


# ---------------------------------------------------------------------------
# v2 equality deletes (strictly-older rule, null-safe match)
# ---------------------------------------------------------------------------

def test_equality_deletes_strictly_older_and_null_safe(spark, tmp_path):
    tdir = str(tmp_path / "t7")
    _mkdirs(tdir)
    # seq 1: k=1 (cat a), k=2 (cat NULL); seq 3: k=1 re-inserted
    d1 = os.path.join(tdir, "data", "f1.parquet")
    _write_parquet(d1, {"k": [1, 2], "cat": ["a", None],
                        "val": [1.0, 2.0]})
    d2 = os.path.join(tdir, "data", "f2.parquet")
    _write_parquet(d2, {"k": [1], "cat": ["a2"], "val": [10.0]})
    # eq delete at seq 2 on (k, cat): kills (1, 'a') and (2, NULL) from
    # seq-1 file; the seq-3 re-insert of k=1 must SURVIVE (strict <)
    ed = os.path.join(tdir, "data", "eq1.parquet")
    _write_parquet(ed, {"k": [1, 2],
                        "cat": pa.array(["a", None], type=pa.string())})
    m1 = _manifest(tdir, "m1.avro", [_entry(d1, rows=2, seq=1)])
    m2 = _manifest(tdir, "m2.avro", [_entry(d2, rows=1, seq=3)])
    dm = _manifest(tdir, "dm.avro",
                   [_entry(ed, content=2, rows=2, seq=2,
                           eq_ids=[1, 2])])  # field ids: k=1, cat=2
    lst = _manifest_list(tdir, "snap-1.avro",
                         [(m1, 0, 1), (m2, 0, 3), (dm, 1, 2)])
    _metadata_v2(tdir, [_snap(700, 3, lst)], 700)
    got = IcebergLiteTable(spark, tdir).read()
    assert _rows(got) == [(1, "a2", 10.0)]


def test_equality_delete_same_sequence_does_not_apply(spark, tmp_path):
    # data seq == delete seq -> NOT deleted (spec: strictly smaller)
    tdir = str(tmp_path / "t8")
    _mkdirs(tdir)
    d1 = os.path.join(tdir, "data", "f1.parquet")
    _write_parquet(d1, {"k": [9], "cat": ["z"], "val": [9.0]})
    ed = os.path.join(tdir, "data", "eq1.parquet")
    _write_parquet(ed, {"k": [9]})
    m1 = _manifest(tdir, "m1.avro", [_entry(d1, rows=1, seq=4)])
    dm = _manifest(tdir, "dm.avro",
                   [_entry(ed, content=2, rows=1, seq=4, eq_ids=[1])])
    lst = _manifest_list(tdir, "snap-1.avro", [(m1, 0, 4), (dm, 1, 4)])
    _metadata_v2(tdir, [_snap(800, 4, lst)], 800)
    assert _rows(IcebergLiteTable(spark, tdir).read()) == [(9, "z", 9.0)]


# ---------------------------------------------------------------------------
# refusals + resolution + connection surface
# ---------------------------------------------------------------------------

def test_format_version_3_refuses(spark, tmp_path):
    tdir = str(tmp_path / "t9")
    _mkdirs(tdir)
    _metadata_v2(tdir, [], None, extra={"format-version": 3})
    with pytest.raises(IcebergUnsupported, match="format-version=3"):
        IcebergLiteTable(spark, tdir).read()


def test_non_parquet_data_file_refuses(spark, tmp_path):
    tdir = str(tmp_path / "t10")
    _mkdirs(tdir)
    d1 = os.path.join(tdir, "data", "f1.parquet")
    _write_parquet(d1, {"k": [1], "cat": ["a"], "val": [1.0]})
    e = _entry(d1, rows=1, seq=1)
    e["data_file"]["file_format"] = "ORC"
    m = _manifest(tdir, "m.avro", [e])
    lst = _manifest_list(tdir, "snap-1.avro", [(m, 0, 1)])
    _metadata_v2(tdir, [_snap(900, 1, lst)], 900)
    with pytest.raises(IcebergUnsupported, match="ORC"):
        IcebergLiteTable(spark, tdir).read()


def test_metadata_resolution_prefers_hint_then_max_version(spark,
                                                           tmp_path):
    tdir = str(tmp_path / "t11")
    _two_snapshot_table(spark, tdir)  # writes v1.metadata.json + hint 1
    # add a v2 metadata file that pins current to the OLD snapshot
    meta1 = json.load(open(os.path.join(tdir, "metadata",
                                        "v1.metadata.json")))
    meta1["current-snapshot-id"] = 100
    with open(os.path.join(tdir, "metadata", "v2.metadata.json"),
              "w") as fh:
        json.dump(meta1, fh)
    t = IcebergLiteTable(spark, tdir)
    # hint says v1 -> current 200 (3 rows)
    assert len(_rows(t.read())) == 3
    # without the hint, the highest-numbered metadata file wins -> 2 rows
    os.remove(os.path.join(tdir, "metadata", "version-hint.text"))
    assert len(_rows(IcebergLiteTable(spark, tdir).read())) == 2


def test_connection_surface_lists_and_refuses_writes(spark, tmp_path):
    root = str(tmp_path)
    tdir = os.path.join(root, "sales")
    _two_snapshot_table(spark, tdir)
    os.makedirs(os.path.join(root, "not_a_table"))
    conn = IcebergLiteConnection({"path": root}, spark, "ice")
    assert conn.tables() == ["sales"]
    assert conn.read("sales").count() == 3
    with pytest.raises(NotImplementedError, match="read-only"):
        conn.write(None, "sales")


def test_type_mapping_decimal_fixed_nested():
    from pyspark.sql import types as T

    assert iceberg_type_to_spark("decimal(12, 2)") == T.DecimalType(12, 2)
    assert iceberg_type_to_spark("fixed[16]") == T.BinaryType()
    nested = iceberg_type_to_spark({
        "type": "list", "element-required": False,
        "element": {"type": "map", "key": "string", "value": "long",
                    "value-required": True}})
    assert nested == T.ArrayType(
        T.MapType(T.StringType(), T.LongType(), valueContainsNull=False),
        containsNull=True)
    with pytest.raises(IcebergUnsupported):
        iceberg_type_to_spark("time")


# ---------------------------------------------------------------------------
# export: manifest table -> spec-v2 Iceberg snapshot
# ---------------------------------------------------------------------------

def test_export_manifest_to_iceberg_roundtrip(spark, tmp_path):
    """Snapshot export: an external spec-conformant reader (our own
    IcebergLiteTable, reading only metadata/) sees exactly the manifest
    table's live rows; dv-masked tables refuse until materialized."""
    from pyspark.sql import functions as F

    from forklift_spark.connections.iceberglite import (
        export_manifest_to_iceberg,
    )
    from forklift_spark.manifest import ManifestTable

    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 4 + 1).cast("int").alias("p"),
        (F.col("id") * 10).alias("v"),
    )
    t = ManifestTable(spark, str(tmp_path / "m"), "m")
    t.create(df, partition_by="p")
    t.merge(
        spark.createDataFrame([(5, 2, 555), (200, 1, 2000)],
                              "k long, p int, v long"),
        on="k",
    )
    dest = str(tmp_path / "exported_ice")
    stats = export_manifest_to_iceberg(t, dest)
    assert stats["files"] >= 4
    assert stats["version"] == t.manifest()["version"]
    got = {(r.k, r.p, r.v)
           for r in IcebergLiteTable(spark, dest).read().collect()}
    want = {(r.k, r.p, r.v) for r in t.read().collect()}
    assert got == want and (5, 2, 555) in got and (200, 1, 2000) in got

    # dv-masked table refuses (external readers would resurrect rows)
    t2 = ManifestTable(spark, str(tmp_path / "m2"), "m2")
    t2.create(df)
    t2.merge(
        spark.createDataFrame([(7, 1, 777)], "k long, p int, v long"),
        on="k", use_dv=True,
    )
    with pytest.raises(ValueError, match="deletion vectors"):
        export_manifest_to_iceberg(t2, str(tmp_path / "e2"))


def test_spark_to_iceberg_schema_mapping_roundtrips():
    from pyspark.sql import types as T

    from forklift_spark.connections.iceberglite import (
        spark_type_to_iceberg,
    )

    st = T.StructType([
        T.StructField("a", T.LongType(), False),
        T.StructField("b", T.DecimalType(10, 3), True),
        T.StructField("c", T.ArrayType(T.StringType(), True), True),
        T.StructField("d", T.MapType(T.StringType(), T.DoubleType()), True),
        T.StructField("e", T.StructType([
            T.StructField("x", T.DateType(), True)]), True),
    ])
    counter = iter(range(1, 1000))
    ice = spark_type_to_iceberg(st, lambda: next(counter))
    # every nested field/element/key/value carries a distinct id
    ids = []

    def walk(t):
        if isinstance(t, dict):
            for k in ("id", "element-id", "key-id", "value-id"):
                if k in t:
                    ids.append(t[k])
            for k in ("type", "fields", "element", "key", "value"):
                v = t.get(k)
                if isinstance(v, list):
                    for f in v:
                        walk(f)
                elif isinstance(v, dict):
                    walk(v)
    walk(ice)
    # 5 top-level fields + element-id + key-id + value-id + nested x = 9
    assert len(ids) == len(set(ids)) and len(ids) == 9
    # and the reader maps it straight back
    back = iceberg_type_to_spark(ice)
    assert back == st


# ---------------------------------------------------------------------------
# incremental consumption: snapshot-diff changes feed
# ---------------------------------------------------------------------------

def test_changes_feed_returns_only_appended_rows(spark, tmp_path):
    tdir = str(tmp_path / "tc1")
    _two_snapshot_table(spark, tdir)
    t = IcebergLiteTable(spark, tdir)
    got = _rows(t.changes(100))  # 100 -> current (200): f2 only
    assert got == [(3, "c", 3.0)]
    assert _rows(t.changes(100, 200)) == [(3, "c", 3.0)]
    assert _rows(t.changes(200)) == []  # cursor at head -> empty


def test_changes_feed_refuses_non_append_only_range(spark, tmp_path):
    # snapshot 2 adds a position-delete file: the appended-rows feed
    # would misrepresent the delete as nothing-happened — refuse
    tdir = str(tmp_path / "tc2")
    _mkdirs(tdir)
    d1 = os.path.join(tdir, "data", "f1.parquet")
    _write_parquet(d1, {"k": [1, 2], "cat": ["a", "b"], "val": [1.0, 2.0]})
    pd1 = os.path.join(tdir, "data", "del1.parquet")
    _write_parquet(pd1, {"file_path": [d1], "pos": [0]})
    m = _manifest(tdir, "m.avro", [_entry(d1, rows=2, seq=1)])
    dm = _manifest(tdir, "dm.avro",
                   [_entry(pd1, content=1, rows=1, seq=2)])
    l1 = _manifest_list(tdir, "snap-1.avro", [(m, 0, 1)])
    l2 = _manifest_list(tdir, "snap-2.avro", [(m, 0, 1), (dm, 1, 2)])
    _metadata_v2(tdir, [_snap(100, 1, l1), _snap(200, 2, l2)], 200)
    t = IcebergLiteTable(spark, tdir)
    with pytest.raises(IcebergUnsupported, match="append-only"):
        t.changes(100)
    # the full snapshot read still applies the delete correctly
    assert _rows(t.read()) == [(2, "b", 2.0)]


def test_timestamp_as_of_time_travel(spark, tmp_path):
    tdir = str(tmp_path / "tts")
    _mkdirs(tdir)
    d1 = os.path.join(tdir, "data", "f1.parquet")
    d2 = os.path.join(tdir, "data", "f2.parquet")
    _write_parquet(d1, {"k": [1], "cat": ["a"], "val": [1.0]})
    _write_parquet(d2, {"k": [2], "cat": ["b"], "val": [2.0]})
    m1 = _manifest(tdir, "m1.avro", [_entry(d1, rows=1)])
    m2 = _manifest(tdir, "m2.avro", [_entry(d2, rows=1)])
    l1 = _manifest_list(tdir, "s1.avro", [(m1, 0, 1)])
    l2 = _manifest_list(tdir, "s2.avro", [(m1, 0, 1), (m2, 0, 2)])
    _metadata_v2(tdir, [_snap(100, 1, l1, ts=1000),
                        _snap(200, 2, l2, ts=2000)], 200)
    t = IcebergLiteTable(spark, tdir)
    assert _rows(t.read(as_of_ms=1500)) == [(1, "a", 1.0)]   # old snapshot
    assert _rows(t.read(as_of_ms=2000)) == [(1, "a", 1.0), (2, "b", 2.0)]
    with pytest.raises(ValueError, match="no snapshot at or before"):
        t.read(as_of_ms=999)
    with pytest.raises(ValueError, match="not both"):
        t.read(snapshot_id=100, as_of_ms=1500)


def test_lakehouse_incremental_pipe_iceberg(spark, tmp_path):
    """The version-cursor P2 pattern over an Iceberg source: snapshot id
    as cursor, appended files only on the second sync."""
    from forklift_spark.connections.parquet import ParquetConnection
    from forklift_spark.engine import Engine
    from forklift_spark.patterns import HwmStore, lakehouse_incremental_pipe

    root = str(tmp_path)
    tdir = os.path.join(root, "sales")
    _two_snapshot_table(spark, tdir)  # snapshots 100 (2 rows), 200 (3)
    eng = Engine({"project_root": root, "logger": {"stdout": False}},
                 spark=spark)
    src = IcebergLiteConnection({"path": root}, eng, "ice")
    dest = ParquetConnection({"path": os.path.join(root, "wh")}, eng)
    cursors = HwmStore(os.path.join(root, "cursors.json"))

    r1 = lakehouse_incremental_pipe(src, "sales", dest, "sales_copy",
                                    cursors, primary_key="k")
    assert r1["mode"] == "initial" and r1["to"] == 200
    assert dest.read("sales_copy").count() == 3
    assert lakehouse_incremental_pipe(
        src, "sales", dest, "sales_copy", cursors, primary_key="k"
    )["mode"] == "noop"

    # snapshot 300 appends one file; resync moves only that file's rows
    d3 = os.path.join(tdir, "data", "f3.parquet")
    _write_parquet(d3, {"k": [9], "cat": ["z"], "val": [9.0]})
    m3 = _manifest(tdir, "m3.avro", [_entry(d3, rows=1)])
    l2 = os.path.join(tdir, "metadata", "snap-200.avro")
    m1 = os.path.join(tdir, "metadata", "m1.avro")
    m2 = os.path.join(tdir, "metadata", "m2.avro")
    l3 = _manifest_list(tdir, "snap-300.avro",
                        [(m1, 0, 1), (m2, 0, 2), (m3, 0, 3)])
    _metadata_v2(
        tdir,
        [_snap(100, 1, os.path.join(tdir, "metadata", "snap-100.avro")),
         _snap(200, 2, l2), _snap(300, 3, l3)],
        300, version=2,
    )
    r2 = lakehouse_incremental_pipe(src, "sales", dest, "sales_copy",
                                    cursors, primary_key="k")
    assert r2["mode"] == "incremental" and (r2["from"], r2["to"]) == (200, 300)
    assert sorted(r.k for r in dest.read("sales_copy").collect()) == \
        [1, 2, 3, 9]


def test_field_id_resolution_reads_renamed_columns(spark, tmp_path):
    """resolve="id": a file written BEFORE a column rename carries the
    old name but the same field id; id resolution reads it correctly
    while the default name resolution (documented) null-fills."""
    tdir = str(tmp_path / "tid")
    _mkdirs(tdir)

    def _pq_with_ids(path, names, ids, cols):
        fields = [
            pa.field(n, pa.array(c).type,
                     metadata={b"PARQUET:field_id": str(i).encode()})
            for n, i, c in zip(names, ids, cols)
        ]
        pq.write_table(
            pa.Table.from_arrays([pa.array(c) for c in cols],
                                 schema=pa.schema(fields)), path)

    # file 1: written when column 2 was called 'category'
    d1 = os.path.join(tdir, "data", "f1.parquet")
    _pq_with_ids(d1, ["k", "category", "val"], [1, 2, 3],
                 [[1], ["old"], [1.0]])
    # file 2: written after the rename to 'cat'
    d2 = os.path.join(tdir, "data", "f2.parquet")
    _pq_with_ids(d2, ["k", "cat", "val"], [1, 2, 3],
                 [[2], ["new"], [2.0]])
    m = _manifest(tdir, "m.avro", [_entry(d1, rows=1), _entry(d2, rows=1)])
    lst = _manifest_list(tdir, "snap-1.avro", [(m, 0, 1)])
    _metadata_v2(tdir, [_snap(900, 1, lst)], 900)  # schema names it 'cat'
    t = IcebergLiteTable(spark, tdir)
    assert _rows(t.read(resolve="id")) == [(1, "old", 1.0),
                                           (2, "new", 2.0)]
    by_name = _rows(t.read())  # default: old file null-fills 'cat'
    assert by_name == [(1, None, 1.0), (2, "new", 2.0)]
