"""DeltaLite: read-only Delta Lake protocol-v1 reader (no delta jar).

The logs are built BY HAND from the public PROTOCOL.md action shapes —
that's the point: the reader must work from the spec alone, against
files this engine didn't write. Covers add/remove replay, time travel,
partition-value attachment (incl. the empty-string-is-NULL rule),
checkpoint + cleaned-log replay, and the loud protocol-v2 refusal.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from forklift_spark.connections.deltalite import (
    DeltaLiteConnection,
    DeltaLiteTable,
    DeltaUnsupported,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("p", T.IntegerType()),
])


def _one_parquet_file(spark, df, dest: str) -> None:
    """Write df as exactly one parquet FILE at dest (Spark writes dirs)."""
    tmp = dest + ".stage"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.move(part, dest)
    shutil.rmtree(tmp)


def _commit(log_dir: str, version: int, actions: list[dict]) -> None:
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _meta_action(partition_cols=("p",)) -> dict:
    return {"metaData": {
        "id": "11111111-2222-3333-4444-555555555555",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps(SCHEMA.jsonValue()),
        "partitionColumns": list(partition_cols),
        "configuration": {},
        "createdTime": 1700000000000,
    }}


def _add(path: str, pv: dict) -> dict:
    return {"add": {"path": path, "partitionValues": pv, "size": 1,
                    "modificationTime": 1700000000000, "dataChange": True}}


@pytest.fixture()
def delta_table(spark, tmp_path):
    """v0: p=1 (k 0..4) + p=2 (k 10..14); v1: p=1 file replaced by one
    with k 0..4 shifted values and a row removed (k=4 gone)."""
    root = str(tmp_path / "lake")
    tdir = os.path.join(root, "events")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)

    def part_df(lo, hi, tag):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            F.concat(F.lit(tag), F.col("id")).alias("v"),
        )

    _one_parquet_file(spark, part_df(0, 5, "a"), os.path.join(tdir, "p=1/f1.parquet"))
    _one_parquet_file(spark, part_df(10, 15, "b"), os.path.join(tdir, "p=2/f2.parquet"))
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta_action(),
        _add("p=1/f1.parquet", {"p": "1"}),
        _add("p=2/f2.parquet", {"p": "2"}),
    ])
    _one_parquet_file(spark, part_df(0, 4, "A"), os.path.join(tdir, "p=1/f3.parquet"))
    _commit(log, 1, [
        {"remove": {"path": "p=1/f1.parquet",
                    "deletionTimestamp": 1700000001000, "dataChange": True}},
        _add("p=1/f3.parquet", {"p": "1"}),
        {"commitInfo": {"operation": "MERGE"}},  # must be ignored
    ])
    return root, tdir


def test_read_current_and_time_travel(spark, delta_table):
    root, tdir = delta_table
    t = DeltaLiteTable(spark, tdir)
    cur = {(r.k, r.v, r.p) for r in t.read().collect()}
    assert cur == {(i, f"A{i}", 1) for i in range(4)} | {
        (i, f"b{i}", 2) for i in range(10, 15)}
    v0 = {(r.k, r.v, r.p) for r in t.read(version=0).collect()}
    assert v0 == {(i, f"a{i}", 1) for i in range(5)} | {
        (i, f"b{i}", 2) for i in range(10, 15)}
    assert [f.name for f in t.read().schema.fields] == ["k", "v", "p"]
    assert t.read().schema["p"].dataType == T.IntegerType()
    with pytest.raises(ValueError):
        t.read(version=9)


def test_partition_empty_string_is_null_for_int(spark, tmp_path):
    tdir = str(tmp_path / "t")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    df = spark.range(3).select(F.col("id").alias("k"),
                               F.lit("x").alias("v"))
    _one_parquet_file(spark, df, os.path.join(tdir, "f.parquet"))
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta_action(),
        _add("f.parquet", {"p": ""}),
    ])
    rows = DeltaLiteTable(spark, tdir).read().collect()
    assert len(rows) == 3 and all(r.p is None for r in rows)


def test_reader_version_2_accepted_version_4_refused(spark, tmp_path):
    # reader v2 == column mapping (supported since r8); with mode unset
    # the table reads as plain v1. Future reader versions still refuse.
    tdir = str(tmp_path / "t2")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        _meta_action(),
    ])
    assert DeltaLiteTable(spark, tdir).read().count() == 0

    tdir4 = str(tmp_path / "t4")
    log4 = os.path.join(tdir4, "_delta_log")
    os.makedirs(log4)
    _commit(log4, 0, [
        {"protocol": {"minReaderVersion": 4, "minWriterVersion": 9}},
        _meta_action(),
    ])
    with pytest.raises(DeltaUnsupported):
        DeltaLiteTable(spark, tdir4).read()


def test_checkpoint_replay_after_log_cleanup(spark, delta_table):
    """Write a v1 checkpoint by hand, DELETE the json commits <= 1 (the
    Delta retention job), add a v2 json on top: the snapshot must come
    from checkpoint + tail and match the pre-cleanup state."""
    root, tdir = delta_table
    log = os.path.join(tdir, "_delta_log")
    t = DeltaLiteTable(spark, tdir)
    before = {(r.k, r.v, r.p) for r in t.read().collect()}

    snap = t.snapshot(1)
    ckpt_schema = T.StructType([
        T.StructField("add", T.StructType([
            T.StructField("path", T.StringType()),
            T.StructField("partitionValues",
                          T.MapType(T.StringType(), T.StringType())),
            T.StructField("size", T.LongType()),
            T.StructField("modificationTime", T.LongType()),
            T.StructField("dataChange", T.BooleanType()),
        ])),
        T.StructField("metaData", T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("format", T.StructType([
                T.StructField("provider", T.StringType()),
                T.StructField("options",
                              T.MapType(T.StringType(), T.StringType())),
            ])),
            T.StructField("schemaString", T.StringType()),
            T.StructField("partitionColumns",
                          T.ArrayType(T.StringType())),
            T.StructField("configuration",
                          T.MapType(T.StringType(), T.StringType())),
            T.StructField("createdTime", T.LongType()),
        ])),
        T.StructField("protocol", T.StructType([
            T.StructField("minReaderVersion", T.IntegerType()),
            T.StructField("minWriterVersion", T.IntegerType()),
        ])),
    ])
    rows = [(None, ("11111111-2222-3333-4444-555555555555",
                    ("parquet", {}), json.dumps(SCHEMA.jsonValue()),
                    ["p"], {}, 1700000000000), None),
            (None, None, (1, 2))]
    rows += [((path, e["pv"], 1, 1700000000000, True), None, None)
             for path, e in snap["files"].items()]
    _one_parquet_file(
        spark, spark.createDataFrame(rows, ckpt_schema),
        os.path.join(log, f"{1:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": len(rows)}, fh)
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))

    assert {(r.k, r.v, r.p) for r in t.read().collect()} == before

    # v2 tail on top of the checkpoint: remove the p=2 file
    _commit(log, 2, [
        {"remove": {"path": "p=2/f2.parquet",
                    "deletionTimestamp": 1700000002000, "dataChange": True}},
    ])
    after = {(r.k, r.v, r.p) for r in t.read().collect()}
    assert after == {x for x in before if x[2] == 1}
    # time travel to the checkpoint version still works
    assert {(r.k, r.v, r.p) for r in t.read(version=1).collect()} == before


def test_connection_surface(spark, delta_table):
    root, tdir = delta_table

    class Eng:
        pass

    eng = Eng()
    eng.spark = spark
    conn = DeltaLiteConnection({"path": root}, eng, name="lake")
    assert conn.tables() == ["events"]
    assert conn.read("events").count() == 9
    assert conn.count("events") == 9
    with pytest.raises(NotImplementedError):
        conn.write(spark.range(1), "events")


def test_export_manifest_to_delta_roundtrip(spark, tmp_path):
    """Snapshot export: an external spec-conformant reader (our own
    DeltaLiteTable, reading only the log) sees exactly the manifest
    table's live rows; dv-masked tables refuse until materialized."""
    from forklift_spark.connections.deltalite import (
        export_manifest_to_delta,
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
    dest = str(tmp_path / "exported")
    stats = export_manifest_to_delta(t, dest)
    assert stats["files"] >= 4 and stats["version"] == t.manifest()["version"]
    got = {(r.k, r.p, r.v)
           for r in DeltaLiteTable(spark, dest).read().collect()}
    want = {(r.k, r.p, r.v) for r in t.read().collect()}
    assert got == want and (5, 2, 555) in got and (200, 1, 2000) in got

    # dv-masked table refuses; materializing clears the refusal
    t2 = ManifestTable(spark, str(tmp_path / "m2"), "m2")
    t2.create(df)
    t2.merge(
        spark.createDataFrame([(7, 1, 777)], "k long, p int, v long"),
        on="k", use_dv=True,
    )
    assert any(e.get("dv") for e in t2.manifest()["entries"])
    with pytest.raises(ValueError, match="deletion vectors"):
        export_manifest_to_delta(t2, str(tmp_path / "e2"))
    t2.compact()  # any dv'd partition is compact-eligible; masks materialize
    assert not any(e.get("dv") for e in t2.manifest()["entries"])
    dest2 = str(tmp_path / "e2")
    export_manifest_to_delta(t2, dest2)
    got2 = {(r.k, r.p, r.v)
            for r in DeltaLiteTable(spark, dest2).read().collect()}
    assert got2 == {(r.k, r.p, r.v) for r in t2.read().collect()}
    assert (7, 1, 777) in got2


def test_timestamp_as_of_time_travel(spark, delta_table):
    """TIMESTAMP AS OF: commit-file mtimes are the log's clock (the
    spec's rule); asking for a point before the first retained commit
    refuses instead of returning a later state."""
    root, tdir = delta_table
    log = os.path.join(tdir, "_delta_log")
    os.utime(os.path.join(log, f"{0:020d}.json"), (1000.0, 1000.0))
    os.utime(os.path.join(log, f"{1:020d}.json"), (2000.0, 2000.0))
    t = DeltaLiteTable(spark, tdir)
    old = {r.k for r in t.read(as_of_ms=1500_000).collect()}
    assert old == set(range(5)) | set(range(10, 15))  # v0 state
    new = {r.k for r in t.read(as_of_ms=2000_000).collect()}
    assert new == set(range(4)) | set(range(10, 15))  # v1: k=4 removed
    with pytest.raises(ValueError, match="no commit at or before"):
        t.read(as_of_ms=999_000)
    with pytest.raises(ValueError, match="not both"):
        t.read(version=0, as_of_ms=1500_000)


def test_changes_feed_appends_only(spark, delta_table):
    """Version-diff incremental feed: adds-only ranges return exactly
    the appended rows with partition values attached; ranges containing
    removes refuse (protocol v1 has no CDF)."""
    root, tdir = delta_table
    log = os.path.join(tdir, "_delta_log")
    # v2: pure append of a new partition
    df = spark.range(20, 23).select(
        F.col("id").alias("k"),
        F.concat(F.lit("c"), F.col("id")).alias("v"),
    )
    _one_parquet_file(spark, df, os.path.join(tdir, "p=3/f4.parquet"))
    _commit(log, 2, [_add("p=3/f4.parquet", {"p": "3"})])
    t = DeltaLiteTable(spark, tdir)
    got = t.changes(1).collect()  # 1 -> latest (2): only the p=3 file
    assert sorted((r.k, r.v, r.p) for r in got) == [
        (20, "c20", 3), (21, "c21", 3), (22, "c22", 3)
    ]
    assert t.changes(2).count() == 0  # cursor at head
    with pytest.raises(NotImplementedError, match="not append-only"):
        t.changes(0, 1)  # v1 contains a remove


def test_lakehouse_incremental_pipe_delta(spark, delta_table, tmp_path):
    """P2 with a version cursor: initial copy pinned at head, appended
    rows only on later syncs, full refresh when the range has removes."""
    from forklift_spark.connections.parquet import ParquetConnection
    from forklift_spark.engine import Engine
    from forklift_spark.patterns import HwmStore, lakehouse_incremental_pipe

    root, tdir = delta_table
    eng = Engine({"project_root": str(tmp_path),
                  "logger": {"stdout": False}}, spark=spark)
    src = DeltaLiteConnection({"path": root}, eng, "lake")
    dest = ParquetConnection({"path": str(tmp_path / "wh")}, eng)
    cursors = HwmStore(str(tmp_path / "cursors.json"))

    r1 = lakehouse_incremental_pipe(src, "events", dest, "events_copy",
                                    cursors, primary_key="k")
    assert r1["mode"] == "initial" and r1["to"] == 1
    assert dest.read("events_copy").count() == 9  # v1 state (k=4 gone)

    r_noop = lakehouse_incremental_pipe(src, "events", dest, "events_copy",
                                        cursors, primary_key="k")
    assert r_noop["mode"] == "noop"

    # v2: pure append -> incremental path moves only the delta
    log = os.path.join(tdir, "_delta_log")
    df = spark.range(20, 23).select(
        F.col("id").alias("k"), F.concat(F.lit("c"), F.col("id")).alias("v"))
    _one_parquet_file(spark, df, os.path.join(tdir, "p=3/f4.parquet"))
    _commit(log, 2, [_add("p=3/f4.parquet", {"p": "3"})])
    r2 = lakehouse_incremental_pipe(src, "events", dest, "events_copy",
                                    cursors, primary_key="k")
    assert r2["mode"] == "incremental" and (r2["from"], r2["to"]) == (1, 2)
    assert dest.read("events_copy").count() == 12

    # v3: a remove -> adds-only feed refuses -> full refresh, still right
    _commit(log, 3, [{"remove": {"path": "p=3/f4.parquet",
                                 "deletionTimestamp": 1, "dataChange": True}}])
    r3 = lakehouse_incremental_pipe(src, "events", dest, "events_copy",
                                    cursors, primary_key="k")
    assert r3["mode"] == "full_refresh"
    assert dest.read("events_copy").count() == 9
    assert cursors.get_raw("events->events_copy") == 3
