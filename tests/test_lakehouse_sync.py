"""Incremental lakehouse export (VERDICT r6 item 4): a recurring
publish appends O(delta) commits/snapshots to a previously exported
Delta log / Iceberg table instead of re-snapshotting, and an external
replay (our own spec readers, reading only the exported metadata)
matches the manifest table exactly after every sync."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from forklift_spark.connections.deltalite import (
    DeltaLiteTable,
    sync_manifest_to_delta,
)
from forklift_spark.connections.iceberglite import (
    IcebergLiteTable,
    IcebergUnsupported,
    sync_manifest_to_iceberg,
)
from forklift_spark.functions import avrocodec as av
from forklift_spark.manifest import ManifestTable


def _mk_table(spark, path, name="t"):
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 4 + 1).cast("int").alias("p"),
        (F.col("id") * 10).alias("v"),
    )
    t = ManifestTable(spark, path, name)
    t.create(df, partition_by="p")
    return t


def _rows(df):
    return {tuple(r) for r in df.select("k", "p", "v").collect()}


# ------------------------------------------------------------------ Delta


def test_delta_sync_full_then_incremental(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "m"))
    dest = str(tmp_path / "d")
    r1 = sync_manifest_to_delta(t, dest)
    assert r1["mode"] == "full" and r1["delta_version"] == 0

    # a merge rewrites the touched partition's files: removed + added
    t.merge(spark.createDataFrame([(5, 2, 555), (200, 1, 2000)],
                                  "k long, p int, v long"), on="k")
    r2 = sync_manifest_to_delta(t, dest)
    assert r2["mode"] == "incremental" and r2["delta_version"] == 1
    assert r2["added"] >= 1 and r2["removed"] >= 1

    # O(delta): the new commit holds exactly added+removed actions
    with open(os.path.join(dest, "_delta_log", f"{1:020d}.json")) as fh:
        actions = [json.loads(l) for l in fh if l.strip()]
    assert len(actions) == r2["added"] + r2["removed"]
    # untouched partitions' files were NOT re-linked as new adds
    total_files = len(t.manifest()["entries"])
    assert r2["added"] < total_files

    # external replay matches the source exactly
    assert _rows(DeltaLiteTable(spark, dest).read()) == _rows(t.read())

    # idempotent re-publish: no new commit
    r3 = sync_manifest_to_delta(t, dest)
    assert r3["mode"] == "noop"
    assert sorted(glob.glob(os.path.join(dest, "_delta_log", "*.json"))) \
        == [os.path.join(dest, "_delta_log", f"{v:020d}.json")
            for v in (0, 1)]


def test_delta_sync_schema_evolution(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "m"))
    dest = str(tmp_path / "d")
    sync_manifest_to_delta(t, dest)
    t.merge(spark.createDataFrame([(300, 1, 3000, "new")],
                                  "k long, p int, v long, tag string"),
            on="k")
    r = sync_manifest_to_delta(t, dest)
    assert r["mode"] == "incremental"
    ext = DeltaLiteTable(spark, dest).read()
    assert "tag" in ext.columns
    got = {tuple(r) for r in ext.select("k", "v", "tag").collect()}
    want = {tuple(r) for r in t.read().select("k", "v", "tag").collect()}
    assert got == want and (300, 3000, "new") in got


def test_delta_sync_dv_guard(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "m"))
    dest = str(tmp_path / "d")
    sync_manifest_to_delta(t, dest)
    t.merge(spark.createDataFrame([(7, 4, 777)], "k long, p int, v long"),
            on="k", use_dv=True)  # k=7 lives in p=4 (k%4+1)
    with pytest.raises(ValueError, match="deletion vectors"):
        sync_manifest_to_delta(t, dest)
    t.compact()
    assert sync_manifest_to_delta(t, dest)["mode"] == "incremental"
    assert _rows(DeltaLiteTable(spark, dest).read()) == _rows(t.read())


# ---------------------------------------------------------------- Iceberg


def test_iceberg_sync_full_then_incremental(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "m"))
    dest = str(tmp_path / "i")
    r1 = sync_manifest_to_iceberg(t, dest)
    assert r1["mode"] == "full" and r1["snapshot_id"] == 1
    first_manifest_paths = _list_manifest_paths(spark, dest)

    t.merge(spark.createDataFrame([(5, 2, 555), (200, 1, 2000)],
                                  "k long, p int, v long"), on="k")
    r2 = sync_manifest_to_iceberg(t, dest)
    assert r2["mode"] == "incremental" and r2["snapshot_id"] == 2
    assert r2["added"] >= 1 and r2["removed"] >= 1

    # external replay (spec reader over exported metadata only)
    ext = IcebergLiteTable(spark, dest)
    assert _rows(ext.read()) == _rows(t.read())
    # time travel: snapshot 1 still replays the pre-merge state
    pre = _rows(ext.read(snapshot_id=1))
    assert (5, 2, 50) in pre and (5, 2, 555) not in pre

    # O(delta): untouched partitions' manifest may be reused; only
    # manifests containing removed files were rewritten
    assert r2["rewritten_manifests"] >= 1

    r3 = sync_manifest_to_iceberg(t, dest)
    assert r3["mode"] == "noop"
    # a second merge produces snapshot 3 and keeps matching
    t.merge(spark.createDataFrame([(6, 3, 666)], "k long, p int, v long"),
            on="k")
    r4 = sync_manifest_to_iceberg(t, dest)
    assert r4["snapshot_id"] == 3
    assert _rows(IcebergLiteTable(spark, dest).read()) == _rows(t.read())
    del first_manifest_paths


def test_iceberg_sync_reuses_untouched_manifests(spark, tmp_path):
    """Append-only growth must reuse every prior manifest verbatim —
    the property that makes a recurring publish O(delta)."""
    t = _mk_table(spark, str(tmp_path / "m"))
    dest = str(tmp_path / "i")
    sync_manifest_to_iceberg(t, dest)
    before = set(_list_manifest_paths(spark, dest))
    t.merge(spark.createDataFrame([(500, 1, 5000)],
                                  "k long, p int, v long"), on="k")
    r = sync_manifest_to_iceberg(t, dest)
    assert r["mode"] == "incremental" and r["removed"] == 0
    assert r["rewritten_manifests"] == 0
    after = _list_manifest_paths(spark, dest)
    assert before <= set(after)          # all old manifests reused
    assert len(after) == len(before) + 1  # plus exactly one new one
    assert _rows(IcebergLiteTable(spark, dest).read()) == _rows(t.read())


def test_iceberg_sync_schema_evolution_keeps_field_ids(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "m"))
    dest = str(tmp_path / "i")
    sync_manifest_to_iceberg(t, dest)
    old_schema = IcebergLiteTable(spark, dest).metadata()["schemas"][0]
    old_ids = {f["name"]: f["id"] for f in old_schema["fields"]}

    t.merge(spark.createDataFrame([(300, 1, 3000, "new")],
                                  "k long, p int, v long, tag string"),
            on="k")
    assert sync_manifest_to_iceberg(t, dest)["mode"] == "incremental"
    ext = IcebergLiteTable(spark, dest)
    meta = ext.metadata()
    cur = next(s for s in meta["schemas"]
               if s["schema-id"] == meta["current-schema-id"])
    new_ids = {f["name"]: f["id"] for f in cur["fields"]}
    for name, fid in old_ids.items():
        assert new_ids[name] == fid     # existing columns keep their ids
    assert new_ids["tag"] > max(old_ids.values())
    got = {tuple(r) for r in ext.read().select("k", "v", "tag").collect()}
    want = {tuple(r) for r in t.read().select("k", "v", "tag").collect()}
    assert got == want


def test_iceberg_sync_type_change_refuses(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "m"))
    dest = str(tmp_path / "i")
    sync_manifest_to_iceberg(t, dest)
    # simulate a type change by tampering with the recorded schema
    m = t.manifest()
    schema = json.loads(json.dumps(m["schema"]))
    for f in schema["fields"]:
        if f["name"] == "v":
            f["type"] = "string"
    t_fake = _FakeTable(t, schema)
    with pytest.raises(IcebergUnsupported, match="changed type"):
        sync_manifest_to_iceberg(t_fake, dest)


class _FakeTable:
    """Minimal stand-in: same entries/files, tampered schema."""

    def __init__(self, real, schema):
        self._real = real
        self._schema = schema
        self.spark = real.spark
        self.path = real.path

    def manifest(self):
        m = dict(self._real.manifest())
        m["schema"] = self._schema
        return m


def _list_manifest_paths(spark, dest) -> list[str]:
    ext = IcebergLiteTable(spark, dest)
    meta = ext.metadata()
    snap = ext._snapshot_entry(meta)
    _, mf_entries = av.read_container_file(ext._abs(snap["manifest-list"]))
    return [m["manifest_path"] for m in mf_entries]


def test_iceberg_export_validates_with_pyiceberg(spark, tmp_path):
    """Gated external validation (ADVICE r6 item 1): when pyiceberg is
    deployable, the exported table must load and scan through it — the
    real spec-conformance check this repo's own reader can't provide.
    Skipped in images without the package (it is not baked in here)."""
    pyiceberg_table = pytest.importorskip("pyiceberg.table")

    t = _mk_table(spark, str(tmp_path / "m"))
    dest = str(tmp_path / "i")
    sync_manifest_to_iceberg(t, dest)
    t.merge(spark.createDataFrame([(5, 2, 555)], "k long, p int, v long"),
            on="k")
    sync_manifest_to_iceberg(t, dest)

    meta_file = IcebergLiteTable(spark, dest)._resolve_metadata_file()
    from pyiceberg.io.pyarrow import PyArrowFileIO

    tbl = pyiceberg_table.StaticTable.from_metadata(
        meta_file, {"py-io-impl": "pyiceberg.io.pyarrow.PyArrowFileIO"})
    got = tbl.scan().to_arrow().to_pylist()
    want = [r.asDict() for r in t.read().collect()]
    key = lambda d: (d["k"], d["p"], d["v"])  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)
    del PyArrowFileIO


# ------------------------------------------------- native dv (Iceberg)


def test_iceberg_native_dv_export_and_sync(spark, tmp_path):
    """dv_mode='native': manifest dv masks export as v2 POSITION
    DELETES; a later dv merge syncs as one DELTA delete file; a rewind
    refuses (v2 delete content cannot un-delete)."""
    from forklift_spark.connections.iceberglite import (
        export_manifest_to_iceberg,
    )

    t = _mk_table(spark, str(tmp_path / "m"))
    t.merge(spark.createDataFrame([(7, 4, 777)], "k long, p int, v long"),
            on="k", use_dv=True)  # 7 % 4 + 1 = 4
    dest = str(tmp_path / "i")
    with pytest.raises(ValueError, match="dv_mode='native'"):
        export_manifest_to_iceberg(t, dest)  # default still refuses
    stats = export_manifest_to_iceberg(t, dest, dv_mode="native")
    assert stats["rows"] == 100  # live rows only
    assert _rows(IcebergLiteTable(spark, dest).read()) == _rows(t.read())

    # dv growth -> one delta delete file in the next snapshot
    pre = t.current_version()
    t.merge(spark.createDataFrame([(11, 4, 1111)], "k long, p int, v long"),
            on="k", use_dv=True)
    r = sync_manifest_to_iceberg(t, dest, dv_mode="native")
    assert r["mode"] == "incremental" and r["dv_updated"] >= 1
    ext = IcebergLiteTable(spark, dest)
    assert _rows(ext.read()) == _rows(t.read())
    got = _rows(ext.read())
    assert (11, 4, 1111) in got and (11, 4, 110) not in got
    assert sync_manifest_to_iceberg(t, dest, dv_mode="native")["mode"] \
        == "noop"

    # rewind: restore() shrinks the mask -> loud refusal
    t.restore(pre)
    with pytest.raises(IcebergUnsupported, match="un-delete"):
        sync_manifest_to_iceberg(t, dest, dv_mode="native")
