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


# ------------------------------- spec-strict reconciliation (ADVICE r7)


def _spec_reconcile(dest: str) -> dict:
    """Replay the exported Delta log EXACTLY as the spec's Action
    Reconciliation describes: logical files keyed by (path, dv
    uniqueId), per-commit order-independent (removes cancel matching
    adds). This is what delta-spark/kernel/delta-rs do — the repo's own
    path-keyed reader must not be the only consumer that works."""
    from forklift_spark.connections.deltalite import dv_unique_id

    live: dict[tuple, dict] = {}
    log = os.path.join(dest, "_delta_log")
    for f in sorted(os.listdir(log)):
        if not f.endswith(".json"):
            continue
        adds, removes = [], []
        with open(os.path.join(log, f)) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                act = json.loads(line)
                if "add" in act:
                    adds.append(act["add"])
                elif "remove" in act:
                    removes.append(act["remove"])
        for r in removes:
            live.pop((r["path"], dv_unique_id(r.get("deletionVector"))),
                     None)
        for a in adds:
            live[(a["path"], dv_unique_id(a.get("deletionVector")))] = a
    return live


def test_delta_sync_native_dv_spec_reconciliation(spark, tmp_path):
    """ADVICE r7 (high): a dv-update sync must tombstone the OLD
    logical file (path, oldDV) — under strict (path, dvId)-keyed
    replay, each path appears exactly once after every sync (no
    duplicate-row or resurrected-row logical files)."""
    t = _mk_table(spark, str(tmp_path / "m"))
    t.merge(spark.createDataFrame([(7, 4, 777)], "k long, p int, v long"),
            on="k", use_dv=True)
    dest = str(tmp_path / "d")
    sync_manifest_to_delta(t, dest, dv_mode="native")

    # dv growth on the same file -> dv_updated re-add
    t.merge(spark.createDataFrame([(11, 4, 1111)], "k long, p int, v long"),
            on="k", use_dv=True)
    r = sync_manifest_to_delta(t, dest, dv_mode="native")
    assert r["dv_updated"] >= 1
    live = _spec_reconcile(dest)
    paths = [p for p, _uid in live]
    assert len(paths) == len(set(paths)), \
        f"duplicate logical files after dv update: {sorted(paths)}"
    # the updated file's live DV is the NEW one (cardinality 2 masks)
    dv_adds = [a for a in live.values() if a.get("deletionVector")]
    assert dv_adds and all(
        int(a["deletionVector"]["cardinality"]) == 2 for a in dv_adds)

    # a file gaining its FIRST dv via a v1-exported path: (path, None)
    # must be tombstoned too
    t2 = _mk_table(spark, str(tmp_path / "m2"), "t2")
    dest2 = str(tmp_path / "d2")
    sync_manifest_to_delta(t2, dest2)            # no masks: v1 export
    t2.merge(spark.createDataFrame([(3, 4, 33)], "k long, p int, v long"),
             on="k", use_dv=True)
    sync_manifest_to_delta(t2, dest2, dv_mode="native")
    live2 = _spec_reconcile(dest2)
    paths2 = [p for p, _uid in live2]
    assert len(paths2) == len(set(paths2))

    # removing a DV-carrying file (compact rewrites it) must restate
    # the dv descriptor on the remove so (path, oldDV) is tombstoned
    t.compact()
    sync_manifest_to_delta(t, dest, dv_mode="native")
    live3 = _spec_reconcile(dest)
    paths3 = [p for p, _uid in live3]
    assert len(paths3) == len(set(paths3))
    assert all(uid is None for _p, uid in live3)  # masks compacted away
    # and the strict-replay live set matches the engine's own reader
    assert _rows(DeltaLiteTable(spark, dest).read()) == _rows(t.read())


def test_iceberg_pos_delete_field_ids(spark, tmp_path):
    """ADVICE r7: v2 position-delete parquet columns must carry the
    spec's RESERVED field ids (file_path=2147483546, pos=2147483545) —
    Java/pyiceberg resolve delete-file columns by field id."""
    import glob as _glob

    import pyarrow.parquet as pq

    from forklift_spark.connections.iceberglite import (
        export_manifest_to_iceberg,
    )

    t = _mk_table(spark, str(tmp_path / "m"))
    t.merge(spark.createDataFrame([(7, 4, 777)], "k long, p int, v long"),
            on="k", use_dv=True)
    dest = str(tmp_path / "i")
    export_manifest_to_iceberg(t, dest, dv_mode="native")
    dfiles = _glob.glob(os.path.join(dest, "deletes", "*.parquet"))
    assert dfiles
    sch = pq.read_schema(dfiles[0])
    fids = {
        sch.field(i).name:
        (sch.field(i).metadata or {}).get(b"PARQUET:field_id")
        for i in range(len(sch.names))
    }
    assert fids["file_path"] == b"2147483546"
    assert fids["pos"] == b"2147483545"


def test_iceberg_sync_recomputes_missing_list_counts(spark, tmp_path):
    """ADVICE r7 (low): manifest-list entries from a pre-r7 export lack
    the v2 count fields; reusing them must RECOMPUTE counts from the
    manifest entries, not default to 0 (readers may skip zero-count
    manifests)."""
    from forklift_spark.connections.iceberglite import (
        MANIFEST_FILE_SCHEMA,
        _ensure_list_counts,
    )

    t = _mk_table(spark, str(tmp_path / "m"))
    dest = str(tmp_path / "i")
    sync_manifest_to_iceberg(t, dest)

    # simulate a pre-r7 export: rewrite the manifest list with the
    # count fields stripped
    ext = IcebergLiteTable(spark, dest)
    meta = ext.metadata()
    snap = ext._snapshot_entry(meta)
    lpath = ext._abs(snap["manifest-list"])
    _, entries = av.read_container_file(lpath)
    count_names = {"added_files_count", "existing_files_count",
                   "deleted_files_count", "added_rows_count",
                   "existing_rows_count", "deleted_rows_count"}
    old_schema = {
        "type": "record", "name": "manifest_file",
        "fields": [f for f in MANIFEST_FILE_SCHEMA["fields"]
                   if f["name"] not in count_names],
    }
    stripped = [{k: v for k, v in e.items() if k not in count_names}
                for e in entries]
    av.write_container_file(lpath, json.dumps(old_schema), stripped)
    _, reread = av.read_container_file(lpath)
    assert all(e.get("added_files_count") is None for e in reread)

    # unit: recompute fills real counts
    fixed = _ensure_list_counts(dict(reread[0]), [
        {"status": 1, "data_file": {"record_count": 10}},
        {"status": 0, "data_file": {"record_count": 5}},
        {"status": 2, "data_file": {"record_count": 3}},
    ])
    assert fixed["added_files_count"] == 1
    assert fixed["existing_files_count"] == 1
    assert fixed["deleted_files_count"] == 1
    assert fixed["added_rows_count"] == 10
    assert fixed["existing_rows_count"] == 5
    assert fixed["deleted_rows_count"] == 3

    # integration: append-only sync reuses the stripped entries and the
    # NEW manifest list carries recomputed (nonzero) counts for them
    t.merge(spark.createDataFrame([(500, 1, 5000)],
                                  "k long, p int, v long"), on="k")
    r = sync_manifest_to_iceberg(t, dest)
    assert r["mode"] == "incremental"
    ext2 = IcebergLiteTable(spark, dest)
    meta2 = ext2.metadata()
    snap2 = ext2._snapshot_entry(meta2)
    _, entries2 = av.read_container_file(ext2._abs(snap2["manifest-list"]))
    reused = [e for e in entries2
              if e.get("added_snapshot_id") != r["snapshot_id"]]
    assert reused
    for e in reused:
        assert (int(e["added_files_count"]) + int(e["existing_files_count"])
                ) > 0, f"zero live-file counts on reused entry: {e}"
    assert _rows(ext2.read()) == _rows(t.read())


# --------------------------------------- dest-side vacuum (VERDICT r7 #2)


def test_delta_vacuum_long_lived_publisher(spark, tmp_path):
    """>=3 dv-growth syncs + compact + vacuum: external replay still
    matches the source after every step, and the dest ends with NO
    unreferenced DV bins or tombstoned data files."""
    from forklift_spark.connections.deltalite import (
        dv_file_path,
        vacuum_delta_export,
    )

    t = _mk_table(spark, str(tmp_path / "m"))
    dest = str(tmp_path / "d")
    sync_manifest_to_delta(t, dest, dv_mode="native")
    for k, v in [(7, 777), (11, 1111), (15, 1500)]:  # 3 dv growths
        t.merge(spark.createDataFrame([(k, 4, v)], "k long, p int, v long"),
                on="k", use_dv=True)
        r = sync_manifest_to_delta(t, dest, dv_mode="native")
        assert r["mode"] == "incremental"
        assert _rows(DeltaLiteTable(spark, dest).read()) == _rows(t.read())
    # each dv sync wrote a NEW bin; only the latest is referenced
    bins = [f for dp, _d, fs in os.walk(dest) for f in fs
            if f.startswith("deletion_vector_")]
    assert len(bins) == 3

    # grace window: a fresh vacuum keeps everything (files too young)
    r0 = vacuum_delta_export(spark, dest)
    assert r0["removed"] == 0 and r0["kept_grace"] >= 2

    res = vacuum_delta_export(spark, dest, grace_ms=0)
    assert res["removed"] >= 2  # the two superseded bins at minimum
    ext = DeltaLiteTable(spark, dest)
    assert _rows(ext.read()) == _rows(t.read())
    snap = ext.snapshot()
    live_bins = {os.path.normpath(dv_file_path(ext.path, e["dv"]))
                 for e in snap["files"].values() if e.get("dv")}
    on_disk = {os.path.normpath(os.path.join(dp, f))
               for dp, _d, fs in os.walk(dest) for f in fs
               if f.startswith("deletion_vector_")}
    assert on_disk == live_bins  # no unreferenced DV files remain

    # compact clears masks; after sync + vacuum no bins remain at all
    t.compact()
    sync_manifest_to_delta(t, dest, dv_mode="native")
    vacuum_delta_export(spark, dest, grace_ms=0)
    assert not [f for dp, _d, fs in os.walk(dest) for f in fs
                if f.startswith("deletion_vector_")]
    assert _rows(DeltaLiteTable(spark, dest).read()) == _rows(t.read())
    # the log itself is untouched: full history of commits remains
    assert len(DeltaLiteTable(spark, dest).versions()) >= 5


def test_iceberg_vacuum_and_delete_file_compaction(spark, tmp_path):
    """The Iceberg maintenance story: compact() the SOURCE then sync —
    rewritten files arrive mask-free, dead delete manifests drop out of
    the new snapshot, and vacuum reclaims the orphaned parquet."""
    from forklift_spark.connections.iceberglite import (
        vacuum_iceberg_export,
    )

    t = _mk_table(spark, str(tmp_path / "m"))
    dest = str(tmp_path / "i")
    sync_manifest_to_iceberg(t, dest)
    for k, v in [(7, 777), (11, 1111)]:
        t.merge(spark.createDataFrame([(k, 4, v)], "k long, p int, v long"),
                on="k", use_dv=True)
        sync_manifest_to_iceberg(t, dest, dv_mode="native")
        assert _rows(IcebergLiteTable(spark, dest).read()) == _rows(t.read())
    ext = IcebergLiteTable(spark, dest)
    assert ext.file_inventory()["pos_deletes"]  # masks live as deletes

    # compact-then-sync: rewritten files arrive mask-free and the new
    # snapshot carries NO delete manifests (dead ones dropped)
    t.compact()
    r = sync_manifest_to_iceberg(t, dest, dv_mode="native")
    assert r["mode"] == "incremental"
    ext2 = IcebergLiteTable(spark, dest)
    inv = ext2.file_inventory()
    assert inv["pos_deletes"] == [] and inv["eq_deletes"] == []
    assert _rows(ext2.read()) == _rows(t.read())

    # vacuum reclaims orphaned delete parquet + removed data files;
    # metadata/ (snapshot history) is never touched
    meta_files_before = sorted(os.listdir(os.path.join(dest, "metadata")))
    res = vacuum_iceberg_export(spark, dest, grace_ms=0)
    assert res["removed"] >= 2
    assert sorted(os.listdir(os.path.join(dest, "metadata"))) \
        == meta_files_before
    assert not os.path.isdir(os.path.join(dest, "deletes")) or not [
        f for f in os.listdir(os.path.join(dest, "deletes"))
        if f.endswith(".parquet")]
    assert _rows(IcebergLiteTable(spark, dest).read()) == _rows(t.read())
    live = {os.path.normpath(r2["path"])
            for r2 in IcebergLiteTable(spark, dest)
            .file_inventory()["data"]}
    on_disk = {os.path.normpath(os.path.join(dp, f))
               for dp, dirs, fs in os.walk(dest)
               if "metadata" not in dp
               for f in fs if f.endswith(".parquet")}
    assert on_disk == live


# ---------------------- checkpointing + snapshot expiry (r8 additions)


def test_delta_sync_writes_checkpoint_and_replays_cleaned_log(
        spark, tmp_path):
    """Every 10th sync commit writes a spec parquet checkpoint +
    _last_checkpoint, so external replay is bounded at checkpoint +
    tail — even after the pre-checkpoint JSON commits are cleaned (the
    Delta retention job)."""
    from forklift_spark.connections.deltalite import (
        checkpoint_delta_export,
    )

    t = _mk_table(spark, str(tmp_path / "m"))
    dest = str(tmp_path / "d")
    sync_manifest_to_delta(t, dest)             # delta version 0
    r = None
    for i in range(10):                          # versions 1..10
        t.merge(spark.createDataFrame([(1000 + i, 1, i)],
                                      "k long, p int, v long"), on="k")
        r = sync_manifest_to_delta(t, dest)
    assert r["delta_version"] == 10 and r.get("checkpoint") == 10
    log = os.path.join(dest, "_delta_log")
    assert os.path.exists(os.path.join(log, f"{10:020d}.checkpoint.parquet"))
    assert json.load(open(os.path.join(log, "_last_checkpoint")))[
        "version"] == 10
    assert _rows(DeltaLiteTable(spark, dest).read()) == _rows(t.read())

    # clean the pre-checkpoint JSON commits: replay must still work
    for v in range(0, 10):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    t.merge(spark.createDataFrame([(2000, 2, 42)],
                                  "k long, p int, v long"), on="k")
    r2 = sync_manifest_to_delta(t, dest)         # tail commit 11
    assert r2["delta_version"] == 11
    assert _rows(DeltaLiteTable(spark, dest).read()) == _rows(t.read())
    # time travel to a cleaned version refuses loudly
    with pytest.raises(FileNotFoundError, match="missing commit"):
        DeltaLiteTable(spark, dest).snapshot(5)

    # standalone re-checkpoint at the new head also works
    ck = checkpoint_delta_export(spark, dest)
    assert ck["version"] == 11 and ck["actions"] >= 2


def test_delta_checkpoint_preserves_dv_and_tags(spark, tmp_path):
    """DV descriptors AND the forklift_dv_src tag survive the parquet
    checkpoint round-trip: masked rows stay hidden when replaying from
    the checkpoint, and the next dv sync still detects churn exactly
    (a lost tag would re-add every masked file)."""
    from forklift_spark.connections.deltalite import (
        checkpoint_delta_export,
    )

    t = _mk_table(spark, str(tmp_path / "m"))
    dest = str(tmp_path / "d")
    t.merge(spark.createDataFrame([(7, 4, 777)], "k long, p int, v long"),
            on="k", use_dv=True)
    sync_manifest_to_delta(t, dest, dv_mode="native")
    checkpoint_delta_export(spark, dest)
    log = os.path.join(dest, "_delta_log")
    os.remove(os.path.join(log, f"{0:020d}.json"))  # checkpoint-only
    ext = DeltaLiteTable(spark, dest)
    got = _rows(ext.read())
    assert got == _rows(t.read())
    assert (7, 4, 777) in got and (7, 4, 70) not in got

    # noop detection still exact from checkpoint state (tags intact)
    r = sync_manifest_to_delta(t, dest, dv_mode="native")
    assert r["mode"] == "noop", r
    # and a real dv growth is still detected as exactly one update
    t.merge(spark.createDataFrame([(11, 4, 1111)], "k long, p int, v long"),
            on="k", use_dv=True)
    r2 = sync_manifest_to_delta(t, dest, dv_mode="native")
    assert r2["mode"] == "incremental" and r2["dv_updated"] == 1
    assert _rows(DeltaLiteTable(spark, dest).read()) == _rows(t.read())


def test_iceberg_expire_snapshots(spark, tmp_path):
    """expire_iceberg_export_snapshots keeps the last N snapshots,
    deletes manifest avros referenced ONLY by expired ones (reused
    manifests survive), and expired time travel fails loudly."""
    from forklift_spark.connections.iceberglite import (
        expire_iceberg_export_snapshots,
    )

    t = _mk_table(spark, str(tmp_path / "m"))
    dest = str(tmp_path / "i")
    sync_manifest_to_iceberg(t, dest)            # snapshot 1
    for i in range(6):                           # snapshots 2..7
        t.merge(spark.createDataFrame([(3000 + i, 1, i)],
                                      "k long, p int, v long"), on="k")
        sync_manifest_to_iceberg(t, dest)
    ext = IcebergLiteTable(spark, dest)
    assert len(ext.metadata()["snapshots"]) == 7

    res = expire_iceberg_export_snapshots(spark, dest, keep_last=3)
    assert res["expired"] == 4 and res["kept"] == 3
    ext2 = IcebergLiteTable(spark, dest)
    meta2 = ext2.metadata()
    assert len(meta2["snapshots"]) == 3
    assert meta2["current-snapshot-id"] == 7
    assert _rows(ext2.read()) == _rows(t.read())
    # retained history still time-travels; expired does not
    assert _rows(ext2.read(snapshot_id=5)) != _rows(t.read())
    with pytest.raises(ValueError, match="snapshot 1 not in"):
        ext2.read(snapshot_id=1)
    # idempotent / no-op below threshold
    assert expire_iceberg_export_snapshots(
        spark, dest, keep_last=5)["expired"] == 0
    # vacuum still agrees with the retained state
    from forklift_spark.connections.iceberglite import (
        vacuum_iceberg_export,
    )
    vacuum_iceberg_export(spark, dest, grace_ms=0)
    assert _rows(IcebergLiteTable(spark, dest).read()) == _rows(t.read())


def test_checkpoint_restates_declared_protocol_no_downgrade(
        spark, tmp_path):
    """A checkpoint must restate the table protocol AS DECLARED:
    once a dv sync upgraded the log to reader version 3, a later
    checkpoint written AFTER compact() cleared every mask still says
    v3 — protocols never downgrade."""
    import pyarrow.parquet as pq

    from forklift_spark.connections.deltalite import (
        checkpoint_delta_export,
    )

    t = _mk_table(spark, str(tmp_path / "m"))
    dest = str(tmp_path / "d")
    sync_manifest_to_delta(t, dest)
    t.merge(spark.createDataFrame([(7, 4, 777)], "k long, p int, v long"),
            on="k", use_dv=True)
    sync_manifest_to_delta(t, dest, dv_mode="native")  # v3 upgrade
    t.compact()                                        # masks gone
    sync_manifest_to_delta(t, dest, dv_mode="native")
    ck = checkpoint_delta_export(spark, dest)
    cfile = os.path.join(dest, "_delta_log",
                         f"{ck['version']:020d}.checkpoint.parquet")
    tb = pq.read_table(cfile, columns=["protocol"]).to_pylist()
    protos = [r["protocol"] for r in tb if r["protocol"] is not None
              and r["protocol"].get("minReaderVersion") is not None]
    assert protos and protos[-1]["minReaderVersion"] == 3
    assert "deletionVectors" in (protos[-1]["readerFeatures"] or [])
    # and the checkpoint-only replay still works and matches
    for f in os.listdir(os.path.join(dest, "_delta_log")):
        if f.endswith(".json"):
            os.remove(os.path.join(dest, "_delta_log", f))
    assert _rows(DeltaLiteTable(spark, dest).read()) == _rows(t.read())


def test_delta_sync_writes_change_data_feed(spark, tmp_path):
    """cdf=True: the publisher writes REAL _change_data files for
    commits with deletes/dv churn; change_feed() consumes the cdc
    actions verbatim (adds/removes of those commits are ignored per
    spec, so a wrong cdc file breaks the feed, not just decorates it).
    """
    import os

    from forklift_spark.connections.deltalite import (
        DeltaLiteTable,
        sync_manifest_to_delta,
    )

    t = _mk_table(spark, str(tmp_path / "m"))
    dest = str(tmp_path / "d")
    sync_manifest_to_delta(t, dest, dv_mode="native", cdf=True)   # v0
    meta = DeltaLiteTable(spark, dest).snapshot()["meta"]
    assert (meta.get("configuration") or {}).get(
        "delta.enableChangeDataFeed") == "true"

    # v1: dv update (k=7 -> 777) + insert (k=200)
    t.merge(spark.createDataFrame([(7, 4, 777), (200, 1, 2000)],
                                  "k long, p int, v long"),
            on="k", use_dv=True)
    r = sync_manifest_to_delta(t, dest, dv_mode="native")
    assert r["dv_updated"] >= 1
    log1 = open(os.path.join(dest, "_delta_log",
                             f"{1:020d}.json")).read()
    assert '"cdc"' in log1
    dt = DeltaLiteTable(spark, dest)
    rows = {(r.k, r.v, r._change_type)
            for r in dt.change_feed(0).collect()}
    assert (7, 70, "delete") in rows
    assert (7, 777, "insert") in rows and (200, 2000, "insert") in rows
    assert (7, 70, "insert") not in rows  # adds not double-counted

    # v2: rewrite-mode delete -> removed files' LIVE rows as deletes
    t.delete(F.col("k") % 25 == 3)
    sync_manifest_to_delta(t, dest, dv_mode="native")
    feed = dt.change_feed(1)
    dels = {r.k for r in
            feed.filter("_change_type = 'delete'").collect()}
    assert {3, 28, 53, 78} <= dels
    # external state converges: full read matches the source
    assert _rows(dt.read()) == _rows(t.read())
