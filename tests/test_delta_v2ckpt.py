"""Delta V2 spec checkpoints (reader-v3 feature ``v2Checkpoint``).

Checkpoints are built BY HAND from PROTOCOL.md's 'V2 Spec Checkpoint'
shape: a uuid-named ``{v:020d}.checkpoint.<uuid>.{json|parquet}``
manifest holding exactly one ``checkpointMetadata`` action plus either
inline file actions or ``sidecar`` pointers into
``_delta_log/_sidecars/``. The reader must reconstruct the snapshot
from manifest + sidecars + JSON tail after the pre-checkpoint commits
are cleaned — the exact situation v2 checkpoints exist for."""

from __future__ import annotations

import glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from forklift_spark.connections.deltalite import (
    DeltaLiteTable,
    DeltaUnsupported,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])


def _one_parquet_file(spark, df, dest: str) -> None:
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


_STR_MAP = pa.map_(pa.string(), pa.string())
_ADD_T = pa.struct([
    ("path", pa.string()), ("partitionValues", _STR_MAP),
    ("size", pa.int64()), ("modificationTime", pa.int64()),
    ("dataChange", pa.bool_()),
])
_PROTO_T = pa.struct([
    ("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32()),
    ("readerFeatures", pa.list_(pa.string())),
    ("writerFeatures", pa.list_(pa.string())),
])
_META_T = pa.struct([
    ("id", pa.string()),
    ("format", pa.struct([("provider", pa.string()),
                          ("options", _STR_MAP)])),
    ("schemaString", pa.string()),
    ("partitionColumns", pa.list_(pa.string())),
    ("configuration", _STR_MAP),
    ("createdTime", pa.int64()),
])
_CKMETA_T = pa.struct([("version", pa.int64()), ("tags", _STR_MAP)])
_SIDECAR_T = pa.struct([
    ("path", pa.string()), ("sizeInBytes", pa.int64()),
    ("modificationTime", pa.int64()),
])


def _add_row(rel: str) -> dict:
    return {"path": rel, "partitionValues": [], "size": 1,
            "modificationTime": 1700000000000, "dataChange": False}


def _proto_row() -> dict:
    return {"minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["v2Checkpoint"],
            "writerFeatures": ["v2Checkpoint"]}


def _meta_row() -> dict:
    return {"id": "v2ck-2222-3333-4444", "format": {
        "provider": "parquet", "options": []},
        "schemaString": json.dumps(SCHEMA.jsonValue()),
        "partitionColumns": [], "configuration": [],
        "createdTime": 1700000000000}


def _write_sidecar(log: str, name: str, rels: list[str]) -> None:
    side = os.path.join(log, "_sidecars")
    os.makedirs(side, exist_ok=True)
    tbl = pa.table({"add": pa.array([_add_row(r) for r in rels], _ADD_T)})
    pq.write_table(tbl, os.path.join(side, name))


def _write_v2_manifest_parquet(log: str, version: int, uuid: str,
                               sidecar_names: list[str],
                               inline_adds: list[str] | None = None,
                               ck_version: int | None = None) -> str:
    n_side = len(sidecar_names)
    n_inline = len(inline_adds or [])
    n = 3 + n_side + n_inline  # ckptMeta + protocol + metaData + rows
    col_ck = [None] * n
    col_p = [None] * n
    col_m = [None] * n
    col_s: list[dict | None] = [None] * n
    col_a: list[dict | None] = [None] * n
    col_ck[0] = {"version": version if ck_version is None else ck_version,
                 "tags": []}
    col_p[1] = _proto_row()
    col_m[2] = _meta_row()
    for i, sn in enumerate(sidecar_names):
        col_s[3 + i] = {"path": sn, "sizeInBytes": 1,
                        "modificationTime": 1700000000000}
    for i, rel in enumerate(inline_adds or []):
        col_a[3 + n_side + i] = _add_row(rel)
    tbl = pa.table({
        "checkpointMetadata": pa.array(col_ck, _CKMETA_T),
        "protocol": pa.array(col_p, _PROTO_T),
        "metaData": pa.array(col_m, _META_T),
        "sidecar": pa.array(col_s, _SIDECAR_T),
        "add": pa.array(col_a, _ADD_T),
    })
    name = f"{version:020d}.checkpoint.{uuid}.parquet"
    pq.write_table(tbl, os.path.join(log, name))
    return name


def _base_table(spark, root: str) -> tuple[str, str]:
    """Three data files; commits 0..2 add them one per commit."""
    tdir = os.path.join(root, "v2ck")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)

    def df(lo, hi, tag):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            F.concat(F.lit(tag), F.col("id")).alias("v"))

    for i, (lo, hi, tag) in enumerate([(0, 5, "a"), (10, 15, "b"),
                                       (20, 25, "c")]):
        _one_parquet_file(spark, df(lo, hi, tag),
                          os.path.join(tdir, f"f{i}.parquet"))
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["v2Checkpoint"],
                      "writerFeatures": ["v2Checkpoint"]}},
        {"metaData": _meta_row() | {"format": {"provider": "parquet",
                                               "options": {}},
                                    "configuration": {}}},
        {"add": {"path": "f0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 1700000000000, "dataChange": True}},
    ])
    for v, rel in [(1, "f1.parquet"), (2, "f2.parquet")]:
        _commit(log, v, [
            {"add": {"path": rel, "partitionValues": {}, "size": 1,
                     "modificationTime": 1700000000000,
                     "dataChange": True}},
        ])
    return tdir, log


def _clean_pre_ckpt(log: str, upto: int) -> None:
    for v in range(upto + 1):
        os.remove(os.path.join(log, f"{v:020d}.json"))


def _tail_commit(spark, tdir: str, log: str) -> None:
    df = spark.range(30, 32).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("v"))
    _one_parquet_file(spark, df, os.path.join(tdir, "f3.parquet"))
    _commit(log, 3, [
        {"add": {"path": "f3.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 1700000003000, "dataChange": True}},
    ])


def test_v2_parquet_checkpoint_with_sidecars(spark, tmp_path):
    tdir, log = _base_table(spark, str(tmp_path))
    _write_sidecar(log, "s1.parquet", ["f0.parquet", "f1.parquet"])
    _write_sidecar(log, "s2.parquet", ["f2.parquet"])
    _write_v2_manifest_parquet(
        log, 2, "0a1b2c3d-0000-1111-2222-333344445555",
        ["s1.parquet", "s2.parquet"])
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 2, "size": 6}, fh)
    _clean_pre_ckpt(log, 2)
    _tail_commit(spark, tdir, log)

    t = DeltaLiteTable(spark, tdir)
    got = {(r["k"], r["v"]) for r in t.read().collect()}
    assert len(got) == 17  # 5+5+5 from sidecars + 2 tail rows
    assert (0, "a0") in got and (24, "c24") in got and (31, "d31") in got


def test_v2_json_checkpoint_inline_adds(spark, tmp_path):
    tdir, log = _base_table(spark, str(tmp_path))
    name = f"{2:020d}.checkpoint.9f8e7d6c-0000-1111-2222-333344445555.json"
    with open(os.path.join(log, name), "w") as fh:
        fh.write(json.dumps({"checkpointMetadata": {
            "version": 2, "tags": {}}}) + "\n")
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["v2Checkpoint"],
            "writerFeatures": ["v2Checkpoint"]}}) + "\n")
        fh.write(json.dumps({"metaData": _meta_row() | {
            "format": {"provider": "parquet", "options": {}},
            "configuration": {}}}) + "\n")
        for rel in ("f0.parquet", "f1.parquet", "f2.parquet"):
            fh.write(json.dumps({"add": {
                "path": rel, "partitionValues": {}, "size": 1,
                "modificationTime": 1700000000000,
                "dataChange": False}}) + "\n")
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 2, "size": 6}, fh)
    _clean_pre_ckpt(log, 2)
    _tail_commit(spark, tdir, log)

    t = DeltaLiteTable(spark, tdir)
    assert t.read().count() == 17
    # version pinning works off the checkpoint alone
    assert t.read(version=2).count() == 15


def test_v2_checkpoint_version_mismatch_refuses(spark, tmp_path):
    tdir, log = _base_table(spark, str(tmp_path))
    _write_sidecar(log, "s1.parquet", ["f0.parquet"])
    _write_v2_manifest_parquet(
        log, 2, "0a1b2c3d-0000-1111-2222-333344445555",
        ["s1.parquet"], ck_version=1)
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 2, "size": 2}, fh)
    _clean_pre_ckpt(log, 2)
    with pytest.raises(ValueError, match="checkpointMetadata.version"):
        DeltaLiteTable(spark, tdir).read()


def test_v2_checkpoint_missing_sidecar_refuses(spark, tmp_path):
    tdir, log = _base_table(spark, str(tmp_path))
    _write_sidecar(log, "s1.parquet", ["f0.parquet"])
    _write_v2_manifest_parquet(
        log, 2, "0a1b2c3d-0000-1111-2222-333344445555",
        ["s1.parquet", "missing.parquet"])
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 2, "size": 3}, fh)
    _clean_pre_ckpt(log, 2)
    with pytest.raises(FileNotFoundError, match="sidecar"):
        DeltaLiteTable(spark, tdir).read()


def test_uuid_checkpoint_without_ckpt_metadata_refuses(spark, tmp_path):
    tdir, log = _base_table(spark, str(tmp_path))
    name = f"{2:020d}.checkpoint.9f8e7d6c-0000-1111-2222-333344445555.json"
    with open(os.path.join(log, name), "w") as fh:
        fh.write(json.dumps({"add": {
            "path": "f0.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 1700000000000, "dataChange": False}}) + "\n")
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 2, "size": 1}, fh)
    _clean_pre_ckpt(log, 2)
    with pytest.raises(DeltaUnsupported, match="checkpointMetadata"):
        DeltaLiteTable(spark, tdir).read()
