"""Delta column mapping (reader v2 / v3 ``columnMapping``) + timestampNtz.

Logs are built BY HAND from PROTOCOL.md's Column Mapping section: the
parquet files carry PHYSICAL column names (``col-<tag>`` style, like
delta-spark's ``col-<uuid>``), the logical schema carries
``delta.columnMapping.physicalName`` / ``.id`` in each field's
metadata (nested fields included), and ``add.partitionValues`` are
keyed by physical name. The reader must reconstruct the LOGICAL table
— including after a rename (the whole point of name mode: logical
names change, physical names never do)."""

from __future__ import annotations

import glob
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from forklift_spark.connections.deltalite import (
    DeltaLiteTable,
    DeltaUnsupported,
)


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


def _cm_field(name: str, dtype: T.DataType, phys: str, fid: int,
              ) -> T.StructField:
    return T.StructField(name, dtype, True, metadata={
        "delta.columnMapping.id": fid,
        "delta.columnMapping.physicalName": phys,
    })


# logical: k long, renamed_v string, s struct<a long, b string>, p int
# physical: col-k, col-v, col-s{col-a, col-b}, col-p
def _cm_schema() -> T.StructType:
    inner = T.StructType([
        _cm_field("a", T.LongType(), "col-a", 4),
        _cm_field("b", T.StringType(), "col-b", 5),
    ])
    return T.StructType([
        _cm_field("k", T.LongType(), "col-k", 1),
        _cm_field("renamed_v", T.StringType(), "col-v", 2),
        _cm_field("s", inner, "col-s", 6),
        _cm_field("p", T.IntegerType(), "col-p", 3),
    ])


def _cm_meta(mode: str, partition_cols: list[str]) -> dict:
    return {"metaData": {
        "id": "cmcmcmcm-2222-3333-4444-555555555555",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps(_cm_schema().jsonValue()),
        "partitionColumns": partition_cols,
        "configuration": {"delta.columnMapping.mode": mode,
                          "delta.columnMapping.maxColumnId": "6"},
        "createdTime": 1700000000000,
    }}


def _phys_df(spark, lo: int, hi: int, tag: str):
    return spark.range(lo, hi).select(
        F.col("id").alias("col-k"),
        F.concat(F.lit(tag), F.col("id")).alias("col-v"),
        F.struct(
            (F.col("id") * 10).alias("col-a"),
            F.concat(F.lit("s"), F.col("id")).alias("col-b"),
        ).alias("col-s"),
    )


def _build_cm_table(spark, root: str, mode: str = "name",
                    partition_cols: list[str] | None = None,
                    reader_version: int = 2) -> str:
    """v0: two partition files; v1: p=1 file replaced (rename-proof
    replay: removes/adds key by the stable physical path)."""
    tdir = os.path.join(root, "cm_events")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    _one_parquet_file(spark, _phys_df(spark, 0, 5, "a"),
                      os.path.join(tdir, "f1.parquet"))
    _one_parquet_file(spark, _phys_df(spark, 10, 15, "b"),
                      os.path.join(tdir, "f2.parquet"))
    proto = {"minReaderVersion": reader_version, "minWriterVersion": 5}
    if reader_version == 3:
        proto["readerFeatures"] = ["columnMapping"]
        proto["minWriterVersion"] = 7
        proto["writerFeatures"] = ["columnMapping"]
    _commit(log, 0, [
        {"protocol": proto},
        _cm_meta("name" if mode == "name" else mode,
                 partition_cols if partition_cols is not None else ["p"]),
        {"add": {"path": "f1.parquet",
                 "partitionValues": {"col-p": "1"},
                 "size": 1, "modificationTime": 1700000000000,
                 "dataChange": True}},
        {"add": {"path": "f2.parquet",
                 "partitionValues": {"col-p": "2"},
                 "size": 1, "modificationTime": 1700000000000,
                 "dataChange": True}},
    ])
    _one_parquet_file(spark, _phys_df(spark, 0, 4, "A"),
                      os.path.join(tdir, "f3.parquet"))
    _commit(log, 1, [
        {"remove": {"path": "f1.parquet", "dataChange": True,
                    "deletionTimestamp": 1700000001000}},
        {"add": {"path": "f3.parquet",
                 "partitionValues": {"col-p": "1"},
                 "size": 1, "modificationTime": 1700000001000,
                 "dataChange": True}},
    ])
    return tdir


def test_name_mode_reads_logical_schema(spark, tmp_path):
    tdir = _build_cm_table(spark, str(tmp_path))
    t = DeltaLiteTable(spark, tdir)
    df = t.read()
    assert [f.name for f in df.schema.fields] == ["k", "renamed_v", "s", "p"]
    # nested names renamed too
    s_t = df.schema["s"].dataType
    assert [f.name for f in s_t.fields] == ["a", "b"]
    rows = {(r["k"], r["p"]): (r["renamed_v"], r["s"]["a"], r["s"]["b"])
            for r in df.collect()}
    assert len(rows) == 9  # 4 replaced p=1 rows + 5 p=2 rows
    assert rows[(0, 1)] == ("A0", 0, "s0")
    assert rows[(14, 2)] == ("b14", 140, "s14")
    # time travel still sees the pre-replace file
    v0 = {(r["k"], r["p"]): r["renamed_v"] for r in t.read(version=0).collect()}
    assert v0[(4, 1)] == "a4"
    assert len(v0) == 10


def test_name_mode_physical_partition_columns_entry(spark, tmp_path):
    # some writers record partitionColumns by PHYSICAL name — accept it
    tdir = _build_cm_table(spark, str(tmp_path), partition_cols=["col-p"])
    df = DeltaLiteTable(spark, tdir).read()
    assert [f.name for f in df.schema.fields] == ["k", "renamed_v", "s", "p"]
    assert df.filter(F.col("p") == 2).count() == 5


def test_v3_columnmapping_feature_accepted(spark, tmp_path):
    tdir = _build_cm_table(spark, str(tmp_path), reader_version=3)
    assert DeltaLiteTable(spark, tdir).read().count() == 9


def test_missing_physical_name_refuses(spark, tmp_path):
    tdir = _build_cm_table(spark, str(tmp_path))
    # strip physicalName from one field in the committed schema
    log = os.path.join(tdir, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(line) for line in open(log)]
    for act in lines:
        if "metaData" in act:
            sch = json.loads(act["metaData"]["schemaString"])
            del sch["fields"][1]["metadata"]["delta.columnMapping.physicalName"]
            act["metaData"]["schemaString"] = json.dumps(sch)
    with open(log, "w") as fh:
        for act in lines:
            fh.write(json.dumps(act) + "\n")
    with pytest.raises(DeltaUnsupported, match="physicalName"):
        DeltaLiteTable(spark, tdir).read().collect()


def test_unknown_mapping_mode_refuses(spark, tmp_path):
    tdir = _build_cm_table(spark, str(tmp_path))
    log = os.path.join(tdir, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(line) for line in open(log)]
    for act in lines:
        if "metaData" in act:
            act["metaData"]["configuration"][
                "delta.columnMapping.mode"] = "idname"
    with open(log, "w") as fh:
        for act in lines:
            fh.write(json.dumps(act) + "\n")
    with pytest.raises(DeltaUnsupported, match="idname"):
        DeltaLiteTable(spark, tdir).read()


def _pa_file_with_ids(path: str, ids: dict[str, int], n: int = 5,
                      shift: int = 0) -> None:
    """Parquet file with PARQUET:field_id on every column (pyarrow
    propagates the metadata into the footer's field ids)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def f(name, typ):
        return pa.field(name, typ, metadata={
            b"PARQUET:field_id": str(ids[name]).encode()})

    schema = pa.schema([f("col-k", pa.int64()), f("col-v", pa.string())])
    tbl = pa.table({
        "col-k": pa.array(range(shift, shift + n), pa.int64()),
        "col-v": pa.array([f"v{i}" for i in range(shift, shift + n)],
                          pa.string()),
    }, schema=schema)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path)


def _build_id_table(spark, root: str, file_ids: dict[str, int]) -> str:
    tdir = os.path.join(root, "cm_id")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    _pa_file_with_ids(os.path.join(tdir, "f1.parquet"), file_ids)
    schema = T.StructType([
        _cm_field("k", T.LongType(), "col-k", 1),
        _cm_field("v", T.StringType(), "col-v", 2),
    ])
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "ididid-2222-3333-4444-555555555555",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema.jsonValue()),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id",
                              "delta.columnMapping.maxColumnId": "2"},
            "createdTime": 1700000000000,
        }},
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 1700000000000, "dataChange": True}},
    ])
    return tdir


def test_id_mode_matching_footer_ids(spark, tmp_path):
    tdir = _build_id_table(spark, str(tmp_path),
                           {"col-k": 1, "col-v": 2})
    df = DeltaLiteTable(spark, tdir).read()
    assert sorted(df.columns) == ["k", "v"]
    assert df.count() == 5


def test_id_mode_mismatched_footer_ids_refuse(spark, tmp_path):
    # footer says col-v carries id 9, schema declares 2 -> name and id
    # resolution would disagree; must refuse, not silently pick one
    tdir = _build_id_table(spark, str(tmp_path),
                           {"col-k": 1, "col-v": 9})
    with pytest.raises(DeltaUnsupported, match="field id"):
        DeltaLiteTable(spark, tdir).read()


def test_timestamp_ntz_feature(spark, tmp_path):
    import datetime as dt

    tdir = os.path.join(str(tmp_path), "ntz")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    vals = [(1, dt.datetime(2024, 1, 2, 3, 4, 5)),
            (2, dt.datetime(2024, 6, 7, 8, 9, 10))]
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
    ])
    _one_parquet_file(spark, spark.createDataFrame(vals, schema),
                      os.path.join(tdir, "f1.parquet"))
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["timestampNtz"],
                      "writerFeatures": ["timestampNtz"]}},
        {"metaData": {
            "id": "ntzntz-2222-3333-4444-555555555555",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema.jsonValue()),
            "partitionColumns": [],
            "configuration": {},
            "createdTime": 1700000000000,
        }},
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 1700000000000, "dataChange": True}},
    ])
    df = DeltaLiteTable(spark, tdir).read()
    assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType)
    got = {r["k"]: r["ts"] for r in df.collect()}
    assert got[1] == dt.datetime(2024, 1, 2, 3, 4, 5)


def test_changes_carries_column_mapping(spark, tmp_path):
    tdir = _build_cm_table(spark, str(tmp_path))
    t = DeltaLiteTable(spark, tdir)
    # append-only tail after v1
    _one_parquet_file(spark, _phys_df(spark, 20, 22, "c"),
                      os.path.join(tdir, "f4.parquet"))
    _commit(os.path.join(tdir, "_delta_log"), 2, [
        {"add": {"path": "f4.parquet",
                 "partitionValues": {"col-p": "3"},
                 "size": 1, "modificationTime": 1700000002000,
                 "dataChange": True}},
    ])
    delta = t.changes(1)
    assert sorted(delta.columns) == ["k", "p", "renamed_v", "s"]
    rows = delta.collect()
    assert {r["k"] for r in rows} == {20, 21}
    assert all(r["p"] == 3 for r in rows)
