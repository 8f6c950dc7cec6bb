"""Delta Change Data Feed reads (``change_feed``).

Logs are built BY HAND from PROTOCOL.md's Change Data Files section:
``cdc`` actions point at ``_change_data/`` parquet carrying a literal
``_change_type`` column; commits WITHOUT cdc actions synthesize a
row-level diff (adds -> inserts, removed live rows -> deletes, DV
updates -> newly-masked positions as deletes). Each cdc-carrying
commit also plants a TRAP add/remove pair: a reader that consumes
add/remove alongside cdc double-counts and fails the row assertions.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from forklift_spark.connections.deltalite import DeltaLiteTable

CDF_COLS = ["_change_type", "_commit_version", "_commit_timestamp"]


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


def _schema() -> T.StructType:
    return T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ])


def _meta(partition_cols=()) -> dict:
    return {"metaData": {
        "id": "cdfcdfcd-1111-2222-3333-444444444444",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps(_schema().jsonValue()),
        "partitionColumns": list(partition_cols),
        "configuration": {"delta.enableChangeDataFeed": "true"},
        "createdTime": 1700000000000,
    }}


_PROTO = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}}


def _add(rel: str, data_change: bool = True, pv: dict | None = None,
         dv: dict | None = None) -> dict:
    a = {"path": rel, "partitionValues": pv or {}, "size": 1,
         "modificationTime": 1700000000000, "dataChange": data_change}
    if dv:
        a["deletionVector"] = dv
    return a


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, _schema())


def _cdc_df(spark, triples):
    sch = T.StructType(list(_schema().fields) + [
        T.StructField("_change_type", T.StringType())])
    return spark.createDataFrame(triples, sch)


def _inline_dv(positions: list[int]) -> dict:
    from forklift_spark.functions.roaring import (
        serialize_roaring64,
        z85_encode,
    )
    data = serialize_roaring64(positions)
    return {"storageType": "i", "pathOrInlineDv": z85_encode(data),
            "sizeInBytes": len(data), "cardinality": len(positions)}


@pytest.fixture(scope="module")
def cdf_table(spark, tmp_path_factory):
    """v0 insert f0 (k 0..3), v1 UPDATE with cdc (k=1 -> 'one!') + trap
    add/remove, v2 plain append f2 (k 10..11), v3 remove f2 (delete),
    v4 OPTIMIZE (dataChange=false rewrite — CDF-invisible)."""
    root = str(tmp_path_factory.mktemp("delta_cdf"))
    tdir = os.path.join(root, "t")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)

    _one_parquet_file(spark, _kv(spark, [(0, "zero"), (1, "one"),
                                         (2, "two"), (3, "three")]),
                      os.path.join(tdir, "f0.parquet"))
    _commit(log, 0, [_PROTO, _meta(), {"add": _add("f0.parquet")},
                     {"commitInfo": {"timestamp": 1700000000000,
                                     "operation": "WRITE"}}])

    # v1: UPDATE k=1 — f0 rewritten to f1, cdc carries pre+post images.
    # The TRAP: if the reader also synthesizes from the add/remove pair
    # it emits 4 spurious deletes + 4 spurious inserts.
    _one_parquet_file(spark, _kv(spark, [(0, "zero"), (1, "one!"),
                                         (2, "two"), (3, "three")]),
                      os.path.join(tdir, "f1.parquet"))
    _one_parquet_file(
        spark,
        _cdc_df(spark, [(1, "one", "update_preimage"),
                        (1, "one!", "update_postimage")]),
        os.path.join(tdir, "_change_data", "cdc-0.parquet"))
    _commit(log, 1, [
        {"cdc": {"path": "_change_data/cdc-0.parquet",
                 "partitionValues": {}, "size": 1, "dataChange": False}},
        {"remove": {"path": "f0.parquet",
                    "deletionTimestamp": 1700000001000,
                    "dataChange": True}},
        {"add": _add("f1.parquet")},
        {"commitInfo": {"timestamp": 1700000001000,
                        "operation": "UPDATE"}},
    ])

    # v2: plain append (no cdc) -> synthesized inserts
    _one_parquet_file(spark, _kv(spark, [(10, "ten"), (11, "eleven")]),
                      os.path.join(tdir, "f2.parquet"))
    _commit(log, 2, [{"add": _add("f2.parquet")},
                     {"commitInfo": {"timestamp": 1700000002000,
                                     "operation": "WRITE"}}])

    # v3: delete the appended file (no cdc) -> synthesized deletes
    _commit(log, 3, [{"remove": {"path": "f2.parquet",
                                 "deletionTimestamp": 1700000003000,
                                 "dataChange": True}},
                     {"commitInfo": {"timestamp": 1700000003000,
                                     "operation": "DELETE"}}])

    # v4: OPTIMIZE — rewrite f1 into f4 with dataChange=false; CDF must
    # emit NOTHING for this commit
    _one_parquet_file(spark, _kv(spark, [(0, "zero"), (1, "one!"),
                                         (2, "two"), (3, "three")]),
                      os.path.join(tdir, "f4.parquet"))
    _commit(log, 4, [
        {"remove": {"path": "f1.parquet",
                    "deletionTimestamp": 1700000004000,
                    "dataChange": False}},
        {"add": _add("f4.parquet", data_change=False)},
        {"commitInfo": {"timestamp": 1700000004000,
                        "operation": "OPTIMIZE"}},
    ])
    return tdir


def _rows(df):
    return sorted(
        (r["_commit_version"], r["_change_type"], r["k"], r["v"])
        for r in df.collect()
    )


def test_cdf_full_range(spark, cdf_table):
    feed = DeltaLiteTable(spark, cdf_table).change_feed(0)
    assert feed.columns == ["k", "v"] + CDF_COLS
    assert _rows(feed) == [
        (1, "update_postimage", 1, "one!"),
        (1, "update_preimage", 1, "one"),
        (2, "insert", 10, "ten"),
        (2, "insert", 11, "eleven"),
        (3, "delete", 10, "ten"),
        (3, "delete", 11, "eleven"),
    ]


def test_cdf_range_bounds_and_timestamps(spark, cdf_table):
    t = DeltaLiteTable(spark, cdf_table)
    sub = t.change_feed(1, 2)
    assert _rows(sub) == [(2, "insert", 10, "ten"),
                          (2, "insert", 11, "eleven")]
    ts = sub.select("_commit_timestamp").distinct().collect()
    assert len(ts) == 1  # commitInfo.timestamp = 1700000002000
    assert ts[0][0].year >= 2023
    # empty range and OPTIMIZE-only range both yield zero rows with the
    # full CDF schema
    empty = t.change_feed(3, 4)
    assert empty.count() == 0
    assert empty.columns == ["k", "v"] + CDF_COLS


def test_cdf_from_latest_is_empty(spark, cdf_table):
    t = DeltaLiteTable(spark, cdf_table)
    assert t.change_feed(t.latest_version()).count() == 0


def test_cdf_dv_update_emits_masked_positions(spark, tmp_path):
    """A no-cdc DV update commit: deletes are exactly the NEWLY-masked
    positions (old mask [1], new mask [1,3] -> delete row 3 only); a
    later widened mask adds position 0 -> delete row 0 only."""
    tdir = str(tmp_path / "dvcdf")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    _one_parquet_file(spark, _kv(spark, [(0, "a"), (1, "b"), (2, "c"),
                                         (3, "d")]),
                      os.path.join(tdir, "f0.parquet"))
    proto = {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["deletionVectors"],
                          "writerFeatures": ["deletionVectors"]}}
    _commit(log, 0, [proto, _meta(),
                     {"add": _add("f0.parquet", dv=_inline_dv([1]))}])
    _commit(log, 1, [
        {"remove": {"path": "f0.parquet", "dataChange": True,
                    "deletionVector": _inline_dv([1])}},
        {"add": _add("f0.parquet", dv=_inline_dv([1, 3]))},
    ])
    _commit(log, 2, [
        {"add": _add("f0.parquet", dv=_inline_dv([0, 1, 3]))},
    ])
    feed = DeltaLiteTable(spark, tdir).change_feed(0)
    assert _rows(feed) == [(1, "delete", 3, "d"),
                           (2, "delete", 0, "a")]
    # the live read agrees with the cumulative feed
    live = DeltaLiteTable(spark, tdir).read()
    assert sorted(r["k"] for r in live.collect()) == [2]


def test_cdf_insert_with_birth_dv_and_masked_remove(spark, tmp_path):
    """A file ADDED with a DV emits only its live rows as inserts; a
    remove of a DV-carrying file emits only its live rows as deletes."""
    tdir = str(tmp_path / "dvbirth")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    _one_parquet_file(spark, _kv(spark, [(0, "a"), (1, "b"), (2, "c")]),
                      os.path.join(tdir, "f0.parquet"))
    proto = {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["deletionVectors"],
                          "writerFeatures": ["deletionVectors"]}}
    _commit(log, 0, [proto, _meta()])
    _commit(log, 1, [{"add": _add("f0.parquet", dv=_inline_dv([1]))}])
    _commit(log, 2, [
        {"remove": {"path": "f0.parquet", "dataChange": True,
                    "deletionVector": _inline_dv([1])}},
    ])
    feed = DeltaLiteTable(spark, tdir).change_feed(0)
    assert _rows(feed) == [
        (1, "insert", 0, "a"), (1, "insert", 2, "c"),
        (2, "delete", 0, "a"), (2, "delete", 2, "c"),
    ]


def test_cdf_partitioned_cdc_files(spark, tmp_path):
    """cdc actions carry partitionValues; the partition column is NOT
    stored in the cdc parquet and must be attached from the action."""
    tdir = str(tmp_path / "pcdf")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("p", T.StringType()),
    ])
    meta = {"metaData": {
        "id": "cdfcdfcd-5555-6666-7777-888888888888",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps(schema.jsonValue()),
        "partitionColumns": ["p"],
        "configuration": {"delta.enableChangeDataFeed": "true"},
        "createdTime": 1700000000000,
    }}
    _one_parquet_file(spark, _kv(spark, [(0, "a")]),
                      os.path.join(tdir, "p=x", "f0.parquet"))
    _commit(log, 0, [_PROTO, meta,
                     {"add": _add("p=x/f0.parquet", pv={"p": "x"})}])
    cdc_sch = T.StructType(list(_schema().fields) + [
        T.StructField("_change_type", T.StringType())])
    _one_parquet_file(
        spark,
        spark.createDataFrame([(0, "a", "update_preimage"),
                               (0, "a2", "update_postimage")], cdc_sch),
        os.path.join(tdir, "_change_data", "p=x", "cdc-0.parquet"))
    _one_parquet_file(spark, _kv(spark, [(0, "a2")]),
                      os.path.join(tdir, "p=x", "f1.parquet"))
    _commit(log, 1, [
        {"cdc": {"path": "_change_data/p=x/cdc-0.parquet",
                 "partitionValues": {"p": "x"}, "size": 1,
                 "dataChange": False}},
        {"remove": {"path": "p=x/f0.parquet", "dataChange": True,
                    "partitionValues": {"p": "x"}}},
        {"add": _add("p=x/f1.parquet", pv={"p": "x"})},
    ])
    feed = DeltaLiteTable(spark, tdir).change_feed(0)
    rows = sorted((r["_change_type"], r["k"], r["v"], r["p"])
                  for r in feed.collect())
    assert rows == [("update_postimage", 0, "a2", "x"),
                    ("update_preimage", 0, "a", "x")]


def test_cdf_overwrite_without_cdc_is_row_level_diff(spark, tmp_path):
    """A no-cdc commit holding BOTH removes and adds (an overwrite from
    a writer without CDF enabled) synthesizes deletes of the removed
    live rows AND inserts of the added rows — a correct row-level diff,
    just without update_* labeling."""
    tdir = str(tmp_path / "ovw")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    _one_parquet_file(spark, _kv(spark, [(0, "a"), (1, "b")]),
                      os.path.join(tdir, "f0.parquet"))
    _one_parquet_file(spark, _kv(spark, [(5, "z")]),
                      os.path.join(tdir, "f1.parquet"))
    _commit(log, 0, [_PROTO, _meta(), {"add": _add("f0.parquet")}])
    _commit(log, 1, [
        {"remove": {"path": "f0.parquet", "dataChange": True}},
        {"add": _add("f1.parquet")},
    ])
    feed = DeltaLiteTable(spark, tdir).change_feed(0)
    assert _rows(feed) == [(1, "delete", 0, "a"), (1, "delete", 1, "b"),
                           (1, "insert", 5, "z")]


def test_cdf_column_mapped_table(spark, tmp_path):
    """cdc files under column mapping carry PHYSICAL data column names
    plus the literal _change_type column."""
    tdir = str(tmp_path / "cmcdf")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)

    def _cm(name, dtype, phys, fid):
        return T.StructField(name, dtype, True, metadata={
            "delta.columnMapping.id": fid,
            "delta.columnMapping.physicalName": phys,
        })

    schema = T.StructType([_cm("k", T.LongType(), "col-k", 1),
                           _cm("v", T.StringType(), "col-v", 2)])
    meta = {"metaData": {
        "id": "cdfcdfcd-9999-aaaa-bbbb-cccccccccccc",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps(schema.jsonValue()),
        "partitionColumns": [],
        "configuration": {"delta.columnMapping.mode": "name",
                          "delta.columnMapping.maxColumnId": "2",
                          "delta.enableChangeDataFeed": "true"},
        "createdTime": 1700000000000,
    }}
    proto = {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
    phys = spark.createDataFrame([(0, "a")], "`col-k` long, `col-v` string")
    _one_parquet_file(spark, phys, os.path.join(tdir, "f0.parquet"))
    _commit(log, 0, [proto, meta, {"add": _add("f0.parquet")}])
    cdc = spark.createDataFrame(
        [(7, "new", "insert")],
        "`col-k` long, `col-v` string, `_change_type` string")
    _one_parquet_file(spark, cdc,
                      os.path.join(tdir, "_change_data", "c0.parquet"))
    _one_parquet_file(spark, spark.createDataFrame(
        [(7, "new")], "`col-k` long, `col-v` string"),
        os.path.join(tdir, "f1.parquet"))
    _commit(log, 1, [
        {"cdc": {"path": "_change_data/c0.parquet",
                 "partitionValues": {}, "size": 1, "dataChange": False}},
        {"add": _add("f1.parquet")},
    ])
    feed = DeltaLiteTable(spark, tdir).change_feed(0)
    assert feed.columns == ["k", "v"] + CDF_COLS
    assert _rows(feed) == [(1, "insert", 7, "new")]


def test_cdf_missing_commit_refuses(spark, cdf_table, tmp_path):
    tdir = str(tmp_path / "gap")
    shutil.copytree(cdf_table, tdir)
    os.remove(os.path.join(tdir, "_delta_log", f"{2:020d}.json"))
    with pytest.raises(FileNotFoundError, match="missing commit 2"):
        # snapshot(4) replays 0..4 and notices first; either layer
        # refusing loudly is the contract
        DeltaLiteTable(spark, tdir).change_feed(0, 3).collect()


def test_append_only_changes_points_at_change_feed(spark, cdf_table):
    with pytest.raises(NotImplementedError, match="change_feed"):
        DeltaLiteTable(spark, cdf_table).changes(0, 3)
