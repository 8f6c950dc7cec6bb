"""Delta type widening (reader v3 ``typeWidening`` feature).

Logs are built BY HAND from PROTOCOL.md's Type Widening section: the
table starts with narrow column types, a later metaData action widens
them (recording ``delta.typeChanges`` in the field metadata like
delta-spark does), and files written BEFORE the widen keep their
narrow parquet physical types next to files written after it. The
reader must surface every file under the CURRENT (widest) schema —
promoting narrow physical values in the scan — and refuse nothing.

Covers every widening the spec allows that parquet can express:
byte/short/int -> long, float -> double, int -> double,
date -> timestamp_ntz, int/long -> decimal, and decimal
precision growth. Reference analog: reading a production table
after ALTER TABLE ... TYPE widening (taskrabbit/forklift reads
whatever the warehouse holds; lib/forklift/connections — the Ruby
reference delegates type fidelity to the source database)."""

from __future__ import annotations

import datetime
import glob
import json
import os
import shutil
from decimal import Decimal

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


def _meta(schema: T.StructType) -> dict:
    return {"metaData": {
        "id": "twtwtwtw-1111-2222-3333-444444444444",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps(schema.jsonValue()),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 1700000000000,
    }}


_PROTO = {"protocol": {
    "minReaderVersion": 3, "minWriterVersion": 7,
    "readerFeatures": ["typeWidening"],
    "writerFeatures": ["typeWidening"],
}}


def _add(rel: str) -> dict:
    return {"add": {"path": rel, "partitionValues": {}, "size": 1,
                    "modificationTime": 1700000000000,
                    "dataChange": True}}


def _narrow_schema() -> T.StructType:
    return T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("f", T.FloatType()),
        T.StructField("i2d", T.IntegerType()),
        T.StructField("dt", T.DateType()),
        T.StructField("dec", T.DecimalType(5, 2)),
        T.StructField("l2dec", T.LongType()),
        T.StructField("sh", T.ShortType()),
    ])


def _wide_field(name: str, dtype: T.DataType, from_t: str, to_t: str,
                ver: int) -> T.StructField:
    # delta.typeChanges: informational history of the widen, recorded
    # the way delta-spark serializes it (PROTOCOL.md Type Widening)
    return T.StructField(name, dtype, True, metadata={
        "delta.typeChanges": [
            {"fromType": from_t, "toType": to_t, "tableVersion": ver}
        ]})


def _wide_schema() -> T.StructType:
    return T.StructType([
        _wide_field("k", T.LongType(), "integer", "long", 1),
        _wide_field("f", T.DoubleType(), "float", "double", 1),
        _wide_field("i2d", T.DoubleType(), "integer", "double", 1),
        _wide_field("dt", T.TimestampNTZType(), "date",
                    "timestamp_ntz", 1),
        _wide_field("dec", T.DecimalType(12, 4), "decimal(5,2)",
                    "decimal(12,4)", 1),
        _wide_field("l2dec", T.DecimalType(20, 0), "long",
                    "decimal(20,0)", 1),
        _wide_field("sh", T.IntegerType(), "short", "integer", 1),
    ])


def _narrow_df(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 0.5).cast("float").alias("f"),
        F.col("id").cast("int").alias("i2d"),
        F.date_add(F.lit("2024-01-01").cast("date"),
                   F.col("id").cast("int")).alias("dt"),
        (F.col("id") + 0.25).cast("decimal(5,2)").alias("dec"),
        F.col("id").alias("l2dec"),
        F.col("id").cast("short").alias("sh"),
    )


def _wide_df(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 0.5).cast("double").alias("f"),
        F.col("id").cast("double").alias("i2d"),
        F.date_add(F.lit("2024-01-01").cast("date"),
                   F.col("id").cast("int"))
         .cast("timestamp_ntz").alias("dt"),
        (F.col("id") + 0.25).cast("decimal(12,4)").alias("dec"),
        F.col("id").cast("decimal(20,0)").alias("l2dec"),
        F.col("id").cast("int").alias("sh"),
    )


@pytest.fixture(scope="module")
def widened_table(spark, tmp_path_factory):
    """v0: narrow schema + one narrow file; v1: widened metaData + one
    wide file. The spec's read contract: every row surfaces under the
    WIDE schema."""
    root = str(tmp_path_factory.mktemp("delta_tw"))
    tdir = os.path.join(root, "tw")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    _one_parquet_file(spark, _narrow_df(spark, 0, 5),
                      os.path.join(tdir, "narrow-0.parquet"))
    _one_parquet_file(spark, _wide_df(spark, 5, 9),
                      os.path.join(tdir, "wide-0.parquet"))
    _commit(log, 0, [_PROTO, _meta(_narrow_schema()),
                     _add("narrow-0.parquet")])
    _commit(log, 1, [_meta(_wide_schema()), _add("wide-0.parquet")])
    return tdir


def test_typewiden_reads_both_generations(spark, widened_table):
    got = DeltaLiteTable(spark, widened_table).read()
    # surfaced under the WIDE schema
    by_name = {f.name: f.dataType for f in got.schema.fields}
    assert by_name["k"] == T.LongType()
    assert by_name["f"] == T.DoubleType()
    assert by_name["i2d"] == T.DoubleType()
    assert by_name["dt"] == T.TimestampNTZType()
    assert by_name["dec"] == T.DecimalType(12, 4)
    assert by_name["l2dec"] == T.DecimalType(20, 0)
    assert by_name["sh"] == T.IntegerType()
    rows = {r["k"]: r for r in got.collect()}
    assert sorted(rows) == list(range(9))
    # narrow-file row, promoted in the scan
    r2 = rows[2]
    assert r2["f"] == 1.0 and isinstance(r2["f"], float)
    assert r2["i2d"] == 2.0
    assert r2["dt"] == datetime.datetime(2024, 1, 3, 0, 0)
    assert r2["dec"] == Decimal("2.2500")
    assert r2["l2dec"] == Decimal("2")
    assert r2["sh"] == 2
    # wide-file row, read natively
    r7 = rows[7]
    assert r7["f"] == 3.5
    assert r7["dec"] == Decimal("7.2500")


def test_typewiden_schema_keeps_typechange_metadata(spark, widened_table):
    got = DeltaLiteTable(spark, widened_table).read()
    md = json.loads(got.schema["k"].json())["metadata"]
    assert md["delta.typeChanges"][0]["fromType"] == "integer"
    assert md["delta.typeChanges"][0]["toType"] == "long"


def test_typewiden_preview_feature_name_accepted(spark, tmp_path):
    tdir = str(tmp_path / "twp")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    _one_parquet_file(spark, _narrow_df(spark, 0, 3),
                      os.path.join(tdir, "n.parquet"))
    proto = {"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["typeWidening-preview"],
        "writerFeatures": ["typeWidening-preview"]}}
    _commit(log, 0, [proto, _meta(_narrow_schema()), _add("n.parquet")])
    assert DeltaLiteTable(spark, tdir).read().count() == 3


def test_unknown_reader_feature_still_refuses(spark, tmp_path):
    tdir = str(tmp_path / "twx")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    proto = {"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["typeWidening", "someFutureFeature"],
        "writerFeatures": []}}
    _commit(log, 0, [proto, _meta(_narrow_schema())])
    with pytest.raises(DeltaUnsupported, match="someFutureFeature"):
        DeltaLiteTable(spark, tdir).read()
