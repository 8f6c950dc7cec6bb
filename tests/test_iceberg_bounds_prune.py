"""Iceberg value-bounds file skipping (``IcebergLiteTable.read(where=)``)
and the export side that feeds it: manifest zone maps re-encoded as the
spec's ``lower_bounds``/``upper_bounds`` (field-id keyed, single-value
serialization — spec Appendix D), so external Iceberg readers and this
reader's own planner data-skip on exported tables.

Same contract as the manifest reader's zone maps and the Delta reader's
``add.stats`` pruning: bounds are an optimization, never a correctness
dependency — bound-less files always survive and the residual row
filter keeps results exact."""

from __future__ import annotations

import datetime
import json
import os
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from forklift_spark.connections.iceberglite import (
    IcebergLiteTable,
    decode_bound,
    encode_bound,
    export_manifest_to_iceberg,
    sync_manifest_to_iceberg,
)
from forklift_spark.functions import avrocodec as av


@pytest.mark.parametrize("ice_type,zone_value,expected", [
    ("int", "42", 42),
    ("long", "-7", -7),
    ("float", "1.5", 1.5),
    ("double", "2.25", 2.25),
    ("string", "hello", "hello"),
    ("date", "2024-03-05", (datetime.date(2024, 3, 5)
                            - datetime.date(1970, 1, 1)).days),
    ("timestamp", "2024-03-05 06:07:08.25",
     int(datetime.datetime(2024, 3, 5, 6, 7, 8, 250000).timestamp()
         * 1_000_000) if False else
     (datetime.datetime(2024, 3, 5, 6, 7, 8, 250000)
      - datetime.datetime(1970, 1, 1)).total_seconds() * 1_000_000),
    ("decimal(10,2)", "123.45", Decimal("123.45")),
    ("decimal(10,2)", "-0.01", Decimal("-0.01")),
    ("boolean", "true", True),
])
def test_single_value_roundtrip(ice_type, zone_value, expected):
    b = encode_bound(ice_type, zone_value)
    assert isinstance(b, bytes)
    got = decode_bound(ice_type, b)
    if isinstance(expected, float):
        assert got == pytest.approx(expected)
    else:
        assert got == expected


def test_single_value_wire_format():
    """Spot-check the exact spec encodings (little-endian numerics,
    big-endian two's-complement decimals, UTF-8 strings)."""
    assert encode_bound("int", "1") == b"\x01\x00\x00\x00"
    assert encode_bound("long", "1") == b"\x01" + b"\x00" * 7
    assert encode_bound("string", "ab") == b"ab"
    assert encode_bound("decimal(5,2)", "1.00") == b"\x64"
    assert encode_bound("decimal(5,2)", "-1.00") == b"\x9c"
    assert decode_bound("decimal(5,2)", b"\x9c") == Decimal("-1.00")


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    """Range-partitioned manifest table exported to Iceberg: each data
    file spans a disjoint k range, so bounds genuinely prune."""
    from forklift_spark.manifest import ManifestTable

    root = str(tmp_path_factory.mktemp("ice_bounds"))
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") / 25).cast("int").alias("part"),
        F.concat(F.lit("v"), F.format_string("%04d", "id")).alias("s"),
        (F.col("id") * 1.5).alias("x"),
    )
    t = ManifestTable(spark, os.path.join(root, "src"), "ice_pub")
    t.create(df, partition_by="part")
    dest = os.path.join(root, "pub")
    export_manifest_to_iceberg(t, dest)
    return t, dest


def test_export_writes_bounds(spark, exported):
    _t, dest = exported
    mpath = os.path.join(dest, "metadata", "m-00001.avro")
    _, entries = av.read_container_file(mpath)
    assert entries
    for e in entries:
        lo = e["data_file"]["lower_bounds"]
        hi = e["data_file"]["upper_bounds"]
        assert lo and hi  # every column family bounded
        # k/v records keyed by field id, binary values
        assert all(isinstance(kv["value"], (bytes, bytearray))
                   for kv in lo)
        assert {kv["key"] for kv in lo} == {kv["key"] for kv in hi}


def test_read_where_prunes_files(spark, exported):
    _t, dest = exported
    it = IcebergLiteTable(spark, dest)
    got = it.read(where={"k": (10, 12)})
    rs = it.last_read_stats
    assert rs["files_planned"] < rs["files_total"]
    assert rs["stat_less"] == {"k": 0}
    assert rs["bytes_planned"] > 0
    assert sorted(r["k"] for r in got.collect()) == [10, 11, 12]
    # string bounds prune too, and compose
    got2 = it.read(where={"s": ("v0010", "v0011"), "k": (0, 50)})
    assert it.last_read_stats["files_planned"] == 1
    assert sorted(r["s"] for r in got2.collect()) == ["v0010", "v0011"]


def test_unknown_where_column_refuses(spark, exported):
    _t, dest = exported
    with pytest.raises(ValueError, match="nope"):
        IcebergLiteTable(spark, dest).read(where={"nope": (1, 2)})


def test_sync_adds_carry_bounds_and_prune(spark, exported, tmp_path):
    from forklift_spark.manifest import ManifestTable

    t, dest = exported
    upd = spark.range(200, 210).select(
        F.col("id").alias("k"), F.lit(8).cast("int").alias("part"),
        F.lit("vnew").alias("s"), F.lit(0.5).alias("x"))
    t.merge(upd, on="k")
    res = sync_manifest_to_iceberg(t, dest)
    assert res["mode"] == "incremental"
    it = IcebergLiteTable(spark, dest)
    got = it.read(where={"k": (200, 205)})
    rs = it.last_read_stats
    assert rs["files_planned"] < rs["files_total"]
    assert sorted(r["k"] for r in got.collect()) == list(range(200, 206))


def _fresh_export(spark, root: str):
    """Small range-partitioned export whose manifest this test can
    rewrite IN PLACE (the manifest list references manifests by
    absolute path, so editing a copied tree edits nothing)."""
    from forklift_spark.manifest import ManifestTable

    df = spark.range(0, 40).select(
        F.col("id").alias("k"),
        (F.col("id") / 10).cast("int").alias("part"),
    )
    t = ManifestTable(spark, os.path.join(root, "src"), "fresh_pub")
    t.create(df, partition_by="part")
    dest = os.path.join(root, "pub")
    export_manifest_to_iceberg(t, dest)
    return dest


def test_boundless_files_survive_and_count(spark, tmp_path):
    """Strip the bounds from the written manifest (a legacy/stat-less
    writer): pruning degrades to keep-everything, results stay exact,
    and stat_less counts the planned files."""
    legacy = _fresh_export(spark, str(tmp_path))
    mpath = os.path.join(legacy, "metadata", "m-00001.avro")
    schema_json, entries = av.read_container_file(mpath)
    n_files = len(entries)
    for e in entries:
        e["data_file"]["lower_bounds"] = None
        e["data_file"]["upper_bounds"] = None
    av.write_container_file(mpath, schema_json, entries)
    it = IcebergLiteTable(spark, legacy)
    got = it.read(where={"k": (10, 12)})
    rs = it.last_read_stats
    assert rs["files_planned"] == rs["files_total"] == n_files
    assert rs["stat_less"] == {"k": n_files}
    assert sorted(r["k"] for r in got.collect()) == [10, 11, 12]


def test_all_null_column_prunes_via_null_counts(spark, tmp_path):
    """A file whose bounds are absent but whose null_value_counts says
    every row is NULL for the column is pruned (no row can satisfy a
    range)."""
    nulls = _fresh_export(spark, str(tmp_path))
    mpath = os.path.join(nulls, "metadata", "m-00001.avro")
    schema_json, entries = av.read_container_file(mpath)
    meta = json.load(open(os.path.join(
        nulls, "metadata", "v1.metadata.json")))
    k_id = next(f["id"] for f in meta["schemas"][0]["fields"]
                if f["name"] == "k")
    victim = entries[0]["data_file"]
    victim["lower_bounds"] = [
        kv for kv in victim["lower_bounds"] if kv["key"] != k_id]
    victim["upper_bounds"] = [
        kv for kv in victim["upper_bounds"] if kv["key"] != k_id]
    # the schema has no null_value_counts field; emulate a writer that
    # has one by extending the schema on rewrite
    sj = json.loads(schema_json) if isinstance(schema_json, str) \
        else schema_json
    df_fields = next(f for f in sj["fields"]
                     if f["name"] == "data_file")["type"]["fields"]
    df_fields.append({
        "name": "null_value_counts", "field-id": 110, "default": None,
        "type": ["null", {
            "type": "array", "logicalType": "map",
            "items": {"type": "record", "name": "k121_v122", "fields": [
                {"name": "key", "type": "int", "field-id": 121},
                {"name": "value", "type": "long", "field-id": 122},
            ]}}]})
    nrec = victim["record_count"]
    for e in entries:
        e["data_file"]["null_value_counts"] = None
    victim["null_value_counts"] = [{"key": k_id, "value": nrec}]
    av.write_container_file(mpath, json.dumps(sj), entries)
    it = IcebergLiteTable(spark, nulls)
    it.read(where={"k": (0, 1_000_000)})
    rs = it.last_read_stats
    assert rs["files_planned"] == rs["files_total"] - 1
