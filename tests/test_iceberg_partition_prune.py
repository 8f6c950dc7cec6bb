"""Hidden-partition-transform file pruning (Iceberg spec: partition
transforms + Appendix B bucket hashing).

Tables are spec-built BY HAND (the test_iceberglite.py discipline) with
partition tuples injected into the manifest's r102 record and
partition-specs declared in metadata.json. Pruning must be plan-time
(last_read_stats counters) and NEVER a correctness dependency: results
stay exact because the row-level residual filter applies either way —
asserted by giving pruned files rows that the residual would drop.
"""

from __future__ import annotations

import copy
import json
import os

from forklift_spark.connections.iceberglite import (
    MANIFEST_ENTRY_SCHEMA,
    IcebergLiteTable,
)
from forklift_spark.functions import avrocodec as av
from forklift_spark.functions.hashing import murmur3_x86_32

from tests.test_iceberglite import (
    _entry,
    _manifest_list,
    _metadata_v2,
    _mkdirs,
    _snap,
    _write_parquet,
)


def _entry_schema_with_partition(fields: list[dict]) -> str:
    """MANIFEST_ENTRY_SCHEMA with r102 carrying the given avro fields
    (writer-schema driven: the reader decodes whatever r102 declares)."""
    s = copy.deepcopy(MANIFEST_ENTRY_SCHEMA)
    df = next(f for f in s["fields"] if f["name"] == "data_file")
    t = df["type"]
    rec = next(x for x in t if x != "null") if isinstance(t, list) else t
    part = next(f for f in rec["fields"] if f["name"] == "partition")
    part["type"]["fields"] = fields
    return json.dumps(s)


def _pmanifest(tdir, name, entries, part_fields) -> str:
    p = os.path.join(tdir, "metadata", name)
    av.write_container_file(
        p, _entry_schema_with_partition(part_fields), entries)
    return p


def _pentry(path, partition: dict, *, seq=1, rows=0):
    e = _entry(path, seq=seq, rows=rows)
    e["data_file"]["partition"] = partition
    return e


_LONG = [{"name": "pv", "type": ["null", "long"], "default": None}]
_STR = [{"name": "pv", "type": ["null", "string"], "default": None}]


def _spec(transform, *, source_id=1, name="pv"):
    return {"spec-id": 0, "fields": [
        {"name": name, "transform": transform,
         "source-id": source_id, "field-id": 1000}]}


def _build(spark, tdir, files, transform, part_fields=_LONG,
           schemas_extra=None, source_id=1):
    """files: [(filename, cols_dict, partition_value)] under one spec."""
    _mkdirs(tdir)
    entries = []
    for fname, cols, pval in files:
        p = os.path.join(tdir, "data", fname)
        _write_parquet(p, cols)
        entries.append(_pentry(p, {"pv": pval},
                               rows=len(next(iter(cols.values())))))
    m = _pmanifest(tdir, "m.avro", entries, part_fields)
    lst = _manifest_list(tdir, "l.avro", [(m, 0, 1)])
    extra = {"partition-specs": [_spec(transform, source_id=source_id)],
             "default-spec-id": 0}
    if schemas_extra:
        extra.update(schemas_extra)
    _metadata_v2(tdir, [_snap(1, 1, lst)], current=1, extra=extra)
    return IcebergLiteTable(spark, tdir)


def _f(lo, hi, ks):
    return (f"f{lo}.parquet",
            {"k": ks, "cat": ["c"] * len(ks), "val": [0.0] * len(ks)},
            lo)


def test_identity_partition_prunes(spark, tmp_path):
    t = _build(spark, str(tmp_path / "t"), [
        ("a.parquet", {"k": [1, 1], "cat": ["a", "b"],
                       "val": [1.0, 2.0]}, 1),
        ("b.parquet", {"k": [5, 5], "cat": ["c", "d"],
                       "val": [3.0, 4.0]}, 5),
    ], "identity")
    got = t.read(where={"k": (4, 9)}).collect()
    assert sorted(r.cat for r in got) == ["c", "d"]
    assert t.last_read_stats["files_planned"] == 1
    assert t.last_read_stats["partition_pruned"] == 1


def test_bucket_point_predicate_prunes(spark, tmp_path):
    # spec Appendix B: hash(34) = 2017239379 -> bucket[4] = 3
    want = (murmur3_x86_32((34).to_bytes(8, "little", signed=True))
            & 0x7FFFFFFF) % 4
    assert want == 3
    files = [(f"b{i}.parquet",
              {"k": [34 if i == 3 else i], "cat": [f"b{i}"],
               "val": [0.0]}, i) for i in range(4)]
    t = _build(spark, str(tmp_path / "t"), files, "bucket[4]")
    got = t.read(where={"k": (34, 34)}).collect()
    assert [r.cat for r in got] == ["b3"]
    assert t.last_read_stats["files_planned"] == 1
    assert t.last_read_stats["partition_pruned"] == 3
    # a RANGE predicate cannot use bucket: all files planned
    t.read(where={"k": (0, 40)}).collect()
    assert t.last_read_stats["partition_pruned"] == 0


def test_truncate_int_and_string_prune(spark, tmp_path):
    t = _build(spark, str(tmp_path / "ti"), [
        _f(0, None, [0, 9]), _f(10, None, [12, 15]),
        _f(20, None, [20, 29]),
    ], "truncate[10]")
    got = t.read(where={"k": (12, 15)}).collect()
    assert sorted(r.k for r in got) == [12, 15]
    assert t.last_read_stats["files_planned"] == 1
    assert t.last_read_stats["partition_pruned"] == 2

    # string truncate: cat is field id 2 in SCHEMA_FIELDS
    t2 = _build(spark, str(tmp_path / "ts"), [
        ("a.parquet", {"k": [1], "cat": ["abel"], "val": [0.0]}, "ab"),
        ("z.parquet", {"k": [2], "cat": ["zoot"], "val": [0.0]}, "zo"),
    ], "truncate[2]", part_fields=_STR, source_id=2)
    got = t2.read(where={"cat": ("aa", "ac")}).collect()
    assert [r.cat for r in got] == ["abel"]
    assert t2.last_read_stats["partition_pruned"] == 1


def test_temporal_day_transform_prunes(spark, tmp_path):
    import datetime as dt
    tdir = str(tmp_path / "t")
    epoch = dt.date(1970, 1, 1)
    d1 = (dt.date(2024, 1, 10) - epoch).days
    d2 = (dt.date(2024, 3, 5) - epoch).days
    ts_schema = {"schemas": [{"type": "struct", "schema-id": 0,
                              "fields": [
        {"id": 1, "name": "ts", "required": False,
         "type": "timestamp"},
        {"id": 2, "name": "tag", "required": False, "type": "string"},
    ]}]}
    import pyarrow as pa
    _mkdirs(tdir)
    entries = []
    for fname, day, tag in (("a.parquet", d1, "jan"),
                            ("b.parquet", d2, "mar")):
        p = os.path.join(tdir, "data", fname)
        micros = day * 86_400_000_000 + 12 * 3_600_000_000
        table = pa.table({
            "ts": pa.array([micros], type=pa.timestamp("us")),
            "tag": [tag]})
        import pyarrow.parquet as pq
        pq.write_table(table, p)
        entries.append(_pentry(p, {"pv": day}, rows=1))
    m = _pmanifest(tdir, "m.avro", entries, _LONG)
    lst = _manifest_list(tdir, "l.avro", [(m, 0, 1)])
    _metadata_v2(tdir, [_snap(1, 1, lst)], current=1, extra={
        "partition-specs": [_spec("day")], "default-spec-id": 0,
        **ts_schema})
    t = IcebergLiteTable(spark, tdir)
    got = t.read(where={"ts": ("2024-01-01 00:00:00",
                               "2024-01-31 23:59:59")}).collect()
    assert [r.tag for r in got] == ["jan"]
    assert t.last_read_stats["partition_pruned"] == 1


def test_null_partition_and_void_and_unknown(spark, tmp_path):
    # null partition value under identity: all rows null -> pruned
    t = _build(spark, str(tmp_path / "tn"), [
        ("a.parquet", {"k": [None], "cat": ["n"], "val": [0.0]}, None),
        ("b.parquet", {"k": [7], "cat": ["y"], "val": [0.0]}, 7),
    ], "identity")
    got = t.read(where={"k": (0, 10)}).collect()
    assert [r.cat for r in got] == ["y"]
    assert t.last_read_stats["partition_pruned"] == 1
    # void never prunes, unknown transforms keep the file
    for tr in ("void", "zorder[2]"):
        tv = _build(spark, str(tmp_path / f"tv_{tr[:4]}"), [
            ("a.parquet", {"k": [7], "cat": ["y"], "val": [0.0]}, 0),
        ], tr)
        assert tv.read(where={"k": (0, 10)}).collect()[0].cat == "y"
        assert tv.last_read_stats["partition_pruned"] == 0


# ----------------------------------------------- publisher-side tuples (r8)


def _mk_src(spark, path):
    from pyspark.sql import functions as F

    from forklift_spark.manifest import ManifestTable

    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 4 + 1).cast("int").alias("p"),
        (F.col("id") * 10).alias("v"),
    )
    t = ManifestTable(spark, path, "t")
    t.create(df, partition_by="p")
    return t


def test_export_writes_identity_partition_tuples(spark, tmp_path):
    from forklift_spark.connections.iceberglite import (
        export_manifest_to_iceberg,
    )

    t = _mk_src(spark, str(tmp_path / "src"))
    dest = str(tmp_path / "pub")
    export_manifest_to_iceberg(t, dest)
    it = IcebergLiteTable(spark, dest)
    meta = it.metadata()
    spec = meta["partition-specs"][0]["fields"]
    assert [(f["name"], f["transform"]) for f in spec] == [
        ("p", "identity")]
    inv = it.file_inventory()
    assert all(f["partition"].get("p") in (1, 2, 3, 4)
               for f in inv["data"])
    # the reader's hidden-partition pruning acts on the exported table
    got = it.read(where={"p": (2, 2)})
    assert sorted(r.k for r in got.collect()) == sorted(
        k for k in range(100) if k % 4 + 1 == 2)
    assert it.last_read_stats["partition_pruned"] > 0


def test_sync_partition_spec_evolution_and_rewrite(spark, tmp_path):
    import json as _json

    from pyspark.sql import functions as F

    from forklift_spark.connections.iceberglite import (
        export_manifest_to_iceberg,
        sync_manifest_to_iceberg,
    )

    t = _mk_src(spark, str(tmp_path / "src"))
    dest = str(tmp_path / "pub")
    export_manifest_to_iceberg(t, dest)
    # simulate a pre-feature destination: strip the spec from metadata
    meta_p = os.path.join(dest, "metadata", "v1.metadata.json")
    meta = _json.load(open(meta_p))
    meta["partition-specs"] = [{"spec-id": 0, "fields": []}]
    meta["default-spec-id"] = 0
    meta["last-partition-id"] = 999
    _json.dump(meta, open(meta_p, "w"))

    # sync with new rows -> proper SPEC EVOLUTION: a new spec-id
    # appended, default bumped, old manifests keep referencing spec 0
    t.merge(spark.createDataFrame([(200, 2, 2000)],
                                  "k long, p int, v long"), on="k")
    r = sync_manifest_to_iceberg(t, dest)
    assert r["mode"] == "incremental"
    it = IcebergLiteTable(spark, dest)
    meta = it.metadata()
    assert meta["default-spec-id"] == 1
    assert [(f["name"], f["transform"], f["field-id"])
            for f in meta["partition-specs"][1]["fields"]] == [
        ("p", "identity", 1000)]
    got = it.read(where={"p": (2, 2)})
    assert (200, 2, 2000) in {tuple(r) for r in got.collect()}

    # a delete that rewrites partition files: the rewritten manifest
    # must PRESERVE the surviving entries' partition tuples
    t.delete(F.col("k") % 10 == 3)
    r = sync_manifest_to_iceberg(t, dest)
    assert r["removed"] > 0
    it = IcebergLiteTable(spark, dest)
    inv = it.file_inventory()
    with_part = [f for f in inv["data"] if f["partition"].get("p")]
    assert with_part  # tuples survived the rewrite + re-add
    got = it.read(where={"p": (3, 3)})
    assert sorted(r.k for r in got.collect()) == sorted(
        k for k in range(100) if k % 4 + 1 == 3 and k % 10 != 3)
    assert it.last_read_stats["partition_pruned"] > 0
