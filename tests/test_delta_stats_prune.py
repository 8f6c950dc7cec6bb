"""Delta read-side file skipping from ``add.stats`` + partition values
(``DeltaLiteTable.read(where={col: (lo, hi)})``), and the export side
that makes it useful: the manifest publisher re-renders its zone maps
as spec stats JSON so external Delta readers data-skip on the exported
table.

Mirrors the manifest reader's contract exactly: stats are an
optimization, never a correctness dependency — stat-less files always
survive pruning and the residual row filter keeps results exact;
planning counters land on ``last_read_stats``."""

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
    export_manifest_to_delta,
    sync_manifest_to_delta,
    checkpoint_delta_export,
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


_PROTO = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def _schema() -> T.StructType:
    return T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("s", T.StringType()),
    ])


def _meta(schema=None, partition_cols=(), configuration=None) -> dict:
    return {"metaData": {
        "id": "statstats-1111-2222-3333-444444444444",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps((schema or _schema()).jsonValue()),
        "partitionColumns": list(partition_cols),
        "configuration": configuration or {},
        "createdTime": 1700000000000,
    }}


def _add(rel, stats=None, pv=None, size=100):
    a = {"path": rel, "partitionValues": pv or {}, "size": size,
         "modificationTime": 1700000000000, "dataChange": True}
    if stats is not None:
        a["stats"] = json.dumps(stats)
    return {"add": a}


@pytest.fixture(scope="module")
def stats_table(spark, tmp_path_factory):
    """Three files with disjoint k ranges carrying stats, one stat-less
    file, one file whose s column is all-NULL (nullCount case)."""
    root = str(tmp_path_factory.mktemp("delta_stats"))
    tdir = os.path.join(root, "t")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)

    def kv(lo, hi, s_null=False):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            (F.lit(None).cast("string") if s_null
             else F.concat(F.lit("s"), F.format_string("%03d", "id")))
            .alias("s"))

    _one_parquet_file(spark, kv(0, 10), os.path.join(tdir, "a.parquet"))
    _one_parquet_file(spark, kv(10, 20), os.path.join(tdir, "b.parquet"))
    _one_parquet_file(spark, kv(20, 30), os.path.join(tdir, "c.parquet"))
    _one_parquet_file(spark, kv(30, 40),
                      os.path.join(tdir, "nostats.parquet"))
    _one_parquet_file(spark, kv(40, 50, s_null=True),
                      os.path.join(tdir, "snull.parquet"))

    def st(lo, hi, smin, smax, nrec=10, s_nulls=0):
        s = {"numRecords": nrec,
             "minValues": {"k": lo}, "maxValues": {"k": hi},
             "nullCount": {"k": 0, "s": s_nulls}}
        if smin is not None:
            s["minValues"]["s"] = smin
            s["maxValues"]["s"] = smax
        return s

    _commit(log, 0, [
        _PROTO, _meta(),
        _add("a.parquet", st(0, 9, "s000", "s009")),
        _add("b.parquet", st(10, 19, "s010", "s019")),
        _add("c.parquet", st(20, 29, "s020", "s029")),
        _add("nostats.parquet"),
        _add("snull.parquet", st(40, 49, None, None, s_nulls=10)),
    ])
    return tdir


def test_numeric_range_prunes_files(spark, stats_table):
    t = DeltaLiteTable(spark, stats_table)
    got = t.read(where={"k": (12, 15)})
    # b.parquet (stats hit) + nostats.parquet (no stats: must survive)
    assert t.last_read_stats["files_total"] == 5
    assert t.last_read_stats["files_planned"] == 2
    assert t.last_read_stats["stat_less"] == {"k": 1}
    assert sorted(r["k"] for r in got.collect()) == [12, 13, 14, 15]


def test_open_bounds_and_bytes_planned(spark, stats_table):
    t = DeltaLiteTable(spark, stats_table)
    got = t.read(where={"k": (25, None)})
    # c (20-29 overlaps), nostats, snull (40-49) — a and b pruned
    assert t.last_read_stats["files_planned"] == 3
    assert t.last_read_stats["bytes_planned"] == 300  # 3 files * 100
    assert sorted(r["k"] for r in got.collect()) == list(range(25, 50))
    # (None, None) bound prunes nothing and filters nothing
    assert t.read(where={"k": (None, None)}).count() == 50
    assert t.last_read_stats["files_planned"] == 5


def test_string_bounds_prune_lexicographically(spark, stats_table):
    t = DeltaLiteTable(spark, stats_table)
    got = t.read(where={"s": ("s010", "s012")})
    # b + nostats survive; snull pruned via nullCount==numRecords
    assert t.last_read_stats["files_planned"] == 2
    assert sorted(r["s"] for r in got.collect()) == [
        "s010", "s011", "s012"]


def test_residual_filter_keeps_results_exact(spark, stats_table):
    """The stat-less file spans 30-39: pruning can't touch it, the
    residual filter must still cut its rows."""
    t = DeltaLiteTable(spark, stats_table)
    got = t.read(where={"k": (38, 45)})
    assert sorted(r["k"] for r in got.collect()) == list(range(38, 46))


def test_unknown_where_column_refuses(spark, stats_table):
    with pytest.raises(ValueError, match="nope"):
        DeltaLiteTable(spark, stats_table).read(where={"nope": (1, 2)})


def test_partition_value_pruning(spark, tmp_path):
    tdir = str(tmp_path / "pvprune")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("p", T.IntegerType()),
    ])
    for p in (1, 2, 3):
        _one_parquet_file(
            spark,
            spark.range(p * 10, p * 10 + 3).select(F.col("id").alias("k")),
            os.path.join(tdir, f"p={p}", "f.parquet"))
    _commit(log, 0, [
        _PROTO, _meta(schema, partition_cols=["p"]),
        _add("p=1/f.parquet", pv={"p": "1"}),
        _add("p=2/f.parquet", pv={"p": "2"}),
        _add("p=3/f.parquet", pv={"p": "3"}),
        # NULL partition value: never satisfies a bound
        _add("p=1/f.parquet.dup", pv={"p": ""}),
    ][:-1])  # drop the dup row — just the three real files
    t = DeltaLiteTable(spark, tdir)
    got = t.read(where={"p": (2, 2)})
    assert t.last_read_stats["files_planned"] == 1
    assert sorted(r["k"] for r in got.collect()) == [20, 21, 22]
    # pv pruning composes with a data-column residual filter
    got2 = t.read(where={"p": (2, 3), "k": (21, 30)})
    assert t.last_read_stats["files_planned"] == 2
    assert sorted(r["k"] for r in got2.collect()) == [21, 22, 30]


def test_column_mapped_stats_use_physical_keys(spark, tmp_path):
    """delta-spark writes stats keyed by PHYSICAL column names on
    column-mapped tables — the pruner must look bounds up by them."""
    tdir = str(tmp_path / "cmprune")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)

    def _cm(name, dtype, phys, fid):
        return T.StructField(name, dtype, True, metadata={
            "delta.columnMapping.id": fid,
            "delta.columnMapping.physicalName": phys,
        })

    schema = T.StructType([_cm("key", T.LongType(), "col-k", 1)])
    conf = {"delta.columnMapping.mode": "name",
            "delta.columnMapping.maxColumnId": "1"}
    proto = {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
    for i, (lo, hi) in enumerate([(0, 5), (5, 10)]):
        _one_parquet_file(
            spark, spark.range(lo, hi).select(F.col("id").alias("col-k")),
            os.path.join(tdir, f"f{i}.parquet"))
    _commit(log, 0, [
        proto, _meta(schema, configuration=conf),
        _add("f0.parquet", {"numRecords": 5,
                            "minValues": {"col-k": 0},
                            "maxValues": {"col-k": 4},
                            "nullCount": {"col-k": 0}}),
        _add("f1.parquet", {"numRecords": 5,
                            "minValues": {"col-k": 5},
                            "maxValues": {"col-k": 9},
                            "nullCount": {"col-k": 0}}),
    ])
    t = DeltaLiteTable(spark, tdir)
    got = t.read(where={"key": (7, None)})
    assert t.last_read_stats["files_planned"] == 1
    assert sorted(r["key"] for r in got.collect()) == [7, 8, 9]


def test_stats_survive_checkpoint(spark, stats_table, tmp_path):
    """Checkpoint the log, DELETE the pre-checkpoint JSON, re-read with
    a bound: pruning still works off the checkpoint's stats column."""
    tdir = str(tmp_path / "ckpt")
    shutil.copytree(stats_table, tdir)
    ck = checkpoint_delta_export(spark, tdir)
    assert ck["version"] == 0
    os.remove(os.path.join(tdir, "_delta_log", f"{0:020d}.json"))
    t = DeltaLiteTable(spark, tdir)
    got = t.read(where={"k": (12, 15)})
    assert t.last_read_stats["files_planned"] == 2
    assert sorted(r["k"] for r in got.collect()) == [12, 13, 14, 15]


def test_export_writes_spec_stats_and_prunes(spark, tmp_path):
    """ManifestTable zone maps -> Delta spec stats on export: the add
    actions carry typed minValues/maxValues + numRecords, and the Delta
    reader's own read(where=) file-skips on the exported table."""
    from forklift_spark.manifest import ManifestTable

    # range-correlated partitions: each file spans a DISJOINT k range,
    # so k bounds actually prune (a k%4 layout would interleave k
    # across every file and prune nothing — correctly)
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") / 25).cast("int").alias("part"),
        F.concat(F.lit("v"), F.format_string("%04d", "id")).alias("s"),
        (F.col("id") * 1.5).alias("x"),
    )
    src = str(tmp_path / "src")
    t = ManifestTable(spark, src, "stats_pub")
    t.create(df, partition_by="part")
    dest = str(tmp_path / "pub")
    export_manifest_to_delta(t, dest)

    with open(os.path.join(dest, "_delta_log", f"{0:020d}.json")) as fh:
        adds = [json.loads(ln)["add"] for ln in fh
                if '"add"' in ln]
    assert adds and all("stats" in a for a in adds)
    st = json.loads(adds[0]["stats"])
    assert st["numRecords"] > 0
    assert isinstance(st["minValues"]["k"], int)
    assert isinstance(st["minValues"]["x"], float)
    assert isinstance(st["minValues"]["s"], str)

    dt = DeltaLiteTable(spark, dest)
    got = dt.read(where={"k": (10, 12)})
    assert dt.last_read_stats["files_planned"] \
        < dt.last_read_stats["files_total"]
    assert sorted(r["k"] for r in got.collect()) == [10, 11, 12]

    # incremental sync adds also carry stats
    upd = spark.range(200, 210).select(
        F.col("id").alias("k"), F.lit(8).cast("int").alias("part"),
        F.lit("vnew").alias("s"), F.lit(0.5).alias("x"))
    t.merge(upd, on="k")
    res = sync_manifest_to_delta(t, dest)
    assert res["mode"] == "incremental"
    with open(os.path.join(
            dest, "_delta_log", f"{res['delta_version']:020d}.json")) as fh:
        new_adds = [json.loads(ln)["add"] for ln in fh if '"add"' in ln]
    assert new_adds and all("stats" in a for a in new_adds)
    got2 = dt.read(where={"k": (200, 205)})
    assert sorted(r["k"] for r in got2.collect()) == list(range(200, 206))
    assert dt.last_read_stats["files_planned"] \
        < dt.last_read_stats["files_total"]
