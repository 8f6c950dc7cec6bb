"""deltalite Spark Python DataSource: batch scan + streaming CDC tail
over hand-built PROTOCOL.md logs (no delta jar, planner Spark-free)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from forklift_spark.connections.deltalite import DeltaLiteTable
from forklift_spark.delta_datasource import DeltaLiteDataSource
from tests.test_delta_dv import _i_descriptor, _v3_protocol
from tests.test_deltalite import (
    _add,
    _commit,
    _meta_action,
    _one_parquet_file,
)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(DeltaLiteDataSource)
    return spark


def _mk(spark, tdir, name, lo, hi, tag):
    df = spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit(tag), F.col("id")).alias("v"),
    ).coalesce(1).sortWithinPartitions("k")
    _one_parquet_file(spark, df, os.path.join(tdir, name))


@pytest.fixture()
def dv_part_table(spark, tmp_path):
    """v0: f1 (k 0..4, p=1) + f2 (k 10..14, p=2), v3 protocol."""
    tdir = str(tmp_path / "t")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    _mk(spark, tdir, "f1.parquet", 0, 5, "a")
    _mk(spark, tdir, "f2.parquet", 10, 15, "b")
    _commit(log, 0, [_v3_protocol(), _meta_action(),
                     _add("f1.parquet", {"p": "1"}),
                     _add("f2.parquet", {"p": "2"})])
    return tdir


def _rows(df):
    return sorted((r.k, r.v, r.p) for r in df.collect())


def test_batch_parity_with_reader_and_dv(registered, dv_part_table):
    spark = registered
    tdir = dv_part_table
    # add a DV so the batch source must subtract masked positions
    a = _add("f1.parquet", {"p": "1"})
    a["add"]["deletionVector"] = _i_descriptor([1, 3])
    _commit(os.path.join(tdir, "_delta_log"), 1, [a])
    got = spark.read.format("deltalite").load(tdir)
    ref = DeltaLiteTable(spark, tdir).read()
    assert _rows(got) == _rows(ref)
    assert (1, "a1", 1) not in _rows(got)
    # partition values came from the LOG, typed per the schema
    assert dict(got.dtypes)["p"] == "int"
    # time travel via option
    v0 = spark.read.format("deltalite").option("version", "0").load(tdir)
    assert _rows(v0) == _rows(DeltaLiteTable(spark, tdir).read(version=0))


def _drain(spark, tdir, ckpt, sink, starting=None):
    reader = (spark.readStream.format("deltalite")
              .option("cdc", "true"))
    if starting is not None:
        reader = reader.option("starting_version", str(starting))
    stream = reader.load(tdir)

    def absorb(df, _bid):
        sink.extend(
            (r.k, r.v, r.p, r._change_type, r._commit_version)
            for r in df.collect()
        )

    q = (stream.writeStream.foreachBatch(absorb)
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)


def test_stream_cdc_tail_exactly_once(registered, dv_part_table,
                                      tmp_path):
    spark = registered
    tdir = dv_part_table
    log = os.path.join(tdir, "_delta_log")
    ckpt = tmp_path / "ckpt"
    got: list = []
    _drain(spark, tdir, ckpt, got, starting=-1)  # replay from genesis
    assert sorted(got) == sorted(
        [(k, f"a{k}", 1, "insert", 0) for k in range(5)]
        + [(k, f"b{k}", 2, "insert", 0) for k in range(10, 15)])

    # v1: DV update on f1 (bare re-add, spec's last-writer-wins) ->
    # exactly the newly-masked rows as deletes
    a = _add("f1.parquet", {"p": "1"})
    a["add"]["deletionVector"] = _i_descriptor([1, 3])
    _commit(log, 1, [a])
    got.clear()
    _drain(spark, tdir, ckpt, got)  # resumes from the offset log
    assert sorted(got) == [(1, "a1", 1, "delete", 1),
                           (3, "a3", 1, "delete", 1)]

    # v2: compaction with dataChange false -> ZERO events
    _mk(spark, tdir, "f2c.parquet", 10, 15, "b")
    _commit(log, 2, [
        {"remove": {"path": "f2.parquet", "dataChange": False}},
        {"add": {"path": "f2c.parquet", "partitionValues": {"p": "2"},
                 "size": 1, "modificationTime": 0,
                 "dataChange": False}},
    ])
    got.clear()
    _drain(spark, tdir, ckpt, got)
    assert got == []

    # v3: f1 removed -> deletes of its LIVE rows only (dv-masked rows
    # already left at v1)
    _commit(log, 3, [
        {"remove": {"path": "f1.parquet", "dataChange": True,
                    "deletionVector": a["add"]["deletionVector"]}},
    ])
    got.clear()
    _drain(spark, tdir, ckpt, got)
    assert sorted(got) == [(0, "a0", 1, "delete", 3),
                           (2, "a2", 1, "delete", 3),
                           (4, "a4", 1, "delete", 3)]

    # v4: DV shrink (restore) -> the un-masked row comes back as insert
    b = _add("f2c.parquet", {"p": "2"})
    b["add"]["deletionVector"] = _i_descriptor([0])
    _commit(log, 4, [b])
    c = _add("f2c.parquet", {"p": "2"})
    _commit(log, 5, [c])
    got.clear()
    _drain(spark, tdir, ckpt, got)
    assert sorted(got) == [(10, "b10", 2, "delete", 4),
                           (10, "b10", 2, "insert", 5)]


def test_stream_default_tails_from_current(registered, dv_part_table,
                                           tmp_path):
    spark = registered
    tdir = dv_part_table
    ckpt = tmp_path / "ckpt2"
    got: list = []
    _drain(spark, tdir, ckpt, got)  # no starting_version: tail only
    assert got == []
    _mk(spark, tdir, "f3.parquet", 20, 22, "c")
    _commit(os.path.join(tdir, "_delta_log"), 1,
            [_add("f3.parquet", {"p": "3"})])
    got.clear()
    _drain(spark, tdir, ckpt, got)
    assert sorted(got) == [(20, "c20", 3, "insert", 1),
                           (21, "c21", 3, "insert", 1)]


def test_option_validation_and_cleaned_log_refusal(registered,
                                                   dv_part_table,
                                                   tmp_path):
    spark = registered
    tdir = dv_part_table
    with pytest.raises(Exception, match="cdc"):
        spark.read.format("deltalite").option("cdc", "true") \
            .load(tdir).collect()
    # streaming without cdc=true refuses (streamReader is built at
    # query start, so the error surfaces through the query)
    with pytest.raises(Exception, match="cdc"):
        q = (spark.readStream.format("deltalite").load(tdir)
             .writeStream.format("noop")
             .option("checkpointLocation", str(tmp_path / "c0"))
             .trigger(availableNow=True).start())
        try:
            q.awaitTermination(60)
        finally:
            q.stop()
    # cleaned log (missing commit 0) refuses loudly at plan time
    _commit(os.path.join(tdir, "_delta_log"), 1,
            [_add("f1.parquet", {"p": "1"})])
    os.remove(os.path.join(tdir, "_delta_log", f"{0:020d}.json"))
    with pytest.raises(Exception, match="Spark-free|checkpoint"):
        spark.read.format("deltalite").load(tdir).collect()


def test_batch_reader_pushdown_prunes_files(spark, tmp_path):
    """White-box: pushFilters + partitions() on the reader itself —
    stats/partition-value pruning drops files at plan time while every
    filter is returned to Spark for row-level re-application."""
    import json

    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

    from forklift_spark.connections.deltalite import (
        export_manifest_to_delta,
    )
    from forklift_spark.delta_datasource import _DeltaBatchReader
    from forklift_spark.manifest import ManifestTable

    # range-correlated partitions so the k stats bounds genuinely
    # separate files (p = k // 25 -> disjoint k ranges per file)
    t = ManifestTable(spark, str(tmp_path / "m"), "t")
    t.create(spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") / 25).cast("int").alias("p"),
        (F.col("id") * 10).alias("v")), partition_by="p")
    dest = str(tmp_path / "d")
    export_manifest_to_delta(t, dest)

    from forklift_spark.datasource import _part_files

    schema_json = json.dumps(
        DeltaLiteTable(spark, dest).snapshot()["schema"].jsonValue())
    r = _DeltaBatchReader({"path": dest}, schema_json)
    # pruning evidence is the planned FILE set (split-size packing
    # groups small files, so partition counts no longer track it 1:1)
    full = _part_files(r.partitions())
    assert full >= 4
    r2 = _DeltaBatchReader({"path": dest}, schema_json)
    back = r2.pushFilters([EqualTo(("p",), 2)])
    assert list(back) == [EqualTo(("p",), 2)]  # Spark re-applies all
    assert _part_files(r2.partitions()) < full
    # range predicate on a stats column
    r3 = _DeltaBatchReader({"path": dest}, schema_json)
    r3.pushFilters([GreaterThanOrEqual(("k",), 90)])
    assert _part_files(r3.partitions()) < full
    # end-to-end: results stay exact through the registered source
    spark.dataSource.register(DeltaLiteDataSource)
    got = (spark.read.format("deltalite").load(dest)
           .filter("p = 2 AND k >= 60"))
    assert sorted(row.k for row in got.collect()) == sorted(
        k for k in range(100) if k // 25 == 2 and k >= 60)


def test_batch_reads_flat_columnmapping_table(spark, tmp_path):
    """name-mode columnMapping through the DataSource: file columns
    live under physical names, partitionValues are physical-keyed, the
    reader surfaces the LOGICAL schema; nested-struct cm refuses to the
    full reader."""
    import json

    from pyspark.sql import types as T

    from tests.test_delta_colmap import _build_cm_table, _cm_field

    tdir = str(tmp_path / "cm_flat")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    df = spark.range(0, 5).select(
        F.col("id").alias("col-k"),
        F.concat(F.lit("a"), F.col("id")).alias("col-v"),
    ).coalesce(1)
    _one_parquet_file(spark, df, os.path.join(tdir, "f1.parquet"))
    schema = T.StructType([
        _cm_field("k", T.LongType(), "col-k", 1),
        _cm_field("renamed_v", T.StringType(), "col-v", 2),
        _cm_field("p", T.IntegerType(), "col-p", 3),
    ])
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "cm-flat-ds", "format": {"provider": "parquet",
                                           "options": {}},
            "schemaString": json.dumps(schema.jsonValue()),
            "partitionColumns": ["col-p"],
            "configuration": {"delta.columnMapping.mode": "name"},
            "createdTime": 1700000000000,
        }},
        {"add": {"path": "f1.parquet",
                 "partitionValues": {"col-p": "7"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    spark.dataSource.register(DeltaLiteDataSource)
    got = spark.read.format("deltalite").load(tdir)
    assert got.columns == ["k", "renamed_v", "p"]
    ref = DeltaLiteTable(spark, tdir).read()
    key = lambda d: sorted((r.k, r.renamed_v, r.p) for r in d.collect())
    assert key(got) == key(ref)
    assert key(got)[0] == (0, "a0", 7)

    # nested struct under cm: loud refusal pointing at the full reader
    nt = _build_cm_table(spark, str(tmp_path))
    with pytest.raises(Exception, match="nested"):
        spark.read.format("deltalite").load(nt).collect()
