"""iceberglite Spark Python DataSource: batch scan + streaming CDC tail
over spec-built Iceberg v2 tables (no jar, planner Spark-free)."""

from __future__ import annotations

import os

import pytest

from forklift_spark.connections.iceberglite import IcebergLiteTable
from forklift_spark.iceberg_datasource import IcebergLiteDataSource
from tests.test_iceberglite import (
    _entry,
    _manifest,
    _manifest_list,
    _metadata_v2,
    _mkdirs,
    _snap,
    _write_parquet,
)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(IcebergLiteDataSource)
    return spark


def _base_table(tmp_path):
    """snap 1: A (k 1..4) + B (k 10..12); snap 2: pos-delete on B
    positions {0, 2}; snap 3: file C appended, file A removed."""
    tdir = str(tmp_path / "t")
    _mkdirs(tdir)
    a = os.path.join(tdir, "data", "a.parquet")
    b = os.path.join(tdir, "data", "b.parquet")
    c = os.path.join(tdir, "data", "c.parquet")
    d = os.path.join(tdir, "data", "del.parquet")
    _write_parquet(a, {"k": [1, 2, 3, 4], "cat": list("wxyz"),
                       "val": [1.0, 2.0, 3.0, 4.0]})
    _write_parquet(b, {"k": [10, 11, 12], "cat": list("abc"),
                       "val": [10.0, 11.0, 12.0]})
    _write_parquet(c, {"k": [20, 21], "cat": list("mn"),
                       "val": [20.0, 21.0]})
    _write_parquet(d, {"file_path": [b, b], "pos": [0, 2]})
    m_ab = _manifest(tdir, "m_ab.avro",
                     [_entry(a, seq=1, rows=4), _entry(b, seq=1, rows=3)])
    md = _manifest(tdir, "md.avro", [_entry(d, seq=2, content=1, rows=2)])
    m_bc = _manifest(tdir, "m_bc.avro",
                     [_entry(b, seq=1, rows=3), _entry(c, seq=3, rows=2)])
    l1 = _manifest_list(tdir, "l1.avro", [(m_ab, 0, 1)])
    l2 = _manifest_list(tdir, "l2.avro", [(m_ab, 0, 1), (md, 1, 2)])
    l3 = _manifest_list(tdir, "l3.avro", [(m_bc, 0, 3), (md, 1, 2)])
    _metadata_v2(tdir, [_snap(1, 1, l1), _snap(2, 2, l2),
                        _snap(3, 3, l3)], current=3)
    return tdir


def test_batch_parity_with_reader(registered, tmp_path):
    spark = registered
    tdir = _base_table(tmp_path)
    got = spark.read.format("iceberglite").load(tdir)
    ref = IcebergLiteTable(spark, tdir).read()
    key = lambda df: sorted((r.k, r.cat, r.val) for r in df.collect())
    assert key(got) == key(ref)
    assert (10, "a", 10.0) not in key(got)  # pos-delete applied
    # snapshot time travel via option
    v1 = (spark.read.format("iceberglite")
          .option("snapshot_id", "1").load(tdir))
    assert key(v1) == key(IcebergLiteTable(spark, tdir).read(snapshot_id=1))


def _drain(spark, tdir, ckpt, sink, starting=None):
    reader = (spark.readStream.format("iceberglite")
              .option("cdc", "true"))
    if starting is not None:
        reader = reader.option("starting_snapshot_id", str(starting))
    stream = reader.load(tdir)

    def absorb(df, _bid):
        sink.extend(
            (r.k, r.cat, r._change_type, r._commit_snapshot_id)
            for r in df.collect()
        )

    q = (stream.writeStream.foreachBatch(absorb)
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)


def test_stream_cdc_replay_from_genesis(registered, tmp_path):
    spark = registered
    tdir = _base_table(tmp_path)
    got: list = []
    _drain(spark, tdir, tmp_path / "ck", got, starting=0)
    ins1 = [(k, c, "insert", 1) for k, c in
            [(1, "w"), (2, "x"), (3, "y"), (4, "z"),
             (10, "a"), (11, "b"), (12, "c")]]
    del2 = [(10, "a", "delete", 2), (12, "c", "delete", 2)]
    # snap 3: C appended, A removed (its rows were all live)
    ins3 = [(20, "m", "insert", 3), (21, "n", "insert", 3)]
    del3 = [(k, c, "delete", 3) for k, c in
            [(1, "w"), (2, "x"), (3, "y"), (4, "z")]]
    assert sorted(got) == sorted(ins1 + del2 + ins3 + del3)


def test_stream_tails_only_new_snapshots(registered, tmp_path):
    spark = registered
    tdir = _base_table(tmp_path)
    got: list = []
    _drain(spark, tdir, tmp_path / "ck2", got)  # default: tail
    assert got == []
    # append snapshot 4: one new file
    e = os.path.join(tdir, "data", "e.parquet")
    _write_parquet(e, {"k": [30], "cat": ["q"], "val": [30.0]})
    m_bce = _manifest(tdir, "m_bce.avro",
                      [_entry(e, seq=4, rows=1)])
    # reuse l3's manifests plus the new one
    m_bc = os.path.join(tdir, "metadata", "m_bc.avro")
    md = os.path.join(tdir, "metadata", "md.avro")
    l4 = _manifest_list(tdir, "l4.avro",
                        [(m_bc, 0, 3), (md, 1, 2), (m_bce, 0, 4)])
    l1 = os.path.join(tdir, "metadata", "l1.avro")
    l2 = os.path.join(tdir, "metadata", "l2.avro")
    l3 = os.path.join(tdir, "metadata", "l3.avro")
    _metadata_v2(tdir, [_snap(1, 1, l1), _snap(2, 2, l2),
                        _snap(3, 3, l3), _snap(4, 4, l4)],
                 current=4, version=2)
    got.clear()
    _drain(spark, tdir, tmp_path / "ck2", got)
    assert got == [(30, "q", "insert", 4)]


def test_stream_expired_boundary_refuses(registered, tmp_path):
    spark = registered
    tdir = _base_table(tmp_path)
    got: list = []
    with pytest.raises(Exception, match="expired"):
        _drain(spark, tdir, tmp_path / "ck3", got, starting=99)


def test_equality_deletes_refuse(registered, tmp_path):
    spark = registered
    tdir = str(tmp_path / "t")
    _mkdirs(tdir)
    a = os.path.join(tdir, "data", "a.parquet")
    d = os.path.join(tdir, "data", "eqd.parquet")
    _write_parquet(a, {"k": [1], "cat": ["w"], "val": [1.0]})
    _write_parquet(d, {"k": [1]})
    m = _manifest(tdir, "m.avro", [_entry(a, seq=1, rows=1)])
    md = _manifest(tdir, "md.avro",
                   [_entry(d, seq=2, content=2, rows=1, eq_ids=[1])])
    lst = _manifest_list(tdir, "l.avro", [(m, 0, 1), (md, 1, 2)])
    _metadata_v2(tdir, [_snap(1, 2, lst)], current=1)
    with pytest.raises(Exception, match="[Ee]quality"):
        spark.read.format("iceberglite").load(tdir).collect()


def test_batch_reader_pushdown_prunes_files(spark, tmp_path):
    """White-box pushdown: value-bounds + identity-partition pruning
    act inside the DataSource planner; all filters returned to Spark."""
    import json

    from pyspark.sql import functions as F
    from pyspark.sql.datasource import EqualTo

    from forklift_spark.connections.iceberglite import (
        export_manifest_to_iceberg,
    )
    from forklift_spark.iceberg_datasource import _IceBatchReader
    from forklift_spark.manifest import ManifestTable

    t = ManifestTable(spark, str(tmp_path / "m"), "t")
    t.create(spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 4 + 1).cast("int").alias("p"),
        (F.col("id") * 10).alias("v")), partition_by="p")
    dest = str(tmp_path / "i")
    export_manifest_to_iceberg(t, dest)

    from forklift_spark.datasource import _part_files

    schema_json = json.dumps(
        IcebergLiteTable(spark, dest).read().schema.jsonValue())
    r = _IceBatchReader({"path": dest}, schema_json)
    # pruning evidence is the planned FILE set (split-size packing
    # groups small files, so partition counts no longer track it 1:1)
    full = _part_files(r.partitions())
    assert full >= 4
    r2 = _IceBatchReader({"path": dest}, schema_json)
    back = r2.pushFilters([EqualTo(("p",), 2)])
    assert list(back) == [EqualTo(("p",), 2)]
    assert _part_files(r2.partitions()) < full
    # end-to-end through the registered source
    spark.dataSource.register(IcebergLiteDataSource)
    got = (spark.read.format("iceberglite").load(dest)
           .filter("p = 2 AND k >= 10"))
    assert sorted(row.k for row in got.collect()) == sorted(
        k for k in range(100) if k % 4 + 1 == 2 and k >= 10)


def test_field_id_rename_resolution_in_leaf(registered, tmp_path):
    """A file written BEFORE a column rename carries the old parquet
    name but the same field id: the Arrow leaf resolves by footer
    PARQUET:field_id (free — the file is already open), so the renamed
    column reads values instead of silently null-filling."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark = registered
    tdir = str(tmp_path / "t")
    _mkdirs(tdir)
    # file written pre-rename: column 'cat' was then called 'category'
    p = os.path.join(tdir, "data", "old.parquet")
    fields = [
        pa.field("k", pa.int64(),
                 metadata={b"PARQUET:field_id": b"1"}),
        pa.field("category", pa.string(),
                 metadata={b"PARQUET:field_id": b"2"}),
        pa.field("val", pa.float64(),
                 metadata={b"PARQUET:field_id": b"3"}),
    ]
    pq.write_table(pa.table(
        [pa.array([1, 2]), pa.array(["x", "y"]),
         pa.array([1.0, 2.0])], schema=pa.schema(fields)), p)
    m = _manifest(tdir, "m.avro", [_entry(p, seq=1, rows=2)])
    lst = _manifest_list(tdir, "l.avro", [(m, 0, 1)])
    # current schema names field 2 'cat' (the post-rename name)
    _metadata_v2(tdir, [_snap(1, 1, lst)], current=1)
    got = spark.read.format("iceberglite").load(tdir)
    assert sorted((r.k, r.cat) for r in got.collect()) == [
        (1, "x"), (2, "y")]
