"""Z-order clustering + compaction: measurable layout effects.

The z-order test checks the thing that matters: per-file min/max spans
on BOTH dimensions shrink vs an unclustered single-dimension sort, so
parquet data skipping can prune on either predicate.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from forklift_spark.operators.layout import compact, zorder_sort


@pytest.fixture()
def grid(spark):
    # a 100x100 grid: x-sort clusters x perfectly but leaves y spanning
    # the full range in every file; z-order bounds both
    return spark.range(10000).select(
        (F.col("id") % 100).alias("x"),
        (F.col("id") / 100).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )


def _file_spans(path, col):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT file_name, max({col}) - min({col}) AS span
        FROM (SELECT {col}, filename AS file_name
              FROM read_parquet('{path}/*.parquet', filename=true))
        GROUP BY file_name
        """
    ).fetchall()
    return [r[1] for r in rows]


def test_zorder_bounds_both_dimensions(spark, tmp_path, grid):
    plain = str(tmp_path / "xsort")
    zed = str(tmp_path / "zorder")
    grid.orderBy("x").write.option("maxRecordsPerFile", 1250).parquet(plain)
    zorder_sort(grid, ["x", "y"]).write.option("maxRecordsPerFile", 1250).parquet(zed)

    # same data
    assert spark.read.parquet(zed).count() == 10000
    got = spark.read.parquet(zed).agg(F.sum("payload")).collect()[0][0]
    assert got == sum(range(10000))

    # x-sorted files: y spans ~the full range per file
    y_span_plain = sum(_file_spans(plain, "y")) / len(_file_spans(plain, "y"))
    # z-ordered files: BOTH dims bounded well below full range
    x_span_z = sum(_file_spans(zed, "x")) / len(_file_spans(zed, "x"))
    y_span_z = sum(_file_spans(zed, "y")) / len(_file_spans(zed, "y"))
    assert y_span_plain > 90  # control: single-dim sort leaves y unclustered
    assert y_span_z < y_span_plain / 2
    assert x_span_z < 90


def test_compact_reduces_file_count(spark, tmp_path):
    path = str(tmp_path / "fragmented")
    # simulate incremental-append fragmentation: 40 tiny files
    spark.range(4000).repartition(40).write.parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before == 40
    n_target = compact(spark, path, target_file_bytes=1 << 20)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_after == n_target < n_before
    assert spark.read.parquet(path).count() == 4000


def test_hll_rollup_error_and_merge_consistency(spark):
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR

    from forklift_spark import tables
    from forklift_spark.operators.layout import distinct_sketch_rollup

    ev = tables.load(spark, SF_DIR, "events").withColumn(
        "day", F.to_date(F.date_trunc("day", "ts"))
    )
    fine, coarse = distinct_sketch_rollup(
        ev, ["event_type", "day"], ["event_type"], "user_id"
    )
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    direct = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    for r in coarse.collect():
        et, est = r["event_type"], r["approx_distinct"]
        # error bound vs exact; merged-vs-direct must agree closely (the
        # sketches are not byte-identical — sparse->dense promotion paths
        # differ — but register content is near-identical)
        assert abs(est - exact[et]) / exact[et] < 0.05, (et, est, exact[et])
        assert abs(est - direct[et]) / max(direct[et], 1) < 0.02, (et, est, direct[et])


def test_table_fingerprint_validates_copies(spark):
    from forklift_spark.operators.layout import table_fingerprint

    rows = [(i, f"name{i % 7}") for i in range(500)]
    src = spark.createDataFrame(rows, "id long, name string")
    fp = lambda df: {
        r.bucket: (r.n_rows, r.checksum)
        for r in table_fingerprint(df, ["id", "name"], buckets=8).collect()
    }
    base = fp(src)
    # identical copy in a different row order -> identical fingerprint
    shuffled = spark.createDataFrame(list(reversed(rows)), "id long, name string")
    assert fp(shuffled.repartition(7)) == base
    # one mutated row -> exactly the affected bucket(s) differ
    mutated = spark.createDataFrame(
        rows[:-1] + [(499, "CORRUPT")], "id long, name string"
    )
    mut = fp(mutated)
    diff = {b for b in base if mut.get(b) != base[b]}
    assert 1 <= len(diff) <= 2
    # a dropped row changes n_rows even if xor were to cancel
    dropped = spark.createDataFrame(rows[:-1], "id long, name string")
    assert sum(n for n, _ in fp(dropped).values()) == 499


def test_table_fingerprint_framing_is_unambiguous(spark):
    from forklift_spark.operators.layout import table_fingerprint

    fp = lambda rows: {
        r.bucket: (r.n_rows, r.checksum)
        for r in table_fingerprint(
            spark.createDataFrame(rows, "a string, b string"), ["a", "b"], buckets=4
        ).collect()
    }
    # separator injection: same concatenation, different rows
    assert fp([("a\x01b", "c")]) != fp([("a", "b\x01c")])
    # NULL vs any literal value (incl. the old sentinel)
    assert fp([(None, "x")]) != fp([("\x00", "x")])
    assert fp([(None, "x")]) != fp([("", "x")])
