"""Pure-SQL surface over manifest tables: `VERSION AS OF` time travel
via view-registration rewrite, head reads by bare name, and the U3
SQL-script transformation path running through the connection's
rewriter."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from forklift_spark.connections.manifest import ManifestConnection
from forklift_spark.engine import Engine
from forklift_spark.manifest import ManifestTable, rewrite_time_travel


@pytest.fixture()
def conn(spark, tmp_path):
    eng = Engine(spark=spark)
    c = ManifestConnection({"path": str(tmp_path)}, eng, "m")
    base = spark.range(10).select(
        F.col("id").alias("k"),
        (F.col("id") % 2 + 1).cast("int").alias("y"),
        (F.col("id") * 10).cast("long").alias("v"),
    )
    t = c.table("tbl")
    t.create(base, partition_by="y")
    t.merge(
        spark.createDataFrame([(1, 2, 999)], "k long, y int, v long"), on="k"
    )
    return c


def test_sql_time_travel_and_head(conn):
    out = conn.sql(
        "SELECT a.v AS v1, b.v AS v2 "
        "FROM tbl VERSION AS OF 1 a JOIN tbl b ON a.k = b.k WHERE a.k = 1"
    ).collect()[0]
    assert (out.v1, out.v2) == (10, 999)


def test_sql_unknown_name_passes_through(conn, spark):
    # a non-manifest ident with the clause is left for spark.sql to judge
    sql = "SELECT * FROM nosuch VERSION AS OF 3"
    assert (
        rewrite_time_travel(sql, lambda n: None) == sql
    )
    # and read() routes SELECTs through the rewriter
    assert conn.read("SELECT count(*) AS n FROM tbl").collect()[0].n == 10


def test_sql_script_transformation_hits_manifest_tables(conn, tmp_path):
    script = tmp_path / "xform.sql"
    script.write_text(
        "CREATE OR REPLACE TEMP VIEW v1_total AS\n"
        "SELECT sum(v) AS total FROM tbl VERSION AS OF 1;\n"
        "CREATE OR REPLACE TEMP VIEW head_total AS\n"
        "SELECT sum(v) AS total FROM tbl;\n"
    )
    from forklift_spark.transform import run_transformation

    assert run_transformation(conn, str(script)) is None
    spark = conn.engine.spark
    v1 = spark.sql("SELECT total FROM v1_total").collect()[0].total
    head = spark.sql("SELECT total FROM head_total").collect()[0].total
    assert head - v1 == 999 - 10
