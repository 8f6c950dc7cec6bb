"""Writer semantics (S3): upsert, schema evolution, null-placeholder
upgrade, strict mode — the behavioral contracts of
`spec/integration/mysql_spec.rb:57-251` on parquet storage."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from forklift_spark.writer import ParquetTableWriter, SchemaMismatch


@pytest.fixture()
def w(spark, tmp_path):
    return ParquetTableWriter(spark, str(tmp_path / "wh"))


def _users(spark, rows):
    return spark.createDataFrame(rows)


def test_lazy_create_and_append(w, spark):
    w.write(_users(spark, [Row(id=1, name="a")]), "users")  # lazy create
    w.write(_users(spark, [Row(id=2, name="b")]), "users", mode="append")
    assert w.read("users").count() == 2


def test_upsert_replaces_by_pk_keeps_count(w, spark):
    # upsert keeps count and updates the row (mysql_spec.rb:57-74)
    w.write(_users(spark, [Row(id=i, name=f"u{i}") for i in range(5)]), "users")
    w.write(_users(spark, [Row(id=2, name="updated")]), "users", mode="upsert")
    df = w.read("users")
    assert df.count() == 5
    assert df.filter(F.col("id") == 2).collect()[0]["name"] == "updated"


def test_new_column_added_on_write(w, spark):
    # rows carrying unseen keys trigger column addition; old rows read NULL
    # (mysql_spec.rb:145-164)
    w.write(_users(spark, [Row(id=1, name="a")]), "users")
    w.write(_users(spark, [Row(id=2, name="b", email="b@x.com")]), "users", mode="upsert")
    df = w.read("users")
    assert set(df.columns) == {"id", "name", "email"}
    assert df.filter(F.col("id") == 1).collect()[0]["email"] is None


def test_strict_schema_rejects_extra_columns(w, spark):
    # crash_on_extral_col=true semantics (mysql.rb:55)
    w.write(_users(spark, [Row(id=1, name="a")]), "users")
    with pytest.raises(SchemaMismatch):
        w.write(
            _users(spark, [Row(id=2, name="b", extra="x")]),
            "users",
            mode="upsert",
            strict_schema=True,
        )


def test_null_placeholder_upgrade(w, spark):
    # all-null column -> placeholder type; later typed write upgrades it
    # ("null rows will be text, and can be updated on subsequent writes",
    # mysql_spec.rb:198-251)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("score", T.NullType()),
        ]
    )
    df = spark.createDataFrame([(1, None)], schema=schema)
    w.write(df, "t")
    assert dict(w.read("t").dtypes)["score"] == "string"  # placeholder
    typed = spark.createDataFrame([Row(id=2, score=3.5)])
    w.write(typed, "t", mode="upsert")
    out = w.read("t")
    assert dict(out.dtypes)["score"] == "double"  # upgraded
    vals = {r["id"]: r["score"] for r in out.collect()}
    assert vals == {1: None, 2: 3.5}


def test_upsert_composite_primary_key(w, spark):
    # replace-on-(k1,k2): only the exact key pair is replaced
    rows = [Row(k1=a, k2=b, v=f"{a}{b}") for a in (1, 2) for b in ("x", "y")]
    w.write(_users(spark, rows), "ck")
    w.write(_users(spark, [Row(k1=1, k2="y", v="NEW")]), "ck", mode="upsert",
            primary_key=["k1", "k2"])
    got = {(r["k1"], r["k2"]): r["v"] for r in w.read("ck").collect()}
    assert got == {(1, "x"): "1x", (1, "y"): "NEW", (2, "x"): "2x", (2, "y"): "2y"}


def test_upsert_broadcast_threshold_gates_hint(spark, tmp_path):
    # below the threshold the key set carries a broadcast hint; above it
    # the anti-join must NOT force a broadcast (a backfill-sized batch
    # would OOM the driver). Disable auto-broadcast so the plan reflects
    # only the hint decision.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        small = ParquetTableWriter(spark, str(tmp_path / "a"), upsert_broadcast_threshold=100)
        small.write(_users(spark, [Row(id=i, name=f"u{i}") for i in range(20)]), "t")
        small.write(_users(spark, [Row(id=1, name="x")]), "t", mode="upsert")
        assert small.read("t").count() == 20

        big = ParquetTableWriter(spark, str(tmp_path / "b"), upsert_broadcast_threshold=3)
        big.write(_users(spark, [Row(id=i, name=f"u{i}") for i in range(20)]), "t")
        # capture the plan the anti-join produces above threshold
        existing = big.read("t")
        incoming = _users(spark, [Row(id=i, name="y") for i in range(10)])
        keys = incoming.select("id").distinct()
        probe = keys.limit(big.upsert_broadcast_threshold + 1).count()
        assert probe > big.upsert_broadcast_threshold
        plan = existing.join(keys, "id", "left_anti")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan
        # and the full upsert still lands correctly via the shuffle path
        big.write(incoming, "t", mode="upsert")
        out = big.read("t")
        assert out.count() == 20
        assert out.filter(F.col("name") == "y").count() == 10
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_overwrite_atomic_swap_leaves_no_staging(w, spark, tmp_path):
    w.write(_users(spark, [Row(id=1, name="a")]), "users")
    w.write(_users(spark, [Row(id=9, name="z")]), "users", mode="overwrite")
    assert [r["id"] for r in w.read("users").collect()] == [9]
    leftovers = [d for d in (tmp_path / "wh").iterdir() if "__" in d.name]
    assert leftovers == []


def test_overwrite_partitions_touches_only_present_partitions(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from forklift_spark.writer import ParquetTableWriter

    w = ParquetTableWriter(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(1, "d1", 10.0), (2, "d1", 20.0), (3, "d2", 30.0), (4, "d3", 40.0)],
        "id long, day string, v double",
    )
    w.write(base, "facts", mode="overwrite", partition_by=["day"])
    assert os.path.isdir(tmp_path / "facts" / "day=d2")

    # record the untouched partition's files to prove it isn't rewritten
    d2_files = sorted(os.listdir(tmp_path / "facts" / "day=d2"))

    delta = spark.createDataFrame(
        [(2, "d1", 99.0), (5, "d1", 50.0)], "id long, day string, v double"
    )
    w.write(delta, "facts", mode="overwrite_partitions", partition_by=["day"])

    out = {
        (r["id"], r["day"]): r["v"]
        for r in spark.read.parquet(str(tmp_path / "facts")).collect()
    }
    # d1 fully replaced by the delta (row 1 gone, 2 updated, 5 new)
    assert out == {(2, "d1"): 99.0, (5, "d1"): 50.0, (3, "d2"): 30.0, (4, "d3"): 40.0}
    assert sorted(os.listdir(tmp_path / "facts" / "day=d2")) == d2_files

    # conf restored after the write
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        != "dynamic"
    )


def test_overwrite_partitions_requires_partition_by(spark, tmp_path):
    import pytest as _pytest

    from forklift_spark.writer import ParquetTableWriter

    w = ParquetTableWriter(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "d1")], "id long, day string")
    w.write(df, "t", mode="overwrite", partition_by=["day"])
    with _pytest.raises(ValueError):
        w.write(df, "t", mode="overwrite_partitions")


def test_schema_diff_reports_drift(spark):
    from forklift_spark.writer import schema_diff

    old = spark.createDataFrame([(1, "a", 1.0)], "id long, name string, v double")
    new = spark.createDataFrame([(1, "a", 2)], "id long, name string, v int").withColumn(
        "flag", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(True)
    )
    d = schema_diff(old, new)
    assert d["added"] == ["flag"]
    assert d["removed"] == []
    assert d["type_changed"] == [("v", "double", "int")]


def test_partitioned_table_prunes_reads(spark, tmp_path):
    """Reading a day-partitioned table with a day predicate must prune at
    the source (PartitionFilters), not post-filter — the property that
    makes partitioned facts O(touched days) to query at 100 TB."""
    from pyspark.sql import functions as F

    from forklift_spark.writer import ParquetTableWriter

    w = ParquetTableWriter(spark, str(tmp_path))
    df = spark.createDataFrame(
        [(i, f"d{i % 3}", float(i)) for i in range(30)],
        "id long, day string, v double",
    )
    w.write(df, "facts", mode="overwrite", partition_by=["day"])
    q = spark.read.parquet(str(tmp_path / "facts")).filter(F.col("day") == "d1")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "d1" in plan
    assert q.count() == 10


def test_auto_key_lazy_create_and_append_continue(spark, tmp_path):
    """AUTO_INCREMENT parity (transports/mysql.rb:112-121): lazy create
    assigns a contiguous dense surrogate key when the incoming frame has
    none; a later keyless append continues past the current MAX(key)."""
    from forklift_spark.writer import ParquetTableWriter

    w = ParquetTableWriter(spark, str(tmp_path))
    first = spark.createDataFrame([("a",), ("b",), ("c",)], "name string")
    w.write(first, "people", mode="append", auto_key="id")
    got = {r["id"] for r in w.read("people").collect()}
    assert got == {1, 2, 3}

    second = spark.createDataFrame([("d",), ("e",)], "name string")
    w.write(second, "people", mode="append", auto_key="id")
    rows = {r["name"]: r["id"] for r in w.read("people").collect()}
    assert sorted(rows.values()) == [1, 2, 3, 4, 5]
    assert {rows["d"], rows["e"]} == {4, 5}

    # frames that already carry the key column are left untouched
    third = spark.createDataFrame([(100, "z")], "id long, name string")
    w.write(third, "people", mode="append", auto_key="id")
    assert max(r["id"] for r in w.read("people").collect()) == 100


def test_retained_versions_time_travel(spark, tmp_path):
    from forklift_spark.writer import ParquetTableWriter

    w = ParquetTableWriter(spark, str(tmp_path), retain_versions=2)
    for gen in (1, 2, 3, 4):
        df = spark.createDataFrame([(i, gen) for i in range(5)], "id long, gen long")
        w.write(df, "t", mode="overwrite")
    assert {r.gen for r in w.read("t").collect()} == {4}
    # two retired generations readable, oldest pruned
    assert {r.gen for r in w.read_version("t", back=1).collect()} == {3}
    assert {r.gen for r in w.read_version("t", back=2).collect()} == {2}
    assert len(w.versions("t")) == 2
    import pytest

    with pytest.raises(KeyError):
        w.read_version("t", back=3)
    # upsert publishes whole-table -> also versioned
    delta = spark.createDataFrame([(0, 99)], "id long, gen long")
    w.write(delta, "t", mode="upsert", primary_key="id")
    assert {r.gen for r in w.read_version("t", back=1).collect()} == {4}


def test_version_dirs_hidden_from_table_listing(spark, tmp_path):
    from forklift_spark.connections.parquet import ParquetConnection
    from forklift_spark.engine import Engine
    from forklift_spark.writer import ParquetTableWriter

    eng = Engine({"project_root": str(tmp_path)}, spark=spark)
    conn = ParquetConnection(
        {"path": str(tmp_path / "wh"), "retain_versions": 1}, eng, name="wh"
    )
    df = spark.createDataFrame([(1,)], "id long")
    conn.write(df, "t", mode="overwrite")
    conn.write(df, "t", mode="overwrite")
    assert conn.tables() == ["t"]
    assert conn.versions("t") == [1]
    assert conn.read_version("t", back=1).count() == 1
