"""Patterns layer (P1-P10) against a parquet warehouse — mirrors
`spec/integration/mysql_patterns_spec.rb`: seeded tables, independent
read-back assertions, incremental re-capture of updated rows."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from forklift_spark import patterns
from forklift_spark.connections.parquet import ParquetConnection
from forklift_spark.engine import Engine
from tests.conftest import SF_DIR


@pytest.fixture()
def wh(spark, tmp_path):
    eng = Engine({"project_root": str(tmp_path)}, spark=spark)
    conn = ParquetConnection({"path": str(tmp_path / "warehouse")}, eng, name="wh")
    eng.add_connection("parquet", "wh", conn)
    return conn


@pytest.fixture()
def seeded(wh, spark):
    from forklift_spark import tables

    events = tables.load(spark, SF_DIR, "events")
    wh.write(events, "events_src", mode="overwrite")
    return wh


def test_pipe_full_copy(seeded):
    patterns.pipe(seeded, "events_src", seeded, "events_dst")
    assert seeded.count("events_dst") == seeded.count("events_src")


def test_incremental_pipe_first_sync_is_full(seeded):
    patterns.incremental_pipe(
        seeded, "events_src", seeded, "events_dst", matcher="ts", primary_key="event_id"
    )
    assert seeded.count("events_dst") == seeded.count("events_src")


def test_incremental_pipe_recaptures_updated_rows(seeded, spark):
    src = seeded.read("events_src")
    cutoff = "2024-01-04"
    # dest has only the first days (simulates an earlier sync)
    seeded.write(
        src.filter(F.col("ts") < F.lit(cutoff).cast("timestamp")),
        "events_dst",
        mode="overwrite",
    )
    before = seeded.count("events_dst")
    assert before < seeded.count("events_src")
    # bump one old row's matcher past the HWM (the spec's `updated_at =
    # NOW()` move, mysql_patterns_spec.rb:38-44) and change its payload
    bumped = src.withColumn(
        "ts",
        F.when(F.col("event_id") == 0, F.lit("2030-01-01").cast("timestamp")).otherwise(
            F.col("ts")
        ),
    ).withColumn(
        "value",
        F.when(F.col("event_id") == 0, F.lit(-1.0)).otherwise(F.col("value")),
    )
    seeded.write(bumped, "events_src", mode="overwrite")
    patterns.incremental_pipe(
        seeded, "events_src", seeded, "events_dst", matcher="ts", primary_key="event_id"
    )
    # all rows synced, no duplicate for the updated pk, new payload visible
    assert seeded.count("events_dst") == seeded.count("events_src")
    row0 = seeded.read("events_dst").filter(F.col("event_id") == 0).collect()
    assert len(row0) == 1
    assert row0[0]["value"] == -1.0


def test_optimistic_pipe_falls_back_to_full(seeded):
    # dest missing -> not eligible -> full pipe path
    path = patterns.optimistic_pipe(
        seeded, "events_src", seeded, "events_new", matcher="ts", primary_key="event_id"
    )
    assert path == "full"
    # second run: eligible -> incremental path
    path = patterns.optimistic_pipe(
        seeded, "events_src", seeded, "events_new", matcher="ts", primary_key="event_id"
    )
    assert path == "incremental"


def test_eligibility_checks(seeded):
    assert not patterns.can_incremental_pipe(seeded, "events_src", seeded, "missing", "ts")
    patterns.pipe(seeded, "events_src", seeded, "events_dst")
    assert patterns.can_incremental_pipe(seeded, "events_src", seeded, "events_dst", "ts")
    assert not patterns.can_incremental_pipe(seeded, "events_src", seeded, "events_dst", "nope")


def test_max_timestamp_epoch_fallback(wh):
    assert wh.max_timestamp("never_written", "ts") == datetime.datetime(1970, 1, 1)


def test_hwm_store_roundtrip(tmp_path):
    store = patterns.HwmStore(str(tmp_path / "hwm.json"))
    assert store.get("t", "ts") == datetime.datetime(1970, 1, 1)
    t = datetime.datetime(2024, 5, 1, 12, 30)
    store.set("t", t, "ts")
    assert store.get("t", "ts") == t


def test_detect_primary_key(seeded):
    assert patterns.detect_primary_key_or_default(seeded, "events_src") == "id"
    seeded.config["primary_keys"] = {"events_src": "event_id"}
    assert patterns.detect_primary_key_or_default(seeded, "events_src") == "event_id"


def test_incremental_pipe_with_schema_evolution_mid_sync(spark, tmp_path):
    """A source that grows a column between syncs must not break the
    HWM pipe: new column appears in dest, pre-evolution rows read NULL
    (the reference's ALTER-on-write semantics, `transports/mysql.rb:64-73`,
    at pattern level)."""
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from forklift_spark import patterns
    from forklift_spark.connections.parquet import ParquetConnection
    from forklift_spark.engine import Engine

    eng = Engine({"project_root": str(tmp_path)}, spark=spark)
    src = ParquetConnection({"path": str(tmp_path / "src")}, eng)
    dst = ParquetConnection({"path": str(tmp_path / "dst")}, eng)

    t0 = datetime.datetime(2026, 1, 1)
    schema_v1 = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("updated_at", T.TimestampType()),
        ]
    )
    rows = [(i, f"v1_{i}", t0 + datetime.timedelta(hours=i)) for i in range(8)]
    src.write(spark.createDataFrame(rows, schema_v1), "t", mode="overwrite")
    patterns.incremental_pipe(src, "t", dst, "t")
    assert dst.read("t").count() == 8

    # source evolves: adds a `score` column; only newer rows carry it
    schema_v2 = T.StructType(list(schema_v1.fields) + [T.StructField("score", T.LongType())])
    t_new = t0 + datetime.timedelta(days=1)
    newer = [(100, "v2_100", t_new, 7), (101, "v2_101", t_new, 9)]
    src.write(spark.createDataFrame(newer, schema_v2), "t", mode="upsert", primary_key="id")
    patterns.incremental_pipe(src, "t", dst, "t")

    out = dst.read("t")
    assert out.count() == 10
    assert "score" in out.columns
    assert out.filter(F.col("score").isNotNull()).count() == 2
    assert out.filter((F.col("id") < 100) & F.col("score").isNotNull()).count() == 0


def test_partitioned_incremental_pipe_replaces_only_touched_days(spark, tmp_path):
    import datetime
    import os

    from forklift_spark.connections.parquet import ParquetConnection
    from forklift_spark.patterns import partitioned_incremental_pipe

    class _Eng:
        def __init__(self, s):
            self.spark = s
            self.logger = type("L", (), {"log": staticmethod(lambda m: None)})()

    eng = _Eng(spark)
    src = ParquetConnection({"path": str(tmp_path / "src")}, eng, "src")
    dst = ParquetConnection({"path": str(tmp_path / "dst")}, eng, "dst")

    t0 = datetime.datetime(2024, 1, 1, 8)
    t1 = datetime.datetime(2024, 1, 2, 9)
    rows = [(1, t0, "a"), (2, t0, "b"), (3, t1, "c")]
    src.write(
        spark.createDataFrame(rows, "id long, updated_at timestamp, v string"),
        "ev",
        mode="overwrite",
    )
    partitioned_incremental_pipe(src, "ev", dst, "ev_w", "day")
    assert os.path.isdir(tmp_path / "dst" / "ev_w" / "day=2024-01-01")
    day1_files = sorted(os.listdir(tmp_path / "dst" / "ev_w" / "day=2024-01-01"))

    # a later row lands on day 2 plus one correction on day 2; day 1 untouched
    t2 = datetime.datetime(2024, 1, 2, 15)
    src.write(
        spark.createDataFrame(
            [(3, t2, "c2"), (4, t2, "d")], "id long, updated_at timestamp, v string"
        ),
        "ev",
        mode="upsert",
        primary_key="id",
    )
    partitioned_incremental_pipe(src, "ev", dst, "ev_w", "day")

    got = {
        (r["id"]): (r["v"])
        for r in dst.read("SELECT id, v FROM ev_w").collect()
    }
    assert got == {1: "a", 2: "b", 3: "c2", 4: "d"}
    assert (
        sorted(os.listdir(tmp_path / "dst" / "ev_w" / "day=2024-01-01")) == day1_files
    )


def test_scd2_merge_decision_table(spark):
    from forklift_spark.patterns import scd2_merge
    import datetime as dt

    TS = dt.datetime
    dim = spark.createDataFrame(
        [
            # key 1: history row + current row (will change)
            (1, 10.0, TS(1990, 1, 1), TS(1995, 1, 1)),
            (1, 20.0, TS(1995, 1, 1), None),
            # key 2: current row, identical update -> no-op
            (2, 30.0, TS(1995, 1, 1), None),
            # key 3: current row, no update at all
            (3, 40.0, TS(1995, 1, 1), None),
        ],
        "k long, bal double, valid_from timestamp, valid_to timestamp",
    )
    upd = spark.createDataFrame(
        [(1, 25.0, TS(1998, 1, 1)), (2, 30.0, TS(1998, 1, 1)), (9, 99.0, TS(1998, 1, 1))],
        "k long, bal double, ts timestamp",
    )
    out = scd2_merge(dim, upd, key="k", attrs=["bal"]).collect()
    rows = {(r.k, r.bal, r.valid_from, r.valid_to) for r in out}
    assert rows == {
        (1, 10.0, TS(1990, 1, 1), TS(1995, 1, 1)),   # history untouched
        (1, 20.0, TS(1995, 1, 1), TS(1998, 1, 1)),   # closed
        (1, 25.0, TS(1998, 1, 1), None),             # opened
        (2, 30.0, TS(1995, 1, 1), None),             # no-op: single version
        (3, 40.0, TS(1995, 1, 1), None),             # untouched
        (9, 99.0, TS(1998, 1, 1), None),             # brand-new key
    }
    assert len(out) == len(rows)  # no duplicate versions anywhere


def test_cdc_apply_decision_table(spark):
    from forklift_spark.patterns import cdc_apply

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, bal double"
    )
    changes = spark.createDataFrame(
        [
            (1, "U", 11.0, 1), (1, "U", 12.0, 2),   # latest update wins
            (2, "D", 0.0, 5), (2, "U", 21.0, 4),    # delete is latest -> gone
            (4, "I", 40.0, 1),                      # insert new key
            (5, "I", 50.0, 1), (5, "D", 0.0, 2),    # insert then delete -> gone
        ],
        "k long, op string, bal double, ts long",
    )
    out = {r.k: r.bal for r in cdc_apply(base, changes, key="k").collect()}
    assert out == {1: 12.0, 3: 30.0, 4: 40.0}


def test_ivm_join_branches_partition_the_full_join(spark):
    a = spark.createDataFrame([(i, i % 5) for i in range(40)], "oid long, k long")
    b = spark.createDataFrame([(k, f"v{k}") for k in range(5)], "k long, v string")
    a_old, delta_a = a.filter("oid < 30"), a.filter("oid >= 30")
    b_old, delta_b = b.filter("k < 4"), b.filter("k >= 4")
    got = patterns.ivm_join_insert_only(a_old, delta_a, b_old, delta_b, on="k")
    rows = got.collect()
    full = set((r.oid, r.k, r.v) for r in a.join(b, "k").collect())
    assert set((r.oid, r.k, r.v) for r in rows) == full
    assert len(rows) == len(full)  # a partition: no duplicates either
    by_branch = {r.branch for r in rows}
    assert by_branch == {"old", "delta_a", "delta_b", "delta_both"}


# -- ivm_agg_apply ---------------------------------------------------------


def _ivm_view(spark, rows):
    return spark.createDataFrame(rows, "g string, n_rows long, sum_total long")


def _ivm_delta(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def test_ivm_agg_insert_delete_and_group_drop(spark):
    from forklift_spark.patterns import ivm_agg_apply

    old = _ivm_view(spark, [("a", 2, 10), ("b", 1, 5), ("c", 3, 30)])
    ins = _ivm_delta(spark, [("a", 7), ("d", 4)])     # update + brand-new group
    dele = _ivm_delta(spark, [("b", 5), ("c", 10), ("c", 10)])  # b fully deleted
    out = ivm_agg_apply(
        old, ins, dele, keys=["g"], sum_cols={"sum_total": "v"}
    )
    got = {r.g: (r.n_rows, r.sum_total) for r in out.collect()}
    # b vanished (count hit zero), d appeared, a and c maintained
    assert got == {"a": (3, 17), "c": (1, 10), "d": (1, 4)}


def test_ivm_agg_negative_count_raises(spark):
    import pytest

    from forklift_spark.patterns import ivm_agg_apply

    old = _ivm_view(spark, [("a", 1, 10)])
    ins = _ivm_delta(spark, [])
    dele = _ivm_delta(spark, [("a", 10), ("a", 10)])  # 2 deletes vs count 1
    with pytest.raises(ValueError, match="negative"):
        ivm_agg_apply(old, ins, dele, keys=["g"], sum_cols={"sum_total": "v"})


def test_ivm_agg_delete_of_unknown_group_raises(spark):
    import pytest

    from forklift_spark.patterns import ivm_agg_apply

    old = _ivm_view(spark, [("a", 1, 10)])
    dele = _ivm_delta(spark, [("zz", 1)])  # group the view never absorbed
    with pytest.raises(ValueError, match="never absorbed"):
        ivm_agg_apply(old, _ivm_delta(spark, []), dele, keys=["g"],
                      sum_cols={"sum_total": "v"})
