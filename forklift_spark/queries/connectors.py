"""Connector-surface queries: the §2.1/§2.2 components that were
pytest-only through round 2 (S1 JDBC, S7/S8 CSV, S9 dump, P1 pipe,
P2/P3 optimistic sync), each driven END-TO-END through real side-effect
I/O and verified against a DuckDB oracle over the same parquet inputs.

Unlike the dataflow-simulation queries in etl.py (which re-express the
upsert/HWM *plans*), these run the actual connection objects: rows
really leave Spark (CSV files, an embedded Derby database via JDBC, a
parquet warehouse with atomic staging swaps) and come back, so the
oracle match certifies the full write→read round trip — type fidelity
(decimal/int/date survival through text and JDBC), header handling,
append vs truncate, pushdown execution in the remote engine, and the
reference's late-row HWM semantics (`patterns/mysql_patterns.rb:95`:
rows whose matcher never advanced past the high-water mark are
silently NOT re-synced).

Scale notes: every round trip here is a distributed write + distributed
read (no driver-side data movement); Derby is in-memory single-JVM but
the Spark side of the JDBC exchange — partitioned parallel range scan,
pushdown subquery — is exactly the 1000-executor MySQL shape
(`transports/mysql.rb:28-53`).

Determinism: all slices are key-filtered (never LIMIT — row order is
not a contract), all aggregates are decimal-exact cast back to double,
and every run overwrites its scratch location, so re-runs are
idempotent in the driver's long-lived session.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from forklift_spark import tables
from forklift_spark.engine import Engine
from forklift_spark.functions.exact import MONEY, dec
from forklift_spark.queries import query

_QUIET = {"logger": {"stdout": False}}


def _engine(spark: SparkSession, root: str) -> Engine:
    return Engine({"project_root": root, **_QUIET}, spark=spark)


def _scratch(tag: str) -> str:
    # Fresh per-invocation scratch dir; results never depend on its name.
    return tempfile.mkdtemp(prefix=f"forklift_{tag}_")


# --------------------------------------------------------------------------
# S7 + S8: CSV sink (truncate then append) -> CSV scan (header +
# inferSchema), `transports/csv.rb:10-51`. The oracle certifies value
# fidelity through the text round trip: int/string/double survive, the
# append really appended, the truncate really truncated.
# --------------------------------------------------------------------------
CSV_ORACLE = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(p_size) AS BIGINT) AS sum_size,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_retail
FROM part
WHERE p_partkey % 3 IN (0, 1)
GROUP BY p_brand
"""


@query("q_csv_roundtrip", CSV_ORACLE)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.connections.csvfile import CsvConnection

    root = _scratch("csv")
    path = os.path.join(root, "part.csv")
    conn = CsvConnection({"file": path}, _engine(spark, root))
    part = tables.load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size", "p_retailprice"
    )
    # truncate establishes the file, append extends it (csv.rb:31-51)
    conn.write(part.filter(F.col("p_partkey") % 3 == 0), mode="truncate")
    conn.write(part.filter(F.col("p_partkey") % 3 == 1), mode="append")
    back = conn.read()  # header + inferSchema (csv.rb's converters: :all)
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("p_size").cast("bigint").alias("sum_size"),
        F.sum(dec("p_retailprice", MONEY)).cast("double").alias("sum_retail"),
    )


# --------------------------------------------------------------------------
# S1: JDBC scan — pushdown subquery (whole statement executes in the
# source DB) + partitioned parallel range scan, against embedded Derby
# (the jar ships with Spark). Replaces the reference's LIMIT/OFFSET
# pagination loop (`transports/mysql.rb:28-53`) with the scalable shape:
# numPartitions concurrent range reads. The oracle certifies the values
# survived Spark -> Derby DDL+insert -> Derby-side WHERE -> Spark.
# --------------------------------------------------------------------------
JDBC_ORACLE = """
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_sup,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal > 0.0
GROUP BY n_name
"""


@query("q_jdbc_roundtrip", JDBC_ORACLE)
def q_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.connections.jdbc import JdbcConnection

    eng = _engine(spark, _scratch("jdbc"))
    conn = JdbcConnection(
        {
            "url": "jdbc:derby:memory:forklift_connq;create=true",
            "driver": "org.apache.derby.jdbc.EmbeddedDriver",
        },
        eng,
    )
    sup = tables.load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    nat = tables.load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    conn.write(sup, "rt_supplier", mode="overwrite")
    conn.write(nat, "rt_nation", mode="overwrite")
    # pushdown subquery: the WHERE runs inside Derby (quoted identifiers —
    # Spark's JDBC writer creates case-sensitive column names)
    sup_back = conn.read(
        'SELECT "s_suppkey", "s_nationkey", "s_acctbal" FROM rt_supplier'
        ' WHERE "s_acctbal" > 0.0'
    )
    # partitioned parallel scan: 4 concurrent range reads on the key
    nat_back = conn.read("rt_nation", partition_column="n_nationkey", num_partitions=4)
    return (
        sup_back.join(F.broadcast(nat_back), sup_back.s_nationkey == nat_back.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_sup"),
            F.sum(dec("s_acctbal", MONEY)).cast("double").alias("total_bal"),
        )
    )


# --------------------------------------------------------------------------
# P1 + S9: pipe (atomic staging-swap copy, `patterns/mysql_patterns.rb:
# 28-43`) into a warehouse, then dump the whole endpoint to gzip'd CSV
# (`transports/mysql.rb:209-232`) and read the dump back. The oracle
# certifies the piped copies and the dump are faithful.
# --------------------------------------------------------------------------
DUMP_ORACLE = """
SELECT r_name,
       CAST(COUNT(*) AS BIGINT) AS n_nations,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


@query("q_dump_pipe_roundtrip", DUMP_ORACLE)
def q_dump_pipe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.connections.parquet import ParquetConnection
    from forklift_spark.patterns import pipe

    root = _scratch("dump")
    eng = _engine(spark, root)
    src = ParquetConnection({"path": os.path.join(root, "src")}, eng)
    wh = ParquetConnection({"path": os.path.join(root, "wh")}, eng)
    src.write(tables.load(spark, sf_dir, "region"), "region_t", mode="overwrite")
    src.write(tables.load(spark, sf_dir, "nation"), "nation_t", mode="overwrite")
    pipe(src, "region_t", wh, "region_copy")  # P1: copy with atomic publish
    pipe(src, "nation_t", wh, "nation_copy")
    dump_dir = os.path.join(root, "dump")
    dumped = wh.dump(dump_dir, fmt="csv")  # S9: one gzip csv dir per table
    assert sorted(dumped) == ["nation_copy", "region_copy"], dumped
    read_csv = lambda t: spark.read.csv(  # noqa: E731
        os.path.join(dump_dir, t), header=True, inferSchema=True
    )
    nat, reg = read_csv("nation_copy"), read_csv("region_copy")
    return (
        nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.sum("n_nationkey").cast("bigint").alias("key_sum"),
        )
    )


# --------------------------------------------------------------------------
# P2 + P3: optimistic_pipe end-to-end with the reference's exact HWM
# semantics (`patterns/mysql_patterns.rb:60-124`): after an initial full
# copy, source rows are mutated two ways — "fresh" updates whose matcher
# advances past the HWM (captured by the incremental sync) and "late"
# updates whose matcher did NOT advance (silently ignored — the
# reference's `WHERE matcher > hwm` drops them, equivalent to
# watermark-dropped late data). The oracle reproduces both behaviors;
# sync_path pins that the INCREMENTAL branch ran, not the full fallback.
# --------------------------------------------------------------------------
SYNC_ORACLE = """
WITH src AS (
  SELECT event_id, ts, value FROM events WHERE event_id < 2000
), dest0 AS (
  SELECT * FROM src WHERE ts < TIMESTAMP '2024-01-04'
), updated AS (
  SELECT event_id,
         CASE WHEN event_id % 97 = 0 THEN TIMESTAMP '2025-01-01' ELSE ts END AS ts,
         CASE WHEN event_id % 97 = 0 THEN value + 1000
              WHEN event_id % 89 = 0 THEN value + 5000
              ELSE value END AS value
  FROM src
), delta AS (
  SELECT * FROM updated WHERE ts > (SELECT MAX(ts) FROM dest0)
)
SELECT 'incremental' AS sync_path, event_id, ts, value FROM delta
UNION ALL
SELECT 'incremental' AS sync_path, d.event_id, d.ts, d.value
FROM dest0 d
WHERE d.event_id NOT IN (SELECT event_id FROM delta)
"""


@query("q_optimistic_sync", SYNC_ORACLE)
def q_optimistic_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.connections.parquet import ParquetConnection
    from forklift_spark.patterns import optimistic_pipe

    root = _scratch("sync")
    eng = _engine(spark, root)
    src = ParquetConnection({"path": os.path.join(root, "src")}, eng)
    dst = ParquetConnection({"path": os.path.join(root, "dst")}, eng)

    ev = (
        tables.load(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select("event_id", "ts", "value")
    )
    src.write(ev, "events_src", mode="overwrite")
    dst.write(
        ev.filter(F.col("ts") < F.lit("2024-01-04").cast("timestamp")),
        "events_dest",
        mode="overwrite",
    )
    # OLTP-style mutations on the source: fresh updates bump the matcher,
    # late updates (the % 89 branch) change the value but NOT the matcher.
    mutated = ev.select(
        "event_id",
        F.when(F.col("event_id") % 97 == 0, F.lit("2025-01-01").cast("timestamp"))
        .otherwise(F.col("ts"))
        .alias("ts"),
        F.when(F.col("event_id") % 97 == 0, F.col("value") + 1000)
        .when(F.col("event_id") % 89 == 0, F.col("value") + 5000)
        .otherwise(F.col("value"))
        .alias("value"),
    )
    src.write(mutated, "events_src", mode="overwrite")

    ran = optimistic_pipe(
        src, "events_src", dst, "events_dest", matcher="ts", primary_key="event_id"
    )
    return dst.read("events_dest").select(
        F.lit(ran).alias("sync_path"), "event_id", "ts", "value"
    )


# --------------------------------------------------------------------------
# U1 + U3: multi-statement SQL script transformation through the
# connection exec surface (`base/connection.rb:35-51`, script splitter
# `transports/mysql.rb:234-249`): DELIMITER redefinition honored,
# statements run one spark.sql at a time, unsupported DDL (CREATE
# INDEX) warn-and-skips instead of failing. The oracle recomputes the
# script's final view from the base table.
# --------------------------------------------------------------------------
SCRIPT_ORACLE = """
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_big,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
FROM orders WHERE o_totalprice > 100000 GROUP BY o_custkey
"""

_SCRIPT = """
CREATE OR REPLACE TEMPORARY VIEW fk_script_big_orders AS
SELECT o_orderkey, o_custkey, o_totalprice
FROM __fk_script_orders WHERE o_totalprice > 100000;
DELIMITER //
CREATE OR REPLACE TEMPORARY VIEW fk_script_big_by_cust AS
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_big,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
FROM fk_script_big_orders GROUP BY o_custkey//
CREATE INDEX fk_script_idx ON fk_script_big_by_cust (o_custkey)//
"""


@query("q_sql_script", SCRIPT_ORACLE)
def q_sql_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.connections.parquet import ParquetConnection

    root = _scratch("script")
    conn = ParquetConnection({"path": root}, _engine(spark, root))
    tables.load(spark, sf_dir, "orders").createOrReplaceTempView(
        "__fk_script_orders"
    )
    path = os.path.join(root, "transform.sql")
    with open(path, "w") as f:
        f.write(_SCRIPT)
    conn.exec_strict(path)  # U1 strict exec -> U3 script runner
    return spark.table("fk_script_big_by_cust")


# --------------------------------------------------------------------------
# S4 + S5: Elasticsearch round trip through the REST shim against the
# in-process fake ES (forklift_spark/testing.py) — the jar-less path the
# integration tests exercise, here driven as a catalog query: docs leave
# Spark via per-partition _bulk upsert-by-id over real sockets, a second
# write REPLACES part of them (upsert semantics — the oracle encodes the
# replacement), and the read back is a distributed sliced-scroll scan
# (4 slices, 50-doc pages => real paging). The result is materialized
# (localCheckpoint) before the endpoint shuts down, mirroring a consumer
# that persists what it read.
# --------------------------------------------------------------------------
ES_ORACLE = """
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN doc_id < 100 THEN n_chars + 1000000
                     ELSE n_chars END) AS BIGINT) AS sum_chars
FROM documents
WHERE doc_id < 400
GROUP BY lang, source
"""


@query("q_es_roundtrip", ES_ORACLE)
def q_es_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.connections.elasticsearch import ElasticsearchConnection
    from forklift_spark.testing import start_fake_es

    srv, port = start_fake_es()
    try:
        conn = ElasticsearchConnection(
            {"nodes": f"127.0.0.1:{port}"}, _engine(spark, _scratch("es"))
        )
        docs = (
            tables.load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 400)
            .select("doc_id", "lang", "source", "n_chars")
        )
        conn.write(docs, "docs_rt", primary_key="doc_id")
        # second write must UPSERT (replace by _id), not duplicate
        conn.write(
            docs.filter(F.col("doc_id") < 100).withColumn(
                "n_chars", F.col("n_chars") + 1000000
            ),
            "docs_rt",
            primary_key="doc_id",
        )
        back = conn.read("docs_rt", query={"match_all": {}}, slices=4, page_size=50)
        out = (
            back.groupBy("lang", "source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)  # materialize before shutdown
        )
        # S6: index drop — first delete succeeds, second reports missing
        assert conn.delete_index("docs_rt") is True
        assert conn.delete_index("docs_rt") is False
        return out
    finally:
        srv.shutdown()


# --------------------------------------------------------------------------
# S3 lazy-create AUTO_INCREMENT parity: the writer's auto_key path
# (`writer.py write(auto_key=...)`, reference `transports/mysql.rb:
# 112-121`) assigns a dense surrogate on first (lazy-create) write and
# CONTINUES past MAX(key) on append. zipWithIndex numbers rows in
# partition order, so the input is range-partitioned + sorted on
# event_id, making rid == ROW_NUMBER() OVER (ORDER BY event_id) across
# both batches — the second batch's ids must start at count(batch1)+1
# or the oracle breaks.
# --------------------------------------------------------------------------
AUTOKEY_ORACLE = """
SELECT event_id, ROW_NUMBER() OVER (ORDER BY event_id) AS rid
FROM events WHERE event_id < 1500
"""


@query("q_auto_increment_key", AUTOKEY_ORACLE)
def q_auto_increment_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.writer import ParquetTableWriter

    root = _scratch("autokey")
    writer = ParquetTableWriter(spark, os.path.join(root, "wh"))

    def ordered(lo: int, hi: int) -> DataFrame:
        return (
            tables.load(spark, sf_dir, "events")
            .filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
            .select("event_id")
            .repartitionByRange(4, "event_id")
            .sortWithinPartitions("event_id")
        )

    # lazy create assigns 1..N; append continues at MAX(rid)+1
    writer.write(ordered(0, 1000), "events_keyed", auto_key="rid", auto_key_mode="dense")
    writer.write(
        ordered(1000, 1500), "events_keyed", mode="append",
        auto_key="rid", auto_key_mode="dense",
    )
    return writer.read("events_keyed").select("event_id", "rid")


# --------------------------------------------------------------------------
# JSONL round trip (beyond reference — the canonical LLM corpus exchange
# format): documents written as gzip JSONL shards, read back with an
# explicit schema (the production path: no inference pass, malformed
# lines -> _corrupt_record instead of poisoned types), re-aggregated.
# Gzip shards parallelize at file granularity, so the write shards the
# corpus (repartition) before sinking.
# --------------------------------------------------------------------------
JSONL_ORACLE = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(length(text)) AS BIGINT) AS sum_len
FROM documents GROUP BY lang
"""


@query("q_jsonl_roundtrip", JSONL_ORACLE)
def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.connections.jsonl import JsonlConnection

    root = _scratch("jsonl")
    path = os.path.join(root, "docs.jsonl")
    conn = JsonlConnection(
        {"file": path, "compression": "gzip"}, _engine(spark, root)
    )
    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    conn.write(docs.repartition(4), mode="truncate")  # 4 gzip shards
    back = conn.read(schema=docs.schema)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.sum(F.length("text")).cast("bigint").alias("sum_len"),
    )


# --------------------------------------------------------------------------
# ORC round trip (beyond reference): same surface over the other
# columnar format — vectorized scan with predicate pushdown. The oracle
# certifies value fidelity through the ORC write/read.
# --------------------------------------------------------------------------
ORC_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
FROM lineitem WHERE l_quantity >= 25 GROUP BY l_returnflag
"""


@query("q_orc_roundtrip", ORC_ORACLE)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.connections.columnar import OrcConnection

    root = _scratch("orc")
    path = os.path.join(root, "lineitem_orc")
    conn = OrcConnection({"file": path}, _engine(spark, root))
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    conn.write(li, mode="truncate")
    back = conn.read().filter(F.col("l_quantity") >= 25)  # pushed to ORC scan
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("l_extendedprice", MONEY)).cast("double").alias("revenue"),
    )


# --------------------------------------------------------------------------
# Avro interchange through the PURE-PYTHON container codec
# (functions/avrocodec.py, public Avro 1.11 spec — the spark-avro
# datasource is not deployable in this image, so this is the executed
# branch; with the jar, engine="auto" prefers it). The write fans out
# one container file per partition and the read one task per file —
# both distributed. The oracle certifies fidelity of long / decimal /
# date / string values through the binary round trip: a wrong zigzag
# sign, a mis-scaled decimal, or an off-by-one date epoch breaks the
# hash. Reference analog: the CSV interchange surface this generalizes
# (`transports/csv.rb:10-51`).
# --------------------------------------------------------------------------
AVRO_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
       CAST(MIN(l_shipdate) AS DATE) AS first_ship,
       CAST(MAX(l_shipdate) AS DATE) AS last_ship
FROM lineitem WHERE l_quantity < 10 GROUP BY l_returnflag
"""


@query("q_avro_roundtrip", AVRO_ORACLE)
def q_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.connections.columnar import AvroConnection

    root = _scratch("avro")
    path = os.path.join(root, "lineitem_avro")
    conn = AvroConnection({"file": path}, _engine(spark, root))
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag",
        "l_shipdate",
    ).filter(F.col("l_quantity") < 10)  # roundtrip only the queried rows
    # pin the pure codec so the query executes the same branch with or
    # without the spark-avro module on the classpath
    conn.write(li.repartition(8), mode="truncate", engine="pure")
    back = conn.read(engine="pure")
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("l_extendedprice", MONEY)).cast("double").alias("revenue"),
        F.min("l_shipdate").cast("date").alias("first_ship"),
        F.max("l_shipdate").cast("date").alias("last_ship"),
    )


# --------------------------------------------------------------------------
# Hive-partitioned layout + dynamic partition overwrite (the 100 TB
# incremental pattern): the table is written partitioned by event_date,
# then ONE day is rewritten via overwrite_partitions (dynamic mode —
# only the touched partition is replaced, O(today) not O(table)), and
# the read back filters a date range so the scan prunes untouched days.
# The oracle encodes exactly one day's rows modified — an overwrite that
# clobbered other partitions, or a failed rewrite, breaks the hash.
# --------------------------------------------------------------------------
PARTITION_ORACLE = """
SELECT CAST(ts AS DATE) AS event_date,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-03'
                          THEN value + 500000 ELSE value END
                     AS DECIMAL(14,2))) AS DOUBLE) AS total
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-02' AND DATE '2024-01-05'
GROUP BY 1
"""


@query("q_partitioned_overwrite", PARTITION_ORACLE)
def q_partitioned_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.writer import ParquetTableWriter

    root = _scratch("hivepart")
    writer = ParquetTableWriter(spark, os.path.join(root, "wh"))
    ev = tables.load(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    writer.write(ev, "events_part", mode="overwrite", partition_by=["event_date"])
    day = ev.filter(
        F.col("event_date") == F.lit("2024-01-03").cast("date")
    ).withColumn("value", F.col("value") + 500000)
    writer.write(
        day, "events_part", mode="overwrite_partitions", partition_by=["event_date"]
    )
    back = writer.read("events_part").filter(
        F.col("event_date").between(
            F.lit("2024-01-02").cast("date"), F.lit("2024-01-05").cast("date")
        )
    )
    return back.groupBy("event_date").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value", MONEY)).cast("double").alias("total"),
    )


# --------------------------------------------------------------------------
# q_time_travel — snapshot retention through the REAL writer: publish
# generation 1 (pre-cut orders), OVERWRITE it with generation 2 (all
# orders, re-priced), then read the live table AND the retired
# generation back. Retiring a generation is one directory rename (no
# data rewrite), so at 100 TB the rollback/debug read costs only the
# retained storage. The oracle replays both generations from the source
# parquet, so the hash certifies that time travel returns EXACTLY the
# replaced bytes, not a re-derivation.
# --------------------------------------------------------------------------
_TT_CUT = "1996-01-01 00:00:00"

TIME_TRAVEL_ORACLE = f"""
WITH gen1 AS (
  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(14,2)) AS price
  FROM orders WHERE o_orderdate < TIMESTAMP '{_TT_CUT}'
), gen2 AS (
  SELECT o_orderkey,
    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 2 AS DECIMAL(14,2)) AS price
  FROM orders
)
SELECT 'current' AS generation, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(SUM(price) AS DOUBLE) AS total_price,
  CAST(min(o_orderkey) AS BIGINT) AS min_key
FROM gen2
UNION ALL
SELECT 'back1', CAST(count(*) AS BIGINT), CAST(SUM(price) AS DOUBLE),
  CAST(min(o_orderkey) AS BIGINT)
FROM gen1
"""


@query("q_time_travel", TIME_TRAVEL_ORACLE)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.writer import ParquetTableWriter

    orders = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey",
        dec("o_totalprice", "decimal(14,2)").alias("price"),
        "o_orderdate",
    )
    root = _scratch("timetravel")
    w = ParquetTableWriter(spark, root, retain_versions=2)
    gen1 = orders.filter(
        F.col("o_orderdate") < F.lit(_TT_CUT).cast("timestamp")
    ).select("o_orderkey", "price")
    w.write(gen1, "orders_tt", mode="overwrite")
    gen2 = orders.select(
        "o_orderkey", (F.col("price") * 2).cast("decimal(14,2)").alias("price")
    )
    w.write(gen2, "orders_tt", mode="overwrite")

    def summarize(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("price").cast("double").alias("total_price"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
        ).select(F.lit(label).alias("generation"), "n_rows", "total_price", "min_key")

    return summarize(w.read("orders_tt"), "current").unionByName(
        summarize(w.read_version("orders_tt", back=1), "back1")
    )


# --------------------------------------------------------------------------
# S1+S3 LIVE: a REAL PostgreSQL server (disposable, trust-auth, started
# once per process) spoken to over raw sockets by the pure-Python
# protocol-v3 client (connections/pgwire.py) — the one server connector
# whose live wire path runs in-image, end-to-end: batched INSERT sink,
# ON CONFLICT upsert (the reference's DELETE IN + INSERT,
# `transports/mysql.rb:82-87`, as PostgreSQL's native idempotent form),
# then a 4-slice partitioned parallel scan where each executor task
# opens its own connection. The oracle replays the upsert relationally;
# a hash match certifies both directions of the wire round trip.
# --------------------------------------------------------------------------
_PG_LIVE: dict = {}


def _pg_live_params() -> dict:
    if "params" not in _PG_LIVE:
        import atexit

        from forklift_spark.connections.pgwire import disposable_server

        params, stop = disposable_server()
        atexit.register(stop)
        _PG_LIVE["params"] = params
    return _PG_LIVE["params"]


PG_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
), delta AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(14,2)) + CAST(11 AS DECIMAL(14,2)) AS DOUBLE) AS o_totalprice
  FROM base WHERE o_orderkey % 13 = 0
), merged AS (
  SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delta)
  UNION ALL
  SELECT * FROM delta
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
FROM merged
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q_pg_roundtrip", PG_ORACLE)
def q_pg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.connections.pgwire import PostgresConnection

    eng = _engine(spark, _scratch("pg"))
    conn = PostgresConnection(dict(_pg_live_params()), eng, "pglive")
    base = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    conn.drop("rt_orders")  # idempotent across reruns in one process
    # initial load of the fresh table takes the bulk COPY path (the
    # production extract/load form — `transports/mysql.rb:209-232`'s
    # dump analog); the delta below still exercises ON CONFLICT upsert
    conn.write(base, "rt_orders", mode="append")
    delta = base.filter(F.col("o_orderkey") % 13 == 0).withColumn(
        "o_totalprice",
        (dec("o_totalprice", MONEY) + F.lit(11).cast(MONEY)).cast("double"),
    )
    conn.write(delta, "rt_orders", mode="upsert", primary_key="o_orderkey")
    back = conn.read(
        "rt_orders", partition_column="o_orderkey", num_partitions=4
    )
    assert back.rdd.getNumPartitions() == 4  # really a sliced parallel scan
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice", MONEY)).cast("double").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q_pg_copy_roundtrip — the COPY sub-protocol end to end against a LIVE
# server (r6): the bulk load streams COPY FROM STDIN per partition
# (framing hazards included — the priority strings carry spaces and the
# comment column injects tabs/newlines/backslashes), the read streams
# COPY (SELECT slice) TO STDOUT per executor task. The oracle replays
# the same projection relationally: one hash certifies the text-format
# codec (escape/unescape), the chunk reassembly, and the slice union
# against a real postgres.
# --------------------------------------------------------------------------
PG_COPY_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price,
       CAST(SUM(length(o_orderstatus)) AS BIGINT) AS status_chars
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q_pg_copy_roundtrip", PG_COPY_ORACLE)
def q_pg_copy_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.connections.pgwire import PostgresConnection

    eng = _engine(spark, _scratch("pgcopy"))
    conn = PostgresConnection(dict(_pg_live_params()), eng, "pglive")
    base = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        # framing hazards ride INSIDE the data: the COPY text codec must
        # escape/unescape tabs, newlines and backslashes byte-exactly
        F.concat(
            F.col("o_orderstatus"), F.lit("\t|\n|\\end")
        ).alias("o_status_hazard"),
    ).repartition(4)
    conn.drop("copy_orders")
    conn.write(base, "copy_orders", mode="append")  # COPY FROM STDIN
    back = conn.read(
        "copy_orders",
        partition_column="o_orderkey",
        num_partitions=4,
        use_copy=True,  # COPY (SELECT slice) TO STDOUT
    )
    assert back.rdd.getNumPartitions() == 4
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice", MONEY)).cast("double").alias("total_price"),
            (
                F.sum(F.length("o_status_hazard")).cast("bigint")
                - F.count(F.lit(1)) * F.lit(8)  # the 8 hazard chars per row
            ).alias("status_chars"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q_delta_read — Delta Lake PROTOCOL-v1 interop read (r6): a Delta
# transaction log is built BY HAND from the public PROTOCOL.md action
# shapes (the reader must work from the spec alone, against a log this
# engine didn't write), with lineitem partitioned by l_returnflag —
# commit 0 adds every partition, commit 1 REMOVES the 'R' partition's
# files (a delete a Delta writer would log). The connector replays
# add/remove, attaches partition values from the log (the data files
# do NOT contain l_returnflag), and the aggregate must equal the oracle
# computed straight off the source table WITHOUT the removed partition.
# Ignored commitInfo actions and the protocol check ride the same log.
# --------------------------------------------------------------------------
DELTA_READ_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
         AS sum_price
FROM lineitem
WHERE l_returnflag <> 'R'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q_delta_read", DELTA_READ_ORACLE)
def q_delta_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import json as _json
    import shutil

    from pyspark.sql import types as T

    from forklift_spark.connections.deltalite import DeltaLiteTable

    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    full_schema = T.StructType(
        [f for f in li.schema.fields if f.name != "l_returnflag"]
        + [T.StructField("l_returnflag", T.StringType())]
    )
    tdir = tempfile.mkdtemp(prefix="fk_delta_")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    flags = [r[0] for r in li.select("l_returnflag").distinct().collect()]
    adds = {}
    for flag in sorted(flags):
        part = li.filter(F.col("l_returnflag") == flag).drop("l_returnflag")
        stage = os.path.join(tdir, f"stage_{flag}")
        part.write.mode("overwrite").parquet(stage)
        for i, f in enumerate(sorted(glob.glob(os.path.join(stage, "part-*.parquet")))):
            rel = f"flag={flag}/f{i}.parquet"
            os.makedirs(os.path.join(tdir, f"flag={flag}"), exist_ok=True)
            shutil.move(f, os.path.join(tdir, rel))
            adds[rel] = flag
        shutil.rmtree(stage)
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write(_json.dumps(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        ) + "\n")
        fh.write(_json.dumps({"metaData": {
            "id": "fk-delta-read", "format": {"provider": "parquet",
                                              "options": {}},
            "schemaString": _json.dumps(full_schema.jsonValue()),
            "partitionColumns": ["l_returnflag"], "configuration": {},
            "createdTime": 1700000000000,
        }}) + "\n")
        for rel, flag in adds.items():
            fh.write(_json.dumps({"add": {
                "path": rel, "partitionValues": {"l_returnflag": flag},
                "size": 1, "modificationTime": 1700000000000,
                "dataChange": True,
            }}) + "\n")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write(_json.dumps({"commitInfo": {"operation": "DELETE"}}) + "\n")
        for rel, flag in adds.items():
            if flag == "R":
                fh.write(_json.dumps({"remove": {
                    "path": rel, "deletionTimestamp": 1700000001000,
                    "dataChange": True,
                }}) + "\n")
    got = DeltaLiteTable(spark, tdir).read()
    return (
        got.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint")
             .alias("sum_qty"),
            F.sum(dec("l_extendedprice", MONEY)).cast("double")
             .alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# q_delta_dv_read — Delta DELETION-VECTOR interop read (r7, VERDICT r6
# item 3): a minReaderVersion-3 table (readerFeatures=[deletionVectors])
# is built BY HAND — orders lands as plain parquet files, then each
# file's DV is computed from its ACTUAL physical row order (pyarrow
# footer read of o_orderkey) marking positions where
# o_orderkey % 13 = 5, serialized as a portable RoaringBitmapArray and
# stored alternately as an on-disk 'u' DV file (version byte +
# [size BE][bitmap][crc BE], z85-uuid path derivation) and an inline
# 'i' descriptor. The reader must decode both storage types, expand the
# bitmaps IN EXECUTORS, and anti-join on _metadata row position — a
# position/value confusion, a z85/roaring decode bug, or a dropped
# mask all break the hash against the oracle's predicate form.
# --------------------------------------------------------------------------
DELTA_DV_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
         AS sum_price
FROM orders
WHERE NOT (o_orderkey % 13 = 5)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("q_delta_dv_read", DELTA_DV_ORACLE)
def q_delta_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import json as _json
    import shutil
    import struct
    import uuid as _uuid
    import zlib

    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from forklift_spark.connections.deltalite import DeltaLiteTable
    from forklift_spark.functions.roaring import serialize_roaring64, z85_encode

    od = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    tdir = tempfile.mkdtemp(prefix="fk_delta_dv_")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    stage = os.path.join(tdir, "stage")
    od.repartition(4, "o_orderkey").write.mode("overwrite").parquet(stage)
    rels = []
    for i, f in enumerate(sorted(glob.glob(os.path.join(stage, "part-*.parquet")))):
        rel = f"f{i}.parquet"
        shutil.move(f, os.path.join(tdir, rel))
        rels.append(rel)
    shutil.rmtree(stage)

    adds = []
    for i, rel in enumerate(rels):
        # DV positions from the file's PHYSICAL row order (spec: row
        # indexes within the file) — computed off the written footer,
        # so plan-order nondeterminism cannot skew the mask
        keys = pq.read_table(
            os.path.join(tdir, rel), columns=["o_orderkey"]
        ).column(0).to_pylist()
        positions = [p for p, k in enumerate(keys) if k % 13 == 5]
        add = {"path": rel, "partitionValues": {}, "size": 1,
               "modificationTime": 1700000000000, "dataChange": True}
        if positions:
            data = serialize_roaring64(positions)
            if i % 2 == 0:  # on-disk 'u' storage
                u = _uuid.uuid4()
                with open(os.path.join(
                        tdir, f"deletion_vector_{u}.bin"), "wb") as fh:
                    fh.write(b"\x01")
                    fh.write(struct.pack(">i", len(data)))
                    fh.write(data)
                    fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
                add["deletionVector"] = {
                    "storageType": "u", "pathOrInlineDv": z85_encode(u.bytes),
                    "offset": 1, "sizeInBytes": len(data),
                    "cardinality": len(positions)}
            else:  # inline 'i' storage
                add["deletionVector"] = {
                    "storageType": "i", "pathOrInlineDv": z85_encode(data),
                    "sizeInBytes": len(data), "cardinality": len(positions)}
        adds.append(add)

    schema = T.StructType([
        T.StructField("o_orderkey", od.schema["o_orderkey"].dataType),
        T.StructField("o_totalprice", od.schema["o_totalprice"].dataType),
        T.StructField("o_orderstatus", T.StringType()),
    ])
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write(_json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"]}}) + "\n")
        fh.write(_json.dumps({"metaData": {
            "id": "fk-delta-dv-read", "format": {"provider": "parquet",
                                                 "options": {}},
            "schemaString": _json.dumps(schema.jsonValue()),
            "partitionColumns": [], "configuration": {},
            "createdTime": 1700000000000,
        }}) + "\n")
        for a in adds:
            fh.write(_json.dumps({"add": a}) + "\n")

    got = DeltaLiteTable(spark, tdir).read()
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(dec("o_totalprice", MONEY)).cast("double")
             .alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# q_delta_colmap_read — Delta COLUMN MAPPING interop read (r8): a
# minReaderVersion-2 table (delta.columnMapping.mode=name — what any
# Delta table that ever ran ALTER TABLE RENAME COLUMN uses) is built BY
# HAND from PROTOCOL.md's Column Mapping section: the parquet files
# carry PHYSICAL column names (col-ck / col-ab), partition values are
# keyed by the partition column's physical name (col-seg), and the
# LOGICAL schema (cust_id / balance / segment — renamed vs the source,
# as a rename is the feature's whole point) maps to them through
# delta.columnMapping.physicalName field metadata. Commit 1 removes one
# segment's files (replay still keys by the stable physical path). The
# reader must reconstruct the logical table: a physical/logical name
# confusion yields empty columns or a refused read; a pv keyed-by-
# logical lookup yields NULL partition values — all break the hash.
# --------------------------------------------------------------------------
DELTA_COLMAP_ORACLE = """
SELECT c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS sum_bal,
       CAST(MIN(c_custkey) AS BIGINT) AS min_cust
FROM customer
WHERE c_mktsegment <> 'MACHINERY'
GROUP BY c_mktsegment
ORDER BY segment
"""


@query("q_delta_colmap_read", DELTA_COLMAP_ORACLE)
def q_delta_colmap_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import json as _json
    import shutil

    from pyspark.sql import types as T

    from forklift_spark.connections.deltalite import DeltaLiteTable

    cu = tables.load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    tdir = tempfile.mkdtemp(prefix="fk_delta_cm_")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)
    segs = sorted(
        r[0] for r in cu.select("c_mktsegment").distinct().collect()
    )
    adds: dict[str, str] = {}
    for seg in segs:
        # data files under PHYSICAL names, partition column not stored
        part = (
            cu.filter(F.col("c_mktsegment") == seg)
            .select(F.col("c_custkey").alias("col-ck"),
                    F.col("c_acctbal").alias("col-ab"))
        )
        stage = os.path.join(tdir, f"stage_{seg}")
        part.write.mode("overwrite").parquet(stage)
        os.makedirs(os.path.join(tdir, f"seg={seg}"), exist_ok=True)
        for i, f in enumerate(sorted(
                glob.glob(os.path.join(stage, "part-*.parquet")))):
            rel = f"seg={seg}/f{i}.parquet"
            shutil.move(f, os.path.join(tdir, rel))
            adds[rel] = seg
        shutil.rmtree(stage)

    def _cm(name, dtype, phys, fid):
        return T.StructField(name, dtype, True, metadata={
            "delta.columnMapping.id": fid,
            "delta.columnMapping.physicalName": phys,
        })

    schema = T.StructType([
        _cm("cust_id", cu.schema["c_custkey"].dataType, "col-ck", 1),
        _cm("balance", cu.schema["c_acctbal"].dataType, "col-ab", 2),
        _cm("segment", T.StringType(), "col-seg", 3),
    ])
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write(_json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        fh.write(_json.dumps({"metaData": {
            "id": "fk-delta-colmap-read",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(schema.jsonValue()),
            "partitionColumns": ["segment"],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "3"},
            "createdTime": 1700000000000,
        }}) + "\n")
        for rel, seg in adds.items():
            fh.write(_json.dumps({"add": {
                "path": rel, "partitionValues": {"col-seg": seg},
                "size": 1, "modificationTime": 1700000000000,
                "dataChange": True,
            }}) + "\n")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write(_json.dumps(
            {"commitInfo": {"operation": "DELETE"}}) + "\n")
        for rel, seg in adds.items():
            if seg == "MACHINERY":
                fh.write(_json.dumps({"remove": {
                    "path": rel, "deletionTimestamp": 1700000001000,
                    "dataChange": True,
                }}) + "\n")

    got = DeltaLiteTable(spark, tdir).read()
    return (
        got.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(dec("balance", MONEY)).cast("double").alias("sum_bal"),
            F.min("cust_id").cast("bigint").alias("min_cust"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# q_delta_v2_checkpoint_read — Delta V2 SPEC CHECKPOINT interop read
# (r8): a reader-v3 table (readerFeatures=[v2Checkpoint]) whose only
# surviving state is a uuid-named parquet checkpoint MANIFEST
# (checkpointMetadata + protocol + metaData + sidecar pointers), two
# SIDECAR parquet files in _delta_log/_sidecars/ holding the add
# actions, and ONE json tail commit — every pre-checkpoint commit is
# gone (the retention situation v2 checkpoints exist for). The reader
# must chase manifest -> sidecars -> tail: a dropped sidecar, a missed
# tail commit, or trusting a stale checkpointMetadata.version all break
# the hash. The in-row flag certifies no pre-checkpoint JSON survived.
# --------------------------------------------------------------------------
DELTA_V2CKPT_ORACLE = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(14,2))) AS DOUBLE)
         AS sum_price,
       CAST(1 AS BIGINT) AS v2_manifest_only
FROM part
GROUP BY p_brand
ORDER BY p_brand
"""


@query("q_delta_v2_checkpoint_read", DELTA_V2CKPT_ORACLE)
def q_delta_v2_checkpoint_read(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    import glob
    import json as _json
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from forklift_spark.connections.deltalite import DeltaLiteTable

    pt = tables.load(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_brand"
    )
    tdir = tempfile.mkdtemp(prefix="fk_delta_v2ck_")
    log = os.path.join(tdir, "_delta_log")
    side = os.path.join(log, "_sidecars")
    os.makedirs(side)
    stage = os.path.join(tdir, "stage")
    pt.repartition(4, "p_partkey").write.mode("overwrite").parquet(stage)
    rels = []
    for i, f in enumerate(sorted(
            glob.glob(os.path.join(stage, "part-*.parquet")))):
        rel = f"f{i}.parquet"
        shutil.move(f, os.path.join(tdir, rel))
        rels.append(rel)
    shutil.rmtree(stage)

    schema = T.StructType([
        T.StructField("p_partkey", pt.schema["p_partkey"].dataType),
        T.StructField("p_retailprice",
                      pt.schema["p_retailprice"].dataType),
        T.StructField("p_brand", T.StringType()),
    ])
    str_map = pa.map_(pa.string(), pa.string())
    add_t = pa.struct([
        ("path", pa.string()), ("partitionValues", str_map),
        ("size", pa.int64()), ("modificationTime", pa.int64()),
        ("dataChange", pa.bool_()),
    ])

    def _adds(paths):
        return pa.array([
            {"path": p, "partitionValues": [], "size": 1,
             "modificationTime": 1700000000000, "dataChange": False}
            for p in paths
        ], add_t)

    # checkpoint at v1 covers all but the last file (two sidecars);
    # the last file arrives in the json TAIL commit v2
    ck_files, tail_file = rels[:-1], rels[-1]
    half = (len(ck_files) + 1) // 2
    for name, chunk in (("s1.parquet", ck_files[:half]),
                        ("s2.parquet", ck_files[half:])):
        pq.write_table(pa.table({"add": _adds(chunk)}),
                       os.path.join(side, name))

    proto_t = pa.struct([
        ("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32()),
        ("readerFeatures", pa.list_(pa.string())),
        ("writerFeatures", pa.list_(pa.string())),
    ])
    meta_t = pa.struct([
        ("id", pa.string()),
        ("format", pa.struct([("provider", pa.string()),
                              ("options", str_map)])),
        ("schemaString", pa.string()),
        ("partitionColumns", pa.list_(pa.string())),
        ("configuration", str_map),
        ("createdTime", pa.int64()),
    ])
    ck_t = pa.struct([("version", pa.int64()), ("tags", str_map)])
    sc_t = pa.struct([
        ("path", pa.string()), ("sizeInBytes", pa.int64()),
        ("modificationTime", pa.int64()),
    ])
    rows_ck = [{"version": 1, "tags": []}, None, None, None, None]
    rows_p = [None, {"minReaderVersion": 3, "minWriterVersion": 7,
                     "readerFeatures": ["v2Checkpoint"],
                     "writerFeatures": ["v2Checkpoint"]},
              None, None, None]
    rows_m = [None, None, {
        "id": "fk-delta-v2ck", "format": {"provider": "parquet",
                                          "options": []},
        "schemaString": _json.dumps(schema.jsonValue()),
        "partitionColumns": [], "configuration": [],
        "createdTime": 1700000000000}, None, None]
    rows_s = [None, None, None,
              {"path": "s1.parquet", "sizeInBytes": 1,
               "modificationTime": 1700000000000},
              {"path": "s2.parquet", "sizeInBytes": 1,
               "modificationTime": 1700000000000}]
    pq.write_table(pa.table({
        "checkpointMetadata": pa.array(rows_ck, ck_t),
        "protocol": pa.array(rows_p, proto_t),
        "metaData": pa.array(rows_m, meta_t),
        "sidecar": pa.array(rows_s, sc_t),
    }), os.path.join(
        log, f"{1:020d}.checkpoint."
             "b100df00-0d0e-4a2b-8c3d-4e5f60718293.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        _json.dump({"version": 1, "size": 5}, fh)
    with open(os.path.join(log, f"{2:020d}.json"), "w") as fh:
        fh.write(_json.dumps({"add": {
            "path": tail_file, "partitionValues": {}, "size": 1,
            "modificationTime": 1700000002000, "dataChange": True,
        }}) + "\n")

    ext = DeltaLiteTable(spark, tdir)
    v2_only = int(ext.versions() == [2])  # no pre-ckpt JSON exists
    return (
        ext.read()
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(dec("p_retailprice", MONEY)).cast("double")
             .alias("sum_price"),
            F.lit(v2_only).cast("bigint").alias("v2_manifest_only"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# q_delta_sync — INCREMENTAL lakehouse export (r7, VERDICT r6 item 4):
# the recurring-publish story (reference: the repeated pipe publish,
# patterns/mysql_patterns.rb:28-43) without re-snapshotting. A manifest
# table of orders is published to a Delta log (full first sync), then a
# merge updates a key slice and inserts new keys, then a SECOND sync
# appends ONE O(delta) commit. The external replay — our spec reader
# over the exported log only — must equal the post-merge oracle; the
# query also asserts in-row that the second sync was incremental and
# wrote fewer adds than the table has files (re-snapshot detection).
# --------------------------------------------------------------------------
DELTA_SYNC_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(
         CASE WHEN o_orderkey % 50 = 7 AND o_orderstatus = 'F'
              THEN 0.01 ELSE o_totalprice END
         AS DECIMAL(14,2))) AS DOUBLE) AS sum_price,
       CAST(1 AS BIGINT) AS sync_incremental
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("q_delta_sync", DELTA_SYNC_ORACLE)
def q_delta_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.connections.deltalite import (
        DeltaLiteTable,
        sync_manifest_to_delta,
    )
    from forklift_spark.manifest import ManifestTable

    od = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    root = tempfile.mkdtemp(prefix="fk_delta_sync_")
    t = ManifestTable(spark, os.path.join(root, "src"), "orders_pub")
    t.create(od, partition_by="o_orderstatus")
    dest = os.path.join(root, "pub")
    r1 = sync_manifest_to_delta(t, dest)

    # update a deterministic key slice in ONE partition (price -> 0.01)
    # so untouched partitions' files stay carried — the O(delta) claim
    upd = od.filter(
        (F.col("o_orderkey") % 50 == 7) & (F.col("o_orderstatus") == "F")
    ).withColumn(
        "o_totalprice", F.lit(0.01).cast(od.schema["o_totalprice"].dataType)
    )
    t.merge(upd, on="o_orderkey")
    r2 = sync_manifest_to_delta(t, dest)
    incremental = int(
        r1["mode"] == "full" and r2["mode"] == "incremental"
        and 0 < r2["added"] < len(t.manifest()["entries"])
    )
    got = DeltaLiteTable(spark, dest).read()
    out = (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(dec("o_totalprice", MONEY)).cast("double")
             .alias("sum_price"),
            F.lit(incremental).cast("bigint").alias("sync_incremental"),
        )
        .orderBy("o_orderstatus")
    )
    return out


# --------------------------------------------------------------------------
# q_iceberg_read — Apache Iceberg spec-v2 interop read (r6 continuation):
# table metadata is built BY HAND from the public spec shapes
# (metadata.json + Avro manifest list + Avro manifests via the
# pure-Python codec — the reader must work from the spec alone, against
# metadata this engine didn't write). Data files land at sequence 1;
# an EQUALITY delete file (equality_ids=[l_orderkey]) lands at
# sequence 2 removing l_orderkey % 97 = 3; a POSITION delete file at
# sequence 3 removes the (file, row_index) pairs where l_quantity >= 45.
# The aggregate must equal the oracle computed straight off the source
# table minus BOTH delete predicates — a missed sequence-number rule, a
# broken row_index join, or a non-null-safe equality match all break
# the hash.
# --------------------------------------------------------------------------
ICEBERG_READ_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
         AS sum_price
FROM lineitem
WHERE NOT (l_quantity >= 45) AND NOT (l_orderkey % 97 = 3)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q_iceberg_read", ICEBERG_READ_ORACLE)
def q_iceberg_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import json as _json

    from forklift_spark.connections.iceberglite import (
        MANIFEST_ENTRY_SCHEMA,
        MANIFEST_FILE_SCHEMA,
        IcebergLiteTable,
    )
    from forklift_spark.functions import avrocodec as av

    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    tdir = tempfile.mkdtemp(prefix="fk_iceberg_")
    meta_dir = os.path.join(tdir, "metadata")
    data_dir = os.path.join(tdir, "data")
    os.makedirs(meta_dir)
    li.repartition(4).write.mode("overwrite").parquet(data_dir)
    data_files = sorted(glob.glob(os.path.join(data_dir, "part-*.parquet")))

    # position-delete file: (file_path, pos) pairs for l_quantity >= 45,
    # derived from the same _metadata columns the reader joins on
    staged = spark.read.parquet(data_dir).select(
        F.col("_metadata.file_path").alias("file_path"),
        F.col("_metadata.row_index").alias("pos"),
        "l_quantity",
    ).filter(F.col("l_quantity") >= 45).drop("l_quantity")
    pos_stage = os.path.join(tdir, "pos_stage")
    staged.coalesce(1).write.mode("overwrite").parquet(pos_stage)
    pos_file = os.path.join(tdir, "pos_delete.parquet")
    os.replace(glob.glob(os.path.join(pos_stage, "part-*.parquet"))[0],
               pos_file)

    # equality-delete file: the key VALUES to remove (field id 1)
    eq_stage = os.path.join(tdir, "eq_stage")
    li.filter(F.col("l_orderkey") % 97 == 3).select(
        "l_orderkey").distinct().coalesce(1).write.mode(
        "overwrite").parquet(eq_stage)
    eq_file = os.path.join(tdir, "eq_delete.parquet")
    os.replace(glob.glob(os.path.join(eq_stage, "part-*.parquet"))[0],
               eq_file)

    def entry(path, *, content=0, seq=None, eq_ids=None):
        return {"status": 1, "snapshot_id": 7, "sequence_number": seq,
                "data_file": {
                    "content": content, "file_path": path,
                    "file_format": "PARQUET", "partition": {},
                    "record_count": 0,
                    "file_size_in_bytes": os.path.getsize(path),
                    "equality_ids": eq_ids}}

    m_data = os.path.join(meta_dir, "m-data.avro")
    av.write_container_file(
        m_data, _json.dumps(MANIFEST_ENTRY_SCHEMA),
        [entry(p, seq=1) for p in data_files])
    m_eq = os.path.join(meta_dir, "m-eq.avro")
    av.write_container_file(
        m_eq, _json.dumps(MANIFEST_ENTRY_SCHEMA),
        [entry(eq_file, content=2, seq=2, eq_ids=[1])])
    m_pos = os.path.join(meta_dir, "m-pos.avro")
    av.write_container_file(
        m_pos, _json.dumps(MANIFEST_ENTRY_SCHEMA),
        [entry(pos_file, content=1, seq=3)])
    mlist = os.path.join(meta_dir, "snap-7.avro")
    av.write_container_file(
        mlist, _json.dumps(MANIFEST_FILE_SCHEMA),
        [{"manifest_path": m, "manifest_length": os.path.getsize(m),
          "partition_spec_id": 0, "content": c, "sequence_number": s,
          "min_sequence_number": s, "added_snapshot_id": 7}
         for m, c, s in [(m_data, 0, 1), (m_eq, 1, 2), (m_pos, 1, 3)]])
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        _json.dump({
            "format-version": 2, "table-uuid": "fk-iceberg-read",
            "location": tdir, "last-sequence-number": 3,
            "last-updated-ms": 1700000000000, "last-column-id": 4,
            "current-schema-id": 0,
            "schemas": [{"type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "l_orderkey", "required": False,
                 "type": "long"},
                {"id": 2, "name": "l_quantity", "required": False,
                 "type": "double"},
                {"id": 3, "name": "l_extendedprice", "required": False,
                 "type": "double"},
                {"id": 4, "name": "l_returnflag", "required": False,
                 "type": "string"},
            ]}],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "current-snapshot-id": 7,
            "snapshots": [{"snapshot-id": 7, "sequence-number": 3,
                           "timestamp-ms": 1700000000000,
                           "manifest-list": mlist,
                           "summary": {"operation": "overwrite"},
                           "schema-id": 0}],
        }, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    got = IcebergLiteTable(spark, tdir).read()
    return (
        got.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint")
             .alias("sum_qty"),
            F.sum(dec("l_extendedprice", MONEY)).cast("double")
             .alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# q_iceberg_changes — incremental snapshot-diff consumption: snapshot 1
# holds events BEFORE 2024-01-15, snapshot 2 appends the rest; the
# changes(snap1) feed must return EXACTLY the appended rows (O(new
# files) scan, never a base-table re-read) — the snapshot-id-cursor
# form of the reference's read_since contract (S2,
# `transports/mysql.rb:149-158`). The oracle is the source table
# filtered to the appended half; leakage of any old-file row (or a
# missed new file) breaks the hash.
# --------------------------------------------------------------------------
ICEBERG_CHANGES_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_sum,
       CAST(MIN(ts) AS TIMESTAMP) AS first_ts
FROM events
WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
GROUP BY event_type
ORDER BY event_type
"""


@query("q_iceberg_changes", ICEBERG_CHANGES_ORACLE)
def q_iceberg_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import json as _json

    from forklift_spark.connections.iceberglite import (
        MANIFEST_ENTRY_SCHEMA,
        MANIFEST_FILE_SCHEMA,
        IcebergLiteConnection,
    )
    from forklift_spark.functions import avrocodec as av

    ev = tables.load(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    cut = "2024-01-15 00:00:00"
    root = tempfile.mkdtemp(prefix="fk_iceberg_chg_")
    tdir = os.path.join(root, "events_ice")
    meta_dir = os.path.join(tdir, "metadata")
    os.makedirs(meta_dir)

    def _write_files(df, sub):
        d = os.path.join(tdir, sub)
        df.repartition(2).write.mode("overwrite").parquet(d)
        return sorted(glob.glob(os.path.join(d, "part-*.parquet")))

    old_files = _write_files(ev.filter(F.col("ts") < cut), "data_old")
    new_files = _write_files(ev.filter(F.col("ts") >= cut), "data_new")

    def entry(path, seq):
        return {"status": 1, "snapshot_id": seq, "sequence_number": seq,
                "data_file": {
                    "content": 0, "file_path": path,
                    "file_format": "PARQUET", "partition": {},
                    "record_count": 0,
                    "file_size_in_bytes": os.path.getsize(path),
                    "equality_ids": None}}

    m1 = os.path.join(meta_dir, "m1.avro")
    av.write_container_file(m1, _json.dumps(MANIFEST_ENTRY_SCHEMA),
                            [entry(p, 1) for p in old_files])
    m2 = os.path.join(meta_dir, "m2.avro")
    av.write_container_file(m2, _json.dumps(MANIFEST_ENTRY_SCHEMA),
                            [entry(p, 2) for p in new_files])

    def mlist(name, manifests):
        p = os.path.join(meta_dir, name)
        av.write_container_file(
            p, _json.dumps(MANIFEST_FILE_SCHEMA),
            [{"manifest_path": m, "manifest_length": os.path.getsize(m),
              "partition_spec_id": 0, "content": 0, "sequence_number": s,
              "min_sequence_number": s, "added_snapshot_id": s}
             for m, s in manifests])
        return p

    l1 = mlist("snap-1.avro", [(m1, 1)])
    l2 = mlist("snap-2.avro", [(m1, 1), (m2, 2)])
    snaps = [
        {"snapshot-id": 1, "sequence-number": 1, "timestamp-ms": 1,
         "manifest-list": l1, "summary": {"operation": "append"},
         "schema-id": 0},
        {"snapshot-id": 2, "sequence-number": 2, "timestamp-ms": 2,
         "manifest-list": l2, "summary": {"operation": "append"},
         "schema-id": 0},
    ]
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        _json.dump({
            "format-version": 2, "table-uuid": "fk-iceberg-changes",
            "location": tdir, "last-sequence-number": 2,
            "last-updated-ms": 2, "last-column-id": 4,
            "current-schema-id": 0,
            "schemas": [{"type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "event_id", "required": False,
                 "type": "long"},
                {"id": 2, "name": "ts", "required": False,
                 "type": "timestamp"},
                {"id": 3, "name": "event_type", "required": False,
                 "type": "string"},
                {"id": 4, "name": "value", "required": False,
                 "type": "double"},
            ]}],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "current-snapshot-id": 2, "snapshots": snaps,
        }, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    conn = IcebergLiteConnection({"path": root}, spark, "ice")
    delta = conn.changes("events_ice", from_snapshot_id=1)
    return (
        delta.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("event_id").cast("bigint").alias("id_sum"),
            F.min("ts").alias("first_ts"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q_delta_checkpoint_read — bounded external replay for a long-lived
# Delta publisher (r8, VERDICT r7 item 2 continuation): a dv-masked
# manifest table is synced with dv_mode='native', a spec parquet
# CHECKPOINT is written, every pre-checkpoint JSON commit is then
# CLEANED (the Delta retention job), and one more tail commit lands.
# The external replay — our spec reader over checkpoint + tail only —
# must equal the post-merge oracle: a checkpoint that lost the DV
# descriptors, mangled the partition values, or skipped the tail commit
# breaks the hash. The in-row flag certifies the replay really had no
# pre-checkpoint JSON to lean on.
# --------------------------------------------------------------------------
DELTA_CHECKPOINT_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(
         CASE WHEN o_orderkey % 63 = 11 AND o_orderstatus = 'F'
              THEN 0.03
              WHEN o_orderkey % 71 = 5 AND o_orderstatus = 'O'
              THEN 0.02
              ELSE o_totalprice END
         AS DECIMAL(14,2))) AS DOUBLE) AS sum_price,
       CAST(1 AS BIGINT) AS checkpoint_only_replay
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("q_delta_checkpoint_read", DELTA_CHECKPOINT_ORACLE)
def q_delta_checkpoint_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob

    from forklift_spark.connections.deltalite import (
        DeltaLiteTable,
        checkpoint_delta_export,
        sync_manifest_to_delta,
    )
    from forklift_spark.manifest import ManifestTable

    od = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    root = tempfile.mkdtemp(prefix="fk_delta_ckpt_")
    t = ManifestTable(spark, os.path.join(root, "src"), "orders_ckpt")
    t.create(od, partition_by="o_orderstatus")
    dest = os.path.join(root, "pub")
    sync_manifest_to_delta(t, dest)                       # version 0

    # dv merge: masked rows + a fresh file, exported as REAL Delta DVs
    price_t = od.schema["o_totalprice"].dataType
    upd1 = od.filter(
        (F.col("o_orderkey") % 71 == 5) & (F.col("o_orderstatus") == "O")
    ).withColumn("o_totalprice", F.lit(0.02).cast(price_t))
    t.merge(upd1, on="o_orderkey", use_dv=True)
    sync_manifest_to_delta(t, dest, dv_mode="native")     # version 1

    checkpoint_delta_export(spark, dest)                  # ckpt @ 1
    log = os.path.join(dest, "_delta_log")
    for v in (0, 1):  # the Delta retention job: pre-ckpt JSON cleaned
        os.remove(os.path.join(log, f"{v:020d}.json"))

    upd2 = od.filter(
        (F.col("o_orderkey") % 63 == 11) & (F.col("o_orderstatus") == "F")
    ).withColumn("o_totalprice", F.lit(0.03).cast(price_t))
    t.merge(upd2, on="o_orderkey")
    sync_manifest_to_delta(t, dest, dv_mode="native")     # tail: v2

    ext = DeltaLiteTable(spark, dest)
    ckpt_only = int(
        bool(_glob.glob(os.path.join(log, "*.checkpoint.parquet")))
        and ext.versions() == [2]  # only the tail commit remains as JSON
    )
    return (
        ext.read()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(dec("o_totalprice", MONEY)).cast("double")
             .alias("sum_price"),
            F.lit(ckpt_only).cast("bigint")
             .alias("checkpoint_only_replay"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# q_iceberg_expire_read — snapshot expiry for a long-lived Iceberg
# publisher (r8): four published snapshots, then
# expire_iceberg_export_snapshots(keep_last=2). The current-state read
# must still equal the post-merge oracle (reused manifests retained by
# the kept snapshots must survive the expiry deletes), the in-row flag
# certifies 2 snapshots were expired AND time travel to the expired
# first snapshot now refuses loudly. Merge precedence is
# latest-wins, so the oracle CASE checks the latest slice first.
# --------------------------------------------------------------------------
ICEBERG_EXPIRE_ORACLE = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(
         CASE WHEN c_custkey % 31 = 7 THEN 3.33
              WHEN c_custkey % 37 = 5 THEN 2.22
              WHEN c_custkey % 41 = 3 THEN 1.11
              ELSE c_acctbal END
         AS DECIMAL(14,2))) AS DOUBLE) AS sum_bal,
       CAST(1 AS BIGINT) AS expiry_enforced
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("q_iceberg_expire_read", ICEBERG_EXPIRE_ORACLE)
def q_iceberg_expire_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.connections.iceberglite import (
        IcebergLiteTable,
        expire_iceberg_export_snapshots,
        sync_manifest_to_iceberg,
    )
    from forklift_spark.manifest import ManifestTable

    cu = tables.load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    root = tempfile.mkdtemp(prefix="fk_ice_expire_")
    t = ManifestTable(spark, os.path.join(root, "src"), "cust_pub")
    t.create(cu, partition_by="c_mktsegment")
    dest = os.path.join(root, "pub")
    sync_manifest_to_iceberg(t, dest)                     # snapshot 1

    bal_t = cu.schema["c_acctbal"].dataType
    for mod, rem, val in ((41, 3, 1.11), (37, 5, 2.22), (31, 7, 3.33)):
        upd = cu.filter(F.col("c_custkey") % mod == rem).withColumn(
            "c_acctbal", F.lit(val).cast(bal_t))
        t.merge(upd, on="c_custkey")                      # snaps 2..4
        sync_manifest_to_iceberg(t, dest)

    res = expire_iceberg_export_snapshots(spark, dest, keep_last=2)
    refused = 0
    try:
        IcebergLiteTable(spark, dest).read(snapshot_id=1)
    except ValueError:
        refused = 1
    enforced = int(res["expired"] == 2 and refused == 1)
    return (
        IcebergLiteTable(spark, dest).read()
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(dec("c_acctbal", MONEY)).cast("double").alias("sum_bal"),
            F.lit(enforced).cast("bigint").alias("expiry_enforced"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# q_delta_typewiden_read — Delta TYPE WIDENING interop read (r8): a
# minReaderVersion-3 table (readerFeatures=[typeWidening]) built BY
# HAND from PROTOCOL.md's Type Widening section. Commit 0 lands part
# rows with p_partkey % 3 = 0 under the NARROW schema (pk int,
# sz int, price decimal(10,2)); commit 1 widens the metaData (pk
# bigint, sz double, price decimal(16,4), delta.typeChanges recorded)
# and lands the remaining rows as genuinely-wide parquet. The reader
# must surface BOTH file generations under the widened schema —
# promoting the narrow physical values inside the vectorized scan. A
# reader that pins the old schema, refuses the feature, or re-reads
# narrow files under their own footer schema breaks the union/hash.
# --------------------------------------------------------------------------
DELTA_TYPEWIDEN_ORACLE = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(CAST(p_retailprice AS DECIMAL(10,2))
                     AS DECIMAL(16,4))) AS DOUBLE) AS sum_price,
       CAST(SUM(CAST(p_size AS DOUBLE)) AS DOUBLE) AS sum_size,
       CAST(MIN(p_partkey) AS BIGINT) AS min_pk
FROM part
GROUP BY p_brand
ORDER BY p_brand
"""


@query("q_delta_typewiden_read", DELTA_TYPEWIDEN_ORACLE)
def q_delta_typewiden_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import json as _json
    import shutil

    from pyspark.sql import types as T

    from forklift_spark.connections.deltalite import DeltaLiteTable

    pt = tables.load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size", "p_retailprice"
    )
    tdir = tempfile.mkdtemp(prefix="fk_delta_tw_")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)

    def _land(df, prefix: str) -> list[str]:
        stage = os.path.join(tdir, f"stage_{prefix}")
        df.write.mode("overwrite").parquet(stage)
        rels = []
        for i, f in enumerate(sorted(
                glob.glob(os.path.join(stage, "part-*.parquet")))):
            rel = f"{prefix}-{i}.parquet"
            shutil.move(f, os.path.join(tdir, rel))
            rels.append(rel)
        shutil.rmtree(stage)
        return rels

    # both generations cast price through DECIMAL(10,2) first so the
    # value (not just the type) is identical to the oracle's CASE-free
    # double->decimal rounding
    narrow = pt.filter(F.col("p_partkey") % 3 == 0).select(
        F.col("p_partkey").cast("int").alias("pk"),
        F.col("p_brand").alias("brand"),
        F.col("p_size").cast("int").alias("sz"),
        F.col("p_retailprice").cast("decimal(10,2)").alias("price"),
    )
    wide = pt.filter(F.col("p_partkey") % 3 != 0).select(
        F.col("p_partkey").alias("pk"),
        F.col("p_brand").alias("brand"),
        F.col("p_size").cast("double").alias("sz"),
        F.col("p_retailprice").cast("decimal(10,2)")
         .cast("decimal(16,4)").alias("price"),
    )
    narrow_rels = _land(narrow, "narrow")
    wide_rels = _land(wide, "wide")

    narrow_schema = T.StructType([
        T.StructField("pk", T.IntegerType()),
        T.StructField("brand", T.StringType()),
        T.StructField("sz", T.IntegerType()),
        T.StructField("price", T.DecimalType(10, 2)),
    ])

    def _widened(name, dtype, from_t, to_t):
        return T.StructField(name, dtype, True, metadata={
            "delta.typeChanges": [
                {"fromType": from_t, "toType": to_t, "tableVersion": 1}
            ]})

    wide_schema = T.StructType([
        _widened("pk", T.LongType(), "integer", "long"),
        T.StructField("brand", T.StringType()),
        _widened("sz", T.DoubleType(), "integer", "double"),
        _widened("price", T.DecimalType(16, 4), "decimal(10,2)",
                 "decimal(16,4)"),
    ])

    def _meta(schema):
        return {"metaData": {
            "id": "fk-delta-typewiden-read",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(schema.jsonValue()),
            "partitionColumns": [], "configuration": {},
            "createdTime": 1700000000000,
        }}

    def _add(rel):
        return {"add": {"path": rel, "partitionValues": {}, "size": 1,
                        "modificationTime": 1700000000000,
                        "dataChange": True}}

    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write(_json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["typeWidening"],
            "writerFeatures": ["typeWidening"]}}) + "\n")
        fh.write(_json.dumps(_meta(narrow_schema)) + "\n")
        for rel in narrow_rels:
            fh.write(_json.dumps(_add(rel)) + "\n")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write(_json.dumps(_meta(wide_schema)) + "\n")
        for rel in wide_rels:
            fh.write(_json.dumps(_add(rel)) + "\n")

    got = DeltaLiteTable(spark, tdir).read()
    return (
        got.groupBy(F.col("brand").alias("p_brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("price").cast("decimal(16,4)")).cast("double")
             .alias("sum_price"),
            F.sum("sz").cast("double").alias("sum_size"),
            F.min("pk").cast("bigint").alias("min_pk"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# q_delta_cdf_read — Delta CHANGE DATA FEED interop read (r8): a table
# with delta.enableChangeDataFeed is built BY HAND from PROTOCOL.md's
# Change Data Files section. v0 inserts the o_orderkey%4<2 slice of
# orders; v1 is an UPDATE commit whose cdc actions carry hand-written
# _change_data parquet (pre+post images doubling o_totalprice where
# o_orderkey%10=3) NEXT TO a trap remove/add pair the reader must
# ignore (consuming both double-counts every base row); v2 appends the
# %4=2 and %4=3 slices as separate files with no cdc (synthesized
# inserts); v3 removes the %4=3 file set (synthesized deletes). The
# oracle reconstructs all four (version, change_type) groups straight
# from orders — a double-count, a missed synthesis, or a pre/post
# confusion all break the hash.
# --------------------------------------------------------------------------
DELTA_CDF_ORACLE = """
WITH upd AS (
  SELECT * FROM orders WHERE o_orderkey % 4 < 2 AND o_orderkey % 10 = 3
), app2 AS (SELECT * FROM orders WHERE o_orderkey % 4 = 2),
   app3 AS (SELECT * FROM orders WHERE o_orderkey % 4 = 3)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS commit_version,
         'update_preimage' AS change_type,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
           AS sum_price,
         CAST(MIN(o_orderkey) AS BIGINT) AS min_key
  FROM upd
  UNION ALL
  SELECT CAST(1 AS BIGINT), 'update_postimage',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CAST(o_totalprice * 2 AS DECIMAL(14,2))) AS DOUBLE),
         CAST(MIN(o_orderkey) AS BIGINT)
  FROM upd
  UNION ALL
  SELECT CAST(2 AS BIGINT), 'insert', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE),
         CAST(MIN(o_orderkey) AS BIGINT)
  FROM (SELECT * FROM app2 UNION ALL SELECT * FROM app3)
  UNION ALL
  SELECT CAST(3 AS BIGINT), 'delete', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE),
         CAST(MIN(o_orderkey) AS BIGINT)
  FROM app3
)
ORDER BY commit_version, change_type
"""


@query("q_delta_cdf_read", DELTA_CDF_ORACLE)
def q_delta_cdf_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import json as _json
    import shutil

    from pyspark.sql import types as T

    from forklift_spark.connections.deltalite import DeltaLiteTable

    od = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    tdir = tempfile.mkdtemp(prefix="fk_delta_cdf_")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)

    def _land(df, prefix: str) -> list[str]:
        stage = os.path.join(tdir, f"stage_{prefix}")
        df.write.mode("overwrite").parquet(stage)
        rels = []
        for i, f in enumerate(sorted(
                glob.glob(os.path.join(stage, "part-*.parquet")))):
            rel = f"{prefix}-{i}.parquet"
            d = os.path.join(tdir, rel)
            os.makedirs(os.path.dirname(d), exist_ok=True)
            shutil.move(f, d)
            rels.append(rel)
        shutil.rmtree(stage)
        return rels

    schema = T.StructType([
        T.StructField("o_orderkey", od.schema["o_orderkey"].dataType),
        T.StructField("o_totalprice",
                      od.schema["o_totalprice"].dataType),
    ])

    def _add(rel, data_change=True):
        return {"add": {"path": rel, "partitionValues": {}, "size": 1,
                        "modificationTime": 1700000000000,
                        "dataChange": data_change}}

    base = od.filter(F.col("o_orderkey") % 4 < 2)
    upd_pred = F.col("o_orderkey") % 10 == 3
    base_rels = _land(base, "base")
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write(_json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 4}}) + "\n")
        fh.write(_json.dumps({"metaData": {
            "id": "fk-delta-cdf-read",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(schema.jsonValue()),
            "partitionColumns": [],
            "configuration": {"delta.enableChangeDataFeed": "true"},
            "createdTime": 1700000000000,
        }}) + "\n")
        for rel in base_rels:
            fh.write(_json.dumps(_add(rel)) + "\n")
        fh.write(_json.dumps({"commitInfo": {
            "timestamp": 1700000000000, "operation": "WRITE"}}) + "\n")

    # v1: UPDATE — cdc pre/post images; the rewritten base (post-update
    # content) lands as the trap remove/add pair cdc readers must skip
    pre = base.filter(upd_pred).withColumn(
        "_change_type", F.lit("update_preimage"))
    post = base.filter(upd_pred).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2).withColumn(
        "_change_type", F.lit("update_postimage"))
    cdc_rels = _land(pre.unionByName(post), "_change_data/cdc")
    upd_rels = _land(
        base.withColumn(
            "o_totalprice",
            F.when(upd_pred, F.col("o_totalprice") * 2)
             .otherwise(F.col("o_totalprice"))), "upd")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        for rel in cdc_rels:
            fh.write(_json.dumps({"cdc": {
                "path": rel, "partitionValues": {}, "size": 1,
                "dataChange": False}}) + "\n")
        for rel in base_rels:
            fh.write(_json.dumps({"remove": {
                "path": rel, "deletionTimestamp": 1700000001000,
                "dataChange": True}}) + "\n")
        for rel in upd_rels:
            fh.write(_json.dumps(_add(rel)) + "\n")
        fh.write(_json.dumps({"commitInfo": {
            "timestamp": 1700000001000, "operation": "UPDATE"}}) + "\n")

    # v2: plain append, two deterministic file sets (no cdc)
    app2_rels = _land(od.filter(F.col("o_orderkey") % 4 == 2), "app2")
    app3_rels = _land(od.filter(F.col("o_orderkey") % 4 == 3), "app3")
    with open(os.path.join(log, f"{2:020d}.json"), "w") as fh:
        for rel in app2_rels + app3_rels:
            fh.write(_json.dumps(_add(rel)) + "\n")
        fh.write(_json.dumps({"commitInfo": {
            "timestamp": 1700000002000, "operation": "WRITE"}}) + "\n")

    # v3: DELETE the %4=3 file set (no cdc -> synthesized deletes)
    with open(os.path.join(log, f"{3:020d}.json"), "w") as fh:
        for rel in app3_rels:
            fh.write(_json.dumps({"remove": {
                "path": rel, "deletionTimestamp": 1700000003000,
                "dataChange": True}}) + "\n")
        fh.write(_json.dumps({"commitInfo": {
            "timestamp": 1700000003000, "operation": "DELETE"}}) + "\n")

    feed = DeltaLiteTable(spark, tdir).change_feed(0)
    return (
        feed.groupBy(
            F.col("_commit_version").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(dec("o_totalprice", MONEY)).cast("double")
             .alias("sum_price"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
        )
        .orderBy("commit_version", "change_type")
    )


# --------------------------------------------------------------------------
# q_delta_stats_prune_read — Delta STATS-BASED FILE SKIPPING (r8): a
# log whose add actions carry the spec's per-file stats JSON
# (numRecords/minValues/maxValues off the real parquet footers) is
# read with read(where={p_partkey: (lo, hi)}). The reader must skip
# the non-intersecting files at PLAN time (the in-row flag asserts
# files_planned < files_total off last_read_stats) while the residual
# row filter keeps the result exact — a pruner that drops a matching
# file, or bounds compared under the wrong type, breaks the hash
# against the oracle's plain-predicate form.
# --------------------------------------------------------------------------
DELTA_STATS_PRUNE_ORACLE = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(14,2))) AS DOUBLE)
         AS sum_price,
       CAST(MIN(p_partkey) AS BIGINT) AS min_pk,
       CAST(MAX(p_partkey) AS BIGINT) AS max_pk,
       CAST(1 AS BIGINT) AS pruned_at_plan_time
FROM part
WHERE p_partkey >= 301 AND p_partkey <= 1100
GROUP BY p_brand
ORDER BY p_brand
"""


@query("q_delta_stats_prune_read", DELTA_STATS_PRUNE_ORACLE)
def q_delta_stats_prune_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import json as _json
    import shutil

    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from forklift_spark.connections.deltalite import DeltaLiteTable

    pt = tables.load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    hi_key = pt.agg(F.max("p_partkey")).collect()[0][0]
    tdir = tempfile.mkdtemp(prefix="fk_delta_prune_")
    log = os.path.join(tdir, "_delta_log")
    os.makedirs(log)

    # land DISJOINT p_partkey ranges as separate file sets, so bounds
    # genuinely prune; chunk width scales with the sf (4 chunks)
    width = max(1, (int(hi_key) + 3) // 4)
    rels: list[str] = []
    for i in range(4):
        lo, hi = i * width + 1, (i + 1) * width
        chunk = pt.filter(
            (F.col("p_partkey") >= lo) & (F.col("p_partkey") <= hi))
        stage = os.path.join(tdir, f"stage_{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(stage)
        for f in sorted(glob.glob(os.path.join(stage, "part-*.parquet"))):
            rel = f"chunk{i}.parquet"
            shutil.move(f, os.path.join(tdir, rel))
            rels.append(rel)
        shutil.rmtree(stage)

    schema = T.StructType([
        T.StructField("p_partkey", pt.schema["p_partkey"].dataType),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_retailprice",
                      pt.schema["p_retailprice"].dataType),
    ])
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write(_json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 2}}) + "\n")
        fh.write(_json.dumps({"metaData": {
            "id": "fk-delta-stats-prune",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(schema.jsonValue()),
            "partitionColumns": [], "configuration": {},
            "createdTime": 1700000000000,
        }}) + "\n")
        for rel in rels:
            # real footer stats, like any spec-conformant writer
            tbl = pq.read_table(os.path.join(tdir, rel),
                                columns=["p_partkey", "p_brand"])
            keys = tbl.column(0).to_pylist()
            brands = tbl.column(1).to_pylist()
            fh.write(_json.dumps({"add": {
                "path": rel, "partitionValues": {},
                "size": os.path.getsize(os.path.join(tdir, rel)),
                "modificationTime": 1700000000000, "dataChange": True,
                "stats": _json.dumps({
                    "numRecords": len(keys),
                    "minValues": {"p_partkey": min(keys),
                                  "p_brand": min(brands)},
                    "maxValues": {"p_partkey": max(keys),
                                  "p_brand": max(brands)},
                    "nullCount": {"p_partkey": 0, "p_brand": 0},
                }),
            }}) + "\n")

    t = DeltaLiteTable(spark, tdir)
    lo_b, hi_b = 301, 1100  # spans chunks 0-2 at sf0.01, prunes chunk 3
    got = t.read(where={"p_partkey": (lo_b, hi_b)})
    rs = t.last_read_stats
    pruned = int(0 < rs["files_planned"] < rs["files_total"])
    return (
        got.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(dec("p_retailprice", MONEY)).cast("double")
             .alias("sum_price"),
            F.min("p_partkey").cast("bigint").alias("min_pk"),
            F.max("p_partkey").cast("bigint").alias("max_pk"),
            F.lit(pruned).cast("bigint").alias("pruned_at_plan_time"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# q_iceberg_bounds_prune_read — Iceberg VALUE-BOUNDS file skipping
# (r8): the manifest publisher exports customer with per-file
# lower_bounds/upper_bounds (spec fields 125/128, field-id keyed,
# single-value serialization) computed from its zone maps; the reader
# plans read(where={c_custkey: (lo, hi)}) by DECODING those bounds and
# skipping non-intersecting files (in-row flag asserts files_planned <
# files_total) while the residual filter keeps the rows exact. A
# little/big-endian confusion, a field-id mixup, or a dropped matching
# file all break the hash against the oracle's plain-predicate form.
# --------------------------------------------------------------------------
ICEBERG_BOUNDS_PRUNE_ORACLE = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS sum_bal,
       CAST(MIN(c_custkey) AS BIGINT) AS min_ck,
       CAST(MAX(c_custkey) AS BIGINT) AS max_ck,
       CAST(1 AS BIGINT) AS pruned_at_plan_time
FROM customer
WHERE c_custkey >= 101 AND c_custkey <= 400
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("q_iceberg_bounds_prune_read", ICEBERG_BOUNDS_PRUNE_ORACLE)
def q_iceberg_bounds_prune_read(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    from forklift_spark.connections.iceberglite import (
        IcebergLiteTable,
        export_manifest_to_iceberg,
    )
    from forklift_spark.manifest import ManifestTable

    cu = tables.load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    hi_key = cu.agg(F.max("c_custkey")).collect()[0][0]
    root = tempfile.mkdtemp(prefix="fk_ice_bounds_")
    # range-correlated partitions: each exported file spans a disjoint
    # c_custkey range, so the bounds genuinely prune
    width = max(1, (int(hi_key) + 3) // 4)
    src = cu.withColumn(
        "ck_range",
        ((F.col("c_custkey") - 1) / width).cast("int"))
    t = ManifestTable(spark, os.path.join(root, "src"), "cust_bounds")
    t.create(src, partition_by="ck_range")
    dest = os.path.join(root, "pub")
    export_manifest_to_iceberg(t, dest)

    it = IcebergLiteTable(spark, dest)
    got = it.read(where={"c_custkey": (101, 400)})
    rs = it.last_read_stats
    pruned = int(0 < rs["files_planned"] < rs["files_total"])
    return (
        got.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(dec("c_acctbal", MONEY)).cast("double")
             .alias("sum_bal"),
            F.min("c_custkey").cast("bigint").alias("min_ck"),
            F.max("c_custkey").cast("bigint").alias("max_ck"),
            F.lit(pruned).cast("bigint").alias("pruned_at_plan_time"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# q_iceberg_changelog_read — row-level snapshot-diff CHANGELOG with
# deletes (r8): a manifest publisher syncs to Iceberg (snapshot 1),
# then one dv-masked merge updates the k%20=8 keys of partition 0
# (price doubled -> position deletes on the retained files) AND
# appends the whole p=3 slice (new data files), synced as snapshot 2
# with dv_mode='native'. `changelog(1, 2)` must emit EXACTLY the
# preimages as deletes and the postimages + appended rows as inserts —
# the full-fidelity range the append-only changes() feed refuses. The
# in-row flag certifies the O(changed-files) plan: only the
# pos-delete-targeted retained files are scanned (untargeted p=1/p=2
# files stay out of the scan set), no equality widening. Reference
# analog: the incremental-consumption contract (S2,
# `transports/mysql.rb:149-158`) extended to deletions.
# --------------------------------------------------------------------------
ICEBERG_CHANGELOG_ORACLE = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(o_orderkey % 4 AS INTEGER) AS p,
         CAST(o_totalprice AS DECIMAL(14,2)) AS price
  FROM orders
), upd AS (
  SELECT * FROM base WHERE p = 0 AND k % 20 = 8
)
SELECT * FROM (
  SELECT 'delete' AS change_type,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(price) AS DOUBLE) AS sum_price,
         CAST(MIN(k) AS BIGINT) AS min_key,
         CAST(1 AS BIGINT) AS odelta_scan
  FROM upd
  UNION ALL
  SELECT 'insert',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(price) AS DOUBLE),
         CAST(MIN(k) AS BIGINT),
         CAST(1 AS BIGINT)
  FROM (
    SELECT k, CAST(price * 2 AS DECIMAL(14,2)) AS price FROM upd
    UNION ALL
    SELECT k, price FROM base WHERE p = 3
  )
)
ORDER BY change_type
"""


@query("q_iceberg_changelog_read", ICEBERG_CHANGELOG_ORACLE)
def q_iceberg_changelog_read(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    from forklift_spark.connections.iceberglite import (
        IcebergLiteTable,
        sync_manifest_to_iceberg,
    )
    from forklift_spark.manifest import ManifestTable

    base = tables.load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_orderkey") % 4).cast("int").alias("p"),
        dec("o_totalprice", MONEY).alias("price"),
    )
    root = tempfile.mkdtemp(prefix="fk_ice_chlog_")
    t = ManifestTable(spark, os.path.join(root, "src"), "orders_pub")
    t.create(base.filter(F.col("p") != 3), partition_by="p")
    dest = os.path.join(root, "pub")
    sync_manifest_to_iceberg(t, dest, dv_mode="native")   # snapshot 1

    upd = (base.filter((F.col("p") == 0) & (F.col("k") % 20 == 8))
           .withColumn("price",
                       (F.col("price") * 2).cast(MONEY)))
    t.merge(upd.unionByName(base.filter(F.col("p") == 3)),
            on="k", use_dv=True)
    sync_manifest_to_iceberg(t, dest, dv_mode="native")   # snapshot 2

    it = IcebergLiteTable(spark, dest)
    feed = it.changelog(1, 2)
    st = it.last_changelog_stats
    odelta = int(0 < st["retained_scanned"] < st["files_retained"]
                 and st["widened_reason"] is None)
    return (
        feed.groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("price").cast("double").alias("sum_price"),
            F.min("k").cast("bigint").alias("min_key"),
            F.lit(odelta).cast("bigint").alias("odelta_scan"),
        )
        .orderBy("change_type")
    )


# --------------------------------------------------------------------------
# q_delta_changelog_read — Delta row-level version-diff CHANGELOG
# without CDF (r8): a manifest publisher syncs to Delta (version 0),
# then one dv-masked merge updates the k%20=8 keys of partition 0
# (balance tripled -> the retained file is re-added with a grown DV)
# AND appends the whole p=3 slice (new data files), synced as version 1
# with dv_mode='native'. `changelog(0, 1)` must emit EXACTLY the
# preimages as deletes and the postimages + appended rows as inserts —
# synthesized from the log alone (the table has NO _change_data; the
# range would make changes() refuse and change_feed() has no CDF to
# read). The in-row flag certifies the O(changed-files) plan: only the
# logical files whose (path, dv uniqueId) changed are scanned.
# --------------------------------------------------------------------------
DELTA_CHANGELOG_ORACLE = """
WITH base AS (
  SELECT c_custkey AS k,
         CAST(c_custkey % 4 AS INTEGER) AS p,
         CAST(c_acctbal AS DECIMAL(14,2)) AS bal
  FROM customer
), upd AS (
  SELECT * FROM base WHERE p = 0 AND k % 20 = 8
)
SELECT * FROM (
  SELECT 'delete' AS change_type,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(bal) AS DOUBLE) AS sum_bal,
         CAST(MIN(k) AS BIGINT) AS min_key,
         CAST(1 AS BIGINT) AS odelta_scan
  FROM upd
  UNION ALL
  SELECT 'insert',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(bal) AS DOUBLE),
         CAST(MIN(k) AS BIGINT),
         CAST(1 AS BIGINT)
  FROM (
    SELECT k, CAST(bal * 3 AS DECIMAL(14,2)) AS bal FROM upd
    UNION ALL
    SELECT k, bal FROM base WHERE p = 3
  )
)
ORDER BY change_type
"""


@query("q_delta_changelog_read", DELTA_CHANGELOG_ORACLE)
def q_delta_changelog_read(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    from forklift_spark.connections.deltalite import (
        DeltaLiteTable,
        sync_manifest_to_delta,
    )
    from forklift_spark.manifest import ManifestTable

    base = tables.load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        (F.col("c_custkey") % 4).cast("int").alias("p"),
        dec("c_acctbal", MONEY).alias("bal"),
    )
    root = tempfile.mkdtemp(prefix="fk_delta_chlog_")
    t = ManifestTable(spark, os.path.join(root, "src"), "cust_pub")
    t.create(base.filter(F.col("p") != 3), partition_by="p")
    dest = os.path.join(root, "pub")
    sync_manifest_to_delta(t, dest, dv_mode="native")     # version 0

    upd = (base.filter((F.col("p") == 0) & (F.col("k") % 20 == 8))
           .withColumn("bal", (F.col("bal") * 3).cast(MONEY)))
    t.merge(upd.unionByName(base.filter(F.col("p") == 3)),
            on="k", use_dv=True)
    sync_manifest_to_delta(t, dest, dv_mode="native")     # version 1

    dt = DeltaLiteTable(spark, dest)
    feed = dt.changelog(0, 1)
    st = dt.last_changelog_stats
    odelta = int(0 < st["scanned_old"] < st["files_old"]
                 and 0 < st["scanned_new"] < st["files_new"])
    return (
        feed.groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("bal").cast("double").alias("sum_bal"),
            F.min("k").cast("bigint").alias("min_key"),
            F.lit(odelta).cast("bigint").alias("odelta_scan"),
        )
        .orderBy("change_type")
    )


# --------------------------------------------------------------------------
# q_iceberg_hidden_partition_read — HIDDEN-PARTITION pruning (r8): an
# events table day-partitioned the Iceberg way — partition tuples in
# the manifests' r102 record + a `day(ts)` transform in the partition
# spec, the partition value NOT stored in the data files — and, by
# construction, NO column bounds in the manifests, so plan-time file
# skipping can come ONLY from the transform: a one-week `where` on ts
# must prune every other day's file (in-row flag asserts it) while the
# row-level residual filter keeps the result exact. Spec: partition
# transforms; same plan discipline as the manifest reader's key
# pruning. Reference analog: eligibility predicates narrowing a
# recurring publish (P8, patterns/mysql_patterns.rb:28-43).
# --------------------------------------------------------------------------
ICEBERG_HIDDEN_PART_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(event_id) AS BIGINT) AS id_sum,
       CAST(MIN(ts) AS TIMESTAMP) AS first_ts,
       CAST(1 AS BIGINT) AS day_pruned
FROM events
WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
  AND ts <= TIMESTAMP '2024-01-14 23:59:59'
GROUP BY event_type
ORDER BY event_type
"""


@query("q_iceberg_hidden_partition_read", ICEBERG_HIDDEN_PART_ORACLE)
def q_iceberg_hidden_partition_read(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    import copy
    import glob
    import json as _json

    from forklift_spark.connections.iceberglite import (
        MANIFEST_ENTRY_SCHEMA,
        MANIFEST_FILE_SCHEMA,
        IcebergLiteTable,
    )
    from forklift_spark.functions import avrocodec as av

    ev = tables.load(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="fk_ice_hidden_")
    tdir = os.path.join(root, "events_ice")
    meta_dir = os.path.join(tdir, "metadata")
    os.makedirs(meta_dir)

    # one data file per day; partitionBy drops the day column from the
    # files — the partition value lives ONLY in the manifest (hidden)
    staged = os.path.join(tdir, "data")
    (ev.withColumn("pv", F.datediff(F.to_date("ts"),
                                    F.lit("1970-01-01")))
     .repartition("pv").write.partitionBy("pv").parquet(staged))
    day_files = []
    for d in sorted(glob.glob(os.path.join(staged, "pv=*"))):
        day = int(os.path.basename(d).split("=")[1])
        for p in sorted(glob.glob(os.path.join(d, "part-*.parquet"))):
            day_files.append((p, day))

    # entries with partition tuples and NO bounds
    entry_schema = copy.deepcopy(MANIFEST_ENTRY_SCHEMA)
    data_file_t = next(f for f in entry_schema["fields"]
                       if f["name"] == "data_file")["type"]
    rec_t = (next(x for x in data_file_t if x != "null")
             if isinstance(data_file_t, list) else data_file_t)
    next(f for f in rec_t["fields"]
         if f["name"] == "partition")["type"]["fields"] = [
        {"name": "pv", "type": ["null", "long"], "default": None}]
    m1 = os.path.join(meta_dir, "m1.avro")
    av.write_container_file(m1, _json.dumps(entry_schema), [
        {"status": 1, "snapshot_id": 1, "sequence_number": 1,
         "data_file": {
             "content": 0, "file_path": p, "file_format": "PARQUET",
             "partition": {"pv": day}, "record_count": 0,
             "file_size_in_bytes": os.path.getsize(p),
             "equality_ids": None}}
        for p, day in day_files])
    lst = os.path.join(meta_dir, "snap-1.avro")
    av.write_container_file(
        lst, _json.dumps(MANIFEST_FILE_SCHEMA),
        [{"manifest_path": m1, "manifest_length": os.path.getsize(m1),
          "partition_spec_id": 0, "content": 0, "sequence_number": 1,
          "min_sequence_number": 1, "added_snapshot_id": 1}])
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        _json.dump({
            "format-version": 2, "table-uuid": "fk-iceberg-hidden",
            "location": tdir, "last-sequence-number": 1,
            "last-updated-ms": 1, "last-column-id": 4,
            "current-schema-id": 0,
            "schemas": [{"type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "event_id", "required": False,
                 "type": "long"},
                {"id": 2, "name": "ts", "required": False,
                 "type": "timestamp"},
                {"id": 3, "name": "event_type", "required": False,
                 "type": "string"},
                {"id": 4, "name": "value", "required": False,
                 "type": "double"},
            ]}],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": [
                {"name": "pv", "transform": "day", "source-id": 2,
                 "field-id": 1000}]}],
            "current-snapshot-id": 1,
            "snapshots": [{
                "snapshot-id": 1, "sequence-number": 1,
                "timestamp-ms": 1, "manifest-list": lst,
                "summary": {"operation": "append"}, "schema-id": 0}],
        }, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    t = IcebergLiteTable(spark, tdir)
    got = t.read(where={"ts": ("2024-01-08 00:00:00",
                               "2024-01-14 23:59:59")})
    rs = t.last_read_stats
    pruned = int(rs["partition_pruned"] > 0
                 and 0 < rs["files_planned"] < rs["files_total"])
    return (
        got.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("event_id").cast("bigint").alias("id_sum"),
            F.min("ts").alias("first_ts"),
            F.lit(pruned).cast("bigint").alias("day_pruned"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q_lakehouse_files_audit — metadata-table fidelity (r8): customer is
# published to BOTH lakehouse formats (partitioned manifest -> delta +
# iceberg exports), then each reader's `files()` METADATA table — not
# the data path — must reproduce the per-partition row counts: Delta
# from the add.stats the publisher wrote (numRecords + the p column's
# min==max bounds identifying each file's partition — the Delta export
# is unpartitioned by contract, every column lives in the files),
# Iceberg from the manifest record_count + the r102 identity partition
# tuples. The oracle is the source table itself, so a wrong stats
# rendition, a dropped partition tuple, or a miscounted manifest entry
# breaks the hash. Reader-side answer to DESCRIBE DETAIL / the `files`
# metadata table.
# --------------------------------------------------------------------------
LAKEHOUSE_FILES_AUDIT_ORACLE = """
WITH base AS (
  SELECT CAST(c_custkey % 4 AS INTEGER) AS p FROM customer
), per AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS n_rows FROM base GROUP BY p
)
SELECT * FROM (
  SELECT 'delta' AS source, p, n_rows, CAST(1 AS BIGINT) AS has_files
  FROM per
  UNION ALL
  SELECT 'iceberg', p, n_rows, CAST(1 AS BIGINT) FROM per
)
ORDER BY source, p
"""


@query("q_lakehouse_files_audit", LAKEHOUSE_FILES_AUDIT_ORACLE)
def q_lakehouse_files_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.connections.deltalite import (
        DeltaLiteTable,
        export_manifest_to_delta,
    )
    from forklift_spark.connections.iceberglite import (
        IcebergLiteTable,
        export_manifest_to_iceberg,
    )
    from forklift_spark.manifest import ManifestTable

    cu = tables.load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        (F.col("c_custkey") % 4).cast("int").alias("p"),
        dec("c_acctbal", MONEY).alias("bal"),
    )
    root = tempfile.mkdtemp(prefix="fk_files_audit_")
    t = ManifestTable(spark, os.path.join(root, "src"), "cust")
    t.create(cu, partition_by="p")
    ddest = os.path.join(root, "pub_delta")
    idest = os.path.join(root, "pub_ice")
    export_manifest_to_delta(t, ddest)
    export_manifest_to_iceberg(t, idest)

    d = DeltaLiteTable(spark, ddest).files().select(
        F.lit("delta").alias("source"),
        # one partition per file by construction: stats min == max
        F.when(
            F.get_json_object("stats", "$.minValues.p")
            == F.get_json_object("stats", "$.maxValues.p"),
            F.get_json_object("stats", "$.minValues.p").cast("int"),
        ).alias("p"),
        F.col("num_records"),
    )
    i = (IcebergLiteTable(spark, idest).files()
         .filter(F.col("content") == "data")
         .select(
             F.lit("iceberg").alias("source"),
             F.col("partition")["p"].cast("int").alias("p"),
             F.col("record_count").alias("num_records"),
         ))
    return (
        d.unionByName(i)
        .groupBy("source", "p")
        .agg(
            F.sum("num_records").cast("bigint").alias("n_rows"),
            (F.count(F.lit(1)) >= 1).cast("bigint").alias("has_files"),
        )
        .orderBy("source", "p")
    )


# --------------------------------------------------------------------------
# q_delta_cdf_publish — publisher-side CHANGE DATA FEED (r8): the
# incremental sync creates the destination with
# delta.enableChangeDataFeed and, on the commit carrying dv churn +
# appends, writes REAL _change_data parquet describing ALL of the
# commit's row-level changes. change_feed(0) then consumes the cdc
# actions VERBATIM (spec: when cdc actions are present they are the
# sole source for that commit — adds/removes are ignored), so a wrong
# or incomplete cdc file breaks the hash rather than being papered
# over by synthesis. The in-row flag proves cdc actions exist in the
# commit. Counterpart of q_delta_cdf_read (which consumes hand-built
# CDF): this row certifies the WRITER.
# --------------------------------------------------------------------------
DELTA_CDF_PUBLISH_ORACLE = """
WITH base AS (
  SELECT c_custkey AS k,
         CAST(c_custkey % 4 AS INTEGER) AS p,
         CAST(c_acctbal AS DECIMAL(14,2)) AS bal
  FROM customer
), upd AS (
  SELECT * FROM base WHERE p = 0 AND k % 20 = 8
)
SELECT * FROM (
  SELECT 'delete' AS change_type,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(bal) AS DOUBLE) AS sum_bal,
         CAST(MIN(k) AS BIGINT) AS min_key,
         CAST(1 AS BIGINT) AS cdc_published
  FROM upd
  UNION ALL
  SELECT 'insert',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(bal) AS DOUBLE),
         CAST(MIN(k) AS BIGINT),
         CAST(1 AS BIGINT)
  FROM (
    SELECT k, CAST(bal * 3 AS DECIMAL(14,2)) AS bal FROM upd
    UNION ALL
    SELECT k, bal FROM base WHERE p = 3
  )
)
ORDER BY change_type
"""


@query("q_delta_cdf_publish", DELTA_CDF_PUBLISH_ORACLE)
def q_delta_cdf_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.connections.deltalite import (
        DeltaLiteTable,
        sync_manifest_to_delta,
    )
    from forklift_spark.manifest import ManifestTable

    base = tables.load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        (F.col("c_custkey") % 4).cast("int").alias("p"),
        dec("c_acctbal", MONEY).alias("bal"),
    )
    root = tempfile.mkdtemp(prefix="fk_cdf_pub_")
    t = ManifestTable(spark, os.path.join(root, "src"), "cust_pub")
    t.create(base.filter(F.col("p") != 3), partition_by="p")
    dest = os.path.join(root, "pub")
    sync_manifest_to_delta(t, dest, dv_mode="native", cdf=True)  # v0

    upd = (base.filter((F.col("p") == 0) & (F.col("k") % 20 == 8))
           .withColumn("bal", (F.col("bal") * 3).cast(MONEY)))
    t.merge(upd.unionByName(base.filter(F.col("p") == 3)),
            on="k", use_dv=True)
    sync_manifest_to_delta(t, dest, dv_mode="native")            # v1

    with open(os.path.join(dest, "_delta_log",
                           f"{1:020d}.json")) as fh:
        published = int('"cdc"' in fh.read())
    feed = DeltaLiteTable(spark, dest).change_feed(0)
    return (
        feed.groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("bal").cast("double").alias("sum_bal"),
            F.min("k").cast("bigint").alias("min_key"),
            F.lit(published).cast("bigint").alias("cdc_published"),
        )
        .orderBy("change_type")
    )


# --------------------------------------------------------------------------
# q_iceberg_refs_read — branch/tag REFS (r8): the publisher keeps
# refs.main on head; an external tool pins a TAG at snapshot 1; after
# a second sync, read(ref="main") must see the merged state while
# read(ref="v1") still sees the original — the named-snapshot
# time-travel surface (spec `refs`) certified through the oracle: the
# union of both refs' aggregates reconstructs from the source table
# exactly (a ref resolving to the wrong snapshot breaks its half).
# --------------------------------------------------------------------------
ICEBERG_REFS_ORACLE = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(o_orderkey % 4 AS INTEGER) AS p,
         CAST(o_totalprice AS DECIMAL(14,2)) AS price
  FROM orders WHERE o_orderkey % 3 = 0
), upd AS (
  SELECT * FROM base WHERE k % 15 = 4
)
SELECT * FROM (
  SELECT 'v1' AS ref, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(price) AS DOUBLE) AS sum_price
  FROM base
  UNION ALL
  SELECT 'main', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN k % 15 = 4
                       THEN CAST(price * 2 AS DECIMAL(14,2))
                       ELSE price END) AS DOUBLE)
  FROM base
)
ORDER BY ref
"""


@query("q_iceberg_refs_read", ICEBERG_REFS_ORACLE)
def q_iceberg_refs_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json

    from forklift_spark.connections.iceberglite import (
        IcebergLiteTable,
        sync_manifest_to_iceberg,
    )
    from forklift_spark.manifest import ManifestTable

    base = (tables.load(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 3 == 0)
            .select(
                F.col("o_orderkey").alias("k"),
                (F.col("o_orderkey") % 4).cast("int").alias("p"),
                dec("o_totalprice", MONEY).alias("price"),
            ))
    root = tempfile.mkdtemp(prefix="fk_ice_refs_")
    t = ManifestTable(spark, os.path.join(root, "src"), "orders_pub")
    t.create(base, partition_by="p")
    dest = os.path.join(root, "pub")
    sync_manifest_to_iceberg(t, dest)                      # snapshot 1

    # an external tool pins a tag at snapshot 1
    it = IcebergLiteTable(spark, dest)
    mf = it._resolve_metadata_file()
    meta = _json.load(open(mf))
    meta["refs"]["v1"] = {"snapshot-id": 1, "type": "tag"}
    _json.dump(meta, open(mf, "w"))

    upd = (base.filter(F.col("k") % 15 == 4)
           .withColumn("price", (F.col("price") * 2).cast(MONEY)))
    t.merge(upd, on="k", use_dv=True)
    sync_manifest_to_iceberg(t, dest, dv_mode="native")    # snapshot 2

    it = IcebergLiteTable(spark, dest)

    def agg(ref):
        return (it.read(ref=ref)
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                     F.sum("price").cast("double").alias("sum_price"))
                .withColumn("ref", F.lit(ref))
                .select("ref", "n_rows", "sum_price"))

    return agg("main").unionByName(agg("v1")).orderBy("ref")
