"""Contract-level coverage for jar-gated / dialect-sensitive connector
branches (VERDICT r3 items 6 + 8).

This image has no MySQL/Postgres server, no elasticsearch-hadoop jar
and no spark-avro module, so the gated branches can't run live. These
tests pin the OPTION PLUMBING each branch sends — format names,
``es.mapping.id`` / ``es.write.operation`` / ``es.query``, dialect
identifier quoting, partitioned-scan bounds, avro compression — with
recording fakes, plus the real degradation path on the live session.
A user who drops the jars in gets branches whose emitted options are
asserted here, not untested code.
"""

from __future__ import annotations

import json
from types import SimpleNamespace

import pytest

from forklift_spark.connections.columnar import AvroConnection, OrcConnection
from forklift_spark.connections.elasticsearch import ES_FORMAT, ElasticsearchConnection
from forklift_spark.connections.jdbc import JdbcConnection


class Recorder:
    """Chainable stand-in for DataFrameReader/Writer recording every call."""

    def __init__(self):
        self.opts: dict = {}
        self.fmt = None
        self.loaded = None
        self.saved = None
        self.mode_name = None
        self.schema_val = None

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def options(self, **kw):
        self.opts.update(kw)
        return self

    def schema(self, s):
        self.schema_val = s
        return self

    def mode(self, m):
        self.mode_name = m
        return self

    def load(self, path=None):
        self.loaded = path
        return "DF"

    def save(self, path=None):
        self.saved = path


def _engine(read_rec=None):
    spark = SimpleNamespace(read=read_rec)
    return SimpleNamespace(spark=spark, logger=SimpleNamespace(log=lambda *_: None))


# ---------------------------------------------------------------------------
# S1 dialect matrix: quoting + partitioned-scan plumbing per JDBC dialect
# ---------------------------------------------------------------------------

_DIALECTS = [
    ("jdbc:mysql://db-host:3306/wh", "`id`"),
    ("jdbc:derby:memory:wh;create=true", '"id"'),
    ("jdbc:postgresql://db-host/wh", '"id"'),
]


@pytest.mark.parametrize("url,quoted", _DIALECTS)
def test_jdbc_quote_per_dialect(url, quoted):
    conn = JdbcConnection({"url": url}, _engine(), "src")
    assert conn._quote("id") == quoted


@pytest.mark.parametrize("url,quoted", _DIALECTS)
def test_jdbc_partitioned_scan_options(url, quoted, monkeypatch):
    conn = JdbcConnection(
        {"url": url, "partition_column": "id", "num_partitions": 4, "fetchsize": 123},
        _engine(),
        "src",
    )
    rec = Recorder()
    monkeypatch.setattr(conn, "_reader", lambda: rec)
    monkeypatch.setattr(conn, "_bounds", lambda t, c: (1, 100))
    assert conn.read("orders") == "DF"
    assert rec.opts["dbtable"] == "orders"
    assert rec.opts["partitionColumn"] == quoted
    assert (rec.opts["lowerBound"], rec.opts["upperBound"]) == ("1", "100")
    assert rec.opts["numPartitions"] == "4"
    assert conn._props()["fetchsize"] == "123"  # applied by the real _reader


def test_jdbc_sql_becomes_pushdown_subquery(monkeypatch):
    conn = JdbcConnection({"url": "jdbc:mysql://h/wh"}, _engine(), "src")
    rec = Recorder()
    monkeypatch.setattr(conn, "_reader", lambda: rec)
    conn.read("SELECT a, b FROM t WHERE a > 1")
    assert rec.opts["dbtable"] == "(SELECT a, b FROM t WHERE a > 1) AS q"
    assert "partitionColumn" not in rec.opts


def test_jdbc_select_prefixed_table_name_is_a_table(monkeypatch):
    # word-boundary regex: 'selected_items' must not be parsed as SQL
    conn = JdbcConnection({"url": "jdbc:mysql://h/wh"}, _engine(), "src")
    rec = Recorder()
    monkeypatch.setattr(conn, "_reader", lambda: rec)
    conn.read("selected_items")
    assert rec.opts["dbtable"] == "selected_items"


def test_jdbc_credentials_reach_properties():
    conn = JdbcConnection(
        {"url": "jdbc:mysql://h/wh", "user": "u", "password": "p", "driver": "com.mysql.cj.jdbc.Driver"},
        _engine(),
        "src",
    )
    props = conn._props()
    assert (props["user"], props["password"]) == ("u", "p")
    assert props["driver"] == "com.mysql.cj.jdbc.Driver"


# ---------------------------------------------------------------------------
# S4/S5 connector-jar branch: the exact es-hadoop options
# ---------------------------------------------------------------------------


def test_es_connector_read_options(monkeypatch):
    rec = Recorder()
    conn = ElasticsearchConnection(
        {"nodes": "es1:9200,es2:9200"}, _engine(read_rec=rec), "es"
    )
    monkeypatch.setattr(conn, "_available", lambda: True)
    assert conn.read("idx", {"term": {"a": 1}}) == "DF"
    assert rec.fmt == ES_FORMAT
    assert rec.opts["es.nodes"] == "es1:9200,es2:9200"
    assert json.loads(rec.opts["es.query"]) == {"query": {"term": {"a": 1}}}
    assert rec.loaded == "idx"


def test_es_connector_write_upsert_by_id(monkeypatch):
    conn = ElasticsearchConnection({"nodes": "es1:9200"}, _engine(), "es")
    monkeypatch.setattr(conn, "_available", lambda: True)
    rec = Recorder()
    conn.write(SimpleNamespace(write=rec), "idx", primary_key="id")
    assert rec.fmt == ES_FORMAT
    # upsert-by-id is the reference's update=true path (elasticsearch.rb:50-53)
    assert rec.opts["es.mapping.id"] == "id"
    assert rec.opts["es.write.operation"] == "upsert"
    assert rec.mode_name == "append" and rec.saved == "idx"


def test_es_connector_write_plain_append_has_no_id_mapping(monkeypatch):
    conn = ElasticsearchConnection({"nodes": "es1:9200"}, _engine(), "es")
    monkeypatch.setattr(conn, "_available", lambda: True)
    rec = Recorder()
    conn.write(SimpleNamespace(write=rec), "idx")
    assert "es.mapping.id" not in rec.opts
    assert "es.write.operation" not in rec.opts


# ---------------------------------------------------------------------------
# Avro gate: option plumbing via fakes + real degradation on the live session
# ---------------------------------------------------------------------------


def test_avro_read_write_plumbing():
    rec = Recorder()
    conn = AvroConnection(
        {"file": "/tmp/t.avro", "compression": "snappy"}, _engine(read_rec=rec), "av"
    )
    assert conn.read(schema="s") == "DF"
    assert rec.fmt == "avro" and rec.loaded == "/tmp/t.avro" and rec.schema_val == "s"
    w = Recorder()
    conn.write(SimpleNamespace(write=w), mode="truncate")
    assert w.fmt == "avro"
    assert w.mode_name == "overwrite"  # truncate maps to overwrite
    assert w.opts["compression"] == "snappy"
    assert w.saved == "/tmp/t.avro"


def test_orc_uses_builtin_format():
    rec = Recorder()
    conn = OrcConnection({"file": "/tmp/t.orc"}, _engine(read_rec=rec), "orc")
    conn.read()
    assert rec.fmt == "orc"


def _avro_jar_present(spark) -> bool:
    """True only when the avro DATASOURCE is deployable — Spark bundles
    the org.apache.spark.sql.avro classes in core (so Class.forName
    succeeds, which is how the r5 version of this probe mis-skipped),
    but the file-format provider needs the external module."""
    try:
        spark.read.format("avro").load("/nonexistent-path-for-avro-probe")
        return True
    except Exception as exc:
        return "Failed to find data source" not in str(exc)


def test_avro_jar_engine_degrades_with_actionable_hint(spark, tmp_path):
    """engine="jar" pins the spark-avro path: without the jar it must
    raise the actionable hint, NOT silently reroute to the pure codec
    (r6: the default engine="auto" now falls back — see
    tests/test_avro_pure.py for the live fallback roundtrip)."""
    if _avro_jar_present(spark):
        pytest.skip("spark-avro present; gated branch is live elsewhere")
    conn = AvroConnection(
        {"file": str(tmp_path / "t.avro")},
        SimpleNamespace(spark=spark, logger=SimpleNamespace(log=lambda *_: None)),
        "av",
    )
    with pytest.raises(RuntimeError, match="spark-avro"):
        conn.write(spark.range(3), mode="overwrite", engine="jar")
    with pytest.raises(RuntimeError, match="spark.jars.packages"):
        conn.read(engine="jar")


def test_avro_auto_fallback_only_on_jar_absence():
    """engine='auto' must re-raise NON-jar-absence exceptions instead of
    silently retrying through the pure codec (ADVICE r6 item 3)."""
    from forklift_spark.connections.columnar import AvroConnection

    missing = Exception(
        "[DATA_SOURCE_NOT_FOUND] Failed to find data source: avro.")
    assert AvroConnection._jar_missing(missing)
    assert AvroConnection._jar_missing(
        Exception("java.lang.ClassNotFoundException: avro.DefaultSource"))
    corrupt = Exception("org.apache.avro.AvroRuntimeException: "
                        "Malformed data. Length is negative: -40")
    assert not AvroConnection._jar_missing(corrupt)
