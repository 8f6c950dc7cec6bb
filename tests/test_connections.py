"""Connection registry + endpoint unit tests (no live servers).

Mirrors the reference's discovery semantics tests: YAML auto-discovery
with env interpolation (`plan.rb:24-44`), example.yml skipped, bad
config logged not raised; JDBC/ES option plumbing validated up to the
point where a live endpoint would be needed.
"""

from __future__ import annotations

import os

import pytest

from forklift_spark.connections import discover, load_config
from forklift_spark.connections.csvfile import CsvConnection
from forklift_spark.connections.elasticsearch import ElasticsearchConnection
from forklift_spark.connections.jdbc import JdbcConnection
from forklift_spark.connections.parquet import ParquetConnection
from forklift_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine({"project_root": str(tmp_path)}, spark=spark)


def _write(tmp_path, rel, text):
    p = tmp_path / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(text)
    return p


def test_discover_builds_typed_connections(engine, tmp_path):
    _write(tmp_path, "config/connections/parquet/wh.yml", "path: ./warehouse\n")
    _write(tmp_path, "config/connections/csv/src.yml", f"file: {tmp_path}/csv\n")
    _write(tmp_path, "config/connections/jdbc/db.yml", "url: jdbc:mysql://h/d\n")
    _write(tmp_path, "config/connections/parquet/example.yml", "path: ./skipme\n")
    conns = discover(engine, str(tmp_path))
    assert isinstance(conns["parquet"]["wh"], ParquetConnection)
    assert isinstance(conns["csv"]["src"], CsvConnection)
    assert isinstance(conns["jdbc"]["db"], JdbcConnection)
    assert "example" not in conns["parquet"]


def test_jsonl_roundtrip_append_truncate_gzip(engine, spark, tmp_path):
    from pyspark.sql import Row

    from forklift_spark.connections.jsonl import JsonlConnection

    path = str(tmp_path / "docs_jsonl")
    jl = JsonlConnection({"file": path}, engine)
    df = spark.createDataFrame([Row(doc_id=i, text=f"t{i}", meta={"k": i}) for i in range(10)])
    jl.write(df, mode="overwrite")
    back = jl.read()
    assert back.count() == 10
    assert sorted(back.columns) == ["doc_id", "meta", "text"]
    assert back.filter("meta.k = 3").count() == 1
    jl.write(df.limit(2), mode="append")
    assert jl.read().count() == 12
    jl.write(df.limit(5), mode="truncate")
    assert jl.read().count() == 5
    # gzip shards read back transparently
    gz = JsonlConnection({"file": str(tmp_path / "gz"), "compression": "gzip"}, engine)
    gz.write(df, mode="overwrite")
    assert any(f.endswith(".json.gz") for f in os.listdir(tmp_path / "gz"))
    assert gz.read().count() == 10


def test_jsonl_explicit_schema_skips_inference(engine, spark, tmp_path):
    from pyspark.sql import Row, types as T

    from forklift_spark.connections.jsonl import JsonlConnection

    path = str(tmp_path / "typed")
    jl = JsonlConnection({"file": path}, engine)
    jl.write(spark.createDataFrame([Row(a=1, b="x")]), mode="overwrite")
    schema = T.StructType([T.StructField("a", T.LongType()), T.StructField("b", T.StringType())])
    got = jl.read(schema=schema)
    assert got.schema == schema
    assert got.collect()[0]["a"] == 1


def test_jsonl_discovered_from_yaml(engine, tmp_path):
    from forklift_spark.connections.jsonl import JsonlConnection

    _write(tmp_path, "config/connections/jsonl/corpus.yml", f"file: {tmp_path}/corpus\n")
    conns = discover(engine, str(tmp_path))
    assert isinstance(conns["jsonl"]["corpus"], JsonlConnection)


def test_discover_mysql_alias_and_bad_config_logged(engine, tmp_path):
    _write(tmp_path, "config/connections/mysql/legacy.yml", "url: jdbc:mysql://h/d\n")
    # jdbc without url -> constructor raises -> logged, not raised
    _write(tmp_path, "config/connections/jdbc/broken.yml", "user: nobody\n")
    conns = discover(engine, str(tmp_path))
    assert isinstance(conns["mysql"]["legacy"], JdbcConnection)
    assert "broken" not in conns.get("jdbc", {})
    assert any("broken" in m for m in engine.logger.messages)


def test_env_interpolation_with_default(tmp_path, monkeypatch):
    p = _write(
        tmp_path,
        "conn.yml",
        "url: jdbc:mysql://${TEST_DB_HOST:-fallback}/db\npassword: ${TEST_DB_PW}\n",
    )
    monkeypatch.delenv("TEST_DB_HOST", raising=False)
    monkeypatch.setenv("TEST_DB_PW", "sekret")
    cfg = load_config(str(p))
    assert cfg["url"] == "jdbc:mysql://fallback/db"
    assert cfg["password"] == "sekret"
    monkeypatch.setenv("TEST_DB_HOST", "db.prod")
    assert load_config(str(p))["url"] == "jdbc:mysql://db.prod/db"


def test_jdbc_requires_url(engine):
    with pytest.raises(ValueError):
        JdbcConnection({}, engine)


def test_jdbc_write_rejects_unknown_mode(engine, spark):
    conn = JdbcConnection({"url": "jdbc:mysql://h/d"}, engine)
    df = spark.range(1)
    with pytest.raises(ValueError):
        conn.write(df, "t", mode="replace")


def test_es_falls_back_to_rest_without_connector_jar(engine, spark):
    # without the jar the REST shim takes over: the failure mode against
    # an unreachable endpoint is a connection error from the HTTP probe,
    # not NotImplementedError (rows really do move — see
    # tests/test_elasticsearch_rest.py for the live fake-endpoint suite)
    es = ElasticsearchConnection({"nodes": "localhost:1"}, engine)
    if es._available():  # pragma: no cover - jar present in some envs
        pytest.skip("connector jar on classpath")
    with pytest.raises(OSError):
        es.read("idx")
    with pytest.raises(Exception):  # executor-side bulk fails to connect
        es.write(spark.range(1), "idx", primary_key="id")


def test_es_delete_index_404_and_unreachable(engine):
    es = ElasticsearchConnection({"nodes": "localhost:1"}, engine)  # closed port
    with pytest.raises(OSError):
        es.delete_index("idx", timeout=0.5)


def test_orc_roundtrip_append_truncate(engine, spark, tmp_path):
    from forklift_spark.connections.columnar import OrcConnection

    path = str(tmp_path / "orc_data")
    conn = OrcConnection({"file": path}, engine, name="orc")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    conn.write(df, mode="overwrite")
    assert conn.read().count() == 2
    conn.write(df, mode="append")
    assert conn.read().count() == 4
    conn.write(df.limit(1), mode="truncate")
    assert conn.read().count() == 1
    # explicit schema read path
    assert conn.read(schema="id long, v string").columns == ["id", "v"]
    conn.drop()
    assert not os.path.exists(path)


def test_orc_discovered_from_yaml(engine, tmp_path):
    _write(tmp_path, "config/connections/orc/lake.yml", f"file: {tmp_path}/lake\n")
    conns = discover(engine, str(tmp_path))
    from forklift_spark.connections.columnar import OrcConnection

    assert isinstance(conns["orc"]["lake"], OrcConnection)


def test_avro_degrades_without_module(engine, spark, tmp_path):
    from forklift_spark.connections.columnar import AvroConnection

    conn = AvroConnection({"file": str(tmp_path / "avro_data")}, engine, name="av")
    df = spark.createDataFrame([(1,)], "id long")
    try:
        conn.write(df, mode="overwrite")
    except RuntimeError as exc:
        assert "spark-avro" in str(exc)
    else:
        # jar present: the read path must round-trip
        assert conn.read().count() == 1
