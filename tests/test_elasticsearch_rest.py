"""ES REST shim integration: rows move both ways through a live (fake)
HTTP endpoint — sliced-scroll distributed reads, per-partition _bulk
upsert-by-id writes, index delete. The fake implements the minimal ES
surface the shim speaks (S4/S5 parity, `transports/elasticsearch.rb`);
executors reach it over real sockets, so the partition-level IO path is
exercised for real in local mode.
"""

from __future__ import annotations

import threading
from http.server import ThreadingHTTPServer

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from forklift_spark.connections.elasticsearch import ElasticsearchConnection
from forklift_spark.engine import Engine
from forklift_spark.testing import FakeElasticsearch as _FakeES


@pytest.fixture(scope="module")
def es(spark):
    _FakeES.store = {}
    _FakeES.scrolls = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeES)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    eng = Engine({"project_root": "/tmp"}, spark=spark)
    conn = ElasticsearchConnection(
        {"nodes": f"127.0.0.1:{srv.server_port}"}, eng, name="es"
    )
    yield conn
    srv.shutdown()


def _docs(spark, n=25):
    return spark.createDataFrame(
        [Row(id=i, name=f"d{i}", grp="even" if i % 2 == 0 else "odd") for i in range(n)]
    )


def test_bulk_write_upserts_by_id(spark, es):
    es.write(_docs(spark), "docs", primary_key="id")
    assert len(_FakeES.store["docs"]) == 25
    # re-write same keys with changed values -> replaced, not duplicated
    upd = _docs(spark).filter(F.col("id") < 5).withColumn("name", F.lit("UPD"))
    es.write(upd, "docs", primary_key="id")
    assert len(_FakeES.store["docs"]) == 25
    assert _FakeES.store["docs"]["3"]["name"] == "UPD"
    assert _FakeES.store["docs"]["7"]["name"] == "d7"


def test_sliced_scroll_read_roundtrip(spark, es):
    es.write(_docs(spark), "rt", primary_key="id")
    # page_size < total forces the scroll continuation path; 3 slices
    # exercise the per-task cursor fan-out
    out = es.read("rt", slices=3, page_size=4)
    rows = {r["id"]: r["name"] for r in out.collect()}
    assert rows == {i: f"d{i}" for i in range(25)}
    assert sorted(out.columns) == ["grp", "id", "name"]


def test_query_dsl_passthrough(spark, es):
    es.write(_docs(spark), "q", primary_key="id")
    out = es.read("q", query={"term": {"grp": "even"}}, slices=2, page_size=4)
    got = sorted(r["id"] for r in out.collect())
    assert got == [i for i in range(25) if i % 2 == 0]


def test_read_empty_index_yields_empty_df(spark, es):
    es.write(_docs(spark, 1), "empty_probe", primary_key="id")
    es.delete_index("empty_probe")
    _FakeES.store["empty_probe"] = {}
    out = es.read("empty_probe")
    assert out.count() == 0


def test_delete_index_semantics(spark, es):
    es.write(_docs(spark, 2), "del_t", primary_key="id")
    assert es.delete_index("del_t") is True
    assert es.delete_index("del_t") is False
