"""ES REST shim integration: rows move both ways through a live (fake)
HTTP endpoint — sliced-scroll distributed reads, per-partition _bulk
upsert-by-id writes, index delete. The fake implements the minimal ES
surface the shim speaks (S4/S5 parity, `transports/elasticsearch.rb`);
executors reach it over real sockets, so the partition-level IO path is
exercised for real in local mode.
"""

from __future__ import annotations

import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from forklift_spark.connections.elasticsearch import ElasticsearchConnection
from forklift_spark.engine import Engine


class _FakeES(BaseHTTPRequestHandler):
    """Thread-safe in-memory ES: _search (match_all/term, slice+scroll),
    _search/scroll, _bulk, _refresh, DELETE index."""

    store: dict[str, dict[str, dict]] = {}
    scrolls: dict[str, list[list[dict]]] = {}
    lock = threading.Lock()

    def log_message(self, *a):  # quiet
        pass

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self):
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n).decode() if n else ""

    @classmethod
    def _match(cls, doc: dict, query: dict) -> bool:
        if not query or "match_all" in query:
            return True
        if "term" in query:
            ((field, want),) = query["term"].items()
            if isinstance(want, dict):
                want = want["value"]
            return doc.get(field) == want
        raise ValueError(f"fake ES: unsupported query {query}")

    def do_POST(self):  # noqa: N802
        parts = self.path.split("?")[0].strip("/").split("/")
        body = json.loads(self._body()) if not parts[-1] == "_bulk" else None

        if parts[-1] == "_bulk":
            lines = [ln for ln in self._body().splitlines() if ln.strip()]
            with self.lock:
                items = []
                for action_ln, doc_ln in zip(lines[0::2], lines[1::2]):
                    action = json.loads(action_ln)["index"]
                    doc = json.loads(doc_ln)
                    idx = action["_index"]
                    did = str(action.get("_id", uuid.uuid4().hex))
                    self.store.setdefault(idx, {})[did] = doc
                    items.append({"index": {"_id": did, "status": 200}})
            self._json(200, {"errors": False, "items": items})
            return

        if parts == ["_search", "scroll"]:
            sid = body["scroll_id"]
            with self.lock:
                pages = self.scrolls.get(sid, [])
                page = pages.pop(0) if pages else []
            self._json(
                200, {"_scroll_id": sid, "hits": {"hits": page, "total": {"value": 0}}}
            )
            return

        if parts[-1] == "_refresh":
            self._json(200, {"result": "ok"})
            return

        if parts[-1] == "_search":
            index = parts[0]
            query = (body or {}).get("query", {"match_all": {}})
            size = (body or {}).get("size", 10)
            slc = (body or {}).get("slice")
            with self.lock:
                docs = [
                    (did, d)
                    for did, d in sorted(self.store.get(index, {}).items())
                    if self._match(d, query)
                ]
            if slc:
                docs = [dv for i, dv in enumerate(docs) if i % slc["max"] == slc["id"]]
            hits = [
                {"_id": did, "_index": index, "_source": d} for did, d in docs
            ]
            total = len(hits)
            if "scroll" in self.path:
                pages = [hits[i : i + size] for i in range(0, len(hits), size)] or [[]]
                sid = uuid.uuid4().hex
                with self.lock:
                    self.scrolls[sid] = pages[1:]
                self._json(
                    200,
                    {
                        "_scroll_id": sid,
                        "hits": {"hits": pages[0], "total": {"value": total}},
                    },
                )
            else:
                self._json(
                    200, {"hits": {"hits": hits[:size], "total": {"value": total}}}
                )
            return

        self._json(404, {"error": "not found"})

    def do_DELETE(self):  # noqa: N802
        index = self.path.strip("/").split("/")[0]
        with self.lock:
            if index in self.store:
                del self.store[index]
                self._json(200, {"acknowledged": True})
            else:
                self._json(404, {"error": "index_not_found_exception"})


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
