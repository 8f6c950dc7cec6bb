"""Test doubles for jar-less environments.

``FakeElasticsearch`` implements the minimal ES REST surface the
elasticsearch connection's REST shim speaks — _search with
match_all/term queries and slice+scroll paging, _search/scroll
continuation, _bulk index-by-id, _refresh, DELETE index — backed by an
in-memory store. It exists so the S4/S5 connector path can be exercised
over REAL sockets (executors POST/GET to the server from their worker
processes) in environments without an ES cluster or the
elasticsearch-hadoop jar: the integration tests and the
``q_es_roundtrip`` catalog query both run against it. Semantics follow
the public Elasticsearch REST API (reference transport:
`transports/elasticsearch.rb:14-64`).
"""

from __future__ import annotations

import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class FakeElasticsearch(BaseHTTPRequestHandler):
    """Thread-safe in-memory ES: _search (match_all/term, slice+scroll),
    _search/scroll, _bulk, _refresh, DELETE index."""

    store: dict[str, dict[str, dict]] = {}
    scrolls: dict[str, list[list[dict]]] = {}
    lock = threading.Lock()

    @classmethod
    def reset(cls) -> None:
        with cls.lock:
            cls.store = {}
            cls.scrolls = {}

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


def start_fake_es() -> tuple[ThreadingHTTPServer, int]:
    """Start a fresh fake ES on an ephemeral port; returns (server,
    port). Caller must ``server.shutdown()`` when done (after
    materializing any DataFrame that still reads from it)."""
    FakeElasticsearch.reset()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), FakeElasticsearch)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_port
