"""Elasticsearch connection (`transports/elasticsearch.rb`).

Two transports behind one interface:

- **Connector path** (preferred when the elasticsearch-hadoop jar is on
  the classpath): ``org.elasticsearch.spark.sql`` shards the scroll
  across executors and maps ``primary_key`` upserts to
  ``es.mapping.id`` (`elasticsearch.rb:50-53`).
- **REST shim** (no jar needed): the same semantics over the plain ES
  REST API. Reads run a *sliced scroll* — one slice per Spark task, so
  the scan is distributed exactly like the connector's, not a
  driver-side pagination loop (the reference's from/size loop,
  `elasticsearch.rb:18-41`, is O(n²) server-side and single-threaded).
  Writes batch ``_bulk`` index-by-id actions per partition on the
  executors (`elasticsearch.rb:44-59`).

Config: ``{nodes: host:port, index: ..., query: {...}}``.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from forklift_spark.connections.base import Connection

ES_FORMAT = "org.elasticsearch.spark.sql"


def _http_json(url: str, method: str = "GET", body=None, timeout: float = 30.0):
    """Minimal stdlib JSON-over-HTTP call (runs on driver AND executors)."""
    import urllib.request

    data = None
    headers = {}
    if body is not None:
        if isinstance(body, str):  # ndjson (bulk) passed pre-encoded
            data = body.encode()
            headers["Content-Type"] = "application/x-ndjson"
        else:
            data = json.dumps(body).encode()
            headers["Content-Type"] = "application/json"
    req = urllib.request.Request(url, data=data, method=method, headers=headers)
    with urllib.request.urlopen(req, timeout=timeout) as r:
        text = r.read().decode() or "{}"
    return json.loads(text)


class ElasticsearchConnection(Connection):
    def __init__(self, config, engine, name: str = ""):
        super().__init__(config, engine, name)
        self.nodes = config.get("nodes", "localhost:9200")

    def _available(self) -> bool:
        try:
            jvm = self.engine.spark._jvm
            jvm.java.lang.Class.forName("org.elasticsearch.spark.sql.DefaultSource")
            return True
        except Exception:
            return False

    def _base(self) -> str:
        host = self.nodes.split(",")[0]
        if "://" not in host:
            host = f"http://{host}"
        return host

    # -- reads -------------------------------------------------------------
    def read(self, index: str, query: dict | None = None, **kwargs) -> DataFrame:
        if self._available():
            r = self.engine.spark.read.format(ES_FORMAT).option("es.nodes", self.nodes)
            if query is not None:
                r = r.option("es.query", json.dumps({"query": query}))
            return r.load(index)
        return self._read_rest(index, query, **kwargs)

    def _read_rest(
        self,
        index: str,
        query: dict | None = None,
        slices: int | None = None,
        page_size: int = 1000,
        **_,
    ) -> DataFrame:
        """Distributed sliced-scroll read. The driver fetches one page to
        infer the schema; the full scan then runs as ``slices`` parallel
        scroll cursors, one per task — ES partitions the shards across
        slices server-side, so this is the same scan shape the hadoop
        connector (and a 1000-executor cluster) uses."""
        spark = self.engine.spark
        base = self._base()
        body = {"query": query if query is not None else {"match_all": {}}}
        probe = _http_json(
            f"{base}/{index}/_search", "POST", {**body, "size": page_size}
        )
        sample = [json.dumps(h["_source"]) for h in probe["hits"]["hits"]]
        if not sample:
            return spark.createDataFrame([], T.StructType([]))
        schema = spark.read.json(spark.sparkContext.parallelize(sample)).schema

        n = slices or min(32, spark.sparkContext.defaultParallelism)
        total = probe["hits"]["total"]
        total = total["value"] if isinstance(total, dict) else total
        if total <= len(sample):
            # probe already saw everything — no second scan
            return spark.read.json(spark.sparkContext.parallelize(sample), schema=schema)

        def fetch_slice(rows):
            for row in rows:
                sid = row["id"]
                first = {**body, "size": page_size, "sort": ["_doc"]}
                if n > 1:
                    first["slice"] = {"id": int(sid), "max": n}
                page = _http_json(f"{base}/{index}/_search?scroll=2m", "POST", first)
                while True:
                    hits = page["hits"]["hits"]
                    if not hits:
                        break
                    for h in hits:
                        yield json.dumps(h["_source"])
                    page = _http_json(
                        f"{base}/_search/scroll",
                        "POST",
                        {"scroll": "2m", "scroll_id": page["_scroll_id"]},
                    )

        # n single-row partitions -> one scroll cursor per task
        seeds = spark.range(0, n, 1, n)
        raw = seeds.rdd.mapPartitions(fetch_slice)
        return spark.read.json(raw, schema=schema)

    # -- writes ------------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        index: str,
        mode: str = "append",
        primary_key: str | None = None,
        **kwargs,
    ) -> None:
        if self._available():
            w = df.write.format(ES_FORMAT).option("es.nodes", self.nodes)
            if primary_key:  # upsert-by-id (`elasticsearch.rb:50-53`)
                w = w.option("es.mapping.id", primary_key).option(
                    "es.write.operation", "upsert"
                )
            w.mode("append").save(index)
            return
        self._write_rest(df, index, primary_key=primary_key, **kwargs)

    def _write_rest(
        self,
        df: DataFrame,
        index: str,
        primary_key: str | None = None,
        batch_docs: int = 500,
        **_,
    ) -> None:
        """Executor-side ``_bulk`` writer: each partition serializes its
        rows (JVM ``to_json``) and POSTs index actions in ``batch_docs``
        chunks. With a primary key the action carries ``_id``, so a
        re-write of the same key replaces the document — the reference's
        update=true path (`elasticsearch.rb:50-53`)."""
        base = self._base()
        cols = [F.col(c) for c in df.columns]
        pk = (
            F.col(primary_key).cast("string")
            if primary_key
            else F.lit(None).cast("string")
        )
        payload = df.select(
            F.to_json(F.struct(*cols)).alias("doc"), pk.alias("pk")
        )

        def send(rows):
            buf: list[str] = []

            def flush():
                if not buf:
                    return
                resp = _http_json(f"{base}/_bulk", "POST", "\n".join(buf) + "\n")
                if resp.get("errors"):
                    bad = [
                        i["index"]
                        for i in resp.get("items", [])
                        if i.get("index", {}).get("status", 200) >= 300
                    ][:3]
                    raise RuntimeError(f"es bulk rejected documents: {bad}")
                buf.clear()

            for row in rows:
                action = {"index": {"_index": index}}
                if row["pk"] is not None:
                    action["index"]["_id"] = row["pk"]
                buf.append(json.dumps(action))
                buf.append(row["doc"])
                if len(buf) >= 2 * batch_docs:
                    flush()
            flush()

        payload.foreachPartition(send)
        _http_json(f"{base}/{index}/_refresh", "POST", {})
        self.engine.logger.log(f"wrote es index {index} via _bulk")

    # -- index admin -------------------------------------------------------
    def delete_index(self, index: str, timeout: float = 10.0) -> bool:
        """Delete the index if it exists (`elasticsearch.rb:61-64`) via
        the REST API — no connector jar needed. Returns True when the
        index was deleted, False when it didn't exist."""
        import urllib.error
        import urllib.request

        req = urllib.request.Request(f"{self._base()}/{index}", method="DELETE")
        try:
            with urllib.request.urlopen(req, timeout=timeout):
                return True
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return False
            raise
