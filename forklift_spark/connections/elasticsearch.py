"""Elasticsearch connection (`transports/elasticsearch.rb`).

The production path is the elasticsearch-hadoop Spark connector
(``org.elasticsearch.spark.sql``): the connector shards the scroll
across executors (replacing the reference's from/size pagination,
`elasticsearch.rb:18-41`) and maps ``primary_key`` upserts to
``es.mapping.id`` (`elasticsearch.rb:50-53`). The connector jar is not
in this image (SURVEY §7 risk 5), so reads/writes raise a clear error
at use time; the option-plumbing is unit-testable without a cluster.

Config: ``{nodes: host:port, index: ..., query: {...}}``.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from forklift_spark.connections.base import Connection

ES_FORMAT = "org.elasticsearch.spark.sql"


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

    def read(self, index: str, query: dict | None = None, **kwargs) -> DataFrame:
        if not self._available():
            raise NotImplementedError(
                "elasticsearch-hadoop connector jar not on classpath; "
                "add org.elasticsearch:elasticsearch-spark-30 to spark.jars.packages"
            )
        r = (
            self.engine.spark.read.format(ES_FORMAT)
            .option("es.nodes", self.nodes)
        )
        if query is not None:
            r = r.option("es.query", json.dumps({"query": query}))
        return r.load(index)

    def write(
        self,
        df: DataFrame,
        index: str,
        mode: str = "append",
        primary_key: str | None = None,
        **kwargs,
    ) -> None:
        if not self._available():
            raise NotImplementedError(
                "elasticsearch-hadoop connector jar not on classpath"
            )
        w = df.write.format(ES_FORMAT).option("es.nodes", self.nodes)
        if primary_key:  # upsert-by-id (`elasticsearch.rb:50-53`)
            w = w.option("es.mapping.id", primary_key).option(
                "es.write.operation", "upsert"
            )
        w.mode("append").save(index)

    def delete_index(self, index: str, timeout: float = 10.0) -> bool:
        """Delete the index if it exists (`elasticsearch.rb:61-64`) via
        the REST API — no connector jar needed. Returns True when the
        index was deleted, False when it didn't exist."""
        import urllib.error
        import urllib.request

        host = self.nodes.split(",")[0]
        if "://" not in host:
            host = f"http://{host}"
        req = urllib.request.Request(f"{host}/{index}", method="DELETE")
        try:
            with urllib.request.urlopen(req, timeout=timeout):
                return True
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return False
            raise
