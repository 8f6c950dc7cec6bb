"""JDBC connection (the reference's MySQL transport, `transports/mysql.rb`).

Config keys: ``url`` (jdbc:mysql://...), ``user``, ``password``,
``driver``, optional ``partition_column`` / ``num_partitions`` /
``fetchsize``. The reference's LIMIT/OFFSET pagination loop
(`mysql.rb:28-52`) — O(n²) on the server and not snapshot-consistent —
is replaced by Spark's partitioned JDBC scan: ``partitionColumn`` +
``lowerBound/upperBound`` + ``numPartitions`` parallel range reads.

No JDBC driver jar ships in this image, so the class degrades to a
clear error at use (not import) time; the full read/write surface is
unit-tested against the parquet connection which shares the writer
semantics.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from forklift_spark.connections.base import Connection

# word-boundary anchored: a table named "selected_items" is a table, not
# a SQL statement (same regex as ParquetConnection)
_SQL_RE = re.compile(r"^\s*(select|with)\b", re.IGNORECASE)


class JdbcConnection(Connection):
    def __init__(self, config, engine, name: str = ""):
        super().__init__(config, engine, name)
        self.url = config.get("url", "")
        if not self.url:
            raise ValueError("jdbc connection requires 'url'")

    def _props(self) -> dict[str, str]:
        p = {"fetchsize": str(self.config.get("fetchsize", 10_000))}
        for k in ("user", "password", "driver"):
            if k in self.config:
                p[k] = str(self.config[k])
        return p

    def _reader(self):
        return (
            self.engine.spark.read.format("jdbc")
            .option("url", self.url)
            .options(**self._props())
        )

    def read(self, query_or_table: str, **kwargs) -> DataFrame:
        """Table name -> partitioned parallel scan; SQL -> pushdown subquery
        (the entire statement executes in the source DB — the reference's
        'SQL transformations run where the data lives' stance)."""
        is_sql = bool(_SQL_RE.match(query_or_table))
        r = self._reader()
        if is_sql:
            r = r.option("dbtable", f"({query_or_table}) AS q")
        else:
            r = r.option("dbtable", query_or_table)
            pc = kwargs.get("partition_column", self.config.get("partition_column"))
            if pc:
                bounds = self._bounds(query_or_table, pc)
                if bounds:
                    r = (
                        r.option("partitionColumn", self._quote(pc))
                        .option("lowerBound", str(bounds[0]))
                        .option("upperBound", str(bounds[1]))
                        .option(
                            "numPartitions",
                            str(kwargs.get("num_partitions", self.config.get("num_partitions", 32))),
                        )
                    )
        return r.load()

    def _quote(self, ident: str) -> str:
        """Dialect identifier quoting for engine-generated SQL (Spark's
        JDBC writer creates quoted, case-sensitive identifiers)."""
        q = "`" if self.url.startswith("jdbc:mysql") else '"'
        return f"{q}{ident}{q}"

    def _bounds(self, table: str, col: str):
        c = self._quote(col)
        row = (
            self._reader()
            .option("dbtable", f"(SELECT MIN({c}) lo, MAX({c}) hi FROM {table}) AS b")
            .load()
            .collect()[0]
        )
        # positional access: backends normalize unquoted alias case
        # differently (Derby uppercases, MySQL preserves)
        if row[0] is None:
            return None
        return row[0], row[1]

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "upsert",
        primary_key: str = "id",
        **kwargs,
    ) -> None:
        w = (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
            .option("batchsize", str(self.config.get("batchsize", 10_000)))
            .options(**self._props())
        )
        if mode in ("append", "overwrite"):
            w.mode(mode).save()
        elif mode == "upsert":
            # True MERGE needs server-side SQL; emulate with the same plan
            # the parquet writer uses: anti-join existing against incoming
            # pks, then overwrite. (With a live server you would instead
            # stage + INSERT ... ON DUPLICATE KEY UPDATE per partition.)
            existing = self.read(table)
            pk = [primary_key] if isinstance(primary_key, str) else list(primary_key)
            keys = df.select(*pk).distinct()
            kept = existing.join(keys, pk, "left_anti")
            merged = kept.unionByName(df, allowMissingColumns=True)
            # materialize BEFORE the overwrite: the overwrite drops the
            # table the merged plan lazily reads from (self-overwrite
            # hazard — the JDBC analog of the parquet staging swap).
            # localCheckpoint (eager) truncates lineage so no partition can
            # recompute against the dropped table; a plain cache() is
            # evictable and would silently lose rows on recompute.
            merged = merged.localCheckpoint(eager=True)
            w2 = (
                merged.write.format("jdbc")
                .option("url", self.url)
                .option("dbtable", table)
                .options(**self._props())
            )
            w2.mode("overwrite").save()
        else:
            raise ValueError(f"unknown mode {mode!r}")
        self.engine.logger.log(f"wrote jdbc {table} ({mode})")

    def tables(self) -> list[str]:
        """User tables on the endpoint via ``DatabaseMetaData.getTables``
        (reference `SHOW TABLES`, `transports/mysql.rb:170-176`) — the
        driver-side metadata call every JDBC driver implements, reached
        through py4j. Enables whole-endpoint ``dump()`` (the reference's
        mysqldump use case, `transports/mysql.rb:209-232`)."""
        jvm = self.engine.spark._jvm
        gw = self.engine.spark.sparkContext._gateway
        if "driver" in self.config:
            jvm.java.lang.Class.forName(self.config["driver"])
        props = jvm.java.util.Properties()
        for k in ("user", "password"):
            if k in self.config:
                props.setProperty(k, str(self.config[k]))
        conn = jvm.java.sql.DriverManager.getConnection(self.url, props)
        try:
            types = gw.new_array(jvm.java.lang.String, 1)
            types[0] = "TABLE"
            # catalog/schema scoped to the connection's defaults when the
            # driver exposes them (MySQL: catalog = database; Derby:
            # schema = user or APP); fall back to unscoped + system filter
            try:
                catalog = conn.getCatalog()
            except Exception:
                catalog = None
            try:
                schema = conn.getSchema()
            except Exception:
                schema = None
            rs = conn.getMetaData().getTables(catalog, schema, "%", types)
            out = []
            while rs.next():
                sch = rs.getString("TABLE_SCHEM") or ""
                if sch.upper().startswith("SYS") or sch.upper() == "INFORMATION_SCHEMA":
                    continue
                out.append(rs.getString("TABLE_NAME"))
            rs.close()
            return sorted(out)
        finally:
            conn.close()
