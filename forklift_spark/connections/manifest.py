"""Manifest-warehouse connection: the transactional MERGE table format
(forklift_spark/manifest.py) behind the standard Connection surface, so
plans and patterns (pipe / incremental_pipe / optimistic_pipe) target it
unchanged — and the HWM sync's upsert becomes a partition-pruned MERGE,
O(touched partitions) per run instead of the plain writer's O(table).

Config::

    path: /warehouse/dir          # directory of manifest tables
    partition_by:                 # optional per-table partition columns
      events: event_type
      orders: order_year

``read`` accepts a table name (snapshot read; ``version=`` time travel,
``partitions=`` / ``where=`` manifest pruning) or a SQL string (tables
under the root are registered as temp views — the reference's
pass-through `q(sql)`, `transports/mysql.rb:251-254`).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame

from forklift_spark.connections.base import Connection
from forklift_spark.manifest import ManifestTable

_SQL_RE = re.compile(r"^\s*(select|with)\b", re.IGNORECASE)
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


class ManifestConnection(Connection):
    def __init__(self, config, engine, name: str = ""):
        super().__init__(config, engine, name)
        self.root = config["path"]
        self.partition_by = dict(config.get("partition_by") or {})

    def table(self, name: str) -> ManifestTable:
        return ManifestTable(self.engine.spark, self.root, name)

    def exists(self, name: str) -> bool:
        return self.table(name).exists()

    # -- reads -------------------------------------------------------------
    def sql(self, statement: str) -> DataFrame:
        """Pure-SQL access to manifest tables, including time travel:
        ``SELECT ... FROM <table> VERSION AS OF <n>`` reads that pinned
        snapshot (rewritten to a registered snapshot view — see
        manifest.rewrite_time_travel); bare table names read the head.
        Also the statement runner for U3 SQL-script transformations on
        this connection."""
        from forklift_spark.manifest import rewrite_time_travel

        known = set(self.tables())
        statement = rewrite_time_travel(
            statement, lambda n: self.table(n) if n in known else None
        )
        for ident in set(_IDENT_RE.findall(statement)):
            if ident in known:
                self.table(ident).read().createOrReplaceTempView(ident)
        return self.engine.spark.sql(statement)

    def read(self, query_or_table: str, **kwargs) -> DataFrame:
        if _SQL_RE.match(query_or_table):
            return self.sql(query_or_table)
        return self.table(query_or_table).read(
            version=kwargs.get("version"),
            partitions=kwargs.get("partitions"),
            where=kwargs.get("where"),
        )

    # -- writes ------------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "upsert",
        primary_key: str = "id",
        partition_by: str | None = None,
        **kwargs,
    ) -> None:
        t = self.table(table)
        part = partition_by or self.partition_by.get(table)
        if not t.exists():
            t.create(df, partition_by=part)
            op = "create"
        elif mode == "overwrite":
            t.overwrite(df)
            op = "overwrite"
        elif mode in ("upsert", "merge"):
            stats = t.merge(df, on=primary_key)
            op = f"merge v{stats['version']} touched={len(stats['touched_partitions'])}"
        else:
            raise ValueError(
                f"manifest connection supports overwrite/upsert, not {mode!r}"
            )
        self.engine.logger.log(f"manifest {table}: {op} in {self.name or self.root}")

    # -- table utilities (P10) ---------------------------------------------
    def tables(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.isfile(os.path.join(self.root, d, "_current"))
        )

    def drop(self, table: str) -> None:
        shutil.rmtree(os.path.join(self.root, table), ignore_errors=True)

    def count(self, table: str) -> int:
        t = self.table(table)
        n = t.count_rows()  # metadata-only when stats are complete
        return n if n is not None else t.read().count()
