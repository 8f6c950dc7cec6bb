"""Parquet warehouse connection: directory-per-table, the engine's
default store (plays the role of the reference's MySQL warehouse).

Config: ``{path: /warehouse/dir}``. ``read`` accepts a table name or a
SQL string (tables under the root are registered as temp views on
demand, so arbitrary SELECTs work — the analog of the reference's
pass-through `q(sql)`, `transports/mysql.rb:251-254`).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame

from forklift_spark.connections.base import Connection
from forklift_spark.writer import ParquetTableWriter

_SQL_RE = re.compile(r"^\s*(select|with)\b", re.IGNORECASE)
_VERSION_DIR_RE = re.compile(r"\.__v\d+__$")  # writer's retired generations
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


class ParquetConnection(Connection):
    def __init__(self, config, engine, name: str = ""):
        super().__init__(config, engine, name)
        self.root = config["path"]
        self.writer = ParquetTableWriter(
            engine.spark,
            self.root,
            retain_versions=int(config.get("retain_versions", 0)),
        )

    # -- reads -------------------------------------------------------------
    def read(self, query_or_table: str, **kwargs) -> DataFrame:
        if _SQL_RE.match(query_or_table):
            self._register_views(query_or_table)
            return self.engine.spark.sql(query_or_table)
        return self.writer.read(query_or_table)

    def read_version(self, table: str, back: int = 1) -> DataFrame:
        """Time travel: read the generation retired ``back`` publishes
        ago (writer must be configured with ``retain_versions > 0``)."""
        return self.writer.read_version(table, back)

    def versions(self, table: str) -> list[int]:
        return self.writer.versions(table)

    def _register_views(self, sql: str) -> None:
        known = set(self.tables())
        for ident in set(_IDENT_RE.findall(sql)):
            if ident in known:
                self.writer.read(ident).createOrReplaceTempView(ident)

    # -- writes ------------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "upsert",
        primary_key: str = "id",
        **kwargs,
    ) -> None:
        self.writer.write(df, table, mode=mode, primary_key=primary_key, **kwargs)
        self.engine.logger.log(f"wrote {table} ({mode}) in {self.name or self.root}")

    # -- table utilities (P10) --------------------------------------------
    def tables(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
            and "__staging__" not in d
            and "__old__" not in d
            and not _VERSION_DIR_RE.search(d)
        )

    def drop(self, table: str) -> None:
        shutil.rmtree(self.writer.path(table), ignore_errors=True)

    def rename(self, src: str, dst: str) -> None:
        self.drop(dst)
        os.rename(self.writer.path(src), self.writer.path(dst))

    def truncate(self, table: str) -> None:
        df = self.writer.read(table).limit(0)
        self.writer.write(df, table, mode="overwrite")

    def exists(self, table: str) -> bool:
        return self.writer.exists(table)
