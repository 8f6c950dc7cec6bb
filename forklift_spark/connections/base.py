"""Abstract Connection: read/write + transformation hooks.

Parity surface (`base/connection.rb`): ``read(query)`` / ``write(df,
table)`` / ``exec(path)`` / ``exec!`` per endpoint. Where the reference
yields 1000-row batches to a block (`transports/mysql.rb:28-52`), a
Connection returns a lazy DataFrame — batching, backpressure and
parallelism are Spark's job, and the whole read→transform→write pipeline
is one distributed plan instead of a driver-side loop.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


class Connection:
    """A typed endpoint. Subclasses implement _read/_write/tables."""

    def __init__(self, config: dict[str, Any], engine, name: str = ""):
        self.config = config or {}
        self.engine = engine
        self.name = name

    # -- data path ---------------------------------------------------------
    def read(self, query_or_table: str, **kwargs) -> DataFrame:
        """Read a table or a SQL query against this endpoint."""
        raise NotImplementedError

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "upsert",
        primary_key: str = "id",
        **kwargs,
    ) -> None:
        raise NotImplementedError

    def read_since(
        self,
        table: str,
        since,
        matcher: str = "updated_at",
    ) -> DataFrame:
        """Incremental (high-water-mark) scan: rows with matcher >= since,
        ordered by matcher (`transports/mysql.rb:149-158`). The predicate
        pushes down to the scan; ORDER BY survives only as a sort within
        the returned plan."""
        from pyspark.sql import functions as F

        df = self.read(table)
        return df.filter(F.col(matcher) >= F.lit(since)).orderBy(matcher)

    def max_timestamp(self, table: str, matcher: str = "updated_at"):
        """MAX(matcher) with epoch fallback when the table/value is missing
        (`transports/mysql.rb:160-168`). One of the two driver-visible
        scalars the engine allows (the other is count)."""
        import datetime

        from pyspark.sql import functions as F

        epoch = datetime.datetime(1970, 1, 1)
        try:
            df = self.read(table)
        except Exception:
            return epoch
        if matcher not in df.columns:
            return epoch
        row = df.agg(F.max(matcher).alias("hwm")).collect()[0]
        return row["hwm"] if row["hwm"] is not None else epoch

    def count(self, table: str) -> int:
        return self.read(table).count()

    def tables(self) -> list[str]:
        raise NotImplementedError

    def columns(self, table: str) -> list[tuple[str, str]]:
        return [(f.name, f.dataType.simpleString()) for f in self.read(table).schema.fields]

    def dump(self, dest_dir: str, tables: list[str] | None = None, fmt: str = "csv") -> list[str]:
        """Snapshot export of the whole endpoint (S9 parity: the
        `mysqldump … | gzip` subprocess at `transports/mysql.rb:209-232`).
        One gzip'd csv (or parquet) directory per table, written by the
        executors — a distributed job per table instead of a single-node
        pipe. Returns the dumped table names."""
        import os

        done = []
        for t in tables if tables is not None else self.tables():
            df = self.read(t)
            out = os.path.join(dest_dir, t)
            if fmt == "parquet":
                df.write.mode("overwrite").parquet(out)
            else:
                df.write.mode("overwrite").option("header", True).option(
                    "compression", "gzip"
                ).csv(out)
            done.append(t)
        return done

    # -- transformation hooks (U1-U3) -------------------------------------
    def exec(self, path: str, *args, **kwargs) -> bool:
        """Run a .py / .sql transformation; log errors and continue."""
        try:
            self.exec_strict(path, *args, **kwargs)
            return True
        except Exception as exc:
            self.engine.logger.error(f"transformation {path} failed: {exc}")
            return False

    def exec_strict(self, path: str, *args, **kwargs) -> None:
        """exec! — raise on failure (`base/connection.rb:44-51`)."""
        from forklift_spark.transform import run_transformation

        run_transformation(self, path, *args, **kwargs)

    # -- lifecycle ---------------------------------------------------------
    def connect(self) -> None:  # endpoints are lazy in Spark; no-op default
        pass

    def disconnect(self) -> None:
        pass
