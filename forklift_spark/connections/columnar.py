"""Columnar file-format connections: ORC (built-in) and Avro (gated).

No reference counterpart (the reference moves rows through MySQL/ES/CSV
only, `lib/forklift/base/connection.rb:25-28`); these round out the
interchange formats a Spark-native warehouse meets in practice. Both
expose the same surface as the CSV/JSONL transports: read with optional
schema, append / overwrite / truncate writes, drop.

ORC ships inside Spark (vectorized reader, predicate pushdown, column
pruning — same scan properties as parquet). Avro is an external Spark
module (`spark-avro` jar); like the Elasticsearch connector-jar path,
the connection degrades cleanly with an actionable error when the jar
isn't on the classpath, and works unchanged when it is.

Config: ``{file: /path/to/dir}`` (+ ``compression`` for write).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

from forklift_spark.connections.base import Connection


class _FileFormatConnection(Connection):
    FORMAT = ""

    def __init__(self, config, engine, name: str = ""):
        super().__init__(config, engine, name)
        self.file = config["file"]
        self.compression = config.get("compression")

    def read(self, query_or_table: str | None = None, schema=None, **kwargs) -> DataFrame:
        path = query_or_table or self.file
        reader = self.engine.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.format(self.FORMAT).options(**kwargs).load(path)

    def write(
        self,
        df: DataFrame,
        table: str | None = None,
        mode: str = "append",
        **kwargs,
    ) -> None:
        path = table or self.file
        spark_mode = {"append": "append", "overwrite": "overwrite", "truncate": "overwrite"}[mode]
        w = df.write.mode(spark_mode).format(self.FORMAT)
        comp = kwargs.pop("compression", self.compression)
        if comp:
            w = w.option("compression", comp)
        w.options(**kwargs).save(path)
        self.engine.logger.log(f"wrote {self.FORMAT} {path} ({mode})")

    def tables(self) -> list[str]:
        return [os.path.basename(self.file)]

    def drop(self, path: str | None = None) -> None:
        p = path or self.file
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        elif os.path.exists(p):
            os.remove(p)


class OrcConnection(_FileFormatConnection):
    FORMAT = "orc"


class AvroConnection(_FileFormatConnection):
    """Requires the spark-avro module on the session classpath
    (``--packages org.apache.spark:spark-avro_2.13:<spark-version>``)."""

    FORMAT = "avro"

    def read(self, query_or_table: str | None = None, schema=None, **kwargs) -> DataFrame:
        try:
            return super().read(query_or_table, schema=schema, **kwargs)
        except Exception as exc:
            raise RuntimeError(_AVRO_HINT) from exc

    def write(self, df: DataFrame, table: str | None = None, mode: str = "append", **kwargs) -> None:
        try:
            super().write(df, table, mode=mode, **kwargs)
        except Exception as exc:
            raise RuntimeError(_AVRO_HINT) from exc


_AVRO_HINT = (
    "avro support needs the external spark-avro module; start the session "
    "with spark.jars.packages=org.apache.spark:spark-avro_2.13:<spark version>"
)
