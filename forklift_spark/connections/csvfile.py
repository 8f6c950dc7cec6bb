"""CSV connection (`transports/csv.rb`): header + automatic type
coercion on read (Ruby CSV ``converters: :all`` -> inferSchema), append
or truncate-then-write on write (`csv.rb:31-51`).

Config: ``{file: /path/to.csv}`` (a file or a directory of parts).
A 100 TB CSV source reads in parallel out of the box (splittable
uncompressed CSV); schema inference samples — pass an explicit schema
via ``read(schema=...)`` in production paths.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

from forklift_spark.connections.base import Connection


class CsvConnection(Connection):
    def __init__(self, config, engine, name: str = ""):
        super().__init__(config, engine, name)
        self.file = config["file"]

    def read(self, query_or_table: str | None = None, schema=None, **kwargs) -> DataFrame:
        path = query_or_table or self.file
        reader = self.engine.spark.read
        if schema is not None:
            reader = reader.schema(schema)
            return reader.csv(path, header=True, **kwargs)
        return reader.csv(path, header=True, inferSchema=True, **kwargs)

    def write(self, df: DataFrame, table: str | None = None, mode: str = "append", **kwargs) -> None:
        path = table or self.file
        spark_mode = {"append": "append", "overwrite": "overwrite", "truncate": "overwrite"}[mode]
        df.write.mode(spark_mode).csv(path, header=True, **kwargs)
        self.engine.logger.log(f"wrote csv {path} ({mode})")

    def tables(self) -> list[str]:
        return [os.path.basename(self.file)]

    def drop(self, path: str | None = None) -> None:
        p = path or self.file
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        elif os.path.exists(p):
            os.remove(p)
