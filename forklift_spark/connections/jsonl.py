"""JSON-Lines connection — the canonical exchange format of LLM
training-data pipelines (one JSON document per line, gzip-shardable).

No reference counterpart (the reference predates the format's
ubiquity); modeled on the CSV transport surface (`transports/csv.rb`):
read with optional explicit schema, append / overwrite / truncate
writes, optional gzip. A 100 TB JSONL corpus reads in parallel out of
the box (uncompressed JSONL is splittable; .gz shards parallelize at
file granularity — write many shards). Schema inference samples the
data; production paths should pass ``read(schema=...)`` so the scan
skips the inference pass and malformed lines land in
``_corrupt_record`` instead of poisoning types.

Config: ``{file: /path/to/dir-or-file.jsonl, compression: gzip?}``.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

from forklift_spark.connections.base import Connection


class JsonlConnection(Connection):
    def __init__(self, config, engine, name: str = ""):
        super().__init__(config, engine, name)
        self.file = config["file"]
        self.compression = config.get("compression")

    def read(self, query_or_table: str | None = None, schema=None, **kwargs) -> DataFrame:
        path = query_or_table or self.file
        reader = self.engine.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(path, **kwargs)

    def write(
        self,
        df: DataFrame,
        table: str | None = None,
        mode: str = "append",
        **kwargs,
    ) -> None:
        path = table or self.file
        spark_mode = {"append": "append", "overwrite": "overwrite", "truncate": "overwrite"}[mode]
        w = df.write.mode(spark_mode)
        comp = kwargs.pop("compression", self.compression)
        if comp:
            w = w.option("compression", comp)
        w.json(path, **kwargs)
        self.engine.logger.log(f"wrote jsonl {path} ({mode})")

    def tables(self) -> list[str]:
        return [os.path.basename(self.file)]

    def drop(self, path: str | None = None) -> None:
        p = path or self.file
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        elif os.path.exists(p):
            os.remove(p)
