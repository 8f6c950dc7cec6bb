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
import uuid

from pyspark.sql import DataFrame

from forklift_spark.connections.base import Connection


def _arrow_py_converter(t):
    """Value fixups from Arrow ``to_pylist`` natives to the Avro
    codec's Row-era contract, driven by the arrow TYPE so flat columns
    pay nothing: map values arrive as pair-lists -> dicts, tz-aware
    timestamps (nested; top-level columns are cast before to_pylist)
    -> naive UTC wall clock. Returns None when the type needs no
    conversion (the common case)."""
    import datetime as _dt

    import pyarrow as pa

    if pa.types.is_map(t):
        vc = _arrow_py_converter(t.item_type)

        def f_map(v, vc=vc):
            if v is None:
                return None
            if vc is None:
                return dict(v)
            return {k: (None if x is None else vc(x)) for k, x in v}
        return f_map
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        ec = _arrow_py_converter(t.value_type)
        if ec is None:
            return None
        return lambda v: None if v is None else [
            None if x is None else ec(x) for x in v
        ]
    if pa.types.is_struct(t):
        convs = {
            f.name: c
            for f in t
            if (c := _arrow_py_converter(f.type)) is not None
        }
        if not convs:
            return None

        def f_struct(v, convs=convs):
            if v is None:
                return None
            return {
                k: (convs[k](x) if k in convs and x is not None else x)
                for k, x in v.items()
            }
        return f_struct
    if pa.types.is_timestamp(t) and t.tz is not None:
        return lambda v: None if v is None else v.astimezone(
            _dt.timezone.utc).replace(tzinfo=None)
    return None


def _avro_native_column(col):
    """Top-level fast boundary for the pure-codec write (guide §4):
    convert an Arrow column straight to the codec's *alternate accepted
    representation* — skipping the Decimal/date/datetime Python objects
    ``to_pylist`` would build only for the encoder to tear back down.
    Byte-identical output by construction: ``e_decimal`` accepts the
    minimal two's-complement big-endian bytes it would itself produce,
    ``e_date``/``e_ts_*`` accept the epoch ints they would compute
    (``test_avro_pure`` pins the parity). Returns None when the type has
    no such representation (caller falls back to ``to_pylist``)."""
    import pyarrow as pa

    t = col.type
    if pa.types.is_decimal128(t):
        # unscaled int128 lives little-endian in the 16-byte storage;
        # Avro wants minimal big-endian two's complement of the same
        # unscaled value (the arrow scale equals the Avro schema scale
        # — both derive from the Spark DecimalType)
        out: list = []
        ifb = int.from_bytes
        for chunk in (col.chunks if isinstance(col, pa.ChunkedArray)
                      else [col]):
            mv = memoryview(chunk.buffers()[1])
            off = chunk.offset
            valid = (chunk.is_valid().to_pylist() if chunk.null_count
                     else None)
            for i in range(len(chunk)):
                if valid is not None and not valid[i]:
                    out.append(None)
                    continue
                j = (off + i) * 16
                u = ifb(mv[j:j + 16], "little", signed=True)
                out.append(u.to_bytes(max(1, (u.bit_length() + 8) // 8),
                                      "big", signed=True))
        return out
    if pa.types.is_date32(t):
        return col.cast(pa.int32()).to_pylist()  # days since epoch
    if pa.types.is_timestamp(t) and t.tz is None and t.unit == "us":
        return col.cast(pa.int64()).to_pylist()  # micros since epoch
    return None


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
    """Avro interchange with two engines: the ``spark-avro`` jar when it
    is on the classpath (vectorized, any Hadoop filesystem), else the
    pure-Python container codec (``functions/avrocodec.py``) — decode
    fans out one Spark task per container file, encode writes one
    container file per partition, so both directions stay executor-side
    and distributed even without the jar. The pure path needs a
    filesystem every executor can open with ``open()`` (local volume /
    NFS); point it at HDFS/S3 and you want the jar.

    Force a path with ``engine=("jar"|"pure")``; default tries the jar
    first and falls back."""

    FORMAT = "avro"

    @staticmethod
    def _jar_missing(exc: Exception) -> bool:
        """True only for the jar-absent failure shapes (the datasource
        class can't be found). Any OTHER jar-path exception — corrupt
        file, partial write, schema error — must propagate: silently
        re-attempting it through the pure codec would mask the failure
        and double-write (ADVICE r6 item 3)."""
        s = str(exc)
        return ("Failed to find data source" in s
                or "FAILED_TO_FIND_DATA_SOURCE" in s
                or "DATA_SOURCE_NOT_FOUND" in s
                or "ClassNotFoundException" in s)

    def read(self, query_or_table: str | None = None, schema=None,
             engine: str = "auto", **kwargs) -> DataFrame:
        path = query_or_table or self.file
        if engine != "pure":
            try:
                return super().read(path, schema=schema, **kwargs)
            except Exception as exc:
                if engine == "jar":
                    raise RuntimeError(_AVRO_HINT) from exc
                if not self._jar_missing(exc):
                    raise
        return self._read_pure(path, schema=schema)

    def write(self, df: DataFrame, table: str | None = None,
              mode: str = "append", engine: str = "auto", **kwargs) -> None:
        path = table or self.file
        if engine != "pure":
            try:
                super().write(df, path, mode=mode, **kwargs)
                return
            except Exception as exc:
                if engine == "jar":
                    raise RuntimeError(_AVRO_HINT) from exc
                if not self._jar_missing(exc):
                    raise
        self._write_pure(df, path, mode=mode,
                         codec=kwargs.get("compression", self.compression))

    # -- pure-Python distributed paths --------------------------------------

    def _avro_files(self, path: str) -> list[str]:
        if os.path.isfile(path):
            return [path]
        if os.path.isdir(path):
            return sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if f.endswith(".avro")
            )
        raise FileNotFoundError(f"no avro file or directory at {path}")

    def _read_pure(self, path: str, schema=None) -> DataFrame:
        from forklift_spark.functions import avrocodec as av

        files = self._avro_files(path)
        if not files:
            raise FileNotFoundError(f"no *.avro files under {path}")
        with open(files[0], "rb") as fh:
            a_schema, _codec = av.read_container_header(fh.read(1 << 20))
        spark_schema = schema
        if spark_schema is None:
            spark_schema, _ = av.avro_to_spark_type(a_schema)
        spark = self.engine.spark
        schema_json = spark_schema.json()

        def _decode_files(batches):
            # Arrow leaf (optimization r8, guide §4.1): decode each
            # container file and hand the rows back as Arrow batches —
            # the old createDataFrame(rdd) path pickled every row
            # JVM-side one at a time. Naive datetimes from the codec
            # are wall-clock UTC (the session tz), matching the
            # tz-aware-UTC arrow type below.
            import pyarrow as pa
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType

            target = to_arrow_schema(StructType.fromJson(
                __import__("json").loads(schema_json)))
            for b in batches:
                for fp in b.column("path").to_pylist():
                    _, rows = av.read_container_file(fp)
                    if not rows:
                        continue
                    tbl = pa.Table.from_pylist(rows, schema=target)
                    yield from tbl.to_batches(max_chunksize=1 << 16)

        paths = spark.createDataFrame(
            [(f,) for f in files], "path string"
        ).repartition(len(files))
        return paths.mapInArrow(_decode_files, spark_schema)

    def _write_pure(self, df: DataFrame, path: str, mode: str = "append",
                    codec: str | None = None) -> None:
        from forklift_spark.functions import avrocodec as av

        spark_mode = {"append": "append", "overwrite": "overwrite",
                      "truncate": "overwrite"}[mode]
        if spark_mode == "overwrite" and os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        a_schema = av.spark_to_avro_schema(df.schema)
        schema_json = __import__("json").dumps(a_schema)
        run_id = uuid.uuid4().hex[:12]  # unique per write() for append
        use_codec = codec or "deflate"
        if use_codec == "none":
            use_codec = "null"

        def _write_partition(batches):
            # Arrow leaf (optimization r8, guide §4.1): rows arrive as
            # Arrow batches and transpose to positional tuples column-
            # wise — the old df.rdd path pickled every row out of the
            # JVM one at a time. to_pylist yields the same Python
            # natives Row fields carried (int/Decimal/date/str), with
            # two codec-contract fixups handled by _arrow_py_converter:
            # map values arrive as pair-lists (codec wants dicts) and
            # tz-aware UTC timestamps are stripped to the naive UTC
            # wall clock. NOTE the wire contract (ADVICE r8 low): the
            # encoded timestamp-micros value is the UTC epoch micros,
            # independent of the host timezone — the old Row path's
            # df.rdd delivered naive LOCAL wall clocks, so on non-UTC
            # hosts it wrote different (spec-incorrect) on-wire values;
            # naive-UTC is the intended contract and what the codec's
            # pure epoch arithmetic (no tz calls) preserves on any host
            # (pinned by test_avro_timestamp_wire_tz_independent).
            import pyarrow as pa
            from pyspark import TaskContext

            idx = TaskContext.get().partitionId()
            data: list[tuple] = []
            for b in batches:
                cols = []
                for col in b.columns:
                    t = col.type
                    if pa.types.is_timestamp(t) and t.tz is not None:
                        col = col.cast(pa.timestamp(t.unit))
                        t = col.type
                    native = _avro_native_column(col)
                    if native is not None:
                        cols.append(native)
                        continue
                    vals = col.to_pylist()
                    conv = _arrow_py_converter(t)
                    if conv is not None:
                        vals = [conv(v) for v in vals]
                    cols.append(vals)
                data.extend(zip(*cols) if cols else [])
            if not data and idx != 0:
                return  # empty non-first partitions write nothing
            out = os.path.join(path, f"part-{idx:05d}-{run_id}.avro")
            av.write_container_file(out, schema_json, data, codec=use_codec)
            yield pa.RecordBatch.from_pylist([{"idx": idx, "n": len(data)}])

        # one container file per partition (same layout as Spark file
        # sinks); the tiny (idx, count) summary is the only driver data
        counts = [
            (r["idx"], r["n"])
            for r in df.mapInArrow(
                _write_partition, "idx long, n long"
            ).collect()
        ]
        self.engine.logger.log(
            f"wrote avro {path} ({mode}, pure-python, "
            f"{len(counts)} files, {sum(c for _, c in counts)} rows)"
        )


_AVRO_HINT = (
    "avro support needs the external spark-avro module; start the session "
    "with spark.jars.packages=org.apache.spark:spark-avro_2.13:<spark version>"
)
