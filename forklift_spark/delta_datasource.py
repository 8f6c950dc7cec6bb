"""Spark Python DataSource over Delta Lake tables (no delta jar):

    spark.dataSource.register(DeltaLiteDataSource)
    spark.read.format("deltalite").load(table_path)            # batch
    spark.readStream.format("deltalite")
         .option("cdc", "true").load(table_path)               # CDC tail

The BATCH reader plans one input partition per live logical file —
deletion-vector positions resolved at plan time from the log's DV
descriptors (pure-Python roaring decode) and subtracted per-file with
an Arrow mask; partition-column values (which Delta stores ONLY in the
log, never in the data files) are injected as constant Arrow columns.
The STREAM reader turns the version history into a structured-streaming
CDC feed: offsets are Delta versions, each microbatch carries the
row-level changes (``_change_type`` 'insert'|'delete' +
``_commit_version``) between the last committed version and the head —
the streaming twin of ``DeltaLiteTable.changelog()`` and the Delta
counterpart of the manifest format's CDC source (``datasource.py``).

Planning runs in the Python DataSource driver worker with NO
SparkSession, so everything here replays the ``_delta_log`` JSON
directly (``DeltaLiteTable`` with ``spark=None``); a log whose early
commits were cleaned past a parquet checkpoint refuses loudly for
streaming (the JSON replay is the only Spark-free path) — batch reads
of such tables go through ``DeltaLiteTable.read()`` instead.

Change semantics match the manifest stream source: append commits and
DV commits are row-exact (DV position diffs name exactly the changed
rows); rewrite commits emit file-level delete+insert events whose
multiset is correct (a consumer applying each microbatch's deletes
before its inserts converges to the table state); commits whose file
actions all carry ``dataChange: false`` (compaction) emit ZERO rows.

Reference analog: the incremental-consumption contract (S2,
`transports/mysql.rb:149-158`) as a live stream. Spec shapes from
delta.io PROTOCOL.md (Action Reconciliation, Deletion Vectors,
dataChange).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _DeltaFilePart(InputPartition):
    """One logical file: read everything except ``drop_pos``; or, when
    ``emit_pos`` is set, ONLY those row indices (dv diff events).
    ``pv`` maps LOGICAL partition column -> log-recorded string value;
    ``phys`` maps logical data column -> physical parquet name for
    columnMapping tables (None = names match).
    ``change`` is None for batch, else ('insert'|'delete', version)."""

    def __init__(self, path, pv=None, drop_pos=None, emit_pos=None,
                 change=None, schema_json=None, phys=None):
        self.path = path
        self.pv = pv or {}
        self.drop_pos = drop_pos
        self.emit_pos = emit_pos
        self.change = change
        self.schema_json = schema_json
        self.phys = phys


def _table(options):
    from forklift_spark.connections.deltalite import DeltaLiteTable

    path = options.get("path")
    if not path:
        raise ValueError("deltalite needs .load(<table path>)")
    return DeltaLiteTable(None, path)


def _snap_or_refuse(t, version):
    """Spark-free snapshot replay: JSON commits only. A table whose
    replay would need a parquet checkpoint (cleaned log) cannot be
    planned in the DataSource worker — refuse loudly."""
    versions = set(t.versions())
    target = max(versions) if version is None else int(version)
    json_covers = all(v in versions for v in range(0, target + 1))
    # snapshot() prefers the parquet checkpoint when the JSON history
    # is incomplete OR longer than its JSON-replay cutoff — both need
    # Spark here, so both refuse
    # NOT NotImplementedError: DataSourceReader.partitions() treats
    # that class as the "single partition" protocol signal and would
    # swallow the refusal into a silent empty scan
    if not json_covers or (t._last_checkpoint() and target + 1 > 512):
        raise ValueError(
            f"{t.path}: replaying to version {target} needs the parquet "
            "checkpoint (cleaned or long log) — the deltalite DataSource "
            "plans Spark-free and cannot read parquet checkpoints; use "
            "DeltaLiteTable.read() for batch, or stream from a table "
            "with retained JSON history")
    return t.snapshot(target)


def _cm_maps(snap) -> tuple[dict | None, list[str], dict]:
    """columnMapping support for the Arrow leaf: ``(phys, pcols_logical,
    pv_key)`` — logical->physical data-column names (None when names
    match), the partition columns under their LOGICAL names, and
    logical->pv-dict key (the spec tracks partitionValues by PHYSICAL
    name). Nested struct fields under column mapping refuse to the full
    reader — the flat rename here cannot reach them."""
    from pyspark.sql import types as T

    from forklift_spark.connections.deltalite import (
        _CM_PHYS,
        _cm_phys_name,
    )

    schema = snap["schema"]
    pcols = list(snap.get("partition_columns") or [])
    cm = snap.get("cm_mode", "none")
    if cm == "none":
        return None, pcols, {c: c for c in pcols}

    def _has_struct(dt) -> bool:
        if isinstance(dt, T.StructType):
            return True
        if isinstance(dt, T.ArrayType):
            return _has_struct(dt.elementType)
        if isinstance(dt, T.MapType):
            return _has_struct(dt.valueType)
        return False

    if any(_has_struct(f.dataType) for f in schema.fields):
        raise ValueError(
            "deltalite DataSource: columnMapping over nested struct "
            "fields is not supported here — use DeltaLiteTable.read()")
    phys = {f.name: _cm_phys_name(f, f.name) for f in schema.fields}
    by_phys = {(f.metadata or {}).get(_CM_PHYS): f.name
               for f in schema.fields}
    logical = set(schema.fieldNames())
    out_pcols, pv_key = [], {}
    for c in pcols:
        lc = c if c in logical else by_phys.get(c)
        if lc is None:
            raise ValueError(
                f"columnMapping: partition column {c!r} matches "
                "neither a logical field name nor any physicalName")
        out_pcols.append(lc)
        pv_key[lc] = phys[lc]
    return phys, out_pcols, pv_key


def _pv_logical(pv: dict, pcols: list[str], pv_key: dict) -> dict:
    return {c: pv.get(pv_key.get(c, c), pv.get(c)) for c in pcols}


def _dv_sets(t, files: dict) -> dict[str, frozenset]:
    """path -> masked positions, from the DV descriptors (pure-Python
    roaring/Z85 decode; metadata-scale)."""
    from forklift_spark.connections.deltalite import dv_positions

    out = {}
    for p, e in files.items():
        if e.get("dv"):
            out[p] = frozenset(dv_positions(t.path, e["dv"]))
    return out


def _read_delta_batches(part: _DeltaFilePart):
    """Arrow leaf: read the file, apply the position mask, align to the
    declared schema (missing columns null-filled, narrower physical
    types cast up — the typeWidening read rule), inject partition
    values and CDC columns as constants."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from forklift_spark.datasource import _arrow_schema

    target = _arrow_schema(json.loads(part.schema_json))
    tbl = pq.read_table(part.path)
    n = tbl.num_rows
    if part.emit_pos is not None:
        idx = sorted(p for p in part.emit_pos if p < n)
        tbl = tbl.take(pa.array(idx, type=pa.int64()))
    elif part.drop_pos:
        keep = [i for i in range(n) if i not in part.drop_pos]
        if len(keep) != n:
            tbl = tbl.take(pa.array(keep, type=pa.int64()))
    rows = tbl.num_rows
    cols = []
    for field in target:
        if field.name == "_change_type":
            cols.append(pa.array([part.change[0]] * rows,
                                 type=pa.string()))
        elif field.name == "_commit_version":
            cols.append(pa.array([part.change[1]] * rows,
                                 type=pa.int64()))
        elif field.name in part.pv:
            v = part.pv[field.name]
            if v is None or (v == "" and not pa.types.is_string(
                    field.type)):
                cols.append(pa.nulls(rows, type=field.type))
            else:  # spec: partition values serialize as strings
                cols.append(pa.array([v] * rows,
                                     type=pa.string()).cast(field.type))
        elif (fname := (part.phys or {}).get(field.name, field.name)) \
                in tbl.column_names:
            col = tbl.column(fname)
            if col.type != field.type:
                col = col.cast(field.type)
            cols.append(col.combine_chunks()
                        if hasattr(col, "combine_chunks") else col)
        else:
            cols.append(pa.nulls(rows, type=field.type))
    out = pa.table(cols, schema=target)
    for batch in out.to_batches(max_chunksize=1 << 16):
        yield batch


class _DeltaBatchReader(DataSourceReader):
    def __init__(self, options, schema_json: str):
        self._options = dict(options)
        self._schema_json = schema_json
        self._where: dict = {}  # col -> [lo, hi] interval bounds

    def pushFilters(self, filters):
        """Record interval predicates the log's own metadata can act on
        (partition values + add.stats bounds via
        ``DeltaLiteTable._prune_files``) and hand EVERY filter back to
        Spark — pruning only decides which FILES to open, rows are
        still filtered engine-side, so a conservative prune is always
        correct. Same contract as the manifest source's pushFilters."""
        from forklift_spark.datasource import _collect_bounds

        _collect_bounds(filters, self._where)
        return filters

    def partitions(self):
        t = _table(self._options)
        version = self._options.get("version")
        snap = _snap_or_refuse(
            t, int(version) if version is not None else None)
        where = {c: tuple(b) for c, b in self._where.items()
                 if b != [None, None]}
        if where:
            snap = dict(snap)
            snap["files"] = t._prune_files(snap, where)
        phys, pcols, pv_key = _cm_maps(snap)
        dv = _dv_sets(t, snap["files"])
        from forklift_spark.datasource import _pack_parts

        parts = []
        for p, e in sorted(snap["files"].items()):
            fp = _DeltaFilePart(
                os.path.join(t.path, p),
                pv=_pv_logical(e.get("pv") or {}, pcols, pv_key),
                drop_pos=dv.get(p), schema_json=self._schema_json,
                phys=phys)
            fp._nbytes = e.get("size") or 0
            parts.append(fp)
        parts = _pack_parts(parts, lambda p: getattr(p, "_nbytes", 0))
        return parts or [_DeltaFilePart(None, schema_json=None)]

    def read(self, partition):
        from forklift_spark.datasource import _GroupPart, _iter_group

        if isinstance(partition, _GroupPart):
            return _iter_group(partition, _read_delta_batches)
        if partition.path is None:
            return iter(())
        return _read_delta_batches(partition)


class _DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema_json: str):
        self._options = dict(options)
        self._schema_json = schema_json
        t = _table(options)
        start = options.get("starting_version")
        # kafka `latest` convention: tail only NEW commits by default;
        # starting_version replays history from the NEXT version on
        self._initial = (int(start) if start is not None
                         else t.latest_version())

    def initialOffset(self):
        return {"version": self._initial}

    def latestOffset(self):
        return {"version": _table(self._options).latest_version()}

    def commit(self, end):
        pass  # versions are durable on disk; nothing to release

    def partitions(self, start, end):
        t = _table(self._options)
        lo, hi = int(start["version"]), int(end["version"])
        # columnMapping resolution under the END state (the stream's
        # declared schema is fixed at start; mid-range cm upgrades are
        # not replayed per-commit)
        self._cm = _cm_maps(_snap_or_refuse(t, hi))
        # one replay to the range start, then roll forward commit by
        # commit — O(range), not O(range x history)
        files = (_snap_or_refuse(t, lo)["files"] if lo >= 0 else {})
        parts: list[_DeltaFilePart] = []
        for v in range(lo + 1, hi + 1):
            files, new_parts = self._diff_one(t, v, files)
            parts.extend(new_parts)
        from forklift_spark.datasource import _pack_parts

        parts = _pack_parts(parts, lambda p: getattr(p, "_nbytes", 0))
        return parts or [_DeltaFilePart(None, schema_json=None)]

    def _diff_one(self, t, v: int, files: dict):
        adds, removes, data_change = [], [], False
        fp = os.path.join(t.log_dir, f"{v:020d}.json")
        if not os.path.exists(fp):
            raise ValueError(
                f"{t.path}: commit {v} is missing (log cleaned?); the "
                "change feed cannot be reconstructed — restart the "
                "stream with a fresh checkpoint or a retained "
                "starting_version")
        with open(fp) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                act = json.loads(line)
                if "add" in act:
                    adds.append(act["add"])
                    if act["add"].get("dataChange", True):
                        data_change = True
                elif "remove" in act:
                    removes.append(act["remove"])
                    if act["remove"].get("dataChange", True):
                        data_change = True
                elif "protocol" in act:
                    t._check_protocol(act["protocol"])
        before = dict(files)
        t._reconcile_commit(files, adds, removes)
        if not data_change:
            return files, []  # compaction: row multiset unchanged
        dv_a = _dv_sets(t, {p: e for p, e in before.items()
                            if p not in files
                            or files[p].get("dv") != e.get("dv")})
        dv_b = _dv_sets(t, {p: e for p, e in files.items()
                            if p not in before
                            or before[p].get("dv") != e.get("dv")})
        sj = self._schema_json
        phys, pcols, pv_key = self._cm

        def _pv(e):
            return _pv_logical(e.get("pv") or {}, pcols, pv_key)

        def mk(p, e, **kw) -> _DeltaFilePart:
            fp = _DeltaFilePart(
                os.path.join(t.path, p), phys=phys, schema_json=sj, **kw)
            fp._nbytes = (e or {}).get("size") or 0
            return fp

        parts: list[_DeltaFilePart] = []
        for p, e in sorted(files.items()):  # added -> inserts
            if p not in before:
                parts.append(mk(p, e, pv=_pv(e), drop_pos=dv_b.get(p),
                               change=("insert", v)))
        for p, e in sorted(before.items()):  # removed -> deletes
            if p not in files:
                parts.append(mk(p, e, pv=_pv(e), drop_pos=dv_a.get(p),
                               change=("delete", v)))
        for p in sorted(set(before) & set(files)):  # dv churn: exact rows
            if before[p].get("dv") == files[p].get("dv"):
                continue
            pa_ = dv_a.get(p, frozenset())
            pb_ = dv_b.get(p, frozenset())
            pv = _pv(files[p])
            if pb_ - pa_:
                parts.append(mk(p, files[p], pv=pv, emit_pos=pb_ - pa_,
                               change=("delete", v)))
            if pa_ - pb_:  # restore of previously-masked rows
                parts.append(mk(p, files[p], pv=pv, emit_pos=pa_ - pb_,
                               change=("insert", v)))
        return files, parts

    def read(self, partition):
        from forklift_spark.datasource import _GroupPart, _iter_group

        if isinstance(partition, _GroupPart):
            return _iter_group(partition, _read_delta_batches)
        if partition.path is None:
            return iter(())
        return _read_delta_batches(partition)


class DeltaLiteDataSource(DataSource):
    """format name: ``deltalite`` (see module docstring)."""

    @classmethod
    def name(cls):
        return "deltalite"

    def _snap(self):
        t = _table(self.options)
        version = self.options.get("version")
        return _snap_or_refuse(
            t, int(version) if version is not None else None)

    def schema(self):
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        snap = self._snap()
        _cm_maps(snap)  # nested-cm refusal surfaces at load time
        base: StructType = snap["schema"]
        if str(self.options.get("cdc", "")).lower() == "true":
            base = StructType(
                base.fields
                + [StructField("_change_type", StringType(), False),
                   StructField("_commit_version", LongType(), False)]
            )
        return base

    def reader(self, schema):
        if str(self.options.get("cdc", "")).lower() == "true":
            raise ValueError(
                "cdc=true is a streaming option; use spark.readStream "
                "(batch change feeds: DeltaLiteTable.changelog())")
        return _DeltaBatchReader(
            self.options, json.dumps(self._snap()["schema"].jsonValue()))

    def streamReader(self, schema):
        if str(self.options.get("cdc", "")).lower() != "true":
            raise ValueError(
                "streaming a Delta table through deltalite requires "
                ".option('cdc', 'true'): the feed carries _change_type/"
                "_commit_version change events, not a table snapshot")
        return _DeltaStreamReader(self.options, json.dumps(
            self.schema().jsonValue()))
