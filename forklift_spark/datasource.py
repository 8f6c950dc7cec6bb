"""Spark Python DataSource over the manifest table format: register
once, then the format works everywhere Spark accepts a source name —

    spark.dataSource.register(ManifestDataSource)
    spark.read.format("forklift_manifest")
         .option("table", "events").load(warehouse_root)          # batch
    spark.readStream.format("forklift_manifest")
         .option("table", "events").option("cdc", "true")
         .load(warehouse_root)                                    # CDC tail

This is the Spark-4-idiomatic integration layer (the Python DataSource
API) for the format `manifest.py` implements: the BATCH reader plans
one input partition per live data file (deletion-vector positions
resolved at plan time, subtracted per-file with an Arrow mask — no
join at all on this path), and the STREAM reader turns the versioned
manifest history into a structured-streaming CDC feed — offsets are
manifest versions, each microbatch carries the row-level changes
(``_change_type`` 'insert' | 'delete', plus ``_commit_version``)
between the last committed version and the head, with exactly-once
delivery from the engine's offset log.

Planning runs where the Python DataSource API runs it — a driver-side
Python worker with NO SparkSession — so everything here reads manifest
JSON + parquet segment/dv sidecars directly (stdlib + pyarrow). The
``ManifestTable`` metadata helpers are deliberately Spark-free and are
reused with ``spark=None``.

Change semantics (documented, not hidden): the stream feed is
row-exact for append commits and for dv-mode commits (``merge+dv`` /
``delete+dv`` / ``apply-changes+dv`` — the CDC-friendly write mode):
dv position diffs name exactly the changed rows. REWRITE-mode commits
(plain merge/delete rewriting files) emit file-level events — a
delete+insert pair also covers rows the rewrite carried unchanged.
The multiset is correct and a consumer that applies each microbatch's
deletes before its inserts (per ``_commit_version``) converges to the
exact table state; the batch ``ManifestTable.changes()`` feed cancels
carried rows exactly (Spark ``exceptAll``) when exact row deltas are
required. Layout-only commits (compact / alter-layout / checkpoint /
constraint changes) emit ZERO change rows by operation gating, same
as the batch feed.
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

# operations that permute layout but provably preserve the row multiset
_LAYOUT_ONLY_OPS = {
    "compact", "alter-layout", "checkpoint",
    "set-constraint", "drop-constraint",
}


class _FilePart(InputPartition):
    """One data file: read everything except ``drop_pos``; or, when
    ``emit_pos`` is set, read ONLY those row indices (dv diff events).
    ``change`` is None for batch, else ('insert'|'delete', version)."""

    def __init__(self, path, drop_pos=None, emit_pos=None, change=None,
                 schema_json=None):
        self.path = path
        self.drop_pos = drop_pos
        self.emit_pos = emit_pos
        self.change = change
        self.schema_json = schema_json


class _GroupPart(InputPartition):
    """Several file parts read by ONE task (split-size packing).

    Each Python DataSource partition costs a fixed JVM<->Python bridge
    round trip (~100-200 ms measured, independent of data volume), so
    one-task-per-file turns a many-small-files table into pure task
    overhead — the Python-source analog of
    ``spark.sql.files.maxPartitionBytes``/``openCostInBytes`` packing
    (optimization r8, guide §2.2/§6). Files keep their individual
    masks/metadata; the reader just loops them inside one task, so
    results are byte-identical and per-file parallelism returns
    exactly when files are split-target sized."""

    def __init__(self, parts: list):
        self.parts = parts


_DS_OPEN_COST = 4 << 20  # per-file open cost, mirrors Spark's default


def _split_target() -> int:
    """Target bytes per Python-source read task. Scale-adaptive by
    construction: big files never co-group, tiny files pack ~32 to a
    task (open-cost charging) — same behavior as Spark's own scan
    packing. Env-tunable for deployments with different task budgets."""
    return int(os.environ.get("SPARK_GRAFT_DS_SPLIT_BYTES",
                              str(128 << 20)))


def _pack_parts(parts: list, nbytes) -> list:
    """Greedily pack per-file parts into ~split-target groups (order
    preserved). ``nbytes(part)`` returns the file's size when known
    (0/None charges only the open cost, packing ~32 files per task)."""
    target = _split_target()
    if target <= 0 or len(parts) <= 1:
        return parts
    groups: list[list] = []
    cur: list = []
    acc = 0
    for p in parts:
        sz = int(nbytes(p) or 0) + _DS_OPEN_COST
        if cur and acc + sz > target:
            groups.append(cur)
            cur, acc = [], 0
        cur.append(p)
        acc += sz
    if cur:
        groups.append(cur)
    if len(groups) == len(parts):
        return parts
    return [g[0] if len(g) == 1 else _GroupPart(g) for g in groups]


def _part_files(parts: list) -> int:
    """Number of FILES across partitions (pruning evidence: grouping
    changes partition counts, never the planned file set)."""
    return sum(
        len(p.parts) if isinstance(p, _GroupPart) else 1 for p in parts
    )


def _iter_group(partition: "_GroupPart", leaf):
    for p in partition.parts:
        yield from leaf(p)


def _mt(options):
    """Spark-free ManifestTable handle for metadata access only."""
    from forklift_spark.manifest import ManifestTable

    root = options.get("path")
    table = options.get("table")
    if not root or not table:
        raise ValueError(
            "forklift_manifest needs .load(<warehouse root>) and "
            ".option('table', <name>)")
    return ManifestTable(None, root, table)


def _entries(mt, version):
    m = mt._raw(version)
    return [dict(e) for e in mt._m_entries(m)], m


def _dv_positions(mt, entries) -> dict[str, frozenset]:
    """file path -> masked row positions, resolved from the dv parquet
    sidecars (positions accumulate; duplicate pairs are deduped here)."""
    import pyarrow.parquet as pq

    dv_dirs = sorted({e["dv"] for e in entries if e.get("dv")})
    if not dv_dirs:
        return {}
    want = {e["path"] for e in entries if e.get("dv")}
    out: dict[str, set] = {}
    for d in dv_dirs:
        t = pq.read_table(os.path.join(mt.path, d),
                          columns=["file_ref", "pos"])
        for ref, pos in zip(t.column("file_ref").to_pylist(),
                            t.column("pos").to_pylist()):
            if ref in want:
                out.setdefault(ref, set()).add(pos)
    return {k: frozenset(v) for k, v in out.items()}


def _arrow_schema(schema_json: dict):
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    return to_arrow_schema(StructType.fromJson(schema_json))


def _collect_bounds(filters, where: dict) -> None:
    """Fold Spark's pushed comparison filters into ``where[col] =
    [lo, hi]`` interval bounds (tightest wins; incomparable values keep
    the old bound). Shared by the manifest/delta/iceberg DataSource
    readers — each format's own metadata planner consumes the
    intervals."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        LessThanOrEqual,
    )

    def bound(col, lo=None, hi=None):
        cur = where.setdefault(col, [None, None])
        for i, v in ((0, lo), (1, hi)):
            if v is None:
                continue
            old = cur[i]
            try:
                tighter = (old is None or (v > old if i == 0 else
                                           v < old))
            except TypeError:
                tighter = False
            if tighter:
                cur[i] = v

    for f in filters:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1:
            continue
        col = attr[0]
        if isinstance(f, EqualTo):
            bound(col, lo=f.value, hi=f.value)
        elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            bound(col, lo=f.value)
        elif isinstance(f, (LessThan, LessThanOrEqual)):
            bound(col, hi=f.value)


def _read_file_batches(part: _FilePart):
    """Arrow-side leaf: read the parquet file, apply the position mask,
    align to the declared schema (schema evolution: missing columns are
    null), append CDC columns when streaming. Yields RecordBatches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

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
    cols = []
    for field in target:
        if field.name == "_change_type":
            cols.append(pa.array([part.change[0]] * tbl.num_rows,
                                 type=pa.string()))
        elif field.name == "_commit_version":
            cols.append(pa.array([part.change[1]] * tbl.num_rows,
                                 type=pa.int64()))
        elif field.name in tbl.column_names:
            col = tbl.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            cols.append(col.combine_chunks() if hasattr(col, "combine_chunks")
                        else col)
        else:  # evolved-away column: null-fill (same rule as _align)
            cols.append(pa.nulls(tbl.num_rows, type=field.type))
    out = pa.table(cols, schema=target)
    for batch in out.to_batches(max_chunksize=1 << 16):
        yield batch


class _ManifestBatchReader(DataSourceReader):
    """File-pruned batch scan. ``pushFilters`` records the predicates
    the manifest's metadata can act on (partition tokens, per-file
    zone maps, bucket cells, per-file blooms — all evaluated by the
    format's own ``_entries`` planner) and returns EVERY filter back to
    Spark: pruning here only decides which FILES to open, Spark still
    evaluates rows, so a conservative prune is always correct."""

    def __init__(self, options, schema_json: str):
        self._options = dict(options)
        self._schema_json = schema_json
        self._partitions_in: list | None = None  # partition-value prune
        self._where: dict = {}  # col -> [lo, hi] zone-map bounds

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            IsNull,
            LessThan,
            LessThanOrEqual,
        )

        mt = _mt(self._options)
        version = self._options.get("version")
        pcol = mt._raw(int(version) if version is not None
                       else None).get("partition_by")

        def top(attr):  # only top-level single-name columns
            return attr[0] if len(attr) == 1 else None

        def bound(col, lo=None, hi=None):
            cur = self._where.setdefault(col, [None, None])
            for i, v in ((0, lo), (1, hi)):
                if v is None:
                    continue
                old = cur[i]
                try:
                    tighter = (old is None or (v > old if i == 0 else
                                               v < old))
                except TypeError:
                    tighter = False  # incomparable: keep the old bound
                if tighter:
                    cur[i] = v

        for f in filters:
            col = top(f.attribute) if hasattr(f, "attribute") else None
            if col is None:
                continue
            if isinstance(f, EqualTo):
                if col == pcol:
                    self._partitions_in = [f.value]
                bound(col, lo=f.value, hi=f.value)
            elif isinstance(f, In) and col == pcol:
                self._partitions_in = list(f.value)
            elif isinstance(f, IsNull) and col == pcol:
                self._partitions_in = [None]
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                bound(col, lo=f.value)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                bound(col, hi=f.value)
        return filters  # Spark re-applies every predicate row-level

    def partitions(self):
        mt = _mt(self._options)
        version = self._options.get("version")
        v = int(version) if version is not None else None
        where = {c: tuple(b) for c, b in self._where.items()
                 if b != [None, None]} or None
        entries = [dict(e) for e in mt._entries(
            v, partitions=self._partitions_in, where=where)]
        dv = _dv_positions(mt, entries)
        parts = []
        for e in entries:
            p = _FilePart(
                os.path.join(mt.path, e["path"]),
                drop_pos=dv.get(e["path"]),
                schema_json=self._schema_json,
            )
            p._nbytes = e.get("bytes", 0)
            parts.append(p)
        parts = _pack_parts(parts, lambda p: getattr(p, "_nbytes", 0))
        return parts or [_FilePart(None, schema_json=None)]

    def read(self, partition):
        if isinstance(partition, _GroupPart):
            return _iter_group(partition, _read_file_batches)
        if partition.path is None:
            return iter(())
        return _read_file_batches(partition)


class _ManifestStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema_json: str):
        self._options = dict(options)
        self._schema_json = schema_json
        mt = _mt(options)
        start = options.get("starting_version")
        # default: tail from the CURRENT version (only new commits),
        # the kafka `latest` convention; starting_version replays history
        self._initial = (int(start) if start is not None
                         else mt.current_version())

    def initialOffset(self):
        return {"version": self._initial}

    def latestOffset(self):
        return {"version": _mt(self._options).current_version()}

    def commit(self, end):
        pass  # versions are durable on disk; nothing to release

    def partitions(self, start, end):
        mt = _mt(self._options)
        parts: list[_FilePart] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            parts.extend(self._diff_one(mt, v))
        parts = _pack_parts(parts, lambda p: getattr(p, "_nbytes", 0))
        # an empty microbatch is legal but the engine needs >= 1 split
        return parts or [_FilePart(None, schema_json=None)]

    def _diff_one(self, mt, v: int) -> list[_FilePart]:
        b_raw = mt._raw(v)
        op = (b_raw.get("operation") or "").split("(")[0]
        if op in _LAYOUT_ONLY_OPS:
            return []  # row multiset provably unchanged
        try:
            a_raw = mt._raw(v - 1)
        except KeyError:
            if v - 1 >= 1:
                # the predecessor EXISTED and was vacuumed away: the CDC
                # delta for v is unreconstructable. Falling back to
                # genesis here would silently re-emit every live row as
                # an insert (and swallow the gap's deletes) into a
                # consumer that already holds them — refuse loudly
                # instead (ADVICE r6: exactly-once contract).
                raise ValueError(
                    f"{mt.table}: manifest version {v - 1} was vacuumed; "
                    f"the change feed for version {v} cannot be "
                    "reconstructed. Restart the stream with a fresh "
                    "checkpoint (full re-sync) or set starting_version "
                    "to a retained version."
                ) from None
            # true genesis (v == 1, the create commit; there is no v0):
            # everything live at v is an insert
            a_raw = {"entries": [], "segments": []}

        def delta(m, other):
            if "entries" in m or "entries" in other:
                return mt._m_entries(m)
            shared = {s["path"] for s in other["segments"]}
            es = []
            for s in m["segments"]:
                if s["path"] not in shared:
                    es.extend(mt._load_segment(s["path"]))
            return es

        ea = {e["path"]: e for e in delta(a_raw, b_raw)}
        eb = {e["path"]: e for e in delta(b_raw, a_raw)}
        dv_a = _dv_positions(mt, list(ea.values()))
        dv_b = _dv_positions(mt, list(eb.values()))
        sj = self._schema_json

        def mk(p, e, **kw) -> _FilePart:
            fp = _FilePart(os.path.join(mt.path, p), schema_json=sj, **kw)
            fp._nbytes = (e or {}).get("bytes", 0)
            return fp

        parts: list[_FilePart] = []
        for p, e in eb.items():  # added files -> inserts (minus dv at v)
            if p not in ea:
                parts.append(mk(p, e, drop_pos=dv_b.get(p),
                               change=("insert", v)))
        for p, e in ea.items():  # removed files -> deletes (live rows at v-1)
            if p not in eb:
                parts.append(mk(p, e, drop_pos=dv_a.get(p),
                               change=("delete", v)))
        for p in set(ea) & set(eb):  # dv churn on a kept file: exact rows
            pa_, pb_ = dv_a.get(p, frozenset()), dv_b.get(p, frozenset())
            if pb_ - pa_:
                parts.append(mk(p, eb[p], emit_pos=pb_ - pa_,
                               change=("delete", v)))
            if pa_ - pb_:  # restore of previously-masked rows
                parts.append(mk(p, ea[p], emit_pos=pa_ - pb_,
                               change=("insert", v)))
        return parts

    def read(self, partition):
        if isinstance(partition, _GroupPart):
            return _iter_group(partition, _read_file_batches)
        if partition.path is None:
            return iter(())
        return _read_file_batches(partition)


class ManifestDataSource(DataSource):
    """format name: ``forklift_manifest`` (see module docstring)."""

    @classmethod
    def name(cls):
        return "forklift_manifest"

    def _table_schema_json(self) -> dict:
        mt = _mt(self.options)
        version = self.options.get("version")
        m = mt._raw(int(version) if version is not None else None)
        return m["schema"]

    def schema(self):
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        base = StructType.fromJson(self._table_schema_json())
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
                "(batch change feeds: ManifestTable.changes())")
        return _ManifestBatchReader(
            self.options, json.dumps(self._table_schema_json()))

    def streamReader(self, schema):
        if str(self.options.get("cdc", "")).lower() != "true":
            raise ValueError(
                "streaming the manifest format requires "
                ".option('cdc', 'true'): the feed carries _change_type/"
                "_commit_version change events, not a table snapshot")
        return _ManifestStreamReader(self.options, json.dumps(
            self.schema().jsonValue()))
