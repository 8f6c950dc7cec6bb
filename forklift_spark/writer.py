"""Upsert-with-schema-evolution writer over immutable columnar storage.

Re-expresses the reference's MySQL sink (`transports/mysql.rb:55-103`):

- lazy table creation on first write (`:105-132`)        -> first write
  creates the parquet table directory.
- upsert = DELETE pks IN batch + multi-row INSERT (`:82-87`) -> left-anti
  join of existing rows against incoming pks, union, atomic rewrite.
- column addition for unseen keys (`:64-73`)             -> unionByName
  (allowMissingColumns=True): new columns appear, old rows read NULL.
- null-type upgrade: a column created from all-NULL values is typed as a
  placeholder (reference: varchar(0), `:258-279`; here: string) and is
  re-typed on the first write that carries real values.
- crash_on_extra_col flag (`:55`) preserved as strict_schema.

Scale: the anti-join shuffles on the primary key and the rewrite is a
full table pass — correct but O(table) per batch. At 100 TB you'd layer
this same plan on a MERGE-capable format (Delta/Iceberg — jars not in
this image); the plan shape (broadcast the incoming batch when small,
anti-join, union) is exactly what those formats execute internally. The
writer broadcasts the incoming side automatically under
``upsert_broadcast_threshold`` rows to avoid shuffling the full table.

Atomic publish (reference `RENAME TABLE` idiom,
`patterns/mysql_patterns.rb:35-39`): write to ``<table>.__staging__``,
then swap directories so readers never observe a half-written table.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NULL_PLACEHOLDER = T.StringType()  # analog of the reference's varchar(0)


class SchemaMismatch(ValueError):
    pass


def _strip_null_types(df: DataFrame) -> DataFrame:
    """Parquet cannot store NullType; emit placeholder string columns
    (the reference's varchar(0) move, `transports/mysql.rb:145`)."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.NullType):
            cols.append(F.col(f.name).cast(NULL_PLACEHOLDER).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def _align(df: DataFrame, columns: list[tuple[str, T.DataType]]) -> DataFrame:
    """Project df onto the given (name, type) list, NULL-filling gaps."""
    cols = []
    have = {f.name: f.dataType for f in df.schema.fields}
    for name, dtype in columns:
        if name in have:
            c = F.col(name)
            if have[name] != dtype:
                c = c.cast(dtype)
            cols.append(c.alias(name))
        else:
            cols.append(F.lit(None).cast(dtype).alias(name))
    return df.select(*cols)


def _merged_schema(
    existing: DataFrame, incoming: DataFrame, strict: bool
) -> list[tuple[str, T.DataType]]:
    """Union of schemas: existing column order, then new columns.

    Null-placeholder upgrade: if the existing column is a string whose
    values are all NULL and the incoming type differs, adopt the
    incoming type (reference `ensure_row_types`, mysql.rb:258-279).
    """
    ex = {f.name: f.dataType for f in existing.schema.fields}
    inc = {f.name: f.dataType for f in incoming.schema.fields}
    extra = [n for n in inc if n not in ex]
    if strict and extra:
        raise SchemaMismatch(f"extra columns {extra} (strict_schema=True)")
    out: list[tuple[str, T.DataType]] = []
    for name, dtype in ex.items():
        new = inc.get(name)
        if (
            new is not None
            and new != dtype
            and dtype == NULL_PLACEHOLDER
            and not isinstance(new, T.NullType)
            and existing.filter(F.col(name).isNotNull()).limit(1).count() == 0
        ):
            out.append((name, new))  # null-placeholder upgrade
        else:
            out.append((name, dtype))
    for name in extra:
        dtype = inc[name]
        if isinstance(dtype, T.NullType):
            dtype = NULL_PLACEHOLDER
        out.append((name, dtype))
    return out


class ParquetTableWriter:
    """Write modes append / overwrite / upsert for a directory-per-table
    parquet warehouse with atomic publish."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        upsert_broadcast_threshold: int = 2_000_000,
        retain_versions: int = 0,
    ):
        self.spark = spark
        self.root = root
        self.upsert_broadcast_threshold = upsert_broadcast_threshold
        # > 0: every whole-table publish retires the previous generation
        # to <table>.__v{N}__ instead of deleting it, keeping the newest
        # `retain_versions` generations readable (time travel). Retiring
        # a generation is one directory rename — no data rewrite — so the
        # cost at 100 TB is the retained storage, never extra IO. The
        # in-place dynamic-partition path (_overwrite_partitions) is
        # exempt by design: it exists to NOT rewrite the table.
        self.retain_versions = retain_versions

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.path(table))

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    # -- time travel -------------------------------------------------------
    def _version_dirs(self, table: str) -> list[tuple[int, str]]:
        prefix = f"{table}.__v"
        out = []
        if os.path.isdir(self.root):
            for name in os.listdir(self.root):
                if name.startswith(prefix) and name.endswith("__"):
                    try:
                        out.append((int(name[len(prefix):-2]), name))
                    except ValueError:
                        continue
        return sorted(out)

    def versions(self, table: str) -> list[int]:
        """Retired generation numbers, oldest first (the live table is
        one newer than the last entry)."""
        return [n for n, _ in self._version_dirs(table)]

    def read_version(self, table: str, back: int = 1) -> DataFrame:
        """Read a retired generation: ``back=1`` is the one the latest
        publish replaced."""
        dirs = self._version_dirs(table)
        if back < 1 or back > len(dirs):
            raise KeyError(
                f"{table}: no generation {back} back "
                f"({len(dirs)} retained)"
            )
        return self.spark.read.parquet(
            os.path.join(self.root, dirs[-back][1])
        )

    # -- public write ------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "upsert",
        primary_key: str = "id",
        strict_schema: bool = False,
        partition_by: list[str] | None = None,
        auto_key: str | None = None,
        auto_key_mode: str = "dense",
    ) -> None:
        df = _strip_null_types(df)
        if auto_key and auto_key not in df.columns:
            # AUTO_INCREMENT parity for the lazy-create path: the
            # reference's lazy CREATE defaults an `id bigint AUTO_INCREMENT`
            # PK (transports/mysql.rb:112-121). Spark has no sequence, so
            # the surrogate is assigned per-batch (functions/keys.py):
            # `dense` = contiguous like AUTO_INCREMENT (one counting pass);
            # `monotonic` = O(1) unique-but-gapped, the default at scale.
            # Batches appended to an existing keyed table continue past the
            # current MAX(key) — a bounded-scalar read, same class as HWM.
            from forklift_spark.functions.keys import with_surrogate_key

            start = 1
            if self.exists(table):
                existing_cols = self.read(table)
                if auto_key in existing_cols.columns:
                    prev = existing_cols.agg(F.max(auto_key)).first()[0]
                    start = (prev if prev is not None else 0) + 1
            df = with_surrogate_key(df, auto_key, auto_key_mode, start)
        if not self.exists(table):  # lazy create (mysql.rb:105-132)
            self._publish(df, table, partition_by)
            return
        if mode == "overwrite":
            self._publish(df, table, partition_by)
        elif mode == "overwrite_partitions":
            self._overwrite_partitions(df, table, partition_by)
        elif mode == "append":
            existing = self.read(table)
            merged = _merged_schema(existing, df, strict_schema)
            self._publish(
                _align(existing, merged).unionByName(_align(df, merged)),
                table,
                partition_by,
            )
        elif mode == "upsert":
            self._upsert(df, table, primary_key, strict_schema)
        else:
            raise ValueError(f"unknown mode {mode!r}")

    def _overwrite_partitions(
        self, df: DataFrame, table: str, partition_by: list[str] | None
    ) -> None:
        """Dynamic partition overwrite: replace ONLY the hive partitions
        present in ``df``, leave every other partition untouched. The
        100 TB incremental pattern for day-partitioned facts — rewriting
        today's partition costs O(today), not O(table), and readers prune
        untouched days from scans. In-place (no whole-table staging swap:
        per-partition atomicity comes from Spark's commit protocol — the
        swap would defeat the point by rewriting every partition)."""
        if not partition_by:
            raise ValueError("overwrite_partitions requires partition_by")
        conf = self.spark.conf
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = conf.get(key, "static")
        conf.set(key, "dynamic")
        try:
            df.write.mode("overwrite").partitionBy(*partition_by).parquet(
                self.path(table)
            )
        finally:
            conf.set(key, prev)

    def _upsert(
        self, df: DataFrame, table: str, primary_key, strict: bool
    ) -> None:
        existing = self.read(table)
        merged = _merged_schema(existing, df, strict)
        incoming = _align(df, merged)
        # replace-on-pk: keep existing rows whose pk is NOT in the batch;
        # primary_key may be a single column or a composite list
        pk = [primary_key] if isinstance(primary_key, str) else list(primary_key)
        keys = incoming.select(*pk).distinct()
        # Broadcast the key set only while it is provably small: probe with
        # a LIMIT threshold+1 count (bounded work — the scan short-circuits)
        # instead of a full count. A backfill-sized batch above the
        # threshold falls through to a shuffle anti-join, which Spark/AQE
        # plans as sort-merge — a forced broadcast there OOMs the driver.
        probe = keys.limit(self.upsert_broadcast_threshold + 1).count()
        if probe <= self.upsert_broadcast_threshold:
            keys = F.broadcast(keys)
        kept = _align(existing, merged).join(keys, pk, "left_anti")
        self._publish(kept.unionByName(incoming), table)

    # -- atomic publish ----------------------------------------------------
    def _publish(
        self, df: DataFrame, table: str, partition_by: list[str] | None = None
    ) -> None:
        final = self.path(table)
        staging = f"{final}.__staging__{uuid.uuid4().hex[:8]}"
        os.makedirs(self.root, exist_ok=True)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(staging)
        if self.retain_versions > 0 and os.path.isdir(final):
            dirs = self._version_dirs(table)
            nxt = dirs[-1][0] + 1 if dirs else 1
            retired = f"{table}.__v{nxt}__"
            os.rename(final, os.path.join(self.root, retired))
            os.rename(staging, final)
            for _, name in (dirs + [(nxt, retired)])[: -self.retain_versions]:
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
        else:
            old = f"{final}.__old__{uuid.uuid4().hex[:8]}"
            if os.path.isdir(final):
                os.rename(final, old)
            os.rename(staging, final)
            if os.path.isdir(old):
                shutil.rmtree(old, ignore_errors=True)


def schema_diff(existing: DataFrame, incoming: DataFrame) -> dict[str, list]:
    """Describe the drift an upsert/append would reconcile: columns the
    incoming batch adds, columns it no longer carries (kept, read as
    NULL for new rows), and type changes (upgraded when the existing
    column is all-NULL placeholder, else a conflict the caller should
    review). Pure schema comparison — no jobs run. The inspection
    counterpart of `_merged_schema` for pipeline preflight checks
    (reference semantics: lazy mutable schemas, `mysql.rb:105-132`)."""
    old = {f.name: f.dataType for f in existing.schema.fields}
    new = {f.name: f.dataType for f in incoming.schema.fields}
    return {
        "added": sorted(n for n in new if n not in old),
        "removed": sorted(n for n in old if n not in new),
        "type_changed": sorted(
            (n, old[n].simpleString(), new[n].simpleString())
            for n in old
            if n in new and old[n] != new[n]
        ),
    }
