"""Deterministic, engine-portable hashing for sketches (MinHash, SimHash, LSH).

Spark's built-in ``hash()``/``xxhash64()`` are engine-specific; results
could never be verified by an independent oracle. Instead we derive 60-bit
integers from md5 (identical hex output in every engine): hash k of value v
is ``int(md5(concat(seed_k, v))[0:15], 16)``. 15 hex chars = 60 bits keeps
the value positive in a signed 64-bit int everywhere.

All of this is built-in-function composition (md5 + conv + cast) — JVM-side,
codegen'd, no Python in the hot path. A 100 TB MinHash pass is then just a
wide projection over the token explode.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_CHARS = 15  # 60 bits


def md5_long(col: Column | str) -> Column:
    """60-bit integer hash of a string column via md5."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, HEX_CHARS), 16, 10).cast("long")


def md5_long_seeded(col: Column | str, seed: int) -> Column:
    """Seeded variant: independent hash family member per integer seed."""
    c = F.col(col) if isinstance(col, str) else col
    return md5_long(F.concat(F.lit(f"s{seed}:"), c))


def md5_long_sql(expr: str) -> str:
    """DuckDB-SQL rendering of md5_long for correctness oracles."""
    return f"CAST('0x' || substr(md5({expr}), 1, {HEX_CHARS}) AS BIGINT)"


def md5_long_seeded_sql(expr: str, seed: int) -> str:
    return md5_long_sql(f"concat('s{seed}:', {expr})")
