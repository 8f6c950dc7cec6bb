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


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """32-bit MurmurHash3 (x86 variant), the public algorithm from
    Austin Appleby's reference implementation — implemented here
    because Iceberg's bucket partition transform (spec Appendix B)
    mandates it WITH SEED 0, while Spark's ``F.hash`` is the same
    algorithm fixed at seed 42. Pure Python is fine: the caller is
    PLAN-TIME file pruning (one hash of one probe value), never a
    row path. Returns the SIGNED int32 (Iceberg buckets via
    ``(hash & Integer.MAX_VALUE) % N``)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    m = n - (n % 4)
    for i in range(0, m, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[m:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - 0x100000000 if h >= 0x80000000 else h
