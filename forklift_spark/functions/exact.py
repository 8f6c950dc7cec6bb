"""Exact (engine-independent) arithmetic over floating-point columns.

Floating-point aggregation order differs between engines and between runs
of the same engine at different parallelism (a parallel SUM over doubles
is not associative). For results that must be reproducible — correctness
oracles, idempotent incremental pipelines, audit counts — this module
computes in DECIMAL: cast inputs to their natural fixed scale, do exact
decimal arithmetic (order-independent), and cast the final scalar back to
DOUBLE (IEEE, deterministic). The same expression in any ANSI engine
yields bit-identical doubles.

At 100 TB this costs one extra cast per value on the scan side and keeps
everything inside whole-stage codegen (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Natural scales for the test schema's monetary/rate columns.
MONEY = "decimal(14,2)"  # prices, balances (fits 1e12 dollars)
RATE = "decimal(4,2)"  # discount / tax in [0,1] at 2dp
QTY = "decimal(14,2)"


def dec(col: str | Column, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def money_sum(expr: Column, out: str | None = None) -> Column:
    """Exact decimal SUM cast back to double."""
    c = F.sum(expr).cast("double")
    return c.alias(out) if out else c


def ratio_double(num: Column, den: Column) -> Column:
    """num/den as an IEEE double division of two exact values."""
    return num.cast("double") / den.cast("double")
