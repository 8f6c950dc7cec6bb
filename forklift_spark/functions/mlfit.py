"""Grouped model fitting through the Arrow/pandas escape hatch — done so
the result is still ENGINE-EXACT.

The rule for Python in the data path (SURVEY §2.5 U2; the pattern every
custom `applyInPandas` operator here follows):

1. Aggregate inside pandas in EXACT integer arithmetic (int64 cents /
   hours — pandas int64 sums are exact and order-independent), never in
   float64 (numpy's pairwise summation order is partition-dependent).
2. Apply the final float formula to those exact sums with the same
   FMA-immune expression the SQL oracle uses (every multiply feeds a
   division — see NOTES_r2 lesson 8).

Result: the pandas path produces bit-identical doubles to a pure-SQL
engine, so even UDF-backed operators stay under the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# global rebase so squared sums stay inside int64: hours since 2024-01-01
EPOCH_2024_US = 1_704_067_200 * 1_000_000

OLS_SCHEMA = (
    "group string, n long, slope double, intercept double, "
    "sum_x long, sum_y long"
)


def _ols_fit(pdf):
    import pandas as pd  # noqa: F401 (Arrow hands us a pandas frame)

    n = len(pdf)
    x = pdf["x"]  # int64 hours
    y = pdf["y"]  # int64 cents
    sx = int(x.sum())
    sy = int(y.sum())
    sxx = int((x * x).sum())
    sxy = int((x * y).sum())
    nd = float(n)
    # FMA-immune: multiplies feed divisions, same expression as the oracle
    denom = float(sxx) - (float(sx) * float(sx)) / nd
    slope = (float(sxy) - (float(sx) * float(sy)) / nd) / denom if denom else 0.0
    intercept = float(sy) / nd - (slope * float(sx)) / nd
    import pandas

    return pandas.DataFrame(
        [
            {
                "group": pdf["group"].iloc[0],
                "n": n,
                "slope": slope,
                "intercept": intercept,
                "sum_x": sx,
                "sum_y": sy,
            }
        ]
    )


def grouped_ols(df: DataFrame, group_col: str, ts_col: str, value_col: str) -> DataFrame:
    """Per-group least-squares fit of value (cents) against time (hours
    since 2024-01-01): one applyInPandas over the group key — a single
    shuffle, Arrow-batched, exact-integer accumulation inside pandas."""
    prep = df.select(
        F.col(group_col).alias("group"),
        F.expr(f"(unix_micros({ts_col}) - {EPOCH_2024_US}) div 3600000000").alias("x"),
        F.expr(f"CAST(round({value_col} * 100) AS LONG)").alias("y"),
    )
    return prep.groupBy("group").applyInPandas(_ols_fit, OLS_SCHEMA)
