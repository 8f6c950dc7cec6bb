"""Spatial joins: grid-bucketed radius search over planar points.

No reference counterpart (taskrabbit/forklift moves flat rows); this is
the distance-join pass of geo-tagged data (nearest facility, points
within radius) expressed the way it scales: bucket the plane into
radius-sized cells, index each right-side point into ITS cell, probe
each left-side point against the 3x3 cell neighborhood, then apply the
exact distance predicate. With cell size >= radius, any pair within the
radius differs by at most one cell per axis — the blocking is LOSSLESS
by construction (the geohash-join discipline, provable here because the
grid is axis-aligned). Never all-pairs: candidates are 9 cell-keyed
equi-join buckets per probe point.

Engine-exactness: integer coordinates, integer squared distances —
no trigonometry (cross-engine sin/cos bit-parity is NOT established;
for small geographic extents project to a planar integer grid first).

Scale: the cell join shuffles on (cx, cy); hot cells are a skew
problem like any hot join key (salt or AQE — operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius: int,
    left_keys: tuple[str, str, str] = ("id", "x", "y"),
    right_keys: tuple[str, str, str] = ("id", "x", "y"),
) -> DataFrame:
    """All (left, right) pairs with squared planar distance <= radius².

    Returns DataFrame(l_id, r_id, dist2). Cell size = radius, right
    indexed once, left probes its 3x3 neighborhood. Coordinates must be
    NON-NEGATIVE integers: `div` truncates toward zero while a floored
    division would be needed below zero (and DuckDB's `//` floors) —
    shift the grid before joining rather than relying on either."""
    lid, lx, ly = left_keys
    rid, rx, ry = right_keys
    r2 = radius * radius
    rt = right.select(
        F.col(rid).alias("r_id"),
        F.col(rx).alias("_rx"),
        F.col(ry).alias("_ry"),
        F.expr(f"{rx} div {radius}").alias("cx"),
        F.expr(f"{ry} div {radius}").alias("cy"),
    )
    lt = (
        left.select(
            F.col(lid).alias("l_id"),
            F.col(lx).alias("_lx"),
            F.col(ly).alias("_ly"),
            F.expr(f"{lx} div {radius}").alias("_cx0"),
            F.expr(f"{ly} div {radius}").alias("_cy0"),
        )
        .withColumn("_dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("_dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "l_id", "_lx", "_ly",
            (F.col("_cx0") + F.col("_dx")).alias("cx"),
            (F.col("_cy0") + F.col("_dy")).alias("cy"),
        )
    )
    d2 = (
        (F.col("_lx") - F.col("_rx")) * (F.col("_lx") - F.col("_rx"))
        + (F.col("_ly") - F.col("_ry")) * (F.col("_ly") - F.col("_ry"))
    )
    return (
        lt.join(rt, ["cx", "cy"])
        .select("l_id", "r_id", d2.alias("dist2"))
        .filter(F.col("dist2") <= r2)
    )
