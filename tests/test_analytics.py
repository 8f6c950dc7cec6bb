"""Analytics query catalog vs DuckDB oracle (exact hash-match bar)."""

from __future__ import annotations

import pytest

from forklift_spark import queries as Q
from tests.conftest import SF_DIR, assert_matches_oracle

CATALOG = Q.catalog()
ORACLES = Q.oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, oracle):
    df = CATALOG[name](spark, SF_DIR)
    assert_matches_oracle(df, oracle, ORACLES[name], exact=True)


@pytest.mark.parametrize("name", sorted(set(CATALOG) - set(ORACLES)))
def test_query_runs(name, spark):
    df = CATALOG[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(CATALOG) == set(e.queries())


def test_attribution_credit_conserves_10000bp_per_conversion(spark):
    # U-shaped credit: for EVERY touch count n, the per-conversion
    # credits must sum to exactly 10000 bp — the integer-remainder
    # policy (leftover to first touch) is what makes this exact
    from pyspark.sql import functions as F

    from forklift_spark.queries.timeseries import position_credit_bp

    rows = [(n, pos) for n in range(1, 12) for pos in range(1, n + 1)]
    df = spark.createDataFrame(rows, "n long, pos long").select(
        "n", "pos", position_credit_bp().alias("bp")
    )
    sums = {r.n: r.s for r in df.groupBy("n").agg(F.sum("bp").alias("s")).collect()}
    assert sums == {n: 10000 for n in range(1, 12)}
