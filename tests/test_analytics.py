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
