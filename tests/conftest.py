"""Shared fixtures: one SparkSession per test session, DuckDB oracle helper.

Oracle style follows the reference's test strategy (SURVEY.md §5):
integration tests over deterministic seed data, asserted against an
independent engine — here DuckDB over the same parquet files, mirroring
the driver's correctness gate.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from forklift_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="forklift_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def assert_matches_oracle(df, con, sql, exact=True):
    """Order-insensitive comparison of a Spark DataFrame vs DuckDB SQL.

    exact=True requires identical values (the driver's hash-match bar);
    exact=False allows 1e-9 relative tolerance on floats.
    """
    spark_cols = sorted(df.columns)
    got = _normalize(
        [tuple(r[c] for c in spark_cols) for r in df.collect()]
    )
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    idx = [cols.index(c) for c in sorted(cols)]
    want = _normalize([tuple(r[i] for i in idx) for r in res.fetchall()])
    assert sorted(cols) == spark_cols, f"columns differ: {sorted(cols)} vs {spark_cols}"
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    if exact:
        assert got == want
    else:
        for g, w in zip(got, want):
            for gv, wv in zip(g, w):
                if isinstance(gv, float) and isinstance(wv, float):
                    assert math.isclose(gv, wv, rel_tol=1e-9, abs_tol=1e-12), (g, w)
                else:
                    assert gv == wv, (g, w)
