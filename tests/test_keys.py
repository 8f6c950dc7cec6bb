"""Surrogate-key strategies (SURVEY §7 hard part 2: AUTO_INCREMENT has
no Spark equivalent; both documented substitutes must hold their
contracts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from forklift_spark.functions.keys import with_surrogate_key


@pytest.fixture()
def data(spark):
    return spark.range(500).select(F.concat(F.lit("r"), F.col("id")).alias("name")).repartition(8)


def test_monotonic_keys_unique(data):
    out = with_surrogate_key(data, mode="monotonic")
    assert out.select("id").distinct().count() == 500
    assert out.filter(F.col("id") < 1).count() == 0  # start respected


def test_dense_keys_contiguous(data):
    out = with_surrogate_key(data, mode="dense", start=1)
    ids = sorted(r["id"] for r in out.select("id").collect())
    assert ids == list(range(1, 501))
    # original columns intact
    assert out.columns == ["name", "id"]


def test_unknown_mode_rejected(data):
    with pytest.raises(ValueError):
        with_surrogate_key(data, mode="sequence")
