"""Sampling invariants: stratified sample determinism + bounds, and
hash-split stability under repartitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from forklift_spark import tables
from forklift_spark.functions.hashing import md5_long
from tests.conftest import SF_DIR


def test_stratified_sample_deterministic_and_bounded(spark):
    docs = tables.load(spark, SF_DIR, "documents")
    fractions = {lang: 0.5 for lang in ("en", "de", "es", "fr", "zh")}
    a = {r["doc_id"] for r in docs.sampleBy("lang", fractions, seed=42).collect()}
    b = {r["doc_id"] for r in docs.sampleBy("lang", fractions, seed=42).collect()}
    assert a == b  # same seed -> identical sample
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    sampled = (
        docs.sampleBy("lang", fractions, seed=42)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in sampled:
        frac = r["n"] / totals[r["lang"]]
        assert 0.2 < frac < 0.8, (r["lang"], frac)  # loose Bernoulli bounds


def test_hash_split_stable_under_repartition(spark):
    docs = tables.load(spark, SF_DIR, "documents")
    bucket = md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    split = F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    a = {r["doc_id"]: r["s"] for r in docs.select("doc_id", split.alias("s")).collect()}
    b = {
        r["doc_id"]: r["s"]
        for r in docs.repartition(17).select("doc_id", split.alias("s")).collect()
    }
    assert a == b  # split assignment is a pure function of the id
    # every split non-empty at sf0.001
    assert set(a.values()) == {"train", "valid", "test"}
