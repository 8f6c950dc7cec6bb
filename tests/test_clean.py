"""U5 sanitizer parity: overflow chars -> '???' (mysql.rb:86-99)."""

from __future__ import annotations

from forklift_spark.functions.clean import sanitize_overflow_chars


def test_sanitize_overflow_chars(spark):
    df = spark.createDataFrame(
        [("plain",), ("emoji \U0001F600 x",), ("bmp � kept",), (None,)],
        "s: string",
    )
    out = [r["t"] for r in df.select(sanitize_overflow_chars("s").alias("t")).collect()]
    assert out == ["plain", "emoji ??? x", "bmp � kept", None]


def test_sanitize_custom_ceiling_and_replacement(spark):
    df = spark.createDataFrame([("abcĀdef",)], "s: string")
    out = df.select(
        sanitize_overflow_chars("s", char_max=0xFF, replacement="_").alias("t")
    ).collect()[0]["t"]
    assert out == "abc_def"
