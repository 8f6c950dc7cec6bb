"""PII redaction on PII-bearing text (the corpus queries only prove
zero-match agreement on synthetic docs): Spark redact_pii/pii_counts vs
the same regexes in DuckDB, plus behavioral pins."""

from __future__ import annotations

import duckdb
from pyspark.sql import Row
from pyspark.sql import functions as F

from forklift_spark.operators.text import PII_PATTERNS, pii_counts, redact_pii

SAMPLES = [
    "contact bob.smith+spam@corp-mail.example.org or call +1 (415) 555-0100 now",
    "server at 10.0.254.3 forwarded to 192.168.1.77; ping 999.1.1.1 too",
    "no pii here, just words and 1234 numbers",
    "two mails: a@b.io c.d@e.museum and +44 20 7946 0958",
    "",
]


def test_redaction_matches_duckdb_oracle(spark):
    df = spark.createDataFrame([Row(i=i, text=t) for i, t in enumerate(SAMPLES)])
    got = {
        r["i"]: (r["red"], r["n_email"], r["n_ipv4"], r["n_phone"])
        for r in df.select(
            "i", redact_pii("text").alias("red"), *pii_counts("text")
        ).collect()
    }
    con = duckdb.connect()
    counts = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, (pat, _) in PII_PATTERNS.items()
    )
    red = "text"
    for name, (pat, repl) in PII_PATTERNS.items():
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    for i, t in enumerate(SAMPLES):
        row = con.execute(
            f"SELECT {red} AS red, {counts} FROM (SELECT ? AS text)", [t]
        ).fetchone()
        assert (row[0], row[1], row[2], row[3]) == got[i], (i, t, row, got[i])


def test_redaction_behavior_pins(spark):
    df = spark.createDataFrame([Row(text=SAMPLES[0]), Row(text=SAMPLES[1])])
    reds = [r["red"] for r in df.select(redact_pii("text").alias("red")).collect()]
    assert reds[0] == "contact [EMAIL] or call [PHONE] now"
    # 999.1.1.1 still matches the shape-based ipv4 pattern (an audit
    # regex, not a validator) — documented behavior
    assert reds[1] == "server at [IP] forwarded to [IP]; ping [IP] too"


def test_chunk_tokens_windows_and_edges(spark):
    """Token chunking: stride windows with overlap, short-tail final
    chunk, zero-token docs dropped, whitespace-only docs dropped."""
    import pytest

    from forklift_spark.operators.text import chunk_tokens

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x y"), (3, ""), (4, "   "),
         (5, "solo")],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text)
        for r in chunk_tokens(df, "doc_id", "text",
                              chunk_size=4, overlap=1).collect()
    )
    assert got == [
        (1, 0, 4, "a b c d"),
        (1, 1, 4, "d e f g"),  # 1-token overlap with the previous
        (1, 2, 4, "g h i j"),
        (1, 3, 1, "j"),        # tail window keeps the remainder
        (2, 0, 2, "x y"),
        (5, 0, 1, "solo"),
    ]
    # zero overlap partitions the tokens exactly
    flat = sorted(
        (r.doc_id, r.chunk_id, r.chunk_text)
        for r in chunk_tokens(df, "doc_id", "text",
                              chunk_size=5, overlap=0).collect()
        if r.doc_id == 1
    )
    assert flat == [(1, 0, "a b c d e"), (1, 1, "f g h i j")]
    with pytest.raises(ValueError, match="overlap"):
        chunk_tokens(df, "doc_id", "text", chunk_size=4, overlap=4)
