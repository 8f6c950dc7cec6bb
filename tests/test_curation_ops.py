"""Unit tests for the round-3 curation operators: duplicated n-gram
span audit (exact-substring-dedup signal) and the SemDeDup composition
surface. Driver-oracle coverage lives in the catalog
(q_substring_dedup, q_semantic_dedup, q_gopher_quality,
q_inverted_index, q_temperature_mix); these tests pin the operator
semantics on constructed corpora where the right answer is countable
by hand.
"""

from __future__ import annotations

from forklift_spark.operators import dedup as D


def test_duplicated_ngram_stats_flags_shared_spans(spark):
    # doc 1 and 2 share the 5-word span "a b c d e"; doc 3 is unique.
    rows = [
        (1, "a b c d e x1 y1 z1"),  # grams: 4 total, 1 shared
        (2, "q2 a b c d e w2"),  # grams: 3 total, 1 shared
        (3, "p q r s t u v"),  # grams: 3 total, 0 shared
        (4, "tiny doc"),  # < n words -> whole text, unique
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in D.duplicated_ngram_stats(df, "doc_id", "text", n=5).collect()
    }
    assert out[1]["n_grams"] == 4 and out[1]["n_dup"] == 1
    assert out[2]["n_grams"] == 3 and out[2]["n_dup"] == 1
    assert out[3]["n_grams"] == 3 and out[3]["n_dup"] == 0
    assert out[4]["n_grams"] == 1 and out[4]["n_dup"] == 0
    assert out[1]["dup_fraction"] == 0.25


def test_duplicated_ngram_stats_counts_multiset_occurrences(spark):
    # within-doc repetition: the shared gram occurs twice in doc 1 —
    # both OCCURRENCES count as duplicated (multiset, unlike the
    # distinct-set Jaccard pipeline).
    rows = [
        (1, "a b c d e a b c d e"),  # 6 grams; all 6 contain a shared gram run
        (2, "a b c d e"),  # 1 gram, shared
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in D.duplicated_ngram_stats(df, "doc_id", "text", n=5).collect()
    }
    # doc 1 grams: [abcde, bcdea, cdeab, deabc, eabcd, abcde] — "abcde"
    # appears in doc 2 as well, so its TWO occurrences in doc 1 count.
    assert out[1]["n_grams"] == 6 and out[1]["n_dup"] == 2
    assert out[2]["n_grams"] == 1 and out[2]["n_dup"] == 1


def test_duplicated_ngram_stats_min_docs_threshold(spark):
    rows = [(1, "a b c d e"), (2, "a b c d e"), (3, "a b c d e")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    strict = D.duplicated_ngram_stats(df, "doc_id", "text", n=5, min_docs=4)
    assert all(r["n_dup"] == 0 for r in strict.collect())
    loose = D.duplicated_ngram_stats(df, "doc_id", "text", n=5, min_docs=3)
    assert all(r["n_dup"] == 1 for r in loose.collect())


# ---------------------------------------------------------------------------
# Winnowing fingerprints (operators/text.py) — guarantee + density
# ---------------------------------------------------------------------------


def test_winnowing_shared_substring_guarantee(spark):
    from forklift_spark.operators.text import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"zeta eta theta {shared} iota"),
            (3, "completely different content with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df, k=8, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    # docs 1 and 2 share a >= k+w-1 char substring -> >= 1 shared fingerprint
    assert by_doc[1] & by_doc[2]
    # doc 3 shares nothing that long with either
    assert not (by_doc[3] & by_doc[1]) and not (by_doc[3] & by_doc[2])
    # winnowing density: ~2/(w+1) of gram positions, never more than all
    n_grams = len(df.collect()[0].text) - 8 + 1
    assert 0 < len(by_doc[1]) < n_grams


def test_winnowing_short_text_yields_no_fingerprints(spark):
    from forklift_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    assert winnow_fingerprints(df, k=8, w=4).count() == 0



def test_subword_encode_greedy_longest_match(spark):
    from forklift_spark.queries.text import q_subword_encode
    from tests.conftest import SF_DIR

    rows = {r.w: r for r in q_subword_encode(spark, SF_DIR).collect()}
    for w, r in rows.items():
        toks = r.enc.split("|")
        assert "".join(toks) == w           # lossless round trip
        assert r.n_toks == len(toks)
        assert all(1 <= len(t) <= 4 for t in toks)
    # the n-gram vocabulary must actually compress something
    assert any(r.n_toks < len(w) for w, r in rows.items() if len(w) >= 3)
