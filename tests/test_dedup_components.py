"""Connected components over near-dup pair graphs.

Mirrors the reference's unit-test style for custom engine logic
(SURVEY.md §5): deterministic inputs, independent expected values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from forklift_spark.operators.dedup import connected_components, dedup_keep_canonical


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_chain_and_island_components(spark):
    # chain 1-2-3 (transitive cluster), island 7-8, pair order reversed
    pairs = _pairs(spark, [(2, 1), (2, 3), (8, 7)])
    got = {
        (r["id"], r["component"])
        for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}


def test_deep_chain_converges(spark):
    # a 12-hop path exercises multiple propagation rounds
    pairs = _pairs(spark, [(i, i + 1) for i in range(12)])
    comp = connected_components(pairs)
    assert {r["component"] for r in comp.collect()} == {0}
    assert comp.count() == 13


def test_very_deep_chain_needs_only_log_rounds(spark):
    # A 200-node path has diameter 199: plain one-hop propagation would
    # need ~199 rounds and silently return WRONG labels at max_iter=20.
    # Pointer doubling must converge within the default bound (O(log d)).
    pairs = _pairs(spark, [(i, i + 1) for i in range(199)])
    comp = connected_components(pairs)  # default max_iter=20
    rows = comp.collect()
    assert len(rows) == 200
    assert {r["component"] for r in rows} == {0}


def test_nonconvergence_raises_not_silent(spark):
    # the fail-safe: with an impossible round budget the function must
    # raise, never hand back partial labels
    import pytest

    pairs = _pairs(spark, [(i, i + 1) for i in range(30)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)


def test_dedup_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(6)], "doc_id long, text string"
    )
    # clusters {0,1,2} and {4,5}; doc 3 untouched
    pairs = _pairs(spark, [(0, 1), (1, 2), (4, 5)])
    kept = sorted(
        r["doc_id"] for r in dedup_keep_canonical(docs, pairs, "doc_id").collect()
    )
    assert kept == [0, 3, 4]


def test_cluster_sizes_match_sql_oracle(spark, oracle):
    import os

    from conftest import assert_matches_oracle
    from forklift_spark.queries.dedup import _components_oracle, q_dedup_components

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    got = q_dedup_components(spark, sf_dir)
    assert_matches_oracle(got, oracle, _components_oracle())


def test_fuzzy_blocking_loses_no_boundary_pairs(spark):
    """A pair whose lengths straddle a bucket boundary (39 vs 41 with
    bucket_width=20 -> buckets 1 and 2) must still collide, exactly once."""
    from pyspark.sql import Row

    from forklift_spark.operators.dedup import fuzzy_levenshtein_pairs

    df = spark.createDataFrame(
        [
            Row(id=1, text="alpha beta gamma", lang="en", n=39),
            Row(id=2, text="alpha beta gamme", lang="en", n=41),  # adjacent bucket
            Row(id=3, text="totally different text here", lang="en", n=40),
            Row(id=4, text="alpha beta gamma", lang="de", n=40),  # other block
        ]
    )
    out = fuzzy_levenshtein_pairs(
        df, "id", "text", block_col="lang", len_col="n",
        prefix_len=40, bucket_width=20, len_tol=10, max_dist=2,
    ).collect()
    assert [(r.id_a, r.id_b, r.dist) for r in out] == [(1, 2, 1)]


def test_dedup_keep_canonical_quality_survivor(spark):
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, q=0.2),
            Row(doc_id=2, q=0.9),  # best of {1,2,3} -> survives
            Row(doc_id=3, q=0.9),  # tie with 2 -> smaller id 2 wins
            Row(doc_id=4, q=0.5),  # unpaired -> survives
        ]
    )
    pairs = spark.createDataFrame([Row(id_a=1, id_b=2), Row(id_a=2, id_b=3)])
    kept = sorted(
        r["doc_id"]
        for r in dedup_keep_canonical(
            docs, pairs, "doc_id", quality_col="q"
        ).collect()
    )
    assert kept == [2, 4]


def test_minhash_estimator_tracks_exact_jaccard(spark):
    """Estimator QA: on every verified near-dup pair, the MinHash
    estimate (matching signature components / num_hashes) must track the
    exact shingle Jaccard within the binomial error of n=24 components."""
    from pyspark.sql import functions as F

    from forklift_spark import tables
    from forklift_spark.operators.dedup import (
        hashed_shingles,
        minhash_dedup_pairs,
        minhash_signatures,
    )
    from tests.conftest import SF_DIR

    docs = tables.load(spark, SF_DIR, "documents")
    nh = 24
    pairs = minhash_dedup_pairs(
        docs, "doc_id", "text", num_hashes=nh, bands=6, threshold=0.3
    )
    sigs = minhash_signatures(
        hashed_shingles(docs, "doc_id", "text", 3), "doc_id", nh
    )
    a = sigs.select(
        F.col("doc_id").alias("id_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(nh)]
    )
    b = sigs.select(
        F.col("doc_id").alias("id_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(nh)]
    )
    match = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(nh)
    )
    est = pairs.join(a, "id_a").join(b, "id_b").select(
        "id_a", "id_b", "jaccard", (match / F.lit(float(nh))).alias("est")
    )
    rows = est.collect()
    assert rows, "no near-dup pairs found at test SF"
    # 3-sigma binomial band around the exact jaccard per pair
    for r in rows:
        sigma = (r["jaccard"] * (1 - r["jaccard"]) / nh) ** 0.5
        assert abs(r["est"] - r["jaccard"]) <= max(3 * sigma, 0.2), (
            r["id_a"], r["id_b"], r["jaccard"], r["est"]
        )


def test_passjoin_equals_brute_force(spark):
    """PassJoin is LOSSLESS: the exact pair set of a brute-force
    levenshtein cross join, on strings with planted substitutions,
    inserts, deletes, empty and tiny strings, at tau = 1 and 2."""
    import random

    from pyspark.sql import functions as F

    from forklift_spark.operators.dedup import passjoin_pairs

    rng = random.Random(7)
    rows = []
    for i in range(120):
        base = "".join(rng.choice("ab") for _ in range(rng.randint(0, 9)))
        rows.append((i, base))
        if base:
            m = list(base)
            m[rng.randrange(len(m))] = rng.choice("abz")
            rows.append((1000 + i, "".join(m)))          # substitution
        rows.append((2000 + i, base + rng.choice("ab")))  # insert
        if len(base) > 1:
            rows.append((3000 + i, base[1:]))             # delete
    df = spark.createDataFrame(rows, "rid int, txt string")
    a, b = df.alias("a"), df.alias("b")
    for tau in (1, 2):
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in passjoin_pairs(df, "rid", "txt", max_dist=tau).collect()
        }
        brute = {
            (r.id_a, r.id_b, r.dist)
            for r in a.join(b, F.col("a.rid") < F.col("b.rid"))
            .select(
                F.col("a.rid").alias("id_a"),
                F.col("b.rid").alias("id_b"),
                F.levenshtein(F.col("a.txt"), F.col("b.txt")).alias("dist"),
            )
            .filter(F.col("dist") <= tau)
            .collect()
        }
        assert got == brute, (tau, len(got), len(brute))


def test_passjoin_block_cols_equals_constrained_brute_force(spark):
    """block_cols is a SEMANTIC equality constraint: the pair set equals
    brute force filtered to equal constraint values, and rows with a
    NULL constraint never pair (equi-join semantics, like ``a.c = b.c``
    in SQL)."""
    import random

    from pyspark.sql import functions as F

    from forklift_spark.operators.dedup import passjoin_pairs

    rng = random.Random(11)
    rows = []
    for i in range(80):
        base = "".join(rng.choice("ab") for _ in range(rng.randint(0, 8)))
        cat = rng.choice(["x", "y", None])
        rows.append((i, base, cat))
        if base:
            m = list(base)
            m[rng.randrange(len(m))] = rng.choice("abz")
            # same category half the time, different the other half:
            # both sides of the constraint must be exercised
            rows.append((1000 + i, "".join(m), cat if i % 2 else "y"))
    df = spark.createDataFrame(rows, "rid int, txt string, cat string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in passjoin_pairs(
            df, "rid", "txt", max_dist=2, block_cols=["cat"]
        ).collect()
    }
    a, b = df.alias("a"), df.alias("b")
    brute = {
        (r.id_a, r.id_b, r.dist)
        for r in a.join(
            b,
            (F.col("a.rid") < F.col("b.rid"))
            & (F.col("a.cat") == F.col("b.cat")),
        )
        .select(
            F.col("a.rid").alias("id_a"),
            F.col("b.rid").alias("id_b"),
            F.levenshtein(F.col("a.txt"), F.col("b.txt")).alias("dist"),
        )
        .filter(F.col("dist") <= 2)
        .collect()
    }
    assert got == brute, (len(got), len(brute))


def test_passjoin_rejects_wide_tau(spark):
    import pytest as _pytest

    from forklift_spark.operators.dedup import passjoin_pairs

    df = spark.createDataFrame([(1, "x")], "rid int, txt string")
    with _pytest.raises(ValueError):
        passjoin_pairs(df, "rid", "txt", max_dist=9)


def test_exact_span_dedup_semantics(spark):
    """Planted spans pin the ExactSubstr contract: a >= k repeated run
    is removed at every non-canonical occurrence AT ANY ALIGNMENT and
    unions across overlapping windows (12-word run -> all 12 tokens
    gone); short docs and unique text are untouched."""
    from forklift_spark.operators.dedup import exact_span_dedup

    span = " ".join(f"s{i}" for i in range(12))          # 12-word run
    rows = [
        # doc 0 owns the canonical occurrence (min packed key)
        (0, "a0 a1 " + span + " a2 a3"),
        # doc 1 repeats it at a DIFFERENT alignment (5 leading words)
        (1, "b0 b1 b2 b3 b4 " + span + " b5"),
        # doc 2: unique text, same length profile — untouched
        (2, " ".join(f"c{i}" for i in range(16))),
        # doc 3: shorter than k — can't even form a window
        (3, "d0 d1 d2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in exact_span_dedup(df, "doc_id", "text", k=10).collect()
    }
    # doc 0: canonical copy survives whole
    assert got[0].n_tokens == 16 and got[0].n_kept == 16
    assert span in got[0].cleaned_text
    # doc 1: all 12 span tokens removed (3 overlapping 10-grams union),
    # surrounding words survive
    assert got[1].n_tokens == 18 and got[1].n_kept == 6
    assert got[1].cleaned_text == "b0 b1 b2 b3 b4 b5"
    assert got[2].n_kept == 16 and got[3].n_kept == 3


def test_exact_span_dedup_within_doc_repeat(spark):
    """A doc repeating its own 10-word span keeps exactly the first
    occurrence (canonical = min position within the doc)."""
    from forklift_spark.operators.dedup import exact_span_dedup

    span = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(7, span + " mid " + span)], "doc_id long, text string"
    )
    r = exact_span_dedup(df, "doc_id", "text", k=10).collect()[0]
    assert r.n_tokens == 21 and r.n_kept == 11
    assert r.cleaned_text == span + " mid"


def test_exact_span_dedup_matches_python_model(spark):
    """Property: on random small-vocabulary corpora (dense genuine
    repeats, self-overlapping runs like 'a a a ...'), the operator
    equals a direct Python model of the ExactSubstr contract."""
    import random
    import re

    from forklift_spark.operators.dedup import exact_span_dedup

    def model(docs, k):
        toks = {d: re.sub(r"\s+", " ", t.lower()).strip().split(" ")
                for d, t in docs}
        occ = {}  # gram text -> list of (doc, pos)
        for d, ws in toks.items():
            for p in range(len(ws) - k + 1):
                occ.setdefault(" ".join(ws[p:p + k]), []).append((d, p))
        covered = {d: set() for d in toks}
        for g, lst in occ.items():
            if len(lst) < 2:
                continue
            cd, cp = min(lst, key=lambda x: x[0] * 1000000 + x[1])
            for d, p in lst:
                if (d, p) != (cd, cp):
                    covered[d].update(range(p, p + k))
        out = {}
        for d, ws in toks.items():
            kept = [w for i, w in enumerate(ws) if i not in covered[d]]
            out[d] = (len(ws), len(kept), " ".join(kept))
        return out

    rng = random.Random(23)
    for trial, (vocab, k) in enumerate([("ab", 3), ("abc", 4), ("a", 5)]):
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
            for i in range(40)
        ]
        want = model(docs, k)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_tokens, r.n_kept, r.cleaned_text)
            for r in exact_span_dedup(df, "doc_id", "text", k=k).collect()
        }
        assert got == want, (trial, {d: (got[d], want[d])
                                     for d in got if got[d] != want[d]})


def test_passjoin_collapse_exact_equals_brute_force_on_duplicates(spark):
    """Replicated corpora: identical strings collapse to one
    representative, pairs expand back — result must equal brute force
    (and the collapse_exact=False path) exactly, including the
    within-group distance-0 pairs."""
    import itertools

    from pyspark.sql import functions as F

    from forklift_spark.operators.dedup import passjoin_pairs

    words = ["alpha", "alphq", "alpha", "beta", "betaa", "alpha",
             "gamma", "gamm", "beta", "delta1", "delta2", "delta1"]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "rid long, txt string")

    def brute(tau):
        out = set()
        for (i, a), (j, b) in itertools.combinations(enumerate(words), 2):
            import difflib  # noqa: F401  (kept obvious: pure-python lev)

            # simple DP levenshtein
            la, lb = len(a), len(b)
            prev = list(range(lb + 1))
            for x in range(1, la + 1):
                cur = [x] + [0] * lb
                for y in range(1, lb + 1):
                    cur[y] = min(prev[y] + 1, cur[y - 1] + 1,
                                 prev[y - 1] + (a[x - 1] != b[y - 1]))
                prev = cur
            if prev[lb] <= tau:
                out.add((i, j, prev[lb]))
        return out

    for tau in (1, 2):
        want = brute(tau)
        got_on = {
            (r.id_a, r.id_b, r.dist)
            for r in passjoin_pairs(df, "rid", "txt", max_dist=tau).collect()
        }
        got_off = {
            (r.id_a, r.id_b, r.dist)
            for r in passjoin_pairs(df, "rid", "txt", max_dist=tau,
                                    collapse_exact=False).collect()
        }
        assert got_on == want, f"tau={tau}: {got_on ^ want}"
        assert got_off == want


def test_passjoin_count_filter_short_keys_lossless(spark):
    """Short small-alphabet keys: count filter on / off produce the
    identical exact pair set of a brute-force levenshtein join (the
    filter is lossless; it is default-OFF because this regime is
    output-bound — see the operator docstring's r7 measurement)."""
    import random

    from pyspark.sql import functions as F

    from forklift_spark.operators.dedup import passjoin_pairs

    rng = random.Random(13)
    rows = [(i, "".join(rng.choice("0123456789")
                        for _ in range(rng.randint(5, 6))))
            for i in range(400)]
    df = spark.createDataFrame(rows, "rid int, txt string")
    a, b = df.alias("a"), df.alias("b")
    brute = {
        (r.id_a, r.id_b, r.dist)
        for r in a.join(b, F.col("a.rid") < F.col("b.rid"))
        .select(F.col("a.rid").alias("id_a"), F.col("b.rid").alias("id_b"),
                F.levenshtein(F.col("a.txt"), F.col("b.txt")).alias("dist"))
        .filter(F.col("dist") <= 2).collect()
    }
    for cf in (True, False):
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in passjoin_pairs(df, "rid", "txt", max_dist=2,
                                    count_filter=cf).collect()
        }
        assert got == brute, (cf, len(got), len(brute))
