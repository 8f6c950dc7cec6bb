"""Deduplication operators for document corpora.

No counterpart in the reference (its upsert dedups by primary key only,
`transports/mysql.rb:82-87`); these are the operators a training-data
pipeline needs at 100 TB, each expressed as pure built-in-function
DataFrame plans (no Python UDFs anywhere):

- exact dedup           content fingerprint (md5 of normalized text),
                        keep the lowest id per group.
- MinHash + LSH         shingle -> seeded-md5 minhash signature -> band
                        buckets -> candidate pairs -> exact-Jaccard verify.
- SimHash               per-token md5 bit votes -> 16-bit signature;
                        near-dup = Hamming distance <= k, candidates via
                        band equality (pigeonhole: k diffs over k+1 bands
                        leave one band intact — no O(n²) scan).
- n-gram Jaccard        exact set Jaccard within blocking keys (the
                        small-scale baseline the sketches approximate).

Scale notes: every pair-generating step goes through a bucket/band
equi-join (shuffle on the band key), never a cross join. Hot buckets
(constant bands from degenerate docs) are the skew risk — AQE skew-join
handles moderate cases; beyond that, cap bucket size before the
self-join. All hashing is engine-portable md5 (functions.hashing), so
every operator is verifiable against an independent SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from forklift_spark.functions.hashing import md5_long_seeded

# ---------------------------------------------------------------------------
# normalization + exact dedup
# ---------------------------------------------------------------------------


def normalize_text(col: Column | str) -> Column:
    """lowercase, collapse whitespace, trim — the canonical form for
    content fingerprinting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep exactly one row per distinct normalized text: the one with
    the lowest id (deterministic winner). Implemented as a min-id
    aggregation + semi-join instead of a window so the heavy side never
    sorts: at 100 TB this is two hash shuffles on the fingerprint."""
    fp = df.withColumn("__fp", fingerprint(text_col))
    winners = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return fp.join(winners, [ "__fp", id_col], "left_semi").drop("__fp")


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def shingles_from_words(words: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a words-array COLUMN. The
    caller must materialize the split into a real column first: inlining
    `split(regexp_replace(...))` here would make Catalyst re-evaluate the
    regex per element access — O(words²) per document. Documents with
    fewer than n words contribute their joined text as one shingle."""
    k = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), k - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(k >= n, grams).otherwise(F.array(F.array_join(words, " ")))
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Convenience wrapper for small inputs — see shingles_from_words for
    the two-step form used in hot paths."""
    return shingles_from_words(F.split(normalize_text(col), " "), n)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


H2_MOD = 1 << 55  # second digest slice width; kept in the narrow persisted
# (id, h1, h2) shingle form for compatibility (minhash no longer derives
# its hash family from h2 — see minhash_signatures)


def exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, s) rows of word n-gram shingles — the relational formulation.

    posexplode(split(...)) evaluates the tokenizer ONCE per document
    (generators materialize their child), then a lead() window builds
    each n-gram — no nested-array lambdas, which matters because
    Catalyst's CollapseProject re-inlines expression-defined arrays into
    every element access inside transform() lambdas (no CSE across
    lambda boundaries), turning array-based shingling O(words²) in the
    tokenizer. Rows may contain duplicate shingles; min-hashing is
    multiset-invariant, and set consumers distinct() first.

    Documents with fewer than n words contribute their whole normalized
    text as one shingle (parity with the array/oracle formulation).
    """
    from pyspark.sql import Window as W

    base = df.select(F.col(id_col), F.split(normalize_text(text_col), " ").alias("w"))
    pos = base.select(
        F.col(id_col),
        F.size("w").alias("wc"),
        F.array_join("w", " ").alias("whole"),
        F.posexplode("w").alias("pos", "w0"),
    )
    win = W.partitionBy(id_col).orderBy("pos")
    grams = [F.col("w0")] + [F.lead("w0", j).over(win) for j in range(1, n)]
    shingled = pos.withColumn("s", F.concat_ws(" ", *grams))
    return shingled.filter(
        ((F.col("wc") >= n) & (F.col("pos") <= F.col("wc") - n))
        | ((F.col("wc") < n) & (F.col("pos") == 0))
    ).select(
        id_col,
        F.when(F.col("wc") < n, F.col("whole")).otherwise(F.col("s")).alias("s"),
    )


def hashed_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct (id, h1, h2) hashed shingle rows: each shingle string is
    collapsed to two 60-bit md5 longs immediately after shingling, and
    the strings are dropped. Everything downstream (signatures, Jaccard
    verification) shuffles 24-byte rows instead of full shingle text —
    at 100 TB this is the difference between shuffling ~corpus-size and
    shuffling a few percent of it. h1 doubles as the shingle's identity
    for set intersection (both engines hash identically, so even a
    collision produces the same answer on both sides of the oracle).

    ONE md5 per shingle: h1/h2 are the digest's two disjoint 15-hex-char
    slices (md5 bits are independent — a standard Kirsch-Mitzenmacher
    seed pair). The shingle hash is the biggest expression pass of the
    dedup pipeline, so halving the digest work is a direct scan-speed
    win at any scale.
    """
    expl = exploded_shingles(df, id_col, text_col, n)
    digest = F.md5(F.concat(F.lit("s:"), F.col("s")))
    h1 = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 16, 15), 16, 10).cast("long") % F.lit(H2_MOD)
    return expl.select(id_col, h1.alias("h1"), h2.alias("h2")).distinct()


def minhash_signatures(
    hashed: DataFrame, id_col: str, num_hashes: int
) -> DataFrame:
    """(id, mh0..mh{n-1}) from hashed (id, h1, ...) shingle rows: each
    hash function is an INDEPENDENT seeded re-hash of the shingle's
    60-bit identity h1, two 60-bit minhashes per md5 digest (so 16
    hashes cost 8 md5 calls per shingle row), one groupBy with map-side
    partial min — scan-speed at 100 TB.

    Why not linear double hashing: the previous mh_i = min(h1 + i*h2)
    had NO modular wrap in range (h1 < 2^60 dominates i*h2 < 2^59 for
    i < 16), so g_i(x) - g_i(y) was monotone in i and the 16 argmins
    tracked a lower envelope of lines — heavily correlated hash
    functions that flatten the LSH banding s-curve (short docs could
    draw all 16 minhashes from one shingle). A true Kirsch-Mitzenmacher
    reduction needs (h1 + i*h2) mod p with wraps actually occurring,
    which int64 arithmetic here cannot express portably; independent
    md5 seeds are the engine-portable fix (same family as
    functions/hashing.py)."""
    h1s = F.col("h1").cast("string")
    cols = []
    for j in range((num_hashes + 1) // 2):
        digest = F.md5(F.concat(F.lit(f"mh{j}:"), h1s))
        cols.append(
            F.conv(F.substring(digest, 1, 15), 16, 10).cast("long").alias(f"g{2 * j}")
        )
        if 2 * j + 1 < num_hashes:
            cols.append(
                F.conv(F.substring(digest, 16, 15), 16, 10)
                .cast("long")
                .alias(f"g{2 * j + 1}")
            )
    proj = hashed.select(F.col(id_col), *cols)
    return proj.groupBy(id_col).agg(
        *[F.min(f"g{i}").alias(f"mh{i}") for i in range(num_hashes)]
    )


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, bands: int, rows: int
) -> DataFrame:
    """Band the signature (bands × rows minhashes) and emit distinct
    candidate pairs (id_a < id_b) that collide in >= 1 band.

    The band key is md5 over the band's minhashes; candidates come from
    an equi-self-join on (band_index, band_key) — a shuffle join on the
    bucket, never a cross join.
    """
    n_sig = len([c for c in sigs.columns if c.startswith("mh")])
    if rows < 1 or bands < 1 or bands * rows != n_sig:
        raise ValueError(
            f"bands ({bands}) x rows ({rows}) must equal the signature "
            f"width ({n_sig}); rows=0 would give every doc the same empty "
            "band key (an all-pairs join)"
        )
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *parts)).alias("key"),
            )
        )
    banded = sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def _jaccard_from_inter(inter: DataFrame, sizes: DataFrame, threshold: float) -> DataFrame:
    """(id_a, id_b, jaccard) from intersection counts + per-id set sizes:
    |∪| = |A| + |B| - |∩|; the integer-count division is engine-exact."""
    na = sizes.select(F.col(sizes.columns[0]).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(sizes.columns[0]).alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_on_pairs(
    cands: DataFrame, hashed: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact shingle Jaccard for candidate (id_a, id_b) pairs over
    hashed (id, h1, ...) shingle rows: |∩| via a join on h1, three hash
    joins on longs, map-side-combined counts. Pairs with an empty
    intersection vanish in the count join — correct for threshold > 0."""
    sizes = hashed.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = hashed.select(F.col(id_col).alias("id_a"), "h1")
    b = hashed.select(F.col(id_col).alias("id_b"), "h1")
    inter = (
        cands.join(a, "id_a")
        .join(b, ["id_b", "h1"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _jaccard_from_inter(inter, sizes, threshold)


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH candidates verified with
    exact shingle Jaccard (id_a, id_b, jaccard). rows-per-band =
    num_hashes // bands; the LSH s-curve threshold is (1/bands)^(1/rows)
    (~0.35 for 8×2).

    The hashed shingle set feeds three consumers (signatures + both
    sides of the verify join); it is persisted (spill-to-disk) so the
    tokenize/shingle/window pass runs once, not three times — the
    persisted form is the narrow (id, h1, h2) long rows, a few percent
    of corpus size.
    """
    from pyspark import StorageLevel

    rows = num_hashes // bands
    # small-file inputs arrive as 1-2 partitions; fan out before the
    # CPU-heavy shingling/hashing so all cores work (at real scale the
    # scan already yields many partitions and AQE coalesces as needed)
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    hashed = hashed_shingles(df, id_col, text_col, shingle_n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # persist the (tiny: one row per doc) signature frame: the band
    # self-join otherwise embeds the 8-md5-per-shingle signature
    # projection TWICE in one fused stage, which was measured to fall
    # off the fast path (~4s extra at sf0.1 vs ~0.5s for the pass run
    # once) — and at scale the signature is the thing you persist anyway
    # (see similarity.signature_table for the written-table form)
    sigs = minhash_signatures(hashed, id_col, num_hashes).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cands = lsh_candidate_pairs(sigs, id_col, bands, rows)
    return jaccard_on_pairs(cands, hashed.select(id_col, "h1"), id_col, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """bits-wide frequency-weighted SimHash (Charikar) per document:
    each token votes ±count(token) on every bit position of its md5
    hash; the signature takes the sign of each bit's vote sum. Frequency
    weighting matters: on narrow-vocabulary corpora unweighted token-set
    simhash degenerates (every doc has nearly the same distinct-token
    set and hamming<=k matches quadratically many pairs). One explode +
    two groupBys — still scan-speed + two shuffles at 100 TB."""
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    toks = (
        df.select(
            F.col(id_col),
            F.explode(F.split(normalize_text(text_col), " ")).alias("tok"),
        )
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("h", md5_long_seeded(F.col("tok"), 0))
    )
    votes = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, F.col("cnt")
            ).otherwise(-F.col("cnt"))
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sig = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**j)
        sig = bit if sig is None else sig + bit
    return agg.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with Hamming(simhash_a, simhash_b) <= max_hamming.

    Candidates via banding: split the signature into max_hamming+1
    bands; any pair within the Hamming budget shares at least one exact
    band (pigeonhole), so an equi-join on (band, band_bits) finds all of
    them without an all-pairs scan.
    """
    nb = max_hamming + 1
    width = bits // nb + (1 if bits % nb else 0)
    # one long per doc: cache the signatures so the tokenize + 2-shuffle
    # simhash pass runs once, not once per side of the band self-join
    sig = simhash(df, id_col, text_col, bits).persist()
    banded = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for b in range(nb)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard within blocks
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact shingle-Jaccard pairs within a blocking key (same lang,
    same domain, ...). The honest quadratic baseline the sketches
    approximate — candidates are every same-block pair that shares at
    least one shingle (equivalent to all pairs for threshold > 0), via
    an inverted-index join on (block, shingle). At 100 TB cap ultra-
    frequent shingles ("stop-shingles") before the self-join."""
    from pyspark import StorageLevel

    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    blocks = df.select(F.col(id_col), F.col(block_col).alias("__blk"))
    hashed = (
        hashed_shingles(df, id_col, text_col, shingle_n)
        .select(id_col, "h1")
        .join(blocks, id_col)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # intersection counts straight off the inverted-index self-join on
    # (block, shingle-hash): groupBy with map-side combine bounds the
    # shuffle at the number of co-occurring pairs — no candidate
    # materialization + re-join (which would run the expensive join twice)
    a = hashed.select(F.col(id_col).alias("id_a"), "h1", "__blk")
    b = hashed.select(F.col(id_col).alias("id_b"), "h1", "__blk")
    inter = (
        a.join(b, ["__blk", "h1"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = hashed.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    return _jaccard_from_inter(inter, sizes, threshold)


# ---------------------------------------------------------------------------
# benchmark decontamination: n-gram containment against an eval set
# ---------------------------------------------------------------------------


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_containment: float = 0.5,
) -> DataFrame:
    """(corpus_id, bench_id, containment) where containment =
    |corpus ∩ bench| / |bench| over distinct shingle sets — the
    decontamination pass of a training pipeline: a corpus doc containing
    most of a benchmark item's n-grams leaks the benchmark.

    Same relational shape as the dedup verifiers: hash shingles to
    longs, inverted-index equi-join on the hash, count-aggregate with
    map-side combine. The benchmark side is tiny relative to the corpus
    -> its hashed shingles broadcast; the corpus streams once.
    """
    c = hashed_shingles(corpus, id_col, text_col, shingle_n).select(
        F.col(id_col).alias("corpus_id"), "h1"
    )
    b = hashed_shingles(benchmark, id_col, text_col, shingle_n).select(
        F.col(id_col).alias("bench_id"), "h1"
    )
    b_sizes = b.groupBy("bench_id").agg(F.count(F.lit(1)).alias("nb"))
    inter = (
        c.join(F.broadcast(b), "h1")
        .groupBy("corpus_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(F.broadcast(b_sizes), "bench_id")
        .withColumn(
            "containment", F.col("inter").cast("double") / F.col("nb").cast("double")
        )
        .filter(F.col("containment") >= min_containment)
        .select("corpus_id", "bench_id", "containment")
    )


# ---------------------------------------------------------------------------
# connected components: near-dup pairs -> dedup clusters
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    left: str = "id_a",
    right: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Group a near-duplicate pair list into clusters: returns
    (id, component) for every id that appears in ``pairs``, where
    ``component`` is the smallest id reachable through the pair graph —
    the canonical representative a dedup pass keeps.

    This is the step between "pairs" and "deduped corpus": MinHash/
    SimHash/embedding dedup all emit pairwise edges, but dropping one
    side of each pair over-deletes when clusters chain (a~b, b~c: b and
    c both lose). Component-wise, exactly one doc per cluster survives.

    Algorithm: min-label propagation with POINTER DOUBLING. Each round
    every node adopts the minimum label among itself and its neighbors
    (one shuffle: groupBy on node id), then labels are shortcut through
    themselves (component := component-of-component, one more small
    join) — the path-halving step of Kiveris et al.'s MapReduce
    connected components. Plain propagation moves the min label one hop
    per round (a depth-d chain needs d rounds — silently WRONG past
    ``max_iter``); with the shortcut the label distance roughly halves
    per round, so convergence is O(log d): a 1M-node chain converges in
    ~20 rounds. Lineage is cut with localCheckpoint per round so the
    plan doesn't grow across iterations; convergence is detected with a
    bounded-scalar count (the only driver-visible value). If the graph
    still hasn't converged after ``max_iter`` rounds the function
    RAISES rather than return wrong components — a dedup pass built on
    partial labels over- and under-deletes unpredictably.
    """
    # materialize the pair list ONCE before symmetrizing: the union reads
    # `pairs` twice, and pairs is typically an expensive lazy plan (the
    # whole MinHash band-join) — without this the generator runs twice
    # (measured: 2x the pair-generation time at sf0.1).
    pairs = pairs.select(
        F.col(left).alias("src"), F.col(right).alias("dst")
    ).localCheckpoint(eager=True)
    edges = (
        pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Size the iteration parallelism to the graph, not the session default:
    # near-dup pair graphs are orders of magnitude smaller than the corpus
    # (bounded scalar — the checkpoint above already materialized them), so
    # iterating at corpus partitioning wastes a fixed per-task cost every
    # round. ~500k edges per partition keeps tasks meaningful; a 100 TB
    # corpus with billions of edges still gets thousands of partitions.
    n_edges = edges.count()
    parts = max(1, min(edges.rdd.getNumPartitions(), (n_edges // 500_000) + 1))
    if parts < edges.rdd.getNumPartitions():
        edges = edges.repartition(parts, "dst").localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        propagated = labels.join(
            nbr_min, labels["id"] == nbr_min["src"], "left"
        ).select(
            "id",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
            ).alias("component"),
            F.col("component").alias("_prev"),
        )
        # pointer doubling: component := component's component. Labels are
        # always node ids present in `labels` (the min over a reachable
        # set), so the lookup hits; the label-to-root distance ~halves.
        lut = propagated.select(
            F.col("id").alias("_cid"), F.col("component").alias("_ccomp")
        )
        new_labels = (
            propagated.join(lut, propagated["component"] == lut["_cid"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("_ccomp"), F.col("component"))
                ).alias("component"),
                "_prev",
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("component") != F.col("_prev")).count()
        labels = new_labels.drop("_prev")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the pair graph has pathological depth — raise max_iter "
        "(rounds needed ~ log2(component diameter))"
    )


def dedup_keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    left: str = "id_a",
    right: str = "id_b",
    quality_col: str | None = None,
) -> DataFrame:
    """Apply a pair list to a corpus: keep one doc per connected
    component, plus every doc that is in no pair. One anti-join against
    the non-canonical member set — the corpus streams once.

    Survivor selection: smallest id by default; with ``quality_col``,
    the highest-quality member wins (ties to smallest id) — the corpus
    curation policy ("keep the best variant, not the first-crawled") as
    one extra per-component max_by over the (small) component table."""
    comp = connected_components(pairs, left, right)
    if quality_col is None:
        losers = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_col)
        )
    else:
        scored = comp.join(
            df.select(F.col(id_col).alias("id"), F.col(quality_col).alias("_q")),
            "id",
        )
        # max_by over a (quality, -id) struct: Spark orders structs
        # lexicographically, so ties on quality break to the smallest id
        winners = scored.groupBy("component").agg(
            F.max_by("id", F.struct(F.col("_q"), (-F.col("id")).alias("_neg"))).alias(
                "_win"
            )
        )
        losers = (
            comp.join(winners, "component")
            .filter(F.col("id") != F.col("_win"))
            .select(F.col("id").alias(id_col))
        )
    return df.join(losers, id_col, "left_anti")


def fuzzy_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    len_col: str,
    prefix_len: int = 40,
    bucket_width: int = 20,
    len_tol: int = 10,
    max_dist: int = 8,
) -> DataFrame:
    """Blocked edit-distance matching (record linkage / near-dup titles).

    Candidate generation is an EQUI-join on (block_col, length-bucket):
    the left side emits its bucket and both neighbors, so any pair within
    ``len_tol`` (<= bucket_width/2) characters of each other collides in
    exactly one bucket — no cross join, no duplicate pairs, and no pair
    missed at a bucket boundary. Levenshtein runs only inside blocks
    (honest quadratic-within-block baseline, same contract as
    blocked n-gram Jaccard above); the reference has no fuzzy matching —
    this covers the MySQL-user surface of e.g. ``LIKE``-based reconcile
    scripts with a principled operator.

    Returns (id_a, id_b, dist) with id_a < id_b, dist <= max_dist over
    the first ``prefix_len`` characters.
    """
    if len_tol > bucket_width // 2:
        raise ValueError(
            f"len_tol ({len_tol}) must be <= bucket_width//2 "
            f"({bucket_width // 2}): the +/-1-bucket probe cannot reach "
            "pairs whose length gap spans more than one bucket, so larger "
            "tolerances would silently drop boundary pairs"
        )
    head = F.substring(F.col(text_col), 1, prefix_len)
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(block_col).alias("_blk"),
        F.col(len_col).alias("_len"),
        head.alias("_head"),
        (F.col(len_col) / F.lit(bucket_width)).cast("long").alias("_b"),
    )
    left = base.withColumn(
        "_probe", F.explode(F.array(F.col("_b") - 1, F.col("_b"), F.col("_b") + 1))
    )
    right = (
        base.withColumnRenamed("_id", "_id_r")
        .withColumnRenamed("_len", "_len_r")
        .withColumnRenamed("_head", "_head_r")
        .withColumnRenamed("_b", "_probe")
    )
    # thresholded levenshtein: the DP early-exits once a row of the matrix
    # exceeds max_dist and returns -1 — same surviving set, cheaper on the
    # (majority) non-matching pairs inside a block
    dist = F.levenshtein(F.col("_head"), F.col("_head_r"), max_dist)
    return (
        left.join(right, ["_blk", "_probe"])
        .filter(
            (F.col("_id") < F.col("_id_r"))
            & (F.abs(F.col("_len") - F.col("_len_r")) <= len_tol)
        )
        .select(
            F.col("_id").alias("id_a"),
            F.col("_id_r").alias("id_b"),
            dist.alias("dist"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )


def passjoin_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    prefix_len: int = 64,
    block_cols: list[str] | None = None,
    strip_common_prefix: bool = True,
    collapse_exact: bool = True,
    count_filter: bool = False,
) -> DataFrame:
    """LOSSLESS edit-distance self-join with NO user blocking key
    (PassJoin — Li, Deng, Feng, VLDB 2011 — with the simple +/-tau
    position windows).

    ``fuzzy_levenshtein_pairs`` above is exact only WITHIN the caller's
    blocks, and a fixed-cardinality block key goes quadratic as data
    grows (SCALE_SF1_r6: entity resolution grew 14.9x on 10x rows
    because (nation, balance-band) has ~2.7k blocks at every SF). This
    operator needs no blocks. Partition every string into
    ``max_dist + 1`` contiguous segments by a rule derived only from
    the string LENGTH; tau edit operations can break at most tau of
    them, so any string within distance tau must contain at least one
    segment as an EXACT substring (pigeonhole over an optimal edit
    transcript), start-shifted within the MULTI-MATCH-AWARE window
    |d| + |delta - d| <= tau (d = start shift, delta = length gap; see
    the derivation at the window computation below) — at most tau+1
    positions per (length, ordinal), not the naive 2*tau+1. Probing is
    DIRECTIONAL: each string probes only indexed lengths <= its own,
    so for any pair the longer string finds the shorter one's segments
    (equal lengths are found from both sides and collapsed by the
    normalize+distinct below) — this halves the fan-out vs probing
    both length directions. Candidates come from an equi-join on
    (indexed length, segment ordinal, substring): the probe side emits
    at most ~(tau+1)^2 * (tau+1) short substrings per row (24 at
    tau=2, down from 45 with the naive window), so the shuffle is
    O(24 N) tiny rows, never O(N^2); a thresholded levenshtein
    verifies the deduplicated candidates.

    Strings shorter than ``max_dist + 1`` get empty segments, whose
    keys degrade to a pure length-window join among tiny strings —
    correct, and bounded by the tiny-string population.

    ``strip_common_prefix`` (default on) removes the longest literal
    prefix shared by EVERY string before segmenting. Keyed corpora
    (TPC-H ``Customer#000...``) put all their entropy in the tail, so
    raw segment keys degenerate — measured at sf1: 8.5M candidates for
    45k true pairs, i.e. PassJoin collapsed to prefix-group density.
    Stripping is LOSSLESS and value-identical: when a[0] == b[0],
    lev(a, b) == lev(a[1:], b[1:]) (the DP diagonal lemma), applied
    p times for a p-char shared prefix. The prefix is found from one
    tiny agg — the set-wide LCP equals LCP(min(s), max(s)) under
    lexicographic order — a bounded 2-value driver collect.

    ``block_cols`` adds SEMANTIC equality constraints (pairs must agree
    on every listed column — e.g. record linkage only within the same
    nation) by folding them into the candidate equi-join key. Unlike a
    blocking key, they don't carry the recall: the segment substring
    still spreads a dense constraint cell across many join keys, so a
    fixed-cardinality constraint stays O(75 N + matches), not
    O(N^2 / cells). Rows NULL in any constraint column never pair
    (equi-join semantics, matching the SQL predicate ``a.c = b.c``).

    ``collapse_exact`` (default on) runs the join over DISTINCT
    (text, constraints) groups and expands afterwards: identical
    strings collapse to one representative before segmenting, rep-level
    near-pairs multiply back through each side's id list, and
    within-group pairs emit directly at distance 0. LOSSLESS — every
    id pair and distance is identical — but on replicated corpora the
    candidate/verification volume drops by the square of the
    duplication factor (measured: the 10x-replicated sf1 stress holds
    202,500 genuine distance-0 pairs; collapsing verifies each distinct
    pair once and expands the rest with a join). Cost on an all-distinct
    corpus: one extra groupBy shuffle of skinny rows.

    ``count_filter`` (default False) adds the q-gram-style COUNT
    secondary prune (NOTES_r6 §4 / VERDICT r6 item 5): each side
    precomputes a 16-bucket character histogram once per string;
    candidates whose bucket-histogram L1 distance exceeds 2*tau are
    dropped straight off the join, BEFORE the normalize/distinct/
    verify. LOSSLESS: one edit operation moves the character multiset
    by at most L1 = 2 (substitution: one symbol out + one in;
    insert/delete: 1), so lev(a,b) <= tau implies char-L1 <= 2*tau,
    and hash-bucketing only merges counts (bucket-L1 <= char-L1) — a
    necessary condition, never sufficient, so no true pair is dropped.

    It is OFF by default because the short-key dense regime it was
    proposed for turned out OUTPUT-bound, not candidate-bound —
    measured r7 on 15,000 5-6-digit keys (sf0.1 custkeys as strings):
    tau=2 has 4,906,943 TRUE pairs (4.4% of all pairs — nearly every
    candidate must be emitted anyway), and the filter made the join
    58.8s -> 231.5s at tau=2 and 6.9s -> 14.2s at tau=1, pairs
    identical, because the per-candidate interpreted histogram-L1
    costs more than the threshold levenshtein it tries to save and
    the 16-int arrays widen the exploded candidate shuffle. No
    candidate filter can beat the true-pair floor; a lossless matcher
    must verify-and-emit them. Opt in only for corpora where SPURIOUS
    candidates dominate true pairs (low-entropy segments but high
    character-multiset diversity) — and measure.

    Returns (id_a, id_b, dist) with id_a < id_b, dist <= max_dist over
    the first ``prefix_len`` characters.
    """
    tau = int(max_dist)
    if not 1 <= tau <= 4:
        raise ValueError(
            "max_dist must be in [1, 4]: probe fan-out is "
            "(tau+1)^2 * (2*tau+1) keys per row"
        )
    k = tau + 1
    bc_names = [f"_bc{j}" for j in range(len(block_cols or []))]
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            F.substring(F.col(text_col), 1, prefix_len).alias("_s"),
            *[
                F.col(c).alias(n)
                for c, n in zip(block_cols or [], bc_names)
            ],
        )
        .filter(F.col("_s").isNotNull())
        .withColumn("_n", F.length("_s"))
    )
    if strip_common_prefix:
        # set-wide LCP = LCP(min, max); bounded collect of exactly two
        # scalar strings. lev(P+u, P+v) == lev(u, v) for the shared P,
        # so both the candidate keys AND the returned distances are
        # unchanged — only the key entropy improves.
        mm = base.agg(F.min("_s").alias("lo"), F.max("_s").alias("hi")).first()
        lo_s, hi_s = (mm["lo"], mm["hi"]) if mm else (None, None)
        p = 0
        if lo_s is not None and hi_s is not None:
            while p < min(len(lo_s), len(hi_s)) and lo_s[p] == hi_s[p]:
                p += 1
        if p:
            base = base.withColumn(
                "_s", F.col("_s").substr(F.lit(p + 1), F.lit(prefix_len))
            ).withColumn("_n", F.length("_s"))
    use_count_filter = bool(count_filter)

    groups = None
    if collapse_exact:
        # one representative per (text, constraints); ids sorted so the
        # within-group emit below is already (id_a < id_b)-normalized
        groups = base.groupBy("_s", "_n", *bc_names).agg(
            F.sort_array(F.collect_list("_id")).alias("_ids")
        )
        base = groups.select(
            F.element_at("_ids", 1).alias("_id"), "_s", "_n", *bc_names
        )

    hist_cols: list[str] = []
    if use_count_filter:
        # 16-bucket character histogram, computed ONCE per (distinct)
        # string; rides the exploded candidate rows like _s does
        chars = F.filter(F.split(F.col("_s"), ""), lambda c: c != F.lit(""))
        buckets = F.transform(chars, lambda c: F.pmod(F.hash(c), F.lit(16)))
        hist = F.aggregate(
            buckets,
            F.array_repeat(F.lit(0), 16),
            lambda acc, b: F.transform(
                acc, lambda x, i: x + F.when(i == b, 1).otherwise(0)
            ),
        )
        base = base.withColumn("_h", hist)
        hist_cols = ["_h"]

    def seg_len(length: Column, i: Column) -> Column:
        return (
            F.floor(length / k).cast("int")
            + F.when(i < length % k, 1).otherwise(0)
        )

    def seg_pos(length: Column, i: Column) -> Column:
        return (
            i * F.floor(length / k).cast("int") + F.least(i, length % k)
        ).cast("int")

    # INDEX side: each string contributes its tau+1 canonical segments,
    # keyed by (own length, segment ordinal, segment text)
    iv = F.col("_i")
    idx = (
        base.select(
            F.col("_id").alias("_id_b"),
            F.col("_s").alias("_s_b"),
            F.col("_n").alias("_ns"),
            *bc_names,
            *[F.col("_h").alias("_h_b") for _ in hist_cols],
            F.explode(F.sequence(F.lit(0), F.lit(tau))).alias("_i"),
        )
        .withColumn("_gl", seg_len(F.col("_ns"), iv))
        .withColumn("_gp", seg_pos(F.col("_ns"), iv))
        .select(
            "_id_b", "_s_b", "_ns", "_i", *bc_names,
            *(["_h_b"] if hist_cols else []),
            F.col("_s_b").substr(F.col("_gp") + 1, F.col("_gl")).alias("_kseg"),
        )
    )

    # PROBE side: for every indexable length within +/-tau and every
    # segment ordinal, emit the substrings of this string that could be
    # that segment's surviving copy (start shift <= tau, fully inside)
    pr = (
        base.withColumn(
            "_ns",
            F.explode(
                F.sequence(
                    F.greatest(F.col("_n") - tau, F.lit(0)),
                    F.col("_n"),
                )
            ),
        )
        .withColumn("_i", F.explode(F.sequence(F.lit(0), F.lit(tau))))
        .withColumn("_gl", seg_len(F.col("_ns"), iv))
        .withColumn("_gp", seg_pos(F.col("_ns"), iv))
    )
    # multi-match-aware start window (PassJoin Lemma 3, derived from
    # transcript splitting): if an optimal transcript preserves this
    # segment at shift d = q - p, then ops before it >= |d| and ops
    # after >= |delta - d| (delta = probe len - indexed len >= 0 under
    # directional probing), so |d| + |delta - d| <= tau bounds
    # d in [ceil((delta-tau)/2), floor((delta+tau)/2)] — at most tau+1
    # positions instead of the naive +/-tau window's 2*tau+1. LOSSLESS:
    # the preserved segment of any within-tau pair falls in this window.
    # d-range in terms of (delta = n - ns): lo_d = ceil((delta-tau)/2)
    # = -floor((tau-delta)/2), hi_d = floor((delta+tau)/2)
    dlt = (F.col("_n") - F.col("_ns")).cast("int")
    lo_d = -F.floor((tau - dlt) / F.lit(2)).cast("int")
    hi_d = F.floor((tau + dlt) / F.lit(2)).cast("int")
    lo = F.greatest(F.col("_gp") + lo_d, F.lit(0))
    hi = F.least(F.col("_gp") + hi_d, (F.col("_n") - F.col("_gl")).cast("int"))
    pos = (
        F.when(F.col("_gl") == 0, F.array(F.lit(0)))
        .when(lo <= hi, F.sequence(lo, hi))
        .otherwise(F.array().cast("array<int>"))
    )
    pr = pr.withColumn("_q", F.explode(pos)).select(
        "_id", "_s", "_ns", "_i", *bc_names, *hist_cols,
        F.col("_s").substr(F.col("_q") + 1, F.col("_gl")).alias("_kseg"),
    )

    asc = F.col("_id") < F.col("_id_b")
    cand = (
        pr.join(idx, ["_ns", "_i", "_kseg", *bc_names])
        .filter(F.col("_id") != F.col("_id_b"))
    )
    if use_count_filter:
        # count secondary prune, straight off the join and BEFORE the
        # normalize/distinct: lev <= tau requires histogram-L1 <= 2*tau
        # (necessary condition; see docstring proof) — in the short-key
        # dense regime this drops most spurious candidates before they
        # cost a shuffle row and a levenshtein
        l1 = F.aggregate(
            F.zip_with("_h", "_h_b", lambda x, y: F.abs(x - y)),
            F.lit(0), lambda a, x: a + x,
        )
        cand = cand.filter(l1 <= 2 * tau)
    cand = (
        cand
        # normalize (id_a < id_b) so the directional probe's one-sided
        # hits and the equal-length two-sided hits collapse together
        .select(
            F.least(F.col("_id"), F.col("_id_b")).alias("id_a"),
            F.greatest(F.col("_id"), F.col("_id_b")).alias("id_b"),
            F.when(asc, F.col("_s")).otherwise(F.col("_s_b")).alias("_sa"),
            F.when(asc, F.col("_s_b")).otherwise(F.col("_s")).alias("_sb"),
        )
        .distinct()  # one verification per pair, however many segments hit
    )
    dist = F.levenshtein(F.col("_sa"), F.col("_sb"), tau)
    pairs = (
        cand.select("id_a", "id_b", dist.alias("dist"))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= tau))
    )
    if groups is None:
        return pairs
    # expand representative pairs through each side's id list (every
    # expanded pair shares the verified distance — identical strings),
    # then add within-group pairs at distance 0
    ids_map = groups.select(
        F.element_at("_ids", 1).alias("_rid"), F.col("_ids")
    )
    expanded = (
        pairs.join(ids_map, pairs["id_a"] == ids_map["_rid"])
        .select(F.col("_ids").alias("_ia"), "id_b", "dist")
        .join(ids_map, F.col("id_b") == ids_map["_rid"])
        .select("_ia", F.col("_ids").alias("_ib"), "dist")
        .select(F.explode("_ia").alias("_xa"), "_ib", "dist")
        .select("_xa", F.explode("_ib").alias("_xb"), "dist")
        .select(
            F.least("_xa", "_xb").alias("id_a"),
            F.greatest("_xa", "_xb").alias("id_b"),
            "dist",
        )
    )
    # groupBy treats NULL constraint values as EQUAL, but the operator's
    # contract (equi-join semantics) says NULL-constrained rows never
    # pair — exclude their groups from the within-group emit (their
    # reps already can't pair: NULL never survives the candidate join)
    within_src = groups.filter(F.size("_ids") >= 2)
    for n in bc_names:
        within_src = within_src.filter(F.col(n).isNotNull())
    within = (
        within_src
        .select(F.posexplode("_ids").alias("_i", "_xa"), "_ids")
        .select(
            "_xa",
            F.explode(
                F.slice(F.col("_ids"), F.col("_i") + 2, F.size("_ids"))
            ).alias("_xb"),
        )
        .select(
            F.col("_xa").alias("id_a"),
            F.col("_xb").alias("id_b"),
            F.lit(0).cast("int").alias("dist"),
        )
    )
    return expanded.unionByName(within)


def duplicated_ngram_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 5, min_docs: int = 2
) -> DataFrame:
    """Per-document duplicated-span audit — the exact-substring-dedup
    signal of Lee et al., "Deduplicating Training Data Makes Language
    Models Better" (suffix-array substring dedup), re-expressed as the
    relational postings formulation Spark executes well: a token n-gram
    OCCURRENCE (multiset, not distinct — positions matter) is
    "duplicated" when its gram appears in >= ``min_docs`` distinct
    documents. Output: (id, n_grams, n_dup, dup_fraction) where
    dup_fraction is the fraction of the doc's gram occurrences covered
    by corpus-shared grams — the score a curation pass thresholds to
    drop boilerplate-heavy documents.

    Shape at scale: one (id, gram) partial-count aggregation, one gram
    aggregation for the document frequency, one equi-join back, two
    per-doc aggregations — every stage is key-partitioned, no
    broadcast of unbounded sides, no window over the whole corpus. The
    gram identity is the shingle md5 (h1) so grams shuffle as 8-byte
    keys, never strings.
    """
    occ = exploded_shingles(df, id_col, text_col, n)
    digest = F.md5(F.concat(F.lit("s:"), F.col("s")))
    h = occ.select(
        id_col, F.conv(F.substring(digest, 1, 15), 16, 10).cast("long").alias("h1")
    )
    # per-(doc, gram) occurrence counts: one shuffle, and the map-side
    # partial agg collapses repeated grams within a doc before it
    per_gram = h.groupBy(id_col, "h1").agg(F.count(F.lit(1)).alias("occ"))
    # document frequency per gram over the already-collapsed rows
    df_gram = per_gram.groupBy("h1").agg(F.count(F.lit(1)).alias("nd"))
    shared = df_gram.filter(F.col("nd") >= min_docs).select("h1")
    dup = (
        per_gram.join(shared, "h1", "left_semi")
        .groupBy(id_col)
        .agg(F.sum("occ").alias("n_dup"))
    )
    tot = per_gram.groupBy(id_col).agg(F.sum("occ").alias("n_grams"))
    return tot.join(dup, id_col, "left").select(
        id_col,
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.coalesce(F.col("n_dup"), F.lit(0)).cast("bigint").alias("n_dup"),
        F.round(
            F.coalesce(F.col("n_dup"), F.lit(0)).cast("double")
            / F.col("n_grams").cast("double"),
            9,
        ).alias("dup_fraction"),
    )


# ---------------------------------------------------------------------------
# exact set-similarity self-join via prefix filtering (PPJoin family)
# ---------------------------------------------------------------------------


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num: int = 1,
    den: int = 2,
) -> DataFrame:
    """EXACT Jaccard >= num/den self-join without the all-pairs blowup:
    prefix filtering (Chaudhuri et al. 2006 / PPJoin, Xiao et al. 2011).

    Order every document's shingle set by ascending global document
    frequency (rarest first; ties broken by the 60-bit shingle hash, a
    total order). If jaccard(A, B) >= t, the two sets MUST share a token
    inside their first |x| - ceil(t*|x|) + 1 tokens, so the candidate
    join runs only over those short prefixes of RARE tokens — the
    fan-out per prefix token is its (low) document frequency, never the
    corpus-wide postings of a stop-shingle. Unlike MinHash-LSH this is
    lossless: the driver oracle replays the naive all-pairs join and the
    hash match certifies zero missed pairs.

    Every comparison is integer arithmetic (prefix length by integer
    ceiling division, the threshold as den*inter >= num*union), so the
    boundary jaccard == t is engine-exact. At 100 TB: the shingle
    hashing is scan-side, the df table is one keyed aggregation, and the
    candidate join shuffles (prefix-token, id, n, pos) rows — the size
    filter den*min(n) >= num*max(n) prunes length-incompatible pairs
    inside the join condition, and PPJoin's POSITIONAL filter prunes
    before verification: a token shared at sorted positions (i, j) caps
    the achievable overlap at min(i, j) + min(na - i, nb - j) (at most
    min(i-1, j-1) shared tokens can precede it — positions are monotone
    in the global order — plus itself plus the shorter suffix), so any
    candidate whose tightest cap falls below the required overlap
    ceil(num*(na+nb)/(num+den)) never reaches the intersection step.
    On a high-overlap corpus this cuts verified pairs by an order of
    magnitude (measured 790k -> ~60k at sf0.1).
    """
    toks = hashed_shingles(df, id_col, text_col, shingle_n).select(id_col, "h1")
    toks = toks.persist()  # feeds the df aggregation AND the ordering join
    dfreq = toks.groupBy("h1").agg(F.count(F.lit(1)).alias("df"))
    docs = (
        toks.join(dfreq, "h1")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("df", "h1"))).alias("ord"))
        .select(
            id_col,
            F.transform("ord", lambda x: x["h1"]).alias("toks"),
            F.size("ord").alias("n"),
        )
        .withColumn(
            "p",
            F.expr(f"CAST(n - (n * {num} + {den} - 1) DIV {den} + 1 AS INT)"),
        )
    )
    docs = docs.persist()  # consumed by the prefix explode AND both join-backs
    pref = docs.select(
        id_col,
        "n",
        F.posexplode(F.slice("toks", F.lit(1), F.col("p"))).alias("pos0", "tok"),
    ).select(id_col, "n", (F.col("pos0") + 1).alias("pos"), "tok")
    a = pref.select(
        F.col(id_col).alias("id_a"), F.col("n").alias("na"),
        F.col("pos").alias("ia"), "tok",
    )
    b = pref.select(
        F.col(id_col).alias("id_b"), F.col("n").alias("nb"),
        F.col("pos").alias("ib"), "tok",
    )
    cap = F.least("ia", "ib") + F.least(
        F.col("na") - F.col("ia"), F.col("nb") - F.col("ib")
    )
    cand = (
        a.join(b, "tok")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("na") * den >= F.col("nb") * num)
            & (F.col("nb") * den >= F.col("na") * num)
        )
        .groupBy("id_a", "id_b")
        .agg(F.min(cap).alias("ub"), F.first("na").alias("_na"), F.first("nb").alias("_nb"))
        .filter(F.col("ub") * (num + den) >= (F.col("_na") + F.col("_nb")) * num)
        .select("id_a", "id_b")
    )
    ta = docs.select(
        F.col(id_col).alias("id_a"), F.col("toks").alias("ta"), F.col("n").alias("na")
    )
    tb = docs.select(
        F.col(id_col).alias("id_b"), F.col("toks").alias("tb"), F.col("n").alias("nb")
    )
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("ta", "tb")).cast("bigint"))
        .withColumn("uni", (F.col("na") + F.col("nb") - F.col("inter")).cast("bigint"))
        .filter(F.col("inter") * den >= F.col("uni") * num)
        .select(
            "id_a",
            "id_b",
            "inter",
            "uni",
            (F.col("inter").cast("double") / F.col("uni").cast("double")).alias(
                "jaccard"
            ),
        )
    )


def exact_span_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 10,
) -> DataFrame:
    """EXACT substring-span deduplication (the ExactSubstr discipline of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): any word span of length >= k that occurs more than once
    across the corpus keeps exactly ONE canonical occurrence (min packed
    (doc, position) — the same survivor discipline as line dedup) and
    every other occurrence's tokens are removed; documents are
    REASSEMBLED from their surviving tokens in order.

    Unlike fixed-segment line dedup, the k-gram window SLIDES (stride
    1), so repeated spans are caught at ANY alignment, and overlapping
    duplicated k-grams union naturally into longer removed spans (a
    repeated run of m >= k words is covered by its m - k + 1 duplicated
    k-grams).

    Dataflow (all linear, no all-pairs): one shuffle keyed by the
    16-byte md5 of the k-gram text, a coverage explode bounded by
    k x duplicate occurrences, and one (doc, position) anti-join-style
    left join back to the token table. The suffix-array construction of
    the paper is a single-machine design; this is its shuffle-native
    equivalent at a fixed minimum span length.

    Returns (id, n_tokens, n_kept, cleaned_text) for every document.
    """
    from forklift_spark.operators.text import words

    if k < 2:
        raise ValueError("k must be >= 2: a 1-gram span would delete "
                         "every repeated word in the corpus")
    w = df.select(F.col(id_col).alias("_id"), words(text_col).alias("_w"))
    toks = w.select("_id", F.posexplode("_w").alias("_pos", "_word"))
    grams = (
        w.filter(F.size("_w") >= k)
        .select(
            "_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(_w) - {k}), "
                    f"i -> array_join(slice(_w, i + 1, {k}), ' '))"
                )
            ).alias("_pos", "_g"),
        )
        .withColumn("_pk", F.col("_id") * 1000000 + F.col("_pos"))
        .withColumn("_fp", F.md5("_g"))
    )
    canon = grams.groupBy("_fp").agg(
        F.min("_pk").alias("_cpk"), F.count(F.lit(1)).alias("_n")
    )
    cov = (
        grams.join(canon, "_fp")
        .filter((F.col("_n") >= 2) & (F.col("_pk") != F.col("_cpk")))
        .select(
            "_id",
            F.explode(
                F.sequence(F.col("_pos"), F.col("_pos") + k - 1)
            ).alias("_pos"),
        )
        .distinct()
        .withColumn("_covered", F.lit(True))
    )
    marked = toks.join(cov, ["_id", "_pos"], "left")
    keep = F.col("_covered").isNull()
    return marked.groupBy("_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(keep.cast("bigint")).cast("bigint").alias("n_kept"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep, F.struct("_pos", "_word"))
                        )
                    ),
                    lambda x: x["_word"],
                ),
                " ",
            ),
            F.lit(""),
        ).alias("cleaned_text"),
    ).withColumnRenamed("_id", id_col)
