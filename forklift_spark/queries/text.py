"""Text-analysis queries over documents, oracle-checked: token/word
counts, quality scoring, language-ID heuristic, content fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from forklift_spark import tables
from forklift_spark.operators import dedup as D
from forklift_spark.operators import text as X
from forklift_spark.queries import query
from forklift_spark.queries.dedup import NORM

_W = f"string_split({NORM}, ' ')"


# --------------------------------------------------------------------------
# q_text_token_stats — whitespace word count + BPE-ish regexp token count.
# --------------------------------------------------------------------------
TOKEN_ORACLE = f"""
SELECT doc_id,
  len({_W}) AS n_words,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens,
  length(text) AS n_chars_actual
FROM documents
"""


@query("q_text_token_stats", TOKEN_ORACLE)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.word_count("text").alias("n_words"),
        X.token_count("text").cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
    )


# --------------------------------------------------------------------------
# q_text_quality — length/punctuation/stopword quality heuristic.
# --------------------------------------------------------------------------
_SW_LIST = ", ".join(f"'{w}'" for w in X.STOPWORDS)
QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, {_W} AS w,
    len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct
  FROM documents
), r AS (
  SELECT doc_id,
    CAST(len(w) AS DOUBLE) AS wc,
    CAST(n_punct AS DOUBLE) / CAST(length(text) AS DOUBLE) AS punct_ratio,
    CAST(len(list_filter(w, x -> x IN ({_SW_LIST}))) AS DOUBLE)
      / CAST(len(w) AS DOUBLE) AS sw_ratio
  FROM t
)
SELECT doc_id,
  (CASE WHEN wc >= 10 AND wc <= 1000 THEN 1.0 ELSE 0.5 END)
    * (1.0 - punct_ratio)
    * (0.5 + 0.5 * least(sw_ratio * 5, 1.0)) AS quality,
  sw_ratio, punct_ratio
FROM r
"""


@query("q_text_quality", QUALITY_ORACLE)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.quality_score("text").alias("quality"),
        X.stopword_ratio("text").alias("sw_ratio"),
        (X.punct_count("text").cast("double") / F.length("text").cast("double")).alias(
            "punct_ratio"
        ),
    )


# --------------------------------------------------------------------------
# q_lang_id — marker-word language heuristic (argmax with lexicographic
# tiebreak; 'unknown' when no marker hits), compared against the labeled
# lang column for an agreement flag.
# --------------------------------------------------------------------------
def _lang_oracle() -> str:
    scores = ",\n    ".join(
        f"len(list_filter(w, x -> x IN ({', '.join(repr(m) for m in ms)}))) AS score_{lang}"
        for lang, ms in X.LANG_MARKERS.items()
    )
    langs = sorted(X.LANG_MARKERS)
    best = f"struct_pack(score := score_{langs[0]}, lang := '{langs[0]}')"
    for lang in langs[1:]:
        cand = f"struct_pack(score := score_{lang}, lang := '{lang}')"
        best = f"CASE WHEN {cand}.score > ({best}).score THEN {cand} ELSE ({best}) END"
    return f"""
WITH t AS (
  SELECT doc_id, lang, {_W} AS w FROM documents
), s AS (
  SELECT doc_id, lang,
    {scores}
  FROM t
)
SELECT doc_id, lang,
  CASE WHEN ({best}).score > 0 THEN ({best}).lang ELSE 'unknown' END AS predicted,
  (CASE WHEN ({best}).score > 0 THEN ({best}).lang ELSE 'unknown' END) = lang AS agree
FROM s
"""


@query("q_lang_id", _lang_oracle())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "lang", *X.lang_scores("text"))
    return scored.select(
        "doc_id",
        "lang",
        X.predicted_lang().alias("predicted"),
        (X.predicted_lang() == F.col("lang")).alias("agree"),
    )


# --------------------------------------------------------------------------
# q_doc_fingerprint — md5 content fingerprint + min-shingle-hash
# ("winnowing-lite") document signature.
# --------------------------------------------------------------------------
from forklift_spark.queries.dedup import _WORDS_CTE, _hash_sql, _shingle_sql  # noqa: E402

FP_ORACLE = f"""
WITH words AS (
  {_WORDS_CTE}
)
SELECT doc_id,
  md5(norm) AS content_md5,
  list_min(list_transform({_shingle_sql()}, s -> {_hash_sql('s', 0)})) AS winnow_hash
FROM words
"""


@query("q_doc_fingerprint", FP_ORACLE)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.functions.hashing import md5_long_seeded

    docs = tables.load(spark, sf_dir, "documents")
    winnow = (
        D.exploded_shingles(docs, "doc_id", "text", 3)
        .groupBy("doc_id")
        .agg(F.min(md5_long_seeded(F.col("s"), 0)).alias("winnow_hash"))
    )
    return docs.select(
        "doc_id", D.fingerprint("text").alias("content_md5")
    ).join(winnow, "doc_id")


# --------------------------------------------------------------------------
# q_zipf_token_freq — global corpus token statistics: frequency, rank
# (Zipf curve), document frequency. The vocabulary-analysis pass of a
# training-data pipeline: one explode + one groupBy + one window over
# the (small) vocabulary, top-100 by count.
# --------------------------------------------------------------------------
ZIPF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_W}) AS tok FROM documents
), stats AS (
  SELECT tok, count(*) AS freq, count(DISTINCT doc_id) AS doc_freq
  FROM toks GROUP BY tok
)
SELECT tok, freq, doc_freq,
  row_number() OVER (ORDER BY freq DESC, tok) AS rank
FROM stats
ORDER BY rank
LIMIT 100
"""


@query("q_zipf_token_freq", ZIPF_ORACLE)
def q_zipf_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = tables.load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(X.words("text")).alias("tok")
    )
    stats = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq"),
        F.count_distinct("doc_id").alias("doc_freq"),
    )
    # Top-100 BEFORE ranking: orderBy+limit compiles to
    # TakeOrderedAndProject (per-partition heaps), so the full vocabulary
    # never lands in one task. Ranking then runs over only 100 rows; the
    # constant partitionBy keeps WindowExec off the unpartitioned-window
    # path (it would otherwise pull the whole input into one partition —
    # and warn — even post-limit).
    top = stats.orderBy(F.col("freq").desc(), "tok").limit(100)
    w = W.partitionBy(F.lit(0)).orderBy(F.col("freq").desc(), "tok")
    return top.withColumn("rank", F.row_number().over(w)).orderBy("rank")


# --------------------------------------------------------------------------
# q_lexical_diversity — Gopher-style repetition signals per document:
# distinct-word ratio (low -> repetitive filler) and top-word dominance
# (high -> keyword stuffing). One explode + two hash aggregations —
# scan-shaped, partial-aggregated, no window.
# --------------------------------------------------------------------------
DIVERSITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_W}) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
)
SELECT doc_id,
  CAST(sum(c) AS BIGINT) AS n_words,
  CAST(count(*) AS BIGINT) AS n_distinct,
  round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 9) AS distinct_ratio,
  round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 9) AS top_word_share
FROM tf GROUP BY doc_id
"""


@query("q_lexical_diversity", DIVERSITY_ORACLE)
def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(X.words("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("c").cast("double"), 9
        ).alias("distinct_ratio"),
        F.round(F.max("c").cast("double") / F.sum("c").cast("double"), 9).alias(
            "top_word_share"
        ),
    )


# --------------------------------------------------------------------------
# q_pii_redact — PII audit + redaction: per-class match counts and the
# md5 of the redacted text (so the oracle verifies the actual rewrite,
# not just the counts). On this synthetic corpus matches are ~0; the
# operator behavior on PII-bearing text is pinned in
# tests/test_text_pii.py against the same DuckDB oracle.
# --------------------------------------------------------------------------
def _pii_oracle() -> str:
    from forklift_spark.operators.text import PII_PATTERNS

    counts = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, (pat, _) in PII_PATTERNS.items()
    )
    redacted = "text"
    for name, (pat, repl) in PII_PATTERNS.items():
        redacted = f"regexp_replace({redacted}, '{pat}', '{repl}', 'g')"
    return f"""
SELECT doc_id, {counts}, md5({redacted}) AS redacted_md5
FROM documents
"""


@query("q_pii_redact", _pii_oracle())
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        *X.pii_counts("text"),
        F.md5(X.redact_pii("text")).alias("redacted_md5"),
    )


# --------------------------------------------------------------------------
# q_train_test_split — deterministic hash-based dataset split: bucket =
# md5(id) % 100, train < 80 <= valid < 90 <= test. Reproducible across
# engines/runs/repartitioning (no RNG) — the canonical training-data
# split that survives incremental re-runs without leaking rows between
# splits.
# --------------------------------------------------------------------------
SPLIT_ORACLE = f"""
WITH b AS (
  SELECT doc_id, lang,
    CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS bucket
  FROM documents
)
SELECT
  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
  lang, count(*) AS n, min(doc_id) AS min_id
FROM b GROUP BY 1, 2
"""


@query("q_train_test_split", SPLIT_ORACLE)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.functions.hashing import md5_long

    docs = tables.load(spark, sf_dir, "documents")
    bucket = md5_long(
        F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
    ) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return docs.select(split.alias("split"), "lang", "doc_id").groupBy(
        "split", "lang"
    ).agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_id"))


# --------------------------------------------------------------------------
# q_sequence_pack — token-budget shard assignment for pretraining: docs
# are concatenated in deterministic (bucket, doc_id) order and cut into
# BUDGET-token shards. bucket = md5(doc_id) % 32 is the parallelism
# unit, so the cumsum window is partitioned (32 independent streams at
# any corpus size — never a global window); within a bucket the shard
# id is floor(preceding_tokens / BUDGET): the greedy concat-then-chunk
# packing every pretraining pipeline runs.
# --------------------------------------------------------------------------
_PACK_BUDGET = 2048
_PACK_BUCKETS = 32

PACK_ORACLE = f"""
WITH d AS (
  SELECT doc_id, len({_W}) AS n_tokens,
    {{BUCKET}} % {_PACK_BUCKETS} AS bucket
  FROM documents
), c AS (
  SELECT doc_id, bucket, n_tokens,
    CAST(COALESCE(sum(n_tokens) OVER (
      PARTITION BY bucket ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset_tokens
  FROM d
)
SELECT doc_id, bucket, n_tokens, offset_tokens,
  CAST(offset_tokens // {_PACK_BUDGET} AS BIGINT) AS shard
FROM c
""".replace(
    "{BUCKET}",
    "CAST('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)",
)


@query("q_sequence_pack", PACK_ORACLE)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from forklift_spark.functions.hashing import md5_long

    docs = tables.load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(X.words("text")).cast("long").alias("n_tokens"),
        (
            md5_long(F.concat(F.lit("pack:"), F.col("doc_id").cast("string")))
            % _PACK_BUCKETS
        ).alias("bucket"),
    )
    w = W.partitionBy("bucket").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    return d.select(
        "doc_id",
        "bucket",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long").alias("offset_tokens"),
    ).withColumn(
        "shard", (F.col("offset_tokens") / _PACK_BUDGET).cast("long")
    )


# --------------------------------------------------------------------------
# q_tfidf_top_terms — top-3 distinguishing terms per document. Linear-idf
# variant scored in scaled INTEGER arithmetic: score_micro =
# (tf * (N+1) * 1e6) DIV (df+1) — engine-exact (decimal/float division
# rounds differently across engines in the last digit); (N+1)/(df+1) is
# monotone in df like ln-idf, so the per-term ranking matches the
# classic formula. Two hash aggs + one doc-partitioned window.
# --------------------------------------------------------------------------
TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_W}) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
), df AS (
  SELECT tok, count(*) AS n_docs FROM tf GROUP BY tok
), n AS (
  SELECT count(*) AS total FROM documents
), scored AS (
  SELECT tf.doc_id, tf.tok,
    CAST(tf.c * (n.total + 1) * 1000000 // (df.n_docs + 1) AS BIGINT) AS score_micro
  FROM tf JOIN df USING (tok) CROSS JOIN n
), ranked AS (
  SELECT doc_id, tok, score_micro,
    row_number() OVER (PARTITION BY doc_id ORDER BY score_micro DESC, tok) AS rnk
  FROM scored
)
SELECT doc_id, tok, score_micro, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
"""


@query("q_tfidf_top_terms", TFIDF_ORACLE)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = tables.load(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(X.words("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("n_docs"))
    total = docs.count()  # one scalar; the oracle's CROSS JOIN n
    score = F.expr(f"CAST(c * {total + 1}L * 1000000L DIV (n_docs + 1) AS BIGINT)")
    w = W.partitionBy("doc_id").orderBy(F.col("score_micro").desc(), "tok")
    return (
        tf.join(dfreq, "tok")
        .select("doc_id", "tok", score.alias("score_micro"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "tok", "score_micro", F.col("rnk").cast("int").alias("rnk"))
    )


# --------------------------------------------------------------------------
# q_stratified_sample — per-language stratified sample via deterministic
# hash-Bernoulli: keep a row iff md5("samp:"||doc_id) % 10000 falls below
# its stratum's fraction. No RNG state — the sample is identical across
# engines, runs, repartitioning, and incremental re-runs (the property
# Spark's seeded sampleBy lacks: its outcome depends on partitioning).
# tests/test_sampling.py additionally pins the RNG-based sampleBy path.
# --------------------------------------------------------------------------
_STRATA = {"en": 0.5, "de": 0.35, "es": 0.35, "fr": 0.35, "zh": 0.2}


def _strat_oracle() -> str:
    cases = " ".join(
        f"WHEN lang = '{s}' THEN {int(f * 10000)}" for s, f in _STRATA.items()
    )
    bucket = "CAST('0x' || substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000"
    return f"""
SELECT doc_id, lang FROM documents
WHERE {bucket} < CASE {cases} ELSE 0 END
"""


@query("q_stratified_sample", _strat_oracle())
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.functions.hashing import md5_long

    docs = tables.load(spark, sf_dir, "documents")
    bucket = md5_long(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))) % 10000
    cutoff = None
    for s, f in _STRATA.items():
        cond = F.when(F.col("lang") == s, F.lit(int(f * 10000)))
        cutoff = cond if cutoff is None else cutoff.when(F.col("lang") == s, F.lit(int(f * 10000)))
    cutoff = cutoff.otherwise(F.lit(0))
    return docs.filter(bucket < cutoff).select("doc_id", "lang")


# --------------------------------------------------------------------------
# q_repetition_quality — Gopher-style repetition signals: duplicate-word
# fraction and most-frequent-bigram share per document. The Spark side
# computes both inside one projection (sorted-array longest-run, no
# shuffle); the oracle recomputes them relationally (explode + window +
# group) — two very different plans that must agree exactly.
# --------------------------------------------------------------------------
REPETITION_ORACLE = f"""
WITH w0 AS (
  SELECT doc_id, {_W} AS w FROM documents
), exp AS (
  SELECT doc_id, unnest(w) AS x, unnest(range(1, len(w) + 1)) AS i FROM w0
), bg AS (
  SELECT doc_id, x || ' ' || lead(x) OVER (PARTITION BY doc_id ORDER BY i) AS b
  FROM exp
), bstats AS (
  SELECT doc_id, max(c) AS maxc, sum(c) AS nbg FROM (
    SELECT doc_id, b, count(*) AS c FROM bg WHERE b IS NOT NULL GROUP BY doc_id, b
  ) GROUP BY doc_id
), wstats AS (
  SELECT doc_id, count(*) AS nw, count(DISTINCT x) AS ndw FROM exp GROUP BY doc_id
)
SELECT w.doc_id, w.nw AS n_words,
  1.0 - CAST(w.ndw AS DOUBLE) / CAST(w.nw AS DOUBLE) AS dup_word_ratio,
  CAST(b.maxc AS DOUBLE) / CAST(b.nbg AS DOUBLE) AS top_bigram_ratio
FROM wstats w JOIN bstats b USING (doc_id)
"""


@query("q_repetition_quality", REPETITION_ORACLE)
def q_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return X.repetition_stats(docs, "doc_id", "text")


# --------------------------------------------------------------------------
# q_token_rarity — per-document mean vocabulary rank + out-of-vocab count:
# the rank-based rarity score a corpus-quality filter uses when a real LM
# perplexity pass is too expensive (and, unlike log-prob, it is exactly
# reproducible across engines — integer ranks, no transcendentals).
# Plan shape: global top-K vocab via TakeOrderedAndProject (per-partition
# heaps, same pattern as q_zipf), rank over the K-row result, broadcast
# join back to the token stream, one per-doc aggregation. K is a constant,
# so at 100 TB this is two scan-shaped passes and a K-row broadcast.
# --------------------------------------------------------------------------
_RARITY_K = 20

RARITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_W}) AS tok FROM documents
), freq AS (
  SELECT tok, count(*) AS freq FROM toks GROUP BY tok
), ranked AS (
  SELECT tok, row_number() OVER (ORDER BY freq DESC, tok) AS rank
  FROM freq ORDER BY freq DESC, tok LIMIT {_RARITY_K}
)
SELECT t.doc_id, count(*) AS n_toks,
  CAST(SUM(coalesce(r.rank, {_RARITY_K} + 1)) AS DOUBLE)
    / CAST(count(*) AS DOUBLE) AS mean_rank,
  CAST(SUM(CASE WHEN r.rank IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
FROM toks t LEFT JOIN ranked r ON t.tok = r.tok
GROUP BY t.doc_id
"""


@query("q_token_rarity", RARITY_ORACLE)
def q_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = tables.load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(X.words("text")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    top = freq.orderBy(F.col("freq").desc(), "tok").limit(_RARITY_K)
    w = W.partitionBy(F.lit(0)).orderBy(F.col("freq").desc(), "tok")
    ranked = top.withColumn("rank", F.row_number().over(w)).select("tok", "rank")
    rank_or_oov = F.coalesce(F.col("rank"), F.lit(_RARITY_K + 1))
    return (
        toks.join(F.broadcast(ranked), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            (
                F.sum(rank_or_oov).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_rank"),
            F.sum(F.when(F.col("rank").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )


# --------------------------------------------------------------------------
# q_top_p_selection — nucleus-style curation: per (lang, source) group,
# keep the highest-quality documents until their cumulative share of the
# group's total quality mass reaches p. The budgeted-curation operator
# ("spend my token budget on the best docs per domain"): one window
# cumsum over a deterministic order, no global sort. Quality here is the
# doc's distinct-token count (integer — exact in both engines); the
# cumulative-share comparison multiplies through by the total to stay in
# exact integer arithmetic (no division before the comparison).
# --------------------------------------------------------------------------
_TOP_P_NUM = 6  # p = 0.6
_TOP_P_DEN = 10

TOP_P_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, source, count(DISTINCT tok) AS quality
  FROM (SELECT doc_id, lang, source, unnest({_W}) AS tok FROM documents) t
  GROUP BY doc_id, lang, source
), ranked AS (
  SELECT doc_id, lang, source, quality,
    sum(quality) OVER (PARTITION BY lang, source
                       ORDER BY quality DESC, doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum_q,
    sum(quality) OVER (PARTITION BY lang, source) AS tot_q
  FROM toks
)
SELECT doc_id, lang, source, quality
FROM ranked
WHERE (cum_q - quality) * {_TOP_P_DEN} < tot_q * {_TOP_P_NUM}
"""


@query("q_top_p_selection", TOP_P_ORACLE)
def q_top_p_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = tables.load(spark, sf_dir, "documents")
    quality = (
        docs.select("doc_id", "lang", "source", F.explode(X.words("text")).alias("tok"))
        .groupBy("doc_id", "lang", "source")
        .agg(F.count_distinct("tok").alias("quality"))
    )
    wc = (
        W.partitionBy("lang", "source")
        .orderBy(F.col("quality").desc(), "doc_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wt = W.partitionBy("lang", "source")
    ranked = quality.withColumn("cum_q", F.sum("quality").over(wc)).withColumn(
        "tot_q", F.sum("quality").over(wt)
    )
    # a doc is kept if the mass BEFORE it is still under p of the total —
    # integer cross-multiplication, no floats anywhere
    return ranked.filter(
        (F.col("cum_q") - F.col("quality")) * _TOP_P_DEN
        < F.col("tot_q") * _TOP_P_NUM
    ).select("doc_id", "lang", "source", "quality")


# --------------------------------------------------------------------------
# q_weighted_sample — deterministic weight-proportional sampling: each doc
# is kept with probability proportional to its length (token-mass
# importance sampling — the corpus op for "sample by content volume, not
# doc count"). Same hash-Bernoulli machinery as the stratified sampler
# (md5 uniform, no RNG state), with the per-row rate derived from the
# weight in pure integer arithmetic: rate_i = w_i * 10000 // max_w, so
# the heaviest doc is kept with certainty and everything scales under
# repartitioning, re-runs, and engines. The max is a 1-row broadcast.
# --------------------------------------------------------------------------
WEIGHTED_SAMPLE_ORACLE = """
WITH mx AS (SELECT max(n_chars) AS m FROM documents)
SELECT doc_id, lang, n_chars
FROM documents, mx
WHERE CAST('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000
      < (n_chars * 10000) // m
"""


@query("q_weighted_sample", WEIGHTED_SAMPLE_ORACLE)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.functions.hashing import md5_long

    docs = tables.load(spark, sf_dir, "documents")
    mx = docs.agg(F.max("n_chars").alias("m"))
    u = md5_long(F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string"))) % 10000
    return (
        docs.crossJoin(F.broadcast(mx))
        .filter(u < F.expr("(n_chars * 10000) div m"))
        .select("doc_id", "lang", "n_chars")
    )


# --------------------------------------------------------------------------
# q_doc_chunking — split each document into overlapping token windows
# (chunk size 40, stride 30): the RAG / embedding-index preprocessing
# staple. Chunk starts are generated per doc with sequence() (output-
# proportional, no driver loop), the window is a token-array slice —
# scan-shaped, one explode, no shuffle at all. Chunks shorter than the
# overlap tail that a previous chunk already covers are not emitted
# (start=1 always is).
# --------------------------------------------------------------------------
_CHUNK = 40
_STRIDE = 30

CHUNK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_W} AS w FROM documents
), starts AS (
  SELECT doc_id, w, unnest(generate_series(1, greatest(len(w), 1), {_STRIDE})) AS s
  FROM toks
)
SELECT doc_id,
  CAST((s - 1) / {_STRIDE} AS BIGINT) AS chunk_id,
  array_to_string(w[s : least(s + {_CHUNK} - 1, len(w))], ' ') AS chunk_text,
  least(s + {_CHUNK} - 1, len(w)) - s + 1 AS n_tokens
FROM starts
WHERE s = 1 OR s + {_CHUNK} - 1 <= len(w) + {_STRIDE} - 1
"""


@query("q_doc_chunking", CHUNK_ORACLE)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", X.words("text").alias("w"))
    starts = toks.select(
        "doc_id",
        "w",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("w"), F.lit(1)), F.lit(_STRIDE))
        ).alias("s"),
    )
    n = F.size("w")
    end = F.least(F.col("s") + F.lit(_CHUNK - 1), n)
    return (
        starts.filter(
            (F.col("s") == 1) | (F.col("s") + F.lit(_CHUNK - 1) <= n + F.lit(_STRIDE - 1))
        )
        .select(
            "doc_id",
            ((F.col("s") - 1) / F.lit(_STRIDE)).cast("long").alias("chunk_id"),
            F.array_join(F.slice("w", F.col("s"), end - F.col("s") + 1), " ").alias(
                "chunk_text"
            ),
            (end - F.col("s") + 1).alias("n_tokens"),
        )
    )


# --------------------------------------------------------------------------
# q_gopher_quality — composite rule-based document filter in the style
# of Gopher (Rae et al. 2021, Table A1): word-count bounds, mean word
# length bounds, symbol ratio, stopword floor, short-word ceiling.
# Emits per-rule booleans, the combined verdict, and the FIRST failing
# rule (fixed evaluation order) as the reject reason — the audit shape
# a curation run reports per document. All signals are integer counts
# and single double divisions, so both engines agree bit-exactly;
# thresholds are corpus-calibrated so every rule genuinely splits.
# One projection pass + no shuffle: at 100 TB this runs at scan speed.
# --------------------------------------------------------------------------
GOPHER_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, {NORM} AS norm FROM documents
), r AS (
  SELECT doc_id, string_split(norm, ' ') AS w, norm, text,
    len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct
  FROM t
), s AS (
  SELECT doc_id,
    len(w) AS wc,
    CAST(length(norm) - (len(w) - 1) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS mwl,
    CAST(n_punct AS DOUBLE) / CAST(length(text) AS DOUBLE) AS sym_ratio,
    CAST(len(list_filter(w, x -> x IN ({_SW_LIST}))) AS DOUBLE)
      / CAST(len(w) AS DOUBLE) AS sw_ratio,
    CAST(len(list_filter(w, x -> length(x) <= 3)) AS DOUBLE)
      / CAST(len(w) AS DOUBLE) AS short_frac
  FROM r
), f AS (
  SELECT *,
    wc BETWEEN 20 AND 80 AS ok_wc,
    mwl >= 4.3 AND mwl <= 4.7 AS ok_mwl,
    sym_ratio <= 0.001 AS ok_sym,
    sw_ratio >= 0.02 AS ok_sw,
    short_frac <= 0.25 AS ok_short
  FROM s
)
SELECT doc_id, CAST(wc AS BIGINT) AS wc, round(mwl, 9) AS mwl,
  round(sym_ratio, 9) AS sym_ratio, round(sw_ratio, 9) AS sw_ratio,
  round(short_frac, 9) AS short_frac,
  ok_wc, ok_mwl, ok_sym, ok_sw, ok_short,
  (ok_wc AND ok_mwl AND ok_sym AND ok_sw AND ok_short) AS passes,
  CASE WHEN NOT ok_wc THEN 'word_count'
       WHEN NOT ok_mwl THEN 'mean_word_length'
       WHEN NOT ok_sym THEN 'symbol_ratio'
       WHEN NOT ok_sw THEN 'stopword_ratio'
       WHEN NOT ok_short THEN 'short_words'
       ELSE 'pass' END AS reject_reason
FROM f
"""


@query("q_gopher_quality", GOPHER_ORACLE)
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.operators.dedup import normalize_text

    docs = tables.load(spark, sf_dir, "documents")
    norm = normalize_text("text")
    w = F.split(norm, " ")
    wc = F.size(w)
    mwl = (F.length(norm) - (wc - F.lit(1))).cast("double") / wc.cast("double")
    sym = X.punct_count("text").cast("double") / F.length("text").cast("double")
    sw = X.stopword_ratio("text")
    short = (
        F.size(F.filter(w, lambda x: F.length(x) <= 3)).cast("double")
        / wc.cast("double")
    )
    s = docs.select(
        "doc_id",
        wc.cast("bigint").alias("wc"),
        mwl.alias("mwl"),
        sym.alias("sym_ratio"),
        sw.alias("sw_ratio"),
        short.alias("short_frac"),
    )
    f = s.select(
        "*",
        F.col("wc").between(20, 80).alias("ok_wc"),
        ((F.col("mwl") >= 4.3) & (F.col("mwl") <= 4.7)).alias("ok_mwl"),
        (F.col("sym_ratio") <= 0.001).alias("ok_sym"),
        (F.col("sw_ratio") >= 0.02).alias("ok_sw"),
        (F.col("short_frac") <= 0.25).alias("ok_short"),
    )
    passes = (
        F.col("ok_wc") & F.col("ok_mwl") & F.col("ok_sym") & F.col("ok_sw")
        & F.col("ok_short")
    )
    reason = (
        F.when(~F.col("ok_wc"), "word_count")
        .when(~F.col("ok_mwl"), "mean_word_length")
        .when(~F.col("ok_sym"), "symbol_ratio")
        .when(~F.col("ok_sw"), "stopword_ratio")
        .when(~F.col("ok_short"), "short_words")
        .otherwise("pass")
    )
    return f.select(
        "doc_id", "wc",
        F.round("mwl", 9).alias("mwl"),
        F.round("sym_ratio", 9).alias("sym_ratio"),
        F.round("sw_ratio", 9).alias("sw_ratio"),
        F.round("short_frac", 9).alias("short_frac"),
        "ok_wc", "ok_mwl", "ok_sym", "ok_sw", "ok_short",
        passes.alias("passes"),
        reason.alias("reject_reason"),
    )


# --------------------------------------------------------------------------
# q_inverted_index — keyword-search postings build: term -> document
# frequency, total occurrences, and the sorted posting head (first 20
# doc ids, string-joined so the harness can hash it). The full posting
# list is what a search sink would store; the head keeps the verified
# row bounded. explode -> two-level aggregation, key-partitioned on the
# term — the classic index build, one shuffle wide at any scale.
# --------------------------------------------------------------------------
INVIDX_ORACLE = f"""
WITH w AS (
  SELECT doc_id, unnest({_W}) AS term FROM documents
), per_doc AS (
  SELECT term, doc_id, count(*) AS occ FROM w GROUP BY term, doc_id
)
SELECT term,
  CAST(count(*) AS BIGINT) AS df,
  CAST(sum(occ) AS BIGINT) AS n_occ,
  array_to_string(list_sort(list(doc_id))[1:20], ',') AS posting_head,
  min(doc_id) AS first_doc
FROM per_doc
GROUP BY term
"""


@query("q_inverted_index", INVIDX_ORACLE)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.explode(X.words("text")).alias("term"))
    per_doc = w.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("occ"))
    return per_doc.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("occ").cast("bigint").alias("n_occ"),
        F.array_join(
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20), ","
        ).alias("posting_head"),
        F.min("doc_id").alias("first_doc"),
    )


# --------------------------------------------------------------------------
# q_temperature_mix — data-mixture weighting: per (source, lang) domain,
# token mass and a temperature-flattened sampling weight
# w_d = mass_d^(1/T) with T=2 (the sqrt flattening of multilingual /
# multi-domain sampling a la mBERT/XLM-R and pretraining mixture specs),
# normalized to a share and an integer per-epoch token budget. sqrt is
# correctly-rounded in IEEE754 (identical in both engines); the
# normalizing total is summed as DECIMAL via a window (a double window
# sum is evaluation-order dependent), and only the final division runs
# in double. The groupBy collapses the corpus to a handful of domain
# rows, so everything after the first aggregation is driver-trivial at
# any scale.
# --------------------------------------------------------------------------
_EPOCH_TOKENS = 1_000_000

TEMPERATURE_ORACLE = f"""
WITH d AS (
  SELECT source, lang,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(len({_W})) AS BIGINT) AS tok_mass
  FROM documents GROUP BY source, lang
), w AS (
  SELECT *, CAST(sqrt(CAST(tok_mass AS DOUBLE)) AS DECIMAL(28,9)) AS w_dec
  FROM d
)
SELECT source, lang, n_docs, tok_mass,
  round(CAST(w_dec AS DOUBLE), 9) AS weight,
  round(CAST(w_dec AS DOUBLE) / CAST(sum(w_dec) OVER () AS DOUBLE), 9) AS share,
  CAST(floor(CAST(w_dec AS DOUBLE) / CAST(sum(w_dec) OVER () AS DOUBLE)
             * {_EPOCH_TOKENS}) AS BIGINT) AS epoch_tokens
FROM w
"""


@query("q_temperature_mix", TEMPERATURE_ORACLE)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = tables.load(spark, sf_dir, "documents")
    d = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(X.word_count("text")).cast("bigint").alias("tok_mass"),
    )
    w_dec = F.sqrt(F.col("tok_mass").cast("double")).cast("decimal(28,9)")
    w = d.withColumn("w_dec", w_dec)
    total = F.sum("w_dec").over(W.partitionBy())
    share = F.col("w_dec").cast("double") / total.cast("double")
    return w.select(
        "source", "lang", "n_docs", "tok_mass",
        F.round(F.col("w_dec").cast("double"), 9).alias("weight"),
        F.round(share, 9).alias("share"),
        F.floor(share * _EPOCH_TOKENS).cast("bigint").alias("epoch_tokens"),
    )


# q_winnow_fingerprint — full winnowing (Schleimer et al., SIGMOD 2003):
# k-gram hashes -> sliding w-window minima -> the distinct set of local
# fingerprints per doc. Unlike q_doc_fingerprint's single global min,
# winnowing guarantees any shared substring of length >= k+w-1 yields a
# shared fingerprint. Entirely array expressions in the scan projection
# (no shuffle, no window exchange); the oracle replays the same list
# pipeline per row in DuckDB and matches the sorted digest.
# --------------------------------------------------------------------------
_WINNOW_SEL = (
    "list_distinct(list_transform(range(1, length(norm) - 8 + 2 - 4 + 1), "
    "p -> list_min(list_slice(ks, p, p + 3))))"
)
_WINNOW_KS = (
    "list_transform(range(1, length(norm) - 8 + 2), "
    "i -> substr(md5('w:' || substring(norm, CAST(i AS INT), 8)), 1, 15))"
)

WINNOW_ORACLE = f"""
WITH words AS (
  {_WORDS_CTE}
), sel AS (
  SELECT doc_id, {_WINNOW_SEL} AS fps
  FROM (SELECT doc_id, norm, {_WINNOW_KS} AS ks FROM words WHERE length(norm) >= 11)
)
SELECT doc_id,
  CAST(len(fps) AS BIGINT) AS n_fingerprints,
  md5(array_to_string(list_sort(fps), ',')) AS fp_digest
FROM sel
"""


@query("q_winnow_fingerprint", WINNOW_ORACLE)
def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    fps = X.winnow_fingerprints(docs, k=8, w=4)
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fingerprints"),
        F.md5(F.concat_ws(",", F.sort_array(F.collect_list("fp")))).alias("fp_digest"),
    )


# --------------------------------------------------------------------------
# q_winnow_pairs — MOSS-style near-dup detection on winnowing
# fingerprints: docs sharing >= 3 RARE selected fingerprints, scored by
# the overlap coefficient |A∩B| / min(|A|,|B|). The join is a
# fingerprint equi-join over the winnowed (~2/(w+1) density) sets —
# never all-pairs — and ubiquitous fingerprints (doc frequency > 8)
# are dropped before the join, MOSS-style: they carry no dedup signal
# and are exactly the keys that would fan out quadratically. The
# oracle replays fingerprints, the stop-fingerprint cut, the
# self-join, and the scoring.
# --------------------------------------------------------------------------
WINNOW_PAIRS_ORACLE = f"""
WITH words AS (
  {_WORDS_CTE}
), sel AS (
  SELECT doc_id, unnest({_WINNOW_SEL}) AS fp
  FROM (SELECT doc_id, norm, {_WINNOW_KS} AS ks FROM words WHERE length(norm) >= 11)
), sizes AS (
  SELECT doc_id, count(*) AS nfp FROM sel GROUP BY doc_id
), keep AS (
  SELECT fp FROM sel GROUP BY fp HAVING count(*) <= 8
), rare AS (
  SELECT sel.doc_id, sel.fp FROM sel JOIN keep USING (fp)
), shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
  FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT s.id_a, s.id_b,
  CAST(s.n_shared AS BIGINT) AS n_shared,
  round(CAST(s.n_shared AS DOUBLE) / least(sa.nfp, sb.nfp), 9) AS overlap
FROM shared s
JOIN sizes sa ON sa.doc_id = s.id_a
JOIN sizes sb ON sb.doc_id = s.id_b
WHERE s.n_shared >= 3
"""


@query("q_winnow_pairs", WINNOW_PAIRS_ORACLE)
def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    # fans out to sizes, the df cut, and both self-join branches ->
    # materialize once (SCALING.md rule) instead of re-winnowing 4x
    fps = X.winnow_fingerprints(docs, k=8, w=4).localCheckpoint(eager=True)
    sizes = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nfp"))
    # MOSS-style stop-fingerprints: a fingerprint in >8 docs carries no
    # dedup signal and would fan the equi-join out quadratically — drop it
    # BEFORE the self-join (the overlap denominator still uses full sizes).
    keep = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df")).filter(F.col("_df") <= 8)
    rare = fps.join(keep.select("fp"), "fp")
    a = rare.select(F.col("doc_id").alias("id_a"), "fp")
    b = rare.select(F.col("doc_id").alias("id_b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("nfp").alias("nfp_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("nfp").alias("nfp_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(
                F.col("n_shared").cast("double") / F.least("nfp_a", "nfp_b"), 9
            ).alias("overlap"),
        )
    )


# --------------------------------------------------------------------------
# q_bpe_pair_stats — tokenizer-training prep: corpus-wide adjacent
# symbol-pair counts (the statistic that picks byte-pair-encoding's
# next merge). Scale discipline mirrors the CMS build: words collapse
# to (word, count) FIRST, then pairs explode per DISTINCT word weighted
# by its count — the wide shuffle moves vocabulary, not occurrences.
# Top-50 with a total-order tie break (count desc, pair asc) so the
# LIMIT boundary is deterministic; TakeOrderedAndProject keeps the full
# pair space out of any single task.
# --------------------------------------------------------------------------
BPE_ORACLE = f"""
WITH toks AS (
  SELECT unnest({_W}) AS w FROM documents
), wc AS (
  SELECT w, count(*) AS c FROM toks WHERE length(w) >= 2 GROUP BY w
), pairs AS (
  SELECT unnest(list_transform(range(1, length(w)), i -> substring(w, CAST(i AS INT), 2))) AS pair, c
  FROM wc
), agg AS (
  SELECT pair, sum(c) AS cnt FROM pairs GROUP BY pair
)
SELECT pair, CAST(cnt AS BIGINT) AS cnt
FROM agg ORDER BY cnt DESC, pair LIMIT 50
"""


@query("q_bpe_pair_stats", BPE_ORACLE)
def q_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(X.words("text")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = wc.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "c",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(50)
    )


# --------------------------------------------------------------------------
# q_subword_encode — greedy longest-match subword tokenization (the
# inference side of tokenizer training; q_bpe_pair_stats is the training
# statistic). Vocabulary = every corpus character + the top-K character
# n-grams (2..4) by occurrence-weighted frequency with a deterministic
# tie break; encoding walks each word left-to-right taking the longest
# vocabulary match (WordPiece-style greedy decode — single-char entries
# guarantee termination).
#
# Scale discipline: everything runs over DISTINCT words (wc collapses
# occurrences first — the same vocabulary-not-token-stream shuffle rule
# as q_bpe_pair_stats), the vocab is a K+alphabet-row broadcast array,
# and the encode itself is ONE JVM `aggregate` HOF fold per distinct
# word — no Python, no shuffle, no recursion in the engine. The DuckDB
# oracle replays the greedy walk with a recursive CTE (depth = max word
# length), certifying every emitted token string, not just counts.
# --------------------------------------------------------------------------
_SW_K = 12  # merged n-gram vocabulary entries (constant; 30k+ for a real BPE)

SUBWORD_ORACLE = f"""
WITH RECURSIVE words AS (
  SELECT w, count(*) AS c FROM (SELECT unnest({_W}) AS w FROM documents)
  WHERE w <> '' GROUP BY w
), chars AS (
  SELECT DISTINCT unnest(list_transform(range(1, length(w) + 1),
    i -> substring(w, CAST(i AS INT), 1))) AS v
  FROM words
), grams AS (
  SELECT g, CAST(SUM(c) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_transform(range(1, length(w)),
      i -> substring(w, CAST(i AS INT), 2))) AS g, c FROM words
    UNION ALL
    SELECT unnest(list_transform(range(1, length(w) - 1),
      i -> substring(w, CAST(i AS INT), 3))) AS g, c FROM words WHERE length(w) >= 3
    UNION ALL
    SELECT unnest(list_transform(range(1, length(w) - 2),
      i -> substring(w, CAST(i AS INT), 4))) AS g, c FROM words WHERE length(w) >= 4
  ) GROUP BY g ORDER BY cnt DESC, g LIMIT {_SW_K}
), vocab AS (
  SELECT v FROM chars UNION ALL SELECT g FROM grams
), enc AS (
  SELECT w, 1 AS pos, CAST([] AS VARCHAR[]) AS toks FROM words
  UNION ALL
  SELECT w, pos + length(ch) AS pos, list_append(toks, ch) AS toks FROM (
    SELECT w, pos, toks,
      CASE WHEN substring(w, pos, 4) IN (SELECT v FROM vocab) THEN substring(w, pos, 4)
           WHEN substring(w, pos, 3) IN (SELECT v FROM vocab) THEN substring(w, pos, 3)
           WHEN substring(w, pos, 2) IN (SELECT v FROM vocab) THEN substring(w, pos, 2)
           ELSE substring(w, pos, 1) END AS ch
    FROM enc WHERE pos <= length(w))
)
SELECT e.w, CAST(words.c AS BIGINT) AS c,
  array_to_string(e.toks, '|') AS enc,
  CAST(len(e.toks) AS BIGINT) AS n_toks
FROM enc e JOIN words USING (w) WHERE e.pos > length(e.w)
"""

_SW_CHOSEN = (
    "CASE WHEN array_contains(v, substring(w, acc.pos, 4)) THEN substring(w, acc.pos, 4) "
    "WHEN array_contains(v, substring(w, acc.pos, 3)) THEN substring(w, acc.pos, 3) "
    "WHEN array_contains(v, substring(w, acc.pos, 2)) THEN substring(w, acc.pos, 2) "
    "ELSE substring(w, acc.pos, 1) END"
)

_SW_FOLD = (
    "aggregate(sequence(1, length(w)), "
    "named_struct('pos', 1, 'toks', cast(array() as array<string>)), "
    "(acc, i) -> IF(i != acc.pos, acc, named_struct("
    f"'pos', acc.pos + length({_SW_CHOSEN}), "
    f"'toks', concat(acc.toks, array({_SW_CHOSEN})))), "
    "acc -> acc.toks)"
)


@query("q_subword_encode", SUBWORD_ORACLE)
def q_subword_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    # blank docs normalize to '' and split() yields [''] — Spark's
    # sequence(1, 0) would fold it to toks=[''] while the oracle's
    # range(1, 1) yields [] (measured divergence); drop empty words on
    # BOTH sides
    wc = (
        docs.select(F.explode(X.words("text")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    chars = wc.select(
        F.explode(
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        ).alias("g")
    )
    # all gram lengths explode in one pass -> ONE weighted aggregation
    # (a per-length pre-aggregate union costs 3 extra shuffles for the
    # same multiset)
    gram_arrays = ", ".join(
        f"CASE WHEN length(w) >= {l} THEN "
        f"transform(sequence(1, length(w) - {l - 1}), i -> substring(w, i, {l})) "
        f"ELSE array() END"
        for l in (2, 3, 4)
    )
    topk = (
        wc.filter(F.length("w") >= 2)
        .select(F.explode(F.expr(f"concat({gram_arrays})")).alias("g"), "c")
        .groupBy("g")
        .agg(F.sum("c").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "g")
        .limit(_SW_K)
        .select("g")
    )
    vocab = chars.distinct().select(F.col("g").alias("v")).unionByName(
        topk.select(F.col("g").alias("v"))
    )
    varr = vocab.agg(F.sort_array(F.collect_set("v")).alias("v"))
    return (
        wc.crossJoin(F.broadcast(varr))  # bounded: alphabet + K entries
        .select("w", "c", F.expr(_SW_FOLD).alias("toks"))
        .select(
            "w",
            "c",
            F.array_join("toks", "|").alias("enc"),
            F.size("toks").cast("bigint").alias("n_toks"),
        )
    )


# --------------------------------------------------------------------------
# q_bm25_search — Okapi BM25 retrieval (k1=1.2, b=0.75) for a fixed
# query term set: the scoring function behind every lexical search
# engine, completing the IR story next to q_tfidf_top_terms (which used
# a linear idf before cross-engine ln-parity was established) and
# q_hybrid_search. Per-(doc, term) partial scores quantize to integer
# 1e-9 units BEFORE the per-doc sum (BIGINT — order-independent); the
# float expression is ONE SHARED SQL STRING evaluated by both engines
# (constants in scientific notation — plain decimal literals parse as
# DECIMAL with different division semantics, see SCALING.md).
#
# Scale: tf aggregates only the query-term hits (scan filter first),
# df and the avgdl scalar are bounded broadcasts, doc length is one
# doc-keyed aggregation, top-k is TakeOrderedAndProject.
# --------------------------------------------------------------------------
_BM25_TERMS = ("data", "batch", "column")
_BM25_TOPK = 20
# shared Spark-SQL/DuckDB expression over columns: tf, df, dl, n, avgdl
_BM25_UNIT = (
    "CAST(FLOOR(ln(1e0 + (CAST(n - df AS DOUBLE) + 5e-1) / (CAST(df AS DOUBLE) + 5e-1))"
    " * (CAST(tf AS DOUBLE) * 2.2e0)"
    " / (CAST(tf AS DOUBLE) + 1.2e0 * (1e0 - 7.5e-1 + 7.5e-1 * CAST(dl AS DOUBLE) / avgdl))"
    " * 1e9) AS BIGINT)"
)
_BM25_IN = ", ".join(f"'{t}'" for t in _BM25_TERMS)

BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_W}) AS tok FROM documents
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
), tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE tok IN ({_BM25_IN}) GROUP BY doc_id, tok
), df AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
), scal AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(SUM(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
), scored AS (
  SELECT tf.doc_id, {_BM25_UNIT} AS unit
  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN scal
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
  CAST(SUM(unit) AS BIGINT) AS score_units
FROM scored GROUP BY doc_id
ORDER BY score_units DESC, doc_id LIMIT {_BM25_TOPK}
"""


@query("q_bm25_search", BM25_ORACLE)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(X.words("text")).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    tf = (
        toks.filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    scal = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
    )
    scored = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scal))
        .select("doc_id", F.expr(_BM25_UNIT).alias("unit"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum("unit").cast("bigint").alias("score_units"),
        )
        .orderBy(F.col("score_units").desc(), "doc_id")
        .limit(_BM25_TOPK)
    )


# --------------------------------------------------------------------------
# q_global_shuffle — deterministic pretraining shuffle: every doc gets a
# portable hash rank, shards by hash residue, and an intra-shard
# position by hash order (ties by doc_id). The shuffle-before-pack step
# of dataset assembly, with NO RNG state: re-running on any cluster
# reproduces the identical permutation. The only window partitions BY
# SHARD — at 100 TB each shard's rank sort is one partition-local sort
# after the hash shuffle, never a global order.
# --------------------------------------------------------------------------
from forklift_spark.functions.hashing import md5_long_sql as _md5_sql

GSHUFFLE_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_md5_sql("concat('sh:', CAST(doc_id AS VARCHAR))")} AS h
  FROM documents
)
SELECT doc_id, h % 8 AS shard,
  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS BIGINT) AS pos
FROM h
"""


@query("q_global_shuffle", GSHUFFLE_ORACLE)
def q_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from forklift_spark.functions.hashing import md5_long

    docs = tables.load(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        md5_long(F.concat(F.lit("sh:"), F.col("doc_id").cast("string"))).alias("h"),
    ).withColumn("shard", F.col("h") % 8)
    w = W.partitionBy("shard").orderBy("h", "doc_id")
    return h.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


# --------------------------------------------------------------------------
# q_rrf_fusion — Reciprocal Rank Fusion (Cormack et al. 2009): merge the
# BM25 lexical ranking with the vector-cosine ranking by summing
# floor(1e12 / (60 + rank)) per list — the standard hybrid-retrieval
# combiner (Elasticsearch/Vespa default) that needs NO score
# normalization across lists. Contributions are floored to integer
# units so the fused score is a BIGINT sum (engine-exact; the raw
# 1/(60+r) doubles would be fine too, but integers keep the catalog's
# order-independence discipline). Full outer join: a doc ranked by only
# one list still fuses. The oracle replays BOTH rankings end to end —
# BM25 quantized partials AND the exact-decimal cosine list — plus the
# fusion arithmetic.
# --------------------------------------------------------------------------
_RRF_K = 60
_RRF_TOPN = 20


def _rrf_oracle() -> str:
    from forklift_spark.queries.similarity import _NORMS, _PAIR_DOT

    dots = _PAIR_DOT.format(
        A="(SELECT * FROM embeddings WHERE vec_id = 0)",
        B="(SELECT * FROM embeddings WHERE vec_id >= 10)",
        COND="",
    )
    contrib = f"CAST(FLOOR(1e12 / CAST({_RRF_K} + {{r}} AS DOUBLE)) AS BIGINT)"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_W}) AS tok FROM documents
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
), tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE tok IN ({_BM25_IN}) GROUP BY doc_id, tok
), df AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
), scal AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(SUM(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
), bm AS (
  SELECT tf.doc_id, SUM({_BM25_UNIT}) AS score_units
  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN scal
  GROUP BY tf.doc_id
), lex AS (
  SELECT doc_id, CAST(row_number() OVER (
      ORDER BY score_units DESC, doc_id) AS INT) AS lex_rank
  FROM bm ORDER BY score_units DESC, doc_id LIMIT {_RRF_TOPN}
), norms AS ({_NORMS}),
dots AS ({dots}),
sem AS (
  SELECT neighbor_id AS doc_id, CAST(rank AS INT) AS sem_rank
  FROM (
    SELECT d.ib AS neighbor_id,
      row_number() OVER (ORDER BY d.dot / (na.nrm * nb.nrm) DESC, d.ib) AS rank
    FROM dots d JOIN norms na ON d.ia = na.vec_id
                JOIN norms nb ON d.ib = nb.vec_id
  ) WHERE rank <= {_RRF_TOPN}
)
SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
  lex.lex_rank, sem.sem_rank,
  coalesce({contrib.format(r="lex.lex_rank")}, 0)
    + coalesce({contrib.format(r="sem.sem_rank")}, 0) AS rrf_units
FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
"""


@query("q_rrf_fusion", _rrf_oracle())
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from forklift_spark.operators import similarity as S

    docs = tables.load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(X.words("text")).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    tf = (
        toks.filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    scal = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
    )
    bm = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scal))
        .select("doc_id", F.expr(_BM25_UNIT).alias("unit"))
        .groupBy("doc_id")
        .agg(F.sum("unit").alias("score_units"))
        .orderBy(F.col("score_units").desc(), "doc_id")
        .limit(_RRF_TOPN)
    )
    wl = W.orderBy(F.col("score_units").desc(), "doc_id")
    lex = bm.select(
        "doc_id", F.row_number().over(wl).cast("int").alias("lex_rank")
    )
    emb = tables.load(spark, sf_dir, "embeddings")
    sem = S.brute_force_topk(
        emb.filter(F.col("vec_id") == 0),
        emb.filter(F.col("vec_id") >= 10),
        k=_RRF_TOPN,
    ).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank").cast("int").alias("sem_rank")
    )

    def contrib(r):
        return F.floor(F.lit(1e12) / (F.lit(_RRF_K) + r).cast("double")).cast(
            "bigint"
        )

    return lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "sem_rank",
        (
            F.coalesce(contrib(F.col("lex_rank")), F.lit(0))
            + F.coalesce(contrib(F.col("sem_rank")), F.lit(0))
        ).alias("rrf_units"),
    )


# --------------------------------------------------------------------------
# q_balanced_sample — EXACTLY-k-per-group balanced downsampling (class
# rebalancing before training): each (source, lang) cell keeps its
# min(k, n) lowest-hash-ranked docs. The hash rank replaces an RNG the
# same way q_stratified_sample's Bernoulli does, but gives a FIXED
# sample size per cell (Bernoulli only hits the rate in expectation) —
# the two sampling contracts a curation stack needs side by side.
# Rank-by-hash is a per-cell window (row_number over md5), so the plan
# is one grouped window pass, no global sort; ties are impossible
# (md5 of distinct ids). Oracle replays rank and cutoff exactly.
# --------------------------------------------------------------------------
_BAL_K = 12

BALANCED_ORACLE = f"""
WITH r AS (
  SELECT doc_id, source, lang,
    row_number() OVER (
      PARTITION BY source, lang
      ORDER BY CAST('0x' || substr(md5('bal:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT), doc_id
    ) AS rk,
    count(*) OVER (PARTITION BY source, lang) AS cell_n
  FROM documents
)
SELECT doc_id, source, lang,
  CAST(rk AS BIGINT) AS rk,
  CAST(cell_n AS BIGINT) AS cell_n
FROM r WHERE rk <= {_BAL_K}
"""


@query("q_balanced_sample", BALANCED_ORACLE)
def q_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from forklift_spark.functions.hashing import md5_long

    docs = tables.load(spark, sf_dir, "documents")
    h = md5_long(F.concat(F.lit("bal:"), F.col("doc_id").cast("string")))
    w = W.partitionBy("source", "lang")
    r = docs.select(
        "doc_id", "source", "lang",
        F.row_number().over(w.orderBy(h.asc(), F.col("doc_id"))).alias("rk"),
        F.count(F.lit(1)).over(w).alias("cell_n"),
    )
    return r.filter(F.col("rk") <= _BAL_K).select(
        "doc_id", "source", "lang",
        F.col("rk").cast("bigint").alias("rk"),
        F.col("cell_n").cast("bigint").alias("cell_n"),
    )


# --------------------------------------------------------------------------
# q_dataset_card — the one-row corpus datasheet (the "dataset card"
# stats block a release ships with): document/token/char totals,
# language and source cardinalities, English share, exact-duplicate
# rate, mean and median document length, and a minimum-length quality
# pass rate. Every rate is integer basis points (true integer
# division); the median is the exact interpolated percentile both
# engines compute identically (q_percentiles machinery). One scan +
# one tiny distinct-fingerprint aggregate — the report is two jobs at
# any scale.
# --------------------------------------------------------------------------
_CARD_MIN_WORDS = 25

DATASET_CARD_ORACLE = f"""
WITH base AS (
  SELECT doc_id, lang, source, n_chars,
    len(string_split({NORM}, ' ')) AS n_words,
    md5({NORM}) AS fp
  FROM documents
), agg AS (
  SELECT
    count(*) AS n_docs,
    CAST(sum(n_words) AS BIGINT) AS n_tokens,
    CAST(sum(n_chars) AS BIGINT) AS n_chars,
    count(DISTINCT lang) AS n_langs,
    count(DISTINCT source) AS n_sources,
    count(*) FILTER (lang = 'en') AS n_en,
    count(DISTINCT fp) AS n_unique,
    count(*) FILTER (n_words >= {_CARD_MIN_WORDS}) AS n_quality,
    quantile_cont(n_words, 0.5) AS p50_words
  FROM base
)
SELECT
  CAST(n_docs AS BIGINT) AS n_docs,
  n_tokens,
  n_chars,
  CAST(n_langs AS BIGINT) AS n_langs,
  CAST(n_sources AS BIGINT) AS n_sources,
  CAST(10000 * n_en // n_docs AS BIGINT) AS en_share_bp,
  CAST(10000 * (n_docs - n_unique) // n_docs AS BIGINT) AS dup_rate_bp,
  CAST(10000 * n_quality // n_docs AS BIGINT) AS quality_pass_bp,
  CAST(n_tokens // n_docs AS BIGINT) AS mean_doc_tokens,
  round(p50_words, 9) AS median_doc_tokens
FROM agg
"""


@query("q_dataset_card", DATASET_CARD_ORACLE)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.operators.text import words

    docs = tables.load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "lang", "source", "n_chars",
        F.size(words("text")).alias("n_words"),
        F.md5(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
        ).alias("fp"),
    )
    agg = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.sum((F.col("lang") == "en").cast("long")).alias("n_en"),
        F.countDistinct("fp").alias("n_unique"),
        F.sum((F.col("n_words") >= _CARD_MIN_WORDS).cast("long")).alias("n_quality"),
        F.expr("percentile(n_words, 0.5)").alias("p50_words"),
    )
    return agg.select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "n_tokens",
        "n_chars",
        "n_langs",
        "n_sources",
        F.expr("10000 * n_en div n_docs").cast("bigint").alias("en_share_bp"),
        F.expr("10000 * (n_docs - n_unique) div n_docs").cast("bigint").alias("dup_rate_bp"),
        F.expr("10000 * n_quality div n_docs").cast("bigint").alias("quality_pass_bp"),
        F.expr("n_tokens div n_docs").cast("bigint").alias("mean_doc_tokens"),
        F.round("p50_words", 9).alias("median_doc_tokens"),
    )


# --------------------------------------------------------------------------
# q_bpe_train — byte-pair-encoding TRAINING: the actual iterative merge
# loop (q_bpe_pair_stats is one round's statistic; this runs the loop).
# Each round: (1) occurrence-weighted adjacent-pair counts over the
# DISTINCT-word table (the vocabulary-not-token-stream shuffle rule),
# (2) the argmax pair under a deterministic (n DESC, left, right) tie
# break — a 1-row scalar frame (q11/q15 shape), (3) the classic greedy
# LEFT-TO-RIGHT NON-OVERLAPPING merge of that pair inside every word,
# run as one JVM `aggregate` HOF fold per distinct word ("aaaa" + (a,a)
# -> [aa, aa], never [a, aa, a]). Rounds are unrolled with a
# localCheckpoint on the bounded word table (iterative-operator
# discipline). The oracle replays the merge fold with DuckDB's
# list_reduce over the spaced-symbol string — two engines, two HOF
# implementations, certifying pair counts, argmax tie breaks, AND the
# greedy merge semantics round for round. Pair counts count OVERLAPPING
# occurrences ("aaa" -> 2x(a,a)) exactly as reference BPE does.
# --------------------------------------------------------------------------
_BPE_TRAIN_ROUNDS = 3


def _bpe_train_oracle(rounds: int) -> str:
    parts = [
        f"""WITH w0 AS MATERIALIZED (
  SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s,
         CAST(count(*) AS BIGINT) AS f
  FROM (SELECT unnest({_W}) AS w FROM documents) t
  WHERE w <> '' GROUP BY 1
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""", p{r} AS MATERIALIZED (
  SELECT list_extract(l, k) AS lft, list_extract(l, k + 1) AS rgt,
         CAST(SUM(f) AS BIGINT) AS n
  FROM (SELECT unnest(generate_series(1, len(l) - 1)) AS k, l, f
        FROM (SELECT string_split(s, ' ') AS l, f FROM w{r - 1}) q
        WHERE len(l) >= 2) t
  GROUP BY 1, 2
), b{r} AS MATERIALIZED (
  SELECT lft, rgt, n FROM p{r} ORDER BY n DESC, lft, rgt LIMIT 1
), w{r} AS MATERIALIZED (
  SELECT list_reduce(string_split(w{r - 1}.s, ' '), (acc, y) ->
      CASE WHEN (acc = b{r}.lft OR ends_with(acc, ' ' || b{r}.lft))
                AND y = b{r}.rgt
           THEN left(acc, length(acc) - length(b{r}.lft)) || b{r}.lft || b{r}.rgt
           ELSE acc || ' ' || y END) AS s, w{r - 1}.f
  FROM w{r - 1}, b{r}
)"""
        )
    selects = [
        f"SELECT {r} AS merge_round, lft, rgt, lft || rgt AS merged, n FROM b{r}"
        for r in range(1, rounds + 1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL ".join(selects)


_BPE_MERGE_FOLD = """
aggregate(
  s,
  cast(array() as array<string>),
  (acc, t) -> if(
    size(acc) > 0 AND element_at(acc, -1) = lft AND t = rgt,
    concat(slice(acc, 1, size(acc) - 1), array(lft || rgt)),
    concat(acc, array(t)))
)
"""


@query("q_bpe_train", _bpe_train_oracle(_BPE_TRAIN_ROUNDS))
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce as _reduce

    docs = tables.load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(X.words("text")).alias("w"))
        .filter(F.col("w") != "")  # empty-word engine divergence (NOTES r3 §22)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .select(F.split("w", "").alias("s"), "f")
        .localCheckpoint(eager=True)  # bounded distinct-word table
    )
    merge_rows = []
    for r in range(1, _BPE_TRAIN_ROUNDS + 1):
        pairs = (
            words.filter(F.size("s") >= 2)  # sequence(1,0) counts DOWN in Spark
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1),"
                        " i -> struct(element_at(s, i) AS lft,"
                        " element_at(s, i + 1) AS rgt))"
                    )
                ).alias("p"),
                "f",
            )
            .groupBy("p.lft", "p.rgt")
            .agg(F.sum("f").alias("n"))
        )
        best = (
            pairs.orderBy(F.col("n").desc(), "lft", "rgt")
            .limit(1)
            .localCheckpoint(eager=True)  # 1-row scalar, consumed twice
        )
        words = (
            words.crossJoin(F.broadcast(best.select("lft", "rgt")))
            .select(F.expr(_BPE_MERGE_FOLD).alias("s"), "f")
            .localCheckpoint(eager=True)
        )
        merge_rows.append(
            best.select(
                F.lit(r).alias("merge_round"),
                "lft",
                "rgt",
                F.concat("lft", "rgt").alias("merged"),
                "n",
            )
        )
    return _reduce(lambda a, b: a.unionByName(b), merge_rows)
