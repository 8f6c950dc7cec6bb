"""Data-selection queries: scoring operators that decide WHICH documents
a training pipeline keeps (importance resampling, model-based quality),
oracle-checked end to end.

These are the published data-selection methods a 100 TB curation stack
runs between dedup and assembly:

- DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): hashed n-gram bag-of-words
  models of a target domain vs the raw pool; each raw doc gets a log
  importance weight and the top slice is selected.
- Unigram cross-entropy scoring: the classic CCNet/perplexity-filter
  proxy — score each doc by its mean negative log-probability under a
  corpus unigram LM.

Engine-exactness: both scores are sums of logarithms — doubles, whose
summation order Spark does not define. The trick used throughout:
quantize each per-FEATURE log value to integer 1e-9 units FIRST
(``CAST(FLOOR(ln(p) * 1e9) AS BIGINT)``), then aggregate BIGINTs —
order-independent, hash-stable at any parallelism. The inputs to ``ln``
are count ratios whose IEEE division is bit-defined, and ``ln`` itself
was measured bit-identical between Spark (java.lang.Math.log) and DuckDB
(libm) across the full ratio range used here — see NOTES_r3.md. This is
the upgrade q_token_rarity's integer-rank proxy explicitly avoided before
that parity was established.

Scale notes: the bucketed feature models are B rows (constant) —
broadcast join-backs; the token/feature explode aggregates with map-side
combine; top-k selection is TakeOrderedAndProject (per-partition heaps),
never a global sort. The unigram model is a vocabulary table — broadcast
at test SF, a word-keyed shuffle join at 100 TB (distinct words, not
occurrences, cross the wire; same discipline as q_bpe_pair_stats).

Reference parity: the reference (taskrabbit/forklift) has no selection
operators — this family is brief-scope (LLM-data-pipeline surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from forklift_spark import tables
from forklift_spark.functions.hashing import md5_long, md5_long_sql
from forklift_spark.operators import text as X
from forklift_spark.queries import query
from forklift_spark.queries.dedup import NORM

_W = f"string_split({NORM}, ' ')"

# --------------------------------------------------------------------------
# q_dsir_weights — hashed n-gram importance resampling.
#
# Features: unigrams + word bigrams, hashed into B buckets (portable
# md5 bucket, functions/hashing.py). Target = a fixed source slice;
# raw = the rest. Per-bucket add-1-smoothed log-ratio
# ln(p_target) - ln(p_raw), quantized to 1e-9 units; a raw doc's weight
# is the BIGINT dot product of its bucket counts with the ratio vector.
# Selection = top _DSIR_KEEP by (weight desc, doc_id) — deterministic
# boundary, TakeOrderedAndProject.
#
# Plan shape at scale: two aggregations over the feature explode
# (bucket-keyed, B buckets — tiny shuffle), the model join-back is a
# B-row broadcast, the scalar totals are 1-row broadcasts (same
# allowlisted shape as TPC-H q11/q15 thresholds). Nothing quadratic,
# no global sort.
# --------------------------------------------------------------------------
_DSIR_B = 64          # feature buckets (10k+ at real scale; B is a constant)
_DSIR_KEEP = 100      # selected slice size
_DSIR_TARGET = ("src0", "src1", "src2", "src3", "src4")

_TGT_IN = ", ".join(f"'{s}'" for s in _DSIR_TARGET)

DSIR_ORACLE = f"""
WITH w AS (
  SELECT doc_id, source, {_W} AS w FROM documents
), feats AS (
  SELECT doc_id, source IN ({_TGT_IN}) AS is_tgt,
    unnest(list_concat(
      w,
      list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])
    )) AS feat
  FROM w
), bf AS (
  SELECT doc_id, is_tgt, {md5_long_sql('feat')} % {_DSIR_B} AS bucket
  FROM feats
), tb AS (
  SELECT bucket, count(*) AS ct FROM bf WHERE is_tgt GROUP BY bucket
), rb AS (
  SELECT bucket, count(*) AS cr FROM bf WHERE NOT is_tgt GROUP BY bucket
), tot AS (
  SELECT count(*) FILTER (WHERE is_tgt) AS t,
         count(*) FILTER (WHERE NOT is_tgt) AS r
  FROM bf
), model AS (
  SELECT rb.bucket,
    CAST(FLOOR((
      ln(CAST(coalesce(tb.ct, 0) + 1 AS DOUBLE) / CAST(tot.t + {_DSIR_B} AS DOUBLE))
      - ln(CAST(rb.cr + 1 AS DOUBLE) / CAST(tot.r + {_DSIR_B} AS DOUBLE))
    ) * 1e9) AS BIGINT) AS lr_units
  FROM rb LEFT JOIN tb USING (bucket) CROSS JOIN tot
), dcounts AS (
  SELECT doc_id, bucket, count(*) AS c FROM bf WHERE NOT is_tgt
  GROUP BY doc_id, bucket
), weights AS (
  SELECT d.doc_id,
    CAST(SUM(d.c) AS BIGINT) AS n_feats,
    CAST(SUM(d.c * m.lr_units) AS BIGINT) AS weight_units
  FROM dcounts d JOIN model m USING (bucket)
  GROUP BY d.doc_id
), keep AS (
  SELECT doc_id FROM weights
  ORDER BY weight_units DESC, doc_id LIMIT {_DSIR_KEEP}
)
SELECT w.doc_id, w.n_feats, w.weight_units,
  (k.doc_id IS NOT NULL) AS selected
FROM weights w LEFT JOIN keep k USING (doc_id)
"""


@query("q_dsir_weights", DSIR_ORACLE)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        F.col("source").isin(*_DSIR_TARGET).alias("is_tgt"),
        X.words("text").alias("w"),
    )
    feats = w.select(
        "doc_id",
        "is_tgt",
        F.explode(
            F.concat(
                F.col("w"),
                F.expr(
                    "CASE WHEN size(w) >= 2 THEN "
                    "transform(sequence(1, size(w) - 1), "
                    "i -> concat(element_at(w, i), ' ', element_at(w, i + 1))) "
                    "ELSE array() END"
                ),
            )
        ).alias("feat"),
    )
    bf = feats.select(
        "doc_id", "is_tgt", (md5_long("feat") % _DSIR_B).alias("bucket")
    )
    # two-level rollup: the exploded feature stream shuffles ONCE at
    # (doc, side, bucket) grain; the bucket models, the scalar totals,
    # and the raw-doc counts all derive from that small frame (the
    # identical first-level exchange is computed once and reused)
    # lazy checkpoint: AQE does NOT reliably reuse the identical exchange
    # across the four consumers (measured: the explode+shuffle ran 3x);
    # checkpointing the small rollup frame pins one materialization
    dcall = (
        bf.groupBy("doc_id", "is_tgt", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    tb = dcall.filter("is_tgt").groupBy("bucket").agg(F.sum("c").alias("ct"))
    rb = dcall.filter(~F.col("is_tgt")).groupBy("bucket").agg(
        F.sum("c").alias("cr")
    )
    tot = dcall.agg(
        F.sum(F.when(F.col("is_tgt"), F.col("c")).otherwise(0)).alias("t"),
        F.sum(F.when(~F.col("is_tgt"), F.col("c")).otherwise(0)).alias("r"),
    )
    model = (
        rb.join(tb, "bucket", "left")
        .crossJoin(F.broadcast(tot))  # 1-row scalar totals (q11/q15 shape)
        .select(
            "bucket",
            F.floor(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                        / (F.col("t") + F.lit(_DSIR_B)).cast("double")
                    )
                    - F.log(
                        (F.col("cr") + 1).cast("double")
                        / (F.col("r") + F.lit(_DSIR_B)).cast("double")
                    )
                )
                * F.lit(1e9)
            ).alias("lr_units"),
        )
    )
    dcounts = dcall.filter(~F.col("is_tgt")).select("doc_id", "bucket", "c")
    weights = (
        dcounts.join(F.broadcast(model), "bucket")  # model is <= B rows
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_feats"),
            F.sum(F.col("c") * F.col("lr_units")).cast("bigint").alias("weight_units"),
        )
    )
    keep = (
        weights.orderBy(F.col("weight_units").desc(), "doc_id")
        .limit(_DSIR_KEEP)
        .select("doc_id", F.lit(True).alias("_k"))
    )
    return (
        weights.join(F.broadcast(keep), "doc_id", "left")
        .select(
            "doc_id",
            "n_feats",
            "weight_units",
            F.coalesce(F.col("_k"), F.lit(False)).alias("selected"),
        )
    )


# --------------------------------------------------------------------------
# q_unigram_xent — mean negative log-probability under a corpus unigram
# LM (the perplexity-filter proxy: CCNet buckets CommonCrawl by exactly
# this kind of score before training). Per-WORD NLL quantizes to 1e-9
# units at the vocabulary level (one ln per DISTINCT word); a doc's score
# is the BIGINT sum over its token occurrences, and the mean uses true
# integer division (Spark `div` == DuckDB `//` — double `/`+cast diverges
# past ~2^46, see operators/graph.py).
#
# Scale: the model is |vocab| rows — broadcast here; at 100 TB a
# word-keyed shuffle join (distinct words cross the wire, not the token
# stream; the token-side aggregation pre-combines map-side).
# --------------------------------------------------------------------------
XENT_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_W}) AS tok FROM documents
), wc AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t FROM wc
), model AS (
  SELECT tok,
    CAST(FLOOR(-ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1e9) AS BIGINT)
      AS nll_units
  FROM wc CROSS JOIN tot
)
SELECT toks.doc_id,
  CAST(count(*) AS BIGINT) AS n_toks,
  CAST(SUM(m.nll_units) AS BIGINT) AS total_nll_units,
  CAST(SUM(m.nll_units) AS BIGINT) // CAST(count(*) AS BIGINT) AS xent_units
FROM toks JOIN model m ON toks.tok = m.tok
GROUP BY toks.doc_id
"""


@query("q_unigram_xent", XENT_ORACLE)
def q_unigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(X.words("text")).alias("tok"))
    wc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = wc.agg(F.sum("c").cast("bigint").alias("t"))
    model = wc.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.floor(
            -F.log(F.col("c").cast("double") / F.col("t").cast("double"))
            * F.lit(1e9)
        ).alias("nll_units"),
    )
    return (
        toks.join(F.broadcast(model), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_toks"),
            F.sum("nll_units").cast("bigint").alias("total_nll_units"),
        )
        .select(
            "doc_id",
            "n_toks",
            "total_nll_units",
            F.expr("total_nll_units div n_toks").alias("xent_units"),
        )
    )


# --------------------------------------------------------------------------
# q_bigram_xent — interpolated bigram LM cross-entropy (the KenLM-style
# upgrade of q_unigram_xent: context-aware perplexity-filter scoring).
# P(w2|w1) = λ·c(w1 w2)/c(w1) + (1−λ)·c(w2)/T — Jelinek-Mercer
# interpolation with the unigram model as backoff, so unseen-context
# mass never reaches zero. The model is built from the corpus itself,
# so every scored bigram exists in the model (inner join, no smoothing
# holes). The context count is the TOTAL unigram count (including
# doc-final occurrences), so the conditional is slightly deficient
# (sums to < 1) — the standard simplification; harmless for relative
# ranking, stated for exactness; λ is a scientific-notation literal on BOTH sides because a
# plain decimal literal parses as DECIMAL (not DOUBLE) in both engines
# with different division semantics (measured — see q_hll_portable).
# Engine-exactness discipline of the family: one interpolated
# probability per DISTINCT bigram, quantized to 1e-9 units at the model
# table; per-doc totals are BIGINT sums; the mean is true integer
# division. Scale: model rows = distinct bigrams (shuffle moves
# distinct pairs, not occurrences); the join-back is broadcast at test
# SF / pair-keyed shuffle at 100 TB.
# --------------------------------------------------------------------------
_LAMBDA = "7.5e-1"
_ONE_MINUS_LAMBDA = "2.5e-1"

BIGRAM_XENT_ORACLE = f"""
WITH w AS (
  SELECT doc_id, {_W} AS w FROM documents
), bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS bg
  FROM w WHERE len(w) >= 2
), toks AS (
  SELECT doc_id, unnest(w) AS tok FROM w
), uc AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t FROM uc
), bc AS (
  SELECT bg, count(*) AS cb FROM bg GROUP BY bg
), model AS (
  SELECT bc.bg,
    CAST(FLOOR(-ln(
      {_LAMBDA} * (CAST(bc.cb AS DOUBLE) / CAST(u1.c AS DOUBLE))
      + {_ONE_MINUS_LAMBDA} * (CAST(u2.c AS DOUBLE) / CAST(tot.t AS DOUBLE))
    ) * 1e9) AS BIGINT) AS nll_units
  FROM bc
  JOIN uc u1 ON u1.tok = string_split(bc.bg, ' ')[1]
  JOIN uc u2 ON u2.tok = string_split(bc.bg, ' ')[2]
  CROSS JOIN tot
)
SELECT bg.doc_id,
  CAST(count(*) AS BIGINT) AS n_bigrams,
  CAST(SUM(m.nll_units) AS BIGINT) AS total_nll_units,
  CAST(SUM(m.nll_units) AS BIGINT) // CAST(count(*) AS BIGINT) AS xent_units
FROM bg JOIN model m USING (bg)
GROUP BY bg.doc_id
"""


@query("q_bigram_xent", BIGRAM_XENT_ORACLE)
def q_bigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    w = docs.select("doc_id", X.words("text").alias("w"))
    bg = w.filter(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1), "
                "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
            )
        ).alias("bg"),
    )
    toks = w.select("doc_id", F.explode("w").alias("tok"))
    uc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = uc.agg(F.sum("c").cast("bigint").alias("t"))
    bc = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
    # split the pair key once; both unigram joins are vocab-sized
    bparts = bc.select(
        "bg", "cb",
        F.split("bg", " ").getItem(0).alias("w1"),
        F.split("bg", " ").getItem(1).alias("w2"),
    )
    model = (
        bparts.join(F.broadcast(uc.selectExpr("tok AS w1", "c AS c1")), "w1")
        .join(F.broadcast(uc.selectExpr("tok AS w2", "c AS c2")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "bg",
            F.floor(
                -F.log(
                    F.lit(0.75) * (F.col("cb").cast("double") / F.col("c1").cast("double"))
                    + F.lit(0.25) * (F.col("c2").cast("double") / F.col("t").cast("double"))
                )
                * F.lit(1e9)
            ).alias("nll_units"),
        )
    )
    return (
        bg.join(F.broadcast(model), "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("nll_units").cast("bigint").alias("total_nll_units"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "total_nll_units",
            F.expr("total_nll_units div n_bigrams").alias("xent_units"),
        )
    )


# --------------------------------------------------------------------------
# q_mi_feature_select — supervised feature selection by mutual
# information: score each token by MI(token-presence; domain-label)
# over documents (the classifier-feature / domain-signal audit a
# curation stack runs before training a fastText-style filter). The
# 2x2 contingency per token uses DOC-LEVEL presence counts; each of
# the four cells contributes (n/N)·ln(n·N / (rowtot·coltot)) — the ln
# argument is one division of two exact integer products (the measured
# ln-bit-parity regime), and the four-term sum is ONE fixed-order
# scalar expression both engines evaluate identically, quantized to
# 1e-9 units at the (bounded-vocabulary) contingency table. Zero
# cells contribute zero by the 0·ln0 convention — made explicit on
# both engines, never an engine's NULL-propagation accident. Top-30 by
# (mi desc, token) via TakeOrderedAndProject. Scale: presence counts
# shuffle DISTINCT (doc, token) pairs; the contingency table is
# vocabulary-sized.
# --------------------------------------------------------------------------
_MI_K = 30
_MI_MIN_DF = 5

MI_ORACLE = f"""
WITH lab AS (
  SELECT doc_id, source IN ({_TGT_IN}) AS y FROM documents
), pres AS (
  SELECT DISTINCT d.doc_id, unnest({_W}) AS tok
  FROM documents d
), tots AS (
  SELECT count(*) AS n,
         count(*) FILTER (y) AS n_t
  FROM lab
), cell AS (
  SELECT p.tok,
    count(*) FILTER (l.y) AS n11,
    count(*) FILTER (NOT l.y) AS n10
  FROM pres p JOIN lab l USING (doc_id)
  GROUP BY p.tok
  HAVING count(*) >= {_MI_MIN_DF}
), mi AS (
  SELECT tok, n11, n10,
    (SELECT
      CAST(FLOOR(1e9 * (
        CASE WHEN n11 > 0 THEN (CAST(n11 AS DOUBLE) / n)
          * ln(CAST(n11 * n AS DOUBLE) / CAST((n11 + n10) * n_t AS DOUBLE)) ELSE 0 END
        + CASE WHEN n10 > 0 THEN (CAST(n10 AS DOUBLE) / n)
          * ln(CAST(n10 * n AS DOUBLE) / CAST((n11 + n10) * (n - n_t) AS DOUBLE)) ELSE 0 END
        + CASE WHEN n_t - n11 > 0 THEN (CAST(n_t - n11 AS DOUBLE) / n)
          * ln(CAST((n_t - n11) * n AS DOUBLE) / CAST((n - n11 - n10) * n_t AS DOUBLE)) ELSE 0 END
        + CASE WHEN (n - n_t) - n10 > 0 THEN (CAST((n - n_t) - n10 AS DOUBLE) / n)
          * ln(CAST(((n - n_t) - n10) * n AS DOUBLE) / CAST((n - n11 - n10) * (n - n_t) AS DOUBLE)) ELSE 0 END
      )) AS BIGINT)
     FROM tots) AS mi_units
  FROM cell
)
SELECT tok, CAST(n11 AS BIGINT) AS n_target_docs,
  CAST(n10 AS BIGINT) AS n_raw_docs, mi_units
FROM mi
ORDER BY mi_units DESC, tok LIMIT {_MI_K}
"""


@query("q_mi_feature_select", MI_ORACLE)
def q_mi_feature_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    lab = docs.select(
        "doc_id", F.col("source").isin(*_DSIR_TARGET).alias("y")
    )
    pres = (
        docs.select("doc_id", F.explode(X.words("text")).alias("tok"))
        .dropDuplicates(["doc_id", "tok"])
    )
    tots = lab.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("long")).alias("n_t"),
    )
    cell = (
        pres.join(lab, "doc_id")
        .groupBy("tok")
        .agg(
            F.sum(F.col("y").cast("long")).alias("n11"),
            F.sum((~F.col("y")).cast("long")).alias("n10"),
        )
        .filter(F.col("n11") + F.col("n10") >= _MI_MIN_DF)
    )

    def term(num: F.Column, rown: F.Column, coln: F.Column) -> F.Column:
        n = F.col("n")
        return F.when(
            num > 0,
            (num.cast("double") / n.cast("double"))
            * F.log((num * n).cast("double") / (rown * coln).cast("double")),
        ).otherwise(F.lit(0.0))

    df_tok = F.col("n11") + F.col("n10")
    nf = F.col("n") - df_tok  # docs without the token
    n_r = F.col("n") - F.col("n_t")
    mi = cell.crossJoin(F.broadcast(tots)).select(
        "tok",
        "n11",
        "n10",
        F.floor(
            F.lit(1e9)
            * (
                term(F.col("n11"), df_tok, F.col("n_t"))
                + term(F.col("n10"), df_tok, n_r)
                + term(F.col("n_t") - F.col("n11"), nf, F.col("n_t"))
                + term(n_r - F.col("n10"), nf, n_r)
            )
        )
        .cast("bigint")
        .alias("mi_units"),
    )
    return (
        mi.orderBy(F.col("mi_units").desc(), "tok")
        .limit(_MI_K)
        .select(
            "tok",
            F.col("n11").cast("bigint").alias("n_target_docs"),
            F.col("n10").cast("bigint").alias("n_raw_docs"),
            "mi_units",
        )
    )


# --------------------------------------------------------------------------
# q_mixture_weights — training-data MIXTURE weighting with temperature
# (the multilingual/domain sampling op: p_i^T / sum p_j^T, Conneau &
# Lample 2019 style). T = 0.5 so the power is sqrt — IEEE-correctly-
# rounded in both engines — and weights are quantized to 1e-9 integers
# BEFORE the normalizing sum (the repo's standard cross-engine trick:
# integer sums are order-exact where double sums are not). Outputs per
# domain: token count, quantized weight numerator, normalized sampling
# weight, and expected epochs over the domain at one pass of the
# mixture — the knob that keeps low-resource domains from being
# memorized (epochs >> 1) or drowned (weight ~ 0). Scale: one rollup.
# --------------------------------------------------------------------------
MIXTURE_ORACLE = """
WITH dom AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS tokens
  FROM documents GROUP BY source
), q AS (
  SELECT source, tokens,
         CAST(ROUND(sqrt(CAST(tokens AS DOUBLE)) * 1e9) AS BIGINT) AS w_q
  FROM dom
), tot AS (
  SELECT CAST(SUM(w_q) AS BIGINT) AS total_q,
         CAST(SUM(tokens) AS BIGINT) AS total_tokens
  FROM q
)
SELECT q.source, q.tokens, q.w_q,
       CAST(q.w_q AS DOUBLE) / CAST(t.total_q AS DOUBLE) AS weight,
       (CAST(q.w_q AS DOUBLE) * CAST(t.total_tokens AS DOUBLE))
         / (CAST(t.total_q AS DOUBLE) * CAST(q.tokens AS DOUBLE)) AS epochs
FROM q, tot t
ORDER BY q.source
"""


@query("q_mixture_weights", MIXTURE_ORACLE)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    dom = docs.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("tokens")
    )
    q = dom.withColumn(
        "w_q",
        F.round(F.sqrt(F.col("tokens").cast("double")) * F.lit(1e9)).cast(
            "bigint"
        ),
    )
    tot = q.agg(
        F.sum("w_q").cast("bigint").alias("total_q"),
        F.sum("tokens").cast("bigint").alias("total_tokens"),
    )
    return (
        q.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "tokens",
            "w_q",
            (
                F.col("w_q").cast("double") / F.col("total_q").cast("double")
            ).alias("weight"),
            (
                (F.col("w_q").cast("double") * F.col("total_tokens").cast("double"))
                / (F.col("total_q").cast("double") * F.col("tokens").cast("double"))
            ).alias("epochs"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q_vocab_kl — corpus drift: KL(P_src0 || P_s) of unigram distributions
# for every source s vs the reference source, with add-one smoothing on
# the comparison side (so unseen tokens contribute finitely). The drift
# alarm for "did this week's crawl shift vocabulary" — rising KL flags
# topic/spam shift before quality metrics move. Exactness: every
# probability is an exact integer ratio, ln is bit-identical across
# engines on exact-ratio doubles (measured r2), logs are FLOOR-quantized
# to 1e-9 units, and each token's contribution c_a*(lnq_a - lnq_b) is
# pure BIGINT arithmetic — the sum is order-exact. Scale: one (source,
# token) rollup, a broadcast of per-source totals, one join on the
# reference vocabulary.
# --------------------------------------------------------------------------
VOCAB_KL_ORACLE = f"""
WITH toks AS (
  SELECT source, unnest({_W}) AS tok FROM documents
), counts AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
), totals AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM counts GROUP BY source
), vocab AS (
  SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM toks
), ref AS (
  SELECT c.tok, c.c AS c_a, t.t AS t_a,
         CAST(FLOOR(ln(CAST(c.c AS DOUBLE) / CAST(t.t AS DOUBLE)) * 1e9) AS BIGINT) AS lnq_a
  FROM counts c JOIN totals t ON t.source = c.source
  WHERE c.source = 'src0'
), pairs AS (
  SELECT s.source, r.tok, r.c_a, r.t_a, r.lnq_a,
         COALESCE(cb.c, 0) AS c_b, s.t AS t_b, v.v AS v
  FROM ref r
  CROSS JOIN totals s
  CROSS JOIN vocab v
  LEFT JOIN counts cb ON cb.source = s.source AND cb.tok = r.tok
), scored AS (
  SELECT source, c_a, t_a,
         c_a * (lnq_a - CAST(FLOOR(ln(CAST(c_b + 1 AS DOUBLE) / CAST(t_b + v AS DOUBLE)) * 1e9) AS BIGINT)) AS units
  FROM pairs
)
SELECT source,
       CAST(SUM(units) AS BIGINT) AS kl_units,
       CAST(MAX(t_a) AS BIGINT) AS ref_tokens,
       CAST(SUM(units) AS DOUBLE) / (CAST(MAX(t_a) AS DOUBLE) * 1e9) AS kl_nats
FROM scored
GROUP BY source
ORDER BY source
"""


@query("q_vocab_kl", VOCAB_KL_ORACLE)
def q_vocab_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(X.words("text")).alias("tok"))
    counts = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    totals = counts.groupBy("source").agg(F.sum("c").cast("bigint").alias("t"))
    vocab = toks.agg(F.count_distinct("tok").cast("bigint").alias("v"))
    ref = (
        counts.filter(F.col("source") == "src0")
        .join(F.broadcast(totals.filter(F.col("source") == "src0")), "source")
        .select(
            "tok",
            F.col("c").alias("c_a"),
            F.col("t").alias("t_a"),
            F.floor(
                F.log(F.col("c").cast("double") / F.col("t").cast("double"))
                * F.lit(1e9)
            ).cast("bigint").alias("lnq_a"),
        )
    )
    pairs = (
        ref.crossJoin(F.broadcast(totals.select("source", F.col("t").alias("t_b"))))
        .crossJoin(F.broadcast(vocab))
        .join(
            counts.select("source", "tok", F.col("c").alias("c_b")),
            ["source", "tok"],
            "left",
        )
        .fillna({"c_b": 0})
    )
    lnq_b = F.floor(
        F.log(
            (F.col("c_b") + 1).cast("double")
            / (F.col("t_b") + F.col("v")).cast("double")
        )
        * F.lit(1e9)
    ).cast("bigint")
    return (
        pairs.select(
            "source", "c_a", "t_a", (F.col("c_a") * (F.col("lnq_a") - lnq_b)).alias("units")
        )
        .groupBy("source")
        .agg(
            F.sum("units").cast("bigint").alias("kl_units"),
            F.max("t_a").cast("bigint").alias("ref_tokens"),
        )
        .select(
            "source",
            "kl_units",
            "ref_tokens",
            (
                F.col("kl_units").cast("double")
                / (F.col("ref_tokens").cast("double") * F.lit(1e9))
            ).alias("kl_nats"),
        )
        .orderBy("source")
    )
