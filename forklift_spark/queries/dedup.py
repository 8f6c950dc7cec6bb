"""Dedup queries over the documents table, oracle-checked.

Each oracle replicates the operator's algorithm in DuckDB SQL — same
md5 hash family, same shingling, same banding — so the driver's
hash-compare verifies the algorithm, not just row counts. The SQL is
generated programmatically next to the Spark plan to keep the two in
lockstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from forklift_spark import tables
from forklift_spark.operators import dedup as D
from forklift_spark.operators.dedup import normalize_text
from forklift_spark.queries import query

# shared SQL fragments (DuckDB) ---------------------------------------------
NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _hash_sql(expr: str, seed: int) -> str:
    return f"CAST('0x' || substr(md5(concat('s{seed}:', {expr})), 1, 15) AS BIGINT)"


_WORDS_CTE = f"SELECT doc_id, lang, {NORM} AS norm, string_split({NORM}, ' ') AS w FROM documents"


def _shingle_sql(n: int = 3) -> str:
    """DuckDB: distinct word n-gram shingles over a `w` words column
    (1-indexed lists); use after the _WORDS_CTE stage."""
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return (
        f"list_distinct(CASE WHEN len(w) >= {n} "
        f"THEN list_transform(range(1, len(w) - {n - 2}), i -> {gram}) "
        f"ELSE [norm] END)"
    )


# --------------------------------------------------------------------------
# q_dedup_exact — content-fingerprint dedup. The corpus has no exact
# dups, so the query re-ingests a case-mangled copy (ids offset by 10^6)
# and dedups the union: every group has 2 candidates, the original id
# wins. Checks normalization + min-id-wins semantics end to end.
# --------------------------------------------------------------------------
EXACT_ORACLE = f"""
WITH src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, upper(text) || '  ' FROM documents
), fp AS (
  SELECT doc_id, md5({NORM}) AS fingerprint FROM src
)
SELECT min(doc_id) AS doc_id, fingerprint, count(*) AS n_copies
FROM fp GROUP BY fingerprint
"""


@query("q_dedup_exact", EXACT_ORACLE)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    mangled = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("  ")).alias("text"),
    )
    src = docs.unionByName(mangled)
    fp = src.withColumn("fingerprint", D.fingerprint("text"))
    return fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("doc_id", "fingerprint", "n_copies")


# --------------------------------------------------------------------------
# q_dedup_minhash_lsh — MinHash(16) + LSH(8 bands × 2 rows) candidates,
# exact-Jaccard >= 0.3 verify. Oracle replays the full sketch pipeline.
# --------------------------------------------------------------------------
_NH, _BANDS, _ROWS = 16, 8, 2


def _minhash_ctes() -> str:
    """Shared oracle CTE prefix replaying the MinHash pipeline: shingle
    sets (hashed), signatures (sig), banded LSH candidates (cand), set
    sizes (sizes) — reused by q_dedup_minhash_lsh and
    q_dedup_recall_eval so both certify the SAME replayed sketch."""
    sh = _shingle_sql()
    # independent seeded re-hash of the shingle identity h1, two 60-bit
    # minhashes per digest — mirrors operators/dedup.minhash_signatures
    mh_cols = ",\n    ".join(
        "min(CAST('0x' || substr("
        f"md5('mh{i // 2}:' || CAST(h1 AS VARCHAR)), {1 if i % 2 == 0 else 16}, 15"
        f") AS BIGINT)) AS mh{i}"
        for i in range(_NH)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, md5(concat_ws(',', mh{b * _ROWS}, mh{b * _ROWS + 1})) AS key FROM sig"
        for b in range(_BANDS)
    )
    return f"""
WITH words AS (
  {_WORDS_CTE}
), sh0 AS (
  SELECT doc_id, {sh} AS sh FROM words
), sh_exp AS (
  SELECT doc_id, md5('s:' || unnest(sh)) AS d FROM sh0
), hashed AS (
  SELECT doc_id,
    CAST('0x' || substr(d, 1, 15) AS BIGINT) AS h1,
    CAST('0x' || substr(d, 16, 15) AS BIGINT) % {1 << 55} AS h2
  FROM sh_exp
), sig AS (
  SELECT doc_id,
    {mh_cols}
  FROM hashed GROUP BY doc_id
), bands AS (
{band_selects}
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
), sizes AS (
  SELECT doc_id, count(*) AS n FROM hashed GROUP BY doc_id
)"""


def _minhash_lsh_oracle() -> str:
    return f"""{_minhash_ctes()}, inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN hashed x ON x.doc_id = c.id_a
  JOIN hashed y ON y.doc_id = c.id_b AND y.h1 = x.h1
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
  CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) >= 0.3
"""


@query("q_dedup_minhash_lsh", _minhash_lsh_oracle())
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return D.minhash_dedup_pairs(
        docs, "doc_id", "text", num_hashes=_NH, bands=_BANDS, threshold=0.3
    )


# --------------------------------------------------------------------------
# q_dedup_simhash — 16-bit SimHash, Hamming <= 3. Spark finds candidates
# via 4-band pigeonhole join (scales); the oracle brute-forces all pairs
# (exact same result set by the pigeonhole guarantee).
# --------------------------------------------------------------------------
# 32-bit signature: with 4 pigeonhole bands the band key is 8 bits —
# wide enough that buckets stay small (16-bit/4-band collapses to 16
# 4-bit keys per band and the bucket self-join explodes quadratically).
_BITS, _MAXHAM = 32, 3


def _simhash_oracle() -> str:
    votes = ",\n    ".join(
        f"sum(CASE WHEN (hv >> {j}) & 1 = 1 THEN cnt ELSE -cnt END) AS v{j}"
        for j in range(_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN v{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(_BITS)
    )
    return f"""
WITH words AS (
  {_WORDS_CTE}
), t AS (
  SELECT doc_id, unnest(w) AS tok FROM words
), c AS (
  SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY doc_id, tok
), h AS (
  SELECT doc_id, cnt, {_hash_sql('tok', 0)} AS hv FROM c
), v AS (
  SELECT doc_id,
    {{votes}}
  FROM h GROUP BY doc_id
), s AS (
  SELECT doc_id, CAST({{sig}} AS BIGINT) AS simhash FROM v
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_MAXHAM}
""".replace("{votes}", votes).replace("{sig}", sig)


@query("q_dedup_simhash", _simhash_oracle())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    pairs = D.simhash_dedup_pairs(docs, "doc_id", "text", bits=_BITS, max_hamming=_MAXHAM)
    return pairs.withColumn("hamming", F.col("hamming").cast("int"))


# --------------------------------------------------------------------------
# q_dedup_ngram_jaccard — exact blocked Jaccard (block = lang), the
# quadratic baseline the sketches approximate.
# --------------------------------------------------------------------------
def _ngram_oracle() -> str:
    sh = _shingle_sql()
    h1 = "CAST('0x' || substr(md5('s:' || s), 1, 15) AS BIGINT)"
    return f"""
WITH words AS (
  {_WORDS_CTE}
), sh0 AS (
  SELECT doc_id, lang, {sh} AS sh FROM words
), hs AS (
  SELECT doc_id, lang, {h1} AS h1
  FROM (SELECT doc_id, lang, unnest(sh) AS s FROM sh0)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM hs GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM hs a JOIN hs b
    ON a.lang = b.lang AND a.h1 = b.h1 AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
  CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) >= 0.2
"""


@query("q_dedup_ngram_jaccard", _ngram_oracle())
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.2)


# --------------------------------------------------------------------------
# q_decontaminate — benchmark-leak detection: which corpus documents
# contain >= 50% of a "benchmark" doc's 3-gram shingles. Benchmark =
# every 50th document (a stand-in eval set); a doc always contains
# itself (containment 1.0), so the self-hits pin exactness and any
# other hit is a (near-)duplicate leak.
# --------------------------------------------------------------------------
def _decontaminate_oracle() -> str:
    sh = _shingle_sql()
    h1 = "CAST('0x' || substr(md5('s:' || s), 1, 15) AS BIGINT)"
    return f"""
WITH words AS (
  {_WORDS_CTE}
), sh0 AS (
  SELECT doc_id, {sh} AS sh FROM words
), hs AS (
  SELECT doc_id, {h1} AS h1
  FROM (SELECT doc_id, unnest(sh) AS s FROM sh0)
), bench AS (
  SELECT doc_id AS bench_id, h1 FROM hs WHERE doc_id % 50 = 0
), bsz AS (
  SELECT bench_id, count(*) AS nb FROM bench GROUP BY bench_id
), inter AS (
  SELECT c.doc_id AS corpus_id, b.bench_id, count(*) AS i
  FROM hs c JOIN bench b ON c.h1 = b.h1
  GROUP BY 1, 2
)
SELECT i.corpus_id, i.bench_id,
  CAST(i.i AS DOUBLE) / CAST(s.nb AS DOUBLE) AS containment
FROM inter i JOIN bsz s ON s.bench_id = i.bench_id
WHERE CAST(i.i AS DOUBLE) / CAST(s.nb AS DOUBLE) >= 0.5
"""


@query("q_decontaminate", _decontaminate_oracle())
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    return D.contamination_pairs(docs, bench, "doc_id", "text", min_containment=0.5)


# --------------------------------------------------------------------------
# q_dedup_components — near-dup pairs -> dedup clusters: connected
# components over the MinHash pair graph, component = min reachable
# doc_id (the doc a dedup pass keeps), plus the cluster size. The Spark
# side iterates min-label propagation to a fixpoint; the oracle computes
# the same fixpoint declaratively with a recursive CTE over the same
# pair set.
# --------------------------------------------------------------------------
def _components_oracle() -> str:
    return f"""
WITH RECURSIVE pairs AS (
  {_minhash_lsh_oracle()}
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), nodes AS (
  SELECT DISTINCT src AS id FROM edges
), reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.src, rr.r FROM reach rr JOIN edges e ON e.dst = rr.id
), comp AS (
  SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
)
SELECT c.doc_id, c.component, s.n AS cluster_size
FROM comp c
JOIN (SELECT component, count(*) AS n FROM comp GROUP BY component) s
  ON s.component = c.component
"""


@query("q_dedup_components", _components_oracle())
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(
        docs, "doc_id", "text", num_hashes=_NH, bands=_BANDS, threshold=0.3
    )
    comp = D.connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("id").alias("doc_id"), "component", "cluster_size"
    )


# --------------------------------------------------------------------------
# q_fuzzy_match — blocked Levenshtein pairs over document heads. The oracle
# states the unblocked predicate (same lang, length within tolerance, edit
# distance over the 40-char head <= 8); the Spark plan produces the same set
# through the (lang, length-bucket ±1) equi-join blocking — verifying that
# the blocking loses no pairs is exactly what the oracle check proves.
# --------------------------------------------------------------------------
FUZZY_ORACLE = """
WITH d AS (
  SELECT doc_id, lang, n_chars, left(text, 40) AS head FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  levenshtein(a.head, b.head) AS dist
FROM d a JOIN d b
  ON a.lang = b.lang
  AND a.doc_id < b.doc_id
  AND abs(a.n_chars - b.n_chars) <= 10
WHERE levenshtein(a.head, b.head) <= 8
"""


@query("q_fuzzy_match", FUZZY_ORACLE)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return D.fuzzy_levenshtein_pairs(
        docs, "doc_id", "text", block_col="lang", len_col="n_chars"
    )


# --------------------------------------------------------------------------
# q_contamination_matrix — corpus governance: which SOURCES share near-
# duplicate documents, and how much. Reuses the verified MinHash pair
# list (same thresholds as q_dedup_minhash_lsh) and aggregates it into an
# unordered source-pair matrix with a mean-similarity column; the oracle
# wraps the replayed pair SQL as a CTE. At scale the pair list is tiny
# next to the corpus, so the matrix costs two broadcast label joins + one
# aggregation on top of a pipeline that already ran for dedup.
# --------------------------------------------------------------------------
CONTAM_ORACLE = f"""
WITH pairs AS ({_minhash_lsh_oracle()})
SELECT least(da.source, db.source) AS source_a,
  greatest(da.source, db.source) AS source_b,
  COUNT(*) AS n_pairs,
  round(CAST(SUM(CAST(p.jaccard AS DECIMAL(18,15))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 9) AS mean_jaccard
FROM pairs p
JOIN documents da ON da.doc_id = p.id_a
JOIN documents db ON db.doc_id = p.id_b
GROUP BY 1, 2
"""


@query("q_contamination_matrix", CONTAM_ORACLE)
def q_contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(
        docs, "doc_id", "text", num_hashes=_NH, bands=_BANDS, threshold=0.3
    )
    labels = docs.select("doc_id", "source")
    lab_a = labels.select(
        F.col("doc_id").alias("id_a"), F.col("source").alias("src_a")
    )
    lab_b = labels.select(
        F.col("doc_id").alias("id_b"), F.col("source").alias("src_b")
    )
    return (
        pairs.join(F.broadcast(lab_a), "id_a")
        .join(F.broadcast(lab_b), "id_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum(F.col("jaccard").cast("decimal(18,15)")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("mean_jaccard"),
        )
    )


# --------------------------------------------------------------------------
# q_corpus_curation — the END-TO-END curation pipeline a training-data
# user actually runs, composed from the verified operators: ingest two
# sources (the second a case/whitespace-mangled copy) -> exact
# fingerprint dedup (min-id survivor) -> quality filter (>= 0.6 on the
# length/punct/stopword score) -> benchmark decontamination (drop any
# doc containing >= 50% of an eval doc's shingles) -> deterministic
# hash split -> per-(split, lang) corpus stats. The oracle replays the
# whole chain in one CTE pipeline, so the hash certifies the COMPOSITION
# (stage order, survivor identity, filter interactions), not just each
# stage alone. Every stage is a shuffle-on-key plan already audited for
# scale in its standalone query.
# --------------------------------------------------------------------------
def _curation_oracle() -> str:
    from forklift_spark.operators.text import STOPWORDS

    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    w_expr = f"string_split({NORM}, ' ')"
    return f"""
WITH src AS (
  SELECT doc_id, text, lang, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 1000000, upper(text) || '  ', lang, n_chars FROM documents
), fp AS (
  SELECT doc_id, text, lang, n_chars, md5({NORM}) AS fingerprint FROM src
), surv AS (
  SELECT f.doc_id, f.text, f.lang, f.n_chars
  FROM fp f
  JOIN (SELECT fingerprint, min(doc_id) AS keep FROM fp GROUP BY fingerprint) m
    ON f.fingerprint = m.fingerprint AND f.doc_id = m.keep
), q0 AS (
  SELECT doc_id, lang, n_chars, {w_expr} AS w,
    len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
    length(text) AS tl
  FROM surv
), q1 AS (
  SELECT doc_id, lang, n_chars,
    (CASE WHEN CAST(len(w) AS DOUBLE) >= 10 AND CAST(len(w) AS DOUBLE) <= 1000
          THEN 1.0 ELSE 0.5 END)
      * (1.0 - CAST(n_punct AS DOUBLE) / CAST(tl AS DOUBLE))
      * (0.5 + 0.5 * least(
            CAST(len(list_filter(w, x -> x IN ({sw}))) AS DOUBLE)
              / CAST(len(w) AS DOUBLE) * 5, 1.0)) AS quality
  FROM q0
), contaminated AS (
  SELECT DISTINCT corpus_id FROM ({_decontaminate_oracle()}) dd
), clean AS (
  SELECT * FROM q1
  WHERE quality >= 0.6
    AND doc_id NOT IN (SELECT corpus_id FROM contaminated)
), b AS (
  SELECT *,
    CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
      % 100 AS bucket
  FROM clean
)
SELECT
  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'valid'
       ELSE 'test' END AS split,
  lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
  min(doc_id) AS min_id
FROM b GROUP BY 1, 2
"""


@query("q_corpus_curation", _curation_oracle())
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.functions.hashing import md5_long
    from forklift_spark.operators import text as X

    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    mangled = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("  ")).alias("text"),
        "lang",
        "n_chars",
    )
    src = docs.unionByName(mangled)
    fp = src.withColumn("fingerprint", D.fingerprint("text"))
    keep = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    surv = fp.join(keep, ["fingerprint", "doc_id"]).drop("fingerprint")
    quality = surv.withColumn("quality", X.quality_score("text")).filter(
        F.col("quality") >= 0.6
    )
    # stage checkpoint: the survivor set feeds THREE consumers
    # (contamination corpus shingles, contamination sizes, the final
    # anti-join) — without it the union+dedup+quality subtree re-executes
    # per consumer (measured 6.4s -> 4.3s at sf0.1). At 100 TB this is a
    # persisted inter-stage table, exactly how a curation DAG checkpoints
    # between stages.
    quality = quality.localCheckpoint(eager=True)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    # contamination is only USED to drop quality survivors, so the corpus
    # side shingles the survivors, not all docs — ~25% less shingle work
    # here, and at 100 TB the quality gate typically drops far more. The
    # final clean set is provably identical to contaminating everything
    # (docs already dropped by quality can't re-enter), which is why the
    # oracle's full-corpus contaminated CTE still matches.
    contaminated = (
        D.contamination_pairs(quality, bench, "doc_id", "text", min_containment=0.5)
        .select(F.col("corpus_id").alias("doc_id"))
        .distinct()
    )
    clean = quality.join(contaminated, "doc_id", "left_anti")
    bucket = md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return (
        clean.select(split.alias("split"), "lang", "doc_id", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
        )
    )


# --------------------------------------------------------------------------
# q_substring_dedup — duplicated-span audit (the exact-substring-dedup
# signal of Lee et al. 2022): per document, the fraction of its 5-gram
# OCCURRENCES (multiset — positions count, unlike the Jaccard queries'
# distinct shingle sets) whose gram appears in >= 2 distinct documents.
# The oracle replays the multiset gram expansion and the same md5 gram
# identity, so the hash certifies the postings pipeline end to end.
# --------------------------------------------------------------------------
_SPAN_N = 5


def _substring_oracle() -> str:
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(_SPAN_N))
    h1 = "CAST('0x' || substr(md5('s:' || s), 1, 15) AS BIGINT)"
    return f"""
WITH words AS (
  {_WORDS_CTE}
), g AS (
  SELECT doc_id, unnest(
    CASE WHEN len(w) >= {_SPAN_N}
      THEN list_transform(range(1, len(w) - {_SPAN_N - 2}), i -> {gram})
      ELSE [norm] END) AS s
  FROM words
), h AS (
  SELECT doc_id, {h1} AS h1 FROM g
), per_gram AS (
  SELECT doc_id, h1, count(*) AS occ FROM h GROUP BY doc_id, h1
), shared AS (
  SELECT h1 FROM per_gram GROUP BY h1 HAVING count(*) >= 2
), tot AS (
  SELECT doc_id, sum(occ) AS n_grams FROM per_gram GROUP BY doc_id
), dup AS (
  SELECT p.doc_id, sum(p.occ) AS n_dup
  FROM per_gram p JOIN shared s ON s.h1 = p.h1
  GROUP BY p.doc_id
)
SELECT t.doc_id,
  CAST(t.n_grams AS BIGINT) AS n_grams,
  CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup,
  round(CAST(coalesce(d.n_dup, 0) AS DOUBLE) / CAST(t.n_grams AS DOUBLE), 9)
    AS dup_fraction
FROM tot t LEFT JOIN dup d ON d.doc_id = t.doc_id
"""


@query("q_substring_dedup", _substring_oracle())
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return D.duplicated_ngram_stats(docs, "doc_id", "text", n=_SPAN_N)


# --------------------------------------------------------------------------
# q_bloom_decontaminate — Bloom-prefiltered exact decontamination: a
# seeded-md5 Bloom filter (operators/sketch.py) built over the
# benchmark fingerprints (every 31st doc) is probed by every corpus
# fingerprint scan-side; the exact membership join runs conceptually
# only on candidates. Output pairs the filter verdict with exact
# membership per doc, so the hash certifies the no-false-negative
# guarantee (every exact member IS a candidate) and pins the exact
# false-positive set. Oracle replays the filter bit-for-bit.
# --------------------------------------------------------------------------
_BLOOM_H = (
    "CAST('0x' || substr(md5(concat('s', CAST({i} AS VARCHAR), ':', {t})), 1, 15) AS BIGINT) % 4096"
)

BLOOM_DECON_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, md5({NORM}) AS fp FROM documents
), bench AS (
  SELECT DISTINCT fp FROM keyed WHERE doc_id % 31 = 0
), hrows AS (
  SELECT unnest(range(0, 5)) AS i
), bloom AS (
  SELECT DISTINCT {_BLOOM_H.format(i='i', t='fp')} AS pos
  FROM bench CROSS JOIN hrows
), probes AS (
  SELECT DISTINCT fp FROM keyed
), addressed AS (
  SELECT fp, {_BLOOM_H.format(i='i', t='fp')} AS pos
  FROM probes CROSS JOIN hrows
), hits AS (
  SELECT a.fp, count(b.pos) = 5 AS bloom_candidate
  FROM addressed a LEFT JOIN bloom b ON b.pos = a.pos
  GROUP BY a.fp
)
SELECT k.doc_id,
  h.bloom_candidate,
  (k.fp IN (SELECT fp FROM bench)) AS exact_member
FROM keyed k JOIN hits h ON h.fp = k.fp
"""


@query("q_bloom_decontaminate", BLOOM_DECON_ORACLE)
def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.operators import sketch as K

    docs = tables.load(spark, sf_dir, "documents")
    keyed = docs.select("doc_id", D.fingerprint("text").alias("fp"))
    bench = keyed.filter(F.col("doc_id") % 31 == 0)
    bloom = K.bloom_build(bench.select("fp"), "fp", n_hashes=5, n_bits=4096)
    probed = K.bloom_probe(bloom, keyed.select("fp"), "fp", n_hashes=5, n_bits=4096)
    exact = bench.select("fp").distinct().withColumn("_m", F.lit(True))
    return (
        keyed.join(probed, "fp", "left")
        .join(F.broadcast(exact), "fp", "left")
        .select(
            "doc_id",
            F.coalesce("bloom_candidate", F.lit(False)).alias("bloom_candidate"),
            F.coalesce("_m", F.lit(False)).alias("exact_member"),
        )
    )


# --------------------------------------------------------------------------
# q_incremental_curation — day-2 of the curation pipeline: a new shard
# (delta) dedupes against the ALREADY-CURATED corpus without rescanning
# it. The corpus ships as a persisted fingerprint store (bucketed by
# fingerprint via write_bucketed, written once and reused across runs —
# the signature-table discipline), so the corpus side of the dup join
# never shuffles; within-delta dups resolve by min-id survivor. Status
# precedence: corpus dup > in-delta dup > kept. The oracle replays the
# store from the closed-form corpus split and the full decision.
# --------------------------------------------------------------------------
INC_CURATION_ORACLE = f"""
WITH fps AS (
  SELECT doc_id, md5({NORM}) AS fp FROM documents
), corpus AS (
  SELECT DISTINCT fp FROM fps WHERE doc_id % 3 <> 0
), delta AS (
  SELECT doc_id, fp FROM fps WHERE doc_id % 3 = 0
), firsts AS (
  SELECT fp, min(doc_id) AS first_id FROM delta GROUP BY fp
)
SELECT d.doc_id, d.fp,
  CASE WHEN c.fp IS NOT NULL THEN 'dup_vs_corpus'
       WHEN d.doc_id <> f.first_id THEN 'dup_in_delta'
       ELSE 'kept' END AS status
FROM delta d
LEFT JOIN corpus c ON c.fp = d.fp
JOIN firsts f ON f.fp = d.fp
"""


@query("q_incremental_curation", INC_CURATION_ORACLE)
def q_incremental_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from forklift_spark.operators.skew import write_bucketed

    docs = tables.load(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id", D.fingerprint("text").alias("fp")
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    store = f"corpus_fps_{tag}"
    if not spark.catalog.tableExists(store):
        write_bucketed(
            corpus.select(D.fingerprint("text").alias("fp")).distinct(),
            store, "fp", n_buckets=16,
        )
    corpus_fps = spark.table(store).withColumn("_in_corpus", F.lit(True))
    firsts = delta.groupBy("fp").agg(F.min("doc_id").alias("first_id"))
    return (
        delta.join(corpus_fps, "fp", "left")
        .join(firsts, "fp")
        .select(
            "doc_id", "fp",
            F.when(F.col("_in_corpus"), "dup_vs_corpus")
            .when(F.col("doc_id") != F.col("first_id"), "dup_in_delta")
            .otherwise("kept")
            .alias("status"),
        )
    )


# --------------------------------------------------------------------------
# q_set_similarity_join — EXACT Jaccard >= 1/2 self-join via prefix
# filtering (PPJoin family): candidates come only from each set's
# rarest-token prefix, yet the result is provably identical to the
# all-pairs join. The corpus is augmented with junk-extended copies
# (doc_id + 10^6; k = n_distinct_words + doc_id%2 unique junk tokens)
# so pairs straddle the threshold from both sides: long docs keep
# jaccard(original, extended) above 1/2, short ones fall below. The
# ORACLE REPLAYS THE NAIVE ALL-PAIRS JOIN — a hash match certifies the
# prefix filter lost nothing (the property LSH cannot offer).
# --------------------------------------------------------------------------
_PJ_NUM, _PJ_DEN = 1, 2
# 4-gram shingles: the fixture vocabulary is ~30 words, so 3-gram doc
# frequencies grow linearly with corpus size and candidate pairs grow
# quadratically — the dense regime NO corpus a set-similarity join
# targets. 4-grams (810k possible) keep rare-token df flat across SF,
# the sparse regime the prefix filter is built for.
_PJ_N = 4


def _set_similarity_oracle() -> str:
    sh = _shingle_sql(_PJ_N)
    h1 = "CAST('0x' || substr(md5('s:' || s), 1, 15) AS BIGINT)"
    return f"""
WITH base AS (
  SELECT doc_id, {NORM} AS norm,
         len(list_distinct(string_split({NORM}, ' '))) AS nw
  FROM documents
), src AS (
  SELECT doc_id, norm FROM base
  UNION ALL
  SELECT doc_id + 1000000,
         norm || ' ' || array_to_string(
           list_transform(range(1, nw + 1 + doc_id % 2),
                          i -> 'zq' || doc_id || 'x' || i), ' ')
  FROM base
), words AS (
  SELECT doc_id, norm, string_split(norm, ' ') AS w FROM src
), sh0 AS (
  SELECT doc_id, {sh} AS sh FROM words
), hs AS (
  SELECT doc_id, {h1} AS h1
  FROM (SELECT doc_id, unnest(sh) AS s FROM sh0)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM hs GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM hs a JOIN hs b ON a.h1 = b.h1 AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, CAST(i.i AS BIGINT) AS inter,
  CAST(sa.n + sb.n - i.i AS BIGINT) AS uni,
  CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE i.i * {_PJ_DEN} >= (sa.n + sb.n - i.i) * {_PJ_NUM}
"""


@query("q_set_similarity_join", _set_similarity_oracle())
def q_set_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    norm = normalize_text("text")
    base = docs.select(
        "doc_id",
        norm.alias("norm"),
        F.size(F.array_distinct(F.split(norm, " "))).alias("nw"),
    )
    junk = F.array_join(
        F.transform(
            F.sequence(F.lit(1), (F.col("nw") + F.col("doc_id") % 2).cast("int")),
            lambda i: F.concat(
                F.lit("zq"), F.col("doc_id").cast("string"), F.lit("x"),
                i.cast("string"),
            ),
        ),
        " ",
    )
    mut = base.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat("norm", F.lit(" "), junk).alias("text"),
    )
    src = base.select("doc_id", F.col("norm").alias("text")).unionByName(mut)
    return D.prefix_jaccard_pairs(
        src, "doc_id", "text", shingle_n=_PJ_N, num=_PJ_NUM, den=_PJ_DEN
    )


# --------------------------------------------------------------------------
# q_stream_dedup_exact — ONLINE exact dedup EXECUTED IN THE STREAMING
# ENGINE: the corpus (plus case-mangled and whitespace-mangled copies,
# so duplicates land in DIFFERENT micro-batches) is staged as 6 files
# read 2-per-trigger; each foreachBatch dedups within itself (min-id
# per fingerprint) and anti-joins a PERSISTENT fingerprint store before
# accepting — state grows with the accepted corpus, never the stream.
# The oracle certifies the online invariant the batches must preserve:
# every fingerprint group is accepted EXACTLY ONCE no matter how its
# copies were split across batches (a missing history check re-accepts
# a later-batch duplicate and breaks n_accepted); n_seen certifies no
# row was dropped. Outputs are arrival-order-independent by
# construction, so the check is deterministic under any file order.
# --------------------------------------------------------------------------
STREAM_DEDUP_ORACLE = f"""
WITH src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, upper(text) || '  ' FROM documents
  UNION ALL
  SELECT doc_id + 2000000, '  ' || text FROM documents WHERE doc_id % 2 = 0
), fp AS (
  SELECT doc_id, md5({NORM}) AS fingerprint FROM src
)
SELECT fingerprint,
  CAST(count(*) AS BIGINT) AS n_seen,
  CAST(1 AS BIGINT) AS n_accepted
FROM fp GROUP BY fingerprint
"""


@query("q_stream_dedup_exact", STREAM_DEDUP_ORACLE)
def q_stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    src_df = (
        docs.unionByName(
            docs.select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat(F.upper("text"), F.lit("  ")).alias("text"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 2 == 0).select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(F.lit("  "), F.col("text")).alias("text"),
            )
        )
    )
    src = tempfile.mkdtemp(prefix="fk_stream_dedup_src_")
    src_df.repartition(6).write.mode("overwrite").parquet(src)
    store_root = tempfile.mkdtemp(prefix="fk_stream_dedup_state_")
    accepted_path = os.path.join(store_root, "accepted")
    seen_path = os.path.join(store_root, "seen")

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        s = batch_df.sparkSession
        fp = batch_df.withColumn("fingerprint", D.fingerprint("text"))
        winners = fp.groupBy("fingerprint").agg(
            F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("cnt")
        )
        # per-epoch OVERWRITE directories: foreachBatch is at-least-once,
        # so a retried epoch must replace its own output, never append a
        # second copy (double-counted n_seen / re-accepted winners)
        winners.select("fingerprint", "cnt").write.mode("overwrite").parquet(
            f"{seen_path}/epoch={epoch_id}"
        )
        fresh = winners.select("fingerprint", "doc_id")
        prior = [
            f"{accepted_path}/epoch={e}"
            for e in range(epoch_id)
            if os.path.exists(f"{accepted_path}/epoch={e}")
        ]
        if prior:
            hist = s.read.parquet(*prior).select("fingerprint")
            fresh = fresh.join(hist, "fingerprint", "left_anti")
        fresh.write.mode("overwrite").parquet(f"{accepted_path}/epoch={epoch_id}")

    stream = (
        spark.readStream.schema(src_df.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    from forklift_spark.streaming.jobs import (
        scoped_shuffle_partitions,
        stream_state_partitions,
    )

    with scoped_shuffle_partitions(
        spark, stream_state_partitions(spark, src)
    ):
        q = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", os.path.join(store_root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), \
            "stream did not finish; store would be partial"
    seen = (
        spark.read.parquet(seen_path)
        .groupBy("fingerprint")
        .agg(F.sum("cnt").cast("bigint").alias("n_seen"))
    )
    acc = (
        spark.read.parquet(accepted_path)
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_accepted"))
    )
    return seen.join(acc, "fingerprint").select("fingerprint", "n_seen", "n_accepted")


# --------------------------------------------------------------------------
# q_entity_resolution — record linkage to GOLDEN RECORDS (the MDM
# pipeline): a customer master plus an 'import' feed of typo'd
# duplicates (name + 'x', same balance) resolves to one entity per
# real customer. Three verified operators composed end to end —
# (1) PassJoin edit-distance matching under the SEMANTIC constraint
# that matches share (nation, $100-band) — block_cols folds the
# constraint into the segment equi-join key, so the fixed-cardinality
# (nation, band) cell never becomes a quadratic block (SCALE_SF1_r6
# measured the previous equi-block matcher at 14.9x for 10x rows;
# candidates here are O(75 N + true matches) at any density). The
# oracle states the UNBLOCKED predicate, so the hash certifies the
# candidate scheme lost no match. (2) pointer-doubling connected
# components over the match graph (oracle: recursive CTE fixpoint),
# (3) survivorship: min-key canonical record, per-entity record/source
# counts, max balance. The oracle replays the full chain — certifying
# the COMPOSITION, like q_corpus_curation does for curation.
# --------------------------------------------------------------------------
ENTITY_ORACLE = """
WITH RECURSIVE src AS (
  SELECT c_custkey AS rid, c_name AS name, c_nationkey AS nat,
    CAST(FLOOR(c_acctbal / 100.0) AS BIGINT) AS band, c_acctbal AS bal,
    'crm' AS source
  FROM customer
  UNION ALL
  SELECT c_custkey + 1000000, c_name || 'x', c_nationkey,
    CAST(FLOOR(c_acctbal / 100.0) AS BIGINT), c_acctbal, 'import'
  FROM customer WHERE c_custkey % 5 = 0
), pairs AS (
  SELECT a.rid AS id_a, b.rid AS id_b
  FROM src a JOIN src b
    ON a.nat = b.nat AND a.band = b.band AND a.rid < b.rid
  WHERE levenshtein(left(a.name, 40), left(b.name, 40)) <= 2
), edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
), nodes AS (SELECT DISTINCT s AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.s, rr.r FROM reach rr JOIN edges e ON e.d = rr.id
), comp AS (
  SELECT id, min(r) AS component FROM reach GROUP BY id
), ent AS (
  SELECT coalesce(c.component, s.rid) AS entity_id, s.*
  FROM src s LEFT JOIN comp c ON c.id = s.rid
), gold AS (
  SELECT entity_id, CAST(count(*) AS BIGINT) AS n_records,
    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
    max(bal) AS max_bal
  FROM ent GROUP BY entity_id
)
SELECT g.entity_id, s.name AS canonical_name, g.n_records, g.n_sources,
       g.max_bal
FROM gold g JOIN src s ON s.rid = g.entity_id
"""


@query("q_entity_resolution", ENTITY_ORACLE)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tables.load(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("rid"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.floor(F.col("c_acctbal") / 100.0).cast("bigint").alias("band"),
        F.col("c_acctbal").alias("bal"),
        F.lit("crm").alias("source"),
    )
    feed = cust.filter(F.col("c_custkey") % 5 == 0).select(
        (F.col("c_custkey") + 1000000).alias("rid"),
        F.concat(F.col("c_name"), F.lit("x")).alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.floor(F.col("c_acctbal") / 100.0).cast("bigint").alias("band"),
        F.col("c_acctbal").alias("bal"),
        F.lit("import").alias("source"),
    )
    src = base.unionByName(feed).withColumn(
        "blk", F.concat(F.col("nat").cast("string"), F.lit(":"), F.col("band"))
    )
    src = src.persist()  # matching + entity rollup + canonical join-back
    pairs = D.passjoin_pairs(
        src, "rid", "name", max_dist=2, prefix_len=40, block_cols=["blk"]
    )
    comp = D.connected_components(pairs)
    ent = src.join(
        comp.select(F.col("id").alias("rid"), "component"), "rid", "left"
    ).withColumn("entity_id", F.coalesce(F.col("component"), F.col("rid")))
    gold = ent.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_records"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.max("bal").alias("max_bal"),
    )
    canon = src.select(
        F.col("rid").alias("entity_id"), F.col("name").alias("canonical_name")
    )
    return gold.join(canon, "entity_id").select(
        "entity_id", "canonical_name", "n_records", "n_sources", "max_bal"
    )


# --------------------------------------------------------------------------
# q_line_dedup — C4-style LINE-level deduplication with document
# reassembly (Raffel et al. 2020 drop repeated lines across the corpus;
# Lee et al. 2022 measure how much that removes): documents are chunked
# into deterministic 8-word segments ("lines" for a corpus with no
# newlines), each segment occurrence is fingerprinted, and for every
# fingerprint exactly ONE canonical occurrence survives (min packed
# (doc_id, seg_idx) — the same min-survivor discipline as
# q_dedup_exact, made total by packing so both engines agree without
# struct-min semantics; the 1e6 multiplier keeps packing injective up
# to 8M-word documents). Documents are REASSEMBLED from their surviving
# segments in order — the output is the cleaned corpus, not just an
# audit. Scale: one fingerprint-keyed shuffle (8-byte md5-derived
# keys), canonical table joins back broadcast-or-keyed, reassembly is a
# per-doc sorted collect — no all-pairs anything.
# --------------------------------------------------------------------------
_SEG_WORDS = 8

LINE_DEDUP_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split({NORM}, ' ') AS w FROM documents
), segs AS (
  SELECT doc_id, s AS seg_idx,
    doc_id * 1000000 + s AS pk,
    array_to_string(list_slice(w, s * {_SEG_WORDS} + 1, s * {_SEG_WORDS} + {_SEG_WORDS}), ' ') AS seg
  FROM (SELECT doc_id, w, unnest(range(0, (len(w) + {_SEG_WORDS} - 1) // {_SEG_WORDS})) AS s FROM w)
), canon AS (
  SELECT md5(seg) AS fp, min(pk) AS cpk FROM segs GROUP BY 1
), marked AS (
  SELECT s.doc_id, s.seg_idx, s.seg, (s.pk = c.cpk) AS keep
  FROM segs s JOIN canon c ON md5(s.seg) = c.fp
)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_segments,
  CAST(count(*) FILTER (keep) AS BIGINT) AS n_kept,
  coalesce(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (keep), '') AS cleaned_text
FROM marked GROUP BY doc_id
"""


@query("q_line_dedup", LINE_DEDUP_ORACLE)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.operators.text import words

    docs = tables.load(spark, sf_dir, "documents")
    w = docs.select("doc_id", words("text").alias("w"))
    segs = (
        w.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, (size(w) - 1) div {_SEG_WORDS}), "
                    f"s -> array_join(slice(w, s * {_SEG_WORDS} + 1, {_SEG_WORDS}), ' '))"
                )
            ).alias("seg_idx", "seg"),
        )
        .withColumn("pk", F.col("doc_id") * 1000000 + F.col("seg_idx"))
        .withColumn("fp", F.md5("seg"))
    )
    canon = segs.groupBy("fp").agg(F.min("pk").alias("cpk"))
    marked = segs.join(canon, "fp").withColumn("keep", F.col("pk") == F.col("cpk"))
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum(F.col("keep").cast("bigint")).cast("bigint").alias("n_kept"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(F.col("keep"), F.struct("seg_idx", "seg")))
                    ),
                    lambda x: x["seg"],
                ),
                " ",
            ),
            F.lit(""),
        ).alias("cleaned_text"),
    )


# --------------------------------------------------------------------------
# q_dedup_recall_eval — measured quality of the MinHash-LSH candidate
# stage itself: candidate recall and precision against EXACT
# ground-truth near-duplicate pairs (shingle Jaccard >= 0.3 over ALL
# pairs sharing >= 1 shingle — pairs sharing none have J = 0 and
# cannot reach any positive threshold, so the inverted-index self-join
# enumerates the complete truth set). This is the dedup twin of
# q_ann_recall: it certifies the banding s-curve empirically — the
# number the (1/b)^(1/r) threshold math PREDICTS — where the dedup
# queries themselves only certify the post-verify output. Truth at
# scale runs on a sample (the eval harness, not the pipeline); here
# the corpus is the sample. The oracle replays the SAME sketch CTEs
# q_dedup_minhash_lsh certifies (_minhash_ctes) plus the naive truth
# join. Single-row output, integer bp metrics.
# --------------------------------------------------------------------------
def _dedup_recall_oracle() -> str:
    return f"""{_minhash_ctes()}, tr AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS i
  FROM hashed x JOIN hashed y ON y.h1 = x.h1 AND x.doc_id < y.doc_id
  GROUP BY 1, 2
), truth AS (
  SELECT t.id_a, t.id_b
  FROM tr t JOIN sizes sa ON sa.doc_id = t.id_a
            JOIN sizes sb ON sb.doc_id = t.id_b
  WHERE CAST(t.i AS DOUBLE) / CAST(sa.n + sb.n - t.i AS DOUBLE) >= 0.3
), m AS (
  SELECT count(*) AS n_matched FROM truth JOIN cand USING (id_a, id_b)
), nt AS (SELECT count(*) AS n_truth FROM truth),
nc AS (SELECT count(*) AS n_cand FROM cand)
SELECT CAST(nt.n_truth AS BIGINT) AS n_truth,
  CAST(nc.n_cand AS BIGINT) AS n_cand,
  CAST(m.n_matched AS BIGINT) AS n_matched,
  CAST(10000 * m.n_matched // nt.n_truth AS BIGINT) AS recall_bp,
  CAST(10000 * m.n_matched // nc.n_cand AS BIGINT) AS precision_bp
FROM nt, nc, m
"""


@query("q_dedup_recall_eval", _dedup_recall_oracle())
def q_dedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = tables.load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    hashed = D.hashed_shingles(docs, "doc_id", "text", 3).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sizes = hashed.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = hashed.select(F.col("doc_id").alias("id_a"), "h1")
    b = hashed.select(F.col("doc_id").alias("id_b"), "h1")
    inter = (
        a.join(b, "h1")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    truth = (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .filter(
            F.col("i").cast("double")
            / (F.col("na") + F.col("nb") - F.col("i")).cast("double")
            >= 0.3
        )
        .select("id_a", "id_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sigs = D.minhash_signatures(hashed, "doc_id", _NH)
    cand = D.lsh_candidate_pairs(sigs, "doc_id", _BANDS, _ROWS).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_cand"))
    m = truth.join(cand, ["id_a", "id_b"]).agg(F.count(F.lit(1)).alias("n_matched"))
    return (
        nt.crossJoin(F.broadcast(nc))  # three 1-row scalar frames
        .crossJoin(F.broadcast(m))
        .select(
            F.col("n_truth").cast("bigint").alias("n_truth"),
            F.col("n_cand").cast("bigint").alias("n_cand"),
            F.col("n_matched").cast("bigint").alias("n_matched"),
            F.expr("10000 * n_matched div n_truth").alias("recall_bp"),
            F.expr("10000 * n_matched div n_cand").alias("precision_bp"),
        )
    )


# --------------------------------------------------------------------------
# q_containment_dedup — DIRECTIONAL containment audit: |A∩B|/|A| over
# shingle sets, the asymmetric cousin of Jaccard that near-dup
# pipelines miss — a short doc quoted wholesale inside a long one has
# tiny Jaccard but containment ~1. Pairs come from the inverted-index
# self-join on shared shingles (complete for any positive threshold:
# no shared shingle => containment 0); both directions report in
# integer basis points (i div |A| — no doubles), kept when either
# direction >= 80%. At 100 TB the candidate step prunes
# ubiquitous shingles by document frequency before the join (the
# postings-length cap every inverted-index join uses); the full join
# here IS the exact semantics the capped one approximates.
# --------------------------------------------------------------------------
def _containment_oracle() -> str:
    sh = _shingle_sql()
    return f"""
WITH words AS (
  {_WORDS_CTE}
), sh0 AS (
  SELECT doc_id, {sh} AS sh FROM words
), sh_exp AS (
  SELECT doc_id, md5('s:' || unnest(sh)) AS d FROM sh0
), hashed AS (
  SELECT doc_id, CAST('0x' || substr(d, 1, 15) AS BIGINT) AS h1 FROM sh_exp
), sizes AS (
  SELECT doc_id, count(*) AS n FROM hashed GROUP BY doc_id
), inter AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS i
  FROM hashed x JOIN hashed y ON y.h1 = x.h1 AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, CAST(i.i AS BIGINT) AS inter,
  CAST(sa.n AS BIGINT) AS na, CAST(sb.n AS BIGINT) AS nb,
  CAST(10000 * i.i // sa.n AS BIGINT) AS cont_ab_bp,
  CAST(10000 * i.i // sb.n AS BIGINT) AS cont_ba_bp
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE 10000 * i.i // sa.n >= 8000 OR 10000 * i.i // sb.n >= 8000
"""


@query("q_containment_dedup", _containment_oracle())
def q_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = tables.load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    hashed = D.hashed_shingles(docs, "doc_id", "text", 3).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sizes = hashed.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = hashed.select(F.col("doc_id").alias("id_a"), "h1")
    b = hashed.select(F.col("doc_id").alias("id_b"), "h1")
    inter = (
        a.join(b, "h1")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("i").cast("bigint").alias("inter"),
            F.col("na").cast("bigint").alias("na"),
            F.col("nb").cast("bigint").alias("nb"),
            F.expr("10000 * i div na").alias("cont_ab_bp"),
            F.expr("10000 * i div nb").alias("cont_ba_bp"),
        )
        .filter((F.col("cont_ab_bp") >= 8000) | (F.col("cont_ba_bp") >= 8000))
    )


# --------------------------------------------------------------------------
# q_passjoin_pairs — LOSSLESS edit-distance self-join with NO blocking
# key (PassJoin, Li/Deng/Feng VLDB 2011): pigeonhole segment candidates
# + thresholded levenshtein verify. The scale answer to SCALE_SF1_r6's
# one superlinear row — entity resolution's fixed-cardinality blocking
# makes candidates grow quadratically with density; PassJoin's shuffle
# is O((2t+1)^2(t+1) * N) tiny segment keys at any density. The oracle
# replays the join as a length-windowed quadratic levenshtein (DuckDB's
# native levenshtein), so the hash certifies EXACT pair recall — the
# only failure mode of candidate pruning. Input is a 30% customer
# slice plus two mutated feeds (ed=1 suffix, ed<=2 tail rewrite);
# base-base pairs (order keys differing in <=2 digit positions) keep
# the matcher honest beyond the planted pairs.
# --------------------------------------------------------------------------
PASSJOIN_ORACLE = """
WITH pool AS (
  SELECT c_custkey AS rid, c_name AS name
  FROM customer WHERE c_custkey % 10 < 3
  UNION ALL
  SELECT c_custkey + 10000000, c_name || 'q'
  FROM customer WHERE c_custkey % 10 < 3 AND c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 20000000,
         substr(c_name, 1, length(c_name) - 2) || 'zz'
  FROM customer WHERE c_custkey % 10 < 3 AND c_custkey % 11 = 0
),
pairs AS (
  SELECT a.rid AS id_a, b.rid AS id_b,
         levenshtein(a.name, b.name) AS dist
  FROM pool a JOIN pool b
    ON a.rid < b.rid
   AND abs(length(a.name) - length(b.name)) <= 2
)
SELECT CAST(dist AS BIGINT) AS dist,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(id_a + id_b) AS BIGINT) AS id_sum
FROM pairs
WHERE dist <= 2
GROUP BY dist
ORDER BY dist
"""


@query("q_passjoin_pairs", PASSJOIN_ORACLE)
def q_passjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tables.load(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 10 < 3
    )
    base = cust.select(F.col("c_custkey").alias("rid"), F.col("c_name").alias("name"))
    feed1 = cust.filter(F.col("c_custkey") % 7 == 0).select(
        (F.col("c_custkey") + 10000000).alias("rid"),
        F.concat(F.col("c_name"), F.lit("q")).alias("name"),
    )
    feed2 = cust.filter(F.col("c_custkey") % 11 == 0).select(
        (F.col("c_custkey") + 20000000).alias("rid"),
        F.concat(
            F.expr("substring(c_name, 1, length(c_name) - 2)"), F.lit("zz")
        ).alias("name"),
    )
    pool = base.unionByName(feed1).unionByName(feed2)
    pairs = D.passjoin_pairs(pool, "rid", "name", max_dist=2)
    return (
        pairs.groupBy(F.col("dist").cast("bigint").alias("dist"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("id_a") + F.col("id_b")).cast("bigint").alias("id_sum"),
        )
        .orderBy("dist")
    )


# --------------------------------------------------------------------------
# q_exact_substr_dedup — EXACT sliding-window substring-span dedup
# (Lee et al. 2022 ExactSubstr, shuffle-native): every word span of
# >= 10 tokens that repeats anywhere in the corpus — at ANY alignment,
# within or across documents — keeps one canonical occurrence (min
# packed (doc, pos), the q_line_dedup survivor discipline) and is
# removed everywhere else; overlapping duplicated 10-grams union into
# longer removed spans. Documents are reassembled from surviving
# tokens — the output is the cleaned corpus. This is the stronger,
# alignment-free sibling of q_line_dedup's fixed 8-word segmentation
# (which misses a repeated span that straddles a segment boundary).
# Scale: md5(k-gram)-keyed shuffle, coverage explode bounded by
# k x duplicate occurrences, one (doc, pos) join — no all-pairs, no
# suffix array (the paper's single-machine structure). The oracle
# replays the full chain in SQL, so the value hash certifies window
# generation, survivor choice, span union, AND reassembly together.
# --------------------------------------------------------------------------
_SPAN_K = 10

EXACT_SUBSTR_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split({NORM}, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, s AS pos, doc_id * 1000000 + s AS pk,
         array_to_string(list_slice(w, s + 1, s + {_SPAN_K}), ' ') AS g
  FROM (SELECT doc_id, w, unnest(range(0, len(w) - {_SPAN_K} + 1)) AS s
        FROM w WHERE len(w) >= {_SPAN_K})
), canon AS (
  SELECT md5(g) AS fp, min(pk) AS cpk, count(*) AS n FROM grams GROUP BY 1
), cov AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT g.doc_id, unnest(range(g.pos, g.pos + {_SPAN_K})) AS pos
    FROM grams g JOIN canon c ON md5(g.g) = c.fp
    WHERE c.n >= 2 AND g.pk <> c.cpk
  )
), toks AS (
  SELECT doc_id, p AS pos, w[p + 1] AS word
  FROM (SELECT doc_id, w, unnest(range(0, len(w))) AS p FROM w)
)
SELECT t.doc_id,
  CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(count(*) FILTER (c.pos IS NULL) AS BIGINT) AS n_kept,
  coalesce(string_agg(t.word, ' ' ORDER BY t.pos) FILTER (c.pos IS NULL), '')
    AS cleaned_text
FROM toks t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
GROUP BY t.doc_id
"""


@query("q_exact_substr_dedup", EXACT_SUBSTR_ORACLE)
def q_exact_substr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return D.exact_span_dedup(docs, "doc_id", "text", k=_SPAN_K)
