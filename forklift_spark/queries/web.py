"""Web-curation queries: URL parsing/canonicalization/dedup, domain
statistics, HTML stripping — the crawl-hygiene stages that precede every
text-dedup/quality pass in a web-derived training pipeline.

The documents table stands in for a crawl: ``_url_expr`` attaches a
deterministic closed-form URL per doc (subdomain/TLD/case/port/tracking
params all vary by doc_id), and the HTML query wraps the doc text in a
deterministic page skeleton. The operators under test are the REAL
ones — Spark ``parse_url``, regex canonicalization, registrable-domain
extraction, tag stripping (functions/web.py) — while the oracles replay
the ground truth from the closed form (URL components) or the same
regex pipeline in an independent engine (HTML). Everything is JVM
built-ins: these passes run at scan speed, no Python, no shuffle except
the final aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from forklift_spark import tables
from forklift_spark.functions import web as W
from forklift_spark.queries import query

# --------------------------------------------------------------------------
# Closed-form fake URL, rendered identically in Spark and DuckDB SQL:
#   sub  = (www|cdn|blog)[doc_id%3]      tld = (com|org|co.uk|io)[doc_id%4]
#   hostl = sub.source.tld              host = upper(hostl) if doc_id%5=0
#   port = ':443' if doc_id%11=0        path = /p/<doc_id%20>
#   query = even: utm_source=feed&sid=<id%97>   odd: ref=<id%7>&utm_campaign=x
# Canonical form (tracking params stripped, host lowercased, port dropped):
#   https://hostl/p/<id%20>             + '?ref=<id%7>' on odd ids only
# --------------------------------------------------------------------------
_SUB = "CASE doc_id % 3 WHEN 0 THEN 'www' WHEN 1 THEN 'cdn' ELSE 'blog' END"
_TLD = "CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org' WHEN 2 THEN 'co.uk' ELSE 'io' END"
_HOSTL = f"concat({_SUB}, '.', source, '.', {_TLD})"
_HOST = f"CASE WHEN doc_id % 5 = 0 THEN upper({_HOSTL}) ELSE {_HOSTL} END"
_PORT = "CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END"
_PATH = "concat('/p/', CAST(doc_id % 20 AS STRING))"
_QUERYSTR = (
    "CASE WHEN doc_id % 2 = 0 "
    "THEN concat('utm_source=feed&sid=', CAST(doc_id % 97 AS STRING)) "
    "ELSE concat('ref=', CAST(doc_id % 7 AS STRING), '&utm_campaign=x') END"
)
_URL = f"concat('https://', {_HOST}, {_PORT}, {_PATH}, '?', {_QUERYSTR})"

# DuckDB renders the same closed form (CAST AS STRING -> AS VARCHAR).
_SUB_SQL = _SUB
_TLD_SQL = _TLD
_HOSTL_SQL = _HOSTL
_HOST_SQL = _HOST
_PATH_SQL = _PATH.replace("AS STRING", "AS VARCHAR")
_QUERYSTR_SQL = _QUERYSTR.replace("AS STRING", "AS VARCHAR")


def _with_url(df: DataFrame) -> DataFrame:
    return df.withColumn("url", F.expr(_URL))


# --------------------------------------------------------------------------
# q_url_parse — REAL URL decomposition via Spark's parse_url (java.net
# semantics: HOST excludes the port, QUERY excludes the '?'). The oracle
# replays each component from the closed form, so the hash certifies the
# parser against ground truth, including mixed-case hosts and explicit
# default ports.
# --------------------------------------------------------------------------
URL_PARSE_ORACLE = f"""
SELECT doc_id,
  'https' AS scheme,
  {_HOST_SQL} AS host,
  {_PATH_SQL} AS path,
  {_QUERYSTR_SQL} AS query_str
FROM documents
"""


@query("q_url_parse", URL_PARSE_ORACLE)
def q_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_url(tables.load(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        W.url_part("url", "PROTOCOL").alias("scheme"),
        W.url_part("url", "HOST").alias("host"),
        W.url_part("url", "PATH").alias("path"),
        W.url_part("url", "QUERY").alias("query_str"),
    )


# --------------------------------------------------------------------------
# q_url_dedup — URL-level dedup on the canonical form: host lowercased,
# default port dropped (parse_url HOST), tracking params (utm_*, sid,
# fbclid, gclid) stripped, empty query removed. Survivor = min doc_id
# per canonical URL — the crawl-dedup pass that runs before any content
# dedup. Oracle constructs the canonical form directly from the closed
# form and aggregates, certifying the canonicalizer end to end.
# Scale: one hash aggregation on the canonical string; no joins.
# --------------------------------------------------------------------------
URL_DEDUP_ORACLE = f"""
SELECT
  concat('https://', {_HOSTL_SQL}, {_PATH_SQL},
         CASE WHEN doc_id % 2 = 1 THEN concat('?ref=', CAST(doc_id % 7 AS VARCHAR)) ELSE '' END
  ) AS canonical_url,
  CAST(min(doc_id) AS BIGINT) AS survivor_id,
  CAST(count(*) AS BIGINT) AS n_dupes
FROM documents
GROUP BY 1
"""


@query("q_url_dedup", URL_DEDUP_ORACLE)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_url(tables.load(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", W.canonicalize_url("url").alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


# --------------------------------------------------------------------------
# q_domain_stats — per registrable domain (public-suffix aware:
# www.src5.co.uk -> src5.co.uk) corpus statistics: docs, distinct hosts,
# characters, languages. The oracle derives the domain from the closed
# form (source.tld), certifying the suffix-aware extraction including
# the two-level co.uk case and mixed-case hosts.
# Scale: map-side combine then one small-key aggregation (domains are
# low-cardinality); runs on metadata columns only, text never loaded.
# --------------------------------------------------------------------------
DOMAIN_STATS_ORACLE = f"""
SELECT concat(source, '.', {_TLD_SQL}) AS domain,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT {_SUB_SQL}) AS BIGINT) AS n_hosts,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM documents
GROUP BY 1
"""


@query("q_domain_stats", DOMAIN_STATS_ORACLE)
def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_url(tables.load(spark, sf_dir, "documents"))
    host = W.url_part("url", "HOST")
    return (
        docs.select(
            "doc_id", "n_chars", "lang",
            W.registered_domain(host).alias("domain"),
            F.lower(host).alias("host_lc"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("host_lc").alias("n_hosts"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


# --------------------------------------------------------------------------
# q_html_strip — boilerplate removal: the doc text wrapped in a
# deterministic page skeleton, stripped back to visible text with the
# engine-portable tag regex, plus markup accounting. The oracle runs the
# SAME regex pipeline in DuckDB (RE2), so the hash certifies that the
# Java-regex implementation agrees with an independent engine on real
# corpus text.
# --------------------------------------------------------------------------
_HTML = (
    "concat('<html><head><title>', source, '</title></head><body><h1>Doc ', "
    "CAST(doc_id AS STRING), '</h1><p>', text, "
    "'</p><img src=\"x.png\"/><div class=\"meta\">', lang, '</div></body></html>')"
)
_HTML_SQL = _HTML.replace("AS STRING", "AS VARCHAR")

HTML_STRIP_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_HTML_SQL} AS html FROM documents
), s AS (
  SELECT doc_id, html,
    trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'), ' +', ' ', 'g')) AS clean,
    length(html) - length(regexp_replace(html, '<[^>]*>', '', 'g')) AS markup
  FROM h
)
SELECT doc_id,
  CAST(length(clean) AS BIGINT) AS clean_len,
  CAST(markup AS BIGINT) AS markup_chars,
  round(CAST(markup AS DOUBLE) / length(html), 9) AS markup_ratio,
  md5(clean) AS clean_md5
FROM s
"""


@query("q_html_strip", HTML_STRIP_ORACLE)
def q_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    h = docs.select("doc_id", F.expr(_HTML).alias("html"))
    s = h.select(
        "doc_id",
        "html",
        W.strip_html("html").alias("clean"),
        W.markup_chars("html").alias("markup"),
    )
    return s.select(
        "doc_id",
        F.length("clean").cast("long").alias("clean_len"),
        F.col("markup").cast("long").alias("markup_chars"),
        F.round(F.col("markup").cast("double") / F.length("html"), 9).alias("markup_ratio"),
        F.md5(F.col("clean")).alias("clean_md5"),
    )


# --------------------------------------------------------------------------
# q_warc_extract — REAL web-archive ingest: every row carries a genuine
# WARC/1.0 file (warcinfo + request + response records, built by
# attach_fake_warc) and the operator walks the records
# Content-Length-driven, parses the HTTP response, and emits the fields
# a web-curation pipeline starts from. The payload's response body is a
# closed form of the source row, so the oracle replays URI, status,
# content type, record count, and the body byte-for-byte (md5) WITHOUT
# parsing the container — the hash certifies the parser walk + HTTP
# split end to end. Arrow mapInPandas, no shuffle (see
# functions/warccodec.py for the at-scale record-splitting note).
# --------------------------------------------------------------------------
WARC_ORACLE = """
SELECT doc_id,
  CAST(3 AS BIGINT) AS n_records,
  'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS response_uri,
  CAST(200 AS BIGINT) AS http_status,
  'text/html' AS content_type,
  CAST(15 + length(substring(text, 1, 64)) + 18 AS BIGINT) AS body_len,
  md5('<html><body><p>' || substring(text, 1, 64) || '</p></body></html>')
    AS body_md5
FROM documents
"""


@query("q_warc_extract", WARC_ORACLE)
def q_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.operators.multimodal import attach_fake_warc, warc_extract

    docs = tables.load(spark, sf_dir, "documents")
    got = warc_extract(attach_fake_warc(docs))
    return got.select(
        "doc_id",
        "n_records",
        "response_uri",
        "http_status",
        "content_type",
        F.length("body").cast("bigint").alias("body_len"),
        F.md5("body").alias("body_md5"),
    )


# --------------------------------------------------------------------------
# q_web_pipeline — the composed END-TO-END web-curation pipeline, the
# web-family counterpart of q_corpus_curation: REAL WARC parse (vendored
# Content-Length-driven reader) -> HTML boilerplate strip (engine-
# portable tag regex) -> exact dedup on the normalized visible text
# (min-id survivor; 64-char bodies collide across docs, so the stage
# does real work) -> word-count quality gate -> per-source funnel
# rollup (fetched / unique / kept / kept tokens). The oracle replays
# the WHOLE chain from the closed-form bodies — certifying the
# COMPOSITION, not just each stage. Scale: decode is one Arrow pass;
# dedup is the only wide shuffle (8-byte fingerprints); the rollup is
# source-sized.
# --------------------------------------------------------------------------
_WEBP_MIN_WORDS = 12  # corpus-calibrated so the gate splits (word counts span 10..15)

WEB_PIPELINE_ORACLE = f"""
WITH body AS (
  SELECT doc_id, source,
    '<html><body><p>' || substring(text, 1, 64) || '</p></body></html>' AS html
  FROM documents
), s AS (
  SELECT doc_id, source,
    trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'), ' +', ' ', 'g')) AS clean
  FROM body
), fp AS (
  SELECT doc_id, source, clean,
    md5(trim(regexp_replace(lower(clean), ' +', ' ', 'g'))) AS f
  FROM s
), win AS (
  SELECT f, min(doc_id) AS survivor FROM fp GROUP BY f
), flag AS (
  SELECT fp.doc_id, fp.source,
    len(string_split(fp.clean, ' ')) AS n_words,
    (fp.doc_id = win.survivor) AS is_surv
  FROM fp JOIN win ON fp.f = win.f
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_fetched,
  CAST(count(*) FILTER (is_surv) AS BIGINT) AS n_unique,
  CAST(count(*) FILTER (is_surv AND n_words >= {_WEBP_MIN_WORDS}) AS BIGINT) AS n_kept,
  CAST(coalesce(sum(n_words) FILTER (is_surv AND n_words >= {_WEBP_MIN_WORDS}), 0) AS BIGINT) AS kept_tokens
FROM flag GROUP BY source
"""


@query("q_web_pipeline", WEB_PIPELINE_ORACLE)
def q_web_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from forklift_spark.operators.multimodal import attach_fake_warc, warc_extract

    docs = tables.load(spark, sf_dir, "documents")
    fetched = warc_extract(attach_fake_warc(docs)).select("doc_id", "body")
    stripped = fetched.select(
        "doc_id", W.strip_html(F.col("body").cast("string")).alias("clean")
    )
    fp = stripped.select(
        "doc_id",
        "clean",
        F.md5(
            F.trim(F.regexp_replace(F.lower("clean"), " +", " "))
        ).alias("f"),
    )
    win = fp.groupBy("f").agg(F.min("doc_id").alias("survivor"))
    flag = (
        fp.join(win, "f")
        .select(
            "doc_id",
            F.size(F.split("clean", " ")).alias("n_words"),
            (F.col("doc_id") == F.col("survivor")).alias("is_surv"),
        )
        .join(docs.select("doc_id", "source"), "doc_id")
    )
    kept = F.col("is_surv") & (F.col("n_words") >= _WEBP_MIN_WORDS)
    return flag.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fetched"),
        F.sum(F.col("is_surv").cast("bigint")).cast("bigint").alias("n_unique"),
        F.sum(kept.cast("bigint")).cast("bigint").alias("n_kept"),
        F.coalesce(
            F.sum(F.when(kept, F.col("n_words"))), F.lit(0)
        ).cast("bigint").alias("kept_tokens"),
    )
