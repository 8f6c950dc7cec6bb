"""Multimodal queries over documents-as-media, oracle-checked where the
semantics are SQL-expressible.

The documents table stands in for a media corpus: `attach_fake_payload`
gives every doc a real binary payload (magic-byte header by doc_id % 4 +
UTF-8 text bytes), so the binary plumbing (metadata extraction, Arrow
mapInPandas decode passes, frame sampling) runs against true
binary-typed columns. DuckDB oracles recompute the same scalars from the
text side (DuckDB's sha256/md5 hash UTF-8 varchar bytes, matching
Spark's sha2/md5 over F.encode(text)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from forklift_spark import tables
from forklift_spark.operators import multimodal as M
from forklift_spark.queries import query

_HEADER_LEN_SQL = "CASE doc_id % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 12 ELSE 4 END"
_MEDIA_TYPE_SQL = (
    "CASE doc_id % 4 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg' "
    "WHEN 2 THEN 'audio/wav' ELSE 'application/octet-stream' END"
)

# --------------------------------------------------------------------------
# q_media_metadata — JVM-side metadata over a binary payload column:
# sniffed media type (magic bytes), byte length, sha256 fingerprint of
# the content bytes. The oracle recomputes from doc_id % 4 + text.
# --------------------------------------------------------------------------
MEDIA_METADATA_ORACLE = f"""
SELECT doc_id,
  {_MEDIA_TYPE_SQL} AS media_type,
  {_HEADER_LEN_SQL} + octet_length(encode(text)) AS byte_len,
  sha256(text) AS content_sha256
FROM documents
"""


@query("q_media_metadata", MEDIA_METADATA_ORACLE)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    media = M.media_metadata(M.attach_fake_payload(docs))
    return media.select(
        "doc_id",
        "media_type",
        "byte_len",
        F.sha2(F.encode("text", "UTF-8"), 256).alias("content_sha256"),
    )


# --------------------------------------------------------------------------
# q_frame_sample — mapInPandas frame sampling (every 4th 200-char frame,
# md5-fingerprinted). Oracle: lateral generate_series + substring.
# --------------------------------------------------------------------------
FRAME_ORACLE = """
SELECT doc_id, fi AS frame_index,
  md5(substring(text, CAST(fi * 200 + 1 AS INT), 200)) AS frame_md5
FROM (
  SELECT doc_id, text,
    unnest(generate_series(0, CAST(ceil(length(text) / 200.0) AS BIGINT) - 1)) AS fi
  FROM documents
)
WHERE fi % 4 = 0
"""


@query("q_frame_sample", FRAME_ORACLE)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return M.sample_frames(docs, frame_chars=200, every=4)


# --------------------------------------------------------------------------
# q_image_features — Arrow-batched deterministic fake decode
# (mean-byte / entropy features). Byte-level float accumulation isn't
# SQL-expressible in DuckDB, so this entry takes the rows-only check.
# --------------------------------------------------------------------------
@query("q_image_features")
def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return M.image_features(M.attach_fake_payload(docs))


# --------------------------------------------------------------------------
# q_audio_features — REAL audio decode: every row carries a genuine
# PCM16 WAV payload (RIFF container built by attach_fake_wav); the
# operator parses the container with the vendored pure-Python codec and
# extracts exact-integer PCM features. The samples are a closed-form
# sequence of (doc_id, i), so the oracle replays the decoded features
# independently — the hash certifies parser + feature math end to end.
# --------------------------------------------------------------------------
AUDIO_ORACLE = """
WITH d AS (
  SELECT doc_id, greatest(2, least(n_chars, 400)) AS n FROM documents
), s AS (
  SELECT doc_id, n,
    list_transform(range(0, n), i -> ((doc_id * 37 + i * 9973) % 65536) - 32768) AS smp
  FROM d
), agg AS (
  SELECT doc_id, n,
    list_sum(list_transform(smp, x -> x * x)) AS sumsq,
    list_max(list_transform(smp, x -> abs(x))) AS peak,
    len(list_filter(range(1, n), i -> smp[i] * smp[i + 1] < 0)) AS zc
  FROM s
)
SELECT doc_id,
  CAST(16000 AS BIGINT) AS sample_rate,
  CAST(n AS BIGINT) AS n_samples,
  CAST(n * 1000 // 16000 AS BIGINT) AS duration_ms,
  CAST(sumsq AS BIGINT) AS sum_sq,
  CAST(peak AS BIGINT) AS peak,
  CAST(zc AS BIGINT) AS zero_crossings,
  round(sqrt(CAST(sumsq AS DOUBLE) / n), 9) AS rms
FROM agg
"""


@query("q_audio_features", AUDIO_ORACLE)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    feats = M.audio_features(M.attach_fake_wav(docs))
    return feats.select(
        "doc_id", "sample_rate", "n_samples", "duration_ms", "sum_sq", "peak",
        "zero_crossings", F.round("rms", 9).alias("rms"),
    )
