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


# --------------------------------------------------------------------------
# q_image_decode — REAL image decode: every row carries a genuine binary
# P6 PPM (header + RGB raster built by attach_fake_ppm); the operator
# parses the container with the vendored codec and extracts
# exact-integer pixel statistics. The raster is a closed form of
# (doc_id, j), so the oracle replays the decoded features independently
# — the hash certifies header parse + raster math end to end.
# --------------------------------------------------------------------------
IMAGE_DECODE_ORACLE = """
WITH d AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
), b AS (
  SELECT doc_id, w, h,
    list_transform(range(0, w * h * 3), j -> (doc_id * 31 + j * 7) % 256) AS px
  FROM d
)
SELECT doc_id,
  CAST(w AS BIGINT) AS width,
  CAST(h AS BIGINT) AS height,
  CAST(w * h AS BIGINT) AS n_pixels,
  CAST(list_sum(px) AS BIGINT) AS sum_rgb,
  CAST(list_max(px) AS BIGINT) AS peak,
  CAST(len(list_filter(px, x -> x >= 128)) AS BIGINT) AS n_bright,
  round(CAST(list_sum(px) AS DOUBLE) / (w * h * 3), 9) AS mean_rgb
FROM b
"""


@query("q_image_decode", IMAGE_DECODE_ORACLE)
def q_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    feats = M.image_pixel_features(M.attach_fake_ppm(docs))
    return feats.select(
        "doc_id", "width", "height", "n_pixels", "sum_rgb", "peak", "n_bright",
        F.round("mean_rgb", 9).alias("mean_rgb"),
    )


# --------------------------------------------------------------------------
# q_video_frames — REAL video decode + strided frame sampling: every row
# carries a genuine raw-DIB AVI (RIFF container built by
# attach_fake_avi); the operator walks the container, unpads/flips each
# sampled DIB frame, and emits exact-integer per-frame statistics.
# Frame pixels are a closed form of (doc_id, frame, j), so the oracle
# replays the sampled-frame features without a container parser.
# --------------------------------------------------------------------------
VIDEO_FRAMES_ORACLE = """
WITH d AS (
  SELECT doc_id, 3 + doc_id % 4 AS w, 2 + doc_id % 3 AS h,
         2 + doc_id % 4 AS nf
  FROM documents
), f AS (
  SELECT doc_id, w, h, unnest(range(0, nf)) AS fi FROM d
), s AS (
  SELECT doc_id, w, h, fi,
    list_transform(range(0, w * h * 3), j -> (doc_id * 17 + fi * 251 + j * 13) % 256) AS px
  FROM f WHERE fi % 2 = 0
)
SELECT doc_id,
  CAST(fi AS BIGINT) AS frame_index,
  CAST(w AS BIGINT) AS width,
  CAST(h AS BIGINT) AS height,
  CAST(list_sum(px) AS BIGINT) AS frame_sum,
  CAST(list_max(px) AS BIGINT) AS frame_peak
FROM s
"""


@query("q_video_frames", VIDEO_FRAMES_ORACLE)
def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    frames = M.video_frame_features(M.attach_fake_avi(docs), every=2)
    return frames.select(
        "doc_id", "frame_index", "width", "height", "frame_sum", "frame_peak"
    )


# --------------------------------------------------------------------------
# q_video_features — clip-level statistics from the same REAL AVI
# decode: geometry, frame count, duration, whole-clip integer sums.
# --------------------------------------------------------------------------
VIDEO_FEATURES_ORACLE = """
WITH d AS (
  SELECT doc_id, 3 + doc_id % 4 AS w, 2 + doc_id % 3 AS h,
         2 + doc_id % 4 AS nf
  FROM documents
), f AS (
  SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS fi FROM d
), s AS (
  SELECT doc_id, w, h, nf, fi,
    list_transform(range(0, w * h * 3), j -> (doc_id * 17 + fi * 251 + j * 13) % 256) AS px
  FROM f
)
SELECT doc_id,
  CAST(any_value(w) AS BIGINT) AS width,
  CAST(any_value(h) AS BIGINT) AS height,
  CAST(any_value(nf) AS BIGINT) AS n_frames,
  CAST(10 AS BIGINT) AS fps,
  CAST(any_value(nf) * 1000 // 10 AS BIGINT) AS duration_ms,
  CAST(sum(list_sum(px)) AS BIGINT) AS total_sum,
  CAST(max(list_max(px)) AS BIGINT) AS peak
FROM s
GROUP BY doc_id
"""


@query("q_video_features", VIDEO_FEATURES_ORACLE)
def q_video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    feats = M.video_features(M.attach_fake_avi(docs))
    return feats.select(
        "doc_id", "width", "height", "n_frames", "fps", "duration_ms",
        "total_sum", "peak",
    )


# --------------------------------------------------------------------------
# q_video_thumbnail — decode -> transform -> re-encode across codecs:
# middle frame of each REAL AVI, nearest-neighbor downsampled to 2x2,
# re-encoded as a REAL PPM thumbnail. The exact thumbnail pixels are a
# closed form (nearest-neighbor index arithmetic over the closed-form
# frame raster), so the oracle replays decode + frame choice + resample
# byte-for-byte.
# --------------------------------------------------------------------------
VIDEO_THUMB_ORACLE = """
WITH d AS (
  SELECT doc_id, 3 + doc_id % 4 AS w, 2 + doc_id % 3 AS h,
         2 + doc_id % 4 AS nf
  FROM documents
), t AS (
  SELECT doc_id, w, h, nf // 2 AS fi,
    list_transform(range(0, 12), t ->
      (doc_id * 17 + (nf // 2) * 251
       + ((((t // 6) * h // 2) * w + (((t // 3) % 2) * w // 2)) * 3 + t % 3) * 13
      ) % 256
    ) AS px
  FROM d
)
SELECT doc_id,
  CAST(fi AS BIGINT) AS frame_index,
  CAST(2 AS BIGINT) AS thumb_w,
  CAST(2 AS BIGINT) AS thumb_h,
  array_to_string(px, ',') AS px_csv
FROM t
"""


@query("q_video_thumbnail", VIDEO_THUMB_ORACLE)
def q_video_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    thumbs = M.video_thumbnail(M.attach_fake_avi(docs), thumb_w=2, thumb_h=2)
    return thumbs.select("doc_id", "frame_index", "thumb_w", "thumb_h", "px_csv")
