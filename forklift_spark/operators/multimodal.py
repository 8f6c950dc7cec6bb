"""Multimodal column operators: opaque binary payloads + typed metadata.

No reference counterpart (taskrabbit/forklift moves flat scalar rows
only — `lib/forklift/transports/mysql.rb:39-41`); these are the
media-handling passes a large-scale training-data pipeline needs.
Design per the engine contract:

- media payloads are opaque ``binary`` columns with typed metadata
  columns alongside (media_type / byte_len / fingerprint) — never
  decoded strings;
- metadata extraction (magic-byte sniffing, length, hashing) stays
  JVM-side in built-in functions: it runs at scan speed, no UDF;
- decode / feature-extract / frame-sample run as Arrow-batched
  ``mapInPandas`` passes — one Python worker per input partition, no
  shuffle, memory bounded by the Arrow batch size. ``decode_image`` and
  ``resize_image`` REALLY decode uncompressed formats (PPM/PGM, 24-bit
  BMP) via the vendored pure-Python codec
  (functions/imagecodec.py) — no image library needed; PIL, when
  importable, is an optional fallback for compressed formats
  (JPEG/PNG), which otherwise surface per-row decode errors.
  ``image_features`` / ``sample_frames`` use a clearly-marked
  DETERMINISTIC FAKE over the raw bytes so the format-independent
  plumbing (schema, batch shape, partition behavior) is testable on
  any payload.

At 100 TB: payloads dominate row size, so every pass here projects the
narrowest column set (Parquet column pruning keeps undecoded media out
of I/O entirely when only metadata is needed) and nothing shuffles.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Magic-byte prefixes for sniffing (hex, uppercase as F.hex emits).
_MAGIC = {
    "89504E47": "image/png",  # \x89PNG
    "FFD8FF": "image/jpeg",
    "5036": "image/x-portable-pixmap",  # P6 binary PPM
    "5035": "image/x-portable-graymap",  # P5 binary PGM
    "424D": "image/bmp",  # BM
    "52494646": "audio/wav",  # RIFF container
    "00000": "video/mp4",  # ....ftyp (loose: size-prefix box)
}

# Deterministic fake headers used by attach_fake_payload: doc_id % 4
# picks one, so tests and oracles can predict the sniffed type.
FAKE_HEADERS: tuple[tuple[str, bytes], ...] = (
    ("image/png", b"\x89PNG\r\n\x1a\n"),
    ("image/jpeg", b"\xff\xd8\xff\xe0"),
    ("audio/wav", b"RIFF\x24\x00\x00\x00WAVE"),
    ("application/octet-stream", b"\x00\x01\x02\x03"),
)


def attach_fake_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media payload: a real magic-byte header chosen
    by ``id % 4`` + the UTF-8 bytes of the text column. Stands in for a
    real binary ingest so every downstream operator exercises true
    ``binary``-typed columns.
    """
    header = F.element_at(
        F.array(*[F.lit(bytearray(h)) for _, h in FAKE_HEADERS]),
        (F.col(id_col) % 4 + 1).cast("int"),
    )
    return df.withColumn("payload", F.concat(header, F.encode(F.col(text_col), "UTF-8")))


def sniff_media_type(payload: Column | str) -> Column:
    """Magic-byte media-type sniff, JVM-side (hex prefix match on the
    first 8 bytes — no UDF, no decode)."""
    c = F.col(payload) if isinstance(payload, str) else payload
    prefix = F.hex(F.substring(c, 1, 8))
    out = F.lit("application/octet-stream")
    for magic, mtype in _MAGIC.items():
        out = F.when(prefix.startswith(magic), F.lit(mtype)).otherwise(out)
    return out


def media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata for an opaque binary column: byte length, sha256
    fingerprint, sniffed media type. Pure projections — at scale this is
    a single scan with no shuffle."""
    return df.withColumns(
        {
            "byte_len": F.octet_length(F.col(payload_col)).cast("bigint"),
            "sha256": F.sha2(F.col(payload_col), 256),
            "media_type": sniff_media_type(payload_col),
        }
    )


# --------------------------------------------------------------------------
# Arrow-batched decode passes (mapInPandas)
# --------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
    ]
)


def image_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Per-payload feature vector via ``mapInPandas``.

    DETERMINISTIC FAKE decode: features are computed from the raw bytes
    (mean byte value, 0-order byte entropy) instead of decoded pixels —
    the image libraries are not available here. The plumbing is the real
    thing: Arrow batches in/out, narrow input projection, per-partition
    execution with no shuffle; swap `_features_of` for a real decoder
    (PIL/librosa) to productionize.
    """
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "byte_len": [], "mean_byte": [], "byte_entropy": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                f = _features_of(bytes(payload) if payload is not None else b"")
                out["doc_id"].append(doc_id)
                out["byte_len"].append(f[0])
                out["mean_byte"].append(f[1])
                out["byte_entropy"].append(f[2])
            yield pd.DataFrame(out)

    return src.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def _features_of(payload: bytes) -> tuple[int, float, float]:
    n = len(payload)
    if n == 0:
        return 0, 0.0, 0.0
    counts: dict[int, int] = {}
    total = 0
    for b in payload:
        counts[b] = counts.get(b, 0) + 1
        total += b
    entropy = -sum((c / n) * math.log2(c / n) for c in counts.values())
    return n, total / n, entropy


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    frame_chars: int = 200,
    every: int = 4,
) -> DataFrame:
    """Frame-sampling pass via ``mapInPandas``: split each document into
    fixed-size frames (here ``frame_chars`` characters — the
    DETERMINISTIC FAKE stand-in for video frame extraction) and keep
    every ``every``-th frame, fingerprinted with md5.

    One output row per sampled frame; rows explode inside the Python
    worker so no driver materialization and no shuffle — output
    partitioning follows input partitioning, which is what a 100 TB
    frame-sampling pass needs.
    """
    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                text = text or ""
                n_frames = math.ceil(len(text) / frame_chars)
                for fi in range(0, n_frames, every):
                    chunk = text[fi * frame_chars : (fi + 1) * frame_chars]
                    ids.append(doc_id)
                    idxs.append(fi)
                    hashes.append(hashlib.md5(chunk.encode("utf-8")).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_index": idxs, "frame_md5": hashes})

    return src.mapInPandas(run, FRAME_SCHEMA)


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def decode_image(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """REAL image decode (width/height/mode/format) via the vendored
    pure-Python codec for uncompressed formats (PPM/PGM, 24-bit BMP);
    PIL is used as an optional fallback for compressed payloads when
    importable. Rows that fail to decode come back with NULL dims and
    the error message — a 100 TB corpus always contains corrupt
    payloads, and one bad row must not fail the pass.
    """
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from forklift_spark.functions import imagecodec

        try:  # optional fallback for compressed formats only
            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:  # pragma: no cover - env-dependent
            have_pil = False

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "mode": [], "format": [], "error": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                w = h = None
                mode = fmt = err = None
                try:
                    img = imagecodec.decode_bytes(raw)
                    w, h, mode, fmt = img.width, img.height, img.mode, img.format
                except imagecodec.ImageDecodeError as exc:
                    if have_pil:  # pragma: no cover - env-dependent
                        import io

                        from PIL import Image

                        try:
                            pimg = Image.open(io.BytesIO(raw))
                            w, h = pimg.width, pimg.height
                            mode, fmt = pimg.mode, pimg.format
                        except Exception as pexc:
                            err = str(pexc)
                    else:
                        err = str(exc)
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mode"].append(mode)
                rows["format"].append(fmt)
                rows["error"].append(err)
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, DECODE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("thumb_bytes", T.LongType()),
    ]
)


def resize_media(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    factor: int = 8,
) -> DataFrame:
    """Thumbnail/downsample pass via ``mapInPandas``.

    DETERMINISTIC FAKE resize: keeps every ``factor``-th byte of the
    payload (a real pipeline decodes + PIL-resamples; see
    ``resize_image`` for the gated real path). The Spark-side contract
    is the production one: binary in, smaller binary out, Arrow batches,
    no shuffle, output partitioning follows input.
    """
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "thumb": [], "orig_bytes": [], "thumb_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                thumb = raw[::factor]
                out["doc_id"].append(doc_id)
                out["thumb"].append(thumb)
                out["orig_bytes"].append(len(raw))
                out["thumb_bytes"].append(len(thumb))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, RESIZE_SCHEMA)


def resize_image(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL image resize: decode (pure-Python codec, PPM/PGM/BMP),
    nearest-neighbor resample, re-encode as binary PPM/PGM. Same
    Spark-side contract as `resize_media` (binary in, smaller binary
    out, Arrow batches, no shuffle); undecodable payloads yield a NULL
    thumb rather than failing the pass."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from forklift_spark.functions import imagecodec

        for pdf in batches:
            out = {"doc_id": [], "thumb": [], "orig_bytes": [], "thumb_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    img = imagecodec.decode_bytes(raw)
                    small = imagecodec.resize_nearest(img, width, height)
                    thumb = imagecodec.encode_ppm(
                        small.width, small.height, small.mode, small.pixels
                    )
                except imagecodec.ImageDecodeError:
                    thumb = None
                out["doc_id"].append(doc_id)
                out["thumb"].append(thumb)
                out["orig_bytes"].append(len(raw))
                out["thumb_bytes"].append(len(thumb) if thumb is not None else 0)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, RESIZE_SCHEMA)


# --------------------------------------------------------------------------
# Audio: real WAV decode via the vendored pure-Python codec
# --------------------------------------------------------------------------

AUDIO_RATE = 16000
AUDIO_MAX_SAMPLES = 400


def attach_fake_wav(df: DataFrame, id_col: str = "doc_id", len_col: str = "n_chars") -> DataFrame:
    """Attach a REAL PCM16 WAV payload per row (RIFF header + fmt +
    data chunks, parseable by any WAV reader). Samples are a
    deterministic closed-form sequence of the row id —
    ``s_i = ((id*37 + i*9973) % 65536) - 32768`` with
    ``n = clamp(len_col, 2, 400)`` — so an independent engine can
    replay the decoded features without parsing the container. Built
    in an Arrow ``mapInPandas`` pass (pure-python struct packing)."""
    from forklift_spark.functions.audiocodec import write_wav

    src = df.select(F.col(id_col).alias("doc_id"), F.col(len_col).alias("_n"))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id, n in zip(pdf["doc_id"], pdf["_n"]):
                k = max(2, min(int(n), AUDIO_MAX_SAMPLES))
                samples = [
                    ((int(doc_id) * 37 + i * 9973) % 65536) - 32768 for i in range(k)
                ]
                out["doc_id"].append(doc_id)
                out["payload"].append(write_wav(samples, AUDIO_RATE))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def audio_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """REAL audio decode + feature extraction over a binary WAV column:
    the RIFF container is parsed (chunk walk, PCM16 validation) and the
    features come from the decoded samples — exact-integer sum of
    squares, peak, zero crossings; RMS as one sqrt. Corrupt or
    unsupported payloads degrade to a per-row ``decode_error`` instead
    of failing the pass (null features), so one bad object can't kill
    a 100 TB scan. Arrow-batched ``mapInPandas``, no shuffle."""
    import math

    from forklift_spark.functions.audiocodec import (
        AudioDecodeError,
        parse_wav,
        pcm_features,
    )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    cols = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    rate, _ch, samples = parse_wav(
                        bytes(payload) if payload is not None else b""
                    )
                    n, sumsq, peak, zc = pcm_features(samples)
                    row = {
                        "sample_rate": rate,
                        "n_samples": n,
                        "duration_ms": n * 1000 // rate,
                        "sum_sq": sumsq,
                        "peak": peak,
                        "zero_crossings": zc,
                        "rms": math.sqrt(sumsq / n) if n else 0.0,
                        "decode_error": None,
                    }
                except AudioDecodeError as e:
                    row = {c: None for c in cols if c != "doc_id"}
                    row["decode_error"] = str(e)
                out["doc_id"].append(doc_id)
                for c, v in row.items():
                    out[c].append(v)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


# --------------------------------------------------------------------------
# Image: real PPM decode with a closed-form pixel field (oracle-checkable)
# --------------------------------------------------------------------------


def attach_fake_ppm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL binary P6 PPM payload per row (parseable by any
    PNM reader). Dimensions and pixels are a closed form of the row id —
    ``w = 4 + id%5``, ``h = 3 + id%4``, byte ``j`` of the RGB raster is
    ``(id*31 + j*7) % 256`` — so an independent engine can replay the
    decoded features without parsing the container. Arrow
    ``mapInPandas``, pure-python struct packing, no shuffle."""
    from forklift_spark.functions.imagecodec import encode_ppm

    src = df.select(F.col(id_col).alias("doc_id"))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 4 + i % 5, 3 + i % 4
                px = bytes((i * 31 + j * 7) % 256 for j in range(w * h * 3))
                out["doc_id"].append(doc_id)
                out["payload"].append(encode_ppm(w, h, "RGB", px))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema)


def attach_fake_png(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL PNG payload per row (CRC-valid chunks, zlib IDAT —
    parseable by any PNG reader). Dimensions, mode and pixels are a
    closed form of the row id — ``w = 3 + id%6``, ``h = 2 + id%5``, RGB
    for even ids / grayscale for odd, byte ``j`` of the raster is
    ``(id*13 + j*11) % 256`` — so an independent engine can replay the
    decoded features without a PNG parser. Arrow ``mapInPandas``,
    stdlib-zlib encoder, no shuffle."""
    from forklift_spark.functions.imagecodec import encode_png

    src = df.select(F.col(id_col).alias("doc_id"))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 3 + i % 6, 2 + i % 5
                mode = "RGB" if i % 2 == 0 else "L"
                ch = 3 if mode == "RGB" else 1
                px = bytes((i * 13 + j * 11) % 256 for j in range(w * h * ch))
                out["doc_id"].append(doc_id)
                out["payload"].append(encode_png(w, h, mode, px))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema)


IMAGE_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_rgb", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("n_bright", T.LongType()),
        T.StructField("mean_rgb", T.DoubleType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def image_pixel_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder=None,
) -> DataFrame:
    """REAL image decode + pixel statistics over a binary image column:
    the container is parsed by the vendored codec (PPM/PGM/BMP header +
    raster) and every feature derives from the decoded pixel bytes —
    exact-integer channel sum, peak channel value, bright-byte count
    (>=128); mean as one division. Corrupt payloads degrade to a
    per-row ``decode_error`` (null features) so one bad object can't
    kill a 100 TB scan. Arrow-batched ``mapInPandas``, no shuffle.

    ``decoder`` is the THROUGHPUT SEAM: any ``bytes -> object with
    (width, height, pixels)`` callable replaces the vendored pure-Python
    codec without touching the operator (schema, batching, degradation
    contract unchanged) — at 100 TB, plug a native decoder (Pillow-SIMD
    / libvips / a JVM codec via a different operator body) in here; the
    vendored codec exists for hermetic parity, not peak throughput.
    Measured ceiling of the pure-Python path: scripts/media_throughput.py
    and SCALING.md §Python boundary."""
    from forklift_spark.functions.imagecodec import ImageDecodeError, decode_bytes

    decode = decoder or decode_bytes
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    cols = [f.name for f in IMAGE_PIXEL_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    img = decode(bytes(payload) if payload is not None else b"")
                    # vectorized feature pass: the per-pixel loop, not
                    # the codec, dominated the measured throughput
                    # (SCALING.md §Python boundary) — numpy int64 sums
                    # are exact for any byte raster under 2^55 pixels
                    px = np.frombuffer(bytes(img.pixels), dtype=np.uint8)
                    s = int(px.sum(dtype=np.int64))
                    row = {
                        "width": img.width,
                        "height": img.height,
                        "n_pixels": img.width * img.height,
                        "sum_rgb": s,
                        "peak": int(px.max()) if px.size else 0,
                        "n_bright": int((px >= 128).sum(dtype=np.int64)),
                        "mean_rgb": (s / px.size) if px.size else 0.0,
                        "decode_error": None,
                    }
                except ImageDecodeError as e:
                    row = {c: None for c in cols if c != "doc_id"}
                    row["decode_error"] = str(e)
                out["doc_id"].append(doc_id)
                for c, v in row.items():
                    out[c].append(v)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, IMAGE_PIXEL_SCHEMA)


IMAGE_HEADER_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("n_pixels", T.LongType()),
    T.StructField("channels", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("decode_error", T.StringType()),
])


def image_header_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """HEADER-ONLY image metadata over a binary column: dimensions /
    channel count / container format parsed from the header alone — the
    raster is never decoded (functions/imagecodec.py decode_headers, the
    measured ~8x throughput path vs the pixel decoder; see
    scripts/media_throughput.py and SCALING.md §Python boundary). This
    is the right operator for the metadata class of a curation pipeline
    — resolution/aspect filters, format census, corrupt-header triage —
    where paying a full decode per image buys nothing. Same contract as
    the pixel operator: Arrow-batched ``mapInPandas``, no shuffle,
    per-row corrupt degradation into ``decode_error``."""
    from forklift_spark.functions.imagecodec import (
        ImageDecodeError, decode_headers,
    )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    cols = [f.name for f in IMAGE_HEADER_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    img = decode_headers(
                        bytes(payload) if payload is not None else b""
                    )
                    ch = {"RGB": 3, "L": 1}[img.mode]
                    row = {
                        "width": img.width,
                        "height": img.height,
                        "n_pixels": img.width * img.height,
                        "channels": ch,
                        "format": img.format,
                        "decode_error": None,
                    }
                except ImageDecodeError as e:
                    row = {c: None for c in cols if c != "doc_id"}
                    row["decode_error"] = str(e)
                out["doc_id"].append(doc_id)
                for c, v in row.items():
                    out[c].append(v)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, IMAGE_HEADER_SCHEMA)


# --------------------------------------------------------------------------
# Video: real AVI decode via the vendored pure-Python codec
# --------------------------------------------------------------------------

VIDEO_FPS = 10


def attach_fake_avi(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL raw-DIB AVI payload per row (RIFF container with
    avih/strh/strf headers and ``00db`` frame chunks, parseable by any
    AVI reader). Geometry and pixels are a closed form of the row id —
    ``w = 3 + id%4``, ``h = 2 + id%3``, ``n_frames = 2 + id%4``, byte
    ``j`` of frame ``f``'s top-down RGB raster is
    ``(id*17 + f*251 + j*13) % 256`` — so an independent engine can
    replay the decoded per-frame features without parsing the
    container. Widths 3..6 exercise every DIB row-padding remainder.
    Arrow ``mapInPandas``, pure-python struct packing, no shuffle."""
    from forklift_spark.functions.videocodec import write_avi

    src = df.select(F.col(id_col).alias("doc_id"))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h, nf = 3 + i % 4, 2 + i % 3, 2 + i % 4
                frames = [
                    bytes((i * 17 + f * 251 + j * 13) % 256 for j in range(w * h * 3))
                    for f in range(nf)
                ]
                out["doc_id"].append(doc_id)
                out["payload"].append(write_avi(w, h, VIDEO_FPS, frames))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema)


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("frame_sum", T.LongType()),
        T.StructField("frame_peak", T.LongType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def video_frame_features(
    df: DataFrame, every: int = 2, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL video decode + strided frame sampling over a binary AVI
    column: the RIFF container is parsed (header walk, DIB raster
    unpadding/flip), every ``every``-th frame is kept, and each kept
    frame yields exact-integer pixel statistics (channel-byte sum,
    peak). This is the video-modality frame-sample pass of a training
    pipeline: decode happens once per payload, sampling happens before
    any downstream work, and the fan-out (≤ frames/every rows per
    payload) is bounded. Corrupt payloads degrade to one per-row
    ``decode_error`` row (null features). Arrow ``mapInPandas``, no
    shuffle."""
    from forklift_spark.functions.videocodec import VideoDecodeError, parse_avi

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    cols = [f.name for f in VIDEO_FRAME_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    vid = parse_avi(bytes(payload) if payload is not None else b"")
                    for fi in range(0, len(vid.frames), every):
                        px = vid.frames[fi]
                        out["doc_id"].append(doc_id)
                        out["frame_index"].append(fi)
                        out["width"].append(vid.width)
                        out["height"].append(vid.height)
                        out["frame_sum"].append(sum(px))
                        out["frame_peak"].append(max(px) if px else 0)
                        out["decode_error"].append(None)
                except VideoDecodeError as e:
                    out["doc_id"].append(doc_id)
                    for c in cols[1:-1]:
                        out[c].append(None)
                    out["decode_error"].append(str(e))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, VIDEO_FRAME_SCHEMA)


VIDEO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("fps", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("total_sum", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def video_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Clip-level features from a REAL AVI decode: geometry, frame
    count, duration, and exact-integer whole-clip pixel statistics.
    Same degradation and execution shape as ``video_frame_features``."""
    from forklift_spark.functions.videocodec import VideoDecodeError, parse_avi

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    cols = [f.name for f in VIDEO_FEATURES_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    vid = parse_avi(bytes(payload) if payload is not None else b"")
                    fps = int(vid.fps)
                    row = {
                        "width": vid.width,
                        "height": vid.height,
                        "n_frames": len(vid.frames),
                        "fps": fps,
                        "duration_ms": len(vid.frames) * 1000 // fps if fps else None,
                        "total_sum": sum(sum(f) for f in vid.frames),
                        "peak": max((max(f) for f in vid.frames if f), default=0),
                        "decode_error": None,
                    }
                except VideoDecodeError as e:
                    row = {c: None for c in cols if c != "doc_id"}
                    row["decode_error"] = str(e)
                out["doc_id"].append(doc_id)
                for c, v in row.items():
                    out[c].append(v)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, VIDEO_FEATURES_SCHEMA)


VIDEO_THUMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.LongType()),
        T.StructField("thumb_w", T.LongType()),
        T.StructField("thumb_h", T.LongType()),
        T.StructField("px_csv", T.StringType()),
        T.StructField("thumbnail", T.BinaryType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def video_thumbnail(
    df: DataFrame,
    thumb_w: int = 2,
    thumb_h: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode -> transform -> re-encode across codecs: parse the AVI,
    take the middle frame, nearest-neighbor downsample it, and emit a
    REAL binary PPM thumbnail alongside the exact pixel bytes (csv) for
    oracle verification. The representative-frame + thumbnail pass of a
    video curation pipeline; same Arrow ``mapInPandas`` shape and
    per-row error degradation as the other decode passes."""
    from forklift_spark.functions.imagecodec import DecodedImage, encode_ppm, resize_nearest
    from forklift_spark.functions.videocodec import VideoDecodeError, parse_avi

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    cols = [f.name for f in VIDEO_THUMB_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    vid = parse_avi(bytes(payload) if payload is not None else b"")
                    if not vid.frames:
                        raise VideoDecodeError("no frames")
                    fi = len(vid.frames) // 2
                    frame = DecodedImage(vid.width, vid.height, "RGB", vid.frames[fi], "AVI")
                    thumb = resize_nearest(frame, thumb_w, thumb_h)
                    row = {
                        "frame_index": fi,
                        "thumb_w": thumb_w,
                        "thumb_h": thumb_h,
                        "px_csv": ",".join(str(b) for b in thumb.pixels),
                        "thumbnail": encode_ppm(thumb_w, thumb_h, "RGB", thumb.pixels),
                        "decode_error": None,
                    }
                except VideoDecodeError as e:
                    row = {c: None for c in cols if c != "doc_id"}
                    row["decode_error"] = str(e)
                out["doc_id"].append(doc_id)
                for c, v in row.items():
                    out[c].append(v)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, VIDEO_THUMB_SCHEMA)


# -- WARC web-archive ingest ----------------------------------------------

WARC_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("response_uri", T.StringType()),
        T.StructField("http_status", T.LongType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def attach_fake_warc(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Attach a REAL WARC/1.0 file per row (warcinfo + request +
    response records, parseable by any WARC reader). The response body
    is a closed form of the row — ``<html><body><p>`` + the first 64
    text chars + ``</p></body></html>`` — so an independent engine can
    replay every extracted field without parsing the container."""
    from forklift_spark.functions.warccodec import write_warc

    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["_t"]):
                uri = f"https://example.com/doc/{int(doc_id)}"
                html = f"<html><body><p>{(text or '')[:64]}</p></body></html>"
                http = (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + html.encode()
                )
                recs = [
                    {
                        "warc_type": "warcinfo",
                        "payload": b"software: forklift-spark\r\n",
                    },
                    {
                        "warc_type": "request",
                        "target_uri": uri,
                        "payload": b"GET / HTTP/1.1\r\nHost: example.com\r\n\r\n",
                    },
                    {
                        "warc_type": "response",
                        "target_uri": uri,
                        "record_id": f"<urn:doc:{int(doc_id)}>",
                        "content_type": "application/http;msgtype=response",
                        "payload": http,
                    },
                ]
                out["doc_id"].append(doc_id)
                out["payload"].append(write_warc(recs))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema)


def warc_extract(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL WARC ingest over a binary column: walk every record
    (Content-Length-driven — see functions/warccodec.py), find the
    response record, parse its HTTP payload, and emit the fields a
    web-curation pipeline starts from (URI, status, content type,
    body). Corrupt payloads degrade to a per-row ``decode_error`` so
    one bad archive can't kill a 100 TB scan. Arrow ``mapInPandas``,
    no shuffle. At real scale the binary cells are WARC *records*
    pre-split by the reader; the parse discipline is identical."""
    from forklift_spark.functions.warccodec import (
        WarcDecodeError,
        parse_http,
        parse_warc,
    )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    cols = [f.name for f in WARC_EXTRACT_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                row: dict[str, object] = {c: None for c in cols if c != "doc_id"}
                try:
                    recs = parse_warc(
                        bytes(payload) if payload is not None else b""
                    )
                    row["n_records"] = len(recs)
                    resp = next(
                        r for r in recs
                        if r["headers"].get("WARC-Type") == "response"
                    )
                    status, hh, body = parse_http(resp["payload"])
                    row["response_uri"] = resp["headers"].get("WARC-Target-URI")
                    row["http_status"] = status
                    row["content_type"] = hh.get("content-type")
                    row["body"] = body.decode("utf-8", errors="replace")
                except (WarcDecodeError, StopIteration) as e:
                    row["decode_error"] = (
                        "no response record"
                        if isinstance(e, StopIteration)
                        else str(e)
                    )
                out["doc_id"].append(doc_id)
                for c in cols:
                    if c != "doc_id":
                        out[c].append(row[c])
            yield pd.DataFrame(out)

    return src.mapInPandas(run, WARC_EXTRACT_SCHEMA)


# --------------------------------------------------------------------------
# Perceptual hashing + temporal segmentation over the decoded rasters
# --------------------------------------------------------------------------

DHASH_W, DHASH_H = 8, 7  # 8 bits x 7 rows = 56 bits (fits a signed int64)

IMAGE_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def image_dhash(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Perceptual difference-hash (dHash) over a REAL image decode: the
    raster is resampled nearest-neighbor to a (DHASH_W+1) x DHASH_H
    grayscale grid (integer gray = (r+g+b)//3) and bit (y,x) is set when
    gray[y][x] > gray[y][x+1] — the standard gradient fingerprint that
    survives resizing and small edits. 56 bits (8x7) rather than the
    textbook 64 so the hash stays positive in a signed 64-bit integer in
    every engine. All integer arithmetic — an independent engine can
    replay the hash exactly. Arrow ``mapInPandas``, no shuffle."""
    from forklift_spark.functions.imagecodec import ImageDecodeError, decode_bytes

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    cols = [f.name for f in IMAGE_DHASH_SCHEMA.fields]
    gw, gh = DHASH_W + 1, DHASH_H

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    img = decode_bytes(bytes(payload) if payload is not None else b"")
                    w, h, px = img.width, img.height, img.pixels
                    gray = [
                        [0] * gw for _ in range(gh)
                    ]
                    for y in range(gh):
                        sy = y * h // gh
                        for x in range(gw):
                            sx = x * w // gw
                            p = 3 * (sy * w + sx)
                            gray[y][x] = (px[p] + px[p + 1] + px[p + 2]) // 3
                    bits = 0
                    for y in range(gh):
                        for x in range(DHASH_W):
                            if gray[y][x] > gray[y][x + 1]:
                                bits |= 1 << (y * DHASH_W + x)
                    row = {"width": w, "height": h, "dhash": bits, "decode_error": None}
                except ImageDecodeError as e:
                    row = {c: None for c in cols if c != "doc_id"}
                    row["decode_error"] = str(e)
                out["doc_id"].append(doc_id)
                for c, v in row.items():
                    out[c].append(v)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, IMAGE_DHASH_SCHEMA)


VIDEO_DIFF_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("frame_diff", T.LongType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def video_frame_diffs(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Per-frame temporal difference over a REAL AVI decode: frame f's
    ``frame_diff`` is the exact-integer sum of absolute byte deltas vs
    frame f-1 (frame 0 reports NULL — no predecessor). This is the
    scene-change signal: a downstream threshold + gaps-and-islands pass
    segments the clip. Decode happens once per payload; the fan-out is
    one row per frame. Arrow ``mapInPandas``, no shuffle."""
    from forklift_spark.functions.videocodec import VideoDecodeError, parse_avi

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    cols = [f.name for f in VIDEO_DIFF_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    vid = parse_avi(bytes(payload) if payload is not None else b"")
                    prev = None
                    for fi, px in enumerate(vid.frames):
                        diff = (
                            sum(abs(a - b) for a, b in zip(px, prev))
                            if prev is not None
                            else None
                        )
                        out["doc_id"].append(doc_id)
                        out["frame_index"].append(fi)
                        out["width"].append(vid.width)
                        out["height"].append(vid.height)
                        out["frame_diff"].append(diff)
                        out["decode_error"].append(None)
                        prev = px
                except VideoDecodeError as e:
                    out["doc_id"].append(doc_id)
                    for c in cols[1:-1]:
                        out[c].append(None)
                    out["decode_error"].append(str(e))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, VIDEO_DIFF_SCHEMA)


AUDIO_FP_WINDOWS = 16  # energy-envelope windows -> 15 gradient bits

AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("afp", T.LongType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def audio_fingerprint(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Perceptual audio fingerprint over a REAL WAV decode: the PCM
    samples split into AUDIO_FP_WINDOWS equal windows, each window's
    energy is the exact-integer sum of absolute sample values, and bit
    k is set when envelope[k] > envelope[k+1] — the energy-gradient
    fingerprint (the dHash idea on the time axis; robust to gain-
    independent edits because only the envelope SHAPE matters). 15 bits
    from 16 windows; all integer arithmetic, replayable by an
    independent engine. Arrow ``mapInPandas``, no shuffle."""
    from forklift_spark.functions.audiocodec import AudioDecodeError, parse_wav

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    cols = [f.name for f in AUDIO_FP_SCHEMA.fields]
    wn = AUDIO_FP_WINDOWS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    _, _, smp = parse_wav(bytes(payload) if payload is not None else b"")
                    n = len(smp)
                    env = [
                        sum(abs(x) for x in smp[k * n // wn : (k + 1) * n // wn])
                        for k in range(wn)
                    ]
                    bits = 0
                    for k in range(wn - 1):
                        if env[k] > env[k + 1]:
                            bits |= 1 << k
                    row = {"n_samples": n, "afp": bits, "decode_error": None}
                except AudioDecodeError as e:
                    row = {c: None for c in cols if c != "doc_id"}
                    row["decode_error"] = str(e)
                out["doc_id"].append(doc_id)
                for c, v in row.items():
                    out[c].append(v)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, AUDIO_FP_SCHEMA)
