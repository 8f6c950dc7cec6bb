"""Multimodal operator tests: binary payload plumbing, metadata
sniffing, Arrow-batched decode passes, frame sampling — checked against
the DuckDB oracle and direct Python recomputation.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from forklift_spark import tables
from forklift_spark.operators import multimodal as M
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return tables.load(spark, SF_DIR, "documents")


@pytest.fixture(scope="module")
def with_payload(docs):
    return M.attach_fake_payload(docs).cache()


def test_payload_is_binary_with_header(with_payload):
    field = dict(with_payload.dtypes)["payload"]
    assert field == "binary"
    row = with_payload.select("doc_id", "payload", "text").first()
    _, header = M.FAKE_HEADERS[row["doc_id"] % 4]
    raw = bytes(row["payload"])
    assert raw.startswith(header)
    assert raw[len(header) :] == row["text"].encode("utf-8")


def test_sniff_matches_header_choice(with_payload):
    got = M.media_metadata(with_payload).select("doc_id", "media_type").collect()
    for row in got:
        want, _ = M.FAKE_HEADERS[row["doc_id"] % 4]
        assert row["media_type"] == want, row


def test_metadata_matches_python(with_payload):
    rows = (
        M.media_metadata(with_payload)
        .select("doc_id", "byte_len", "sha256", "payload")
        .limit(20)
        .collect()
    )
    assert rows
    for r in rows:
        raw = bytes(r["payload"])
        assert r["byte_len"] == len(raw)
        assert r["sha256"] == hashlib.sha256(raw).hexdigest()


def test_image_features_deterministic_fake(with_payload):
    feats = M.image_features(with_payload)
    assert [f.name for f in feats.schema.fields] == [
        "doc_id",
        "byte_len",
        "mean_byte",
        "byte_entropy",
    ]
    sample = feats.limit(10).collect()
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in with_payload.filter(
            F.col("doc_id").isin([r["doc_id"] for r in sample])
        ).collect()
    }
    for r in sample:
        raw = payloads[r["doc_id"]]
        n, mean, ent = M._features_of(raw)
        assert r["byte_len"] == n == len(raw)
        assert r["mean_byte"] == pytest.approx(mean)
        assert r["byte_entropy"] == pytest.approx(ent)
        assert 0.0 <= r["byte_entropy"] <= 8.0


def test_sample_frames_invariants(docs):
    frames = M.sample_frames(docs, frame_chars=200, every=4)
    got = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.min("frame_index").alias("first")
    )
    lens = {r["doc_id"]: len(r["text"]) for r in docs.select("doc_id", "text").collect()}
    for r in got.collect():
        n_frames = math.ceil(lens[r["doc_id"]] / 200)
        assert r["n"] == math.ceil(n_frames / 4)
        assert r["first"] == 0
    # indices are always multiples of `every`
    assert frames.filter(F.col("frame_index") % 4 != 0).count() == 0


def test_frame_md5_matches_python(docs):
    row = docs.select("doc_id", "text").first()
    frames = (
        M.sample_frames(docs.filter(F.col("doc_id") == row["doc_id"]))
        .orderBy("frame_index")
        .collect()
    )
    text = row["text"]
    for fr in frames:
        chunk = text[fr["frame_index"] * 200 : (fr["frame_index"] + 1) * 200]
        assert fr["frame_md5"] == hashlib.md5(chunk.encode("utf-8")).hexdigest()


# --------------------------------------------------------------------------
# REAL decode path: vendored pure-Python codec (PPM/PGM/BMP), no PIL needed
# --------------------------------------------------------------------------

def _ppm_fixture():
    from forklift_spark.functions import imagecodec as C

    # 4x2 RGB: distinct pixel per position so resampling is checkable
    pixels = bytes(
        v for y in range(2) for x in range(4) for v in (x * 40, y * 100, x + y)
    )
    return C.encode_ppm(4, 2, "RGB", pixels), pixels


def test_codec_ppm_roundtrip_and_comment_header():
    from forklift_spark.functions import imagecodec as C

    raw, pixels = _ppm_fixture()
    img = C.decode_bytes(raw)
    assert (img.width, img.height, img.mode, img.format) == (4, 2, "RGB", "PPM")
    assert img.pixels == pixels
    # PNM headers may carry comments — parse those too
    commented = b"P6\n# a comment\n4 2\n255\n" + pixels
    img2 = C.decode_bytes(commented)
    assert img2.pixels == pixels


def test_codec_bmp_roundtrip_with_row_padding():
    from forklift_spark.functions import imagecodec as C

    # width 3 -> 9-byte rows pad to 12: exercises stride handling
    pixels = bytes(v for y in range(2) for x in range(3) for v in (x, y * 50, 200))
    raw = C.encode_bmp(3, 2, pixels)
    img = C.decode_bytes(raw)
    assert (img.width, img.height, img.mode, img.format) == (3, 2, "RGB", "BMP")
    assert img.pixels == pixels


def test_decode_image_real_formats_and_corrupt_row(spark):
    from forklift_spark.functions import imagecodec as C

    ppm, _ = _ppm_fixture()
    bmp = C.encode_bmp(3, 2, bytes(range(3 * 2 * 3)))
    pgm = C.encode_ppm(5, 3, "L", bytes(range(15)))
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(bmp)), (3, bytearray(pgm)),
         (4, bytearray(b"\xff\xd8\xffnot really a jpeg"))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in M.decode_image(df).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["mode"], out[1]["format"]) == (4, 2, "RGB", "PPM")
    assert (out[2]["width"], out[2]["height"], out[2]["format"]) == (3, 2, "BMP")
    assert (out[3]["width"], out[3]["height"], out[3]["mode"], out[3]["format"]) == (5, 3, "L", "PGM")
    assert out[1]["error"] is None and out[2]["error"] is None
    # corrupt payload degrades to an error row, never fails the pass
    assert out[4]["width"] is None and out[4]["error"] is not None


def test_resize_image_real_nearest_neighbor(spark):
    from forklift_spark.functions import imagecodec as C

    raw, pixels = _ppm_fixture()
    df = spark.createDataFrame([(7, bytearray(raw))], "doc_id long, payload binary")
    rows = M.resize_image(df, 2, 1).collect()
    assert len(rows) == 1
    thumb = C.decode_bytes(bytes(rows[0]["thumb"]))
    assert (thumb.width, thumb.height, thumb.mode) == (2, 1, "RGB")
    src = C.decode_bytes(raw)
    expect = C.resize_nearest(src, 2, 1).pixels
    assert thumb.pixels == expect
    # nearest-neighbor: output pixel (0,0) is source pixel (0,0), (1,0) is source (2,0)
    assert thumb.pixels[0:3] == pixels[0:3]
    assert thumb.pixels[3:6] == pixels[2 * 3 : 2 * 3 + 3]


def test_media_queries_match_oracle(spark, oracle):
    from forklift_spark.queries.multimodal import (
        FRAME_ORACLE,
        MEDIA_METADATA_ORACLE,
        q_frame_sample,
        q_media_metadata,
    )

    for fn, sql in ((q_media_metadata, MEDIA_METADATA_ORACLE), (q_frame_sample, FRAME_ORACLE)):
        sdf = fn(spark, SF_DIR)
        cols = sorted(sdf.columns)
        srows = sorted(tuple(repr(r[c]) for c in cols) for r in sdf.collect())
        cur = oracle.execute(sql)
        names = [d[0] for d in cur.description]
        order = sorted(range(len(names)), key=lambda i: names[i])
        drows = sorted(tuple(repr(r[i]) for i in order) for r in cur.fetchall())
        assert srows == drows, fn.__name__


def test_resize_media_deterministic_downsample(with_payload):
    out = M.resize_media(with_payload, factor=8)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "thumb", "orig_bytes", "thumb_bytes",
    ]
    rows = out.limit(10).collect()
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in with_payload.filter(
            F.col("doc_id").isin([r["doc_id"] for r in rows])
        ).collect()
    }
    for r in rows:
        raw = payloads[r["doc_id"]]
        assert bytes(r["thumb"]) == raw[::8]
        assert r["orig_bytes"] == len(raw)
        assert r["thumb_bytes"] == len(raw[::8])
        assert r["thumb_bytes"] <= r["orig_bytes"] // 8 + 1


def test_resize_image_undecodable_payload_yields_null_thumb(with_payload):
    # the fixture payloads are fake-header + text, not decodable images:
    # the real resize pass must degrade per-row, not raise
    rows = M.resize_image(with_payload.limit(5), 8, 8).collect()
    assert len(rows) == 5
    assert all(r["thumb"] is None and r["thumb_bytes"] == 0 for r in rows)


# -- audio: vendored WAV codec + real decode pass ---------------------------


def test_wav_codec_roundtrip_mono_and_stereo():
    from forklift_spark.functions import audiocodec as A

    mono = [0, 100, -100, 32767, -32768, 7]
    assert A.parse_wav(A.write_wav(mono, 8000)) == (8000, 1, mono)
    stereo = [1, -1, 2, -2, 3, -3]
    assert A.parse_wav(A.write_wav(stereo, 44100, channels=2)) == (44100, 2, stereo)


def test_wav_codec_walks_extra_chunks_and_rejects_corrupt():
    import struct

    import pytest as _pytest

    from forklift_spark.functions import audiocodec as A

    base = A.write_wav([1, 2, 3], 16000)
    # splice an unknown LIST chunk between fmt and data — parser must skip it
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = base[:fmt_end] + extra + base[fmt_end:]
    assert A.parse_wav(spliced)[2] == [1, 2, 3]
    for bad in (b"", b"RIFFxxxx", base[:-3], base.replace(b"fmt ", b"fmtX")):
        with _pytest.raises(A.AudioDecodeError):
            A.parse_wav(bad)


def test_audio_features_real_decode_and_corrupt_degradation(spark):
    import math

    from forklift_spark.functions import audiocodec as A

    good = A.write_wav([1000, -1000, 1000, -1000], 8000)
    rows = [(1, bytearray(good)), (2, bytearray(b"not a wav"))]
    df = spark.createDataFrame(rows, "doc_id: long, payload: binary")
    out = {r["doc_id"]: r for r in M.audio_features(df).collect()}
    g = out[1]
    assert g["sample_rate"] == 8000 and g["n_samples"] == 4
    assert g["sum_sq"] == 4 * 1000 * 1000 and g["peak"] == 1000
    assert g["zero_crossings"] == 3
    assert g["rms"] == math.sqrt(g["sum_sq"] / 4)
    assert g["decode_error"] is None
    b = out[2]
    assert b["decode_error"] is not None and b["n_samples"] is None


def test_attach_fake_wav_payloads_are_real_wavs(docs):
    from forklift_spark.functions import audiocodec as A

    rows = M.attach_fake_wav(docs.limit(4)).collect()
    assert len(rows) == 4
    for r in rows:
        rate, ch, samples = A.parse_wav(bytes(r["payload"]))
        assert rate == M.AUDIO_RATE and ch == 1
        assert 2 <= len(samples) <= M.AUDIO_MAX_SAMPLES
        assert samples[1] == ((r["doc_id"] * 37 + 9973) % 65536) - 32768


# ---------------------------------------------------------------------------
# Real video decode: vendored AVI codec + Spark-side frame features
# ---------------------------------------------------------------------------


def test_videocodec_roundtrip_all_padding_remainders():
    from forklift_spark.functions import videocodec as V

    # widths 3..6 cover every DIB row-padding remainder (9,12,15,18 bytes)
    for w, h, nf in [(3, 2, 2), (4, 3, 4), (5, 4, 5), (6, 2, 3)]:
        frames = [
            bytes((7 * f + 13 * j) % 256 for j in range(w * h * 3))
            for f in range(nf)
        ]
        vid = V.parse_avi(V.write_avi(w, h, 10, frames))
        assert (vid.width, vid.height, vid.fps) == (w, h, 10.0)
        assert vid.frames == frames  # bottom-up/BGR/unpad round-trips exactly


def test_videocodec_rejects_corrupt_and_unsupported():
    import struct

    from forklift_spark.functions import videocodec as V

    good = V.write_avi(3, 2, 10, [bytes(18)])
    for bad in [b"", b"RIFF\x04\x00\x00\x00WAVE", good[:40]]:
        with pytest.raises(V.VideoDecodeError):
            V.parse_avi(bad)
    # compressed handler must be refused, not mis-parsed
    mjpg = good.replace(b"DIB ", b"MJPG", 1)
    with pytest.raises(V.VideoDecodeError):
        V.parse_avi(mjpg)


def test_video_frame_features_matches_closed_form(spark, docs):
    sample = M.video_frame_features(M.attach_fake_avi(docs.limit(20)), every=2)
    rows = sample.collect()
    assert rows and all(r.decode_error is None for r in rows)
    for r in rows:
        i, fi = r.doc_id, r.frame_index
        w, h, nf = 3 + i % 4, 2 + i % 3, 2 + i % 4
        assert fi % 2 == 0 and fi < nf
        px = [(i * 17 + fi * 251 + j * 13) % 256 for j in range(w * h * 3)]
        assert (r.width, r.height, r.frame_sum, r.frame_peak) == (
            w, h, sum(px), max(px),
        )


def test_video_corrupt_payload_degrades_per_row(spark):
    from forklift_spark.functions.videocodec import write_avi

    df = spark.createDataFrame(
        [(1, write_avi(3, 2, 10, [bytes(18)])), (2, b"not a video")],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in M.video_frame_features(df, every=1).collect()}
    assert out[1].decode_error is None and out[1].frame_sum == 0
    assert out[2].decode_error is not None and out[2].frame_sum is None


def test_image_pixel_features_matches_closed_form(spark, docs):
    feats = M.image_pixel_features(M.attach_fake_ppm(docs.limit(20))).collect()
    assert feats and all(r.decode_error is None for r in feats)
    for r in feats:
        i = r.doc_id
        w, h = 4 + i % 5, 3 + i % 4
        px = [(i * 31 + j * 7) % 256 for j in range(w * h * 3)]
        assert (r.width, r.height, r.n_pixels, r.sum_rgb, r.peak, r.n_bright) == (
            w, h, w * h, sum(px), max(px), sum(1 for b in px if b >= 128),
        )


def test_video_thumbnail_roundtrips_through_image_codec(spark, docs):
    from forklift_spark.functions import imagecodec as C

    rows = M.video_thumbnail(M.attach_fake_avi(docs.limit(10)), 2, 2).collect()
    assert rows and all(r.decode_error is None for r in rows)
    for r in rows:
        img = C.decode_bytes(bytes(r.thumbnail))  # REAL PPM payload
        assert (img.width, img.height, img.format) == (2, 2, "PPM")
        assert ",".join(str(b) for b in img.pixels) == r.px_csv
        i = r.doc_id
        nf = 2 + i % 4
        assert r.frame_index == nf // 2


# -- WARC ingest -----------------------------------------------------------


def test_warc_roundtrip_and_content_length_walk():
    from forklift_spark.functions.warccodec import parse_http, parse_warc, write_warc

    # a payload CONTAINING the record magic must not split the walk
    tricky = b"leading\r\n\r\nWARC/1.0\r\nfake: yes\r\n\r\nbody"
    recs = [
        {"warc_type": "warcinfo", "payload": b"software: x\r\n"},
        {"warc_type": "response", "target_uri": "https://e.com/a",
         "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + tricky},
    ]
    data = write_warc(recs)
    back = parse_warc(data)
    assert [r["headers"]["WARC-Type"] for r in back] == ["warcinfo", "response"]
    status, headers, body = parse_http(back[1]["payload"])
    assert (status, headers["content-type"], body) == (200, "text/plain", tricky)


def test_warc_malformed_inputs_raise():
    import pytest

    from forklift_spark.functions.warccodec import (
        WarcDecodeError, parse_warc, write_warc,
    )

    good = write_warc([{"warc_type": "response", "payload": b"x" * 40}])
    negative_cl = good.replace(b"Content-Length: 40", b"Content-Length: -4")
    for bad in (b"", b"NOTW" + good[4:], good[:-6], good[:30], negative_cl):
        with pytest.raises(WarcDecodeError):
            parse_warc(bad)


def test_warc_extract_degrades_per_row(spark):
    from forklift_spark.operators.multimodal import attach_fake_warc, warc_extract

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "second doc")], "doc_id long, text string"
    )
    good = attach_fake_warc(docs)
    corrupt = spark.createDataFrame(
        [(3, bytearray(b"WARC/1.0\r\ngarbage"))], "doc_id long, payload binary"
    )
    out = {r.doc_id: r for r in warc_extract(good.unionByName(corrupt)).collect()}
    assert out[1].n_records == 3 and out[1].http_status == 200
    assert out[1].body == "<html><body><p>hello world</p></body></html>"
    assert out[2].response_uri == "https://example.com/doc/2"
    assert out[3].decode_error and out[3].http_status is None


# -- image_dhash -----------------------------------------------------------


def _dhash_of(spark, payloads):
    from forklift_spark.operators.multimodal import image_dhash

    df = spark.createDataFrame(
        list(enumerate(payloads)), "doc_id long, payload binary"
    )
    out = image_dhash(df)
    return {r.doc_id: (r.dhash, r.decode_error) for r in out.collect()}


def test_dhash_invariant_under_2x_upscale(spark):
    # nearest-neighbor 2x upscale hits the same source pixels at every
    # grid sample (floor(floor(2a)/2) == floor(a)), so the perceptual
    # hash must be EXACTLY equal — the robustness property that makes
    # dHash a near-dup signal rather than a byte checksum
    from forklift_spark.functions.imagecodec import encode_ppm

    w, h = 6, 5
    px = bytes((j * 37 + 11) % 256 for j in range(w * h * 3))
    big = bytearray()
    for y in range(2 * h):
        for x in range(2 * w):
            p = 3 * ((y // 2) * w + (x // 2))
            big += px[p:p + 3]
    got = _dhash_of(
        spark,
        [encode_ppm(w, h, "RGB", px), encode_ppm(2 * w, 2 * h, "RGB", bytes(big))],
    )
    assert got[0][0] == got[1][0]
    assert got[0][1] is None


def test_dhash_corrupt_payload_degrades(spark):
    from forklift_spark.functions.imagecodec import encode_ppm

    px = bytes(range(36))
    got = _dhash_of(spark, [encode_ppm(2, 2, "RGB", bytes(12)), b"NOTANIMAGE"])
    assert got[0][1] is None
    assert got[1][0] is None and got[1][1]  # error string, no hash


def test_dhash_is_56_bit_positive(spark):
    # all-gradient image: every comparison fires; hash must stay within
    # 56 bits (positive in a signed 64-bit int in every engine)
    from forklift_spark.functions.imagecodec import encode_ppm

    w, h = 9, 7
    px = bytes(min(255, (w - x) * 20) for y in range(h) for x in range(w) for _ in range(3))
    got = _dhash_of(spark, [encode_ppm(w, h, "RGB", px)])
    assert got[0][0] == (1 << 56) - 1


# -- video_frame_diffs -----------------------------------------------------


def test_frame_diffs_exact_and_first_null(spark):
    from forklift_spark.functions.videocodec import write_avi
    from forklift_spark.operators.multimodal import video_frame_diffs

    f0 = bytes([10] * 12)  # 2x2 RGB
    f1 = bytes([13] * 12)  # +3 per byte -> diff 36
    f2 = bytes([5] * 12)   # -8 per byte -> diff 96
    df = spark.createDataFrame(
        [(0, write_avi(2, 2, 10, [f0, f1, f2]))], "doc_id long, payload binary"
    )
    rows = {r.frame_index: r.frame_diff for r in video_frame_diffs(df).collect()}
    assert rows == {0: None, 1: 36, 2: 96}


def test_frame_diffs_corrupt_payload_degrades(spark):
    from forklift_spark.operators.multimodal import video_frame_diffs

    df = spark.createDataFrame(
        [(7, b"RIFFgarbage")], "doc_id long, payload binary"
    )
    rows = video_frame_diffs(df).collect()
    assert len(rows) == 1 and rows[0].decode_error


# -- audio_fingerprint -----------------------------------------------------


def _afp_of(spark, payloads):
    from forklift_spark.operators.multimodal import audio_fingerprint

    df = spark.createDataFrame(
        list(enumerate(payloads)), "doc_id long, payload binary"
    )
    return {r.doc_id: (r.afp, r.decode_error) for r in audio_fingerprint(df).collect()}


def test_audio_fingerprint_gain_invariant(spark):
    # doubling every sample scales each window's energy by exactly 2,
    # so the envelope-GRADIENT bits are unchanged — the property that
    # makes it perceptual (volume-independent), not a byte checksum
    from forklift_spark.functions.audiocodec import write_wav

    smp = [((i * 997) % 2000) - 1000 for i in range(160)]
    loud = [2 * x for x in smp]
    got = _afp_of(
        spark, [write_wav(smp, 16000), write_wav(loud, 16000)]
    )
    assert got[0][0] == got[1][0]
    assert got[0][1] is None


def test_audio_fingerprint_corrupt_degrades(spark):
    got = _afp_of(spark, [b"RIFFnotawave"])
    assert got[0][0] is None and got[0][1]


# ---------------------------------------------------------------------------
# PNG codec (r4): from-scratch walker — filters, palette, alpha, CRC
# ---------------------------------------------------------------------------


def _png_forward_filter(raw_rows, ch, ftypes):
    """Apply PNG forward filtering so the decoder's unfilter paths are
    exercised with known ground truth."""
    from forklift_spark.functions.imagecodec import _paeth

    out = bytearray()
    prev = bytes(len(raw_rows[0]))
    for row, ft in zip(raw_rows, ftypes):
        out.append(ft)
        for x in range(len(row)):
            left = row[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if ft == 0:
                v = row[x]
            elif ft == 1:
                v = row[x] - left
            elif ft == 2:
                v = row[x] - up
            elif ft == 3:
                v = row[x] - ((left + up) >> 1)
            else:
                v = row[x] - _paeth(left, up, ul)
            out.append(v & 0xFF)
        prev = row
    return bytes(out)


def _png_chunks(*chunks):
    import struct
    import zlib

    from forklift_spark.functions.imagecodec import PNG_SIG

    out = bytearray(PNG_SIG)
    for ctype, data in chunks:
        out += struct.pack(">I", len(data)) + ctype + data
        out += struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    return bytes(out)


def test_png_roundtrip_rgb_and_gray():
    from forklift_spark.functions.imagecodec import decode_png, encode_png

    for mode, ch in (("RGB", 3), ("L", 1)):
        w, h = 5, 4
        px = bytes((j * 7 + 3) % 256 for j in range(w * h * ch))
        img = decode_png(encode_png(w, h, mode, px))
        assert (img.width, img.height, img.mode, img.format) == (w, h, mode, "PNG")
        assert img.pixels == px


def test_png_all_filter_types_unfilter_correctly():
    import struct
    import zlib

    from forklift_spark.functions.imagecodec import decode_png

    w, h, ch = 4, 5, 3
    rows = [
        bytes(((y * 31 + x * 11) % 256) for x in range(w * ch)) for y in range(h)
    ]
    body = _png_forward_filter(rows, ch, [0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = _png_chunks(
        (b"IHDR", ihdr), (b"IDAT", zlib.compress(body)), (b"IEND", b"")
    )
    img = decode_png(raw)
    assert img.pixels == b"".join(rows)


def test_png_palette_and_alpha():
    import struct
    import zlib

    from forklift_spark.functions.imagecodec import decode_png

    # color type 3: 2x2 indices into a 4-entry palette
    plte = bytes((10, 20, 30, 40, 50, 60, 70, 80, 90, 200, 210, 220))
    idx_rows = [bytes((0, 3)), bytes((2, 1))]
    body = _png_forward_filter(idx_rows, 1, [0, 0])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = _png_chunks(
        (b"IHDR", ihdr), (b"PLTE", plte), (b"IDAT", zlib.compress(body)), (b"IEND", b"")
    )
    img = decode_png(raw)
    assert img.mode == "RGB"
    assert img.pixels == bytes(
        (10, 20, 30, 200, 210, 220, 70, 80, 90, 40, 50, 60)
    )
    # color type 6: RGBA strips alpha
    rgba_rows = [bytes((1, 2, 3, 255, 4, 5, 6, 128))]
    body6 = _png_forward_filter(rgba_rows, 4, [0])
    ihdr6 = struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0)
    img6 = decode_png(
        _png_chunks((b"IHDR", ihdr6), (b"IDAT", zlib.compress(body6)), (b"IEND", b""))
    )
    assert img6.mode == "RGB" and img6.pixels == bytes((1, 2, 3, 4, 5, 6))


def test_png_corruption_degrades_loudly():
    import pytest as _pytest

    from forklift_spark.functions.imagecodec import (
        ImageDecodeError,
        decode_png,
        encode_png,
    )

    good = encode_png(3, 3, "L", bytes(range(9)))
    # flip one IDAT byte without fixing the CRC
    bad = bytearray(good)
    idat_at = good.index(b"IDAT") + 4
    bad[idat_at] ^= 0xFF
    with _pytest.raises(ImageDecodeError, match="CRC"):
        decode_png(bytes(bad))
    with _pytest.raises(ImageDecodeError, match="signature"):
        decode_png(b"\x89PNX" + good[4:])
    with _pytest.raises(ImageDecodeError, match="truncated"):
        decode_png(good[:30])


def test_png_decode_dispatch_and_pixel_features(spark):
    from forklift_spark.operators import multimodal as M

    docs = spark.range(6).select(F.col("id").alias("doc_id"))
    feats = M.image_pixel_features(M.attach_fake_png(docs)).collect()
    assert len(feats) == 6
    for r in feats:
        i = r.doc_id
        w, h = 3 + i % 6, 2 + i % 5
        ch = 3 if i % 2 == 0 else 1
        px = [(i * 13 + j * 11) % 256 for j in range(w * h * ch)]
        assert r.decode_error is None
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        assert r.sum_rgb == sum(px)
        assert r.peak == max(px)
        assert r.n_bright == sum(1 for b in px if b >= 128)


def test_decoder_seam_swaps_codec(spark):
    """The ``decoder`` seam of image_pixel_features: any ``bytes ->
    (width, height, pixels)`` callable replaces the vendored codec with
    schema, batching, and per-row corrupt degradation unchanged — the
    100 TB path (SCALING.md §Python boundary) swaps in a native decoder
    here without touching the operator."""
    from forklift_spark.functions.imagecodec import ImageDecodeError
    from forklift_spark.operators.multimodal import image_pixel_features

    df = spark.createDataFrame(
        [(1, bytearray(b"OK")), (2, bytearray(b"BAD"))],
        "doc_id long, payload binary",
    )

    class _Img:
        width, height = 2, 1
        pixels = b"\x10\xf0"

    def fake_decoder(raw: bytes):
        if raw != b"OK":
            raise ImageDecodeError("fake: unreadable")
        return _Img()

    rows = {r.doc_id: r for r in image_pixel_features(df, decoder=fake_decoder).collect()}
    ok, bad = rows[1], rows[2]
    assert (ok.width, ok.height, ok.sum_rgb, ok.n_bright) == (2, 1, 0x10 + 0xF0, 1)
    assert ok.decode_error is None
    # degradation contract survives the swap: corrupt row -> error, not crash
    assert bad.width is None and "fake: unreadable" in bad.decode_error


# -- r6: header-only decode (VERDICT item 7) --------------------------------


def test_decode_headers_matches_full_decode_dims():
    """Header walk must recover exactly the full decoder's dims / mode /
    format on every supported container."""
    from forklift_spark.functions.imagecodec import (
        decode_bytes, decode_headers, encode_bmp, encode_png, encode_ppm,
    )

    px_rgb = bytes((j * 5 + 3) % 256 for j in range(7 * 4 * 3))
    px_l = bytes((j * 9 + 1) % 256 for j in range(6 * 3))
    payloads = [
        encode_ppm(7, 4, "RGB", px_rgb),
        encode_ppm(6, 3, "L", px_l),
        encode_bmp(7, 4, px_rgb),
        encode_png(7, 4, "RGB", px_rgb),
        encode_png(6, 3, "L", px_l),
    ]
    for raw in payloads:
        full, hdr = decode_bytes(raw), decode_headers(raw)
        assert (hdr.width, hdr.height, hdr.mode, hdr.format) == (
            full.width, full.height, full.mode, full.format
        )
        assert hdr.pixels == b""  # the raster is never materialized


def test_decode_headers_is_header_deep():
    """Validation stops at the header BY DESIGN: a truncated raster
    passes the header probe (full decode rejects it); a corrupted
    header raises in both."""
    import pytest as _pytest

    from forklift_spark.functions.imagecodec import (
        ImageDecodeError, decode_bytes, decode_headers, encode_png,
    )

    raw = encode_png(8, 8, "RGB", bytes(8 * 8 * 3))
    truncated = raw[: len(raw) - 20]  # IDAT tail gone, IHDR intact
    hdr = decode_headers(truncated)
    assert (hdr.width, hdr.height) == (8, 8)
    with _pytest.raises(ImageDecodeError):
        decode_bytes(truncated)
    # flip one IHDR byte: the CRC check must catch it header-side too
    bad = bytearray(raw)
    bad[17] ^= 0xFF  # width byte
    with _pytest.raises(ImageDecodeError, match="CRC"):
        decode_headers(bytes(bad))
    with _pytest.raises(ImageDecodeError):
        decode_headers(b"not an image at all")


def test_image_header_features_operator(with_payload, spark):
    """Operator contract: dims agree with the pixel operator row-for-row
    on real PNGs; corrupt rows degrade per-row, never kill the scan."""
    src = M.attach_fake_png(with_payload.select("doc_id").limit(40))
    hdr = {r.doc_id: r for r in M.image_header_features(src).collect()}
    pix = {r.doc_id: r for r in M.image_pixel_features(src).collect()}
    assert set(hdr) == set(pix) and hdr
    for k, hrow in hdr.items():
        assert hrow.decode_error is None
        assert (hrow.width, hrow.height, hrow.n_pixels) == (
            pix[k].width, pix[k].height, pix[k].n_pixels
        )
        assert hrow.format == "PNG" and hrow.channels in (1, 3)
    corrupt = spark.createDataFrame(
        [(1, bytearray(b"JUNK")), (2, None)], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in M.image_header_features(corrupt).collect()}
    assert rows[1].decode_error and rows[1].width is None
    assert rows[2].decode_error
