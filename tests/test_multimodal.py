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


def test_decode_image_stub_raises_without_pil(with_payload):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL available; stub not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        M.decode_image(with_payload)


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


def test_resize_image_stub_raises_without_pil(with_payload):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL available; stub not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        M.resize_image(with_payload, 32, 32)
