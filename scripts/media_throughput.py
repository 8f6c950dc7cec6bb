"""Measure the media-decode Python-boundary ceiling (VERDICT r4 item 8).

The vendored pure-Python codecs exist for hermetic parity, not peak
throughput; at 100 TB the decode body swaps for a native library behind
the ``decoder`` seam of ``image_pixel_features`` (same schema, batching,
per-row corrupt degradation). This script measures what the pure-Python
path sustains so SCALING.md can state the ceiling as a number and the
guidance ("swap the codec, keep the operator") as an engineering fact.

Method: (a) single-core microbenchmark of decode_bytes on realistic PNG
sizes — the per-core ceiling as bytes-of-raster/sec; (b) the
distributed operator over one 64x64 RGB PNG per documents row at sf0.1
(payload pinned with localCheckpoint so generation is not timed),
full-decode vs a header-only decoder injected through the seam — the
difference is pure codec cost, i.e. the seam's headroom.

Usage: python scripts/media_throughput.py [sf_dir]   # default sf0.1
Prints one JSON line; evidence for SCALING.md §Python boundary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from forklift_spark.operators.multimodal import (  # noqa: E402
    attach_fake_png,
    image_pixel_features,
)
from forklift_spark.session import get_spark  # noqa: E402


def _header_only_decoder(raw: bytes):
    """A stand-in 'native' decoder: parse the IHDR only (what a
    width/height probe or a SIMD library's metadata path costs)."""
    import struct

    from forklift_spark.functions.imagecodec import ImageDecodeError, PNG_SIG

    if raw[:8] != PNG_SIG:
        raise ImageDecodeError("not a PNG: bad signature")
    w, h = struct.unpack(">II", raw[16:24])

    class _Probe:
        width, height = w, h
        pixels = b""

    return _Probe()


def _single_core() -> list[dict]:
    """Pure codec cost, one core, no Spark: the honest per-core ceiling."""
    from forklift_spark.functions.imagecodec import decode_bytes, encode_png

    out = []
    for w, h in ((64, 64), (256, 256), (512, 512)):
        px = bytes((j * 7 + j // 31) % 256 for j in range(w * h * 3))
        raw = encode_png(w, h, "RGB", px)
        reps = max(3, 3_000_000 // (w * h * 3))
        t0 = time.monotonic()
        for _ in range(reps):
            decode_bytes(raw)
        dt = time.monotonic() - t0
        out.append(
            {
                "size": f"{w}x{h} RGB",
                "png_kb": round(len(raw) / 1e3, 1),
                "images_per_sec_per_core": round(reps / dt, 1),
                "raster_mb_per_sec_per_core": round(
                    reps * w * h * 3 / dt / 1e6, 2
                ),
            }
        )
    return out


def _attach_64x64_png(docs):
    """One 64x64 RGB PNG per row — realistic-enough codec work per row
    for the distributed measurement (attach_fake_png's parity payloads
    are tiny by design)."""
    import pandas as pd
    from pyspark.sql import types as T

    from forklift_spark.functions.imagecodec import encode_png

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = {"doc_id": [], "payload": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                px = bytes((i * 13 + j * 11) % 256 for j in range(64 * 64 * 3))
                rows["doc_id"].append(doc_id)
                rows["payload"].append(encode_png(64, 64, "RGB", px))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(run, schema)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="media_throughput")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id"
    )
    payload = _attach_64x64_png(docs).localCheckpoint(eager=True)
    n = payload.count()

    image_pixel_features(payload).count()  # warm the Python workers
    t0 = time.monotonic()
    image_pixel_features(payload).count()
    full = time.monotonic() - t0

    t0 = time.monotonic()
    image_pixel_features(payload, decoder=_header_only_decoder).count()
    probe = time.monotonic() - t0

    # the SHIPPED header-only operator (r6: decode_headers first-class,
    # dims/format via CRC-checked header walk, raster untouched)
    from forklift_spark.operators.multimodal import image_header_features

    image_header_features(payload).count()  # warm
    t0 = time.monotonic()
    image_header_features(payload).count()
    hdr_op = time.monotonic() - t0

    out = {
        "sf_dir": sf_dir,
        "rows": n,
        "image": "64x64 RGB PNG per row",
        "cores": cores,
        "single_core_codec": _single_core(),
        "distributed_full_decode": {
            "sec": round(full, 2),
            "rows_per_sec": round(n / full),
            "rows_per_sec_per_core": round(n / full / cores, 1),
        },
        "header_probe_via_seam": {
            "sec": round(probe, 2),
            "rows_per_sec": round(n / probe),
            "codec_headroom_x": round(full / probe, 1),
        },
        "image_header_features_operator": {
            "sec": round(hdr_op, 2),
            "rows_per_sec": round(n / hdr_op),
            "speedup_vs_full_decode_x": round(full / hdr_op, 1),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
