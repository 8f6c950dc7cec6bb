"""Vendored pure-Python AVI (RIFF) codec for uncompressed 24-bit video.

Same role as ``imagecodec``/``audiocodec``: no video library exists in
this container, so the REAL decode path for the video modality is
implemented directly — a chunk-walking RIFF parser for AVI files whose
single video stream is uncompressed 24-bit RGB DIB frames (``'DIB '``
handler, ``00db`` movi chunks — the classic raw-AVI layout every
tool from ffmpeg to VirtualDub can produce), plus a writer for
round-trip tests. Frames are stored the DIB way (bottom-up rows, each
row padded to a 4-byte boundary); the parser returns top-down unpadded
RGB rasters.

Runs inside Arrow ``mapInPandas`` batches; per-payload work is pure
bytes/struct, no third-party dependency. Compressed codecs (MJPG,
H.264, ...) raise ``VideoDecodeError`` and callers degrade to per-row
error columns.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


class VideoDecodeError(ValueError):
    pass


@dataclass(frozen=True)
class DecodedVideo:
    width: int
    height: int
    fps: float
    frames: list[bytes]  # per frame: row-major top-down RGB, 3 bytes/px


def _row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def _dib_to_rgb(body: bytes, width: int, height: int) -> bytes:
    """Bottom-up padded DIB raster -> top-down unpadded RGB bytes.
    DIB stores BGR; convert to RGB so features match the natural
    channel order used by the image codec."""
    stride = _row_stride(width)
    if len(body) < stride * height:
        raise VideoDecodeError(
            f"frame body {len(body)} bytes < expected {stride * height}"
        )
    out = bytearray(width * height * 3)
    for y in range(height):
        src = (height - 1 - y) * stride
        dst = y * width * 3
        for x in range(width):
            b, g, r = body[src + x * 3 : src + x * 3 + 3]
            out[dst + x * 3 : dst + x * 3 + 3] = bytes((r, g, b))
    return bytes(out)


def _rgb_to_dib(rgb: bytes, width: int, height: int) -> bytes:
    stride = _row_stride(width)
    out = bytearray(stride * height)
    for y in range(height):
        dst = (height - 1 - y) * stride
        src = y * width * 3
        for x in range(width):
            r, g, b = rgb[src + x * 3 : src + x * 3 + 3]
            out[dst + x * 3 : dst + x * 3 + 3] = bytes((b, g, r))
    return bytes(out)


def parse_avi(data: bytes) -> DecodedVideo:
    """Decode a raw-DIB AVI payload.

    Walks the RIFF tree: ``LIST hdrl`` (``avih`` main header, ``strl``
    stream list with ``strh``/``strf``) for dimensions and frame rate,
    then ``LIST movi`` for the ``00db``/``00dc`` frame chunks.
    Tolerates extra chunks (``JUNK``, ``idx1``); validates magics,
    stream type, compression, and bit depth."""
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise VideoDecodeError("not a RIFF/AVI payload")
    width = height = None
    rate = scale = None
    frames: list[bytes] = []

    def walk(start: int, end: int, in_movi: bool) -> None:
        nonlocal width, height, rate, scale
        pos = start
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_at = pos + 8
            if body_at + size > end:
                raise VideoDecodeError(f"truncated chunk {cid!r}")
            if cid == b"LIST":
                ltype = data[body_at : body_at + 4]
                walk(body_at + 4, body_at + size, in_movi or ltype == b"movi")
            elif cid == b"strh":
                if data[body_at : body_at + 4] != b"vids":
                    raise VideoDecodeError("first stream is not a video stream")
                handler = data[body_at + 4 : body_at + 8]
                if handler not in (b"DIB ", b"\x00\x00\x00\x00"):
                    raise VideoDecodeError(
                        f"unsupported codec {handler!r} (raw DIB only)"
                    )
                scale, rate = struct.unpack_from("<II", data, body_at + 20)
            elif cid == b"strf":
                # BITMAPINFOHEADER
                _bisz, w, h, _planes, bits, compression = struct.unpack_from(
                    "<IiihHI", data, body_at
                )
                if compression != 0 or bits != 24:
                    raise VideoDecodeError(
                        f"unsupported frame format (bits={bits}, compression={compression})"
                    )
                width, height = w, abs(h)
            elif in_movi and cid in (b"00db", b"00dc"):
                if width is None:
                    raise VideoDecodeError("frame chunk before stream format header")
                frames.append(_dib_to_rgb(data[body_at : body_at + size], width, height))
            pos = body_at + size + (size & 1)  # chunks are word-aligned

    walk(12, len(data), False)
    if width is None or height is None:
        raise VideoDecodeError("missing strf (no frame dimensions)")
    if not rate or not scale:
        raise VideoDecodeError("missing strh rate/scale")
    return DecodedVideo(width, height, rate / scale, frames)


def write_avi(width: int, height: int, fps: int, frames: list[bytes]) -> bytes:
    """Encode top-down RGB frames as a raw-DIB AVI (rate=fps, scale=1)."""
    stride = _row_stride(width)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    frame_bytes = stride * height
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags (AVIF_HASINDEX not set; 0x10 = AVIF_WASCAPTUREFILE-free OK)
        len(frames),
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids" + b"DIB "
        + struct.pack("<IHHIIIIIIii", 0, 0, 0, 0, 1, fps, 0, len(frames), frame_bytes, -1, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiihHIIiiII", 40, width, height, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", _rgb_to_dib(f, width, height)) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
