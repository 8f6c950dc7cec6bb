"""Pure-Python codecs for uncompressed image formats (PPM/PGM, 24-bit BMP).

No image library exists in this environment, so the multimodal "real
decode" operators (operators/multimodal.py) use these parsers: real
header parsing + pixel access for the two classic uncompressed formats,
implemented on bytes/struct only. PIL, when present, remains an optional
fallback for compressed formats — but the decode path is reachable and
tested WITHOUT it.

Scale note: these run inside Arrow-batched ``mapInPandas`` workers; the
per-image work is O(pixels) with no Spark shuffle implications. A
production deployment swaps `decode_bytes` for a vectorized decoder
without touching the operator plumbing.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


@dataclass(frozen=True)
class DecodedImage:
    width: int
    height: int
    mode: str  # "RGB" or "L"
    pixels: bytes  # row-major, top-down, 3 bytes/px (RGB) or 1 (L)
    format: str  # "PPM", "PGM", "BMP"


class ImageDecodeError(ValueError):
    pass


# ---------------------------------------------------------------------------
# PPM (P6, binary RGB) / PGM (P5, binary grayscale)
# ---------------------------------------------------------------------------


def _read_pnm_header(raw: bytes) -> tuple[list[int], int]:
    """Parse 3 whitespace/comment-separated ints after the magic; return
    ([width, height, maxval], offset-of-pixel-data)."""
    vals: list[int] = []
    i = 2  # past magic
    n = len(raw)
    while len(vals) < 3:
        while i < n and raw[i : i + 1].isspace():
            i += 1
        if i < n and raw[i : i + 1] == b"#":  # comment to end of line
            while i < n and raw[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and not raw[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ImageDecodeError("truncated PNM header")
        try:
            vals.append(int(raw[i:j]))
        except ValueError as exc:
            raise ImageDecodeError(f"bad PNM header token {raw[i:j]!r}") from exc
        i = j
    if i >= n or not raw[i : i + 1].isspace():
        raise ImageDecodeError("PNM header not terminated")
    return vals, i + 1  # exactly one whitespace byte before pixel data


def decode_pnm(raw: bytes) -> DecodedImage:
    magic = raw[:2]
    if magic not in (b"P5", b"P6"):
        raise ImageDecodeError(f"not a binary PNM: magic {magic!r}")
    (width, height, maxval), off = _read_pnm_header(raw)
    if maxval <= 0 or maxval > 255:
        raise ImageDecodeError(f"unsupported PNM maxval {maxval}")
    channels = 3 if magic == b"P6" else 1
    need = width * height * channels
    pixels = raw[off : off + need]
    if len(pixels) < need:
        raise ImageDecodeError(
            f"PNM pixel data truncated: have {len(pixels)}, need {need}"
        )
    return DecodedImage(
        width, height, "RGB" if channels == 3 else "L", bytes(pixels),
        "PPM" if channels == 3 else "PGM",
    )


def encode_ppm(width: int, height: int, mode: str, pixels: bytes) -> bytes:
    """Binary PPM/PGM writer — the thumbnail output format of the resize
    operator (round-trips through decode_pnm)."""
    if mode == "RGB":
        magic, channels = b"P6", 3
    elif mode == "L":
        magic, channels = b"P5", 1
    else:
        raise ImageDecodeError(f"unsupported mode {mode!r}")
    if len(pixels) != width * height * channels:
        raise ImageDecodeError("pixel buffer does not match dimensions")
    return magic + f"\n{width} {height}\n255\n".encode("ascii") + pixels


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, uncompressed 24-bit BGR, bottom-up or top-down)
# ---------------------------------------------------------------------------


def decode_bmp(raw: bytes) -> DecodedImage:
    if raw[:2] != b"BM":
        raise ImageDecodeError("not a BMP: missing BM magic")
    if len(raw) < 54:
        raise ImageDecodeError("BMP header truncated")
    pixel_off = struct.unpack_from("<I", raw, 10)[0]
    hdr_size = struct.unpack_from("<I", raw, 14)[0]
    if hdr_size < 40:
        raise ImageDecodeError(f"unsupported BMP DIB header size {hdr_size}")
    width, height_raw = struct.unpack_from("<ii", raw, 18)
    bpp = struct.unpack_from("<H", raw, 28)[0]
    compression = struct.unpack_from("<I", raw, 30)[0]
    if compression != 0:
        raise ImageDecodeError(f"unsupported BMP compression {compression}")
    if bpp != 24:
        raise ImageDecodeError(f"unsupported BMP bpp {bpp} (24 only)")
    if width <= 0 or height_raw == 0:
        raise ImageDecodeError(f"bad BMP dimensions {width}x{height_raw}")
    bottom_up = height_raw > 0
    height = abs(height_raw)
    row_stride = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    need = pixel_off + row_stride * height
    if len(raw) < need:
        raise ImageDecodeError(f"BMP pixel data truncated: have {len(raw)}, need {need}")
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        row = raw[pixel_off + src_y * row_stride :][: width * 3]
        base = y * width * 3
        for x in range(width):
            b, g, r = row[x * 3], row[x * 3 + 1], row[x * 3 + 2]
            out[base + x * 3] = r
            out[base + x * 3 + 1] = g
            out[base + x * 3 + 2] = b
    return DecodedImage(width, height, "RGB", bytes(out), "BMP")


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 24-bit bottom-up BMP writer (test fixture builder)."""
    if len(pixels) != width * height * 3:
        raise ImageDecodeError("pixel buffer does not match dimensions")
    row_stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - width * 3)
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = pixels[y * width * 3 : (y + 1) * width * 3]
        for x in range(width):
            r, g, b = row[x * 3], row[x * 3 + 1], row[x * 3 + 2]
            body += bytes((b, g, r))
        body += pad
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    file_hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, pixel_off)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(file_hdr + dib + body)


# ---------------------------------------------------------------------------
# dispatch + resample
# ---------------------------------------------------------------------------


def decode_bytes(raw: bytes) -> DecodedImage:
    """Decode any supported uncompressed payload by magic bytes."""
    if raw[:2] in (b"P5", b"P6"):
        return decode_pnm(raw)
    if raw[:2] == b"BM":
        return decode_bmp(raw)
    raise ImageDecodeError(f"unsupported image format (magic {raw[:4]!r})")


def resize_nearest(img: DecodedImage, new_w: int, new_h: int) -> DecodedImage:
    """Nearest-neighbor resample — deterministic (pure integer index
    arithmetic), so resized outputs are engine/test reproducible."""
    if new_w <= 0 or new_h <= 0:
        raise ImageDecodeError(f"bad target size {new_w}x{new_h}")
    ch = 3 if img.mode == "RGB" else 1
    src = img.pixels
    out = bytearray(new_w * new_h * ch)
    for y in range(new_h):
        sy = y * img.height // new_h
        src_base = sy * img.width * ch
        dst_base = y * new_w * ch
        for x in range(new_w):
            sx = x * img.width // new_w
            s = src_base + sx * ch
            d = dst_base + x * ch
            out[d : d + ch] = src[s : s + ch]
    return DecodedImage(new_w, new_h, img.mode, bytes(out), img.format)
