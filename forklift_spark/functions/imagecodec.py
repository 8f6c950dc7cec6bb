"""Pure-Python image codecs: PPM/PGM, 24-bit BMP, and PNG (stdlib zlib).

No image library exists in this environment, so the multimodal "real
decode" operators (operators/multimodal.py) use these parsers: real
header parsing + pixel access — uncompressed PNM/BMP plus a full PNG
walker (chunk CRCs, IDAT inflate, scanline unfiltering, palette/alpha)
implemented on bytes/struct/zlib only. PIL, when present, remains an optional
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
# PNG (ISO/IEC 15948 / RFC 2083): 8-bit depth, color types 0 (gray),
# 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced.
# From-scratch format walker on stdlib zlib only: chunk CRC verification,
# IDAT inflate, per-scanline unfiltering (None/Sub/Up/Average/Paeth),
# palette mapping, alpha stripped to match the RGB/L feature surface.
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> channels in the filtered scanlines
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(data: bytes, width: int, height: int, ch: int) -> bytearray:
    """Reverse per-scanline filtering; returns the raw byte raster."""
    stride = width * ch
    if len(data) < (stride + 1) * height:
        raise ImageDecodeError(
            f"PNG scanline data truncated: have {len(data)}, "
            f"need {(stride + 1) * height}"
        )
    out = bytearray(stride * height)
    for y in range(height):
        ftype = data[y * (stride + 1)]
        row = data[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        base = y * stride
        prev = out[base - stride : base] if y else bytes(stride)
        if ftype == 0:  # None
            out[base : base + stride] = row
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[base + x - ch] if x >= ch else 0
                out[base + x] = (row[x] + left) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                out[base + x] = (row[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = out[base + x - ch] if x >= ch else 0
                out[base + x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = out[base + x - ch] if x >= ch else 0
                ul = prev[x - ch] if x >= ch else 0
                out[base + x] = (row[x] + _paeth(left, prev[x], ul)) & 0xFF
        else:
            raise ImageDecodeError(f"bad PNG filter type {ftype} at row {y}")
    return out


def decode_png(raw: bytes) -> DecodedImage:
    import zlib

    if raw[:8] != PNG_SIG:
        raise ImageDecodeError("not a PNG: bad signature")
    pos, n = 8, len(raw)
    ihdr = None
    palette: bytes | None = None
    idat = bytearray()
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", raw, pos)
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        if len(data) < length or pos + 12 + length > n:
            raise ImageDecodeError(f"PNG chunk {ctype!r} truncated")
        (crc,) = struct.unpack_from(">I", raw, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ImageDecodeError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = bytes(data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ImageDecodeError("PNG missing IHDR")
    width, height, depth, color, comp, filt, interlace = ihdr
    if width <= 0 or height <= 0:
        raise ImageDecodeError(f"bad PNG dimensions {width}x{height}")
    if depth != 8:
        raise ImageDecodeError(f"unsupported PNG bit depth {depth} (8 only)")
    if color not in _PNG_CHANNELS:
        raise ImageDecodeError(f"unsupported PNG color type {color}")
    if comp != 0 or filt != 0:
        raise ImageDecodeError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ImageDecodeError("interlaced PNG not supported")
    if not idat:
        raise ImageDecodeError("PNG missing IDAT")
    try:
        plain = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ImageDecodeError(f"PNG IDAT inflate failed: {exc}") from exc
    ch = _PNG_CHANNELS[color]
    px = _png_unfilter(plain, width, height, ch)
    if color == 3:  # palette -> RGB
        if palette is None:
            raise ImageDecodeError("PNG color type 3 without PLTE")
        out = bytearray(width * height * 3)
        for i, idx in enumerate(px):
            if idx * 3 + 3 > len(palette):
                raise ImageDecodeError(f"PNG palette index {idx} out of range")
            out[i * 3 : i * 3 + 3] = palette[idx * 3 : idx * 3 + 3]
        return DecodedImage(width, height, "RGB", bytes(out), "PNG")
    if color in (4, 6):  # strip alpha to the L/RGB feature surface
        keep = ch - 1
        out = bytearray(width * height * keep)
        for i in range(width * height):
            out[i * keep : (i + 1) * keep] = px[i * ch : i * ch + keep]
        return DecodedImage(
            width, height, "RGB" if keep == 3 else "L", bytes(out), "PNG"
        )
    return DecodedImage(
        width, height, "RGB" if color == 2 else "L", bytes(px), "PNG"
    )


def encode_png(width: int, height: int, mode: str, pixels: bytes) -> bytes:
    """Minimal PNG writer (color type 2/0, filter 0 rows, one IDAT) —
    round-trips through decode_png; payload builder for the real-decode
    operators and tests."""
    import zlib

    if mode == "RGB":
        color, ch = 2, 3
    elif mode == "L":
        color, ch = 0, 1
    else:
        raise ImageDecodeError(f"unsupported mode {mode!r}")
    if len(pixels) != width * height * ch:
        raise ImageDecodeError("pixel buffer does not match dimensions")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    stride = width * ch
    body = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body, 9))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# dispatch + resample
# ---------------------------------------------------------------------------


def decode_bytes(raw: bytes) -> DecodedImage:
    """Decode any supported payload by magic bytes."""
    if raw[:2] in (b"P5", b"P6"):
        return decode_pnm(raw)
    if raw[:2] == b"BM":
        return decode_bmp(raw)
    if raw[:8] == PNG_SIG:
        return decode_png(raw)
    raise ImageDecodeError(f"unsupported image format (magic {raw[:4]!r})")


def decode_headers(raw: bytes) -> DecodedImage:
    """HEADER-ONLY decode: dimensions / mode / format from the container
    header alone — the raster is never inflated, unfiltered, or even
    touched (``pixels`` is empty). This is the measured ~8x throughput
    path (scripts/media_throughput.py) for metadata-class pipelines:
    resolution filters, aspect-ratio stats, corrupt-container triage at
    ingest — anything that doesn't need pixel values. Validation is
    header-deep by design: a truncated raster passes (the raster is not
    read), a malformed header still raises ImageDecodeError."""
    if raw[:2] in (b"P5", b"P6"):
        (width, height, maxval), _off = _read_pnm_header(raw)
        if width <= 0 or height <= 0 or not (0 < maxval < 256):
            raise ImageDecodeError(f"bad PNM header {width}x{height}/{maxval}")
        return DecodedImage(
            width, height, "RGB" if raw[:2] == b"P6" else "L", b"",
            "PPM" if raw[:2] == b"P6" else "PGM",
        )
    if raw[:2] == b"BM":
        if len(raw) < 54:
            raise ImageDecodeError("BMP header truncated")
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
        return DecodedImage(width, abs(height_raw), "RGB", b"", "BMP")
    if raw[:8] == PNG_SIG:
        import zlib

        if len(raw) < 33 or raw[12:16] != b"IHDR":
            raise ImageDecodeError("PNG missing IHDR")
        data = raw[16:29]
        (crc,) = struct.unpack_from(">I", raw, 29)
        if zlib.crc32(b"IHDR" + data) & 0xFFFFFFFF != crc:
            raise ImageDecodeError("PNG chunk b'IHDR' CRC mismatch")
        width, height, depth, color, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", data
        )
        if width <= 0 or height <= 0:
            raise ImageDecodeError(f"bad PNG dimensions {width}x{height}")
        if depth != 8:
            raise ImageDecodeError(f"unsupported PNG bit depth {depth} (8 only)")
        if color not in _PNG_CHANNELS:
            raise ImageDecodeError(f"unsupported PNG color type {color}")
        if comp != 0 or filt != 0:
            raise ImageDecodeError("unsupported PNG compression/filter method")
        if interlace != 0:
            raise ImageDecodeError("interlaced PNG not supported")
        # mode mirrors decode_png's output surface (palette/alpha -> RGB/L)
        return DecodedImage(
            width, height, "L" if color in (0, 4) else "RGB", b"", "PNG"
        )
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
