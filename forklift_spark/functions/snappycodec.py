"""Pure-Python Snappy block-format codec (decompress + a literal-mode
compressor), from the public format description (google/snappy
format_description.txt) — no snappy library exists in this image, and
real-world Avro container files are very often snappy-coded, so without
this the Avro reader refuses files a user will actually have.

Format implemented:

- preamble: varint (little-endian base-128) uncompressed length;
- tag bytes: low 2 bits select the element type —
  00 literal (len-1 in the high 6 bits; 60..63 mean 1/2/3/4 extra
  little-endian length bytes), 01 copy with 1-byte offset (len 4..11
  in bits 2..4, offset high bits 5..7 + next byte), 10 copy with
  2-byte little-endian offset, 11 copy with 4-byte offset;
- copies may overlap themselves (offset < length ⇒ RLE-style repeat),
  byte-at-a-time semantics.

The compressor emits pure literals — spec-valid output (every decoder
must accept it) chosen for simplicity: this engine WRITES deflate by
default (better ratio, zlib-backed); snappy write support exists so a
round trip through this module is testable and so dumps destined for
snappy-expecting consumers are possible, not because the literal-mode
ratio (≈ 1.0) is useful.

Avro's snappy codec wraps each block as: snappy(data) + 4-byte
BIG-endian CRC32 of the UNCOMPRESSED data — handled in avrocodec.py.
"""

from __future__ import annotations


class SnappyError(ValueError):
    pass


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        if pos >= len(buf):
            raise SnappyError("truncated varint preamble")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7
        if shift > 35:
            raise SnappyError("varint too long")


def decompress(buf: bytes) -> bytes:
    n, pos = _read_varint(buf, 0)
    out = bytearray()
    ln = len(buf)
    while pos < ln:
        tag = buf[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            size = tag >> 2
            if size >= 60:
                extra = size - 59
                if pos + extra > ln:
                    raise SnappyError("truncated literal length")
                size = int.from_bytes(buf[pos:pos + extra], "little")
                pos += extra
            size += 1
            if pos + size > ln:
                raise SnappyError("truncated literal body")
            out += buf[pos:pos + size]
            pos += size
            continue
        if kind == 1:  # copy, 1-byte offset
            length = ((tag >> 2) & 0x07) + 4
            if pos >= ln:
                raise SnappyError("truncated copy-1 offset")
            offset = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            if pos + 2 > ln:
                raise SnappyError("truncated copy-2 offset")
            offset = int.from_bytes(buf[pos:pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            if pos + 4 > ln:
                raise SnappyError("truncated copy-4 offset")
            offset = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise SnappyError(f"copy offset {offset} out of range")
        # overlapping copies repeat already-emitted bytes (RLE)
        start = len(out) - offset
        for i in range(length):
            out.append(out[start + i])
    if len(out) != n:
        raise SnappyError(
            f"uncompressed length mismatch: preamble {n}, got {len(out)}")
    return bytes(out)


def compress(data: bytes) -> bytes:
    """Spec-valid literal-only encoding (see module docstring)."""
    out = bytearray()
    n = len(data)
    v = n
    while True:  # varint preamble
        b = v & 0x7F
        v >>= 7
        out.append(b | 0x80 if v else b)
        if not v:
            break
    pos = 0
    while pos < n:
        size = min(n - pos, 1 << 16)  # 3-byte-extended literal chunks max
        s = size - 1
        if s < 60:
            out.append(s << 2)
        elif s < (1 << 8):
            out.append(60 << 2)
            out += s.to_bytes(1, "little")
        else:
            out.append(61 << 2)
            out += s.to_bytes(2, "little")
        out += data[pos:pos + size]
        pos += size
    if n == 0:
        pass  # preamble 0, no elements — legal empty stream
    return bytes(out)
