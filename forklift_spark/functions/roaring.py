"""Portable 64-bit RoaringBitmapArray codec + Z85 — pure Python, no
roaring/delta runtime.

Implements the PUBLIC serialization formats Delta Lake's deletion
vectors are built from (delta.io PROTOCOL.md "Deletion Vector Format"):

- **Z85** (ZeroMQ base85 variant): Delta encodes the DV file UUID and
  inline DV bytes with Z85. 4 input bytes -> 5 chars, big-endian group
  value, most-significant digit first. Non-multiple-of-4 payloads are
  zero-padded on encode and truncated to the caller's length on decode
  (Delta's codec does the same — the descriptor's ``sizeInBytes`` is the
  true length).
- **Portable RoaringBitmapArray** (the 64-bit "portable" format in
  delta's RoaringBitmapArray + the interoperable 32-bit RoaringBitmap
  spec, github.com/RoaringBitmap/RoaringFormatSpec): 4-byte LE magic
  ``1681511377``, 8-byte LE bitmap count, then per 32-bit bitmap a
  4-byte LE high-word key followed by a standard portable RoaringBitmap
  (cookie 12346/12347, descriptive header, optional offsets, array /
  bitset / run containers — all little-endian).

The decoder handles every container type and both cookies (real Delta
writers emit run containers); the encoder always writes the
no-run-container layout (cookie 12346), which every conformant reader
accepts. Encode exists so tests can build DV fixtures BY HAND and so
the incremental Delta export can materialize masks — decode is the
interop-critical path.

Reference parity note: the reference engine has no lakehouse interop;
this backs the beyond-reference Delta reader (connections/deltalite.py).
"""

from __future__ import annotations

import struct
from collections.abc import Iterable

PORTABLE_MAGIC = 1681511377

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4


def z85_encode(data: bytes) -> str:
    """Z85-encode, zero-padding to a 4-byte boundary (Delta's codec
    behavior for inline DVs; pass the true length out of band)."""
    pad = (-len(data)) % 4
    data = data + b"\x00" * pad
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str, length: int | None = None) -> bytes:
    if len(text) % 5:
        raise ValueError(f"Z85 input length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i:i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        out += v.to_bytes(4, "big")
    return bytes(out[:length] if length is not None else out)


def serialize_roaring64(values: Iterable[int]) -> bytes:
    """Serialize sorted-deduped uint64 values as a portable
    RoaringBitmapArray (no-run-container 32-bit bitmaps)."""
    vals = sorted(set(int(v) for v in values))
    if vals and (vals[0] < 0 or vals[-1] >> 64):
        raise ValueError("values must be uint64")
    # bucket by high 32 bits, then by high 16 within each bitmap
    bitmaps: dict[int, dict[int, list[int]]] = {}
    for v in vals:
        hi32, lo32 = v >> 32, v & 0xFFFFFFFF
        key16, lo16 = lo32 >> 16, lo32 & 0xFFFF
        bitmaps.setdefault(hi32, {}).setdefault(key16, []).append(lo16)
    out = bytearray()
    out += struct.pack("<i", PORTABLE_MAGIC)
    out += struct.pack("<q", len(bitmaps))
    for hi32 in sorted(bitmaps):
        out += struct.pack("<i", hi32)
        out += _serialize_rb32(bitmaps[hi32])
    return bytes(out)


def _serialize_rb32(containers: dict[int, list[int]]) -> bytes:
    keys = sorted(containers)
    n = len(keys)
    out = bytearray()
    out += struct.pack("<I", _SERIAL_COOKIE_NO_RUN)
    out += struct.pack("<i", n)
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header (mandatory with the no-run cookie): byte offsets
    # from the START of this bitmap's serialization
    header = 4 + 4 + 4 * n + 4 * n
    off = header
    offsets = []
    for k in keys:
        offsets.append(off)
        card = len(containers[k])
        off += 8192 if card > 4096 else 2 * card
    for o in offsets:
        out += struct.pack("<i", o)
    for k in keys:
        vals = containers[k]
        if len(vals) > 4096:  # bitset container: 1024 uint64 words
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            out += struct.pack("<1024Q", *words)
        else:  # array container
            out += struct.pack(f"<{len(vals)}H", *vals)
    return bytes(out)


def deserialize_roaring64(data: bytes) -> list[int]:
    """Decode a portable RoaringBitmapArray into a sorted uint64 list."""
    if len(data) < 12:
        raise ValueError("truncated RoaringBitmapArray (no header)")
    magic, = struct.unpack_from("<i", data, 0)
    if magic != PORTABLE_MAGIC:
        raise ValueError(
            f"bad RoaringBitmapArray magic {magic} (want {PORTABLE_MAGIC})"
        )
    nmaps, = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for _ in range(nmaps):
        hi32, = struct.unpack_from("<i", data, pos)
        pos += 4
        lo_vals, pos = _deserialize_rb32(data, pos)
        base = (hi32 & 0xFFFFFFFF) << 32
        out.extend(base | v for v in lo_vals)
    return out


def _deserialize_rb32(data: bytes, pos: int) -> tuple[list[int], int]:
    """Decode one 32-bit portable RoaringBitmap starting at ``pos``;
    returns (sorted uint32 values, next position)."""
    start = pos
    cookie_word, = struct.unpack_from("<I", data, pos)
    cookie = cookie_word & 0xFFFF
    if cookie == _SERIAL_COOKIE_RUN:
        n = (cookie_word >> 16) + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_flags = data[pos:pos + nbytes]
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        pos += 4
        n, = struct.unpack_from("<i", data, pos)
        pos += 4
        run_flags = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"bad RoaringBitmap cookie {cookie}")
    keys_cards = []
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", data, pos)
        pos += 4
        keys_cards.append((k, cm1 + 1))
    if has_offsets:
        offsets = list(struct.unpack_from(f"<{n}i", data, pos))
        pos += 4 * n
    else:
        offsets = None
    out: list[int] = []
    for i, (k, card) in enumerate(keys_cards):
        if offsets is not None:
            pos = start + offsets[i]
        base = k << 16
        is_run = bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            nruns, = struct.unpack_from("<H", data, pos)
            pos += 2
            for _ in range(nruns):
                s, ln = struct.unpack_from("<HH", data, pos)
                pos += 4
                out.extend(base | v for v in range(s, s + ln + 1))
        elif card > 4096:  # bitset container
            words = struct.unpack_from("<1024Q", data, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    out.append(base | (wi << 6) | b.bit_length() - 1)
                    w ^= b
        else:  # array container
            vals = struct.unpack_from(f"<{card}H", data, pos)
            pos += 2 * card
            out.extend(base | v for v in vals)
    return out, pos
