"""Vendored pure-Python WAV (RIFF/PCM) codec.

Same role as ``imagecodec``: the audio libraries (librosa/soundfile)
are not available in this container, so the REAL decode path for
uncompressed audio is implemented directly — a chunk-walking RIFF
parser for 16-bit PCM WAV (mono or interleaved stereo) and a writer
for round-trip tests. Runs inside Arrow ``mapInPandas`` batches; the
per-payload work is pure bytes -> ints, no third-party dependency.

Only PCM16 is supported; compressed formats (MP3/OGG/FLAC) raise
``AudioDecodeError`` and callers degrade to per-row error columns.
"""

from __future__ import annotations

import struct


class AudioDecodeError(ValueError):
    pass


def parse_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a PCM16 WAV payload -> (sample_rate, n_channels, samples).

    ``samples`` are interleaved signed 16-bit ints, exactly as stored.
    Walks RIFF chunks (tolerates extra chunks like LIST/fact before
    data); validates magics, format tag, and bit depth.
    """
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioDecodeError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise AudioDecodeError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise AudioDecodeError("fmt chunk too short")
            audio_format, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_format != 1:
                raise AudioDecodeError(f"unsupported format tag {audio_format} (PCM only)")
            if bits != 16:
                raise AudioDecodeError(f"unsupported bit depth {bits} (16-bit only)")
            if channels not in (1, 2):
                raise AudioDecodeError(f"unsupported channel count {channels}")
            fmt = (rate, channels)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise AudioDecodeError("missing fmt or data chunk")
    if len(pcm) % 2:
        raise AudioDecodeError("odd PCM byte length")
    samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    return fmt[0], fmt[1], samples


def write_wav(samples: list[int], sample_rate: int, channels: int = 1) -> bytes:
    """Encode interleaved signed 16-bit samples as a PCM WAV payload."""
    pcm = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def pcm_features(samples: list[int]) -> tuple[int, int, int, int]:
    """(n, sum_of_squares, peak, zero_crossings) in exact ints — the
    engine-reproducible audio fingerprint (RMS is sqrt(sumsq/n) at the
    caller, one IEEE op)."""
    n = len(samples)
    sumsq = sum(s * s for s in samples)
    peak = max((abs(s) for s in samples), default=0)
    zc = sum(1 for a, b in zip(samples, samples[1:]) if a * b < 0)
    return n, sumsq, peak, zc
