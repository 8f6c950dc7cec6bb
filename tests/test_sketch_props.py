"""Property-based coverage for the session's pure-deterministic
machinery: the quantile-sketch bucket math (exercised via a pure-Python
twin of the integer bucketing — the Spark expressions implement exactly
this arithmetic, pinned by tests/test_sketch.py), and the WARC codec
round trip over adversarial payloads."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from forklift_spark.functions.warccodec import (
    WarcDecodeError,
    parse_http,
    parse_warc,
    write_warc,
)

MANTISSA = 5


def _bucket(v: int) -> tuple[int, int]:
    """Pure-Python twin of qsketch_build's integer bucketing."""
    bits = v.bit_length()
    shift = max(bits - (MANTISSA + 1), 0)
    step = 1 << shift
    lo = v - (v % step)
    return lo, lo + step - 1


@given(st.integers(min_value=1, max_value=2**62))
def test_qsketch_bucket_contains_value_with_relative_width_bound(v):
    lo, hi = _bucket(v)
    assert lo <= v <= hi
    width = hi - lo + 1
    # relative width <= 2^-MANTISSA (small values: exact buckets)
    assert width == 1 or width * (1 << MANTISSA) <= lo * 2
    assert lo % width == 0  # aligned power-of-two bucket


@given(st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=60))
def test_qsketch_rank_estimate_error_bound_model(vals):
    """Rank extraction over the pure-Python sketch: every percentile
    estimate is within the bucket of the true rank statistic."""
    from collections import Counter

    buckets = Counter(_bucket(v) for v in vals)
    ordered = sorted(buckets.items())
    n = len(vals)
    xs = sorted(vals)
    for pct in (1, 25, 50, 75, 99, 100):
        r = (n * pct + 99) // 100
        cum = 0
        for (lo, hi), cnt in ordered:
            if cum + cnt >= r:
                est = lo + ((hi - lo) * (r - cum)) // cnt
                true = xs[r - 1]
                assert lo <= true <= hi  # true rank stat is in the owner bucket
                assert abs(est - true) <= hi - lo
                break
            cum += cnt


# payloads that attack the parser: CRLFs, record magic, colons, header
# terminators embedded mid-payload
_payloads = st.binary(max_size=64).map(
    lambda b: b + b"\r\n\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\n"[: len(b) % 40]
)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["response", "request", "warcinfo", "metadata"]),
            _payloads,
            st.one_of(st.none(), st.text(alphabet="abc:/.", max_size=16)),
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=200)
def test_warc_roundtrip_is_lossless_for_any_payload(records):
    recs = [
        {"warc_type": t, "payload": p, **({"target_uri": u} if u else {})}
        for t, p, u in records
    ]
    back = parse_warc(write_warc(recs))
    assert len(back) == len(recs)
    for want, got in zip(recs, back):
        assert got["payload"] == want["payload"]
        assert got["headers"]["WARC-Type"] == want["warc_type"]
        if want.get("target_uri"):
            assert got["headers"]["WARC-Target-URI"] == want["target_uri"]


@given(st.binary(max_size=120))
@settings(max_examples=300)
def test_warc_parser_never_crashes_only_raises(data):
    """Arbitrary bytes either parse (prefix happens to be valid) or
    raise WarcDecodeError — never IndexError/UnicodeError/etc."""
    try:
        parse_warc(data)
    except WarcDecodeError:
        pass


@given(st.binary(max_size=80))
@settings(max_examples=300)
def test_http_parser_never_crashes_only_raises(data):
    try:
        parse_http(data)
    except WarcDecodeError:
        pass


def test_warc_non_utf8_header_bytes_raise_decode_error():
    import pytest

    data = b"WARC/1.0\r\n\xff\xfe: x\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    with pytest.raises(WarcDecodeError):
        parse_warc(data)
    http = b"HTTP/1.1 200 OK\r\n\xff: y\r\n\r\nbody"
    with pytest.raises(WarcDecodeError):
        parse_http(http)
