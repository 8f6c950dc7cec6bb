"""Vendored pure-Python WARC/1.0 reader + writer (ISO 28500): the
container format every public web corpus (Common Crawl and friends)
ships in, joining the image/audio/video codecs as the web-ingest
decoder for binary-payload columns.

Parsing is Content-Length-driven — records are walked by reading the
CRLF-terminated header block and then EXACTLY Content-Length payload
bytes (never by splitting on the version magic, which legally appears
inside payloads). Malformed input raises ``WarcDecodeError`` so the
Spark-side operator can degrade per row instead of failing a scan.

A minimal HTTP/1.1 response parser rides along (``parse_http``) for
``application/http`` response records: status line, headers, body.
"""

from __future__ import annotations

CRLF = b"\r\n"


class WarcDecodeError(ValueError):
    pass


def write_warc(records: list[dict]) -> bytes:
    """Serialize records: each a dict with ``warc_type``, ``payload``
    (bytes) and optional extra WARC headers (``target_uri``,
    ``record_id``, ``content_type``)."""
    out = bytearray()
    for r in records:
        payload = r["payload"]
        headers = [
            ("WARC-Type", r["warc_type"]),
            ("Content-Length", str(len(payload))),
        ]
        if r.get("record_id"):
            headers.append(("WARC-Record-ID", r["record_id"]))
        if r.get("target_uri"):
            headers.append(("WARC-Target-URI", r["target_uri"]))
        if r.get("content_type"):
            headers.append(("Content-Type", r["content_type"]))
        out += b"WARC/1.0" + CRLF
        for k, v in headers:
            out += f"{k}: {v}".encode() + CRLF
        out += CRLF + payload + CRLF + CRLF
    return bytes(out)


def parse_warc(data: bytes) -> list[dict]:
    """Walk every record: header block to the blank line, then exactly
    Content-Length payload bytes, then the CRLF CRLF record separator."""
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 8] != b"WARC/1.0":
            raise WarcDecodeError(f"bad record magic at offset {pos}")
        head_end = data.find(CRLF + CRLF, pos)
        if head_end < 0:
            raise WarcDecodeError("unterminated header block")
        headers: dict[str, str] = {}
        for line in data[pos + 8 : head_end].split(CRLF):
            if not line:
                continue
            if b":" not in line:
                raise WarcDecodeError(f"malformed header line {line[:40]!r}")
            k, v = line.split(b":", 1)
            try:
                headers[k.strip().decode()] = v.strip().decode()
            except UnicodeDecodeError as e:
                raise WarcDecodeError("non-UTF8 header bytes") from e
        if "Content-Length" not in headers:
            raise WarcDecodeError("record missing Content-Length")
        try:
            clen = int(headers["Content-Length"])
        except ValueError as e:
            raise WarcDecodeError("non-integer Content-Length") from e
        if clen < 0:
            raise WarcDecodeError("negative Content-Length")
        body_start = head_end + 4
        body_end = body_start + clen
        if body_end + 4 > n:
            raise WarcDecodeError("truncated record payload")
        if data[body_end : body_end + 4] != CRLF + CRLF:
            raise WarcDecodeError("missing record separator")
        records.append({"headers": headers, "payload": data[body_start:body_end]})
        pos = body_end + 4
    if not records:
        raise WarcDecodeError("empty WARC")
    return records


def parse_http(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """Minimal HTTP/1.1 response parse: (status, headers, body)."""
    head_end = payload.find(CRLF + CRLF)
    if head_end < 0:
        raise WarcDecodeError("http payload missing header terminator")
    lines = payload[:head_end].split(CRLF)
    parts = lines[0].split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise WarcDecodeError("bad http status line")
    try:
        status = int(parts[1])
    except ValueError as e:
        raise WarcDecodeError("non-integer http status") from e
    headers: dict[str, str] = {}
    for line in lines[1:]:
        if b":" in line:
            k, v = line.split(b":", 1)
            try:
                headers[k.strip().decode().lower()] = v.strip().decode()
            except UnicodeDecodeError as e:
                raise WarcDecodeError("non-UTF8 http header bytes") from e
    return status, headers, payload[head_end + 4 :]
