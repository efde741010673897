"""Minimal pure-python PostgreSQL v3 wire-protocol client (DB-API-ish).

Implements exactly what the engine's JDBC-less environments need to run
the upsert sink (ingest/jdbc.py) against a REAL PostgreSQL server:

- startup + trust authentication over a unix or TCP socket,
- the EXTENDED query protocol (Parse / Bind / Execute / Sync) so the
  ``%s`` bind parameters of the generated dialect SQL stay true bind
  parameters on the wire — never client-side literal substitution,
- ``executemany`` pipelining: one Parse, then Bind+Execute per row, one
  Sync — a single socket write per batch (the protocol explicitly
  permits this; the unnamed statement survives until the next Parse),
- the simple query protocol (``Query``) for BEGIN/COMMIT and text-mode
  SELECT verification.

Protocol layout follows the public PostgreSQL Frontend/Backend Protocol
documentation (v3, postgresql.org/docs/current/protocol.html). Only
AuthenticationOk (trust) is supported — this client exists for
loopback test/dev clusters, not production auth (MD5/SCRAM are named
refusals below). Parameters and results are text-format.

Counterpart of the reference's pymysql usage (ref delta_load.py:169-202)
re-expressed for an environment that ships a postgres server binary but
no driver; the sink's ``connection_factory`` contract (a picklable
zero-arg callable run on each executor) is satisfied by
``lambda: connect(...)`` via :func:`factory`.
"""

from __future__ import annotations

import socket
import struct


class PgError(Exception):
    """Server ErrorResponse, with the severity/code/message fields."""


def _encode_param(v) -> bytes | None:
    if v is None:
        return None
    if isinstance(v, bool):  # bool is an int subclass — check first
        return b"t" if v else b"f"
    if isinstance(v, (bytes, bytearray, memoryview)):
        # Spark BinaryType rows surface as bytearray in foreachPartition;
        # normalize all three buffer types through bytea hex format
        return b"\\x" + bytes(v).hex().encode()
    return str(v).encode()


def _pyformat_to_numeric(sql: str) -> str:
    """Translate DB-API ``%s`` placeholders to postgres ``$1..$n``.

    The generated dialect SQL never contains string literals (bind
    params only, ingest/jdbc.py), so a plain split is exact here; a
    literal ``%%s`` escape is not part of that contract.
    """
    parts = sql.split("%s")
    out = [parts[0]]
    for i, p in enumerate(parts[1:], start=1):
        out.append(f"${i}")
        out.append(p)
    return "".join(out)


class _Cursor:
    def __init__(self, conn: "Connection"):
        self._conn = conn
        self.description: list[tuple] | None = None
        self.rowcount = -1
        self._rows: list[tuple] = []

    def execute(self, sql: str, params: tuple = ()) -> None:
        self._run(sql, [tuple(params)] if params else None)

    def executemany(self, sql: str, seq) -> None:
        self._run(sql, [tuple(p) for p in seq])

    def fetchall(self) -> list[tuple]:
        return list(self._rows)

    def _run(self, sql: str, param_rows) -> None:
        c = self._conn
        c._begin_if_needed()
        if not param_rows:
            self._rows, self.description, self.rowcount = c._simple_query(sql)
            return
        self._rows, self.description, self.rowcount = c._extended_query(
            _pyformat_to_numeric(sql), param_rows
        )

    def close(self) -> None:  # DB-API surface; nothing to free
        pass


class Connection:
    """One backend session. Not thread-safe (one socket, one state)."""

    def __init__(
        self,
        host: str = "/tmp",
        port: int = 5432,
        user: str = "postgres",
        database: str = "postgres",
        timeout: float = 30.0,
    ):
        if host.startswith("/"):
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.settimeout(timeout)
            self._sock.connect(f"{host}/.s.PGSQL.{port}")
        else:
            self._sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = b""
        self._in_tx = False
        body = b"".join(
            [
                struct.pack("!i", 196608),  # protocol 3.0
                b"user\x00", user.encode(), b"\x00",
                b"database\x00", database.encode(), b"\x00",
                b"\x00",
            ]
        )
        self._sock.sendall(struct.pack("!i", len(body) + 4) + body)
        self._handshake()

    # -- wire plumbing ----------------------------------------------------

    def _read_msg(self) -> tuple[bytes, bytes]:
        while len(self._buf) < 5:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PgError("server closed connection")
            self._buf += chunk
        tag = self._buf[0:1]
        (length,) = struct.unpack("!i", self._buf[1:5])
        while len(self._buf) < 1 + length:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PgError("server closed connection")
            self._buf += chunk
        payload = self._buf[5 : 1 + length]
        self._buf = self._buf[1 + length :]
        return tag, payload

    @staticmethod
    def _error_fields(payload: bytes) -> str:
        fields = {}
        for part in payload.split(b"\x00"):
            if part:
                fields[chr(part[0])] = part[1:].decode("utf-8", "replace")
        return f"{fields.get('S', '?')} {fields.get('C', '?')}: {fields.get('M', '?')}"

    def _handshake(self) -> None:
        while True:
            tag, payload = self._read_msg()
            if tag == b"R":
                (code,) = struct.unpack("!i", payload[:4])
                if code != 0:
                    raise PgError(
                        f"authentication method {code} not supported "
                        "(trust only; MD5/SCRAM are out of scope)"
                    )
            elif tag == b"E":
                raise PgError(self._error_fields(payload))
            elif tag == b"Z":  # ReadyForQuery
                return
            # 'S' ParameterStatus / 'K' BackendKeyData / 'N' notices: skip

    @staticmethod
    def _msg(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("!i", len(body) + 4) + body

    def _collect_results(self):
        """Drain until ReadyForQuery; return (rows, description, rowcount)."""
        rows: list[tuple] = []
        desc = None
        rowcount = -1
        err = None
        while True:
            tag, payload = self._read_msg()
            if tag == b"T":  # RowDescription
                (nf,) = struct.unpack("!h", payload[:2])
                off, desc = 2, []
                for _ in range(nf):
                    end = payload.index(b"\x00", off)
                    name = payload[off:end].decode()
                    off = end + 1 + 18  # tableoid(4) attnum(2) typoid(4) typlen(2) typmod(4) fmt(2)
                    desc.append((name, None, None, None, None, None, None))
            elif tag == b"D":  # DataRow (text format)
                (nf,) = struct.unpack("!h", payload[:2])
                off, vals = 2, []
                for _ in range(nf):
                    (ln,) = struct.unpack("!i", payload[off : off + 4])
                    off += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(payload[off : off + ln].decode())
                        off += ln
                rows.append(tuple(vals))
            elif tag == b"C":  # CommandComplete, e.g. b"INSERT 0 1"
                words = payload.rstrip(b"\x00").split()
                if words and words[-1].isdigit():
                    n = int(words[-1])
                    rowcount = n if rowcount < 0 else rowcount + n
            elif tag == b"E":
                err = self._error_fields(payload)
            elif tag == b"Z":
                if err:
                    raise PgError(err)
                return rows, desc, rowcount
            # '1' ParseComplete / '2' BindComplete / 'n' NoData /
            # 'N' NoticeResponse / 's' PortalSuspended: skip

    # -- query surfaces ---------------------------------------------------

    def _simple_query(self, sql: str):
        self._sock.sendall(self._msg(b"Q", sql.encode() + b"\x00"))
        return self._collect_results()

    def _extended_query(self, sql: str, param_rows):
        parse = self._msg(b"P", b"\x00" + sql.encode() + b"\x00" + struct.pack("!h", 0))
        chunks = [parse]
        for params in param_rows:
            body = [b"\x00\x00", struct.pack("!h", 0)]  # portal, stmt, 0 fmts
            body.append(struct.pack("!h", len(params)))
            for p in params:
                enc = _encode_param(p)
                if enc is None:
                    body.append(struct.pack("!i", -1))
                else:
                    body.append(struct.pack("!i", len(enc)) + enc)
            body.append(struct.pack("!h", 0))  # result fmts: default text
            chunks.append(self._msg(b"B", b"".join(body)))
            chunks.append(self._msg(b"E", b"\x00" + struct.pack("!i", 0)))
        chunks.append(self._msg(b"S", b""))
        self._sock.sendall(b"".join(chunks))  # one write: the pipeline
        return self._collect_results()

    def _begin_if_needed(self) -> None:
        if not self._in_tx:
            self._simple_query("BEGIN")
            self._in_tx = True

    # -- DB-API surface ---------------------------------------------------

    def cursor(self) -> _Cursor:
        return _Cursor(self)

    def commit(self) -> None:
        if self._in_tx:
            self._simple_query("COMMIT")
            self._in_tx = False

    def rollback(self) -> None:
        if self._in_tx:
            self._simple_query("ROLLBACK")
            self._in_tx = False

    def close(self) -> None:
        # cleanup must never raise: the implicit rollback is a simple
        # query, so a server already in an error/shutdown state answers
        # it with an ErrorResponse (PgError), not just socket errors
        try:
            if self._in_tx:
                self.rollback()
            self._sock.sendall(self._msg(b"X", b""))  # Terminate
        except (OSError, PgError):
            pass
        finally:
            self._sock.close()


def connect(**kw) -> Connection:
    return Connection(**kw)


def factory(**kw):
    """Picklable zero-arg connection factory for
    :func:`ingest.jdbc.write_jdbc_upsert` (closes over plain strings)."""
    import functools

    return functools.partial(Connection, **kw)
