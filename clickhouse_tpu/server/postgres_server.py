"""PostgreSQL wire-protocol (v3) server.

Analog of the reference's PostgreSQL compatibility handler
(src/Server/PostgreSQLHandler.cpp, protocol types in
src/Core/PostgreSQLProtocol.h): any stock psql / libpq / psycopg client can
connect and run queries against the engine over the simple-query flow.

Implemented surface (matching the reference handler, which also only
supports the simple-query protocol):
  * SSLRequest -> 'N' (no TLS), GSSENCRequest -> 'N'
  * StartupMessage (user/database) -> cleartext password auth against the
    shared AccessControl (AuthenticationCleartextPassword, code 3), or
    AuthenticationOk immediately for password-less users
  * ParameterStatus / BackendKeyData / ReadyForQuery
  * 'Q' simple query -> RowDescription + DataRow* + CommandComplete
  * errors -> ErrorResponse ('S'/'C'/'M' fields) + ReadyForQuery
  * 'X' Terminate; empty query -> EmptyQueryResponse

Values travel in text format (format code 0) — psql's default — with
engine types mapped onto standard Postgres OIDs.
"""
from __future__ import annotations

import socket
import socketserver
import struct
import threading
from typing import BinaryIO, Dict, List, Optional, Tuple

import numpy as np

from ..core.errors import EngineError
from ..exec.session import Session

__all__ = ["PostgresServer", "SimplePgClient"]

_PROTO_V3 = 196608            # 3.0
_SSL_REQUEST = 80877103
_GSSENC_REQUEST = 80877104
_CANCEL_REQUEST = 80877102

# Postgres type OIDs (pg_catalog.pg_type)
_OID_BOOL, _OID_INT2, _OID_INT4, _OID_INT8 = 16, 21, 23, 20
_OID_FLOAT4, _OID_FLOAT8, _OID_TEXT, _OID_NUMERIC = 700, 701, 25, 1700
_OID_DATE, _OID_TIMESTAMP = 1082, 1114


def _oid_for(type_name: str) -> int:
    t = type_name
    if t.startswith("Nullable(") and t.endswith(")"):
        t = t[9:-1]
    if t.startswith("LowCardinality(") and t.endswith(")"):
        t = t[15:-1]
    if t in ("Int8", "Int16", "UInt8"):
        return _OID_INT2
    if t in ("Int32", "UInt16"):
        return _OID_INT4
    if t in ("Int64", "UInt32", "UInt64", "Int128", "UInt128"):
        return _OID_INT8
    if t == "Float32":
        return _OID_FLOAT4
    if t == "Float64":
        return _OID_FLOAT8
    if t.startswith("Decimal"):
        return _OID_NUMERIC
    if t in ("Date", "Date32"):
        return _OID_DATE
    if t.startswith("DateTime"):
        return _OID_TIMESTAMP
    if t == "Bool":
        return _OID_BOOL
    return _OID_TEXT


def _text_cell(x) -> Optional[bytes]:
    """Postgres text-format rendering; None -> SQL NULL."""
    if x is None:
        return None
    if isinstance(x, (np.floating, float)):
        f = float(x)
        if f != f:
            return b"NaN"
        if f == int(f) and abs(f) < 1e15:
            return repr(f).encode()
        return repr(f).encode()
    if isinstance(x, (np.bool_, bool)):
        return b"t" if x else b"f"
    if isinstance(x, bytes):
        return x
    return str(x).encode()


# -- message helpers ----------------------------------------------------------

def _send(out: BinaryIO, tag: bytes, payload: bytes) -> None:
    out.write(tag + struct.pack(">i", len(payload) + 4) + payload)


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def _read_msg(inp: BinaryIO) -> Tuple[bytes, bytes]:
    tag = inp.read(1)
    if not tag:
        raise EOFError
    (length,) = struct.unpack(">i", inp.read(4))
    return tag, inp.read(length - 4)


class _PgConnection:
    def __init__(self, sock: socket.socket, session: Session,
                 lock: threading.Lock):
        self.sock = sock
        self.inp = sock.makefile("rb")
        self.out = sock.makefile("wb")
        self.session = session
        self.lock = lock
        self.user = "default"
        self.database: Optional[str] = None

    def run(self):
        try:
            if not self._startup():
                return
            self._ready()
            while True:
                tag, payload = _read_msg(self.inp)
                if tag == b"X":
                    return
                if tag == b"Q":
                    self._simple_query(payload.rstrip(b"\x00").decode())
                    self._ready()
                elif tag in (b"P", b"B", b"D", b"E", b"S", b"C"):
                    # extended protocol unsupported, like the reference's
                    # handler before it grew partial support: report cleanly
                    self._error("0A000",
                                "extended query protocol is not supported; "
                                "use simple queries")
                    self._ready()
                elif tag == b"p":
                    continue                 # stray password message
                else:
                    self._error("08P01", f"unknown frontend message "
                                         f"{tag!r}")
                    self._ready()
        except (EOFError, ConnectionError, BrokenPipeError, OSError):
            pass
        finally:
            try:
                self.sock.close()
            except OSError:
                pass

    # -- startup / auth ------------------------------------------------------
    def _startup(self) -> bool:
        while True:
            (length,) = struct.unpack(">i", self.inp.read(4))
            body = self.inp.read(length - 4)
            (code,) = struct.unpack(">i", body[:4])
            if code in (_SSL_REQUEST, _GSSENC_REQUEST):
                self.out.write(b"N")
                self.out.flush()
                continue
            if code == _CANCEL_REQUEST:
                return False
            if code != _PROTO_V3:
                self._error("08P01", f"unsupported protocol {code >> 16}."
                                     f"{code & 0xFFFF}")
                return False
            break
        params: Dict[str, str] = {}
        parts = body[4:].split(b"\x00")
        for k, v in zip(parts[::2], parts[1::2]):
            if k:
                params[k.decode()] = v.decode()
        self.user = params.get("user", "default")
        self.database = params.get("database") or None

        access = self.session.catalog.access
        u = access.users.get(self.user)
        password = ""
        if u is not None and u.password_sha256 is not None:
            _send(self.out, b"R", struct.pack(">i", 3))   # cleartext
            self.out.flush()
            tag, payload = _read_msg(self.inp)
            if tag != b"p":
                self._error("28P01", "password message expected")
                return False
            password = payload.rstrip(b"\x00").decode()
        try:
            self.auth_user = access.authenticate(self.user, password)
        except Exception as e:               # noqa: BLE001
            self._error("28P01", str(e))
            return False
        _send(self.out, b"R", struct.pack(">i", 0))       # AuthenticationOk
        for k, v in (("server_version", "16.0"),
                     ("server_encoding", "UTF8"),
                     ("client_encoding", "UTF8"),
                     ("DateStyle", "ISO"),
                     ("integer_datetimes", "on")):
            _send(self.out, b"S", _cstr(k) + _cstr(v))
        _send(self.out, b"K", struct.pack(">ii", 1, 0))   # BackendKeyData
        self.out.flush()
        return True

    def _ready(self):
        _send(self.out, b"Z", b"I")
        self.out.flush()

    def _error(self, sqlstate: str, msg: str):
        payload = (b"S" + _cstr("ERROR") + b"C" + _cstr(sqlstate)
                   + b"M" + _cstr(msg) + b"\x00")
        _send(self.out, b"E", payload)
        self.out.flush()

    # -- query ---------------------------------------------------------------
    def _simple_query(self, sql: str):
        sql = sql.strip().rstrip(";").strip()
        if not sql:
            _send(self.out, b"I", b"")       # EmptyQueryResponse
            self.out.flush()
            return
        try:
            with self.lock:
                s = self.session
                saved_user = s.current_user
                saved_db = s.catalog.current_database
                try:
                    s.current_user = self.auth_user
                    if self.database:
                        s.catalog.current_database = self.database
                    res = s.execute(sql)
                finally:
                    s.current_user = saved_user
                    s.catalog.current_database = saved_db
        except Exception as e:               # noqa: BLE001
            self._error("XX000", f"{type(e).__name__}: {e}")
            return
        cols = res.columns
        if not cols:
            _send(self.out, b"C", _cstr("OK"))
            self.out.flush()
            return
        names = list(cols.keys())
        tmap = dict(res.types or [])
        desc = struct.pack(">h", len(names))
        for name in names:
            desc += (_cstr(name)
                     + struct.pack(">ihihih", 0, 0,
                                   _oid_for(tmap.get(name, "String")),
                                   -1, -1, 0))
        _send(self.out, b"T", desc)
        arrays = [cols[n] for n in names]
        n_rows = len(arrays[0]) if arrays else 0
        for i in range(n_rows):
            row = struct.pack(">h", len(names))
            for a in arrays:
                cell = _text_cell(a[i])
                if cell is None:
                    row += struct.pack(">i", -1)
                else:
                    row += struct.pack(">i", len(cell)) + cell
            _send(self.out, b"D", row)
        _send(self.out, b"C", _cstr(f"SELECT {n_rows}"))
        self.out.flush()


class PostgresServer:
    """Threaded PostgreSQL-protocol server over a shared Session."""

    def __init__(self, session: Optional[Session] = None,
                 host: str = "127.0.0.1", port: int = 9005):
        self.session = session or Session()
        self.lock = threading.Lock()
        outer = self

        class _Handler(socketserver.BaseRequestHandler):
            def handle(self):
                _PgConnection(self.request, outer.session, outer.lock).run()

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = _Server((host, port), _Handler)
        self.host, self.port = self._server.server_address

    def serve_forever(self):
        self._server.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self._server.shutdown()
        self._server.server_close()


# -- tiny libpq-style client for tests ---------------------------------------

class SimplePgClient:
    """Minimal Postgres v3 client (psql stand-in for driving the server in
    tests — mirrors what any libpq client sends on the wire)."""

    def __init__(self, host: str, port: int, user: str = "default",
                 password: str = "", database: str = ""):
        self.sock = socket.create_connection((host, port))
        self.inp = self.sock.makefile("rb")
        self.out = self.sock.makefile("wb")
        params = _cstr("user") + _cstr(user)
        if database:
            params += _cstr("database") + _cstr(database)
        body = struct.pack(">i", _PROTO_V3) + params + b"\x00"
        self.out.write(struct.pack(">i", len(body) + 4) + body)
        self.out.flush()
        self.params: Dict[str, str] = {}
        while True:
            tag, payload = _read_msg(self.inp)
            if tag == b"R":
                (code,) = struct.unpack(">i", payload[:4])
                if code == 3:
                    _send(self.out, b"p", _cstr(password))
                    self.out.flush()
                elif code != 0:
                    raise EngineError(f"unsupported auth code {code}")
            elif tag == b"S":
                k, v = payload.split(b"\x00")[:2]
                self.params[k.decode()] = v.decode()
            elif tag == b"E":
                raise EngineError(self._parse_error(payload))
            elif tag == b"Z":
                return
            # 'K' BackendKeyData ignored

    @staticmethod
    def _parse_error(payload: bytes) -> str:
        msg = ""
        i = 0
        while i < len(payload) and payload[i:i + 1] != b"\x00":
            field = payload[i:i + 1]
            end = payload.index(b"\x00", i + 1)
            if field == b"M":
                msg = payload[i + 1:end].decode()
            i = end + 1
        return msg or "postgres error"

    def execute(self, sql: str):
        """-> (column names, rows of str|None).  Raises on ErrorResponse."""
        _send(self.out, b"Q", _cstr(sql))
        self.out.flush()
        names: List[str] = []
        rows: List[tuple] = []
        err = None
        while True:
            tag, payload = _read_msg(self.inp)
            if tag == b"Z":
                if err:
                    raise EngineError(err)
                return names, rows
            if tag == b"E":
                err = self._parse_error(payload)
            elif tag == b"T":
                (n,) = struct.unpack(">h", payload[:2])
                i = 2
                for _ in range(n):
                    end = payload.index(b"\x00", i)
                    names.append(payload[i:end].decode())
                    i = end + 1 + 18
            elif tag == b"D":
                (n,) = struct.unpack(">h", payload[:2])
                i = 2
                row = []
                for _ in range(n):
                    (ln,) = struct.unpack(">i", payload[i:i + 4])
                    i += 4
                    if ln < 0:
                        row.append(None)
                    else:
                        row.append(payload[i:i + ln].decode())
                        i += ln
                rows.append(tuple(row))
            # 'C' CommandComplete / 'I' Empty ignored

    def close(self):
        try:
            _send(self.out, b"X", b"")
            self.out.flush()
        except OSError:
            pass
        self.sock.close()
