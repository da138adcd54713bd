"""MySQL wire-protocol server.

Analog of the reference's MySQL compatibility handler
(src/Server/MySQLHandler.cpp, packet types in src/Core/MySQL/): stock
MySQL clients/connectors can run queries over COM_QUERY with text
resultsets.

Auth mirrors the reference's constraint: the engine stores SHA-256
password digests, which cannot validate the mysql_native_password
scramble (that needs a double-SHA1 digest — the reference demands a
double_sha1 password for MySQL interop, MySQLHandler.cpp
authPluginSSL/NoSSL).  So: password-less users authenticate via the
native plugin with an empty response; users with a password get an
AuthSwitchRequest to ``mysql_clear_password``, giving the server the
cleartext to verify against the SHA-256 digest.

Implemented: handshake v10, HandshakeResponse41, COM_QUERY / COM_PING /
COM_QUIT / COM_INIT_DB / COM_FIELD_LIST (empty), text resultsets with
lenenc rows, ERR packets with SQLSTATE, CLIENT_DEPRECATE_EOF off (classic
EOF framing, which every connector still accepts).
"""
from __future__ import annotations

import socket
import socketserver
import struct
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.errors import EngineError
from ..exec.session import Session

__all__ = ["MySQLServer", "SimpleMySQLClient"]

# capability flags (include/mysql/mysql_com.h names)
_CAP_LONG_PASSWORD = 0x1
_CAP_PROTOCOL_41 = 0x200
_CAP_PLUGIN_AUTH = 0x80000
_CAP_SECURE_CONNECTION = 0x8000
_CAP_CONNECT_WITH_DB = 0x8
_CAP_PLUGIN_AUTH_LENENC = 0x200000

_SERVER_CAPS = (_CAP_LONG_PASSWORD | _CAP_PROTOCOL_41 | _CAP_PLUGIN_AUTH
                | _CAP_SECURE_CONNECTION | _CAP_CONNECT_WITH_DB
                | _CAP_PLUGIN_AUTH_LENENC)

_COM_QUIT, _COM_INIT_DB, _COM_QUERY = 0x01, 0x02, 0x03
_COM_FIELD_LIST, _COM_PING = 0x04, 0x0E

# column types (enum_field_types)
_T_LONGLONG, _T_DOUBLE, _T_VAR_STRING, _T_NEWDECIMAL = 8, 5, 253, 246
_T_DATE, _T_DATETIME, _T_FLOAT, _T_LONG = 10, 12, 4, 3


def _lenenc_int(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n < 0x10000:
        return b"\xfc" + struct.pack("<H", n)
    if n < 0x1000000:
        return b"\xfd" + struct.pack("<I", n)[:3]
    return b"\xfe" + struct.pack("<Q", n)


def _lenenc_str(b: bytes) -> bytes:
    return _lenenc_int(len(b)) + b


def _mysql_type_for(type_name: str) -> int:
    t = type_name
    for wrap in ("Nullable(", "LowCardinality("):
        if t.startswith(wrap) and t.endswith(")"):
            t = t[len(wrap):-1]
    if t in ("Int8", "Int16", "Int32", "UInt8", "UInt16"):
        return _T_LONG
    if t in ("Int64", "UInt32", "UInt64"):
        return _T_LONGLONG
    if t == "Float32":
        return _T_FLOAT
    if t == "Float64":
        return _T_DOUBLE
    if t.startswith("Decimal"):
        return _T_NEWDECIMAL
    if t in ("Date", "Date32"):
        return _T_DATE
    if t.startswith("DateTime"):
        return _T_DATETIME
    return _T_VAR_STRING


def _text_cell(x) -> Optional[bytes]:
    if x is None:
        return None
    if isinstance(x, (np.floating, float)):
        f = float(x)
        return (b"nan" if f != f else repr(f).encode())
    if isinstance(x, (np.bool_, bool)):
        return b"1" if x else b"0"
    if isinstance(x, bytes):
        return x
    return str(x).encode()


class _PacketIO:
    """MySQL packet framing: 3-byte little-endian length + sequence id."""

    def __init__(self, sock: socket.socket):
        self.inp = sock.makefile("rb")
        self.out = sock.makefile("wb")
        self.seq = 0

    def read(self) -> bytes:
        hdr = self.inp.read(4)
        if len(hdr) < 4:
            raise EOFError
        length = hdr[0] | (hdr[1] << 8) | (hdr[2] << 16)
        self.seq = hdr[3] + 1
        return self.inp.read(length)

    def write(self, payload: bytes):
        self.out.write(struct.pack("<I", len(payload))[:3]
                       + bytes([self.seq & 0xFF]) + payload)
        self.seq += 1

    def flush(self):
        self.out.flush()

    def reset_seq(self):
        self.seq = 0


class _MyConnection:
    def __init__(self, sock: socket.socket, session: Session,
                 lock: threading.Lock):
        self.sock = sock
        self.io = _PacketIO(sock)
        self.session = session
        self.lock = lock
        self.database: Optional[str] = None

    # -- small packets -------------------------------------------------------
    def _ok(self, affected: int = 0):
        self.io.write(b"\x00" + _lenenc_int(affected) + _lenenc_int(0)
                      + struct.pack("<HH", 0x0002, 0))   # autocommit, 0 warn
        self.io.flush()

    def _err(self, code: int, sqlstate: str, msg: str):
        self.io.write(b"\xff" + struct.pack("<H", code) + b"#"
                      + sqlstate.encode()[:5].ljust(5, b"0")
                      + msg.encode()[:512])
        self.io.flush()

    def _eof(self):
        self.io.write(b"\xfe" + struct.pack("<HH", 0, 0x0002))

    # -- lifecycle -----------------------------------------------------------
    def run(self):
        try:
            if not self._handshake():
                return
            while True:
                self.io.reset_seq()
                payload = self.io.read()
                cmd = payload[0]
                if cmd == _COM_QUIT:
                    return
                if cmd == _COM_PING:
                    self._ok()
                elif cmd == _COM_INIT_DB:
                    self.database = payload[1:].decode() or None
                    self._ok()
                elif cmd == _COM_FIELD_LIST:
                    self._eof()
                    self.io.flush()
                elif cmd == _COM_QUERY:
                    self._query(payload[1:].decode())
                else:
                    self._err(1047, "08S01", f"unknown command {cmd:#x}")
        except (EOFError, ConnectionError, BrokenPipeError, OSError):
            pass
        finally:
            try:
                self.sock.close()
            except OSError:
                pass

    def _handshake(self) -> bool:
        scramble = b"01234567890123456789"          # 20 bytes
        greeting = (b"\x0a" + b"8.0.0-clickhouse-tpu\x00"
                    + struct.pack("<I", 1)           # thread id
                    + scramble[:8] + b"\x00"
                    + struct.pack("<H", _SERVER_CAPS & 0xFFFF)
                    + b"\x21"                        # charset utf8
                    + struct.pack("<H", 0x0002)      # status
                    + struct.pack("<H", _SERVER_CAPS >> 16)
                    + bytes([len(scramble) + 1])
                    + b"\x00" * 10
                    + scramble[8:] + b"\x00"
                    + b"mysql_native_password\x00")
        self.io.write(greeting)
        self.io.flush()
        resp = self.io.read()
        (caps,) = struct.unpack("<I", resp[:4])
        if not caps & _CAP_PROTOCOL_41:
            self._err(1043, "08S01", "protocol 4.1 required")
            return False
        i = 4 + 4 + 1 + 23                           # caps, maxpkt, charset
        end = resp.index(b"\x00", i)
        user = resp[i:end].decode() or "default"
        i = end + 1
        if caps & _CAP_PLUGIN_AUTH_LENENC:
            alen = resp[i]
            i += 1
            auth = resp[i:i + alen]
            i += alen
        else:
            alen = resp[i]
            i += 1
            auth = resp[i:i + alen]
            i += alen
        db = None
        if caps & _CAP_CONNECT_WITH_DB and i < len(resp):
            end = resp.index(b"\x00", i)
            db = resp[i:end].decode() or None
            i = end + 1
        self.database = db

        access = self.session.catalog.access
        u = access.users.get(user)
        password = ""
        if u is not None and u.password_sha256 is not None:
            # can't validate the native scramble against SHA-256 storage:
            # switch the client to cleartext (reference requires double_sha1
            # for native auth for the same reason, MySQLHandler.cpp)
            self.io.write(b"\xfe" + b"mysql_clear_password\x00" + b"\x00")
            self.io.flush()
            password = self.io.read().rstrip(b"\x00").decode()
        elif auth not in (b"", None):
            pass                                     # empty pw: any response
        try:
            self.auth_user = access.authenticate(user, password)
        except Exception as e:                       # noqa: BLE001
            self._err(1045, "28000", str(e))
            return False
        self._ok()
        return True

    # -- COM_QUERY -----------------------------------------------------------
    def _query(self, sql: str):
        sql = sql.strip().rstrip(";")
        low = sql.lower()
        # connector housekeeping queries answered like the reference handler
        if low.startswith(("set ", "set@")) or low in ("set names utf8",):
            self._ok()
            return
        if low in ("select @@version_comment", "select version()"):
            self._send_resultset({"version()":
                                  np.array(["8.0.0-clickhouse-tpu"])},
                                 [("version()", "String")])
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
        except Exception as e:                       # noqa: BLE001
            self._err(1105, "HY000", f"{type(e).__name__}: {e}")
            return
        if not res.columns:
            self._ok()
            return
        self._send_resultset(res.columns, res.types)

    def _send_resultset(self, cols: Dict[str, np.ndarray], types):
        names = list(cols.keys())
        tmap = dict(types or [])
        self.io.write(_lenenc_int(len(names)))
        for name in names:
            mtype = _mysql_type_for(tmap.get(name, "String"))
            defn = (_lenenc_str(b"def") + _lenenc_str(b"") + _lenenc_str(b"")
                    + _lenenc_str(b"") + _lenenc_str(name.encode())
                    + _lenenc_str(name.encode())
                    + b"\x0c"                        # fixed fields length
                    + struct.pack("<H", 0x21)        # charset
                    + struct.pack("<I", 1024)        # column length
                    + bytes([mtype])
                    + struct.pack("<H", 0)           # flags
                    + b"\x00"                        # decimals
                    + b"\x00\x00")
            self.io.write(defn)
        self._eof()
        arrays = [cols[n] for n in names]
        n_rows = len(arrays[0]) if arrays else 0
        for i in range(n_rows):
            row = b""
            for a in arrays:
                cell = _text_cell(a[i])
                row += b"\xfb" if cell is None else _lenenc_str(cell)
            self.io.write(row)
        self._eof()
        self.io.flush()


class MySQLServer:
    """Threaded MySQL-protocol server over a shared Session."""

    def __init__(self, session: Optional[Session] = None,
                 host: str = "127.0.0.1", port: int = 9004):
        self.session = session or Session()
        self.lock = threading.Lock()
        outer = self

        class _Handler(socketserver.BaseRequestHandler):
            def handle(self):
                _MyConnection(self.request, outer.session, outer.lock).run()

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


# -- tiny connector-style client for tests -----------------------------------

class SimpleMySQLClient:
    """Minimal MySQL 4.1-protocol client (connector stand-in for tests)."""

    def __init__(self, host: str, port: int, user: str = "default",
                 password: str = "", database: str = ""):
        self.sock = socket.create_connection((host, port))
        self.io = _PacketIO(self.sock)
        greeting = self.io.read()
        assert greeting[0] == 0x0A, "handshake v10 expected"
        caps = _CAP_PROTOCOL_41 | _CAP_PLUGIN_AUTH | _CAP_SECURE_CONNECTION
        if database:
            caps |= _CAP_CONNECT_WITH_DB
        resp = (struct.pack("<I", caps) + struct.pack("<I", 1 << 24)
                + b"\x21" + b"\x00" * 23 + user.encode() + b"\x00"
                + b"\x00")                           # empty auth response
        if database:
            resp += database.encode() + b"\x00"
        resp += b"mysql_native_password\x00"
        self.io.write(resp)
        self.io.flush()
        pkt = self.io.read()
        if pkt[0] == 0xFE:                           # AuthSwitchRequest
            self.io.write(password.encode() + b"\x00")
            self.io.flush()
            pkt = self.io.read()
        if pkt[0] == 0xFF:
            raise EngineError(pkt[9:].decode(errors="replace"))
        assert pkt[0] == 0x00, "OK packet expected"

    @staticmethod
    def _read_lenenc(buf: bytes, i: int) -> Tuple[Optional[int], int]:
        b = buf[i]
        if b < 0xFB:
            return b, i + 1
        if b == 0xFB:
            return None, i + 1
        if b == 0xFC:
            return struct.unpack("<H", buf[i + 1:i + 3])[0], i + 3
        if b == 0xFD:
            return struct.unpack("<I", buf[i + 1:i + 4] + b"\x00")[0], i + 4
        return struct.unpack("<Q", buf[i + 1:i + 9])[0], i + 9

    def execute(self, sql: str):
        """-> (column names, rows of str|None)."""
        self.io.reset_seq()
        self.io.write(b"\x03" + sql.encode())
        self.io.flush()
        pkt = self.io.read()
        if pkt[0] == 0xFF:
            raise EngineError(pkt[9:].decode(errors="replace"))
        if pkt[0] == 0x00:
            return [], []
        n_cols, _ = self._read_lenenc(pkt, 0)
        names: List[str] = []
        for _ in range(n_cols):
            defn = self.io.read()
            i = 0
            vals = []
            for _f in range(6):                      # six lenenc strings
                ln, i = self._read_lenenc(defn, i)
                vals.append(defn[i:i + (ln or 0)].decode())
                i += ln or 0
            names.append(vals[4])                    # column name
        self.io.read()                               # EOF after definitions
        rows: List[tuple] = []
        while True:
            pkt = self.io.read()
            if pkt[0] == 0xFE and len(pkt) < 9:
                return names, rows
            if pkt[0] == 0xFF:
                raise EngineError(pkt[9:].decode(errors="replace"))
            i = 0
            row = []
            for _ in range(n_cols):
                ln, i = self._read_lenenc(pkt, i)
                if ln is None:
                    row.append(None)
                else:
                    row.append(pkt[i:i + ln].decode())
                    i += ln
            rows.append(tuple(row))

    def close(self):
        try:
            self.io.reset_seq()
            self.io.write(b"\x01")
            self.io.flush()
        except OSError:
            pass
        self.sock.close()
