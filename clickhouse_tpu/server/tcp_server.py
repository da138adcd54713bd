"""Native TCP wire protocol server.

Speaks the reference's client-server protocol (src/Core/Protocol.h:71,
src/Server/TCPHandler.cpp:319): varint-framed packets, Hello handshake with
revision negotiation, Query packets with ClientInfo + per-query settings,
Native-format Data blocks, Progress / ProfileInfo / Exception / EndOfStream.

The server advertises protocol revision 54429 (settings serialized as
strings, scalars supported) and negotiates ``min(client, server)`` — newer
clients downgrade to this revision's packet layout, exactly as the
reference's own compatibility machinery does.  Compressed framing is
supported (Query.compression = 1): Data-packet block payloads travel in
checksummed LZ4 frames with the reference's frame layout
(storage/wire_compression.py; checksum family documented there).

Wire building blocks (varints, binary strings, per-column Native data) are
shared with storage/native_format.py — the TCP Data packet is the Native
format plus a BlockInfo prefix (src/Core/BlockInfo.cpp:21).
"""
from __future__ import annotations

import io
import socket
import socketserver
import struct
import threading
from typing import BinaryIO, Dict, Optional

import numpy as np

from ..core.errors import EngineError
from ..exec.session import Session
from ..storage.native_format import (_read_binary_str, _read_column_data,
                                     _read_varuint, _write_binary_str,
                                     _write_column_data, _write_varuint)

__all__ = ["serve", "TcpServer", "NativeTcpClient"]

# server identity (Hello packet)
SERVER_NAME = "ClickHouse clickhouse-tpu"
VERSION_MAJOR = 24
VERSION_MINOR = 1
VERSION_PATCH = 0
SERVER_REVISION = 54429          # settings-as-strings, scalars

# revision gates used below (src/Core/ProtocolDefines.h)
REV_CLIENT_INFO = 54032
REV_SERVER_TIMEZONE = 54058
REV_QUOTA_KEY = 54060
REV_DISPLAY_NAME = 54372
REV_VERSION_PATCH = 54401
REV_SETTINGS_AS_STRINGS = 54429

# packet ids (src/Core/Protocol.h)
SRV_HELLO, SRV_DATA, SRV_EXCEPTION, SRV_PROGRESS, SRV_PONG = 0, 1, 2, 3, 4
SRV_END_OF_STREAM, SRV_PROFILE_INFO, SRV_TOTALS = 5, 6, 7
CLI_HELLO, CLI_QUERY, CLI_DATA, CLI_CANCEL, CLI_PING = 0, 1, 2, 3, 4
CLI_TABLES_STATUS, CLI_KEEPALIVE, CLI_SCALAR = 5, 6, 7


def _write_block(out: BinaryIO, cols: Dict[str, np.ndarray], types,
                 revision: int) -> None:
    """BlockInfo + dimensions + columns (NativeWriter::write analog)."""
    if revision > 0:                       # BlockInfo field/value pairs
        _write_varuint(out, 1)
        out.write(b"\x00")                 # is_overflows = false
        _write_varuint(out, 2)
        out.write(struct.pack("<i", -1))   # bucket_num = -1
        _write_varuint(out, 0)
    names = list(cols.keys())
    n_rows = len(cols[names[0]]) if names else 0
    _write_varuint(out, len(names))
    _write_varuint(out, n_rows)
    tmap = dict(types or [])
    for name in names:
        v = np.asarray(cols[name])
        tname = tmap.get(name)
        if tname is None:
            from ..storage.native_format import _engine_type_to_native
            has_none = v.dtype == object and any(x is None for x in v)
            tname = _engine_type_to_native(v, has_none)
        _write_binary_str(out, name)
        _write_binary_str(out, tname)
        _write_column_data(out, tname, v)


def _read_block(inp: BinaryIO, revision: int):
    """-> (cols dict, types list).  Empty block -> ({}, [])."""
    if revision > 0:
        while True:
            field = _read_varuint(inp)
            if field == 0:
                break
            if field == 1:
                inp.read(1)
            elif field == 2:
                inp.read(4)
    n_cols = _read_varuint(inp)
    n_rows = _read_varuint(inp)
    cols, types = {}, []
    for _ in range(n_cols):
        name = _read_binary_str(inp)
        tname = _read_binary_str(inp)
        cols[name] = _read_column_data(inp, tname, n_rows)
        types.append((name, tname))
    return cols, types


def _read_client_info(inp: BinaryIO, revision: int) -> dict:
    """ClientInfo::read (src/Interpreters/ClientInfo.cpp) at <= 54429."""
    info = {}
    kind = inp.read(1)[0]
    info["query_kind"] = kind
    if kind == 0:                          # empty
        return info
    info["initial_user"] = _read_binary_str(inp)
    info["initial_query_id"] = _read_binary_str(inp)
    info["initial_address"] = _read_binary_str(inp)
    iface = inp.read(1)[0]
    info["interface"] = iface
    if iface == 1:                         # TCP
        info["os_user"] = _read_binary_str(inp)
        info["client_hostname"] = _read_binary_str(inp)
        info["client_name"] = _read_binary_str(inp)
        _read_varuint(inp)                 # version major
        _read_varuint(inp)                 # version minor
        _read_varuint(inp)                 # client protocol revision
    elif iface == 2:                       # HTTP
        inp.read(1)
        _read_binary_str(inp)
    if revision >= REV_QUOTA_KEY:
        info["quota_key"] = _read_binary_str(inp)
    if iface == 1 and revision >= REV_VERSION_PATCH:
        _read_varuint(inp)                 # version patch
    return info


def _read_settings_strings(inp: BinaryIO) -> Dict[str, str]:
    """(name, flags, value-string) list terminated by an empty name."""
    out: Dict[str, str] = {}
    while True:
        name = _read_binary_str(inp)
        if not name:
            return out
        _read_varuint(inp)                 # flags (IMPORTANT / CUSTOM)
        out[name] = _read_binary_str(inp)


class _Connection:
    def __init__(self, sock: socket.socket, session: Session,
                 lock: threading.Lock):
        self.sock = sock
        self.inp = sock.makefile("rb")
        self.out = sock.makefile("wb")
        self.session = session
        self.lock = lock
        self.revision = 0                  # negotiated
        self.compression = False           # per-query, from the Query packet
        self.user = "default"
        self.database = None

    # -- send helpers --------------------------------------------------------
    def _send_hello(self):
        o = self.out
        _write_varuint(o, SRV_HELLO)
        _write_binary_str(o, SERVER_NAME)
        _write_varuint(o, VERSION_MAJOR)
        _write_varuint(o, VERSION_MINOR)
        _write_varuint(o, SERVER_REVISION)
        if self.revision >= REV_SERVER_TIMEZONE:
            _write_binary_str(o, "UTC")
        if self.revision >= REV_DISPLAY_NAME:
            _write_binary_str(o, "clickhouse-tpu")
        if self.revision >= REV_VERSION_PATCH:
            _write_varuint(o, VERSION_PATCH)
        o.flush()

    def _send_exception(self, e: Exception):
        o = self.out
        _write_varuint(o, SRV_EXCEPTION)
        o.write(struct.pack("<i", getattr(e, "code", 1)))
        _write_binary_str(o, type(e).__name__)
        _write_binary_str(o, f"{type(e).__name__}: {e}")
        _write_binary_str(o, "")           # stack trace
        o.write(b"\x00")                   # has_nested = false
        o.flush()

    def _send_data_block(self, cols, types, packet=SRV_DATA):
        o = self.out
        _write_varuint(o, packet)
        _write_binary_str(o, "")           # external table name
        if self.compression:
            from ..storage.wire_compression import write_frame
            buf = io.BytesIO()
            _write_block(buf, cols, types, self.revision)
            write_frame(o, buf.getvalue())
        else:
            _write_block(o, cols, types, self.revision)
        o.flush()

    def _read_block_maybe_compressed(self):
        if self.compression:
            from ..storage.wire_compression import read_frame
            return _read_block(io.BytesIO(read_frame(self.inp)),
                               self.revision)
        return _read_block(self.inp, self.revision)

    def _send_progress(self, rows: int):
        o = self.out
        _write_varuint(o, SRV_PROGRESS)
        _write_varuint(o, rows)            # read_rows
        _write_varuint(o, 0)               # read_bytes
        _write_varuint(o, 0)               # total_rows_to_read
        o.flush()

    def _send_end(self):
        _write_varuint(self.out, SRV_END_OF_STREAM)
        self.out.flush()

    # -- packet loop ---------------------------------------------------------
    def run(self):
        try:
            self._handshake()
            while True:
                try:
                    ptype = _read_varuint(self.inp)
                except EOFError:
                    return
                if ptype == CLI_PING:
                    _write_varuint(self.out, SRV_PONG)
                    self.out.flush()
                elif ptype == CLI_QUERY:
                    self._handle_query()
                elif ptype in (CLI_CANCEL, CLI_KEEPALIVE):
                    continue
                elif ptype == CLI_DATA:
                    # stray data outside a query: drain one block
                    _read_binary_str(self.inp)
                    self._read_block_maybe_compressed()
                else:
                    raise EngineError(f"Unknown packet {ptype} from client")
        except (EOFError, ConnectionError, BrokenPipeError):
            pass
        finally:
            try:
                self.sock.close()
            except OSError:
                pass

    def _handshake(self):
        ptype = _read_varuint(self.inp)
        if ptype != CLI_HELLO:
            raise EngineError("Expected Hello packet")
        _read_binary_str(self.inp)                  # client name
        _read_varuint(self.inp)                     # major
        _read_varuint(self.inp)                     # minor
        client_rev = _read_varuint(self.inp)
        database = _read_binary_str(self.inp)
        user = _read_binary_str(self.inp) or "default"
        password = _read_binary_str(self.inp)
        self.revision = min(client_rev, SERVER_REVISION)
        # authenticate against the shared AccessControl
        self.auth_user = self.session.catalog.access.authenticate(user,
                                                                  password)
        self.user = user
        self.database = database or None
        self._send_hello()

    def _read_external_tables(self):
        """Data packets until the empty block terminator."""
        while True:
            ptype = _read_varuint(self.inp)
            if ptype in (CLI_DATA, CLI_SCALAR):
                _read_binary_str(self.inp)          # temp table name
                cols, _ = self._read_block_maybe_compressed()
                if not cols:
                    return
            elif ptype == CLI_CANCEL:
                return
            else:
                raise EngineError(f"Unexpected packet {ptype} during data "
                                  "transfer")

    def _handle_query(self):
        inp = self.inp
        _read_binary_str(inp)                       # query id
        if self.revision >= REV_CLIENT_INFO:
            _read_client_info(inp, self.revision)
        if self.revision >= REV_SETTINGS_AS_STRINGS:
            settings = _read_settings_strings(inp)
        else:
            settings = {}
            name = _read_binary_str(inp)
            if name:
                raise EngineError("binary settings format requires revision "
                                  ">= 54429")
        _read_varuint(inp)                          # stage
        compression = _read_varuint(inp)
        query = _read_binary_str(inp)
        self.compression = bool(compression)
        self._read_external_tables()

        is_insert = query.lstrip()[:6].upper() == "INSERT" \
            and " SELECT" not in query.upper() \
            and "VALUES" not in query.upper() \
            and "INFILE" not in query.upper()
        try:
            with self.lock:
                s = self.session
                saved_user = s.current_user
                saved_db = s.catalog.current_database
                try:
                    s.current_user = self.auth_user
                    if self.database:
                        s.catalog.current_database = self.database
                    if is_insert:
                        self._run_insert_query(query)
                    else:
                        self._run_select_query(query, settings)
                finally:
                    s.current_user = saved_user
                    s.catalog.current_database = saved_db
        except EngineError as e:
            self._send_exception(e)
        except Exception as e:              # noqa: BLE001
            self._send_exception(e)

    def _run_select_query(self, query: str, settings: Dict[str, str]):
        known = {}
        sdict = self.session.settings.as_dict()
        for k, v in settings.items():
            if k in sdict:
                known[k] = v
        res = self.session.execute(query, settings=known or None)
        cols = res.columns
        types = res.types
        if cols:
            # header block (empty, structure only) then the data block
            empty = {k: np.asarray(v)[:0] for k, v in cols.items()}
            self._send_data_block(empty, types)
            self._send_progress(res.rows_read)
            self._send_data_block(cols, types)
            if res.totals is not None:
                self._send_data_block(res.totals, types, packet=SRV_TOTALS)
        self._send_end()

    def _run_insert_query(self, query: str):
        """INSERT without inline data: send the table header, receive
        blocks, insert each, then EndOfStream."""
        from ..sql import parse
        stmt = parse(query)
        db = stmt.database or self.session.catalog.current_database
        table = self.session.catalog.get_table(db, stmt.table)
        names = stmt.columns or [n for n, _ in table.schema_items()]
        schema = dict(table.schema_items())
        header = {n: np.asarray([], dtype=schema[n].np_dtype
                                if not schema[n].is_dictionary else object)
                  for n in names}
        htypes = [(n, str(schema[n])) for n in names]
        self._send_data_block(header, htypes)
        while True:
            ptype = _read_varuint(self.inp)
            if ptype == CLI_CANCEL:
                break
            if ptype != CLI_DATA:
                raise EngineError(f"Unexpected packet {ptype} during INSERT")
            _read_binary_str(self.inp)
            cols, _ = self._read_block_maybe_compressed()
            if not cols:
                break
            self.session.insert_pydict(stmt.table, cols, database=db)
        self._send_end()


class TcpServer:
    """Threaded native-protocol server over a shared Session."""

    def __init__(self, session: Optional[Session] = None,
                 host: str = "127.0.0.1", port: int = 9000):
        self.session = session or Session()
        self.lock = threading.Lock()
        outer = self

        class _TCPHandler(socketserver.BaseRequestHandler):
            def handle(self):
                _Connection(self.request, outer.session, outer.lock).run()

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = _Server((host, port), _TCPHandler)
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


def serve(host: str = "127.0.0.1", port: int = 9000,
          session: Optional[Session] = None):
    srv = TcpServer(session, host, port)
    srv.serve_forever()


# -- reference-protocol client (for tests and the CLI) -----------------------

class _CountingReader:
    """File-like wrapper counting raw bytes read off the socket."""

    def __init__(self, f):
        self._f = f
        self.count = 0

    def read(self, n=-1):
        b = self._f.read(n)
        self.count += len(b)
        return b

    def readinto(self, b):
        n = self._f.readinto(b)
        self.count += n or 0
        return n

    def seekable(self):
        return False

    def close(self):
        self._f.close()


class NativeTcpClient:
    """Minimal client speaking the same wire protocol (clickhouse-client
    analog for driving the server in tests)."""

    def __init__(self, host: str, port: int, user: str = "default",
                 password: str = "", database: str = "",
                 revision: int = 54477, compression: bool = False):
        self.compression = compression
        self.sock = socket.create_connection((host, port))
        self.inp = _CountingReader(self.sock.makefile("rb"))
        self.out = self.sock.makefile("wb")
        self.client_revision = revision
        self._hello(user, password, database)

    @property
    def bytes_received(self) -> int:
        """Raw wire bytes read so far (NetworkReceiveBytes analog — lets
        distributed tests assert states, not rows, crossed the wire)."""
        return self.inp.count

    def _hello(self, user, password, database):
        o = self.out
        _write_varuint(o, CLI_HELLO)
        _write_binary_str(o, "clickhouse-tpu-client")
        _write_varuint(o, VERSION_MAJOR)
        _write_varuint(o, VERSION_MINOR)
        _write_varuint(o, self.client_revision)
        _write_binary_str(o, database)
        _write_binary_str(o, user)
        _write_binary_str(o, password)
        o.flush()
        ptype = _read_varuint(self.inp)
        if ptype == SRV_EXCEPTION:
            raise EngineError(self._read_exception())
        assert ptype == SRV_HELLO, f"expected Hello, got {ptype}"
        self.server_name = _read_binary_str(self.inp)
        _read_varuint(self.inp)
        _read_varuint(self.inp)
        server_rev = _read_varuint(self.inp)
        self.revision = min(self.client_revision, server_rev)
        if self.revision >= REV_SERVER_TIMEZONE:
            self.timezone = _read_binary_str(self.inp)
        if self.revision >= REV_DISPLAY_NAME:
            self.display_name = _read_binary_str(self.inp)
        if self.revision >= REV_VERSION_PATCH:
            _read_varuint(self.inp)

    def _read_exception(self) -> str:
        self.inp.read(4)
        name = _read_binary_str(self.inp)
        msg = _read_binary_str(self.inp)
        _read_binary_str(self.inp)
        self.inp.read(1)
        return msg or name

    def ping(self) -> bool:
        _write_varuint(self.out, CLI_PING)
        self.out.flush()
        return _read_varuint(self.inp) == SRV_PONG

    def _send_query(self, query: str, settings=None):
        o = self.out
        _write_varuint(o, CLI_QUERY)
        _write_binary_str(o, "")           # query id
        if self.revision >= REV_CLIENT_INFO:
            o.write(b"\x01")               # query_kind = INITIAL_QUERY
            _write_binary_str(o, "default")
            _write_binary_str(o, "")
            _write_binary_str(o, "127.0.0.1:0")
            o.write(b"\x01")               # interface = TCP
            _write_binary_str(o, "user")
            _write_binary_str(o, "host")
            _write_binary_str(o, "clickhouse-tpu-client")
            _write_varuint(o, VERSION_MAJOR)
            _write_varuint(o, VERSION_MINOR)
            _write_varuint(o, self.client_revision)
            if self.revision >= REV_QUOTA_KEY:
                _write_binary_str(o, "")
            if self.revision >= REV_VERSION_PATCH:
                _write_varuint(o, VERSION_PATCH)
        for k, v in (settings or {}).items():
            _write_binary_str(o, k)
            _write_varuint(o, 0)
            _write_binary_str(o, str(v))
        _write_binary_str(o, "")           # end of settings
        _write_varuint(o, 2)               # stage = Complete
        _write_varuint(o, 1 if self.compression else 0)
        _write_binary_str(o, query)
        # end of external tables: empty block
        self._send_block({}, [])
        o.flush()

    def _send_block(self, cols, types, name=""):
        o = self.out
        _write_varuint(o, CLI_DATA)
        _write_binary_str(o, name)
        if self.compression:
            from ..storage.wire_compression import write_frame
            buf = io.BytesIO()
            _write_block(buf, cols, types, self.revision)
            write_frame(o, buf.getvalue())
        else:
            _write_block(o, cols, types, self.revision)
        o.flush()

    def _read_block_maybe_compressed(self):
        if self.compression:
            from ..storage.wire_compression import read_frame
            return _read_block(io.BytesIO(read_frame(self.inp)),
                               self.revision)
        return _read_block(self.inp, self.revision)

    def execute(self, query: str, settings=None):
        """-> (cols dict, types) for SELECTs, ({}, []) otherwise."""
        self._send_query(query, settings)
        cols_out: Dict[str, np.ndarray] = {}
        types_out = []
        while True:
            ptype = _read_varuint(self.inp)
            if ptype == SRV_END_OF_STREAM:
                return cols_out, types_out
            if ptype == SRV_EXCEPTION:
                raise EngineError(self._read_exception())
            if ptype in (SRV_DATA, SRV_TOTALS):
                _read_binary_str(self.inp)
                cols, types = self._read_block_maybe_compressed()
                if ptype == SRV_DATA and cols \
                        and any(len(v) for v in cols.values()):
                    cols_out, types_out = cols, types
                continue
            if ptype == SRV_PROGRESS:
                _read_varuint(self.inp)
                _read_varuint(self.inp)
                _read_varuint(self.inp)
                continue
            raise EngineError(f"Unexpected server packet {ptype}")

    def insert(self, table_query: str, cols: Dict[str, np.ndarray], types):
        """INSERT INTO t — send blocks after the server's header."""
        self._send_query(table_query)
        ptype = _read_varuint(self.inp)
        if ptype == SRV_EXCEPTION:
            raise EngineError(self._read_exception())
        assert ptype == SRV_DATA
        _read_binary_str(self.inp)
        self._read_block_maybe_compressed()         # header
        self._send_block(cols, types)
        self._send_block({}, [])                    # terminator
        while True:
            ptype = _read_varuint(self.inp)
            if ptype == SRV_END_OF_STREAM:
                return
            if ptype == SRV_EXCEPTION:
                raise EngineError(self._read_exception())
            if ptype in (SRV_DATA, SRV_PROGRESS):
                if ptype == SRV_DATA:
                    _read_binary_str(self.inp)
                    self._read_block_maybe_compressed()
                else:
                    _read_varuint(self.inp)
                    _read_varuint(self.inp)
                    _read_varuint(self.inp)
                continue

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass
