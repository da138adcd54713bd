"""HTTP query interface.

Analog of the reference's HTTP handler (src/Server/HTTPHandler.cpp): accepts
`GET/POST /?query=...` (query text in the URL or POST body), returns results
in the requested format (`FORMAT` clause or `default_format` parameter; TSV
by default, like the reference).  `/ping` and `/` health endpoints.  Settings
via query parameters (e.g. `?max_groups=1048576`).

Security model (matching HTTPHandler::authenticateUser + the GET readonly
rule, src/Server/HTTPHandler.cpp): every request authenticates via the
`user`/`password` params or `X-ClickHouse-User`/`X-ClickHouse-Key` headers;
GET requests execute in readonly mode.  The underlying Session is shared, so
requests are serialized under a lock and session state (user, database,
settings) is saved/restored per request — the `database` parameter is
validated as an identifier and applied without SQL interpolation.
"""
from __future__ import annotations

import json
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from ..core.errors import EngineError, UnknownTable
from ..exec.session import Session
from ..storage import formats

__all__ = ["serve", "HttpServer"]

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


class _Handler(BaseHTTPRequestHandler):
    server_version = "clickhouse-tpu/0.1"
    session: Session = None          # injected by HttpServer
    lock: threading.Lock = None      # serializes shared-session access

    def log_message(self, fmt, *args):   # quiet by default
        pass

    def _send(self, code: int, body: str, ctype="text/plain; charset=utf-8"):
        data = body.encode()
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.send_header("X-ClickHouse-Server-Display-Name", "clickhouse-tpu")
        self.end_headers()
        self.wfile.write(data)

    def _handle(self, body: Optional[str], readonly: bool):
        parsed = urllib.parse.urlparse(self.path)
        params = dict(urllib.parse.parse_qsl(parsed.query))
        query = params.pop("query", "") or (body or "")
        if parsed.path == "/ping" or (parsed.path == "/" and not query.strip()):
            self._send(200, "Ok.\n")
            return
        if parsed.path == "/metrics":
            self._send(200, self._prometheus_metrics(),
                       ctype="text/plain; version=0.0.4; charset=utf-8")
            return
        # W3C traceparent header -> query spans join the caller's trace
        # (reference: OpenTelemetryTraceContext propagation over HTTP)
        traceparent = self.headers.get("traceparent")
        trace_ctx = None
        if traceparent:
            parts = traceparent.split("-")
            if len(parts) >= 3:
                trace_ctx = (parts[1], parts[2])
        user = params.pop("user", None) \
            or self.headers.get("X-ClickHouse-User") or "default"
        password = params.pop("password", None) \
            or self.headers.get("X-ClickHouse-Key") or ""
        default_format = params.pop("default_format", "TSV")
        database = params.pop("database", None)
        settings = {}
        for k, v in params.items():
            if k in self.session.settings.as_dict():
                settings[k] = v
        try:
            with self.lock:
                s = self.session
                auth_user = s.catalog.access.authenticate(user, password)
                saved_user = s.current_user
                saved_db = s.catalog.current_database
                saved_settings = s.settings
                try:
                    s.current_user = auth_user
                    if readonly or auth_user.readonly:
                        s.settings = s.settings.copy_with({"readonly": 1})
                    if database:
                        if not _IDENT_RE.match(database):
                            raise EngineError(
                                f"Invalid database name '{database}'")
                        if database not in s.catalog.databases:
                            raise UnknownTable(
                                f"Unknown database '{database}'")
                        s.catalog.current_database = database
                    saved_trace = s.trace_context
                    s.trace_context = trace_ctx or saved_trace
                    try:
                        result = s.execute(query, settings=settings or None)
                    finally:
                        s.trace_context = saved_trace
                finally:
                    s.current_user = saved_user
                    s.catalog.current_database = saved_db
                    s.settings = saved_settings
            fmt = default_format
            out = formats.format_rows_text(result.columns, fmt) \
                if result.columns else ""
            self._send(200, out)
        except EngineError as e:
            self._send(400, f"Code: {getattr(e, 'code', 1000)}. "
                            f"DB::Exception: {e}\n")
        except Exception as e:        # pragma: no cover
            self._send(500, f"Code: 1000. Internal error: {e}\n")

    def _prometheus_metrics(self) -> str:
        """Prometheus exposition of ProfileEvents + basic gauges
        (reference: src/Server/PrometheusRequestHandler.cpp)."""
        s = self.session
        lines = []
        for name, val in sorted(s.profile_events.items()):
            lines.append(f"# TYPE clickhouse_tpu_events_{name} counter")
            lines.append(f"clickhouse_tpu_events_{name} {val}")
        lines.append("# TYPE clickhouse_tpu_queries_logged gauge")
        lines.append(f"clickhouse_tpu_queries_logged {len(s.query_log)}")
        n_tables = sum(len(db.tables)
                       for db in s.catalog.databases.values())
        lines.append("# TYPE clickhouse_tpu_tables gauge")
        lines.append(f"clickhouse_tpu_tables {n_tables}")
        return "\n".join(lines) + "\n"

    def do_GET(self):
        # the reference forces readonly for GET (HTTPHandler.cpp): GET must
        # not run DDL/DML
        self._handle(None, readonly=True)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n).decode() if n else ""
        self._handle(body, readonly=False)


class HttpServer:
    def __init__(self, session: Optional[Session] = None,
                 host: str = "127.0.0.1", port: int = 8123):
        self.session = session or Session()
        handler = type("BoundHandler", (_Handler,),
                       {"session": self.session,
                        "lock": threading.Lock()})
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def start_background(self):
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def serve_forever(self):
        self.httpd.serve_forever()

    def shutdown(self):
        self.httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)


def serve(host: str = "127.0.0.1", port: int = 8123,
          session: Optional[Session] = None):
    srv = HttpServer(session, host, port)
    print(f"clickhouse-tpu HTTP server listening on {host}:{srv.port}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
