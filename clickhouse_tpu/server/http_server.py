"""HTTP query interface.

Analog of the reference's HTTP handler (src/Server/HTTPHandler.cpp): accepts
`GET/POST /?query=...` (query text in the URL or POST body), returns results
in the requested format (`FORMAT` clause or `default_format` parameter; TSV
by default, like the reference).  `/ping` and `/` health endpoints.  Settings
via query parameters (e.g. `?max_groups=1048576`).
"""
from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from ..core.errors import EngineError
from ..exec.session import Session
from ..storage import formats

__all__ = ["serve", "HttpServer"]


class _Handler(BaseHTTPRequestHandler):
    server_version = "clickhouse-tpu/0.1"
    session: Session = None          # injected by HttpServer

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

    def _handle(self, body: Optional[str]):
        parsed = urllib.parse.urlparse(self.path)
        params = dict(urllib.parse.parse_qsl(parsed.query))
        query = params.pop("query", "") or (body or "")
        if parsed.path == "/ping" or (parsed.path == "/" and not query.strip()):
            self._send(200, "Ok.\n")
            return
        default_format = params.pop("default_format", "TSV")
        database = params.pop("database", None)
        settings = {}
        for k, v in params.items():
            if k in self.session.settings.as_dict():
                settings[k] = v
        try:
            if database:
                self.session.execute(f"USE {database}")
            result = self.session.execute(query, settings=settings or None)
            fmt = default_format
            out = formats.format_rows_text(result.columns, fmt) \
                if result.columns else ""
            self._send(200, out)
        except EngineError as e:
            self._send(400, f"Code: {getattr(e, 'code', 1000)}. "
                            f"DB::Exception: {e}\n")
        except Exception as e:        # pragma: no cover
            self._send(500, f"Code: 1000. Internal error: {e}\n")

    def do_GET(self):
        self._handle(None)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n).decode() if n else ""
        self._handle(body)


class HttpServer:
    def __init__(self, session: Optional[Session] = None,
                 host: str = "127.0.0.1", port: int = 8123):
        self.session = session or Session()
        handler = type("BoundHandler", (_Handler,),
                       {"session": self.session})
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
