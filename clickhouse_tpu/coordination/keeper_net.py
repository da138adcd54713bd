"""Networked Keeper: the in-process coordination service served over TCP.

The reference runs Keeper as a Raft-replicated server processes talk to
over a socket (src/Coordination/KeeperServer.cpp + the ZooKeeper client,
src/Common/ZooKeeper/ZooKeeper.h).  Here ONE process hosts the znode tree
(`KeeperServer` wrapping coordination/keeper.py) and any number of engine
processes coordinate through `KeeperClient` — the replication layer
(storage/replication.py) runs against either transparently, so
ReplicatedMergeTree works ACROSS PROCESSES: inserts commit log entries with
Native-encoded part payloads, remote replicas tail the log over the wire.

Protocol: length-prefixed JSON frames; part data (dicts of numpy arrays)
travels as LZ4-compressed Native blocks inside the value codec.  Raft is
intentionally absent — a pod's coordination point is singular by design
here; HA would slot a consensus layer under the same client API.
"""
from __future__ import annotations

import base64
import io
import json
import socket
import socketserver
import struct
import threading
from typing import Any, Dict, Optional

import numpy as np

from ..core.errors import EngineError
from .keeper import (BadVersionError, Keeper, KeeperError, NoNodeError,
                     NodeExistsError)

__all__ = ["KeeperServer", "KeeperClient"]

_ERRORS = {"NoNodeError": NoNodeError, "NodeExistsError": NodeExistsError,
           "BadVersionError": BadVersionError, "KeeperError": KeeperError}


# -- value codec ---------------------------------------------------------------

def _enc_value(v: Any) -> Any:
    if isinstance(v, dict):
        if v and all(isinstance(x, np.ndarray) for x in v.values()):
            from .. import native as chnative
            from ..storage.native_format import write_native
            buf = io.BytesIO()
            write_native(buf, v)
            raw = buf.getvalue()
            comp = chnative.lz4_compress(raw)
            return {"$block": base64.b64encode(comp).decode(),
                    "$raw": len(raw)}
        return {"$dict": {k: _enc_value(x) for k, x in v.items()}}
    if isinstance(v, (bytes, bytearray)):
        return {"$bytes": base64.b64encode(bytes(v)).decode()}
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    return v


def _dec_value(v: Any) -> Any:
    if isinstance(v, dict):
        if "$block" in v:
            from .. import native as chnative
            from ..storage.native_format import read_native
            raw = chnative.lz4_decompress(
                base64.b64decode(v["$block"]), v["$raw"])
            cols, _types = read_native(io.BytesIO(raw))
            return cols
        if "$dict" in v:
            return {k: _dec_value(x) for k, x in v["$dict"].items()}
        if "$bytes" in v:
            return base64.b64decode(v["$bytes"])
    return v


def _send_frame(sock_file, obj: dict) -> None:
    payload = json.dumps(obj).encode()
    sock_file.write(struct.pack("<I", len(payload)))
    sock_file.write(payload)
    sock_file.flush()


def _recv_frame(sock_file) -> Optional[dict]:
    head = sock_file.read(4)
    if len(head) < 4:
        return None
    (n,) = struct.unpack("<I", head)
    if n > (1 << 30):
        raise EngineError("keeper frame too large")
    payload = sock_file.read(n)
    if len(payload) < n:
        return None
    return json.loads(payload.decode())


# -- server --------------------------------------------------------------------

class KeeperServer:
    """Serve a Keeper tree over TCP (threaded, one session per connection;
    a connection's ephemerals vanish when it drops)."""

    def __init__(self, keeper: Optional[Keeper] = None,
                 host: str = "127.0.0.1", port: int = 0):
        self.keeper = keeper or Keeper()
        outer = self
        conn_seq = [0]
        seq_lock = threading.Lock()

        class _Handler(socketserver.BaseRequestHandler):
            def handle(self):
                with seq_lock:
                    conn_seq[0] += 1
                    owner = f"conn-{conn_seq[0]}"
                inp = self.request.makefile("rb")
                out = self.request.makefile("wb")
                try:
                    while True:
                        req = _recv_frame(inp)
                        if req is None:
                            return
                        _send_frame(out, outer._dispatch(req, owner))
                except (OSError, ValueError):
                    pass
                finally:
                    outer.keeper.remove_ephemerals(owner)

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = _Server((host, port), _Handler)
        self.host, self.port = self._server.server_address

    def _dispatch(self, req: dict, owner: str) -> dict:
        k = self.keeper
        op = req.get("op")
        try:
            if op == "create":
                name = k.create(req["path"], _dec_value(req.get("data", b"")),
                                sequential=req.get("sequential", False),
                                ephemeral_owner=owner
                                if req.get("ephemeral") else None,
                                make_parents=req.get("make_parents", False))
                return {"ok": True, "result": name}
            if op == "exists":
                return {"ok": True, "result": k.exists(req["path"])}
            if op == "get":
                data, version = k.get(req["path"])
                return {"ok": True, "result": [_enc_value(data), version]}
            if op == "set":
                v = k.set(req["path"], _dec_value(req["data"]),
                          req.get("version", -1))
                return {"ok": True, "result": v}
            if op == "children":
                return {"ok": True, "result": k.get_children(req["path"])}
            if op == "remove":
                k.remove(req["path"], req.get("version", -1))
                return {"ok": True, "result": None}
            if op == "remove_recursive":
                k.remove_recursive(req["path"])
                return {"ok": True, "result": None}
            if op == "ping":
                return {"ok": True, "result": "pong"}
            return {"ok": False, "error": "KeeperError",
                    "msg": f"unknown op {op!r}"}
        except KeeperError as e:
            return {"ok": False, "error": type(e).__name__, "msg": str(e)}

    def start_background(self) -> "KeeperServer":
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return self

    def shutdown(self) -> None:
        self._server.shutdown()


# -- client --------------------------------------------------------------------

class KeeperClient:
    """Drop-in for coordination.keeper.Keeper over the wire (the subset the
    engine uses: create/exists/get/set/get_children/remove/...)."""

    def __init__(self, host: str, port: int):
        self._lock = threading.Lock()
        self._sock = socket.create_connection((host, port))
        self._inp = self._sock.makefile("rb")
        self._out = self._sock.makefile("wb")

    def _call(self, **req) -> Any:
        with self._lock:
            _send_frame(self._out, req)
            resp = _recv_frame(self._inp)
        if resp is None:
            raise KeeperError("keeper connection closed")
        if not resp.get("ok"):
            raise _ERRORS.get(resp.get("error"), KeeperError)(
                resp.get("msg", ""))
        return resp.get("result")

    # -- Keeper interface ---------------------------------------------------
    def create(self, path: str, data: Any = b"", sequential: bool = False,
               ephemeral_owner: Optional[str] = None,
               make_parents: bool = False) -> str:
        return self._call(op="create", path=path, data=_enc_value(data),
                          sequential=sequential,
                          ephemeral=ephemeral_owner is not None,
                          make_parents=make_parents)

    def exists(self, path: str) -> bool:
        return self._call(op="exists", path=path)

    def get(self, path: str):
        data, version = self._call(op="get", path=path)
        return _dec_value(data), version

    def set(self, path: str, data: Any, version: int = -1) -> int:
        return self._call(op="set", path=path, data=_enc_value(data),
                          version=version)

    def get_children(self, path: str):
        return self._call(op="children", path=path)

    def remove(self, path: str, version: int = -1) -> None:
        self._call(op="remove", path=path, version=version)

    def remove_recursive(self, path: str) -> None:
        self._call(op="remove_recursive", path=path)

    def remove_ephemerals(self, owner: str, path: str = "/") -> None:
        pass               # server-side: tied to the connection lifetime

    def create_if_missing(self, path: str, data: Any = b"") -> None:
        try:
            self.create(path, data, make_parents=True)
        except NodeExistsError:
            pass

    def try_create(self, path: str, data: Any = b"") -> bool:
        try:
            self.create(path, data, make_parents=True)
            return True
        except NodeExistsError:
            return False

    def watch(self, path, cb) -> None:
        raise KeeperError("networked keeper watches are poll-based; "
                          "use pull()")

    def ping(self) -> bool:
        return self._call(op="ping") == "pong"

    def close(self) -> None:
        # makefile objects hold fd references: close them too or no FIN is
        # sent and the server never reaps this session's ephemerals
        for f in (self._inp, self._out, self._sock):
            try:
                f.close()
            except OSError:
                pass
