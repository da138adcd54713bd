"""Raft consensus for the networked Keeper: a 3+ node ensemble survives
leader loss.

The reference runs Keeper on NuRaft (src/Coordination/KeeperServer.cpp,
contrib/NuRaft); this is a from-scratch minimal Raft over the same
length-prefixed JSON framing as keeper_net.py:

* **Leader election** — randomized follower timeouts, RequestVote with the
  up-to-date-log restriction (§5.4.1 of the Raft paper).
* **Log replication** — AppendEntries with the (prev_index, prev_term)
  consistency check and commit on majority match; every MUTATING keeper op
  (create/set/remove/…) is a log entry applied to the local tree in log
  order on every node, so the trees are replicated state machines.
* **Snapshot + compaction** — past `compact_at` entries the leader
  serializes the whole znode tree (keeper.dump_tree) and truncates its
  log; lagging/new followers receive InstallSnapshot.
* **Client surface** — the SAME keeper op dicts as keeper_net: the leader
  serves reads locally and proposes writes (answering after commit —
  linearizable for the single-client-session ordering the engine needs);
  followers answer ``NotLeader`` with a leader hint and
  `RaftKeeperClient` re-routes, so `SET keeper_address =
  'a:p1,b:p2,c:p3'` gives ReplicatedMergeTree a coordination service with
  no single point of failure.

* **Durable changelog** — with ``data_dir`` set, term/vote persist via
  atomic meta rewrites, log entries append to an fsync'd
  ``log.jsonl``, and compaction snapshots the tree to disk
  (src/Coordination/Changelog.cpp + KeeperStateMachine analog); a node
  restarted with its directory recovers its own log and snapshot, so even
  a FULL-ensemble stop loses no acknowledged write.
"""
from __future__ import annotations

import random
import socket
import socketserver
import threading
import time
from typing import Any, Dict, List, Optional, Tuple

from ..core.errors import EngineError
from .keeper import (BadVersionError, Keeper, KeeperError, NoNodeError,
                     NodeExistsError, dump_tree, load_tree)
from .keeper_net import _dec_value, _enc_value, _recv_frame, _send_frame

__all__ = ["RaftNode", "RaftKeeperClient"]

_ERRORS = {"NoNodeError": NoNodeError, "NodeExistsError": NodeExistsError,
           "BadVersionError": BadVersionError, "KeeperError": KeeperError}


def _apply_op(keeper: Keeper, op: dict):
    """Apply one committed mutating op to the local tree (deterministic:
    same op sequence -> same tree on every replica)."""
    kind = op["op"]
    if kind == "noop":
        return True      # leader's new-term barrier entry (§5.4.2/§8)
    if kind == "create":
        return keeper.create(op["path"], _dec_value(op.get("data", b"")),
                             sequential=op.get("sequential", False),
                             ephemeral_owner=op.get("owner"),
                             make_parents=op.get("make_parents", False))
    if kind == "set":
        return keeper.set(op["path"], _dec_value(op["data"]),
                          op.get("version", -1))
    if kind == "remove":
        return keeper.remove(op["path"], op.get("version", -1))
    if kind == "remove_recursive":
        return keeper.remove_recursive(op["path"])
    if kind == "remove_ephemerals":
        return keeper.remove_ephemerals(op["owner"])
    raise KeeperError(f"unknown log op {kind!r}")


_MUTATING = {"create", "set", "remove", "remove_recursive",
             "remove_ephemerals"}


def _enc_tree(d: dict) -> dict:
    """Snapshot codec: node data may hold numpy part payloads — encode
    them with the wire value codec so InstallSnapshot rides JSON frames."""
    return {"d": _enc_value(d["d"]), "v": d["v"], "s": d["s"], "e": d["e"],
            "c": {k: _enc_tree(v) for k, v in d["c"].items()}}


def _dec_tree(d: dict) -> dict:
    return {"d": _dec_value(d["d"]), "v": d["v"], "s": d["s"], "e": d["e"],
            "c": {k: _dec_tree(v) for k, v in d["c"].items()}}


class RaftNode:
    """One ensemble member: Raft roles + the keeper client surface."""

    def __init__(self, node_id: int, addrs: List[str],
                 host: str = "127.0.0.1", port: int = 0,
                 timeout_scale: float = 1.0, compact_at: int = 512,
                 data_dir: Optional[str] = None):
        self.node_id = node_id
        self.addrs = list(addrs)         # index -> "host:port" (peer view)
        self.keeper = Keeper()
        self.compact_at = compact_at
        # persistent state — durable when data_dir is set (Changelog.cpp
        # analog: fsync'd append-only entry log + meta + snapshot files;
        # a restarted node recovers from its OWN state instead of
        # rejoining empty)
        self.data_dir = data_dir
        self._log_fh = None
        self.term = 0
        self.voted_for: Optional[int] = None
        # log[i] = (term, op) at absolute index base + i + 1
        self.log: List[Tuple[int, dict]] = []
        self.base_index = 0              # last index covered by snapshot
        self.base_term = 0
        self.snapshot: Optional[dict] = None
        # volatile
        self.role = "follower"
        self.leader_id: Optional[int] = None
        self.commit_index = 0
        self.last_applied = 0
        if data_dir is not None:
            self._load_durable()
        self.apply_results: Dict[int, Any] = {}
        self.next_index: Dict[int, int] = {}
        self.match_index: Dict[int, int] = {}
        self._lock = threading.RLock()
        self._commit_cv = threading.Condition(self._lock)
        self._last_heartbeat = time.monotonic()
        self._peer_ack: Dict[int, float] = {}   # leader: last reply per peer
        self._election_timeout = self._rand_timeout(timeout_scale)
        self._scale = timeout_scale
        self._stopped = threading.Event()
        self._conn_seq = [0]

        outer = self

        class _Handler(socketserver.BaseRequestHandler):
            def handle(self):
                outer._conn_seq[0] += 1
                owner = f"n{outer.node_id}-conn{outer._conn_seq[0]}"
                inp = self.request.makefile("rb")
                out = self.request.makefile("wb")
                served_writes = False
                try:
                    while True:
                        req = _recv_frame(inp)
                        if req is None or outer._stopped.is_set():
                            return       # a killed node answers nobody —
                                         # open connections die with it
                        if "raft" in req:
                            resp = outer._raft_rpc(req)
                        else:
                            resp = outer._client_op(req, owner)
                            if req.get("op") in _MUTATING:
                                served_writes = True
                        _send_frame(out, resp)
                except (OSError, ValueError):
                    pass
                finally:
                    if served_writes:
                        # session ephemerals die with the connection; the
                        # cleanup replicates like any other write
                        try:
                            outer.propose({"op": "remove_ephemerals",
                                           "owner": owner}, timeout=2.0)
                        except KeeperError:
                            pass

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = _Server((host, port), _Handler)
        self.host, self.port = self._server.server_address

    # -- lifecycle -----------------------------------------------------------
    def start_background(self) -> "RaftNode":
        threading.Thread(target=self._server.serve_forever,
                         daemon=True).start()
        threading.Thread(target=self._ticker, daemon=True).start()
        return self

    def shutdown(self) -> None:
        self._stopped.set()
        self._server.shutdown()
        self._server.server_close()

    @staticmethod
    def _rand_timeout(scale: float) -> float:
        return random.uniform(0.15, 0.30) * scale

    # -- durability (Changelog.cpp / KeeperStateMachine analog) --------------
    def _load_durable(self):
        import json
        import os
        os.makedirs(self.data_dir, exist_ok=True)
        meta_p = os.path.join(self.data_dir, "meta.json")
        snap_p = os.path.join(self.data_dir, "snapshot.json")
        log_p = os.path.join(self.data_dir, "log.jsonl")
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                m = json.load(f)
            self.term = int(m.get("term", 0))
            self.voted_for = m.get("voted_for")
        if os.path.exists(snap_p):
            with open(snap_p) as f:
                sn = json.load(f)
            self.base_index = int(sn["base_index"])
            self.base_term = int(sn["base_term"])
            self.snapshot = sn["tree"]
            load_tree(self.keeper, _dec_tree(sn["tree"]))
            self.commit_index = self.base_index
            self.last_applied = self.base_index
        if os.path.exists(log_p):
            with open(log_p) as f:
                for ln in f:
                    ln = ln.strip()
                    if not ln:
                        continue
                    try:
                        e = json.loads(ln)
                    except ValueError:
                        break            # torn tail write: drop the rest
                    self.log.append((int(e["t"]), e["op"]))
        self._log_fh = open(log_p, "a")

    def _persist_meta(self):
        if self.data_dir is None:
            return
        import json
        import os
        tmp = os.path.join(self.data_dir, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"term": self.term, "voted_for": self.voted_for}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.data_dir, "meta.json"))

    def _append_durable(self, entries):
        if self._log_fh is None:
            return
        import json
        import os
        for t, op in entries:
            self._log_fh.write(json.dumps({"t": t, "op": op}) + "\n")
        self._log_fh.flush()
        os.fsync(self._log_fh.fileno())

    def _rewrite_log_durable(self):
        """Conflict truncation / compaction: rewrite the whole entry file
        (entries are small; the reference rotates changelog segments)."""
        if self.data_dir is None:
            return
        import json
        import os
        if self._log_fh is not None:
            self._log_fh.close()
        log_p = os.path.join(self.data_dir, "log.jsonl")
        tmp = log_p + ".tmp"
        with open(tmp, "w") as f:
            for t, op in self.log:
                f.write(json.dumps({"t": t, "op": op}) + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, log_p)
        self._log_fh = open(log_p, "a")

    def _persist_snapshot(self):
        if self.data_dir is None:
            return
        import json
        import os
        tmp = os.path.join(self.data_dir, "snapshot.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"base_index": self.base_index,
                       "base_term": self.base_term,
                       "tree": self.snapshot}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.data_dir, "snapshot.json"))
        self._rewrite_log_durable()

    # -- log index helpers ---------------------------------------------------
    def _last_index(self) -> int:
        return self.base_index + len(self.log)

    def _term_at(self, index: int) -> int:
        if index == self.base_index:
            return self.base_term
        return self.log[index - self.base_index - 1][0]

    def _entries_from(self, index: int) -> List[Tuple[int, dict]]:
        return self.log[index - self.base_index - 1:]

    # -- timers --------------------------------------------------------------
    def _ticker(self):
        while not self._stopped.is_set():
            time.sleep(0.02 * self._scale)
            with self._lock:
                role = self.role
                due = (time.monotonic() - self._last_heartbeat
                       > self._election_timeout)
            if role == "leader":
                # Leadership check (advisor r04): a leader whose
                # AppendEntries stopped reaching a majority (minority
                # partition) must stop serving reads — otherwise a stale
                # leader answers get/children with old data forever.  If no
                # majority of peers replied within an election timeout,
                # step down; clients get NotLeader and re-route.
                with self._lock:
                    n = len(self.addrs)
                    now = time.monotonic()
                    fresh = 1 + sum(
                        1 for p, t0 in self._peer_ack.items()
                        if p != self.node_id
                        and now - t0 <= self._election_timeout * 2)
                    if n > 1 and fresh <= n // 2:
                        self.role = "follower"
                        self.leader_id = None
                        self._last_heartbeat = now
                        self._commit_cv.notify_all()
                        continue
                self._broadcast_append()
            elif due:
                self._run_election()

    # -- election ------------------------------------------------------------
    def _run_election(self):
        with self._lock:
            self.term += 1
            self.role = "candidate"
            self.voted_for = self.node_id
            self._persist_meta()
            self.leader_id = None
            term = self.term
            last_idx = self._last_index()
            last_term = self._term_at(last_idx)
            self._last_heartbeat = time.monotonic()
            self._election_timeout = self._rand_timeout(self._scale)
        votes = [1]
        n = len(self.addrs)

        def ask(i):
            r = self._rpc(i, {"raft": "request_vote", "term": term,
                              "candidate": self.node_id,
                              "last_log_index": last_idx,
                              "last_log_term": last_term})
            if r is None:
                return
            with self._lock:
                if r.get("term", 0) > self.term:
                    self._step_down(r["term"])
                    return
                if r.get("granted") and self.role == "candidate" \
                        and self.term == term:
                    votes[0] += 1
                    if votes[0] > n // 2:
                        self._become_leader()

        for i in range(n):
            if i != self.node_id:
                threading.Thread(target=ask, args=(i,),
                                 daemon=True).start()

    def _become_leader(self):
        # called under lock
        self.role = "leader"
        self.leader_id = self.node_id
        last = self._last_index()
        now = time.monotonic()
        for i in range(len(self.addrs)):
            self.next_index[i] = last + 1
            self.match_index[i] = 0
            self._peer_ack[i] = now      # lease grace until first round
        # no-op barrier entry: commits the new leader's whole log prefix
        # (without it, prior-term entries recovered from disk would never
        # reach commit — Raft §5.4.2 restriction)
        self.log.append((self.term, {"op": "noop"}))
        self._append_durable([(self.term, {"op": "noop"})])
        threading.Thread(target=self._broadcast_append,
                         daemon=True).start()

    def _step_down(self, term: int):
        # called under lock
        if term > self.term:
            self.term = term
            self.voted_for = None
            self._persist_meta()
        self.role = "follower"
        self._last_heartbeat = time.monotonic()
        # waiters on uncommitted proposals must re-route, not time out
        self._commit_cv.notify_all()

    # -- replication (leader side) -------------------------------------------
    def _broadcast_append(self):
        for i in range(len(self.addrs)):
            if i != self.node_id:
                threading.Thread(target=self._append_to, args=(i,),
                                 daemon=True).start()

    def _append_to(self, peer: int):
        with self._lock:
            if self.role != "leader":
                return
            term = self.term
            ni = self.next_index.get(peer, self._last_index() + 1)
            if ni <= self.base_index:
                snap = {"raft": "install_snapshot", "term": term,
                        "leader": self.node_id,
                        "last_index": self.base_index,
                        "last_term": self.base_term,
                        "data": self.snapshot}
                msg = snap
            else:
                prev = ni - 1
                entries = [(t, op) for t, op in self._entries_from(ni)]
                msg = {"raft": "append_entries", "term": term,
                       "leader": self.node_id, "prev_index": prev,
                       "prev_term": self._term_at(prev),
                       "entries": entries,
                       "leader_commit": self.commit_index}
        r = self._rpc(peer, msg)
        if r is None:
            return
        with self._lock:
            if r.get("term", 0) > self.term:
                self._step_down(r["term"])
                return
            if self.role != "leader" or self.term != term:
                return
            self._peer_ack[peer] = time.monotonic()
            if msg["raft"] == "install_snapshot":
                self.next_index[peer] = self.base_index + 1
                self.match_index[peer] = self.base_index
                return
            if r.get("ok"):
                new_match = msg["prev_index"] + len(msg["entries"])
                self.match_index[peer] = max(
                    self.match_index.get(peer, 0), new_match)
                self.next_index[peer] = self.match_index[peer] + 1
                self._advance_commit()
            else:
                self.next_index[peer] = max(1, ni - 8)

    def _advance_commit(self):
        # called under lock: commit = highest index replicated on majority
        # with an entry from the CURRENT term (§5.4.2)
        n = len(self.addrs)
        for idx in range(self._last_index(), self.commit_index, -1):
            if self._term_at(idx) != self.term:
                break
            count = 1 + sum(1 for p, m in self.match_index.items()
                            if p != self.node_id and m >= idx)
            if count > n // 2:
                self.commit_index = idx
                self._apply_committed()
                self._commit_cv.notify_all()
                break

    def _apply_committed(self):
        # called under lock
        while self.last_applied < self.commit_index:
            self.last_applied += 1
            _term, op = self.log[self.last_applied - self.base_index - 1]
            try:
                res = ("ok", _apply_op(self.keeper, op))
            except KeeperError as e:
                res = ("err", type(e).__name__, str(e))
            self.apply_results[self.last_applied] = res
            if len(self.apply_results) > 4096:
                for k in sorted(self.apply_results)[:2048]:
                    self.apply_results.pop(k, None)
        self._maybe_compact()

    def _maybe_compact(self):
        # called under lock: snapshot the tree, drop applied log prefix
        if self.last_applied - self.base_index < self.compact_at:
            return
        self.snapshot = _enc_tree(dump_tree(self.keeper))
        drop = self.last_applied - self.base_index
        self.base_term = self._term_at(self.last_applied)
        self.log = self.log[drop:]
        self.base_index = self.last_applied
        self._persist_snapshot()

    # -- RPC handlers (any role) ---------------------------------------------
    def _raft_rpc(self, req: dict) -> dict:
        kind = req["raft"]
        with self._lock:
            if req.get("term", 0) > self.term:
                self._step_down(req["term"])
            if kind == "request_vote":
                up_to_date = (
                    req["last_log_term"], req["last_log_index"]) >= (
                    self._term_at(self._last_index()), self._last_index())
                grant = (req["term"] >= self.term
                         and self.voted_for in (None, req["candidate"])
                         and up_to_date)
                if grant:
                    self.voted_for = req["candidate"]
                    self._last_heartbeat = time.monotonic()
                    self._persist_meta()
                return {"term": self.term, "granted": grant}
            if kind == "append_entries":
                if req["term"] < self.term:
                    return {"term": self.term, "ok": False}
                self.role = "follower"
                self.leader_id = req["leader"]
                self._last_heartbeat = time.monotonic()
                prev = req["prev_index"]
                if prev > self._last_index() or (
                        prev > self.base_index
                        and prev <= self._last_index()
                        and self._term_at(prev) != req["prev_term"]) or \
                        prev < self.base_index:
                    return {"term": self.term, "ok": False}
                # append, truncating conflicts
                idx = prev
                truncated = False
                appended = []
                for t, op in req["entries"]:
                    idx += 1
                    li = idx - self.base_index - 1
                    if li < len(self.log):
                        if self.log[li][0] != t:
                            del self.log[li:]
                            truncated = True
                            self.log.append((t, op))
                            appended.append((t, op))
                    else:
                        self.log.append((t, op))
                        appended.append((t, op))
                if truncated:
                    self._rewrite_log_durable()
                elif appended:
                    self._append_durable(appended)
                if req["leader_commit"] > self.commit_index:
                    self.commit_index = min(req["leader_commit"],
                                            self._last_index())
                    self._apply_committed()
                    self._commit_cv.notify_all()
                return {"term": self.term, "ok": True}
            if kind == "install_snapshot":
                if req["term"] < self.term:
                    return {"term": self.term, "ok": False}
                self.role = "follower"
                self.leader_id = req["leader"]
                self._last_heartbeat = time.monotonic()
                if req["last_index"] <= self.commit_index:
                    # Delayed/duplicate snapshot at or below our committed
                    # state: applying it would roll committed state back.
                    # Ack so the leader advances next_index past it.
                    return {"term": self.term, "ok": True}
                load_tree(self.keeper, _dec_tree(req["data"]))
                self.base_index = req["last_index"]
                self.base_term = req["last_term"]
                self.snapshot = req["data"]
                self.log = []
                self.commit_index = self.base_index
                self.last_applied = self.base_index
                self._persist_snapshot()
                return {"term": self.term, "ok": True}
        return {"term": self.term, "ok": False}

    # -- client surface ------------------------------------------------------
    def propose(self, op: dict, timeout: float = 5.0):
        """Leader: append + replicate + apply; returns the apply result."""
        with self._lock:
            if self.role != "leader":
                raise _NotLeader(self.leader_id)
            self.log.append((self.term, op))
            self._append_durable([(self.term, op)])
            idx = self._last_index()
        self._broadcast_append()
        deadline = time.monotonic() + timeout
        with self._commit_cv:
            while self.last_applied < idx:
                if self.role != "leader":
                    # deposed before commit: the entry may or may not
                    # survive — the client must re-route and retry
                    raise _NotLeader(self.leader_id)
                left = deadline - time.monotonic()
                if left <= 0 or self._stopped.is_set():
                    raise KeeperError("raft commit timeout (no quorum?)")
                self._commit_cv.wait(left)
            res = self.apply_results.get(idx)
        if res is None:
            raise KeeperError("raft apply result evicted")
        if res[0] == "err":
            raise _ERRORS.get(res[1], KeeperError)(res[2])
        return res[1]

    def _client_op(self, req: dict, owner: str) -> dict:
        op = req.get("op")
        with self._lock:
            is_leader = self.role == "leader"
            hint = self.leader_id
        if not is_leader:
            leader_addr = self.addrs[hint] if hint is not None else None
            return {"ok": False, "error": "NotLeader",
                    "leader": leader_addr, "msg": "not the leader"}
        try:
            if op in _MUTATING or op == "create":
                prop = dict(req)
                prop.pop("ephemeral", None)
                if req.get("ephemeral"):
                    prop["owner"] = owner
                return {"ok": True,
                        "result": self.propose(prop)}
            k = self.keeper
            if op == "exists":
                return {"ok": True, "result": k.exists(req["path"])}
            if op == "get":
                data, version = k.get(req["path"])
                return {"ok": True, "result": [_enc_value(data), version]}
            if op == "children":
                return {"ok": True, "result": k.get_children(req["path"])}
            if op == "ping":
                return {"ok": True, "result": "pong"}
            return {"ok": False, "error": "KeeperError",
                    "msg": f"unknown op {op!r}"}
        except _NotLeader as e:
            leader_addr = self.addrs[e.leader] if e.leader is not None \
                else None
            return {"ok": False, "error": "NotLeader",
                    "leader": leader_addr, "msg": "not the leader"}
        except KeeperError as e:
            return {"ok": False, "error": type(e).__name__, "msg": str(e)}

    # -- transport -----------------------------------------------------------
    def _rpc(self, peer: int, msg: dict) -> Optional[dict]:
        from ..core.failpoints import fail_point
        try:
            fail_point(f"raft_drop_to_{peer}")
            fail_point(f"raft_drop_from_{self.node_id}")
            host, _, port = self.addrs[peer].partition(":")
            with socket.create_connection((host, int(port)),
                                          timeout=1.0 * self._scale) as s:
                f = s.makefile("rwb")
                _send_frame(f, msg)
                return _recv_frame(f)
        except (OSError, EngineError, KeeperError):
            return None


class _NotLeader(KeeperError):
    def __init__(self, leader: Optional[int]):
        super().__init__("not the leader")
        self.leader = leader


class RaftKeeperClient:
    """Keeper client over a Raft ensemble: finds the leader, re-routes on
    NotLeader, fails over on dead nodes (the ZooKeeper multi-address
    client contract)."""

    def __init__(self, addrs: List[str], retry_s: float = 5.0):
        self.addrs = [a.strip() for a in addrs]
        self.retry_s = retry_s
        self._lock = threading.Lock()
        self._conn: Optional[tuple] = None      # (addr, inp, out, sock)
        self._leader_hint: Optional[str] = None

    def _connect(self, addr: str):
        host, _, port = addr.partition(":")
        sock = socket.create_connection((host, int(port or 9181)),
                                        timeout=2.0)
        return (addr, sock.makefile("rb"), sock.makefile("wb"), sock)

    def _close(self):
        if self._conn:
            for f in self._conn[1:]:
                try:
                    f.close()
                except OSError:
                    pass
            self._conn = None

    def _call(self, **req) -> Any:
        deadline = time.monotonic() + self.retry_s
        last_err: Any = None
        with self._lock:
            while time.monotonic() < deadline:
                order = []
                if self._conn:
                    order.append(None)           # existing connection first
                if self._leader_hint:
                    order.append(self._leader_hint)
                order += [a for a in self.addrs
                          if a != self._leader_hint]
                progressed = False
                for target in order:
                    try:
                        if target is not None:
                            self._close()
                            self._conn = self._connect(target)
                        _, inp, out, _s = self._conn
                        _send_frame(out, req)
                        resp = _recv_frame(inp)
                    except OSError as e:
                        last_err = e
                        self._close()
                        continue
                    if resp is None:
                        self._close()
                        continue
                    if resp.get("ok"):
                        return resp.get("result")
                    if resp.get("error") == "NotLeader":
                        self._leader_hint = resp.get("leader")
                        self._close()
                        if self._leader_hint:
                            progressed = True
                            break                # retry against the hint
                        continue
                    raise _ERRORS.get(resp.get("error"), KeeperError)(
                        resp.get("msg", ""))
                if not progressed:
                    time.sleep(0.05)
            raise KeeperError(
                f"no reachable raft leader within {self.retry_s}s "
                f"({last_err})")

    # -- Keeper interface (same subset as keeper_net.KeeperClient) ----------
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
        raise KeeperError("raft keeper watches are poll-based; use pull()")

    def ping(self) -> bool:
        return self._call(op="ping") == "pong"

    def close(self) -> None:
        with self._lock:
            self._close()
