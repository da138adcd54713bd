"""Replicated DDL queue — the DDLWorker / DatabaseReplicated analog.

Reference discipline (src/Interpreters/DDLWorker.h:54,
src/Interpreters/DDLTask.cpp, src/Databases/DatabaseReplicated.h):
`ON CLUSTER` DDL does not fan out over point-to-point RPC; the initiator
appends the query to a Keeper-backed queue and EVERY node's DDLWorker tails
the queue, executes each entry against its local catalog in order, and
records a per-host status znode.  The initiator waits for the cluster's
hosts to report.  A node that was down rejoins, scans the queue from the
start, and applies everything it has no status marker for — restart
catch-up needs no extra machinery.

Layout in the Keeper tree:

    <root>/queue/query-NNNNNNNNNN      DDL text (sequential znode)
    <root>/queue/query-N/finished/<host>   b"ok" | b"err:<message>"

The same worker serves both surfaces:
  * ON CLUSTER DDL: root = /clickhouse/task_queue/ddl
  * DatabaseReplicated: root = /clickhouse/databases/<escaped zk path>
    (every DDL that targets the replicated database enqueues implicitly).
"""
from __future__ import annotations

import threading
import time
from typing import Dict, List, Optional, Tuple

from .keeper import KeeperError, NodeExistsError, get_keeper

__all__ = ["DDLWorker", "ON_CLUSTER_ROOT"]

ON_CLUSTER_ROOT = "/clickhouse/task_queue/ddl"


class DDLWorker:
    """Tails one DDL queue and applies entries to a local session."""

    def __init__(self, session, host_id: str,
                 root: str = ON_CLUSTER_ROOT,
                 cluster: str = "default", poll_s: float = 0.05):
        self.session = session
        self.host_id = host_id
        self.root = root.rstrip("/")
        self.queue = f"{self.root}/queue"
        self.keeper = get_keeper(cluster)
        self.poll_s = poll_s
        self._stopped = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._ensure(self.queue)

    def _ensure(self, path: str) -> None:
        parts = path.strip("/").split("/")
        cur = ""
        for p in parts:
            cur += "/" + p
            try:
                self.keeper.create(cur, b"")
            except (NodeExistsError, KeeperError):
                pass

    # -- initiator side ------------------------------------------------------
    def enqueue(self, sql: str) -> str:
        """Append a DDL statement; -> entry name."""
        path = self.keeper.create(f"{self.queue}/query-",
                                  sql.encode(), sequential=True)
        return path.rsplit("/", 1)[-1]

    def wait(self, entry: str, hosts: List[str], timeout: float = 15.0
             ) -> Tuple[bool, Dict[str, str]]:
        """Block until every host reports for `entry` (or timeout).
        -> (all_ok, {host: status})."""
        deadline = time.monotonic() + timeout
        statuses: Dict[str, str] = {}
        base = f"{self.queue}/{entry}/finished"
        while time.monotonic() < deadline:
            for h in hosts:
                if h in statuses:
                    continue
                try:
                    data, _ = self.keeper.get(f"{base}/{h}")
                    statuses[h] = (bytes(data).decode()
                                   if not isinstance(data, str) else data)
                except KeeperError:
                    pass
            if len(statuses) == len(hosts):
                break
            self.poll_once()          # make progress locally while waiting
            time.sleep(self.poll_s)
        ok = len(statuses) == len(hosts) \
            and all(s == "ok" for s in statuses.values())
        return ok, statuses

    # -- executor side -------------------------------------------------------
    def poll_once(self) -> int:
        """Apply every queue entry this host has not finished; -> #applied."""
        try:
            entries = sorted(self.keeper.get_children(self.queue))
        except KeeperError:
            return 0
        applied = 0
        for e in entries:
            mark = f"{self.queue}/{e}/finished/{self.host_id}"
            try:
                if self.keeper.exists(mark):
                    continue
            except KeeperError:
                continue
            try:
                data, _ = self.keeper.get(f"{self.queue}/{e}")
            except KeeperError:
                continue
            sql = bytes(data).decode() if not isinstance(data, str) else data
            status = "ok"
            try:
                self.session._ddl_applying = True
                try:
                    self.session.execute(sql)
                finally:
                    self.session._ddl_applying = False
            except Exception as ex:      # noqa: BLE001 — status carries it
                status = f"err:{type(ex).__name__}: {ex}"[:512]
            self._ensure(f"{self.queue}/{e}/finished")
            try:
                self.keeper.create(mark, status.encode())
            except (NodeExistsError, KeeperError):
                pass
            applied += 1
        return applied

    # -- lifecycle -----------------------------------------------------------
    def start_background(self) -> "DDLWorker":
        def loop():
            while not self._stopped.is_set():
                try:
                    self.poll_once()
                except Exception:        # noqa: BLE001 — keep tailing
                    pass
                self._stopped.wait(self.poll_s)
        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self._stopped.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
