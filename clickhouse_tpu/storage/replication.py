"""Replicated tables: Keeper-coordinated multi-replica MergeTree.

The reference's ReplicatedMergeTree replicates by consensus METADATA, not by
data push: an insert commits a log entry to Keeper
(src/Storages/MergeTree/ReplicatedMergeTreeQueue.cpp), every replica tails
the log and fetches the parts it is missing; duplicate inserts are dropped
by block-id dedup nodes (ReplicatedMergeTreeSink "deduplication").

This module implements the same protocol against the in-process Keeper
(coordination/keeper.py — the reference's TestKeeper strategy):

  {zk_path}/log/entry-NNNNNNNNNN   -> {block_id, source, data}
  {zk_path}/blocks/{block_id}      -> insert dedup markers
  {zk_path}/replicas/{name}        -> registration + log_pointer

Replicas in one process "fetch" by reference (the entry carries the host
arrays); a networked transport would stream the Native format instead —
the coordination logic would not change.
"""
from __future__ import annotations

import hashlib
import threading
from typing import Dict, Optional

import numpy as np

from ..coordination import get_keeper
from ..coordination.keeper import NodeExistsError

__all__ = ["Replication", "ReplicaFetchError", "block_id_of"]


class ReplicaFetchError(Exception):
    """A part could not be fetched from any replica (transient: the entry
    stays unapplied and the next pull retries, like the reference's
    replication queue re-executing failed entries)."""


def block_id_of(data: Dict[str, np.ndarray]) -> str:
    """Content hash of an insert block (dedup identity, the reference's
    block number hash in ReplicatedMergeTreeSink)."""
    h = hashlib.sha256()
    for name in sorted(data.keys()):
        v = np.asarray(data[name])
        h.update(name.encode())
        if v.dtype == object:
            for x in v:
                h.update(repr(x).encode())
        else:
            h.update(v.tobytes())
    return h.hexdigest()[:32]


class Replication:
    """Per-table replica state machine."""

    # live replica objects per (keeper identity, zk_path): lets quorum
    # inserts ask sibling replicas whether they can confirm a part
    # (the reference tracks this via is_active ephemerals + quorum znodes,
    # ReplicatedMergeTreeSink::waitForQuorum)
    _LIVE: Dict[tuple, Dict[str, "Replication"]] = {}

    def __init__(self, table, zk_path: str, replica: str,
                 cluster: str = "default", deduplicate: bool = True):
        self.table = table
        self.zk_path = zk_path.rstrip("/")
        self.replica = replica
        self.keeper = get_keeper(cluster)
        self.deduplicate = deduplicate
        self.fetches_stopped = False   # SYSTEM STOP FETCHES
        self._exchange = None          # PartsExchangeServer when networked
        self._block_store: Dict[str, Dict[str, np.ndarray]] = {}
        self._block_entry: Dict[str, str] = {}   # block_id -> log entry name
        self._lock = threading.RLock()
        self._pulling = False
        Replication._LIVE.setdefault(
            (id(self.keeper), self.zk_path), {})[replica] = self
        k = self.keeper
        k.create_if_missing(f"{self.zk_path}/log")
        k.create_if_missing(f"{self.zk_path}/blocks")
        k.create_if_missing(f"{self.zk_path}/replicas/{replica}")
        self._ptr_path = f"{self.zk_path}/replicas/{replica}/log_pointer"
        if not k.exists(self._ptr_path):
            # new replicas start at the CURRENT end of the log only when the
            # log is empty; otherwise they recover the full history
            k.create(self._ptr_path, 0, make_parents=True)

    # -- insert path ---------------------------------------------------------
    def begin_insert(self, data: Dict[str, np.ndarray]) -> Optional[str]:
        """-> block_id to commit, or None when the block is a duplicate
        (insert_deduplicate semantics: retried inserts are absorbed)."""
        self.pull()
        bid = block_id_of(data)
        if not self.deduplicate:
            return bid
        try:
            self.keeper.create(f"{self.zk_path}/blocks/{bid}", self.replica)
            return bid
        except NodeExistsError:
            return None

    def abort_insert(self, block_id: str) -> None:
        """Roll back a begin_insert that never committed (failed quorum):
        drop the dedup marker so a retry is not absorbed."""
        if self.deduplicate:
            try:
                self.keeper.remove(f"{self.zk_path}/blocks/{block_id}")
            except Exception:   # noqa: BLE001 — marker may not exist
                pass

    def confirming_replicas(self) -> int:
        """Replicas that would confirm a new part now: this one plus every
        registered sibling whose live object has fetches running.  A replica
        with SYSTEM STOP FETCHES (or no live object to apply the log) cannot
        confirm — the reference's quorum wait would time out on it
        (ReplicatedMergeTreeSink::waitForQuorum)."""
        live = Replication._LIVE.get((id(self.keeper), self.zk_path), {})
        n = 1
        for name in self.replicas:
            if name == self.replica:
                continue
            sib = live.get(name)
            if sib is not None and not sib.fetches_stopped:
                n += 1
        return n

    def log_insert(self, data: Dict[str, np.ndarray], block_id: str) -> None:
        """Commit the replication log entry AFTER the local part exists.

        With a parts-exchange endpoint attached, the entry carries only
        metadata and peers fetch the part over the wire (the reference's
        Keeper-log + DataPartsExchange split); without one, the entry
        carries the arrays by reference (TestKeeper strategy)."""
        with self._lock:
            if self._exchange is not None:
                self._block_store[block_id] = data
                entry = {"block_id": block_id, "source": self.replica}
            else:
                entry = {"block_id": block_id, "source": self.replica,
                         "data": data}
            path = self.keeper.create(f"{self.zk_path}/log/entry-", entry,
                                      sequential=True)
            if self._exchange is not None:
                self._block_entry[block_id] = path.rsplit("/", 1)[-1]
                self._gc_block_store()
            # our own entry is skipped by pull() via its source tag; the
            # pointer only ever advances over entries actually examined, so
            # entries interleaved by other replicas are never jumped over

    # -- read path -----------------------------------------------------------
    def pull(self) -> int:
        """Apply log entries this replica has not seen; -> entries applied."""
        with self._lock:
            if self._pulling or self.fetches_stopped:
                return 0
            self._pulling = True
            try:
                entries = self.keeper.get_children(f"{self.zk_path}/log")
                ptr, _ = self.keeper.get(self._ptr_path)
                applied = 0
                cloned_pos = None
                try:
                    for name in entries[ptr:]:
                        from ..core.failpoints import fail_point
                        from ..core.thread_fuzzer import fuzz_yield
                        fail_point("replica_before_apply_log")
                        fuzz_yield("replica_apply_log")
                        entry, _ = self.keeper.get(
                            f"{self.zk_path}/log/{name}")
                        if entry["source"] != self.replica:
                            data = entry.get("data")
                            if data is None:
                                try:
                                    data = self._fetch_over_wire(entry)
                                except ReplicaFetchError:
                                    # part gone everywhere (GC'd before we
                                    # registered): clone a healthy peer's
                                    # full content instead of replaying
                                    cloned_pos = self._clone_from_replica()
                                    if cloned_pos is None:
                                        raise
                                    applied = 0
                                    break
                            self.table._insert_local(data)
                            if self._exchange is not None:
                                # keep a serveable copy: peers can fetch
                                # from us if the source dies (Fetcher
                                # failover)
                                self._block_store[entry["block_id"]] = data
                                self._block_entry[entry["block_id"]] = name
                        applied += 1
                finally:
                    # advance past everything actually applied, even when a
                    # later entry's fetch failed — a retry must not
                    # re-insert applied parts
                    if cloned_pos is not None:
                        # snapshot reflects the peer's log tail, which is at
                        # or beyond our position (serve_snapshot pulls first)
                        self.keeper.set(self._ptr_path,
                                        max(cloned_pos, ptr))
                        applied = 1
                    elif applied:
                        self.keeper.set(self._ptr_path, ptr + applied)
                if applied and self._exchange is not None:
                    self._gc_block_store()
                return applied
            finally:
                self._pulling = False

    def _gc_block_store(self) -> None:
        """Evict serveable part copies every registered replica has applied
        (advisor r03: _block_store grew without bound — it duplicated all
        data ever inserted).  A block is evictable once min(log_pointer)
        over all replicas has advanced past its log entry: no peer can
        still need to fetch it.  Lagging/dead replicas hold eviction back,
        matching the reference's log-GC-behind-slowest-replica semantics
        (ReplicatedMergeTreeCleanupThread)."""
        try:
            ptrs = []
            for r in self.replicas:
                p = f"{self.zk_path}/replicas/{r}/log_pointer"
                if not self.keeper.exists(p):
                    return        # replica mid-registration: keep everything
                ptrs.append(self.keeper.get(p)[0])
            if not ptrs:
                return
            entries = self.keeper.get_children(f"{self.zk_path}/log")
            passed = set(entries[:min(ptrs)])
        except Exception:         # noqa: BLE001 — GC must never break inserts
            return
        for bid in [b for b, name in self._block_entry.items()
                    if name in passed]:
            self._block_store.pop(bid, None)
            self._block_entry.pop(bid, None)

    # -- interserver part exchange ------------------------------------------
    def attach_exchange(self, server) -> None:
        """Serve/fetch parts over the wire through this endpoint; publishes
        the address at replicas/{name}/host (the reference's interserver
        address znode)."""
        self._exchange = server
        server.attach(self)
        host_path = f"{self.zk_path}/replicas/{self.replica}/host"
        if self.keeper.exists(host_path):
            self.keeper.set(host_path, server.address)
        else:
            self.keeper.create(host_path, server.address, make_parents=True)

    def serve_part(self, block_id: str):
        """Part data for a peer's fetch request (DataPartsExchange Service
        side); None when this replica does not hold the part."""
        return self._block_store.get(block_id)

    def serve_snapshot(self):
        """-> (full current table columns, log position reflected): the
        clone-replica recovery source (the reference clones the part set of
        a healthy replica when log entries are gone —
        ReplicatedMergeTreeRestartingThread / cloneReplica).  Pulls first so
        the content corresponds to the log tail."""
        self.pull()
        t = self.table
        with t._lock:
            cols: Dict[str, np.ndarray] = {}
            for name, ctype in t.schema.items():
                pieces = [p.columns[name] for p in t.parts]
                if ctype.is_dictionary:
                    cols[name] = (np.concatenate(
                        [np.asarray(p, object) for p in pieces])
                        if pieces else np.zeros(0, object))
                else:
                    cols[name] = (np.concatenate(pieces) if pieces
                                  else np.zeros(0, ctype.np_dtype))
        pos, _ = self.keeper.get(self._ptr_path)
        return cols, pos

    @property
    def _secret(self) -> str:
        return getattr(self._exchange, "secret", "") if self._exchange \
            else ""

    def _fetch_over_wire(self, entry: dict) -> Dict[str, np.ndarray]:
        """Resolve the source replica's endpoint and fetch; fall back to
        every other replica with a published host (Fetcher retry loop)."""
        from .parts_exchange import fetch_part
        bid = entry["block_id"]
        candidates = [entry["source"]] + \
            [r for r in self.replicas
             if r not in (entry["source"], self.replica)]
        last_err = None
        for peer in candidates:
            host_path = f"{self.zk_path}/replicas/{peer}/host"
            if not self.keeper.exists(host_path):
                continue
            address, _ = self.keeper.get(host_path)
            try:
                data = fetch_part(address, self.zk_path, peer, bid,
                                  secret=self._secret)
            except Exception as e:          # noqa: BLE001 — peer down
                last_err = e
                continue
            if data is not None:
                return data
        raise ReplicaFetchError(
            f"part {bid} unavailable from any replica of {self.zk_path}"
            + (f" (last transport error: {last_err})" if last_err else ""))

    def _clone_from_replica(self) -> Optional[int]:
        """Recovery when a log entry's part is gone everywhere (GC'd after
        every then-registered replica applied it): replace local content
        with a healthy peer's snapshot; -> the log position to resume from,
        or None when no peer could serve one."""
        from .parts_exchange import fetch_snapshot
        for peer in self.replicas:
            if peer == self.replica:
                continue
            host_path = f"{self.zk_path}/replicas/{peer}/host"
            if not self.keeper.exists(host_path):
                continue
            address, _ = self.keeper.get(host_path)
            try:
                cols, pos = fetch_snapshot(address, self.zk_path, peer,
                                           secret=self._secret)
            except Exception:       # noqa: BLE001 — peer down, try next
                continue
            self.table.truncate()
            if len(next(iter(cols.values()), [])):
                self.table._insert_local(cols)
            return pos
        return None

    def drop_replica(self) -> None:
        k = self.keeper
        try:
            k.remove_recursive(f"{self.zk_path}/replicas/{self.replica}")
        except Exception:     # noqa: BLE001
            pass

    @property
    def replicas(self):
        return self.keeper.get_children(f"{self.zk_path}/replicas")
