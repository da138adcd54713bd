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

__all__ = ["Replication", "block_id_of"]


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
        """Commit the replication log entry AFTER the local part exists."""
        with self._lock:
            entry = {"block_id": block_id, "source": self.replica,
                     "data": data}
            self.keeper.create(f"{self.zk_path}/log/entry-", entry,
                               sequential=True)
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
                for name in entries[ptr:]:
                    from ..core.failpoints import fail_point
                    fail_point("replica_before_apply_log")
                    entry, _ = self.keeper.get(f"{self.zk_path}/log/{name}")
                    if entry["source"] != self.replica:
                        self.table._insert_local(entry["data"])
                    applied += 1
                if applied:
                    self.keeper.set(self._ptr_path, ptr + applied)
                return applied
            finally:
                self._pulling = False

    def drop_replica(self) -> None:
        k = self.keeper
        try:
            k.remove_recursive(f"{self.zk_path}/replicas/{self.replica}")
        except Exception:     # noqa: BLE001
            pass

    @property
    def replicas(self):
        return self.keeper.get_children(f"{self.zk_path}/replicas")
