"""In-process coordination service — the Keeper analog.

The reference coordinates replicas through (Zoo)Keeper: a hierarchical
znode tree with versioned compare-and-swap writes, sequential nodes,
ephemerals, and watches (src/Coordination/KeeperStateMachine.h:23).  For
single-process multi-replica operation — exactly the reference's own
TestKeeper strategy (src/Common/ZooKeeper/TestKeeper.h:35, used by its unit
and integration tests) — we implement the same contract in memory with a
lock.  The replication layer (storage/replication.py) is written purely
against this interface, so a networked Keeper client can replace it without
touching the replication logic.
"""
from __future__ import annotations

import threading
from typing import Any, Callable, Dict, List, Optional, Tuple

__all__ = ["Keeper", "KeeperError", "NoNodeError", "NodeExistsError",
           "BadVersionError", "get_keeper", "reset_keepers"]


class KeeperError(Exception):
    pass


class NoNodeError(KeeperError):
    pass


class NodeExistsError(KeeperError):
    pass


class BadVersionError(KeeperError):
    pass


class _Node:
    __slots__ = ("data", "version", "children", "seq_counter", "ephemeral")

    def __init__(self, data: Any = b"", ephemeral: Optional[str] = None):
        self.data = data
        self.version = 0
        self.children: Dict[str, _Node] = {}
        self.seq_counter = 0
        self.ephemeral = ephemeral     # owner session id, or None


class Keeper:
    """Hierarchical versioned KV store with sequential nodes and watches."""

    def __init__(self):
        self._root = _Node()
        self._lock = threading.RLock()
        self._watches: Dict[str, List[Callable[[str], None]]] = {}

    # -- path plumbing -------------------------------------------------------
    @staticmethod
    def _parts(path: str) -> List[str]:
        return [p for p in path.split("/") if p]

    def _find(self, path: str) -> _Node:
        node = self._root
        for p in self._parts(path):
            if p not in node.children:
                raise NoNodeError(path)
            node = node.children[p]
        return node

    # -- operations (ZooKeeper-style) ---------------------------------------
    def create(self, path: str, data: Any = b"", sequential: bool = False,
               ephemeral_owner: Optional[str] = None,
               make_parents: bool = False) -> str:
        with self._lock:
            parts = self._parts(path)
            node = self._root
            for p in parts[:-1]:
                if p not in node.children:
                    if not make_parents:
                        raise NoNodeError(path)
                    node.children[p] = _Node()
                node = node.children[p]
            name = parts[-1]
            if sequential:
                name = f"{name}{node.seq_counter:010d}"
                node.seq_counter += 1
            elif name in node.children:
                raise NodeExistsError(path)
            node.children[name] = _Node(data, ephemeral_owner)
            node.version += 1
            full = "/" + "/".join(parts[:-1] + [name])
            self._fire(full)
            return full

    def exists(self, path: str) -> bool:
        with self._lock:
            try:
                self._find(path)
                return True
            except NoNodeError:
                return False

    def get(self, path: str) -> Tuple[Any, int]:
        with self._lock:
            n = self._find(path)
            return n.data, n.version

    def set(self, path: str, data: Any, version: int = -1) -> int:
        """CAS write: version -1 = unconditional."""
        with self._lock:
            n = self._find(path)
            if version >= 0 and n.version != version:
                raise BadVersionError(f"{path}: have {n.version}, "
                                      f"expected {version}")
            n.data = data
            n.version += 1
            self._fire(path)
            return n.version

    def get_children(self, path: str) -> List[str]:
        with self._lock:
            return sorted(self._find(path).children.keys())

    def remove(self, path: str, version: int = -1) -> None:
        with self._lock:
            parts = self._parts(path)
            parent = self._root
            for p in parts[:-1]:
                if p not in parent.children:
                    raise NoNodeError(path)
                parent = parent.children[p]
            name = parts[-1]
            n = parent.children.get(name)
            if n is None:
                raise NoNodeError(path)
            if version >= 0 and n.version != version:
                raise BadVersionError(path)
            if n.children:
                raise KeeperError(f"{path} has children")
            del parent.children[name]
            parent.version += 1
            self._fire(path)

    def remove_recursive(self, path: str) -> None:
        with self._lock:
            for c in list(self.get_children(path)):
                self.remove_recursive(f"{path}/{c}")
            self.remove(path)

    def remove_ephemerals(self, owner: str, path: str = "/") -> None:
        """Session teardown: drop all ephemerals owned by `owner`."""
        with self._lock:
            node = self._find(path) if path != "/" else self._root
            for name in list(node.children):
                child = node.children[name]
                sub = path.rstrip("/") + "/" + name
                self.remove_ephemerals(owner, sub)
                if child.ephemeral == owner and not child.children:
                    del node.children[name]
                    node.version += 1
                    self._fire(sub)

    def create_if_missing(self, path: str, data: Any = b"") -> None:
        with self._lock:
            if not self.exists(path):
                self.create(path, data, make_parents=True)

    def try_create(self, path: str, data: Any = b"") -> bool:
        """Leader-election / lock primitive: True iff we created it."""
        with self._lock:
            try:
                self.create(path, data, make_parents=True)
                return True
            except NodeExistsError:
                return False

    # -- watches -------------------------------------------------------------
    def snapshot_nodes(self) -> List[Tuple[str, str, str]]:
        """(name, value, parent path) rows for the system.zookeeper analog
        (ref: src/Storages/System/StorageSystemZooKeeper.cpp)."""
        rows: List[Tuple[str, str, str]] = []

        def walk(node: _Node, path: str) -> None:
            for name, child in sorted(node.children.items()):
                data = child.data
                if isinstance(data, bytes):
                    data = data.decode("utf-8", "replace")
                rows.append((name, str(data), path or "/"))
                walk(child, (path or "") + "/" + name)

        with self._lock:
            walk(self._root, "")
        return rows

    def watch(self, path: str, cb: Callable[[str], None]) -> None:
        with self._lock:
            self._watches.setdefault(path, []).append(cb)

    def _fire(self, path: str) -> None:
        for prefix, cbs in list(self._watches.items()):
            if path == prefix or path.startswith(prefix.rstrip("/") + "/"):
                for cb in list(cbs):
                    try:
                        cb(path)
                    except Exception:       # noqa: BLE001 — watcher bugs
                        pass                # must not break the write path


# -- named keeper registry (cluster name -> shared instance) -----------------

_KEEPERS: Dict[str, Keeper] = {}
_KLOCK = threading.Lock()


def dump_tree(keeper: Keeper) -> dict:
    """Serialize the whole znode tree (Raft snapshot payload)."""
    def enc(node: _Node) -> dict:
        return {"d": node.data, "v": node.version, "s": node.seq_counter,
                "e": node.ephemeral,
                "c": {k: enc(v) for k, v in node.children.items()}}
    with keeper._lock:
        return enc(keeper._root)


def load_tree(keeper: Keeper, snap: dict) -> None:
    """Replace the znode tree with a snapshot (Raft install_snapshot)."""
    def dec(d: dict) -> _Node:
        n = _Node(d.get("d", b""), d.get("e"))
        n.version = d.get("v", 0)
        n.seq_counter = d.get("s", 0)
        n.children = {k: dec(v) for k, v in d.get("c", {}).items()}
        return n
    with keeper._lock:
        keeper._root = dec(snap)


def get_keeper(cluster: str = "default") -> Keeper:
    """In-process keeper by name, or a networked client for
    'tcp://host:port' clusters (coordination/keeper_net.py)."""
    with _KLOCK:
        k = _KEEPERS.get(cluster)
        if k is None:
            if cluster.startswith("tcp://"):
                addrs = cluster[len("tcp://"):]
                if "," in addrs:
                    # Raft ensemble: 'tcp://a:p,b:p,c:p' — the client finds
                    # the leader and fails over (coordination/raft.py)
                    from .raft import RaftKeeperClient
                    k = RaftKeeperClient(addrs.split(","))
                else:
                    from .keeper_net import KeeperClient
                    host, _, port = addrs.partition(":")
                    k = KeeperClient(host, int(port or 9181))
            else:
                k = Keeper()
            _KEEPERS[cluster] = k
        return k


def reset_keepers() -> None:
    """Test isolation helper."""
    with _KLOCK:
        _KEEPERS.clear()
