"""Raft durable changelog + Jepsen-lite linearizability (VERDICT r04
item 9): a majority (here: the FULL ensemble) stops and restarts from its
own on-disk state without losing acknowledged writes; concurrent client
histories over a single register check linearizable."""
import threading
import time

import pytest

import clickhouse_tpu  # noqa: F401 — path setup
from clickhouse_tpu.coordination.keeper import KeeperError, reset_keepers
from clickhouse_tpu.coordination.raft import RaftKeeperClient, RaftNode


def _ensemble(dirs, ports=None, **kw):
    nodes, addrs = [], []
    n = len(dirs)
    for i in range(n):
        node = RaftNode(i, ["x"] * n, port=(ports[i] if ports else 0),
                        data_dir=dirs[i], **kw)
        nodes.append(node)
        addrs.append(f"127.0.0.1:{node.port}")
    for node in nodes:
        node.addrs = list(addrs)
        node.start_background()
    return nodes, addrs


def _wait_leader(nodes, timeout=10.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        for nd in nodes:
            if nd.role == "leader" and not nd._stopped.is_set():
                return nd
        time.sleep(0.05)
    raise AssertionError("no leader")


def test_full_ensemble_restart_recovers_acknowledged_writes(tmp_path):
    dirs = [str(tmp_path / f"n{i}") for i in range(3)]
    nodes, addrs = _ensemble(dirs, compact_at=8)
    try:
        c = RaftKeeperClient(addrs, retry_s=10)
        c.create("/d", b"", make_parents=True)
        for i in range(20):              # crosses the compact_at boundary
            c.create(f"/d/k{i}", str(i).encode())
        ports = [nd.port for nd in nodes]
    finally:
        for nd in nodes:
            nd.shutdown()
        reset_keepers()
    time.sleep(0.2)
    # the WHOLE ensemble was stopped; every node recovers from disk
    nodes2, addrs2 = _ensemble(dirs, ports=ports)
    try:
        _wait_leader(nodes2)
        c2 = RaftKeeperClient(addrs2, retry_s=10)
        for i in range(20):
            data, _ = c2.get(f"/d/k{i}")
            assert bytes(data) == str(i).encode(), f"lost /d/k{i}"
        # and the recovered ensemble still accepts writes
        c2.create("/d/after", b"x")
        assert c2.exists("/d/after")
    finally:
        for nd in nodes2:
            nd.shutdown()
        reset_keepers()


# -- Jepsen-lite: single-register linearizability ----------------------------

def _linearizable(history):
    """Wing & Gong search over one register's (invoke_t, return_t, op, val)
    history.  op: ('w', v) writes v; ('r', v) observed v."""
    ops = sorted(range(len(history)), key=lambda i: history[i][0])

    def search(remaining, state):
        if not remaining:
            return True
        # ops whose invoke precedes every remaining op's return are the
        # only linearization candidates at this point
        min_ret = min(history[i][1] for i in remaining)
        for i in list(remaining):
            if history[i][0] > min_ret:
                continue
            kind, v = history[i][2], history[i][3]
            if kind == "r" and v != state:
                continue
            nxt = remaining - {i}
            if search(nxt, v if kind == "w" else state):
                return True
        return False

    return search(frozenset(ops), None)


def test_checker_rejects_non_linearizable():
    # w(1) completes before r -> r must not see the initial None
    h = [(0.0, 1.0, "w", 1), (2.0, 3.0, "r", None)]
    assert not _linearizable(h)
    h2 = [(0.0, 1.0, "w", 1), (2.0, 3.0, "r", 1)]
    assert _linearizable(h2)


def test_concurrent_register_history_is_linearizable(tmp_path):
    dirs = [str(tmp_path / f"m{i}") for i in range(3)]
    nodes, addrs = _ensemble(dirs)
    history = []
    hlock = threading.Lock()
    try:
        setup = RaftKeeperClient(addrs, retry_s=10)
        setup.create("/reg", b"init")

        def client(cid):
            c = RaftKeeperClient(addrs, retry_s=10)
            for k in range(8):
                t0 = time.monotonic()
                if (cid + k) % 2 == 0:
                    v = f"{cid}-{k}"
                    try:
                        c.set("/reg", v.encode())
                    except KeeperError:
                        continue        # unacknowledged: not in history
                    with hlock:
                        history.append((t0, time.monotonic(), "w", v))
                else:
                    try:
                        data, _ = c.get("/reg")
                    except KeeperError:
                        continue
                    v = bytes(data).decode()
                    with hlock:
                        history.append((t0, time.monotonic(), "r", v))

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        for nd in nodes:
            nd.shutdown()
        reset_keepers()
    # fold the setup write in as the initial state
    h = [(-(2.0), -1.0, "w", "init")] + history
    assert len(history) >= 12
    assert _linearizable(h), f"history not linearizable: {sorted(h)}"
