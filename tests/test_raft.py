"""Raft consensus for the networked Keeper (coordination/raft.py — the
NuRaft/KeeperServer analog, ref src/Coordination/KeeperServer.cpp): leader
election, log replication, snapshot catch-up, and ReplicatedMergeTree
surviving a Keeper-leader kill on a 3-node ensemble."""
import threading
import time

import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.coordination.keeper import KeeperError, reset_keepers
from clickhouse_tpu.coordination.raft import RaftKeeperClient, RaftNode
from clickhouse_tpu.storage.table import Catalog


def _ensemble(n=3, **kw):
    nodes = []
    addrs = []
    for i in range(n):
        node = RaftNode(i, ["x"] * n, port=0, **kw)
        nodes.append(node)
        addrs.append(f"127.0.0.1:{node.port}")
    for node in nodes:
        node.addrs = list(addrs)
        node.start_background()
    return nodes, addrs


@pytest.fixture()
def ensemble():
    nodes, addrs = _ensemble()
    yield nodes, addrs
    for n in nodes:
        n.shutdown()
    reset_keepers()


def _leader(nodes, exclude=()):
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        for n in nodes:
            if n not in exclude and n.role == "leader" \
                    and not n._stopped.is_set():
                return n
        time.sleep(0.05)
    raise AssertionError("no leader elected")


def test_election_replication_and_failover(ensemble):
    nodes, addrs = ensemble
    c = RaftKeeperClient(addrs, retry_s=10)
    c.create("/t", b"v0", make_parents=True)
    for i in range(30):
        c.create("/t/e-", {"i": i}, sequential=True)
    lead = _leader(nodes)
    # every node applied the same tree
    time.sleep(0.3)
    for n in nodes:
        assert len(n.keeper.get_children("/t")) == 30
    lead.shutdown()
    c.create("/after", b"x", make_parents=True)     # re-routes to new leader
    assert c.get("/t")[0] == b"v0"
    assert len(c.get_children("/t")) == 30
    new = _leader(nodes, exclude=(lead,))
    assert new is not lead


def test_acknowledged_writes_survive_leader_kill(ensemble):
    """Linearizability smoke: every acknowledged sequential create exists
    exactly once after the leader dies mid-stream."""
    nodes, addrs = ensemble
    c = RaftKeeperClient(addrs, retry_s=10)
    c.create("/seq", b"", make_parents=True)
    acked = []
    stop = threading.Event()

    def writer():
        i = 0
        while not stop.is_set() and i < 200:
            try:
                name = c.create("/seq/w-", {"i": i}, sequential=True)
                acked.append(name.rsplit("/", 1)[-1])
            except KeeperError:
                pass
            i += 1

    t = threading.Thread(target=writer)
    t.start()
    time.sleep(0.3)
    _leader(nodes).shutdown()
    t.join(timeout=30)
    stop.set()
    survivors = set(c.get_children("/seq"))
    missing = [a for a in acked if a not in survivors]
    assert not missing, f"acknowledged writes lost: {missing[:5]}"
    assert len(acked) == len(set(acked))            # no duplicate acks


def test_snapshot_catches_up_lagging_follower():
    nodes, addrs = _ensemble(compact_at=16)
    try:
        c = RaftKeeperClient(addrs, retry_s=10)
        lead = _leader(nodes)
        follower = next(n for n in nodes if n is not lead)
        follower.shutdown()                         # falls far behind
        for i in range(60):                         # > compact_at: log GC'd
            c.create(f"/k{i}", {"i": i}, make_parents=True)
        lead2 = _leader(nodes, exclude=(follower,))
        assert lead2.base_index > 0                 # compaction happened
        # a FRESH node at the same address cannot bind the freed port
        # reliably; instead verify snapshot transfer via a brand-new node
        nb = RaftNode(3, [], port=0, compact_at=16)
        addrs4 = addrs[:]
        addrs4[follower.node_id] = f"127.0.0.1:{nb.port}"
        nb.node_id = follower.node_id
        nb.addrs = addrs4
        for n in nodes:
            if n not in (follower,):
                n.addrs = addrs4
        nb.start_background()
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            if nb.keeper.exists("/k59"):
                break
            time.sleep(0.1)
        assert nb.keeper.exists("/k0") and nb.keeper.exists("/k59")
    finally:
        for n in nodes + [nb]:
            n.shutdown()
        reset_keepers()


def test_replicated_table_survives_keeper_leader_kill(ensemble):
    """The VERDICT r04 'done' bar: a ReplicatedMergeTree over the raft
    ensemble keeps accepting inserts and replicating after the Keeper
    leader dies."""
    nodes, addrs = ensemble
    cluster = "tcp://" + ",".join(addrs)
    a = ch.connect(catalog=Catalog())
    b = ch.connect(catalog=Catalog())
    for s, r in ((a, "ra"), (b, "rb")):
        s.execute(f"SET keeper_address = '{','.join(addrs)}'")
        s.replica_name = r
        s.execute("CREATE TABLE r (k Int64, v Float64) "
                  "ENGINE = ReplicatedMergeTree('/t/raft', '{replica}') "
                  "ORDER BY k")
    a.execute("INSERT INTO r VALUES (1, 1.0), (2, 2.0)")
    b.execute("SYSTEM SYNC REPLICA r")
    assert b.execute("SELECT sum(k) FROM r").rows() == [(3,)]
    _leader(nodes).shutdown()
    a.execute("INSERT INTO r VALUES (3, 3.0)")      # new leader takes over
    b.execute("SYSTEM SYNC REPLICA r")
    assert b.execute("SELECT sum(k) FROM r").rows() == [(6,)]
    assert a.execute("SELECT count() FROM r").rows() == [(3,)]


def test_partition_heals_via_failpoints(ensemble):
    """Minority-partitioned leader steps down; writes continue on the
    majority side and the tree converges when the partition heals."""
    from clickhouse_tpu.core.failpoints import GLOBAL_FAILPOINTS
    nodes, addrs = ensemble
    c = RaftKeeperClient(addrs, retry_s=10)
    c.create("/p", b"", make_parents=True)
    lead = _leader(nodes)
    # cut the leader off from both peers (its outbound RPCs fail)
    GLOBAL_FAILPOINTS.enable(f"raft_drop_from_{lead.node_id}")
    try:
        deadline = time.monotonic() + 10
        new = None
        while time.monotonic() < deadline:
            cands = [n for n in nodes
                     if n is not lead and n.role == "leader"]
            if cands:
                new = cands[0]
                break
            time.sleep(0.05)
        assert new is not None, "majority never elected a new leader"
        c2 = RaftKeeperClient([a for i, a in enumerate(addrs)
                               if i != lead.node_id], retry_s=10)
        c2.create("/p/during", b"x")
    finally:
        GLOBAL_FAILPOINTS.disable(f"raft_drop_from_{lead.node_id}")
    # healed: old leader rejoins as follower and converges
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        if lead.keeper.exists("/p/during"):
            break
        time.sleep(0.05)
    assert lead.keeper.exists("/p/during")
    assert lead.role != "leader" or lead.term > 1
