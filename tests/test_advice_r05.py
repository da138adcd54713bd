"""Regression tests for the round-4 advisor findings (ADVICE.md r04):

1. remote() PREWHERE must not be dropped when the combined filter cannot
   ship (parallel/remote_query.py _try_fetch_columns).
2. A minority-partitioned stale Raft leader must stop serving reads
   (coordination/raft.py leadership lease).
3. A delayed InstallSnapshot below a follower's commit_index must not
   roll committed state back.
4. getSetting() must read accepted-inert settings and return strings for
   string-valued settings.
5. SAMPLE BY must survive a durable-table restart.
"""
import time

import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.coordination.keeper import reset_keepers


# -- 1: PREWHERE kept when the merged filter cannot ship ---------------------

def test_remote_prewhere_kept_when_unshippable(monkeypatch):
    from clickhouse_tpu.parallel import remote_query
    from clickhouse_tpu.server.tcp_server import TcpServer
    s = ch.connect()
    s.execute("CREATE TABLE t_pw (k Int64, v Int64)")
    s.insert_pydict("t_pw", {"k": np.arange(100, dtype=np.int64),
                             "v": np.arange(100, dtype=np.int64) * 2})
    srv = TcpServer(session=s, port=0)
    srv.start_background()
    try:
        # simulate an unrenderable predicate: _render refuses, so the
        # filter cannot ship and must be applied LOCALLY — including the
        # PREWHERE conjunct (advisor r04 medium #1)
        monkeypatch.setattr(remote_query, "_render", lambda e: None)
        c = ch.connect()
        rows = c.execute(
            f"SELECT k, v FROM remote('127.0.0.1:{srv.port}', "
            f"default.t_pw) PREWHERE k < 10 WHERE v >= 10 "
            f"ORDER BY k").rows()
        assert rows == [(k, 2 * k) for k in range(5, 10)]
    finally:
        srv.shutdown()


# -- 2/3: Raft leadership lease + snapshot rollback guard --------------------

def _ensemble(n=3, **kw):
    from clickhouse_tpu.coordination.raft import RaftNode
    nodes, addrs = [], []
    for i in range(n):
        node = RaftNode(i, ["x"] * n, port=0, **kw)
        nodes.append(node)
        addrs.append(f"127.0.0.1:{node.port}")
    for node in nodes:
        node.addrs = list(addrs)
        node.start_background()
    return nodes, addrs


def test_stale_leader_stops_serving_reads():
    from clickhouse_tpu.core.failpoints import GLOBAL_FAILPOINTS
    from clickhouse_tpu.coordination.raft import RaftKeeperClient
    nodes, addrs = _ensemble()
    try:
        c = RaftKeeperClient(addrs, retry_s=10)
        c.create("/lease", b"v1", make_parents=True)
        lead = None
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and lead is None:
            lead = next((n for n in nodes if n.role == "leader"), None)
            time.sleep(0.05)
        assert lead is not None
        # cut the leader's OUTBOUND rpcs: heartbeats stop reaching the
        # majority, so without a lease check it would keep role=leader
        # and answer reads with stale data forever
        GLOBAL_FAILPOINTS.enable(f"raft_drop_from_{lead.node_id}")
        try:
            deadline = time.monotonic() + 8
            while time.monotonic() < deadline and lead.role == "leader":
                time.sleep(0.05)
            assert lead.role != "leader", \
                "partitioned leader kept serving after losing the majority"
            # and its client surface now re-routes instead of answering
            r = lead._client_op({"op": "get", "path": "/lease"}, "t")
            assert r["ok"] is False and r["error"] == "NotLeader"
        finally:
            GLOBAL_FAILPOINTS.disable(f"raft_drop_from_{lead.node_id}")
    finally:
        for n in nodes:
            n.shutdown()
        reset_keepers()


def test_install_snapshot_below_commit_is_ignored():
    from clickhouse_tpu.coordination.keeper import Keeper, dump_tree
    from clickhouse_tpu.coordination.raft import RaftNode, _enc_tree
    from clickhouse_tpu.coordination.keeper_net import _enc_value
    node = RaftNode(0, ["a", "b", "c"], port=0)
    try:
        mk = lambda p: (1, {"op": "create", "path": p,  # noqa: E731
                            "data": _enc_value(b"x"),
                            "make_parents": True})
        r = node._raft_rpc({"raft": "append_entries", "term": 1,
                            "leader": 1, "prev_index": 0, "prev_term": 0,
                            "entries": [mk("/a"), mk("/b"), mk("/c")],
                            "leader_commit": 3})
        assert r["ok"] and node.commit_index == 3
        assert node.keeper.exists("/c")
        # a DELAYED duplicate snapshot covering only index 1 arrives late:
        # applying it would roll /b and /c back (advisor r04 low #2)
        stale = _enc_tree(dump_tree(Keeper()))
        r = node._raft_rpc({"raft": "install_snapshot", "term": 1,
                            "leader": 1, "last_index": 1, "last_term": 1,
                            "data": stale})
        assert r["ok"]                       # acked so the leader advances
        assert node.commit_index == 3        # but committed state intact
        assert node.keeper.exists("/b") and node.keeper.exists("/c")
    finally:
        # serve_forever was never started: plain shutdown() would block
        node._stopped.set()
        node._server.server_close()
        reset_keepers()


# -- 4: getSetting over accepted-inert + string settings ---------------------

def test_get_setting_inert_and_string():
    s = ch.connect()
    # inert settings live in Settings.extra, not as attributes
    assert s.execute(
        "SELECT getSetting('allow_experimental_analyzer')").rows() == [(1,)]
    # string-valued settings come back as String, not 0.0
    assert s.execute(
        "SELECT getSetting('read_overflow_mode')").rows() == [("throw",)]
    s.execute("SET compatibility = '24.3'")
    assert s.execute(
        "SELECT getSetting('compatibility')").rows() == [("24.3",)]
    with pytest.raises(Exception, match="Unknown setting"):
        s.execute("SELECT getSetting('no_such_setting_xyz')")


# -- 5: SAMPLE BY survives restart -------------------------------------------

def test_sample_by_survives_restart(tmp_path):
    from clickhouse_tpu.storage.table import Catalog
    s = ch.connect(catalog=Catalog(), data_path=str(tmp_path))
    s.execute("CREATE TABLE ts (u Int64) ENGINE = MergeTree "
              "ORDER BY u SAMPLE BY u")
    s.insert_pydict("ts", {"u": np.arange(1000, dtype=np.int64)})
    n1 = s.execute("SELECT count() FROM ts SAMPLE 1/2").rows()[0][0]
    s2 = ch.connect(catalog=Catalog(), data_path=str(tmp_path))
    n2 = s2.execute("SELECT count() FROM ts SAMPLE 1/2").rows()[0][0]
    assert n1 == n2 and 0 < n2 < 1000
