"""Networked Keeper (coordination/keeper_net.py): the znode tree served
over TCP, and cross-process ReplicatedMergeTree through it.

In-process multi-catalog sessions stand in for separate engine processes —
they share NOTHING except real sockets to the KeeperServer (the reference
validates multi-node coordination on single-host pseudo-clusters the same
way, SURVEY.md §4)."""
import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.coordination.keeper import (NodeExistsError,
                                                NoNodeError, reset_keepers)
from clickhouse_tpu.coordination.keeper_net import KeeperClient, KeeperServer


@pytest.fixture()
def kserver():
    srv = KeeperServer(port=0).start_background()
    yield srv
    srv.shutdown()
    reset_keepers()


class TestWireProtocol:
    def test_crud(self, kserver):
        c = KeeperClient(kserver.host, kserver.port)
        assert c.ping()
        c.create("/a", b"x", make_parents=True)
        assert c.exists("/a")
        data, ver = c.get("/a")
        assert data == b"x" and ver == 0
        assert c.set("/a", 42) == 1
        assert c.get("/a")[0] == 42
        c.create("/a/kid1")
        c.create("/a/kid2")
        assert c.get_children("/a") == ["kid1", "kid2"]
        c.remove("/a/kid1")
        assert c.get_children("/a") == ["kid2"]
        with pytest.raises(NoNodeError):
            c.get("/missing")
        with pytest.raises(NodeExistsError):
            c.create("/a")
        c.close()

    def test_sequential_and_block_payload(self, kserver):
        c = KeeperClient(kserver.host, kserver.port)
        n1 = c.create("/log/entry-", {"source": "r1"}, sequential=True,
                      make_parents=True)
        n2 = c.create("/log/entry-", {"source": "r2"}, sequential=True)
        assert n1.endswith("0000000000") and n2.endswith("0000000001")
        # numpy part payloads ride as compressed Native blocks
        data = {"k": np.arange(5, dtype=np.int64),
                "s": np.asarray(["a", "b", "c", "d", "e"], object)}
        c.create("/part", {"block_id": "b1", "data": data},
                 make_parents=True)
        back, _ = c.get("/part")
        assert back["block_id"] == "b1"
        assert back["data"]["k"].tolist() == [0, 1, 2, 3, 4]
        assert list(back["data"]["s"]) == ["a", "b", "c", "d", "e"]
        c.close()

    def test_ephemerals_vanish_on_disconnect(self, kserver):
        c1 = KeeperClient(kserver.host, kserver.port)
        c1.create("/eph", b"", ephemeral_owner="me", make_parents=True)
        c2 = KeeperClient(kserver.host, kserver.port)
        assert c2.exists("/eph")
        c1.close()
        import time
        for _ in range(100):
            if not c2.exists("/eph"):
                break
            time.sleep(0.02)
        assert not c2.exists("/eph")
        c2.close()


class TestCrossProcessReplication:
    def test_replicated_tables_over_the_wire(self, kserver):
        from clickhouse_tpu.storage.table import Catalog
        addr = f"{kserver.host}:{kserver.port}"
        # two sessions with SEPARATE catalogs — nothing shared in-process
        a = ch.connect(catalog=Catalog())
        a.execute(f"SET keeper_address = '{addr}'")
        b = ch.connect(catalog=Catalog())
        b.execute(f"SET keeper_address = '{addr}'")
        ddl = ("CREATE TABLE r (k Int64, v Float64, s String) "
               "ENGINE = ReplicatedMergeTree('/t/r', '{name}') ORDER BY k")
        a.replica_name = "ra"
        b.replica_name = "rb"
        a.execute(ddl.format(name="ra"))
        b.execute(ddl.format(name="rb"))
        a.execute("INSERT INTO r VALUES (1, 0.5, 'x'), (2, 1.5, 'y')")
        b.execute("SYSTEM SYNC REPLICA r")
        assert b.execute("SELECT k, v, s FROM r ORDER BY k").rows() \
            == [(1, 0.5, "x"), (2, 1.5, "y")]
        # writes flow both ways
        b.execute("INSERT INTO r VALUES (3, 2.5, 'z')")
        a.execute("SYSTEM SYNC REPLICA r")
        assert a.execute("SELECT count() FROM r").rows() == [(3,)]
        # insert dedup across replicas by block id
        b.execute("INSERT INTO r VALUES (1, 0.5, 'x'), (2, 1.5, 'y')")
        a.execute("SYSTEM SYNC REPLICA r")
        assert a.execute("SELECT count() FROM r").rows() == [(3,)]

    def test_late_replica_recovers_history(self, kserver):
        from clickhouse_tpu.storage.table import Catalog
        addr = f"{kserver.host}:{kserver.port}"
        a = ch.connect(catalog=Catalog())
        a.execute(f"SET keeper_address = '{addr}'")
        a.replica_name = "ra"
        a.execute("CREATE TABLE h (x Int64) "
                  "ENGINE = ReplicatedMergeTree('/t/h', 'ra') ORDER BY x")
        a.execute("INSERT INTO h VALUES (10), (20)")
        # a replica that joins later replays the full log
        late = ch.connect(catalog=Catalog())
        late.execute(f"SET keeper_address = '{addr}'")
        late.replica_name = "rl"
        late.execute("CREATE TABLE h (x Int64) "
                     "ENGINE = ReplicatedMergeTree('/t/h', 'rl') ORDER BY x")
        late.execute("SYSTEM SYNC REPLICA h")
        assert late.execute("SELECT sum(x) FROM h").rows() == [(30,)]
