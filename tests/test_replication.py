"""Keeper-coordinated replication (reference: ReplicatedMergeTree +
TestKeeper, src/Common/ZooKeeper/TestKeeper.h:35,
src/Storages/MergeTree/ReplicatedMergeTreeQueue.cpp)."""
import threading

import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.coordination import (Keeper, NoNodeError,
                                         NodeExistsError, reset_keepers)


@pytest.fixture(autouse=True)
def fresh_keeper():
    reset_keepers()
    yield
    reset_keepers()


class TestKeeperPrimitives:
    def test_create_get_set_versioning(self):
        k = Keeper()
        k.create("/a", b"x", make_parents=True)
        data, v = k.get("/a")
        assert data == b"x" and v == 0
        assert k.set("/a", b"y") == 1
        with pytest.raises(Exception):
            k.set("/a", b"z", version=0)      # CAS mismatch

    def test_sequential_nodes(self):
        k = Keeper()
        k.create("/log", make_parents=True)
        p1 = k.create("/log/e-", sequential=True)
        p2 = k.create("/log/e-", sequential=True)
        assert p1 == "/log/e-0000000000" and p2 == "/log/e-0000000001"
        assert k.get_children("/log") == ["e-0000000000", "e-0000000001"]

    def test_exists_remove(self):
        k = Keeper()
        k.create("/x/y", b"", make_parents=True)
        assert k.exists("/x/y")
        k.remove("/x/y")
        assert not k.exists("/x/y")
        with pytest.raises(NoNodeError):
            k.get("/x/y")

    def test_try_create_lock(self):
        k = Keeper()
        assert k.try_create("/lock", "me")
        assert not k.try_create("/lock", "you")

    def test_duplicate_create_raises(self):
        k = Keeper()
        k.create("/n", make_parents=True)
        with pytest.raises(NodeExistsError):
            k.create("/n")

    def test_watches_fire(self):
        k = Keeper()
        seen = []
        k.watch("/w", seen.append)
        k.create("/w/child", b"", make_parents=True)
        assert seen


def _mk_replica(name, path="/ch/t/rt"):
    s = ch.connect()
    s.replica_name = name
    s.execute(f"CREATE TABLE rt (k Int64, v Int64) "
              f"ENGINE = ReplicatedMergeTree('{path}', '{name}') ORDER BY k")
    return s


class TestReplicatedTables:
    def test_insert_replicates_both_ways(self):
        a, b = _mk_replica("r1"), _mk_replica("r2")
        a.execute("INSERT INTO rt VALUES (1, 10), (2, 20)")
        assert b.execute("SELECT count(), sum(v) FROM rt").rows() == [(2, 30)]
        b.execute("INSERT INTO rt VALUES (3, 30)")
        assert a.execute("SELECT count(), sum(v) FROM rt").rows() == [(3, 60)]

    def test_insert_deduplication(self):
        a, b = _mk_replica("r1"), _mk_replica("r2")
        a.execute("INSERT INTO rt VALUES (1, 10)")
        a.execute("INSERT INTO rt VALUES (1, 10)")   # retried block: absorbed
        assert b.execute("SELECT count() FROM rt").scalar() == 1
        # a genuinely different block with equal values still lands twice?
        # no — dedup is content-based, like insert_deduplicate
        a.execute("INSERT INTO rt VALUES (1, 11)")
        assert b.execute("SELECT count() FROM rt").scalar() == 2

    def test_late_replica_recovers_history(self):
        a = _mk_replica("r1")
        a.execute("INSERT INTO rt VALUES (1, 10)")
        a.execute("INSERT INTO rt VALUES (2, 20)")
        c = _mk_replica("r3")
        assert c.execute("SELECT count(), sum(v) FROM rt").rows() == [(2, 30)]

    def test_system_sync_replica(self):
        a, b = _mk_replica("r1"), _mk_replica("r2")
        a.execute("INSERT INTO rt VALUES (5, 50)")
        b.execute("SYSTEM SYNC REPLICA rt")
        tb = b.catalog.get_table("default", "rt")
        assert sum(p.num_rows for p in tb.parts) == 1

    def test_default_zk_path_and_macros(self):
        a = ch.connect()
        a.replica_name = "rx"
        a.execute("CREATE TABLE m (x Int64) ENGINE = "
                  "ReplicatedMergeTree('/ch/{database}/{table}', '{replica}') "
                  "ORDER BY x")
        t = a.catalog.get_table("default", "m")
        assert t.replication.zk_path == "/ch/default/m"
        assert t.replication.replica == "rx"
        assert t.replication.replicas == ["rx"]

    def test_replicated_replacing_final(self):
        """Replicated engines keep the base engine's FINAL fold."""
        a = ch.connect()
        a.execute("CREATE TABLE rr (k Int64, v Int64) ENGINE = "
                  "ReplicatedReplacingMergeTree('/ch/rr', 'r1') ORDER BY k")
        a.execute("INSERT INTO rr VALUES (1, 10)")
        a.execute("INSERT INTO rr VALUES (1, 99)")
        assert a.execute("SELECT v FROM rr FINAL").rows() == [(99,)]

    def test_concurrent_inserts_converge(self):
        a, b = _mk_replica("r1"), _mk_replica("r2")

        def wa():
            for i in range(5):
                a.execute(f"INSERT INTO rt VALUES ({i}, {i})")

        def wb():
            for i in range(5, 10):
                b.execute(f"INSERT INTO rt VALUES ({i}, {i})")
        ta = threading.Thread(target=wa)
        tb = threading.Thread(target=wb)
        ta.start(); tb.start(); ta.join(); tb.join()
        assert a.execute("SELECT count() FROM rt").scalar() == 10
        assert b.execute("SELECT count() FROM rt").scalar() == 10
        assert a.execute("SELECT sum(v) FROM rt").scalar() == 45
