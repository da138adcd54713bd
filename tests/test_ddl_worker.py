"""Replicated DDL: ON CLUSTER through the Keeper DDL queue and
DatabaseReplicated schema replication (coordination/ddl_worker.py — the
DDLWorker / DatabaseReplicated analog, ref src/Interpreters/DDLWorker.h:54,
src/Databases/DatabaseReplicated.h).

Pseudo-cluster discipline (SURVEY.md §4): independent sessions over
independent catalogs share nothing but the (networked) Keeper."""
import time

import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.coordination.keeper import reset_keepers
from clickhouse_tpu.coordination.keeper_net import KeeperServer
from clickhouse_tpu.storage.table import Catalog


@pytest.fixture()
def kserver():
    srv = KeeperServer(port=0).start_background()
    yield srv
    srv.shutdown()
    reset_keepers()


def _node(addr, host_id, clusters):
    s = ch.connect(catalog=Catalog())
    s.execute(f"SET keeper_address = '{addr}'")
    s.enable_ddl_worker(host_id, clusters)
    return s


def _wait(cond, timeout=10.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if cond():
            return True
        time.sleep(0.05)
    return False


class TestOnClusterDDL:
    def test_create_alter_drop_apply_on_both_nodes(self, kserver):
        addr = f"127.0.0.1:{kserver.port}"
        cl = {"c2": ["h1", "h2"]}
        a = _node(addr, "h1", cl)
        b = _node(addr, "h2", cl)
        a.execute("CREATE TABLE t_oc ON CLUSTER c2 (x Int64) "
                  "ENGINE = MergeTree ORDER BY x")
        assert _wait(lambda: b.catalog.has_table("default", "t_oc"))
        b.execute("ALTER TABLE t_oc ON CLUSTER c2 ADD COLUMN y Int64")
        assert _wait(lambda: "y" in a.catalog.get_table(
            "default", "t_oc").schema)
        # the queue carries data-independent DDL only; inserts stay local
        a.execute("INSERT INTO t_oc VALUES (1, 2)")
        assert a.execute("SELECT count() FROM t_oc").rows() == [(1,)]
        assert b.execute("SELECT count() FROM t_oc").rows() == [(0,)]
        a.execute("DROP TABLE t_oc ON CLUSTER c2 SYNC")
        assert _wait(lambda: not b.catalog.has_table("default", "t_oc"))

    def test_unknown_cluster_applies_locally(self, kserver):
        addr = f"127.0.0.1:{kserver.port}"
        a = _node(addr, "h1", {})
        a.execute("CREATE TABLE t_l ON CLUSTER test_shard_localhost "
                  "(x Int64)")
        assert a.catalog.has_table("default", "t_l")

    def test_failed_ddl_reports_per_host_status(self, kserver):
        addr = f"127.0.0.1:{kserver.port}"
        cl = {"c2": ["h1", "h2"]}
        a = _node(addr, "h1", cl)
        b = _node(addr, "h2", cl)
        # b already has the table -> its host status carries the error
        b.execute("CREATE TABLE t_conflict (x Int64)")
        with pytest.raises(Exception, match="h2"):
            a.execute("CREATE TABLE t_conflict ON CLUSTER c2 (x Int64)")


class TestDatabaseReplicated:
    def test_schema_replicates_and_late_replica_catches_up(self, kserver):
        addr = f"127.0.0.1:{kserver.port}"
        a = ch.connect(catalog=Catalog())
        a.execute(f"SET keeper_address = '{addr}'")
        b = ch.connect(catalog=Catalog())
        b.execute(f"SET keeper_address = '{addr}'")
        a.replica_name = "r1"
        b.replica_name = "r2"
        a.execute("CREATE DATABASE rdb "
                  "ENGINE = Replicated('/clickhouse/databases/rdb', "
                  "'shard1', 'r1')")
        b.execute("CREATE DATABASE rdb "
                  "ENGINE = Replicated('/clickhouse/databases/rdb', "
                  "'shard1', 'r2')")
        a.execute("CREATE TABLE rdb.m (k Int64, v Int64) "
                  "ENGINE = MergeTree ORDER BY k")
        assert _wait(lambda: b.catalog.has_table("rdb", "m"))
        b.execute("ALTER TABLE rdb.m ADD COLUMN w Int64")
        assert _wait(lambda: "w" in a.catalog.get_table("rdb", "m").schema)
        # a replica that was down during the above DDL attaches now and
        # replays the queue (restart catch-up)
        late = ch.connect(catalog=Catalog())
        late.execute(f"SET keeper_address = '{addr}'")
        late.execute("CREATE DATABASE rdb "
                     "ENGINE = Replicated('/clickhouse/databases/rdb', "
                     "'shard1', 'r3')")
        assert _wait(lambda: late.catalog.has_table("rdb", "m"))
        assert _wait(lambda: "w" in late.catalog.get_table(
            "rdb", "m").schema)
        a.execute("DROP TABLE rdb.m SYNC")
        assert _wait(lambda: not b.catalog.has_table("rdb", "m"))
        assert _wait(lambda: not late.catalog.has_table("rdb", "m"))
