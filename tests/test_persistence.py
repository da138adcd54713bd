"""Durable tables through the disks layer (storage/persist.py).

The reference's durability model: immutable parts + atomic publish
(MergeTreeDataWriter write-tmp-then-rename); restart recovery reloads the
catalog from disk.  Simulated restart = a fresh Session over a fresh
Catalog pointed at the same data_path.
"""
import numpy as np
import pytest

import clickhouse_tpu as ch


def _fresh(path):
    """A brand-new process-equivalent session over `path`."""
    from clickhouse_tpu.storage.table import Catalog
    return ch.connect(catalog=Catalog(), data_path=str(path))


class TestRestartSurvival:
    def test_insert_survives_restart(self, tmp_path):
        s = _fresh(tmp_path)
        s.execute("CREATE TABLE t (k Int64, v Float64, name String) "
                  "ENGINE = MergeTree ORDER BY k")
        s.execute("INSERT INTO t VALUES (2, 0.5, 'b'), (1, 1.5, 'a')")
        s.execute("INSERT INTO t VALUES (3, 2.5, 'c')")
        want = s.execute("SELECT * FROM t ORDER BY k").rows()

        s2 = _fresh(tmp_path)
        assert s2.execute("SELECT * FROM t ORDER BY k").rows() == want
        # parts survive as separate immutable units
        assert len(s2.catalog.get_table("default", "t").parts) == 2

    def test_memory_engine_not_persisted(self, tmp_path):
        s = _fresh(tmp_path)
        s.execute("CREATE TABLE m (x Int64) ENGINE = Memory")
        s.execute("INSERT INTO m VALUES (1)")
        s2 = _fresh(tmp_path)
        assert not s2.catalog.has_table("default", "m")

    def test_nullable_and_minmax_survive(self, tmp_path):
        s = _fresh(tmp_path)
        s.execute("CREATE TABLE t (k Int64, n Nullable(Int64)) "
                  "ENGINE = MergeTree ORDER BY k")
        s.execute("INSERT INTO t VALUES (5, NULL), (6, 42)")
        s2 = _fresh(tmp_path)
        assert s2.execute("SELECT n FROM t ORDER BY k").rows() \
            == [(None,), (42,)]
        t = s2.catalog.get_table("default", "t")
        assert t.parts[0].minmax["k"] == (5.0, 6.0)

    def test_truncate_and_drop_survive(self, tmp_path):
        s = _fresh(tmp_path)
        s.execute("CREATE TABLE a (x Int64) ENGINE = MergeTree ORDER BY x")
        s.execute("CREATE TABLE b (x Int64) ENGINE = MergeTree ORDER BY x")
        s.execute("INSERT INTO a VALUES (1)")
        s.execute("INSERT INTO b VALUES (2)")
        s.execute("TRUNCATE TABLE a")
        s.execute("DROP TABLE b")
        s2 = _fresh(tmp_path)
        assert s2.execute("SELECT count() FROM a").rows() == [(0,)]
        assert not s2.catalog.has_table("default", "b")

    def test_optimize_rewrites_storage(self, tmp_path):
        s = _fresh(tmp_path)
        s.execute("CREATE TABLE t (k Int64, v Int64) "
                  "ENGINE = SummingMergeTree ORDER BY k")
        s.execute("INSERT INTO t VALUES (1, 10), (2, 20)")
        s.execute("INSERT INTO t VALUES (1, 5)")
        s.execute("OPTIMIZE TABLE t")
        s2 = _fresh(tmp_path)
        assert s2.execute("SELECT k, v FROM t ORDER BY k").rows() \
            == [(1, 15), (2, 20)]
        assert len(s2.catalog.get_table("default", "t").parts) == 1

    def test_mutation_survives(self, tmp_path):
        s = _fresh(tmp_path)
        s.execute("CREATE TABLE t (k Int64, v Int64) "
                  "ENGINE = MergeTree ORDER BY k")
        s.execute("INSERT INTO t VALUES (1, 1), (2, 2), (3, 3)")
        s.execute("ALTER TABLE t DELETE WHERE k = 2")
        s.execute("ALTER TABLE t UPDATE v = 99 WHERE k = 3")
        s2 = _fresh(tmp_path)
        assert s2.execute("SELECT k, v FROM t ORDER BY k").rows() \
            == [(1, 1), (3, 99)]

    def test_alter_columns_survive(self, tmp_path):
        s = _fresh(tmp_path)
        s.execute("CREATE TABLE t (k Int64, dead Int64) "
                  "ENGINE = MergeTree ORDER BY k")
        s.execute("INSERT INTO t VALUES (1, 0)")
        s.execute("ALTER TABLE t ADD COLUMN extra Int64 DEFAULT 7")
        s.execute("ALTER TABLE t DROP COLUMN dead")
        s2 = _fresh(tmp_path)
        assert s2.execute("SELECT * FROM t").rows() == [(1, 7)]

    def test_custom_database_survives(self, tmp_path):
        s = _fresh(tmp_path)
        s.execute("CREATE DATABASE mydb")
        s.execute("CREATE TABLE mydb.t (x Int64) "
                  "ENGINE = MergeTree ORDER BY x")
        s.execute("INSERT INTO mydb.t VALUES (11)")
        s2 = _fresh(tmp_path)
        assert s2.execute("SELECT x FROM mydb.t").rows() == [(11,)]


class TestDetachAttach:
    def test_detach_then_attach(self, tmp_path):
        s = _fresh(tmp_path)
        s.execute("CREATE TABLE t (x Int64) ENGINE = MergeTree ORDER BY x")
        s.execute("INSERT INTO t VALUES (5)")
        s.execute("DETACH TABLE t")
        assert not s.catalog.has_table("default", "t")
        s.execute("ATTACH TABLE t")
        assert s.execute("SELECT x FROM t").rows() == [(5,)]

    def test_detached_survives_restart(self, tmp_path):
        s = _fresh(tmp_path)
        s.execute("CREATE TABLE t (x Int64) ENGINE = MergeTree ORDER BY x")
        s.execute("INSERT INTO t VALUES (5)")
        s.execute("DETACH TABLE t")
        s2 = _fresh(tmp_path)
        # detached tables are not auto-loaded... but ATTACH finds the data
        s2.execute("ATTACH TABLE t")
        assert s2.execute("SELECT x FROM t").rows() == [(5,)]

    def test_attach_with_schema_still_creates(self, tmp_path):
        s = _fresh(tmp_path)
        s.execute("ATTACH TABLE fresh (x Int64) ENGINE = Memory")
        s.execute("INSERT INTO fresh VALUES (1)")
        assert s.execute("SELECT count() FROM fresh").rows() == [(1,)]


class TestDiskBackup:
    def test_backup_restore_disk_target(self, tmp_path):
        s = _fresh(tmp_path)
        s.execute("CREATE TABLE t (x Int64, s String) "
                  "ENGINE = MergeTree ORDER BY x")
        s.execute("INSERT INTO t VALUES (1, 'one'), (2, 'two')")
        s.execute("BACKUP TABLE t TO Disk('default', 'snap1.bak')")
        s.execute("DROP TABLE t")
        s.execute("RESTORE TABLE t FROM Disk('default', 'snap1.bak')")
        assert s.execute("SELECT * FROM t ORDER BY x").rows() \
            == [(1, "one"), (2, "two")]

    def test_system_disks(self, tmp_path):
        s = _fresh(tmp_path)
        rows = s.execute("SELECT name, type FROM system.disks").rows()
        assert ("default", "local") in rows


class TestObjectStorageDiskTables:
    def test_tables_persist_on_object_storage(self, tmp_path):
        from clickhouse_tpu.storage.disks import (LocalObjectStorage,
                                                  ObjectStorageDisk)
        from clickhouse_tpu.storage.table import Catalog

        def fresh():
            c = Catalog()
            disk = ObjectStorageDisk(
                "s3ish", LocalObjectStorage(str(tmp_path / "blobs")))
            c.enable_persistence(disk)
            return ch.connect(catalog=c)

        s = fresh()
        s.execute("CREATE TABLE t (k Int64, v Float64) "
                  "ENGINE = MergeTree ORDER BY k")
        s.insert_pydict("t", {"k": np.arange(100, dtype=np.int64),
                              "v": np.arange(100) * 0.5})
        want = s.execute("SELECT sum(k), sum(v) FROM t").rows()
        s2 = fresh()
        assert s2.execute("SELECT sum(k), sum(v) FROM t").rows() == want
