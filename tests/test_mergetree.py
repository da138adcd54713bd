"""MergeTree engine family: FINAL reads, OPTIMIZE merges, BACKUP/RESTORE."""
import numpy as np
import pytest

import clickhouse_tpu as ch


@pytest.fixture
def session():
    return ch.connect()


class TestReplacing:
    def _setup(self, s):
        s.execute("CREATE TABLE r (k Int64, v Int64) "
                  "ENGINE = ReplacingMergeTree ORDER BY k")
        s.execute("INSERT INTO r VALUES (1, 10), (2, 20)")
        s.execute("INSERT INTO r VALUES (1, 11), (3, 30)")  # k=1 replaced

    def test_without_final_keeps_duplicates(self, session):
        self._setup(session)
        assert session.execute("SELECT count() FROM r").scalar() == 4

    def test_final_dedups_keep_last(self, session):
        self._setup(session)
        r = session.execute("SELECT k, v FROM r FINAL ORDER BY k")
        assert r.rows() == [(1, 11), (2, 20), (3, 30)]

    def test_final_with_aggregation(self, session):
        self._setup(session)
        assert session.execute("SELECT sum(v) FROM r FINAL").scalar() == 61

    def test_optimize_final_physical_merge(self, session):
        self._setup(session)
        session.execute("OPTIMIZE TABLE r FINAL")
        t = session.catalog.get_table("default", "r")
        assert len(t.parts) == 1
        r = session.execute("SELECT k, v FROM r ORDER BY k")
        assert r.rows() == [(1, 11), (2, 20), (3, 30)]


class TestSumming:
    def _setup(self, s):
        s.execute("CREATE TABLE sm (k Int64, total Int64, label String) "
                  "ENGINE = SummingMergeTree ORDER BY k")
        s.execute("INSERT INTO sm VALUES (1, 5, 'a'), (2, 7, 'b')")
        s.execute("INSERT INTO sm VALUES (1, 3, 'a2'), (2, 1, 'b2')")

    def test_final_sums(self, session):
        self._setup(session)
        r = session.execute("SELECT k, total FROM sm FINAL ORDER BY k")
        assert r.rows() == [(1, 8), (2, 8)]

    def test_optimize_sums(self, session):
        self._setup(session)
        session.execute("OPTIMIZE TABLE sm FINAL")
        r = session.execute("SELECT k, total FROM sm ORDER BY k")
        assert r.rows() == [(1, 8), (2, 8)]
        assert len(session.catalog.get_table("default", "sm").parts) == 1


class TestMerge:
    def test_optimize_plain_merges_parts(self, session):
        session.execute("CREATE TABLE p (x Int64) ENGINE = MergeTree "
                        "ORDER BY x")
        for i in range(5):
            session.execute(f"INSERT INTO p VALUES ({i})")
        t = session.catalog.get_table("default", "p")
        assert len(t.parts) == 5
        session.execute("OPTIMIZE TABLE p")
        assert len(t.parts) == 1
        assert session.execute("SELECT count() FROM p").scalar() == 5


class TestBackup:
    def test_backup_restore_roundtrip(self, session, tmp_path):
        session.execute("CREATE TABLE src (a Int64, s String, "
                        "f Nullable(Float64)) ENGINE = MergeTree ORDER BY a")
        session.insert_pydict("src", {
            "a": np.arange(1000, dtype=np.int64),
            "s": np.asarray([f"v{i % 17}" for i in range(1000)], object),
            "f": np.asarray([float(i) if i % 5 else None
                             for i in range(1000)], object),
        })
        path = str(tmp_path / "src.bak")
        session.execute(f"BACKUP TABLE src TO '{path}'")
        session.execute(f"RESTORE TABLE dst FROM '{path}'")
        a = session.execute("SELECT count(), sum(a), uniqExact(s), "
                            "countIf(f IS NULL) FROM src").rows()
        b = session.execute("SELECT count(), sum(a), uniqExact(s), "
                            "countIf(f IS NULL) FROM dst").rows()
        assert a == b
        t = session.catalog.get_table("default", "dst")
        assert t.engine == "MergeTree" and t.order_by == ["a"]


class TestViews:
    def test_view(self, session):
        session.execute("CREATE TABLE vsrc (k Int64, v Int64)")
        session.execute("INSERT INTO vsrc VALUES (1, 10), (2, 20)")
        session.execute("CREATE VIEW vv AS SELECT k, v * 2 AS d FROM vsrc")
        r = session.execute("SELECT d FROM vv ORDER BY k")
        assert [row[0] for row in r.rows()] == [20, 40]
        # view reflects later inserts
        session.execute("INSERT INTO vsrc VALUES (3, 30)")
        assert session.execute("SELECT count() FROM vv").scalar() == 3
        session.execute("DROP VIEW vv")

    def test_view_with_aggregation(self, session):
        session.execute("CREATE TABLE v2src (g Int64, x Int64)")
        session.execute("INSERT INTO v2src VALUES (1,1),(1,2),(2,3)")
        session.execute("CREATE VIEW v2 AS SELECT g, sum(x) AS s "
                        "FROM v2src GROUP BY g")
        r = session.execute("SELECT g, s FROM v2 ORDER BY g")
        assert r.rows() == [(1, 3), (2, 3)]

    def test_materialized_view_trigger(self, session):
        session.execute("CREATE TABLE msrc (k Int64, v Int64)")
        session.execute("CREATE TABLE mtgt (k Int64, total Int64)")
        session.execute("CREATE MATERIALIZED VIEW mv1 TO mtgt AS "
                        "SELECT k, sum(v) AS total FROM msrc GROUP BY k")
        session.execute("INSERT INTO msrc VALUES (1, 5), (1, 6), (2, 7)")
        r = session.execute("SELECT k, total FROM mtgt ORDER BY k")
        assert r.rows() == [(1, 11), (2, 7)]
        session.execute("INSERT INTO msrc VALUES (2, 3)")
        r = session.execute("SELECT k, sum(total) FROM mtgt GROUP BY k "
                            "ORDER BY k")
        assert r.rows() == [(1, 11), (2, 10)]

    def test_mv_implicit_inner(self, session):
        # no TO target: a hidden `.inner.<name>` table stores the rows
        # (StorageMaterializedView generateInnerTableName analog)
        session.execute("CREATE TABLE m2src (x Int64)")
        session.execute("INSERT INTO m2src VALUES (1)")
        session.execute("CREATE MATERIALIZED VIEW m2v AS "
                        "SELECT x * 2 AS y FROM m2src")
        session.execute("INSERT INTO m2src VALUES (2)")
        r = session.execute("SELECT y FROM m2v ORDER BY y")
        assert list(r.rows()) == [(4,)]          # POPULATE not requested
        r = session.execute("SELECT y FROM `.inner.m2v`")
        assert list(r.rows()) == [(4,)]


class TestMutations:
    def test_alter_delete(self, session):
        session.execute("CREATE TABLE md (k Int64, v Int64)")
        session.execute("INSERT INTO md SELECT number, number * 10 "
                        "FROM numbers(10)")
        session.execute("ALTER TABLE md DELETE WHERE k % 2 = 0")
        r = session.execute("SELECT k FROM md ORDER BY k")
        assert [row[0] for row in r.rows()] == [1, 3, 5, 7, 9]

    def test_alter_update(self, session):
        session.execute("CREATE TABLE mu (k Int64, v Int64)")
        session.execute("INSERT INTO mu VALUES (1, 10), (2, 20), (3, 30)")
        session.execute("ALTER TABLE mu UPDATE v = v + 100 WHERE k >= 2")
        r = session.execute("SELECT k, v FROM mu ORDER BY k")
        assert r.rows() == [(1, 10), (2, 120), (3, 130)]

    def test_add_drop_column(self, session):
        session.execute("CREATE TABLE mc (a Int64)")
        session.execute("INSERT INTO mc VALUES (1), (2)")
        session.execute("ALTER TABLE mc ADD COLUMN b Int64 DEFAULT 7")
        r = session.execute("SELECT a, b FROM mc ORDER BY a")
        assert r.rows() == [(1, 7), (2, 7)]
        session.execute("ALTER TABLE mc DROP COLUMN b")
        names = [row[0] for row in session.execute("DESCRIBE TABLE mc").rows()]
        assert names == ["a"]

    def test_add_string_column(self, session):
        session.execute("CREATE TABLE ms (a Int64)")
        session.execute("INSERT INTO ms VALUES (1)")
        session.execute("ALTER TABLE ms ADD COLUMN s String")
        assert session.execute("SELECT s FROM ms").rows() == [("",)]


class TestDictionaries:
    def test_dict_get(self, session):
        session.execute("CREATE TABLE dsrc (code UInt64, name String, "
                        "pop Int64)")
        session.execute("INSERT INTO dsrc VALUES (1,'US',331),(2,'DE',83)")
        session.execute("CREATE DICTIONARY cd (code UInt64, name String, "
                        "pop Int64) PRIMARY KEY code "
                        "SOURCE(CLICKHOUSE(TABLE 'dsrc')) LAYOUT(HASHED())")
        r = session.execute(
            "SELECT dictGet('cd', 'name', number) AS n, "
            "dictGet('cd', 'pop', number) AS p, "
            "dictHas('cd', number) AS h FROM numbers(3)")
        assert r.rows() == [("", 0, 0), ("US", 331, 1), ("DE", 83, 1)]
        session.execute("DROP DICTIONARY cd")

    def test_dict_get_in_where_and_group(self, session):
        session.execute("CREATE TABLE d2src (k UInt64, grp String)")
        session.execute("INSERT INTO d2src VALUES (0,'even'),(1,'odd')")
        session.execute("CREATE DICTIONARY pd (k UInt64, grp String) "
                        "PRIMARY KEY k SOURCE(CLICKHOUSE(TABLE 'd2src')) "
                        "LAYOUT(FLAT())")
        r = session.execute(
            "SELECT dictGet('pd', 'grp', number % 2) AS g, count() AS c "
            "FROM numbers(10) GROUP BY g ORDER BY g")
        assert r.rows() == [("even", 5), ("odd", 5)]


class TestTTL:
    """Table-level TTL enforced at OPTIMIZE (TTLTransform analog)."""

    def test_ttl_drops_expired_rows(self):
        import time
        s = ch.connect()
        s.execute("CREATE TABLE ev (d DateTime, v Int64) "
                  "ENGINE = MergeTree ORDER BY d TTL d + INTERVAL 1 HOUR")
        now = int(time.time())
        s.insert_pydict("ev", {
            "d": np.asarray([now - 7200, now - 30, now - 8000], np.int64),
            "v": np.asarray([1, 2, 3], np.int64)})
        assert s.execute("SELECT count() FROM ev").scalar() == 3
        s.execute("OPTIMIZE TABLE ev FINAL")
        assert s.execute("SELECT v FROM ev").rows() == [(2,)]

    def test_no_ttl_keeps_rows(self):
        s = ch.connect()
        s.execute("CREATE TABLE nv (v Int64) ENGINE = MergeTree ORDER BY v")
        s.execute("INSERT INTO nv VALUES (1), (2)")
        s.execute("OPTIMIZE TABLE nv")
        assert s.execute("SELECT count() FROM nv").scalar() == 2


class TestSpecialEngines:
    """Set / Join / Buffer engines (StorageSet/StorageJoin/StorageBuffer)."""

    def test_set_engine_in(self):
        s = ch.connect()
        s.execute("CREATE TABLE st (x Int64) ENGINE = Set")
        s.execute("INSERT INTO st VALUES (2), (4)")
        assert s.execute("SELECT number FROM numbers(6) "
                         "WHERE number IN st").rows() == [(2,), (4,)]
        assert s.execute("SELECT count() FROM numbers(6) "
                         "WHERE number NOT IN st").scalar() == 4

    def test_join_engine_joinget(self):
        s = ch.connect()
        s.execute("CREATE TABLE jt (k Int64, name String, w Int64) "
                  "ENGINE = Join(ANY, LEFT, k)")
        s.execute("INSERT INTO jt VALUES (1, 'one', 100), (2, 'two', 200)")
        got = s.execute("SELECT joinGet('jt', 'name', number), "
                        "joinGet('jt', 'w', number) FROM numbers(3)").rows()
        assert got == [("", 0), ("one", 100), ("two", 200)]

    def test_buffer_engine_flushes_to_target(self):
        s = ch.connect()
        s.execute("CREATE TABLE dst (x Int64)")
        s.execute("CREATE TABLE buf (x Int64) ENGINE = Buffer(default, dst, "
                  "16, 10, 100, 10000, 1000000, 10000000, 100000000)")
        s.execute("INSERT INTO buf VALUES (1), (2)")
        assert s.execute("SELECT count() FROM dst").scalar() == 2
        assert s.execute("SELECT sum(x) FROM buf").scalar() == 3
        s.execute("DROP TABLE buf")          # dropping the buffer keeps data
        assert s.execute("SELECT count() FROM dst").scalar() == 2
