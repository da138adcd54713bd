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
