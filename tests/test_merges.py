"""Merge fold algorithms (storage/merges.py) + background executor
(storage/background.py) + Collapsing FINAL reads.

Reference semantics: CollapsingSortedAlgorithm.cpp:88-114 (p>n keeps last
positive, p<n first negative, p==n with trailing positive keeps both,
p==n trailing negative collapses fully) and
VersionedCollapsingAlgorithm.cpp (±1 annihilation per key+version).
"""
import numpy as np
import pytest

import clickhouse_tpu as ch


class TestCollapsing:
    def _mk(self):
        s = ch.connect()
        s.execute("CREATE TABLE t (k Int64, v Int64, sign Int8) "
                  "ENGINE = CollapsingMergeTree(sign) ORDER BY k")
        return s

    def test_pair_cancels(self):
        s = self._mk()
        s.execute("INSERT INTO t VALUES (1, 10, 1)")
        s.execute("INSERT INTO t VALUES (1, 10, -1)")
        s.execute("OPTIMIZE TABLE t")
        assert s.execute("SELECT count() FROM t").rows() == [(0,)]

    def test_extra_positive_survives(self):
        s = self._mk()
        s.execute("INSERT INTO t VALUES (1, 10, 1), (1, 10, -1), (1, 20, 1)")
        s.execute("OPTIMIZE TABLE t")
        assert s.execute("SELECT k, v FROM t").rows() == [(1, 20)]

    def test_extra_negative_keeps_first_negative(self):
        s = self._mk()
        s.execute("INSERT INTO t VALUES (2, 5, -1), (2, 7, -1), (2, 6, 1)")
        s.execute("OPTIMIZE TABLE t")
        assert s.execute("SELECT k, v, sign FROM t").rows() == [(2, 5, -1)]

    def test_equal_counts_trailing_positive_keeps_pair(self):
        s = self._mk()
        # -1 then +1: counts equal, last is positive -> emit both
        s.execute("INSERT INTO t VALUES (3, 1, -1), (3, 2, 1)")
        s.execute("OPTIMIZE TABLE t")
        assert s.execute("SELECT v, sign FROM t ORDER BY v").rows() \
            == [(1, -1), (2, 1)]

    def test_multiple_keys(self):
        s = self._mk()
        s.execute("INSERT INTO t VALUES (1, 1, 1), (2, 2, 1)")
        s.execute("INSERT INTO t VALUES (1, 1, -1), (2, 3, 1)")
        s.execute("OPTIMIZE TABLE t")
        rows = s.execute("SELECT k, v FROM t ORDER BY k, v").rows()
        assert rows == [(2, 3)]

    def test_final_read_matches_optimize(self):
        s = self._mk()
        s.execute("INSERT INTO t VALUES (1, 10, 1), (2, 5, 1)")
        s.execute("INSERT INTO t VALUES (1, 10, -1), (3, 7, -1)")
        final = s.execute("SELECT k, v FROM t FINAL ORDER BY k").rows()
        s.execute("OPTIMIZE TABLE t")
        merged = s.execute("SELECT k, v FROM t ORDER BY k").rows()
        assert final == merged == [(2, 5), (3, 7)]


class TestVersionedCollapsing:
    def _mk(self):
        s = ch.connect()
        s.execute("CREATE TABLE t (k Int64, v Int64, sign Int8, ver UInt64) "
                  "ENGINE = VersionedCollapsingMergeTree(sign, ver) "
                  "ORDER BY k")
        return s

    def test_same_version_cancels(self):
        s = self._mk()
        s.execute("INSERT INTO t VALUES (1, 10, 1, 1)")
        s.execute("INSERT INTO t VALUES (1, 10, -1, 1), (1, 20, 1, 2)")
        s.execute("OPTIMIZE TABLE t")
        assert s.execute("SELECT k, v, ver FROM t").rows() == [(1, 20, 2)]

    def test_different_versions_survive(self):
        s = self._mk()
        s.execute("INSERT INTO t VALUES (1, 10, 1, 1), (1, 10, -1, 2)")
        s.execute("OPTIMIZE TABLE t")
        assert s.execute("SELECT count() FROM t").rows() == [(2,)]

    def test_final_read(self):
        s = self._mk()
        s.execute("INSERT INTO t VALUES (1, 10, 1, 1), (2, 9, 1, 1)")
        s.execute("INSERT INTO t VALUES (1, 10, -1, 1)")
        assert s.execute("SELECT k, v FROM t FINAL ORDER BY k").rows() \
            == [(2, 9)]


class TestReplacingWithVersion:
    def test_max_version_wins(self):
        s = ch.connect()
        s.execute("CREATE TABLE t (k Int64, v Int64, ver UInt64) "
                  "ENGINE = ReplacingMergeTree(ver) ORDER BY k")
        s.execute("INSERT INTO t VALUES (1, 100, 5)")
        s.execute("INSERT INTO t VALUES (1, 200, 3), (2, 9, 1)")
        s.execute("OPTIMIZE TABLE t")
        # ver=5 wins even though ver=3 was inserted later
        assert s.execute("SELECT k, v FROM t ORDER BY k").rows() \
            == [(1, 100), (2, 9)]


class TestSummingNumpy:
    def test_sums_and_first_string(self):
        s = ch.connect()
        s.execute("CREATE TABLE t (k Int64, v Int64, f Float64, s String) "
                  "ENGINE = SummingMergeTree ORDER BY k")
        s.execute("INSERT INTO t VALUES (1, 10, 0.5, 'first')")
        s.execute("INSERT INTO t VALUES (1, 32, 1.0, 'second'), "
                  "(2, 7, 2.0, 'x')")
        s.execute("OPTIMIZE TABLE t")
        assert s.execute("SELECT k, v, f, s FROM t ORDER BY k").rows() \
            == [(1, 42, 1.5, "first"), (2, 7, 2.0, "x")]


class TestBackgroundMerges:
    def test_parts_merge_in_background(self):
        s = ch.connect()
        s.execute("CREATE TABLE t (k Int64, v Int64) "
                  "ENGINE = SummingMergeTree ORDER BY k")
        for i in range(9):
            s.execute(f"INSERT INTO t VALUES ({i % 3}, 1)",
                      settings={"background_merge_min_parts": 8})
        s.execute("SYSTEM WAIT MERGES")
        t = s.catalog.get_table("default", "t")
        # the 9th insert can land before OR after the 8-part merge completes:
        # either one merged part, or merged part + one straggler
        assert len(t.parts) <= 2
        assert s.execute("SELECT k, v FROM t ORDER BY k").rows() \
            == [(0, 3), (1, 3), (2, 3)]
        assert s.catalog.background.merges_done >= 1

    def test_stop_merges(self):
        s = ch.connect()
        s.execute("CREATE TABLE t (k Int64) ENGINE = MergeTree ORDER BY k")
        s.execute("SYSTEM STOP MERGES")
        for i in range(10):
            s.execute(f"INSERT INTO t VALUES ({i})",
                      settings={"background_merge_min_parts": 4})
        t = s.catalog.get_table("default", "t")
        assert len(t.parts) == 10

    def test_system_merges_table(self):
        s = ch.connect()
        r = s.execute("SELECT count() FROM system.merges")
        assert r.rows() == [(0,)]

    def test_background_merge_persists(self, tmp_path):
        from clickhouse_tpu.storage.table import Catalog
        s = ch.connect(catalog=Catalog(), data_path=str(tmp_path))
        s.execute("CREATE TABLE t (k Int64, v Int64) "
                  "ENGINE = SummingMergeTree ORDER BY k")
        for i in range(8):
            s.execute(f"INSERT INTO t VALUES (1, 1)",
                      settings={"background_merge_min_parts": 8})
        s.execute("SYSTEM WAIT MERGES")
        s2 = ch.connect(catalog=Catalog(), data_path=str(tmp_path))
        assert s2.execute("SELECT k, v FROM t").rows() == [(1, 8)]
        assert len(s2.catalog.get_table("default", "t").parts) == 1
