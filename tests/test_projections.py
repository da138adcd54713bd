"""MergeTree projections: declaration, state maintenance on insert, and
the aggregate-projection query rewrite
(reference: ProjectionDescription + optimizeUseAggregateProjection.cpp)."""
import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.storage.projections import PROJ_DB


@pytest.fixture()
def s():
    sess = ch.connect()
    sess.execute(
        "CREATE TABLE pv (k Int64, g Int64, v Int64, "
        "PROJECTION agg (SELECT k, sum(v), count() GROUP BY k))")
    rng = np.random.default_rng(2)
    for n in (1000, 500):
        sess.insert_pydict("pv", {
            "k": rng.integers(0, 5, n).astype(np.int64),
            "g": rng.integers(0, 3, n).astype(np.int64),
            "v": rng.integers(0, 100, n).astype(np.int64)})
    return sess


def _plan_text(sess, sql):
    return "\n".join(r[0] for r in sess.execute("EXPLAIN " + sql).rows())


class TestProjectionRewrite:
    def test_rewrite_used_and_exact(self, s):
        sql = "SELECT k, sum(v), count() FROM pv GROUP BY k ORDER BY k"
        assert PROJ_DB in _plan_text(s, sql)
        got = s.execute(sql).rows()
        exp = s.execute(sql + " SETTINGS optimize_use_projections = 0").rows()
        assert got == exp

    def test_filter_on_key_uses_projection(self, s):
        sql = "SELECT sum(v) FROM pv WHERE k = 3"
        assert PROJ_DB in _plan_text(s, sql)
        assert s.execute(sql).scalar() == s.execute(
            sql + " SETTINGS optimize_use_projections = 0").scalar()

    def test_global_aggregate_uses_projection(self, s):
        sql = "SELECT sum(v) FROM pv"
        assert PROJ_DB in _plan_text(s, sql)
        assert s.execute(sql).scalar() == s.execute(
            sql + " SETTINGS optimize_use_projections = 0").scalar()

    def test_nonmatching_key_falls_back(self, s):
        sql = "SELECT g, sum(v) FROM pv GROUP BY g ORDER BY g"
        assert PROJ_DB not in _plan_text(s, sql)
        assert s.execute(sql).rows() == s.execute(
            sql + " SETTINGS optimize_use_projections = 0").rows()

    def test_nonmatching_agg_falls_back(self, s):
        sql = "SELECT k, max(v) FROM pv GROUP BY k ORDER BY k"
        assert PROJ_DB not in _plan_text(s, sql)

    def test_filter_on_nonkey_falls_back(self, s):
        sql = "SELECT k, sum(v) FROM pv WHERE g = 1 GROUP BY k"
        assert PROJ_DB not in _plan_text(s, sql)

    def test_setting_disables(self, s):
        sql = ("SELECT k, sum(v) FROM pv GROUP BY k "
               "SETTINGS optimize_use_projections = 0")
        assert PROJ_DB not in _plan_text(s, sql)


class TestProjectionLifecycle:
    def test_alter_add_backfills(self, s):
        s.execute("ALTER TABLE pv ADD PROJECTION byg "
                  "(SELECT g, sum(v) GROUP BY g)")
        sql = "SELECT g, sum(v) FROM pv GROUP BY g ORDER BY g"
        assert PROJ_DB in _plan_text(s, sql)
        assert s.execute(sql).rows() == s.execute(
            sql + " SETTINGS optimize_use_projections = 0").rows()

    def test_drop_projection(self, s):
        s.execute("ALTER TABLE pv DROP PROJECTION agg")
        sql = "SELECT k, sum(v) FROM pv GROUP BY k"
        assert PROJ_DB not in _plan_text(s, sql)

    def test_mutation_rebuilds(self, s):
        s.execute("ALTER TABLE pv DELETE WHERE v < 50")
        sql = "SELECT k, sum(v), count() FROM pv GROUP BY k ORDER BY k"
        assert PROJ_DB in _plan_text(s, sql)
        got = s.execute(sql).rows()
        exp = s.execute(sql + " SETTINGS optimize_use_projections = 0").rows()
        assert got == exp

    def test_insert_appends_state_slices(self, s):
        pt = s.catalog.get_table(PROJ_DB, "default.pv.agg")
        before = pt.num_rows
        s.execute("INSERT INTO pv VALUES (1, 1, 7)")
        assert pt.num_rows == before + 1      # one new slice for key 1
        sql = "SELECT sum(v) FROM pv WHERE k = 1"
        assert s.execute(sql).scalar() == s.execute(
            sql + " SETTINGS optimize_use_projections = 0").scalar()
