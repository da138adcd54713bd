"""Observability: WITH TOTALS, system tables, ProfileEvents, EXPLAIN."""
import numpy as np
import pytest

import clickhouse_tpu as ch


@pytest.fixture
def session():
    s = ch.connect()
    s.execute("CREATE TABLE t (k Int64, v Int64)")
    s.insert_pydict("t", {"k": np.array([1, 1, 2, 2, 3], np.int64),
                          "v": np.array([10, 20, 30, 40, 50], np.int64)})
    return s


class TestTotals:
    def test_with_totals(self, session):
        r = session.execute(
            "SELECT k, sum(v) AS s FROM t GROUP BY k WITH TOTALS ORDER BY k")
        assert [row for row in r.rows()] == [(1, 30), (2, 70), (3, 50)]
        assert r.totals is not None
        assert int(r.totals["s"][0]) == 150

    def test_totals_with_expression(self, session):
        r = session.execute(
            "SELECT k, sum(v) * 2 AS d FROM t GROUP BY k WITH TOTALS "
            "ORDER BY k")
        assert int(r.totals["d"][0]) == 300


class TestSystemTables:
    def test_query_log(self, session):
        session.execute("SELECT 1")
        r = session.execute("SELECT count() FROM system.query_log")
        assert r.scalar() >= 1

    def test_settings_table(self, session):
        r = session.execute("SELECT value FROM system.settings "
                            "WHERE name = 'max_groups'")
        assert r.scalar() == str(session.settings.max_groups)

    def test_functions_table(self, session):
        r = session.execute("SELECT count() FROM system.functions "
                            "WHERE kind = 'aggregate'")
        assert r.scalar() > 10

    def test_events(self, session):
        session.execute("SELECT count() FROM t")
        r = session.execute("SELECT value FROM system.events "
                            "WHERE event = 'Query'")
        assert r.scalar() >= 1

    def test_columns(self, session):
        r = session.execute("SELECT name FROM system.columns "
                            "WHERE database = 'default' AND table = 't' "
                            "ORDER BY name")
        assert [row[0] for row in r.rows()] == ["k", "v"]

    def test_parts(self, session):
        r = session.execute("SELECT rows FROM system.parts "
                            "WHERE table = 't'")
        assert r.scalar() == 5


class TestExplain:
    def test_explain_pipeline(self, session):
        r = session.execute("EXPLAIN PIPELINE SELECT k, count() FROM t "
                            "GROUP BY k ORDER BY k")
        text = "\n".join(row[0] for row in r.rows())
        assert "AggregatingTransform" in text
        assert "SortingTransform" in text
        assert "Source" in text

    def test_explain_ast(self, session):
        r = session.execute("EXPLAIN AST SELECT 1")
        assert "Select" in r.rows()[0][0]
