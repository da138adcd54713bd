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


class TestGroupingSets:
    def test_rollup(self, session):
        r = session.execute(
            "SELECT k, sum(v) AS s FROM t GROUP BY ROLLUP(k) ORDER BY k")
        rows = r.rows()
        # subtotal row k=0 (default) + per-key rows
        assert (0, 150) in rows
        assert (1, 30) in rows and (2, 70) in rows and (3, 50) in rows

    def test_with_rollup_two_keys(self, session):
        session.execute("DROP TABLE IF EXISTS r2")
        session.execute("CREATE TABLE r2 (a Int64, b Int64, v Int64)")
        session.execute("INSERT INTO r2 VALUES (1,1,5),(1,2,7),(2,1,11)")
        r = session.execute(
            "SELECT a, b, sum(v) AS s FROM r2 GROUP BY a, b WITH ROLLUP "
            "ORDER BY a, b")
        rows = set(r.rows())
        assert (1, 1, 5) in rows and (1, 2, 7) in rows and (2, 1, 11) in rows
        assert (1, 0, 12) in rows and (2, 0, 11) in rows   # per-a subtotals
        assert (0, 0, 23) in rows                           # grand total

    def test_cube(self, session):
        session.execute("CREATE TABLE r2 (a Int64, b Int64, v Int64)")
        session.execute("INSERT INTO r2 VALUES (1,1,5),(1,2,7),(2,1,11)")
        r = session.execute(
            "SELECT a, b, sum(v) AS s FROM r2 GROUP BY CUBE(a, b)")
        rows = set(r.rows())
        assert (0, 1, 16) in rows and (0, 2, 7) in rows    # per-b subtotals
        assert (0, 0, 23) in rows


class TestCachesAndReadonly:
    def test_query_result_cache(self, session):
        session.execute("SELECT sum(v) FROM t SETTINGS use_query_cache = 1")
        before = session.profile_events.get("QueryCacheHits", 0)
        r = session.execute("SELECT sum(v) FROM t SETTINGS use_query_cache = 1")
        assert session.profile_events.get("QueryCacheHits", 0) == before + 1
        assert r.scalar() == 150

    def test_cache_invalidated_by_insert(self, session):
        session.execute("DROP TABLE IF EXISTS qc")
        session.execute("CREATE TABLE qc (x Int64)")
        session.execute("INSERT INTO qc VALUES (1)")
        a = session.execute("SELECT sum(x) FROM qc "
                            "SETTINGS use_query_cache = 1").scalar()
        session.execute("INSERT INTO qc VALUES (41)")
        b = session.execute("SELECT sum(x) FROM qc "
                            "SETTINGS use_query_cache = 1").scalar()
        assert (a, b) == (1, 42)

    def test_readonly(self, session):
        import pytest as _pytest
        from clickhouse_tpu.core.errors import AnalysisError
        session.execute("SET readonly = 1")
        try:
            assert session.execute("SELECT 1").scalar() == 1
            with _pytest.raises(AnalysisError):
                session.execute("CREATE TABLE nope (x Int64)")
            with _pytest.raises(AnalysisError):
                session.execute("INSERT INTO t VALUES (9, 9)")
        finally:
            session.settings = session.settings.copy_with({"readonly": 0})


class TestAccessControl:
    def test_users_and_grants(self, session):
        session.execute("CREATE TABLE secure_t (x Int64)")
        session.execute("INSERT INTO secure_t VALUES (1)")
        session.execute("CREATE USER analyst IDENTIFIED BY 'pw'")
        session.execute("GRANT SELECT ON default.secure_t TO analyst")
        import pytest as _p
        from clickhouse_tpu.core.access import AccessDenied
        # wrong password
        with _p.raises(AccessDenied):
            session.login("analyst", "nope")
        session.login("analyst", "pw")
        assert session.execute("SELECT x FROM secure_t").scalar() == 1
        with _p.raises(AccessDenied):
            session.execute("INSERT INTO secure_t VALUES (2)")
        with _p.raises(AccessDenied):
            session.execute("DROP TABLE secure_t")
        # grants are user-managed only by privileged users
        with _p.raises(AccessDenied):
            session.execute("GRANT ALL ON *.* TO analyst")
        session.login("default")
        session.execute("GRANT INSERT ON default.secure_t TO analyst")
        session.login("analyst", "pw")
        session.execute("INSERT INTO secure_t VALUES (2)")
        assert session.execute("SELECT count() FROM secure_t").scalar() == 2
        session.login("default")


class TestTracing:
    """OpenTelemetry span log + Prometheus endpoint (reference:
    OpenTelemetrySpanLog.h, PrometheusRequestHandler.cpp)."""

    def test_span_phases_recorded(self):
        s = ch.connect()
        s.execute("SELECT count() FROM numbers(10)")
        ops = {sp.operation_name for sp in s.span_log}
        assert {"query", "parse", "analyze", "compile"} <= ops
        root = [sp for sp in s.span_log if sp.operation_name == "query"][-1]
        children = [sp for sp in s.span_log
                    if sp.parent_span_id == root.span_id]
        assert children, "phase spans must parent to the query span"
        assert all(sp.trace_id == root.trace_id for sp in children)

    def test_span_log_system_table(self):
        s = ch.connect()
        s.execute("SELECT 1")
        r = s.execute("SELECT count() FROM system.opentelemetry_span_log "
                      "WHERE operation_name = 'query'")
        assert r.scalar() >= 1

    def test_traceparent_propagation_http(self):
        import urllib.request
        from clickhouse_tpu.server.http_server import HttpServer
        s = ch.connect()
        srv = HttpServer(session=s, port=0).start_background()
        try:
            tid = "4bf92f3577b34da6a3ce929d0e0e4736"
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/?query=SELECT+1")
            req.add_header("traceparent", f"00-{tid}-00f067aa0ba902b7-01")
            urllib.request.urlopen(req).read()
            assert any(sp.trace_id == tid for sp in s.span_log)
        finally:
            srv.shutdown()

    def test_prometheus_metrics(self):
        import urllib.request
        from clickhouse_tpu.server.http_server import HttpServer
        s = ch.connect()
        s.execute("SELECT 1")
        srv = HttpServer(session=s, port=0).start_background()
        try:
            body = urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/metrics").read().decode()
            assert "clickhouse_tpu_events_Query" in body
            assert "clickhouse_tpu_tables" in body
        finally:
            srv.shutdown()
