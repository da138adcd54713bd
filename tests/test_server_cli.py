"""HTTP server + CLI tests (L8 surface)."""
import urllib.parse
import urllib.request

import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.server.http_server import HttpServer


@pytest.fixture(scope="module")
def server():
    s = ch.connect()
    s.execute("CREATE TABLE t (a Int64, b String)")
    s.insert_pydict("t", {"a": np.array([1, 2, 3], np.int64),
                          "b": np.asarray(["x", "y", "z"], object)})
    srv = HttpServer(session=s, port=0).start_background()
    yield srv
    srv.shutdown()


def _get(server, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}{path}") as r:
        return r.status, r.read().decode()


def _post(server, body, path="/"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}", data=body.encode())
    with urllib.request.urlopen(req) as r:
        return r.status, r.read().decode()


class TestHttp:
    def test_ping(self, server):
        assert _get(server, "/ping") == (200, "Ok.\n")

    def test_query_get(self, server):
        q = urllib.parse.quote("SELECT a FROM t ORDER BY a")
        code, body = _get(server, f"/?query={q}")
        assert code == 200
        assert body == "1\n2\n3\n"

    def test_query_post(self, server):
        code, body = _post(server, "SELECT sum(a) FROM t")
        assert code == 200 and body.strip() == "6"

    def test_format_param(self, server):
        q = urllib.parse.quote("SELECT a, b FROM t ORDER BY a LIMIT 1")
        code, body = _get(server, f"/?query={q}&default_format=JSONEachRow")
        assert code == 200
        assert body.strip() == '{"a": 1, "b": "x"}'

    def test_error_status(self, server):
        q = urllib.parse.quote("SELECT nonexistent FROM t")
        try:
            _get(server, f"/?query={q}")
            assert False, "should have raised"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "DB::Exception" in e.read().decode()

    def test_settings_param(self, server):
        q = urllib.parse.quote("SELECT a FROM t GROUP BY a ORDER BY a")
        code, body = _get(server, f"/?query={q}&max_groups=4096")
        assert code == 200

    def test_insert_via_post(self, server):
        _post(server, "INSERT INTO t VALUES (4, 'w')")
        code, body = _post(server, "SELECT count() FROM t")
        assert body.strip() == "4"

    def test_get_is_readonly(self, server):
        # the reference forces readonly for GET: DDL/DML must be rejected
        q = urllib.parse.quote("CREATE TABLE evil (x Int64)")
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(server, f"/?query={q}")
        assert ei.value.code == 400
        assert "readonly" in ei.value.read().decode().lower()

    def test_auth_wrong_password(self, server):
        server.session.execute(
            "CREATE USER IF NOT EXISTS alice IDENTIFIED BY 'secret'")
        q = urllib.parse.quote("SELECT 1")
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(server, f"/?query={q}&user=alice&password=wrong")
        assert ei.value.code == 400

    def test_auth_header(self, server):
        server.session.execute("GRANT SELECT ON *.* TO alice")
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/?query=SELECT%201")
        req.add_header("X-ClickHouse-User", "alice")
        req.add_header("X-ClickHouse-Key", "secret")
        with urllib.request.urlopen(req) as r:
            assert r.status == 200

    def test_bad_database_param(self, server):
        q = urllib.parse.quote("SELECT 1")
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(server, f"/?query={q}&database=no;DROP")
        assert ei.value.code == 400

    def test_database_param_not_sticky(self, server):
        server.session.execute("CREATE DATABASE IF NOT EXISTS otherdb")
        q = urllib.parse.quote("SELECT 1")
        _get(server, f"/?query={q}&database=otherdb")
        assert server.session.catalog.current_database == "default"


class TestCli:
    def test_local_query(self, capsys):
        from clickhouse_tpu.cli import main
        rc = main(["local", "-q", "SELECT 40 + 2 AS x", "--format", "TSV"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "42" in out

    def test_benchmark(self, capsys):
        from clickhouse_tpu.cli import main
        rc = main(["benchmark", "-q", "SELECT count() FROM numbers(1000)",
                   "-i", "2"])
        assert rc == 0
        assert "p50" in capsys.readouterr().out
