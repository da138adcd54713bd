"""MySQL / PostgreSQL wire-protocol compatibility handlers
(reference: src/Server/MySQLHandler.cpp, src/Server/PostgreSQLHandler.cpp).

Drives both servers over live sockets with minimal connector-style
clients built straight from the public protocol specs (same bytes a stock
psql / mysql connector sends)."""
import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.core.errors import EngineError
from clickhouse_tpu.server.mysql_server import MySQLServer, SimpleMySQLClient
from clickhouse_tpu.server.postgres_server import (PostgresServer,
                                                   SimplePgClient)


@pytest.fixture(scope="module")
def session():
    s = ch.connect()
    s.execute("CREATE TABLE wt (x Int64, s String) ENGINE = MergeTree "
              "ORDER BY x")
    s.insert_pydict("wt", {
        "x": np.arange(6, dtype=np.int64),
        "s": np.asarray([f"v{i % 2}" for i in range(6)], object)})
    return s


@pytest.fixture(scope="module")
def pg(session):
    srv = PostgresServer(session=session, port=0)
    srv.start_background()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def my(session):
    srv = MySQLServer(session=session, port=0)
    srv.start_background()
    yield srv
    srv.shutdown()


# -- PostgreSQL ---------------------------------------------------------------

def test_pg_startup_and_select(pg):
    c = SimplePgClient("127.0.0.1", pg.port)
    assert c.params.get("server_encoding") == "UTF8"
    names, rows = c.execute("SELECT 1 + 1 AS two, 'hi' AS s")
    assert names == ["two", "s"]
    assert rows == [("2", "hi")]
    c.close()


def test_pg_table_scan_and_null(pg):
    c = SimplePgClient("127.0.0.1", pg.port)
    names, rows = c.execute(
        "SELECT x, nullIf(s, 'v1') AS s FROM wt ORDER BY x")
    assert names == ["x", "s"]
    assert rows[0] == ("0", "v0")
    assert rows[1][1] is None            # NULL travels as -1 length
    assert len(rows) == 6
    c.close()


def test_pg_aggregate(pg):
    c = SimplePgClient("127.0.0.1", pg.port)
    _, rows = c.execute("SELECT s, count() AS c FROM wt GROUP BY s "
                        "ORDER BY s")
    assert rows == [("v0", "3"), ("v1", "3")]
    c.close()


def test_pg_error_then_recover(pg):
    c = SimplePgClient("127.0.0.1", pg.port)
    with pytest.raises(EngineError):
        c.execute("SELECT definitely_missing_col FROM wt")
    # connection stays usable after ErrorResponse + ReadyForQuery
    _, rows = c.execute("SELECT 7 AS x")
    assert rows == [("7",)]
    c.close()


def test_pg_password_auth(pg, session):
    session.execute("CREATE USER IF NOT EXISTS pguser IDENTIFIED BY 'pw1'")
    session.execute("GRANT SELECT ON *.* TO pguser")
    c = SimplePgClient("127.0.0.1", pg.port, user="pguser", password="pw1")
    _, rows = c.execute("SELECT currentUser() AS u")
    assert rows == [("pguser",)]
    c.close()
    with pytest.raises(EngineError):
        SimplePgClient("127.0.0.1", pg.port, user="pguser",
                       password="wrong")


# -- MySQL --------------------------------------------------------------------

def test_mysql_handshake_and_select(my):
    c = SimpleMySQLClient("127.0.0.1", my.port)
    names, rows = c.execute("SELECT 40 + 2 AS answer")
    assert names == ["answer"]
    assert rows == [("42",)]
    c.close()


def test_mysql_table_scan_null_and_types(my):
    c = SimpleMySQLClient("127.0.0.1", my.port)
    names, rows = c.execute(
        "SELECT x, nullIf(s, 'v0') AS s FROM wt ORDER BY x LIMIT 3")
    assert names == ["x", "s"]
    assert rows == [("0", None), ("1", "v1"), ("2", None)]
    c.close()


def test_mysql_connector_housekeeping(my):
    c = SimpleMySQLClient("127.0.0.1", my.port)
    assert c.execute("SET autocommit=1") == ([], [])       # OK packet
    names, rows = c.execute("select @@version_comment")
    assert rows[0][0].endswith("clickhouse-tpu")
    c.close()


def test_mysql_error_then_recover(my):
    c = SimpleMySQLClient("127.0.0.1", my.port)
    with pytest.raises(EngineError):
        c.execute("SELECT bogus_col_name")
    _, rows = c.execute("SELECT 5 AS v")
    assert rows == [("5",)]
    c.close()


def test_mysql_clear_password_auth_switch(my, session):
    session.execute("CREATE USER IF NOT EXISTS myuser IDENTIFIED BY 'pw2'")
    session.execute("GRANT SELECT ON *.* TO myuser")
    c = SimpleMySQLClient("127.0.0.1", my.port, user="myuser",
                          password="pw2")
    _, rows = c.execute("SELECT currentUser() AS u")
    assert rows == [("myuser",)]
    c.close()
    with pytest.raises(EngineError):
        SimpleMySQLClient("127.0.0.1", my.port, user="myuser",
                          password="nope")
