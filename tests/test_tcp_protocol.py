"""Native TCP wire protocol tests (reference: src/Core/Protocol.h:71,
src/Server/TCPHandler.cpp) — Hello negotiation, Query/Data packets,
Native-format blocks over a live socket, exception frames."""
import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.server.tcp_server import (SERVER_REVISION, TcpServer,
                                              NativeTcpClient)


@pytest.fixture(scope="module")
def server():
    s = ch.connect()
    srv = TcpServer(session=s, port=0)
    srv.start_background()
    yield srv
    srv.shutdown()


@pytest.fixture()
def client(server):
    c = NativeTcpClient("127.0.0.1", server.port)
    yield c
    c.close()


def test_hello_negotiation(client):
    assert client.server_name.startswith("ClickHouse")
    assert client.revision == SERVER_REVISION     # min(client, server)
    assert client.timezone == "UTC"
    assert client.display_name == "clickhouse-tpu"


def test_old_client_revision(server):
    c = NativeTcpClient("127.0.0.1", server.port, revision=54429)
    assert c.revision == 54429
    cols, _ = c.execute("SELECT 42 AS x")
    assert list(cols["x"]) == [42]
    c.close()


def test_ping_pong(client):
    assert client.ping()


def test_select_round_trip(client):
    cols, types = client.execute(
        "SELECT number AS n, toString(number) AS s FROM numbers(4)")
    assert list(cols["n"]) == [0, 1, 2, 3]
    assert list(cols["s"]) == ["0", "1", "2", "3"]
    assert types[0] == ("n", "UInt64")


def test_insert_via_wire_blocks(client):
    client.execute("DROP TABLE IF EXISTS tw")
    client.execute("CREATE TABLE tw (x Int64, s String)")
    client.insert("INSERT INTO tw",
                  {"x": np.arange(10, dtype=np.int64),
                   "s": np.asarray([f"v{i % 3}" for i in range(10)], object)},
                  [("x", "Int64"), ("s", "String")])
    cols, _ = client.execute(
        "SELECT s, count() AS c, sum(x) AS t FROM tw GROUP BY s ORDER BY s")
    assert list(cols["s"]) == ["v0", "v1", "v2"]
    assert list(cols["c"]) == [4, 3, 3]


def test_nullable_round_trip(client):
    client.execute("DROP TABLE IF EXISTS tn")
    client.execute("CREATE TABLE tn (v Nullable(Int64))")
    client.insert("INSERT INTO tn", {"v": np.asarray([5, None, 7], object)},
                  [("v", "Nullable(Int64)")])
    cols, types = client.execute("SELECT v FROM tn ORDER BY v")
    assert list(cols["v"]) == [5, 7, None]
    assert types == [("v", "Nullable(Int64)")]


def test_exception_packet_keeps_connection(client):
    with pytest.raises(Exception, match="nosuch"):
        client.execute("SELECT nosuch")
    cols, _ = client.execute("SELECT 1 AS ok")
    assert list(cols["ok"]) == [1]


def test_per_query_settings_over_wire(client):
    cols, _ = client.execute("SELECT count() FROM numbers(10)",
                             settings={"max_groups": "4096"})
    assert list(cols.values())[0][0] == 10


def test_compression_rejected_cleanly(server):
    """Query.compression = 1 gets a protocol-level Exception packet."""
    from clickhouse_tpu.storage.native_format import (_read_varuint,
                                                      _write_binary_str,
                                                      _write_varuint)
    c = NativeTcpClient("127.0.0.1", server.port)
    o = c.out
    _write_varuint(o, 1)                  # Query
    _write_binary_str(o, "")
    o.write(b"\x01")                      # client info: INITIAL_QUERY
    _write_binary_str(o, "default")
    _write_binary_str(o, "")
    _write_binary_str(o, "127.0.0.1:0")
    o.write(b"\x01")
    for s in ("u", "h", "n"):
        _write_binary_str(o, s)
    for v in (24, 1, c.client_revision):
        _write_varuint(o, v)
    _write_binary_str(o, "")              # quota key
    _write_varuint(o, 0)                  # patch
    _write_binary_str(o, "")              # end of settings
    _write_varuint(o, 2)                  # stage
    _write_varuint(o, 1)                  # compression ON
    _write_binary_str(o, "SELECT 1")
    o.flush()
    assert _read_varuint(c.inp) == 2      # Exception
    assert "compress" in c._read_exception()
    c.close()


def test_wrong_password_rejected(server):
    server.session.execute(
        "CREATE USER IF NOT EXISTS alice IDENTIFIED BY 'secret'")
    with pytest.raises(Exception):
        NativeTcpClient("127.0.0.1", server.port, user="alice",
                        password="wrong")
    c = NativeTcpClient("127.0.0.1", server.port, user="alice",
                        password="secret")
    assert c.ping()
    c.close()
