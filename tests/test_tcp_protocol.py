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


def test_compressed_frame_round_trip():
    import io
    from clickhouse_tpu.storage.wire_compression import (METHOD_NONE,
                                                         read_frame,
                                                         write_frame)
    data = b"hello columnar world " * 100
    buf = io.BytesIO()
    write_frame(buf, data)
    assert buf.tell() < len(data)         # actually compressed
    buf.seek(0)
    assert read_frame(buf) == data
    buf = io.BytesIO()
    write_frame(buf, data, method=METHOD_NONE)
    buf.seek(0)
    assert read_frame(buf) == data


def test_corrupted_frame_detected():
    import io
    from clickhouse_tpu.storage.wire_compression import (read_frame,
                                                         write_frame)
    buf = io.BytesIO()
    write_frame(buf, b"payload bytes " * 50)
    raw = bytearray(buf.getvalue())
    raw[30] ^= 0xFF                       # flip a payload bit
    with pytest.raises(Exception, match="checksum"):
        read_frame(io.BytesIO(bytes(raw)))


def test_compressed_select_round_trip(server):
    """Query.compression = 1: Data blocks travel in LZ4 frames."""
    c = NativeTcpClient("127.0.0.1", server.port, compression=True)
    cols, types = c.execute(
        "SELECT number AS n, toString(number) AS s FROM numbers(1000)")
    assert list(cols["n"]) == list(range(1000))
    assert cols["s"][999] == "999"
    c.close()


def test_compressed_insert_via_wire_blocks(server):
    server.session.execute(
        "CREATE TABLE comp_ins (a Int64, b String) ENGINE = MergeTree "
        "ORDER BY a")
    c = NativeTcpClient("127.0.0.1", server.port, compression=True)
    c.insert("INSERT INTO comp_ins (a, b)",
             {"a": np.arange(64, dtype=np.int64),
              "b": np.asarray([f"v{i}" for i in range(64)], object)},
             [("a", "Int64"), ("b", "String")])
    cols, _ = c.execute("SELECT count(), sum(a) FROM comp_ins")
    assert [v[0] for v in cols.values()] == [64, 2016]
    c.close()


def test_compressed_and_plain_clients_coexist(server):
    plain = NativeTcpClient("127.0.0.1", server.port)
    comp = NativeTcpClient("127.0.0.1", server.port, compression=True)
    a, _ = plain.execute("SELECT sum(number) FROM numbers(100)")
    b, _ = comp.execute("SELECT sum(number) FROM numbers(100)")
    assert list(a.values())[0][0] == list(b.values())[0][0] == 4950
    plain.close()
    comp.close()


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


class TestRemoteTableFunction:
    """remote('host:port', db.table) — shard execution over the native TCP
    wire (TableFunctionRemote analog)."""

    def test_remote_pull_and_aggregate(self, server):
        import clickhouse_tpu as ch
        import numpy as np
        # populate the SERVER's catalog
        srv_sess = server.session
        srv_sess.execute("CREATE TABLE IF NOT EXISTS rsrc (k Int64, v Float64)")
        srv_sess.execute("TRUNCATE TABLE rsrc")
        srv_sess.insert_pydict("rsrc", {
            "k": np.arange(100, dtype=np.int64),
            "v": np.arange(100) * 0.5})
        # a SEPARATE local session reaches it over the wire
        local = ch.connect()
        r = local.execute(
            f"SELECT count(), sum(k) FROM "
            f"remote('127.0.0.1:{server.port}', default.rsrc)").rows()
        assert r == [(100, 4950)]
        r2 = local.execute(
            f"SELECT k FROM remote('127.0.0.1:{server.port}', default.rsrc) "
            f"WHERE k < 3 ORDER BY k").rows()
        assert r2 == [(0,), (1,), (2,)]

    def test_remote_join_with_local(self, server):
        import clickhouse_tpu as ch
        import numpy as np
        srv_sess = server.session
        srv_sess.execute("CREATE TABLE IF NOT EXISTS rdim (k Int64, lbl String)")
        srv_sess.execute("TRUNCATE TABLE rdim")
        srv_sess.insert_pydict("rdim", {
            "k": np.arange(5, dtype=np.int64),
            "lbl": np.asarray([f"L{i}" for i in range(5)], object)})
        local = ch.connect()
        local.execute("CREATE TABLE lf (fk Int64)")
        local.insert_pydict("lf", {"fk": np.asarray([1, 1, 3], np.int64)})
        r = local.execute(
            f"SELECT lbl, count() FROM lf INNER JOIN "
            f"remote('127.0.0.1:{server.port}', default.rdim) AS d "
            f"ON lf.fk = d.k GROUP BY lbl ORDER BY lbl").rows()
        assert r == [("L1", 2), ("L3", 1)]

    def test_remote_failover(self, server):
        import clickhouse_tpu as ch
        import numpy as np
        srv_sess = server.session
        srv_sess.execute("CREATE TABLE IF NOT EXISTS rfo (x Int64)")
        srv_sess.execute("TRUNCATE TABLE rfo")
        srv_sess.insert_pydict("rfo", {"x": np.arange(7, dtype=np.int64)})
        local = ch.connect()
        # first replica is dead; the pool fails over to the live one
        r = local.execute(
            f"SELECT count() FROM remote("
            f"'127.0.0.1:1|127.0.0.1:{server.port}', default.rfo)").rows()
        assert r == [(7,)]
        # error accounting: the dead replica is deprioritized next time
        assert local.catalog._remote_errors.get("127.0.0.1:1", 0) >= 1

    def test_remote_all_dead(self):
        import clickhouse_tpu as ch
        from clickhouse_tpu.core.errors import EngineError
        local = ch.connect()
        with pytest.raises(EngineError):
            local.execute("SELECT count() FROM "
                          "remote('127.0.0.1:1', default.x)")


class TestHedgedRequests:
    """use_hedged_requests: a stalled primary replica is raced by a
    duplicate request on the next replica after
    hedged_connection_timeout_ms (HedgedConnections analog,
    src/Client/HedgedConnections.h:29)."""

    @pytest.fixture()
    def stall_server(self):
        """Accepts connections, never answers the Hello — a hung peer."""
        import socketserver
        import threading

        class _H(socketserver.BaseRequestHandler):
            def handle(self):
                import time
                time.sleep(30)

        class _S(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        srv = _S(("127.0.0.1", 0), _H)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield srv.server_address
        srv.shutdown()
        srv.server_close()

    def test_hedge_beats_stalled_primary(self, server, stall_server):
        import time
        import clickhouse_tpu as ch
        import numpy as np
        srv_sess = server.session
        srv_sess.execute("CREATE TABLE IF NOT EXISTS rh (x Int64)")
        srv_sess.execute("TRUNCATE TABLE rh")
        srv_sess.insert_pydict("rh", {"x": np.arange(9, dtype=np.int64)})
        local = ch.connect()
        stall = f"{stall_server[0]}:{stall_server[1]}"
        t0 = time.monotonic()
        r = local.execute(
            f"SELECT count() FROM remote("
            f"'{stall}|127.0.0.1:{server.port}', default.rh)",
            settings={"hedged_connection_timeout_ms": 50}).rows()
        elapsed = time.monotonic() - t0
        assert r == [(9,)]
        # the stalled primary never errors — only hedging explains speed
        assert elapsed < 5.0

    def test_hedging_disabled_falls_back_sequential(self, server):
        import clickhouse_tpu as ch
        import numpy as np
        srv_sess = server.session
        srv_sess.execute("CREATE TABLE IF NOT EXISTS rh2 (x Int64)")
        srv_sess.execute("TRUNCATE TABLE rh2")
        srv_sess.insert_pydict("rh2", {"x": np.arange(4, dtype=np.int64)})
        local = ch.connect()
        r = local.execute(
            f"SELECT count() FROM remote("
            f"'127.0.0.1:1|127.0.0.1:{server.port}', default.rh2)",
            settings={"use_hedged_requests": 0}).rows()
        assert r == [(4,)]
