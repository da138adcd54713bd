"""Cross-process distributed query execution (parallel/remote_query.py —
the RemoteQueryExecutor / ClusterProxy analog, ref
src/QueryPipeline/RemoteQueryExecutor.cpp,
src/Core/QueryProcessingStage.h): aggregation queries ship as
WithMergeableState (partial states cross the wire, the initiator merges);
other queries ship column pruning + WHERE.  The legacy whole-table pull
remains the fallback for shapes the rewriter cannot prove safe."""
import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.server.tcp_server import TcpServer

N = 20_000


@pytest.fixture(scope="module")
def server():
    s = ch.connect()
    s.execute("CREATE TABLE big (k Int64, v Float64, s String)")
    s.insert_pydict("big", {
        "k": np.arange(N) % 7,
        "v": np.arange(N) * 0.5,
        "s": np.array([f"u{i % 50}" for i in range(N)], object)})
    srv = TcpServer(session=s, port=0)
    srv.start_background()
    yield srv, s
    srv.shutdown()


@pytest.fixture()
def client(server):
    return ch.connect()


def _addr(server):
    return f"127.0.0.1:{server[0].port}"


def test_remote_join_local_dim_broadcasts_build_side(server, client):
    """VERDICT r04 item 10: remote() JOIN local-dim ships the dim INTO the
    shard query (GLOBAL JOIN analog) — wire bytes ≪ remote table size."""
    client.execute("CREATE TABLE dim_local (k Int64, name String)")
    client.insert_pydict("dim_local", {
        "k": np.arange(7, dtype=np.int64),
        "name": np.asarray([f"n{i}" for i in range(7)], object)})
    sql = (f"SELECT k, count() AS c, any(name) FROM "
           f"remote('{_addr(server)}', default.big) "
           f"INNER JOIN dim_local USING (k) "
           f"GROUP BY k ORDER BY k LIMIT 4")
    before = client.profile_events.get("RemoteWireBytes", 0)
    rows = client.execute(sql).rows()
    wire = client.profile_events.get("RemoteWireBytes", 0) - before
    exp = server[1].execute(
        "SELECT k, count() AS c, concat('n', toString(k)) FROM big "
        "GROUP BY k ORDER BY k LIMIT 4").rows()
    assert rows == exp
    # the join ran REMOTELY: the shipped SQL carries the dim as an inline
    # format() literal and only 7 groups of states come back
    assert "format(" in client._last_remote_sql
    assert "JOIN" in client._last_remote_sql
    assert 0 < wire < 8192
    client.execute("DROP TABLE dim_local")


def test_remote_join_fetch_columns_path(server, client):
    """Non-aggregating remote JOIN: rows come back already joined."""
    client.execute("CREATE TABLE dim2 (k Int64, tag Int64)")
    client.insert_pydict("dim2", {"k": np.arange(7, dtype=np.int64),
                                  "tag": np.arange(7, dtype=np.int64) * 10})
    sql = (f"SELECT k, v, tag FROM remote('{_addr(server)}', default.big) "
           f"INNER JOIN dim2 USING (k) WHERE v < 2 ORDER BY k, v")
    rows = client.execute(sql).rows()
    exp = server[1].execute(
        "SELECT k, v, k * 10 FROM big WHERE v < 2 ORDER BY k, v").rows()
    assert rows == exp
    assert "format(" in client._last_remote_sql
    client.execute("DROP TABLE dim2")


def test_group_by_ships_states_not_rows(server, client):
    """The VERDICT r03 'done' bar: a GROUP BY over remote() transfers
    mergeable states, with bytes-on-wire far smaller than the table."""
    sql = (f"SELECT k, count() AS c, sum(v) FROM "
           f"remote('{_addr(server)}', default.big) "
           f"GROUP BY k ORDER BY c DESC, k LIMIT 3")
    before = client.profile_events.get("RemoteWireBytes", 0)
    rows = client.execute(sql).rows()
    wire = client.profile_events.get("RemoteWireBytes", 0) - before
    exp = server[1].execute(
        "SELECT k, count() AS c, sum(v) FROM big "
        "GROUP BY k ORDER BY c DESC, k LIMIT 3").rows()
    assert rows == exp
    assert "State" in client._last_remote_sql
    assert "GROUP BY" in client._last_remote_sql
    # 7 groups x 3 columns of states ≪ 20k rows x 16 B; the whole answer
    # must cross in under a kilobyte where the table is ~320 kB
    assert 0 < wire < 4096


def test_where_pushed_into_state_query(server, client):
    sql = (f"SELECT k, min(v), max(v) FROM "
           f"remote('{_addr(server)}', default.big) "
           f"WHERE v > 100 AND k != 3 GROUP BY k ORDER BY k")
    rows = client.execute(sql).rows()
    exp = server[1].execute(
        "SELECT k, min(v), max(v) FROM big WHERE v > 100 AND k != 3 "
        "GROUP BY k ORDER BY k").rows()
    assert rows == exp
    assert "WHERE" in client._last_remote_sql
    assert "State" in client._last_remote_sql


def test_global_aggregate_and_having(server, client):
    sql = (f"SELECT avg(v) AS m, count() FROM "
           f"remote('{_addr(server)}', default.big) HAVING m > 0")
    rows = client.execute(sql).rows()
    exp = server[1].execute(
        "SELECT avg(v) AS m, count() FROM big HAVING m > 0").rows()
    assert rows[0][1] == exp[0][1]
    assert rows[0][0] == pytest.approx(exp[0][0], rel=1e-12)
    assert "avgState" in client._last_remote_sql


def test_alias_key_and_expression_key(server, client):
    sql = (f"SELECT k % 3 AS kk, sum(v) FROM "
           f"remote('{_addr(server)}', default.big) "
           f"GROUP BY kk ORDER BY kk")
    rows = client.execute(sql).rows()
    exp = server[1].execute(
        "SELECT k % 3 AS kk, sum(v) FROM big GROUP BY kk "
        "ORDER BY kk").rows()
    assert rows == exp
    assert "_k0" in client._last_remote_sql


def test_fetch_columns_prunes_and_filters(server, client):
    """Non-aggregate query: only referenced columns and surviving rows
    cross the wire (FetchColumns + filter pushdown)."""
    before = client.profile_events.get("RemoteWireBytes", 0)
    rows = client.execute(
        f"SELECT v FROM remote('{_addr(server)}', default.big) "
        f"WHERE k = 3 ORDER BY v LIMIT 2").rows()
    wire = client.profile_events.get("RemoteWireBytes", 0) - before
    assert rows == [(1.5,), (5.0,)]
    shipped = client._last_remote_sql
    assert shipped.startswith("SELECT v FROM")
    assert "WHERE" in shipped
    # 1/7 of rows, one f64 column of N/7 ≈ 2857 rows ≈ 23 kB ≪ 3 cols x N
    assert wire < 60_000


def test_unsupported_state_falls_back_gracefully(server, client):
    """uniqExact over String has no -State yet: the rewriter must fall
    back (pruned-column fetch) and still answer correctly."""
    rows = client.execute(
        f"SELECT uniqExact(s) FROM "
        f"remote('{_addr(server)}', default.big)").rows()
    assert rows == [(50,)]
    assert "State" not in client._last_remote_sql


def test_pushdown_disabled_setting(server, client):
    rows = client.execute(
        f"SELECT k, count() FROM remote('{_addr(server)}', default.big) "
        f"GROUP BY k ORDER BY k LIMIT 2 "
        f"SETTINGS distributed_pushdown = 0").rows()
    exp = server[1].execute(
        "SELECT k, count() FROM big GROUP BY k ORDER BY k LIMIT 2").rows()
    assert rows == exp


def test_loopback_cluster_two_shards_pushdown():
    """cluster() loopback shards run the shard query in-process; the
    two_shards test cluster reads the table twice (reference semantics)."""
    s = ch.connect()
    s.execute("CREATE TABLE lt (k Int64, v Int64)")
    s.insert_pydict("lt", {"k": np.arange(100) % 4,
                           "v": np.arange(100, dtype=np.int64)})
    rows = s.execute(
        "SELECT k, count(), sum(v) FROM "
        "cluster('test_cluster_two_shards', default.lt) "
        "GROUP BY k ORDER BY k").rows()
    one = s.execute(
        "SELECT k, count(), sum(v) FROM lt GROUP BY k ORDER BY k").rows()
    assert rows == [(k, 2 * c, 2 * v) for k, c, v in one]


def test_uniq_exact_numeric_states(server, client):
    """uniqExact state over numerics is a mergeable set: exact distinct
    counts survive the two-stage exchange."""
    rows = client.execute(
        f"SELECT k, uniqExact(v) FROM "
        f"remote('{_addr(server)}', default.big) "
        f"GROUP BY k ORDER BY k LIMIT 2").rows()
    exp = server[1].execute(
        "SELECT k, uniqExact(v) FROM big GROUP BY k ORDER BY k "
        "LIMIT 2").rows()
    assert rows == exp
