"""Distributed execution tests on a virtual 8-device CPU mesh.

The analog of the reference's localhost pseudo-cluster tests (SURVEY.md §4):
the same queries run single-node and distributed; results must match.
"""
import numpy as np
import pandas as pd
import pytest

import jax

import clickhouse_tpu as ch
from clickhouse_tpu.parallel import DistributedSession, make_mesh

N_DEV = 8


def _make_sessions():
    rng = np.random.default_rng(7)
    n = 20000
    data = {
        "k": rng.integers(0, 500, n).astype(np.int64),
        "v": rng.normal(size=n),
        "amount": rng.integers(-100, 100, n).astype(np.int64),
        "cat": np.asarray(["red", "green", "blue"], object)[
            rng.integers(0, 3, n)],
    }
    dim = {
        "k": np.arange(0, 400, dtype=np.int64),     # keys 400..499 unmatched
        "label": np.asarray([f"L{i % 7}" for i in range(400)], object),
    }

    local = ch.connect()
    local.execute("CREATE TABLE t (k Int64, v Float64, amount Int64, cat String)")
    local.insert_pydict("t", data)
    local.execute("CREATE TABLE d (k Int64, label String)")
    local.insert_pydict("d", dim)

    mesh = make_mesh(N_DEV)
    dist = DistributedSession(mesh=mesh)
    dist.execute("CREATE TABLE t (k Int64, v Float64, amount Int64, cat String) "
                 "ENGINE = Distributed ORDER BY k")
    dist.insert_pydict("t", data)
    dist.execute("CREATE TABLE d (k Int64, label String) "
                 "ENGINE = Distributed ORDER BY k")
    dist.insert_pydict("d", dim)
    return local, dist


@pytest.fixture(scope="module")
def sessions():
    assert len(jax.devices()) >= N_DEV, "conftest must force 8 CPU devices"
    return _make_sessions()


QUERIES = [
    "SELECT count() FROM t",
    "SELECT count(), sum(amount), min(amount), max(amount), avg(v) FROM t",
    "SELECT count() FROM t WHERE v > 0.5",
    "SELECT k % 7 AS b, count() AS c, sum(amount) AS s FROM t "
    "GROUP BY b ORDER BY b",
    "SELECT cat, count() AS c, avg(v) AS a FROM t GROUP BY cat ORDER BY cat",
    "SELECT k, count() AS c FROM t GROUP BY k ORDER BY c DESC, k LIMIT 10",
    "SELECT uniqExact(k) FROM t",
    "SELECT cat, uniqExact(k) AS u FROM t GROUP BY cat ORDER BY cat",
    "SELECT median(amount) FROM t",
    "SELECT k FROM t ORDER BY v DESC LIMIT 7",
    "SELECT DISTINCT cat FROM t ORDER BY cat",
    "SELECT count() FROM t INNER JOIN d ON t.k = d.k",
    "SELECT label, count() AS c FROM t INNER JOIN d ON t.k = d.k "
    "GROUP BY label ORDER BY label",
    "SELECT count(), countIf(label = '') FROM t LEFT JOIN d ON t.k = d.k",
    # the composite benchmark shape: filter -> join -> aggregate -> sort
    "SELECT label, sum(amount) AS s, count() AS c FROM t "
    "INNER JOIN d ON t.k = d.k WHERE v > 0 "
    "GROUP BY label ORDER BY s DESC LIMIT 5",
]


@pytest.mark.parametrize("sql", QUERIES)
def test_distributed_matches_local(sessions, sql):
    local, dist = sessions
    r_local = local.execute(sql)
    r_dist = dist.execute(sql)
    rows_l = r_local.rows()
    rows_d = r_dist.rows()
    assert len(rows_l) == len(rows_d), f"row count differs for {sql}"
    for a, b in zip(rows_l, rows_d):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            if isinstance(x, float) or isinstance(y, float):
                assert x == pytest.approx(y, rel=1e-9, abs=1e-9), sql
            else:
                assert x == y, sql


def test_shuffle_join_matches(sessions):
    local, dist = sessions
    sql = ("SELECT count(), sum(amount) FROM t INNER JOIN d ON t.k = d.k "
           "SETTINGS join_algorithm = 'shuffle'")
    got = dist.execute(sql).rows()
    exp = local.execute("SELECT count(), sum(amount) FROM t "
                        "INNER JOIN d ON t.k = d.k").rows()
    assert got == exp


def _make_skewed_sessions():
    """Heavy-hitter data: zipf(1.5) keys — the top key covers ~45% of rows
    (BASELINE requires skewed-key GROUP BY and join)."""
    rng = np.random.default_rng(11)
    n = 40000
    k = np.minimum(rng.zipf(1.5, n), 1000).astype(np.int64)
    data = {"k": k, "v": rng.integers(-50, 50, n).astype(np.int64)}
    dim = {"k": np.arange(1, 800, dtype=np.int64),
           "w": (np.arange(1, 800, dtype=np.int64) * 3) % 101}
    local = ch.connect()
    local.execute("CREATE TABLE zt (k Int64, v Int64)")
    local.insert_pydict("zt", data)
    local.execute("CREATE TABLE zd (k Int64, w Int64)")
    local.insert_pydict("zd", dim)
    dist = DistributedSession(mesh=make_mesh(N_DEV))
    dist.execute("CREATE TABLE zt (k Int64, v Int64) "
                 "ENGINE = Distributed ORDER BY k")
    dist.insert_pydict("zt", data)
    dist.execute("CREATE TABLE zd (k Int64, w Int64) "
                 "ENGINE = Distributed ORDER BY k")
    dist.insert_pydict("zd", dim)
    return local, dist


@pytest.fixture(scope="module")
def skewed():
    assert len(jax.devices()) >= N_DEV
    return _make_skewed_sessions()


SKEW_QUERIES = [
    # heavy-hitter GROUP BY (mergeable -> two-stage state exchange)
    "SELECT k, count() AS c, sum(v) AS s FROM zt GROUP BY k "
    "ORDER BY c DESC, k LIMIT 10",
    # heavy-hitter holistic aggregate (row repartition)
    "SELECT k, median(v) AS m FROM zt GROUP BY k ORDER BY k LIMIT 10",
    # DISTINCT over skewed keys (local pre-dedup bounds the exchange)
    "SELECT DISTINCT k FROM zt ORDER BY k LIMIT 20",
]


@pytest.mark.parametrize("sql", SKEW_QUERIES)
def test_skewed_distributed_matches_local(skewed, sql):
    local, dist = skewed
    assert dist.execute(sql).rows() == local.execute(sql).rows()


@pytest.mark.parametrize("salt", [1, 2, 4, 8])
def test_skewed_shuffle_join_salted(skewed, salt):
    """Salted-key splitting (exchange_by_key salt_mod): every salt factor
    must give the same answer; S = n_shards degenerates to broadcast."""
    local, dist = skewed
    exp = local.execute("SELECT count(), sum(v), sum(w) FROM zt "
                        "INNER JOIN zd ON zt.k = zd.k").rows()
    got = dist.execute(
        "SELECT count(), sum(v), sum(w) FROM zt INNER JOIN zd ON zt.k = zd.k "
        f"SETTINGS join_algorithm = 'shuffle', skew_salt_factor = {salt}"
    ).rows()
    assert got == exp


@pytest.mark.parametrize("kind,agg", [
    ("LEFT", "count(), countIf(w > 0)"),
    ("LEFT SEMI", "count()"),
    ("LEFT ANTI", "count()"),
])
def test_skewed_shuffle_join_kinds(skewed, kind, agg):
    local, dist = skewed
    exp = local.execute(
        f"SELECT {agg} FROM zt {kind} JOIN zd ON zt.k = zd.k").rows()
    got = dist.execute(
        f"SELECT {agg} FROM zt {kind} JOIN zd ON zt.k = zd.k "
        "SETTINGS join_algorithm = 'shuffle', skew_salt_factor = 4").rows()
    assert got == exp


def test_scaling_smoke(sessions):
    """Distributed execution actually uses the mesh (sharded input)."""
    _, dist = sessions
    blk = dist._sharded_block("default", "t")
    data = blk["k"].data
    assert len(data.sharding.device_set) == N_DEV


def test_incremental_insert_no_relayout(sessions):
    """Appending inserts shard only the new rows (DistributedSink-style
    per-shard queues): previously sharded chunks are reused by identity."""
    _, dist = sessions
    dist.execute("CREATE TABLE inc (k Int64, v Int64) "
                 "ENGINE = Distributed ORDER BY k")
    dist.insert_pydict("inc", {"k": np.arange(100, dtype=np.int64),
                               "v": np.ones(100, np.int64)})
    assert dist.execute("SELECT count() FROM inc").scalar() == 100
    st = dist._layout_states[("default", "inc")]
    chunk0 = st["chunks"][0]["k"]
    ids_before = [id(c) for c in chunk0]
    dist.insert_pydict("inc", {"k": np.arange(100, 180, dtype=np.int64),
                               "v": np.full(80, 2, np.int64)})
    assert dist.execute("SELECT count(), sum(v) FROM inc").rows() \
        == [(180, 260)]
    st2 = dist._layout_states[("default", "inc")]
    assert [id(c) for c in st2["chunks"][0]["k"][:len(ids_before)]] \
        == ids_before          # old chunks untouched, new appended


class TestColocatedAggregation:
    """Partition-parallel aggregation: GROUP BY on the sharding key elides
    the state exchange entirely (reference: useDataParallelAggregation.cpp,
    optimize_distributed_group_by_sharding_key)."""

    def test_group_by_sharding_key_elides_exchange(self, sessions):
        local, dist = sessions
        q = ("SELECT k, count() AS c, sum(amount) AS s FROM t "
             "GROUP BY k ORDER BY k LIMIT 20")
        before = dist.profile_events.get("ColocatedAggregations", 0)
        assert dist.execute(q).rows() == local.execute(q).rows()
        assert dist.profile_events.get("ColocatedAggregations", 0) > before

    def test_filtered_group_by_sharding_key(self, sessions):
        local, dist = sessions
        q = ("SELECT k, count() FROM t WHERE amount > 0 "
             "GROUP BY k ORDER BY k DESC LIMIT 10")
        before = dist.profile_events.get("ColocatedAggregations", 0)
        assert dist.execute(q).rows() == local.execute(q).rows()
        assert dist.profile_events.get("ColocatedAggregations", 0) > before

    def test_expr_key_still_exchanges(self, sessions):
        local, dist = sessions
        q = "SELECT k % 11 AS b, count() FROM t GROUP BY b ORDER BY b"
        before = dist.profile_events.get("ColocatedAggregations", 0)
        assert dist.execute(q).rows() == local.execute(q).rows()
        assert dist.profile_events.get("ColocatedAggregations", 0) == before

    def test_disabled_by_setting(self, sessions):
        local, dist = sessions
        q = ("SELECT k, max(v) FROM t GROUP BY k ORDER BY k LIMIT 5 "
             "SETTINGS optimize_distributed_group_by_sharding_key = 0")
        before = dist.profile_events.get("ColocatedAggregations", 0)
        got = dist.execute(q).rows()
        exp = local.execute(q).rows()
        assert [r[0] for r in got] == [r[0] for r in exp]
        for g, e in zip(got, exp):
            assert g[1] == pytest.approx(e[1], rel=1e-9)
        assert dist.profile_events.get("ColocatedAggregations", 0) == before


class TestDistributedStreaming:
    """Out-of-core ∘ distributed (parallel/distributed.py
    DistributedStreamProgram): per-shard chunked scans through the sharded
    partial-agg program, one all_to_all over the carried states."""

    STREAM = {"max_device_block_bytes": 1, "stream_chunk_rows": 1024}

    def dboth(self, sessions, sql):
        local, dist = sessions
        plain = local.execute(sql).rows()
        before = dist.profile_events.get("StreamedDistributedQueries", 0)
        streamed = dist.execute(sql, settings=self.STREAM).rows()
        after = dist.profile_events.get("StreamedDistributedQueries", 0)
        assert after == before + 1, f"did not dist-stream: {sql}"
        return plain, streamed

    def test_grouped_agg(self, sessions):
        p, s = self.dboth(sessions,
                          "SELECT k % 7 AS b, count(), sum(amount) FROM t "
                          "GROUP BY b ORDER BY b")
        assert p == s

    def test_filtered_global_agg(self, sessions):
        p, s = self.dboth(sessions,
                          "SELECT count(), sum(amount) FROM t WHERE v > 0")
        assert p == s

    def test_string_key_group(self, sessions):
        p, s = self.dboth(sessions,
                          "SELECT cat, count() AS c FROM t GROUP BY cat "
                          "ORDER BY cat")
        assert p == s

    def test_having_order_limit(self, sessions):
        p, s = self.dboth(sessions,
                          "SELECT k % 13 AS b, count() AS c FROM t GROUP BY b "
                          "HAVING c > 0 ORDER BY c DESC, b LIMIT 5")
        assert p == s

    def test_avg_float_close(self, sessions):
        local, dist = sessions
        sql = "SELECT k % 5 AS b, avg(v) FROM t GROUP BY b ORDER BY b"
        plain = local.execute(sql).rows()
        streamed = dist.execute(sql, settings=self.STREAM).rows()
        assert [r[0] for r in plain] == [r[0] for r in streamed]
        for rp, rs in zip(plain, streamed):
            assert rs[1] == pytest.approx(rp[1], rel=1e-9)

    def test_cache_reuse(self, sessions):
        _, dist = sessions
        sql = "SELECT count() FROM t WHERE amount > 10"
        r1 = dist.execute(sql, settings=self.STREAM).rows()
        size = len(dist._dist_stream_cache)
        r2 = dist.execute(sql, settings=self.STREAM).rows()
        assert r1 == r2 and len(dist._dist_stream_cache) == size

    def test_probe_join_falls_back_locally(self, sessions):
        # joins against a Distributed small table are not (yet) handled by
        # the sharded streaming program: the local streaming engine takes
        # over and must still be exact
        local, dist = sessions
        sql = ("SELECT label, count() AS c FROM t INNER JOIN d "
               "ON t.k = d.k GROUP BY label ORDER BY label")
        plain = local.execute(sql).rows()
        streamed = dist.execute(sql, settings=self.STREAM).rows()
        assert plain == streamed
