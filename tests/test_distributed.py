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


def test_scaling_smoke(sessions):
    """Distributed execution actually uses the mesh (sharded input)."""
    _, dist = sessions
    blk = dist._sharded_block("default", "t")
    data = blk["k"].data
    assert len(data.sharding.device_set) == N_DEV
