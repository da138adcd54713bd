"""Window function tests (WindowTransform analog) vs pandas golden results."""
import numpy as np
import pandas as pd
import pytest

import clickhouse_tpu as ch


@pytest.fixture(scope="module")
def session():
    s = ch.connect()
    rng = np.random.default_rng(11)
    n = 2000
    data = {
        "g": rng.integers(0, 20, n).astype(np.int64),
        "x": rng.integers(0, 1000, n).astype(np.int64),
        "v": rng.normal(size=n),
        "id": np.arange(n, dtype=np.int64),
    }
    s.execute("CREATE TABLE w (g Int64, x Int64, v Float64, id Int64)")
    s.insert_pydict("w", data)
    s._df = pd.DataFrame(data)
    return s


class TestWindow:
    def test_row_number(self, session):
        r = session.execute(
            "SELECT id, row_number() OVER (PARTITION BY g ORDER BY id) AS rn "
            "FROM w ORDER BY id LIMIT 100")
        df = session._df.sort_values("id").copy()
        df["rn"] = df.groupby("g").cumcount() + 1
        exp = df.head(100)
        assert [row[1] for row in r.rows()] == exp["rn"].tolist()

    def test_rank_dense_rank(self, session):
        r = session.execute(
            "SELECT g, x, rank() OVER (PARTITION BY g ORDER BY x) AS rk, "
            "dense_rank() OVER (PARTITION BY g ORDER BY x) AS dr "
            "FROM w ORDER BY g, x, id LIMIT 200")
        df = session._df.copy()
        df["rk"] = df.groupby("g")["x"].rank(method="min").astype(int)
        df["dr"] = df.groupby("g")["x"].rank(method="dense").astype(int)
        exp = df.sort_values(["g", "x", "id"]).head(200)
        got = r.rows()
        assert [row[2] for row in got] == exp["rk"].tolist()
        assert [row[3] for row in got] == exp["dr"].tolist()

    def test_partition_sum_full(self, session):
        r = session.execute(
            "SELECT g, sum(x) OVER (PARTITION BY g) AS s FROM w "
            "ORDER BY id LIMIT 50")
        df = session._df.copy()
        df["s"] = df.groupby("g")["x"].transform("sum")
        exp = df.sort_values("id").head(50)
        assert [row[1] for row in r.rows()] == exp["s"].tolist()

    def test_running_sum(self, session):
        r = session.execute(
            "SELECT id, sum(x) OVER (PARTITION BY g ORDER BY id) AS rs "
            "FROM w ORDER BY id LIMIT 100")
        df = session._df.sort_values("id").copy()
        df["rs"] = df.groupby("g")["x"].cumsum()
        exp = df.head(100)
        assert [row[1] for row in r.rows()] == exp["rs"].tolist()

    def test_running_avg_float(self, session):
        r = session.execute(
            "SELECT id, avg(v) OVER (PARTITION BY g ORDER BY id) AS ra "
            "FROM w ORDER BY id LIMIT 50")
        df = session._df.sort_values("id").copy()
        df["ra"] = df.groupby("g")["v"].expanding().mean().reset_index(
            level=0, drop=True)
        exp = df.head(50)
        np.testing.assert_allclose([row[1] for row in r.rows()],
                                   exp["ra"].values, rtol=1e-9)

    def test_lag_lead(self, session):
        r = session.execute(
            "SELECT id, lag(x) OVER (PARTITION BY g ORDER BY id) AS lg, "
            "lead(x, 2) OVER (PARTITION BY g ORDER BY id) AS ld "
            "FROM w ORDER BY id LIMIT 200")
        df = session._df.sort_values("id").copy()
        df["lg"] = df.groupby("g")["x"].shift(1)
        df["ld"] = df.groupby("g")["x"].shift(-2)
        exp = df.head(200)
        for row, (_, erow) in zip(r.rows(), exp.iterrows()):
            assert (row[1] is None) == pd.isna(erow["lg"])
            if row[1] is not None:
                assert row[1] == int(erow["lg"])
            assert (row[2] is None) == pd.isna(erow["ld"])
            if row[2] is not None:
                assert row[2] == int(erow["ld"])

    def test_global_window(self, session):
        r = session.execute(
            "SELECT count() OVER () AS c FROM w LIMIT 1")
        assert r.scalar() == 2000

    def test_first_last_value(self, session):
        r = session.execute(
            "SELECT g, first_value(x) OVER (PARTITION BY g ORDER BY id) AS f "
            "FROM w ORDER BY id LIMIT 50")
        df = session._df.sort_values("id").copy()
        df["f"] = df.groupby("g")["x"].transform("first")
        exp = df.head(50)
        assert [row[1] for row in r.rows()] == exp["f"].tolist()

    def test_window_over_aggregate(self, session):
        # window on top of GROUP BY results
        r = session.execute("""
            SELECT g, c, sum(c) OVER (ORDER BY g) AS running
            FROM (SELECT g, count() AS c FROM w GROUP BY g)
            ORDER BY g
        """)
        df = session._df.groupby("g").size().reset_index(name="c")
        df["running"] = df["c"].cumsum()
        assert [row[2] for row in r.rows()] == df["running"].tolist()

    def test_min_max_window(self, session):
        r = session.execute(
            "SELECT g, min(x) OVER (PARTITION BY g) AS mn, "
            "max(x) OVER (PARTITION BY g) AS mx FROM w ORDER BY id LIMIT 30")
        df = session._df.copy()
        df["mn"] = df.groupby("g")["x"].transform("min")
        df["mx"] = df.groupby("g")["x"].transform("max")
        exp = df.sort_values("id").head(30)
        got = r.rows()
        assert [row[1] for row in got] == exp["mn"].tolist()
        assert [row[2] for row in got] == exp["mx"].tolist()
