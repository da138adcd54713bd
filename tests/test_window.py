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


class TestWindowFrames:
    """ROWS/RANGE frame tests vs brute-force golden results."""

    def _golden(self, session, fn, mode, lo, hi, col="x"):
        """Brute-force frame aggregate over (PARTITION BY g ORDER BY id)."""
        df = session._df.sort_values(["g", "id"]).reset_index(drop=True)
        out = []
        for _, part in df.groupby("g", sort=False):
            vals = part[col].to_numpy()
            ids = part["id"].to_numpy()
            n = len(vals)
            for i in range(n):
                if mode == "rows":
                    a = 0 if lo is None else i + lo
                    b = n - 1 if hi is None else i + hi
                else:  # range over id values
                    a_val = ids[i] + (lo if lo is not None else -10**18)
                    b_val = ids[i] + (hi if hi is not None else 10**18)
                    a = np.searchsorted(ids, a_val, side="left")
                    b = np.searchsorted(ids, b_val, side="right") - 1
                a, b = max(a, 0), min(b, n - 1)
                w = vals[a:b + 1] if a <= b else vals[:0]
                if fn == "sum":
                    out.append(int(w.sum()) if len(w) else 0)
                elif fn == "count":
                    out.append(len(w))
                elif fn == "min":
                    out.append(int(w.min()) if len(w) else 0)
                elif fn == "max":
                    out.append(int(w.max()) if len(w) else 0)
                elif fn == "first":
                    out.append(int(w[0]) if len(w) else 0)
                elif fn == "last":
                    out.append(int(w[-1]) if len(w) else 0)
        order = df.sort_values(["g", "id"]).index
        return pd.Series(out, index=order).tolist()

    @pytest.mark.parametrize("spec,mode,lo,hi", [
        ("ROWS BETWEEN 3 PRECEDING AND CURRENT ROW", "rows", -3, 0),
        ("ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING", "rows", -2, 2),
        ("ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING", "rows", 0, 4),
        ("ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING", "rows", None, 1),
        ("ROWS BETWEEN 1 PRECEDING AND UNBOUNDED FOLLOWING", "rows", -1, None),
        ("ROWS BETWEEN 2 FOLLOWING AND 5 FOLLOWING", "rows", 2, 5),
        ("ROWS BETWEEN 5 PRECEDING AND 2 PRECEDING", "rows", -5, -2),
        ("ROWS 4 PRECEDING", "rows", -4, 0),
    ])
    @pytest.mark.parametrize("fn", ["sum", "count", "min", "max"])
    def test_rows_frames(self, session, spec, mode, lo, hi, fn):
        call = f"{fn}(x)" if fn != "count" else "count()"
        r = session.execute(
            f"SELECT {call} OVER (PARTITION BY g ORDER BY id {spec}) "
            "FROM w ORDER BY g, id")
        exp = self._golden(session, fn, mode, lo, hi)
        assert [row[0] for row in r.rows()] == exp

    @pytest.mark.parametrize("spec,lo,hi", [
        ("RANGE BETWEEN 30 PRECEDING AND CURRENT ROW", -30, 0),
        ("RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING", -10, 10),
        ("RANGE BETWEEN CURRENT ROW AND 50 FOLLOWING", 0, 50),
        ("RANGE BETWEEN UNBOUNDED PRECEDING AND 5 FOLLOWING", None, 5),
    ])
    def test_range_offset_frames(self, session, spec, lo, hi):
        r = session.execute(
            f"SELECT sum(x) OVER (PARTITION BY g ORDER BY id {spec}) "
            "FROM w ORDER BY g, id")
        exp = self._golden(session, "sum", "range", lo, hi)
        assert [row[0] for row in r.rows()] == exp

    def test_default_frame_includes_peers(self, session):
        """The SQL default frame is RANGE UNBOUNDED PRECEDING..CURRENT ROW:
        tied ORDER BY rows share one frame (reference WindowTransform)."""
        s = ch.connect()
        s.execute("CREATE TABLE peers (k Int64, v Int64)")
        s.insert_pydict("peers", {
            "k": np.array([1, 1, 2, 2, 3], np.int64),
            "v": np.array([10, 20, 30, 40, 50], np.int64)})
        r = s.execute("SELECT sum(v) OVER (ORDER BY k) FROM peers ORDER BY k, v")
        assert [row[0] for row in r.rows()] == [30, 30, 100, 100, 150]

    def test_rows_current_row_excludes_peers(self, session):
        s = ch.connect()
        s.execute("CREATE TABLE peers2 (k Int64, v Int64)")
        s.insert_pydict("peers2", {
            "k": np.array([1, 1, 2], np.int64),
            "v": np.array([10, 20, 30], np.int64)})
        r = s.execute(
            "SELECT sum(v) OVER (ORDER BY k "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "FROM peers2 ORDER BY k, v")
        assert [row[0] for row in r.rows()] == [10, 30, 60]

    def test_first_last_value_frames(self, session):
        r = session.execute(
            "SELECT first_value(x) OVER (PARTITION BY g ORDER BY id "
            "ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS f, "
            "last_value(x) OVER (PARTITION BY g ORDER BY id "
            "ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS l "
            "FROM w ORDER BY g, id")
        expf = self._golden(session, "first", "rows", -2, 1)
        expl = self._golden(session, "last", "rows", -2, 1)
        got = r.rows()
        assert [row[0] for row in got] == expf
        assert [row[1] for row in got] == expl

    def test_avg_over_empty_frame_is_nan(self, session):
        s = ch.connect()
        s.execute("CREATE TABLE ef (v Int64)")
        s.insert_pydict("ef", {"v": np.array([1, 2, 3], np.int64)})
        r = s.execute(
            "SELECT avg(v) OVER (ORDER BY v "
            "ROWS BETWEEN 2 FOLLOWING AND 3 FOLLOWING) FROM ef ORDER BY v")
        rows = [row[0] for row in r.rows()]
        assert rows[0] == 3.0
        assert np.isnan(rows[1]) and np.isnan(rows[2])
