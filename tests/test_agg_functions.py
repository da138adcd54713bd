"""Aggregate-function long tail: statistics, bitwise, sketches, array aggs.

Mirrors the reference's aggregate function stateless coverage
(tests/queries/0_stateless/*group_array*, *uniq*, *topK*, etc.) with
pandas/numpy goldens.
"""
import math

import numpy as np
import pandas as pd
import pytest

import clickhouse_tpu as ch


@pytest.fixture(scope="module")
def session():
    s = ch.connect()
    rng = np.random.default_rng(77)
    n = 4000
    s.execute("""
        CREATE TABLE m (k UInt32, x Float64, y Float64, v UInt32,
                        b UInt64) ENGINE = MergeTree ORDER BY k
    """)
    data = {
        "k": rng.integers(0, 8, n).astype(np.uint32),
        "x": rng.normal(3, 2, n),
        "y": rng.normal(-1, 4, n),
        "v": rng.integers(0, 50, n).astype(np.uint32),
        "b": rng.integers(0, 1 << 40, n).astype(np.uint64),
    }
    s.insert_pydict("m", data)
    s._df = pd.DataFrame(data)
    return s


def _grouped(session, sql):
    return dict((r[0], r[1:]) for r in session.execute(sql).rows())


class TestStatistical:
    def test_covar_corr(self, session):
        got = _grouped(session, "SELECT k, covarPop(x, y), covarSamp(x, y), "
                       "corr(x, y) FROM m GROUP BY k")
        for k, g in session._df.groupby("k"):
            cp = np.cov(g.x, g.y, bias=True)[0, 1]
            cs = np.cov(g.x, g.y, bias=False)[0, 1]
            cr = np.corrcoef(g.x, g.y)[0, 1]
            np.testing.assert_allclose(got[k], (cp, cs, cr), rtol=1e-9)

    def test_skew_kurt(self, session):
        got = _grouped(session, "SELECT k, skewPop(x), kurtPop(x) "
                       "FROM m GROUP BY k")
        for k, g in session._df.groupby("k"):
            m2 = ((g.x - g.x.mean()) ** 2).mean()
            m3 = ((g.x - g.x.mean()) ** 3).mean()
            m4 = ((g.x - g.x.mean()) ** 4).mean()
            np.testing.assert_allclose(
                got[k], (m3 / m2 ** 1.5, m4 / m2 ** 2), rtol=1e-6)

    def test_avg_weighted(self, session):
        got = _grouped(session, "SELECT k, avgWeighted(x, v) "
                       "FROM m GROUP BY k")
        for k, g in session._df.groupby("k"):
            np.testing.assert_allclose(
                got[k][0], np.average(g.x, weights=g.v), rtol=1e-9)

    def test_sum_with_overflow_keeps_type(self, session):
        r = session.execute("SELECT sumWithOverflow(v) FROM m")
        want = int(session._df.v.values.astype(np.uint32).sum(dtype=np.uint32))
        assert r.rows()[0][0] == want


class TestBitwise:
    def test_group_bit_ops(self, session):
        got = _grouped(session, "SELECT k, groupBitOr(b), groupBitAnd(b), "
                       "groupBitXor(b) FROM m GROUP BY k")
        for k, g in session._df.groupby("k"):
            bo = np.bitwise_or.reduce(g.b.values)
            ba = np.bitwise_and.reduce(g.b.values)
            bx = np.bitwise_xor.reduce(g.b.values)
            assert got[k] == (bo, ba, bx)


class TestSketches:
    def test_uniq_hll_within_tolerance(self, session):
        got = _grouped(session, "SELECT k, uniq(b), uniqExact(b) "
                       "FROM m GROUP BY k")
        for k, g in session._df.groupby("k"):
            exact = g.b.nunique()
            approx = got[k][0]
            assert got[k][1] == exact
            assert abs(approx - exact) <= max(4, 0.1 * exact)

    def test_uniq_large_relative_error(self, session):
        s = ch.connect()
        s.execute("CREATE TABLE u (x UInt64)")
        vals = np.random.default_rng(3).integers(0, 1 << 62, 60000,
                                                 dtype=np.uint64)
        s.insert_pydict("u", {"x": vals})
        approx = s.execute("SELECT uniq(x) FROM u").rows()[0][0]
        exact = len(np.unique(vals))
        # m=4096 registers -> ~1.6% standard error; allow 5 sigma
        assert abs(approx - exact) / exact < 0.08

    def test_entropy(self, session):
        got = _grouped(session, "SELECT k, entropy(v) FROM m GROUP BY k")
        for k, g in session._df.groupby("k"):
            p = g.v.value_counts(normalize=True).values
            np.testing.assert_allclose(got[k][0], -(p * np.log2(p)).sum(),
                                       rtol=1e-9)


class TestArrayAggs:
    def test_group_array_order_and_values(self, session):
        # groups exceed the default 256 width; capacity autotuning must
        # re-plan and return the complete arrays
        got = _grouped(session, "SELECT k, groupArray(v) FROM m GROUP BY k")
        for k, g in session._df.groupby("k"):
            assert list(got[k][0]) == list(g.v)

    def test_group_array_bounded(self, session):
        got = _grouped(session, "SELECT k, groupArray(5)(v) FROM m GROUP BY k")
        for k, g in session._df.groupby("k"):
            assert list(got[k][0]) == list(g.v)[:5]

    def test_group_uniq_array(self, session):
        got = _grouped(session, "SELECT k, groupUniqArray(v) "
                       "FROM m GROUP BY k")
        for k, g in session._df.groupby("k"):
            assert sorted(got[k][0]) == sorted(g.v.unique())

    def test_top_k(self, session):
        got = _grouped(session, "SELECT k, topK(3)(v) FROM m GROUP BY k")
        for k, g in session._df.groupby("k"):
            counts = g.v.value_counts()
            res = list(got[k][0])
            assert len(res) == 3
            # every returned value's count >= the count of any excluded one
            kept = counts[res]
            thresh = counts.drop(res).max() if len(counts) > 3 else 0
            assert (kept >= thresh).all()

    def test_quantiles_multi(self, session):
        got = _grouped(session,
                       "SELECT k, quantiles(0.1, 0.5, 0.9)(x) "
                       "FROM m GROUP BY k")
        for k, g in session._df.groupby("k"):
            xs = np.sort(g.x.values)
            want = [xs[int(math.floor(q * (len(xs) - 1)))]
                    for q in (0.1, 0.5, 0.9)]
            np.testing.assert_allclose(list(got[k][0]), want, rtol=1e-12)

    def test_group_array_in_expression(self, session):
        r = session.execute(
            "SELECT k, length(groupArray(v)) AS l, count() AS c "
            "FROM m GROUP BY k HAVING l != c").rows()
        assert r == []   # width 256 is raised automatically on overflow
