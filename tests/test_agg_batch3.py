"""Aggregate breadth batch 3 (exprs/agg_ext3.py): time-decayed means,
interval union/sweep, z/U tests, contingency associations, ordered
collectors — hand-checked values + scipy cross-checks where available."""
import math

import numpy as np
import pytest

import clickhouse_tpu as ch


@pytest.fixture(scope="module")
def session():
    s = ch.connect()
    s.execute("CREATE TABLE iv (g Int64, a Int64, b Int64)")
    s.insert_pydict("iv", {
        "g": np.asarray([0, 0, 0, 1, 1], np.int64),
        "a": np.asarray([1, 2, 4, 0, 10], np.int64),
        "b": np.asarray([5, 6, 8, 3, 12], np.int64)})
    return s


def test_interval_length_sum(session):
    # g0: [1,5)+[2,6)+[4,8) union = [1,8) = 7 ; g1: [0,3)+[10,12) = 5
    r = session.execute("SELECT g, intervalLengthSum(a, b) FROM iv "
                        "GROUP BY g ORDER BY g").rows()
    assert r == [(0, 7), (1, 5)]


def test_max_intersections_and_position(session):
    r = session.execute(
        "SELECT g, maxIntersections(a, b), maxIntersectionsPosition(a, b) "
        "FROM iv GROUP BY g ORDER BY g").rows()
    assert r == [(0, 3, 4.0), (1, 1, 0.0)]


def test_exponential_moving_average():
    s = ch.connect()
    s.execute("CREATE TABLE ema (v Float64, t Int64)")
    s.insert_pydict("ema", {"v": np.asarray([1.0, 2.0, 4.0]),
                            "t": np.asarray([0, 1, 2], np.int64)})
    got = s.execute(
        "SELECT exponentialMovingAverage(1)(v, t) FROM ema").scalar()
    # weights 2^-(2-t): .25, .5, 1 -> (0.25+1+4)/1.75 = 3.0
    assert abs(got - 3.0) < 1e-9
    sum_, cnt, avg, mx = s.execute(
        "SELECT exponentialTimeDecayedSum(1)(v, t), "
        "exponentialTimeDecayedCount(1)(t), "
        "exponentialTimeDecayedAvg(1)(v, t), "
        "exponentialTimeDecayedMax(1)(v, t) FROM ema").rows()[0]
    w = [math.exp(-2), math.exp(-1), 1.0]
    assert abs(sum_ - (1 * w[0] + 2 * w[1] + 4 * w[2])) < 1e-9
    assert abs(cnt - sum(w)) < 1e-9
    assert abs(avg - sum_ / cnt) < 1e-9
    assert abs(mx - 4.0) < 1e-9


def test_mean_z_test_against_formula():
    s = ch.connect()
    x = np.asarray([1.0, 2.0, 3.0, 4.0])
    y = np.asarray([2.0, 3.0, 4.0, 5.0])
    s.execute("CREATE TABLE zt (v Float64, i Int64)")
    s.insert_pydict("zt", {"v": np.concatenate([x, y]),
                           "i": np.asarray([0] * 4 + [1] * 4, np.int64)})
    z, p, lo, hi = s.execute(
        "SELECT meanZTest(1.0, 1.0, 0.95)(v, i) FROM zt").rows()[0][0]
    se = math.sqrt(1 / 4 + 1 / 4)
    z_exp = (x.mean() - y.mean()) / se
    assert abs(z - z_exp) < 1e-9
    assert abs(p - math.erfc(abs(z_exp) / math.sqrt(2))) < 1e-9
    assert lo < x.mean() - y.mean() < hi


def test_mann_whitney_against_scipy():
    scipy_stats = pytest.importorskip("scipy.stats")
    rng = np.random.default_rng(3)
    x = rng.normal(0.0, 1.0, 30)
    y = rng.normal(0.8, 1.0, 25)
    s = ch.connect()
    s.execute("CREATE TABLE mw (v Float64, i Int64)")
    s.insert_pydict("mw", {"v": np.concatenate([x, y]),
                           "i": np.asarray([0] * 30 + [1] * 25, np.int64)})
    u, p = s.execute("SELECT mannWhitneyUTest(v, i) FROM mw").rows()[0][0]
    ref = scipy_stats.mannwhitneyu(x, y, alternative="two-sided",
                                   method="asymptotic",
                                   use_continuity=False)
    assert abs(u - ref.statistic) < 1e-6
    assert abs(p - ref.pvalue) < 1e-6


def test_cramers_v_perfect_and_independent():
    s = ch.connect()
    # perfect association: b == a -> V = 1; independent-ish -> small
    a = np.asarray([0, 1, 2, 0, 1, 2] * 10, np.int64)
    s.execute("CREATE TABLE cv (a Int64, b Int64, c Int64)")
    s.insert_pydict("cv", {"a": a, "b": a.copy(),
                           "c": np.asarray([0, 1] * 30, np.int64)})
    v, vb, t, cg = s.execute(
        "SELECT cramersV(a, b), cramersVBiasCorrected(a, b), "
        "theilsU(a, b), contingency(a, b) FROM cv").rows()[0]
    assert abs(v - 1.0) < 1e-9
    assert abs(t - 1.0) < 1e-9          # b fully determines a
    assert 0.8 < cg < 0.85              # sqrt(chi2/(chi2+T)) caps below 1
    assert abs(vb - 1.0) < 0.05
    v2, t2 = s.execute(
        "SELECT cramersV(a, c), theilsU(a, c) FROM cv").rows()[0]
    assert v2 < 1e-6 and t2 < 1e-6      # exactly balanced -> independent


def test_single_value_or_null():
    s = ch.connect()
    s.execute("CREATE TABLE sv (g Int64, x Int64)")
    s.insert_pydict("sv", {"g": np.asarray([0, 0, 1, 1], np.int64),
                           "x": np.asarray([5, 5, 1, 2], np.int64)})
    r = s.execute("SELECT g, singleValueOrNull(x) FROM sv "
                  "GROUP BY g ORDER BY g").rows()
    assert r == [(0, 5), (1, None)]


def test_ordered_collectors():
    s = ch.connect()
    s.execute("CREATE TABLE oc (x Int64)")
    s.insert_pydict("oc", {"x": np.asarray([5, 3, 9, 1, 7], np.int64)})
    sorted_, last, sample = s.execute(
        "SELECT groupArraySorted(3)(x), groupArrayLast(2)(x), "
        "groupArraySample(2)(x) FROM oc").rows()[0]
    assert sorted_ == [1, 3, 5]
    assert last == [1, 7]               # insertion order preserved
    assert len(sample) == 2 and set(sample) <= {5, 3, 9, 1, 7}


def test_quantile_spellings_and_bitmap():
    s = ch.connect()
    s.execute("CREATE TABLE qs (x Int64)")
    s.insert_pydict("qs", {"x": np.arange(1, 101, dtype=np.int64)})
    r = s.execute(
        "SELECT quantileGK(100, 0.5)(x), quantilesGK(100, 0.1, 0.9)(x), "
        "quantileExactHigh(x), groupBitmap(x % 7) FROM qs").rows()[0]
    assert r[0] in (50, 51) and r[2] in (50, 51)
    assert len(r[1]) == 2 and r[1][0] <= 11 and r[1][1] >= 90
    assert r[3] == 7


def test_decayed_if_combinator_and_groupby():
    """Batch-3 aggregates compose with -If and GROUP BY."""
    s = ch.connect()
    s.execute("CREATE TABLE dc (g Int64, v Float64, t Int64)")
    s.insert_pydict("dc", {
        "g": np.asarray([0, 0, 0, 1, 1], np.int64),
        "v": np.asarray([1.0, 100.0, 3.0, 4.0, 5.0]),
        "t": np.asarray([0, 1, 2, 0, 1], np.int64)})
    r = s.execute(
        "SELECT g, singleValueOrNullIf(t, v < 50) FROM dc "
        "GROUP BY g ORDER BY g").rows()
    assert len(r) == 2


def test_any_respect_nulls_selects_null_rows(session):
    """Advisor r03: RESPECT NULLS treats NULL as a selectable value (ref
    AggregateFunctionAnyRespectNulls.cpp) — any(x) RESPECT NULLS over a
    group whose first row is NULL returns NULL, not the first non-NULL."""
    session.execute("CREATE TABLE arn (g Int64, x Nullable(Int64))")
    session.insert_pydict("arn", {"g": [1, 1, 2, 2, 3],
                                  "x": [None, 1, 2, None, 7]})
    rows = session.execute(
        "SELECT g, any_respect_nulls(x), any(x) FROM arn "
        "GROUP BY g ORDER BY g").rows()
    assert rows == [(1, None, 1), (2, 2, 2), (3, 7, 7)]
    assert session.execute(
        "SELECT first_value_respect_nulls(x) FROM arn WHERE g = 1"
    ).rows() == [(None,)]
    # non-nullable args behave exactly like any()
    assert session.execute(
        "SELECT any_respect_nulls(g) FROM arn").rows() == [(1,)]
