"""-State / -Merge combinators as storable column values +
AggregatingMergeTree + pre-aggregating materialized views.

Reference: src/Columns/ColumnAggregateFunction.h (states as column values),
src/AggregateFunctions/AggregateFunctionState.h (-State combinator),
AggregatingSortedAlgorithm.cpp (AggregatingMergeTree FINAL folds).
"""
import numpy as np
import pytest

import clickhouse_tpu as ch


@pytest.fixture()
def session():
    s = ch.connect()
    rng = np.random.default_rng(3)
    n = 4000
    s.execute("CREATE TABLE src (k Int64, u Int64, v Int64, f Float64)")
    s.insert_pydict("src", {
        "k": rng.integers(0, 5, n).astype(np.int64),
        "u": rng.integers(0, 700, n).astype(np.int64),
        "v": rng.integers(-50, 50, n).astype(np.int64),
        "f": rng.normal(size=n),
    })
    return s


BASIC = ["sum(v)", "count()", "min(v)", "max(v)", "avg(v)", "any(v)",
         "sum(f)", "avg(f)", "varPop(v)", "stddevSamp(f)", "argMax(v, u)"]


@pytest.mark.parametrize("call", BASIC)
def test_state_merge_round_trip(session, call):
    """fnState -> subquery -> fnMerge == fn directly."""
    fn = call.split("(")[0]
    args = call[len(fn):]
    direct = session.execute(
        f"SELECT k, {fn}{args} AS r FROM src GROUP BY k ORDER BY k").rows()
    via = session.execute(
        f"SELECT k, {fn}Merge(st) AS r FROM "
        f"(SELECT k, {fn}State{args} AS st FROM src GROUP BY k) "
        "GROUP BY k ORDER BY k").rows()
    for (k1, r1), (k2, r2) in zip(direct, via):
        assert k1 == k2
        if isinstance(r1, float):
            assert r1 == pytest.approx(r2, rel=1e-9)
        else:
            assert r1 == r2


def test_state_type_name(session):
    r = session.execute("SELECT sumState(v) FROM src")
    assert r.types[0][1] == "AggregateFunction(sum, Int64)"
    assert isinstance(r.rows()[0][0], bytes)


def test_aggregating_merge_tree_final(session):
    session.execute(
        "CREATE TABLE agg (k Int64, c AggregateFunction(count, Int64), "
        "s AggregateFunction(sum, Int64)) "
        "ENGINE = AggregatingMergeTree ORDER BY k")
    session.execute(
        "INSERT INTO agg SELECT k, countState(v), sumState(v) "
        "FROM src GROUP BY k")
    session.execute(
        "INSERT INTO agg SELECT k, countState(v), sumState(v) "
        "FROM src GROUP BY k")
    exp = session.execute(
        "SELECT k, count() * 2, sum(v) * 2 FROM src GROUP BY k "
        "ORDER BY k").rows()
    # GROUP BY + -Merge over both part rows
    got = session.execute(
        "SELECT k, countMerge(c), sumMerge(s) FROM agg GROUP BY k "
        "ORDER BY k").rows()
    assert got == exp
    # FINAL folds states per sort key at read time
    got_final = session.execute(
        "SELECT k, finalizeAggregation(c), finalizeAggregation(s) "
        "FROM agg FINAL ORDER BY k").rows()
    assert got_final == exp


def test_uniq_state_merge_tolerance(session):
    session.execute(
        "CREATE TABLE ua (k Int64, st AggregateFunction(uniq, Int64)) "
        "ENGINE = AggregatingMergeTree ORDER BY k")
    session.execute("INSERT INTO ua SELECT k, uniqState(u) FROM src GROUP BY k")
    session.execute(
        "INSERT INTO ua SELECT k, uniqState(u + 1000) FROM src GROUP BY k")
    got = session.execute(
        "SELECT k, uniqMerge(st) FROM ua GROUP BY k ORDER BY k").rows()
    exact = session.execute(
        "SELECT k, uniqExact(u) * 2 FROM src GROUP BY k ORDER BY k").rows()
    for (k1, u), (k2, e) in zip(got, exact):
        assert k1 == k2
        assert abs(u - e) / e < 0.1     # HLL(m=4096) ~1.6% typical error


def test_preaggregating_materialized_view(session):
    session.execute(
        "CREATE TABLE tgt (k Int64, c AggregateFunction(count, Int64), "
        "s AggregateFunction(sum, Int64)) "
        "ENGINE = AggregatingMergeTree ORDER BY k")
    session.execute(
        "CREATE MATERIALIZED VIEW mv TO tgt AS "
        "SELECT k, countState(v) AS c, sumState(v) AS s FROM src GROUP BY k")
    session.execute("INSERT INTO src VALUES (1, 1, 10, 0.0), (1, 2, 20, 0.0),"
                    " (2, 3, 5, 0.0)")
    session.execute("INSERT INTO src VALUES (1, 4, 30, 0.0)")
    got = session.execute(
        "SELECT k, countMerge(c), sumMerge(s) FROM tgt GROUP BY k "
        "ORDER BY k").rows()
    assert got == [(1, 3, 60), (2, 1, 5)]


def test_state_if_combinator(session):
    direct = session.execute(
        "SELECT k, sumIf(v, v > 0) FROM src GROUP BY k ORDER BY k").rows()
    via = session.execute(
        "SELECT k, sumMerge(st) FROM (SELECT k, sumStateIf(v, v > 0) AS st "
        "FROM src GROUP BY k) GROUP BY k ORDER BY k").rows()
    assert via == direct


def test_merge_type_mismatch_raises(session):
    with pytest.raises(Exception):
        session.execute(
            "SELECT maxMerge(st) FROM (SELECT sumState(v) AS st FROM src)")


def test_state_of_nonmergeable_raises(session):
    with pytest.raises(Exception):
        session.execute("SELECT groupArrayState(v) FROM src")


def test_finalize_aggregation_global(session):
    r = session.execute(
        "SELECT finalizeAggregation(st) FROM "
        "(SELECT avgState(v) AS st FROM src)")
    exp = session.execute("SELECT avg(v) FROM src").scalar()
    assert r.scalar() == pytest.approx(exp, rel=1e-12)
