"""End-to-end SQL tests — the analog of the reference's stateless golden
tests (tests/queries/0_stateless/, SURVEY.md §4): run a query, compare
against a pandas/numpy-computed golden result."""
import math

import numpy as np
import pandas as pd
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.core.errors import (AnalysisError, EngineError,
                                        UnknownIdentifier, UnknownTable)


@pytest.fixture(scope="module")
def session():
    s = ch.connect()
    rng = np.random.default_rng(1234)
    n = 5000
    s.execute("""
        CREATE TABLE events (
            id UInt64,
            user_id UInt32,
            value Float64,
            amount Int64,
            category String,
            flag UInt8,
            score Nullable(Float64)
        ) ENGINE = MergeTree ORDER BY id
    """)
    cats = np.asarray(["alpha", "beta", "gamma", "delta"], object)
    score = rng.normal(size=n).astype(object)
    score[rng.random(n) < 0.1] = None
    data = {
        "id": np.arange(n, dtype=np.uint64),
        "user_id": rng.integers(0, 100, n).astype(np.uint32),
        "value": rng.normal(10, 5, n),
        "amount": rng.integers(-1000, 1000, n),
        "category": cats[rng.integers(0, 4, n)],
        "flag": rng.integers(0, 2, n).astype(np.uint8),
        "score": score,
    }
    s.insert_pydict("events", data)
    s._golden = pd.DataFrame({k: (v if v.dtype != object or k == "category"
                                  else v) for k, v in data.items()})
    s._golden["score"] = [x if x is not None else np.nan for x in data["score"]]
    s.execute("""
        CREATE TABLE users (uid UInt32, name String, plan String)
    """)
    s.insert_pydict("users", {
        "uid": np.arange(0, 80, dtype=np.uint32),   # 20 users missing
        "name": np.asarray([f"user_{i}" for i in range(80)], object),
        "plan": np.asarray(["free" if i % 3 else "pro" for i in range(80)],
                           object),
    })
    return s


def q(session, sql):
    return session.execute(sql)


class TestBasics:
    def test_scalar_arith(self, session):
        assert q(session, "SELECT 2 + 3 * 4").scalar() == 14

    def test_count_rows(self, session):
        assert q(session, "SELECT count() FROM events").scalar() == 5000

    def test_filter_count_parity(self, session):
        got = q(session, "SELECT count() FROM events WHERE value > 12").scalar()
        assert got == int((session._golden["value"] > 12).sum())

    def test_complex_predicate(self, session):
        sql = ("SELECT count() FROM events WHERE value > 8 AND amount < 500 "
               "AND (flag = 1 OR category = 'alpha')")
        g = session._golden
        exp = ((g.value > 8) & (g.amount < 500)
               & ((g.flag == 1) | (g.category == "alpha"))).sum()
        assert q(session, sql).scalar() == int(exp)

    def test_select_expression_columns(self, session):
        r = q(session, "SELECT id, value * 2 AS dv FROM events "
                       "WHERE id < 5 ORDER BY id")
        g = session._golden.head(5)
        np.testing.assert_allclose([row[1] for row in r.rows()],
                                   (g.value * 2).values)

    def test_in_list(self, session):
        got = q(session, "SELECT count() FROM events "
                         "WHERE category IN ('alpha', 'beta')").scalar()
        exp = session._golden.category.isin(["alpha", "beta"]).sum()
        assert got == int(exp)

    def test_between(self, session):
        got = q(session, "SELECT count() FROM events "
                         "WHERE amount BETWEEN -10 AND 10").scalar()
        g = session._golden
        assert got == int(((g.amount >= -10) & (g.amount <= 10)).sum())

    def test_case(self, session):
        got = q(session, "SELECT sum(CASE WHEN flag = 1 THEN 1 ELSE 0 END) "
                         "FROM events").scalar()
        assert got == int(session._golden.flag.sum())

    def test_like(self, session):
        got = q(session, "SELECT count() FROM events "
                         "WHERE category LIKE '%eta'").scalar()
        assert got == int(session._golden.category.str.endswith("eta").sum())


class TestAggregation:
    def test_global_aggregates(self, session):
        r = q(session, "SELECT sum(amount), min(amount), max(amount), "
                       "avg(value), count(score) FROM events")
        g = session._golden
        row = r.rows()[0]
        assert row[0] == int(g.amount.sum())
        assert row[1] == int(g.amount.min())
        assert row[2] == int(g.amount.max())
        assert abs(row[3] - g.value.mean()) < 1e-9
        assert row[4] == int(g.score.notna().sum())

    def test_group_by_parity(self, session):
        r = q(session, "SELECT category, count() c, sum(amount) s, "
                       "avg(value) a, min(amount) mn, max(amount) mx "
                       "FROM events GROUP BY category ORDER BY category")
        g = session._golden.groupby("category").agg(
            c=("amount", "size"), s=("amount", "sum"), a=("value", "mean"),
            mn=("amount", "min"), mx=("amount", "max")).reset_index()
        for got, (_, exp) in zip(r.rows(), g.iterrows()):
            assert got[0] == exp.category
            assert got[1] == exp.c and got[2] == exp.s
            assert abs(got[3] - exp.a) < 1e-9
            assert got[4] == exp.mn and got[5] == exp.mx

    def test_group_by_expression_key(self, session):
        r = q(session, "SELECT user_id % 10 AS b, count() FROM events "
                       "GROUP BY b ORDER BY b")
        g = (session._golden.user_id % 10).value_counts().sort_index()
        assert [row[1] for row in r.rows()] == g.tolist()

    def test_having(self, session):
        r = q(session, "SELECT user_id, count() c FROM events GROUP BY user_id "
                       "HAVING c > 60 ORDER BY user_id")
        g = session._golden.groupby("user_id").size()
        exp = g[g > 60]
        assert [row[0] for row in r.rows()] == exp.index.tolist()
        assert [row[1] for row in r.rows()] == exp.tolist()

    def test_uniq_exact(self, session):
        got = q(session, "SELECT uniqExact(user_id) FROM events").scalar()
        assert got == session._golden.user_id.nunique()

    def test_count_distinct_grouped(self, session):
        r = q(session, "SELECT category, uniqExact(user_id) FROM events "
                       "GROUP BY category ORDER BY category")
        g = session._golden.groupby("category").user_id.nunique()
        assert [row[1] for row in r.rows()] == g.tolist()

    def test_count_if_sum_if(self, session):
        r = q(session, "SELECT countIf(flag = 1), sumIf(amount, amount > 0) "
                       "FROM events")
        g = session._golden
        row = r.rows()[0]
        assert row[0] == int((g.flag == 1).sum())
        assert row[1] == int(g.amount[g.amount > 0].sum())

    def test_arg_min_max(self, session):
        r = q(session, "SELECT argMax(id, value), argMin(id, value) FROM events")
        g = session._golden
        row = r.rows()[0]
        assert row[0] == int(g.value.idxmax())
        assert row[1] == int(g.value.idxmin())

    def test_median(self, session):
        got = q(session, "SELECT median(amount) FROM events").scalar()
        vals = np.sort(session._golden.amount.values)
        exp = vals[math.floor(0.5 * (len(vals) - 1))]
        assert got == exp

    def test_quantile_param(self, session):
        got = q(session, "SELECT quantile(0.9)(amount) FROM events").scalar()
        vals = np.sort(session._golden.amount.values)
        assert got == vals[math.floor(0.9 * (len(vals) - 1))]

    def test_stddev(self, session):
        got = q(session, "SELECT stddevPop(value) FROM events").scalar()
        assert abs(got - session._golden.value.std(ddof=0)) < 1e-6

    def test_null_skipping(self, session):
        r = q(session, "SELECT count(score), avg(score) FROM events")
        g = session._golden.score
        row = r.rows()[0]
        assert row[0] == int(g.notna().sum())
        assert abs(row[1] - g.dropna().mean()) < 1e-9

    def test_empty_group_result(self, session):
        r = q(session, "SELECT count(), sum(amount) FROM events WHERE id > 1e18")
        assert r.rows()[0] == (0, 0)

    def test_aggregate_of_expression(self, session):
        got = q(session, "SELECT sum(amount * 2 + 1) FROM events").scalar()
        assert got == int((session._golden.amount * 2 + 1).sum())

    def test_expression_of_aggregate(self, session):
        got = q(session, "SELECT sum(amount) * 2 + count() FROM events").scalar()
        g = session._golden
        assert got == int(g.amount.sum() * 2 + len(g))


class TestOrderLimit:
    def test_order_by_limit(self, session):
        r = q(session, "SELECT id, amount FROM events "
                       "ORDER BY amount DESC, id LIMIT 10")
        g = session._golden.sort_values(["amount", "id"],
                                        ascending=[False, True]).head(10)
        assert [row[0] for row in r.rows()] == g.id.tolist()

    def test_order_by_string(self, session):
        r = q(session, "SELECT DISTINCT category FROM events ORDER BY category")
        assert [row[0] for row in r.rows()] == ["alpha", "beta", "delta",
                                                "gamma"]

    def test_limit_offset(self, session):
        r = q(session, "SELECT id FROM events ORDER BY id LIMIT 5 OFFSET 10")
        assert [row[0] for row in r.rows()] == list(range(10, 15))

    def test_order_by_unselected_column(self, session):
        r = q(session, "SELECT id FROM events ORDER BY value LIMIT 3")
        g = session._golden.sort_values("value").head(3)
        assert [row[0] for row in r.rows()] == g.id.tolist()

    def test_limit_by(self, session):
        r = q(session, "SELECT category, id FROM events "
                       "ORDER BY category, id LIMIT 2 BY category")
        g = (session._golden.sort_values(["category", "id"])
             .groupby("category").head(2))
        assert sorted(row[1] for row in r.rows()) == sorted(g.id.tolist())

    def test_nulls_last(self, session):
        r = q(session, "SELECT score FROM events ORDER BY score LIMIT 3")
        vals = [row[0] for row in r.rows()]
        assert all(v is not None for v in vals)
        g = session._golden.score.dropna().sort_values().head(3)
        np.testing.assert_allclose(vals, g.values)


class TestJoins:
    def test_inner_join(self, session):
        r = q(session, """
            SELECT count(), sum(e.amount)
            FROM events e INNER JOIN users u ON e.user_id = u.uid
        """)
        g = session._golden.merge(
            pd.DataFrame({"uid": np.arange(0, 80)}), left_on="user_id",
            right_on="uid")
        row = r.rows()[0]
        assert row[0] == len(g)
        assert row[1] == int(g.amount.sum())

    def test_left_join_defaults(self, session):
        r = q(session, """
            SELECT count(), countIf(name = '')
            FROM events e LEFT JOIN users u ON e.user_id = u.uid
        """)
        g = session._golden
        row = r.rows()[0]
        assert row[0] == 5000
        assert row[1] == int((g.user_id >= 80).sum())

    def test_join_using(self, session):
        session.execute("CREATE TABLE IF NOT EXISTS dim (user_id UInt32, "
                        "label String)")
        session.execute("TRUNCATE TABLE dim")
        session.insert_pydict("dim", {
            "user_id": np.arange(0, 100, 2, dtype=np.uint32),
            "label": np.asarray([f"L{i}" for i in range(0, 100, 2)], object)})
        r = q(session, "SELECT count() FROM events INNER JOIN dim USING user_id")
        exp = int((session._golden.user_id % 2 == 0).sum())
        assert r.scalar() == exp

    def test_join_group_by(self, session):
        r = q(session, """
            SELECT u.plan AS plan, count() AS c
            FROM events e INNER JOIN users u ON e.user_id = u.uid
            GROUP BY plan ORDER BY plan
        """)
        users = pd.DataFrame({
            "uid": np.arange(0, 80),
            "plan": ["free" if i % 3 else "pro" for i in range(80)]})
        g = session._golden.merge(users, left_on="user_id", right_on="uid") \
            .groupby("plan").size()
        assert [(row[0], row[1]) for row in r.rows()] == list(g.items())

    def test_semi_anti_join(self, session):
        semi = q(session, "SELECT count() FROM events SEMI LEFT JOIN users u "
                          "ON user_id = u.uid").scalar()
        anti = q(session, "SELECT count() FROM events ANTI LEFT JOIN users u "
                          "ON user_id = u.uid").scalar()
        exp_semi = int((session._golden.user_id < 80).sum())
        assert semi == exp_semi
        assert anti == 5000 - exp_semi

    def test_cross_join(self, session):
        r = q(session, "SELECT count() FROM (SELECT number FROM numbers(7)) a "
                       "CROSS JOIN (SELECT number FROM numbers(13)) b")
        assert r.scalar() == 7 * 13

    def test_any_join(self, session):
        # duplicate build side: ANY join takes one match per probe row
        session.execute("DROP TABLE IF EXISTS dup")
        session.execute("CREATE TABLE dup (k UInt32, v UInt32)")
        session.insert_pydict("dup", {
            "k": np.asarray([1, 1, 2], np.uint32),
            "v": np.asarray([10, 11, 20], np.uint32)})
        got = q(session, "SELECT count() FROM (SELECT number AS k FROM "
                         "numbers(3)) n ANY LEFT JOIN dup ON n.k = dup.k")
        assert got.scalar() == 3


class TestSetOps:
    def test_union_all(self, session):
        r = q(session, "SELECT 1 AS x UNION ALL SELECT 2 UNION ALL SELECT 3")
        assert sorted(row[0] for row in r.rows()) == [1, 2, 3]

    def test_distinct(self, session):
        r = q(session, "SELECT DISTINCT flag FROM events ORDER BY flag")
        assert [row[0] for row in r.rows()] == [0, 1]

    def test_union_distinct(self, session):
        r = q(session, "SELECT 1 AS x UNION DISTINCT SELECT 1 UNION DISTINCT "
                       "SELECT 2")
        assert sorted(row[0] for row in r.rows()) == [1, 2]


class TestSubqueries:
    def test_from_subquery(self, session):
        got = q(session, """
            SELECT avg(c) FROM (
                SELECT user_id, count() AS c FROM events GROUP BY user_id
            )
        """).scalar()
        g = session._golden.groupby("user_id").size()
        assert abs(got - g.mean()) < 1e-9

    def test_scalar_subquery(self, session):
        got = q(session, "SELECT count() FROM events "
                         "WHERE amount > (SELECT avg(amount) FROM events)")
        g = session._golden
        assert got.scalar() == int((g.amount > g.amount.mean()).sum())

    def test_in_subquery(self, session):
        got = q(session, """
            SELECT count() FROM events
            WHERE user_id IN (SELECT uid FROM users WHERE plan = 'pro')
        """).scalar()
        pro = {i for i in range(80) if not i % 3}
        assert got == int(session._golden.user_id.isin(pro).sum())

    def test_cte(self, session):
        got = q(session, """
            WITH big AS (SELECT * FROM events WHERE amount > 500)
            SELECT count() FROM big
        """).scalar()
        assert got == int((session._golden.amount > 500).sum())

    def test_scalar_cte(self, session):
        got = q(session, "WITH 10 AS n SELECT n * 2").scalar()
        assert got == 20


class TestNulls:
    def test_is_null_counts(self, session):
        r = q(session, "SELECT countIf(score IS NULL), "
                       "countIf(score IS NOT NULL) FROM events")
        g = session._golden.score
        assert r.rows()[0] == (int(g.isna().sum()), int(g.notna().sum()))

    def test_coalesce(self, session):
        got = q(session, "SELECT sum(coalesce(score, 0.0)) FROM events").scalar()
        assert abs(got - session._golden.score.fillna(0).sum()) < 1e-6

    def test_null_literal(self, session):
        r = q(session, "SELECT NULL")
        assert r.rows()[0][0] is None

    def test_if_null(self, session):
        got = q(session, "SELECT ifNull(NULL, 42)").scalar()
        assert got == 42


class TestDDL:
    def test_create_insert_select_roundtrip(self, session):
        session.execute("DROP TABLE IF EXISTS t_round")
        session.execute("CREATE TABLE t_round (a Int64, b String)")
        session.execute("INSERT INTO t_round VALUES (1, 'x'), (2, 'y'), (3, 'z')")
        r = q(session, "SELECT a, b FROM t_round ORDER BY a")
        assert r.rows() == [(1, "x"), (2, "y"), (3, "z")]

    def test_insert_select(self, session):
        session.execute("DROP TABLE IF EXISTS t_ins")
        session.execute("CREATE TABLE t_ins (n UInt64)")
        session.execute("INSERT INTO t_ins SELECT number FROM numbers(10)")
        assert q(session, "SELECT count() FROM t_ins").scalar() == 10

    def test_create_as_select(self, session):
        session.execute("DROP TABLE IF EXISTS t_cas")
        session.execute("CREATE TABLE t_cas ENGINE = Memory AS "
                        "SELECT number AS n FROM numbers(5)")
        assert q(session, "SELECT sum(n) FROM t_cas").scalar() == 10

    def test_describe(self, session):
        r = q(session, "DESCRIBE TABLE events")
        names = [row[0] for row in r.rows()]
        assert "id" in names and "score" in names

    def test_show_tables(self, session):
        r = q(session, "SHOW TABLES")
        assert "events" in [row[0] for row in r.rows()]

    def test_truncate(self, session):
        session.execute("DROP TABLE IF EXISTS t_tr")
        session.execute("CREATE TABLE t_tr (x Int64)")
        session.execute("INSERT INTO t_tr VALUES (1)")
        session.execute("TRUNCATE TABLE t_tr")
        assert q(session, "SELECT count() FROM t_tr").scalar() == 0

    def test_errors(self, session):
        with pytest.raises(UnknownTable):
            session.execute("SELECT * FROM no_such_table")
        with pytest.raises(UnknownIdentifier):
            session.execute("SELECT no_such_col FROM events")


class TestSystem:
    def test_system_one(self, session):
        assert q(session, "SELECT * FROM system.one").rows() == [(0,)]

    def test_system_tables(self, session):
        r = q(session, "SELECT name FROM system.tables "
                       "WHERE database = 'default' ORDER BY name")
        assert "events" in [row[0] for row in r.rows()]

    def test_explain(self, session):
        r = q(session, "EXPLAIN SELECT count() FROM events WHERE value > 0")
        text = "\n".join(row[0] for row in r.rows())
        assert "Aggregate" in text and "Scan" in text

    def test_settings_clause(self, session):
        # max_groups too small -> capacity error surfaces when autotune is off
        from clickhouse_tpu.core.errors import CapacityError
        with pytest.raises(CapacityError):
            session.execute("SELECT id FROM events GROUP BY id LIMIT 1 "
                            "SETTINGS max_groups = 1024, "
                            "capacity_autotune = 0")

    def test_capacity_autotune(self, session):
        # with autotune on (default), the same query re-plans at a higher
        # capacity tier and succeeds (reference: single->two-level hash
        # table conversion, src/Interpreters/Aggregator.cpp:91)
        r = q(session, "SELECT count() FROM (SELECT id FROM events "
                       "GROUP BY id) SETTINGS max_groups = 1024")
        assert r.scalar() == 5000
        assert session.profile_events.get("CapacityRetunes", 0) >= 1


class TestStringFunctions:
    def test_string_funcs(self, session):
        r = q(session, "SELECT upper(category) AS u, length(category) AS l "
                       "FROM events WHERE category = 'alpha' LIMIT 1")
        assert r.rows()[0] == ("ALPHA", 5)

    def test_concat(self, session):
        got = q(session, "SELECT concat('a', 'b', 'c')").scalar()
        assert got == "abc"

    def test_concat_column_const(self, session):
        r = q(session, "SELECT DISTINCT concat(category, '!') AS x "
                       "FROM events ORDER BY x")
        assert [row[0] for row in r.rows()] == ["alpha!", "beta!", "delta!",
                                                "gamma!"]


class TestDateTime:
    def test_civil_calendar(self, session):
        session.execute("DROP TABLE IF EXISTS t_dates")
        session.execute("CREATE TABLE t_dates (d Date, ts DateTime)")
        dates = pd.to_datetime(["1970-01-01", "2000-02-29", "2024-07-15",
                                "1999-12-31"])
        days = (dates - pd.Timestamp("1970-01-01")).days.astype(np.int32)
        secs = days.astype(np.int64) * 86400 + 3661   # 01:01:01
        session.insert_pydict("t_dates", {"d": days.values, "ts": secs.values})
        r = q(session, "SELECT toYear(d), toMonth(d), toDayOfMonth(d), "
                       "toHour(ts), toMinute(ts) FROM t_dates ORDER BY d")
        rows = r.rows()
        assert rows[0][:3] == (1970, 1, 1)
        assert rows[2][:3] == (2000, 2, 29)
        assert rows[3][:3] == (2024, 7, 15)
        assert rows[1][:3] == (1999, 12, 31)
        assert rows[0][3:] == (1, 1)

    def test_yyyymm(self, session):
        r = q(session, "SELECT toYYYYMM(d) FROM t_dates ORDER BY d LIMIT 1")
        assert r.scalar() == 197001


class TestOuterJoins:
    def test_right_join(self, session):
        r = q(session, """
            SELECT count(), countIf(user_id = 0 AND uid != 0)
            FROM (SELECT user_id FROM events WHERE user_id < 50) e
            RIGHT JOIN users u ON e.user_id = u.uid
        """)
        g = session._golden
        matched = int(g.user_id[g.user_id < 50].count())
        row = r.rows()[0]
        # every matching event row + one row for each unmatched user (50..79)
        assert row[0] == matched + 30
        # unmatched-right rows get the left default user_id=0; matched rows
        # with user_id=0 have uid=0, so exactly the 30 unmatched rows count
        assert row[1] == 30

    def test_full_join(self, session):
        session.execute("DROP TABLE IF EXISTS fa")
        session.execute("DROP TABLE IF EXISTS fb")
        session.execute("CREATE TABLE fa (k Int64, a Int64)")
        session.execute("CREATE TABLE fb (k Int64, b Int64)")
        session.execute("INSERT INTO fa VALUES (1, 10), (2, 20), (3, 30)")
        session.execute("INSERT INTO fb VALUES (2, 200), (3, 300), (4, 400)")
        r = q(session, """
            SELECT fa.k AS ka, a, fb.k AS kb, b
            FROM fa FULL JOIN fb ON fa.k = fb.k
            ORDER BY ka, kb
        """)
        rows = sorted(r.rows())
        assert (0, 0, 4, 400) in rows          # right-only row, defaults left
        assert (1, 10, 0, 0) in rows           # left-only row, defaults right
        assert (2, 20, 2, 200) in rows and (3, 30, 3, 300) in rows
        assert len(rows) == 4


class TestSetOps:
    """INTERSECT / EXCEPT (IntersectOrExceptTransform analog)."""

    def test_intersect_all_multiset(self):
        s = ch.connect()
        # A = 0,0,1,1,2 ; B = 0,1,1,1 -> min counts = 0,1,1
        got = sorted(s.execute(
            "SELECT intDiv(number, 2) FROM numbers(5) "
            "INTERSECT SELECT if(number = 0, 0, 1) FROM numbers(4)").rows())
        assert got == [(0,), (1,), (1,)]

    def test_except_all_multiset(self):
        s = ch.connect()
        got = sorted(s.execute(
            "SELECT intDiv(number, 2) FROM numbers(5) "
            "EXCEPT SELECT if(number = 0, 0, 1) FROM numbers(4)").rows())
        assert got == [(0,), (2,)]

    def test_intersect_distinct(self):
        s = ch.connect()
        got = s.execute("SELECT number % 3 FROM numbers(10) "
                        "INTERSECT DISTINCT SELECT 1").rows()
        assert got == [(1,)]

    def test_except_distinct(self):
        s = ch.connect()
        got = sorted(s.execute("SELECT number % 3 FROM numbers(10) "
                               "EXCEPT DISTINCT SELECT 1").rows())
        assert got == [(0,), (2,)]

    def test_precedence_intersect_tighter_than_union(self):
        s = ch.connect()
        # UNION ALL (INTERSECT) — intersect binds first
        got = sorted(s.execute(
            "SELECT 9 UNION ALL SELECT number FROM numbers(3) "
            "INTERSECT SELECT number + 1 FROM numbers(3)").rows())
        assert got == [(1,), (2,), (9,)]

    def test_chained_except(self):
        s = ch.connect()
        got = sorted(s.execute(
            "SELECT number FROM numbers(6) EXCEPT SELECT 1 "
            "EXCEPT SELECT 4").rows())
        assert got == [(0,), (2,), (3,), (5,)]


class TestWithFill:
    """ORDER BY ... WITH FILL (FillingTransform analog)."""

    def _mk(self):
        s = ch.connect()
        s.execute("CREATE TABLE wf (x Int64, v Int64)")
        s.execute("INSERT INTO wf VALUES (1, 10), (4, 40), (7, 70)")
        return s

    def test_fill_basic(self):
        s = self._mk()
        got = s.execute("SELECT x, v FROM wf ORDER BY x WITH FILL").rows()
        assert got == [(1, 10), (2, 0), (3, 0), (4, 40), (5, 0), (6, 0),
                       (7, 70)]

    def test_fill_from_to(self):
        s = self._mk()
        got = s.execute(
            "SELECT x FROM wf ORDER BY x WITH FILL FROM 0 TO 10").rows()
        assert [r[0] for r in got] == list(range(10))

    def test_fill_step(self):
        s = self._mk()
        got = s.execute(
            "SELECT x FROM wf ORDER BY x WITH FILL STEP 2").rows()
        assert [r[0] for r in got] == [1, 3, 4, 5, 7]

    def test_fill_desc(self):
        s = self._mk()
        got = s.execute("SELECT x FROM wf ORDER BY x DESC WITH FILL").rows()
        assert [r[0] for r in got] == [7, 6, 5, 4, 3, 2, 1]

    def test_fill_empty_table_no_bounds(self):
        s = ch.connect()
        s.execute("CREATE TABLE e (x Int64)")
        assert s.execute("SELECT x FROM e ORDER BY x WITH FILL").rows() == []


class TestHighCardinalityStrings:
    """String functions over high-distinct dictionaries run vectorized
    (VERDICT item 5: no per-value host loops at scale)."""

    def test_functions_at_200k_distinct(self):
        import time
        s = ch.connect()
        n = 200_000
        vals = np.asarray([f"user_{i}@example.com" for i in range(n)],
                          object)
        s.execute("CREATE TABLE hc (s String)")
        s.insert_pydict("hc", {"s": vals})
        t0 = time.time()
        assert s.execute("SELECT count() FROM hc "
                         "WHERE startsWith(s, 'user_1')").scalar() == 111111
        assert s.execute("SELECT max(length(s)) FROM hc").scalar() == 23
        assert s.execute("SELECT countIf(upper(s) LIKE 'USER_19%') "
                         "FROM hc").scalar() == 11111
        assert s.execute("SELECT count() FROM hc "
                         "WHERE s LIKE '%@example.com'").scalar() == n
        assert time.time() - t0 < 60


class TestTuples:
    """Tuple values: constructor, element access, lexicographic comparison,
    GROUP BY splat, result rendering (ColumnTuple analog)."""

    def test_tuple_output(self):
        s = ch.connect()
        assert s.execute("SELECT tuple(1, 'a')").rows() == [((1, "a"),)]
        assert s.execute("SELECT (number, number * 2) FROM numbers(2)"
                         ).rows() == [((0, 0.0),), ((1, 2.0),)]

    def test_tuple_element(self):
        s = ch.connect()
        assert s.execute("SELECT tupleElement(tuple(7, 8), 2)").scalar() == 8
        assert s.execute("SELECT tupleElement((3, 'x'), 1)").scalar() == 3

    def test_tuple_comparisons(self):
        s = ch.connect()
        assert s.execute("SELECT count() FROM numbers(10) "
                         "WHERE (number, 1) = (3, 1)").scalar() == 1
        assert s.execute("SELECT count() FROM numbers(10) "
                         "WHERE (number, 5) < (3, 9)").scalar() == 4
        assert s.execute("SELECT (1, 2) < (1, 3), (1, 2) < (1, 2), "
                         "(1, 2) <= (1, 2)").rows() == [(1, 0, 1)]

    def test_group_by_tuple_splat(self):
        s = ch.connect()
        got = s.execute("SELECT number % 2 AS a, count() FROM numbers(10) "
                        "GROUP BY (a) ORDER BY a").rows()
        assert got == [(0, 5), (1, 5)]

    def test_type_name(self):
        s = ch.connect()
        assert s.execute("SELECT toTypeName((1, 'x'))").scalar() \
            == "Tuple(UInt8, String)"


class TestMaps:
    """Map(K, V) — composite of keys/values Array sub-columns
    (reference: src/Columns/ColumnMap.h wraps Array(Tuple(K, V)))."""

    def test_map_constructor_and_access(self):
        s = ch.connect()
        assert s.execute("SELECT map('a', 1, 'b', 2)").scalar() \
            == {"a": 1, "b": 2}
        assert s.execute("SELECT map('a', 1, 'b', 2)['b']").scalar() == 2
        assert s.execute("SELECT map('a', 'x')['missing']").scalar() == ""
        assert s.execute("SELECT map(1, 10, 2, 20)[2]").scalar() == 20

    def test_map_functions(self):
        s = ch.connect()
        assert s.execute("SELECT mapKeys(map('a', 1, 'b', 2))").scalar() \
            == ["a", "b"]
        assert s.execute("SELECT mapValues(map('a', 1, 'b', 2))").scalar() \
            == [1, 2]
        assert s.execute("SELECT mapContains(map('a', 1), 'a'), "
                         "mapContains(map('a', 1), 'z')").rows() == [(1, 0)]
        assert s.execute("SELECT length(map('a', 1, 'b', 2))").scalar() == 2
        assert s.execute("SELECT mapFromArrays(['x', 'y'], [10, 20])['y']"
                         ).scalar() == 20

    def test_map_per_row(self):
        s = ch.connect()
        got = s.execute("SELECT map(number, number + 1)[number] "
                        "FROM numbers(3)").rows()
        assert got == [(1,), (2,), (3,)]

    def test_map_type_name(self):
        s = ch.connect()
        assert s.execute("SELECT toTypeName(map('a', 1))").scalar() \
            == "Map(String, UInt8)"


class TestLiteralTyping:
    """Smallest-fitting literal types + NumberTraits arithmetic widening
    (reference: src/DataTypes/FieldToDataType.cpp, base arithmetic traits)."""

    def test_literal_types(self):
        s = ch.connect()
        assert s.execute(
            "SELECT toTypeName(1), toTypeName(-1), toTypeName(300), "
            "toTypeName(70000), toTypeName(5000000000)").rows() == [
                ("UInt8", "Int8", "UInt16", "UInt32", "UInt64")]

    def test_arith_widening(self):
        s = ch.connect()
        assert s.execute("SELECT toTypeName(1 + 1), toTypeName(1 - 2), "
                         "toTypeName(200 * 200)").rows() == [
                             ("UInt16", "Int16", "UInt16")]
        # widened results do not wrap at the operand width
        assert s.execute("SELECT 200 + 200, 100 - 200, 200 * 200").rows() \
            == [(400, -100, 40000)]

    def test_uint64_arith_stays_integral(self):
        s = ch.connect()
        assert s.execute("SELECT toTypeName(number * 2) FROM numbers(1)"
                         ).scalar() == "UInt64"
        assert s.execute("SELECT sum(number * 2) FROM numbers(10)"
                         ).scalar() == 90


class TestRecursiveCTE:
    """WITH RECURSIVE: host-side fixpoint over compiled steps
    (exec/recursive.py; reference ReadFromRecursiveCTEStep)."""

    def test_sequence(self):
        s = ch.connect()
        r = s.execute("WITH RECURSIVE t AS (SELECT 1 AS n UNION ALL "
                      "SELECT n+1 FROM t WHERE n < 5) "
                      "SELECT * FROM t ORDER BY n")
        assert r.rows() == [(1,), (2,), (3,), (4,), (5,)]

    def test_fibonacci(self):
        s = ch.connect()
        r = s.execute("WITH RECURSIVE f AS (SELECT 0 AS i, 0 AS a, 1 AS b "
                      "UNION ALL SELECT i+1, b, a+b FROM f WHERE i < 10) "
                      "SELECT max(b) FROM f")
        assert r.rows() == [(89,)]

    def test_bare_union_is_distinct(self):
        s = ch.connect()
        r = s.execute("WITH RECURSIVE t AS (SELECT 1 AS n UNION "
                      "SELECT 1 FROM t) SELECT count() FROM t")
        assert r.rows() == [(1,)]

    def test_tree_with_array_path(self):
        s = ch.connect()
        s.execute("CREATE TABLE rc_tree (id UInt64, link Nullable(UInt64)) "
                  "ENGINE = Memory")
        s.execute("INSERT INTO rc_tree VALUES (0, NULL), (1, 0), (2, 0), "
                  "(3, 1)")
        r = s.execute(
            "WITH RECURSIVE st AS ("
            "SELECT id, link, [t.id] AS path FROM rc_tree t WHERE t.id = 0 "
            "UNION ALL SELECT t.id, t.link, arrayConcat(path, [t.id]) "
            "FROM rc_tree t, st WHERE t.link = st.id) "
            "SELECT id, path FROM st ORDER BY id")
        assert r.rows() == [(0, [0]), (1, [0, 1]), (2, [0, 2]),
                            (3, [0, 1, 3])]

    def test_nested_in_subquery(self):
        s = ch.connect()
        r = s.execute("SELECT sum(n) FROM (WITH RECURSIVE q AS "
                      "(SELECT 1 AS n UNION ALL SELECT n+1 FROM q "
                      "WHERE n < 4) SELECT * FROM q)")
        assert r.rows() == [(10,)]

    def test_scratch_tables_cleaned_up(self):
        s = ch.connect()
        s.execute("WITH RECURSIVE t AS (SELECT 1 AS n UNION ALL "
                  "SELECT n+1 FROM t WHERE n < 3) SELECT * FROM t")
        names = [r[0] for r in s.execute("SHOW TABLES").rows()]
        assert not any(str(n).startswith("__rcte") for n in names)


class TestArrayThroughJoin:
    """Array columns keep their lengths when gathered from a join build
    side (regression: recursive path accumulation through CROSS JOIN)."""

    def test_build_side_array(self):
        s = ch.connect()
        s.execute("CREATE TABLE aj_l (k UInt64) ENGINE = Memory")
        s.execute("INSERT INTO aj_l VALUES (1), (2)")
        s.execute("CREATE TABLE aj_r (k UInt64, a Array(UInt64)) "
                  "ENGINE = Memory")
        s.execute("INSERT INTO aj_r VALUES (1, [10]), (2, [20, 21])")
        r = s.execute("SELECT aj_l.k, a FROM aj_l INNER JOIN aj_r "
                      "ON aj_l.k = aj_r.k ORDER BY aj_l.k")
        assert r.rows() == [(1, [10]), (2, [20, 21])]
