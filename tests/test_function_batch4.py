"""Scalar batch 4 (exprs/functions_ext3.py): numeric utilities, RNG
distributions, string similarity/encoding, IP OrNull parsers, array
motion, LowCardinality introspection."""
import numpy as np
import pytest

import clickhouse_tpu as ch


@pytest.fixture(scope="module")
def s():
    return ch.connect()


def q1(s, sql):
    return s.execute(sql).rows()[0]


def test_clamp_and_count_digits(s):
    assert q1(s, "SELECT clamp(5, 1, 3), clamp(-2, 1, 3)") == (3.0, 1.0)
    assert q1(s, "SELECT countDigits(0), countDigits(12345), "
                 "countDigits(-999)") == (1, 5, 3)
    # exact at the power-of-ten boundaries float log10 gets wrong
    assert q1(s, "SELECT countDigits(999999999999999999), "
                 "countDigits(1000000000000000000)") == (18, 19)


def test_base58_roundtrip_and_unbin(s):
    r = q1(s, "SELECT base58Encode('Hello World!'), "
              "base58Decode(base58Encode('Hello World!'))")
    assert r == ("2NEpo7TZRRrLZSi2U", "Hello World!")
    assert q1(s, "SELECT unbin('0100100001101001')") == ("Hi",)


def test_url_form_and_time_delta(s):
    assert q1(s, "SELECT encodeURLFormComponent('a b&c')") == ("a+b%26c",)
    assert q1(s, "SELECT decodeURLFormComponent('a+b%26c')") == ("a b&c",)
    assert q1(s, "SELECT parseTimeDelta('1 hour 30 minutes')") == (5400.0,)
    assert q1(s, "SELECT parseTimeDelta('2d')") == (172800.0,)


def test_string_similarity(s):
    # hand-checked classics
    assert q1(s, "SELECT damerauLevenshteinDistance('abdc', 'abcd')") \
        == (1,)
    jw = q1(s, "SELECT jaroWinklerSimilarity('MARTHA', 'MARHTA')")[0]
    assert abs(jw - 0.9611111) < 1e-6
    assert q1(s, "SELECT ngramDistance('abc', 'abc'), "
                 "ngramSearch('hello world', 'hello')") == (0.0, 1.0)


def test_concat_with_separator(s):
    assert q1(s, "SELECT concatWithSeparator('-', 'a', 'b', 'c')") \
        == ("a-b-c",)
    # column argument through the LUT path
    s.execute("CREATE TABLE IF NOT EXISTS cw (x String)")
    s.execute("TRUNCATE TABLE cw")
    s.insert_pydict("cw", {"x": np.asarray(["p", "q"], object)})
    r = s.execute("SELECT concatWithSeparator('/', x, 'z') FROM cw "
                  "ORDER BY x").rows()
    assert r == [("p/z",), ("q/z",)]


def test_ip_or_null(s):
    r = s.execute("SELECT toIPv4OrNull('1.2.3.4'), toIPv4OrNull('nope'), "
                  "toIPv6OrNull('::1'), toIPv6OrNull('bad')").rows()[0]
    assert r[0] == "1.2.3.4" and r[1] is None
    assert r[2] is not None and r[3] is None


def test_array_motion(s):
    assert q1(s, "SELECT arrayRotateLeft([1,2,3,4], 1)") == ([2, 3, 4, 1],)
    assert q1(s, "SELECT arrayRotateRight([1,2,3,4], 1)") == ([4, 1, 2, 3],)
    assert q1(s, "SELECT arrayShiftLeft([1,2,3,4], 1)") == ([2, 3, 4, 0],)
    assert q1(s, "SELECT arrayShiftRight([1,2,3,4], 1, 9)") \
        == ([9, 1, 2, 3],)
    shuffled = q1(s, "SELECT arrayShuffle([1,2,3,4,5])")[0]
    assert sorted(shuffled) == [1, 2, 3, 4, 5]
    assert q1(s, "SELECT arrayPartialSort(2, [3,1,2])")[0][:2] == [1, 2]


def test_rng_distributions(s):
    r = s.execute(
        "SELECT randCanonical(), randUniform(5, 6), randNormal(10, 0), "
        "randBernoulli(1.0), randExponential(2.0), randPoisson(0.0) "
        "FROM numbers(100)").rows()
    for can, uni, nrm, ber, expd, poi in r:
        assert 0.0 <= can < 1.0
        assert 5.0 <= uni < 6.0
        assert abs(nrm - 10.0) < 1e-9       # sigma 0 -> mean
        assert ber == 1
        assert expd >= 0.0
        assert poi == 0                     # lambda 0 -> always 0
    # non-constant across rows
    assert len({row[0] for row in r}) > 90


def test_point_in_ellipses(s):
    assert q1(s, "SELECT pointInEllipses(1.0, 1.0, 0., 0., 2., 2.), "
                 "pointInEllipses(5.0, 5.0, 0., 0., 2., 2.), "
                 "pointInEllipses(5.0, 5.0, 0., 0., 2., 2., 5., 5., 1., 1.)"
              ) == (1, 0, 1)


def test_low_cardinality_introspection(s):
    s.execute("CREATE TABLE IF NOT EXISTS lc (x String)")
    s.execute("TRUNCATE TABLE lc")
    s.insert_pydict("lc", {"x": np.asarray(["b", "a", "b"], object)})
    r = s.execute("SELECT lowCardinalityKeys(x), "
                  "lowCardinalityIndices(x) >= 0 FROM lc").rows()
    assert [x for x, _ in r] == ["b", "a", "b"]
