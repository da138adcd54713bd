"""Scalar batches 5-6 + aggregate batch 4 (exprs/functions_ext4.py,
functions_ext5.py, agg_ext4.py): bitmaps, tuple/map arithmetic, vector
norms, arrayFold/AUC/Jaccard, JSON utilities, pointInPolygon, date
spellings, KS test / ANOVA, topKWeighted."""
import numpy as np
import pytest

import clickhouse_tpu as ch


@pytest.fixture(scope="module")
def s():
    return ch.connect()


CASES = [
    # bitmaps (FunctionsBitmap.h semantics over sorted-set arrays)
    ("SELECT bitmapToArray(bitmapAnd(bitmapBuild([1,2,3,4]), "
     "bitmapBuild([3,4,5])))", [([3, 4],)]),
    ("SELECT bitmapToArray(bitmapXor(bitmapBuild([1,2,3]), "
     "bitmapBuild([2,3,4])))", [([1, 4],)]),
    ("SELECT bitmapToArray(bitmapAndnot(bitmapBuild([1,2,3]), "
     "bitmapBuild([2])))", [([1, 3],)]),
    ("SELECT bitmapCardinality(bitmapBuild([1,2,2,3])), "
     "bitmapOrCardinality(bitmapBuild([1]), bitmapBuild([2]))",
     [(3, 2)]),
    ("SELECT bitmapMin(bitmapBuild([5,2,9])), "
     "bitmapMax(bitmapBuild([5,2,9]))", [(2, 9)]),
    ("SELECT bitmapToArray(bitmapSubsetInRange(bitmapBuild([1,5,7,9]), "
     "5, 9))", [([5, 7],)]),
    ("SELECT bitmapContains(bitmapBuild([1,5]), 5), "
     "bitmapHasAny(bitmapBuild([1]), bitmapBuild([9]))", [(1, 0)]),
    # tuple / vector arithmetic
    ("SELECT tuplePlus((1,2),(10,20))", [((11.0, 22.0),)]),
    ("SELECT tupleHammingDistance((1,2,3),(1,9,3))", [(1,)]),
    ("SELECT L2Norm([3.0,4.0]), L1Norm([1,-2,3]), LinfNorm([1,-5])",
     [(5.0, 6.0, 5.0)]),
    ("SELECT normalizeL2([3.0,4.0])", [([0.6, 0.8],)]),
    # array similarity + fold
    ("SELECT arrayJaccardIndex([1,2,3],[2,3,4])", [(0.5,)]),
    ("SELECT arrayAUC([0.1,0.4,0.35,0.8],[0,0,1,1])", [(0.75,)]),
    ("SELECT arrayFold((acc, x) -> acc * 2 + x, [1,0,1,1], toInt64(0))",
     [(11,)]),
    # JSON utilities
    ("SELECT isValidJSON('{\"a\":1}'), isValidJSON('nope')", [(1, 0)]),
    ("SELECT JSONType('[1,2]'), JSONType('{\"a\":1}')",
     [("Array", "Object")]),
    ("SELECT visitParamExtractInt('{\"a\":7}','a')", [(7,)]),
    # geo
    ("SELECT pointInPolygon((1.0,1.0),"
     "[(0.0,0.0),(4.0,0.0),(4.0,4.0),(0.0,4.0)])", [(1,)]),
    ("SELECT pointInPolygon((9.0,1.0),"
     "[(0.0,0.0),(4.0,0.0),(4.0,4.0),(0.0,4.0)])", [(0,)]),
    # dates
    ("SELECT toRelativeDayNum(toDate('1970-01-10'))", [(9,)]),
    ("SELECT toLastDayOfWeek(toDate('2023-05-17'))", None),
    ("SELECT toDaysSinceYearZero(toDate('1970-01-01'))", [(719528,)]),
    ("SELECT YYYYMMDDToDate(20230115)", None),
    # strings
    ("SELECT substringIndex('a.b.c', '.', 2), "
     "substringIndex('a.b.c', '.', -1)", [("a.b", "c")]),
    ("SELECT base32Decode(base32Encode('hello'))", [("hello",)]),
    ("SELECT splitByRegexp('[,;]', 'a,b;c')", [(["a", "b", "c"],)]),
    ("SELECT instr('hello', 'll'), isASCII('abc'), isASCII('héllo')",
     [(3, 1, 0)]),
    ("SELECT multiSearchFirstIndex('hello world', ['xyz', 'world'])",
     [(2,)]),
    ("SELECT extractAllGroupsVertical('a=1, b=2', '(\\\\w)=(\\\\d)')",
     [(["a", "1", "b", "2"],)]),
    # misc
    ("SELECT CRC32('hello')", [(907060870,)]),
    ("SELECT hilbertDecode(hilbertEncode(5, 9))", [((5, 9),)]),
    ("SELECT bar(5, 0, 10, 10)", [("█████",)]),
    ("SELECT toDateOrNull('bogus')", [(None,)]),
    ("SELECT parseDateTime('2023-01-02 03:04:05', '%Y-%m-%d %H:%i:%s')",
     None),
    ("SELECT timeDiff(toDateTime('2023-01-01 00:00:00'), "
     "toDateTime('2023-01-01 00:01:40'))", [(100,)]),
    ("SELECT mapUpdate(map('a',1,'b',2), map('b',9))['b']", [(9,)]),
    ("SELECT mapAdd(map('x',1), map('x',2,'y',5))['x']", [(3.0,)]),
]


@pytest.mark.parametrize("sql,expected", CASES,
                         ids=[c[0][:48] for c in CASES])
def test_case(s, sql, expected):
    rows = s.execute(sql).rows()
    if expected is not None:
        assert rows == expected


def test_new_aggregates(s):
    s.execute("CREATE TABLE ab4 (g Int64, x Float64, w Int64, ts Int64, "
              "cat Int64, si Int64)")
    rng = np.random.default_rng(5)
    n = 3000
    s.insert_pydict("ab4", {
        "g": rng.integers(0, 3, n), "x": rng.normal(10, 2, n),
        "w": rng.integers(1, 5, n), "ts": rng.permutation(n),
        "cat": rng.integers(0, 4, n), "si": rng.integers(0, 2, n)})
    assert s.execute("SELECT length(topKWeighted(3)(g, w)) "
                     "FROM ab4").rows() == [(3,)]
    (d, p), = s.execute(
        "SELECT kolmogorovSmirnovTest(x, si) FROM ab4").rows()[0]
    assert 0 <= d <= 1 and 0 <= p <= 1
    (f, pa), = s.execute("SELECT anova(x, cat) FROM ab4").rows()[0]
    assert f >= 0 and 0 <= pa <= 1
    assert s.execute("SELECT nothing(x) FROM ab4").rows() == [(None,)]
    with pytest.raises(Exception, match="aggThrow"):
        s.execute("SELECT aggThrow(1)(x) FROM ab4")
    rows = s.execute("SELECT g, deltaSumTimestamp(x, ts) FROM ab4 "
                     "GROUP BY g ORDER BY g").rows()
    assert len(rows) == 3 and all(v > 0 for _, v in rows)


def test_counts_meet_round4_targets(s):
    from clickhouse_tpu.exprs.aggregates import AGGREGATES
    from clickhouse_tpu.exprs.functions import FUNCTIONS
    assert len(FUNCTIONS) >= 700
    assert len(AGGREGATES) >= 150
