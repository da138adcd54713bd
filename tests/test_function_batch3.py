"""Third scalar-function batch (exprs/functions_ext2.py): block/running
functions, bit-exact hash families, geo, string search, date names, misc
introspection — plus quorum-insert replication semantics."""
import pytest

import clickhouse_tpu as ch


@pytest.fixture(scope="module")
def s():
    sess = ch.connect()
    sess.execute("CREATE TABLE seq (n Int64, s String)")
    sess.execute("INSERT INTO seq VALUES (10,'a'), (13,'bb'), (11,'a'), "
                 "(20,'ccc')")
    return sess


class TestHashesBitExact:
    """Golden values from the reference's own docs/builds."""

    def test_xxhash(self, s):
        r = s.execute("SELECT xxHash32('Hello, world!'), "
                      "xxHash64('')").rows()
        assert r == [(834093149, 17241709254077376921)]

    def test_xxhash64_abc(self, s):
        # xxHash64('abc') seed 0 == 0x44BC2CF5AD770999
        r = s.execute("SELECT xxHash64('abc')").rows()
        assert r == [(0x44BC2CF5AD770999,)]

    def test_murmur2(self, s):
        # MurmurHash64A('abc') seed 0 (verified against Appleby's C impl)
        r = s.execute("SELECT murmurHash2_64('abc'), "
                      "murmurHash2_32('abc')").rows()
        assert r[0][0] == 11297775770902552315
        assert isinstance(r[0][1], int)

    def test_murmur3_32(self, s):
        # MurmurHash3_x86_32('hello') seed 0 == 0x248BFA47
        r = s.execute("SELECT murmurHash3_32('hello')").rows()
        assert r == [(0x248BFA47,)]

    def test_murmur3_64(self, s):
        # low half of MurmurHash3_x64_128('hello') seed 0
        r = s.execute("SELECT murmurHash3_64('hello')").rows()
        assert r == [(0xCBD8A7B341BD9B02,)]

    def test_hive_hash(self, s):
        r = s.execute("SELECT hiveHash('abc'), javaHash('abc')").rows()
        assert r == [(96354, 96354)]

    def test_jump_consistent_hash(self, s):
        # jump hash is deterministic and stable under bucket growth
        r = s.execute("SELECT jumpConsistentHash(42, 57), "
                      "jumpConsistentHash(42, 1)").rows()
        assert r[0][1] == 0
        assert 0 <= r[0][0] < 57
        r2 = s.execute("SELECT jumpConsistentHash(42, 57)").rows()
        assert r2 == r[:1] or r2[0][0] == r[0][0]

    def test_hash_of_int_column(self, s):
        r = s.execute("SELECT count(DISTINCT xxHash64(n)) FROM seq").rows()
        assert r == [(4,)]


class TestBlockRowFunctions:
    def test_block_size(self, s):
        assert s.execute("SELECT blockSize() FROM seq LIMIT 1").rows() \
            == [(4,)]

    def test_row_number(self, s):
        r = s.execute("SELECT rowNumberInAllBlocks() FROM seq").rows()
        assert sorted(x[0] for x in r) == [0, 1, 2, 3]

    def test_neighbor(self, s):
        # block order is only deterministic via a pre-sorted subquery
        # (the reference documents the same caveat for neighbor())
        r = s.execute("SELECT neighbor(n, 1), neighbor(n, -2, 99) "
                      "FROM (SELECT n FROM seq ORDER BY n)").rows()
        ns = [10, 11, 13, 20]
        assert [x[0] for x in r] == ns[1:] + [0]
        assert [x[1] for x in r] == [99, 99] + ns[:2]

    def test_running_difference(self, s):
        r = s.execute("SELECT runningDifference(n) FROM "
                      "(SELECT n FROM seq ORDER BY n)").rows()
        assert [x[0] for x in r] == [0, 1, 2, 7]


class TestGeo:
    def test_geohash(self, s):
        r = s.execute("SELECT geohashEncode(-5.60302734375, "
                      "42.593994140625, 0)").rows()
        assert r == [("ezs42d000000",)]

    def test_great_circle(self, s):
        r = s.execute("SELECT greatCircleDistance(-56.36, -33.8, "
                      "2.35, 48.85)").rows()
        assert abs(r[0][0] - 10869730.0) < 5e5   # ~10870 km

    def test_morton(self, s):
        # interleave of (1,2): x bit0 -> out bit0, y bit1 -> out bit3
        assert s.execute("SELECT mortonEncode(1, 2)").rows() == [(9,)]


class TestStringSearch:
    def test_regexp_extract(self, s):
        r = s.execute("SELECT regexpExtract('100-200', "
                      "'(\\\\d+)-(\\\\d+)', 2), "
                      "regexpExtract('100-200', '(\\\\d+)-(\\\\d+)')").rows()
        assert r == [("200", "100")]

    def test_count_matches(self, s):
        assert s.execute(
            "SELECT countMatches('foo.bar.qux', '\\\\.')").rows() == [(2,)]

    def test_has_token(self, s):
        r = s.execute("SELECT hasToken('Hello World, foo', 'foo'), "
                      "hasToken('foobar', 'foo'), "
                      "hasTokenCaseInsensitive('FOO bar', 'foo')").rows()
        assert r == [(1, 0, 1)]

    def test_multi_search_first_position(self, s):
        r = s.execute("SELECT multiSearchFirstPosition('Hello World', "
                      "['llo', 'Wor', 'zzz'])").rows()
        assert r == [(3,)]

    def test_normalize_query(self, s):
        r = s.execute("SELECT normalizeQuery('SELECT 25 FROM t WHERE "
                      "x = ''hi''')").rows()
        assert r == [("SELECT ? FROM t WHERE x = ?",)]
        h = s.execute("SELECT normalizedQueryHash('SELECT 25'), "
                      "normalizedQueryHash('SELECT 42')").rows()
        assert h[0][0] == h[0][1]   # same shape -> same hash

    def test_jaccard(self, s):
        r = s.execute("SELECT stringJaccardIndex('abc', 'abd')").rows()
        assert abs(r[0][0] - 0.5) < 1e-9


class TestDates:
    def test_to_yearweek(self, s):
        r = s.execute("SELECT toYearWeek(toDate('2016-12-27')), "
                      "toYearWeek(toDate('2016-12-27'), 1)").rows()
        assert r == [(201652, 201652)]

    def test_date_name(self, s):
        r = s.execute("SELECT dateName('year', toDate('2021-04-14')), "
                      "dateName('month', toDate('2021-04-14')), "
                      "dateName('weekday', toDate('2021-04-14'))").rows()
        assert r == [("2021", "April", "Wednesday")]

    def test_modified_julian_day(self, s):
        r = s.execute("SELECT toModifiedJulianDay('2020-01-01'), "
                      "fromModifiedJulianDay(58849)").rows()
        assert r == [(58849, "2020-01-01")]


class TestMisc:
    def test_width_bucket(self, s):
        r = s.execute("SELECT widthBucket(10.15, 0, 20, 4), "
                      "widthBucket(-1, 0, 20, 4), "
                      "widthBucket(30, 0, 20, 4)").rows()
        assert r == [(3, 0, 5)]

    def test_index_hint(self, s):
        assert s.execute("SELECT indexHint(n > 5) FROM seq LIMIT 1") \
            .rows() == [(1,)]

    def test_byte_size(self, s):
        assert s.execute("SELECT byteSize('abc')").rows() == [(12,)]

    def test_to_decimal_string(self, s):
        assert s.execute("SELECT toDecimalString(3.14159, 2)").rows() \
            == [("3.14",)]

    def test_column_type_name(self, s):
        r = s.execute("SELECT toColumnTypeName(n) FROM seq LIMIT 1").rows()
        assert r == [("Int64",)]


class TestQuorumInserts:
    """insert_quorum + SYSTEM STOP FETCHES semantics
    (ref: src/Storages/MergeTree/ReplicatedMergeTreeSink.cpp)."""

    def test_quorum_unreachable_fails_and_rolls_back(self):
        sess = ch.connect()
        sess.execute("CREATE TABLE r1 (x UInt32) ENGINE "
                     "ReplicatedMergeTree('/q/t1', 'a') ORDER BY x")
        sess.execute("CREATE TABLE r2 (x UInt32) ENGINE "
                     "ReplicatedMergeTree('/q/t1', 'b') ORDER BY x")
        sess.execute("INSERT INTO r1 VALUES (1)")
        sess.execute("SYSTEM STOP FETCHES r1")
        sess.execute("SET insert_quorum = 2")
        sess.execute("SET insert_quorum_timeout = 0")
        with pytest.raises(Exception, match="UNKNOWN_STATUS_OF_INSERT"):
            sess.execute("INSERT INTO r2 VALUES (4)")
        sess.execute("SET insert_quorum = 0")
        assert sess.execute("SELECT x FROM r2 ORDER BY x").rows() == [(1,)]
        sess.execute("SYSTEM START FETCHES r1")
        assert sess.execute("SELECT x FROM r1 ORDER BY x").rows() == [(1,)]

    def test_quorum_satisfied_succeeds(self):
        sess = ch.connect()
        sess.execute("CREATE TABLE p1 (x UInt32) ENGINE "
                     "ReplicatedMergeTree('/q/t2', 'a') ORDER BY x")
        sess.execute("CREATE TABLE p2 (x UInt32) ENGINE "
                     "ReplicatedMergeTree('/q/t2', 'b') ORDER BY x")
        sess.execute("SET insert_quorum = 2")
        sess.execute("INSERT INTO p1 VALUES (7)")
        assert sess.execute("SELECT x FROM p2").rows() == [(7,)]
        # retried insert is deduplicated, not duplicated
        sess.execute("INSERT INTO p1 VALUES (7)")
        assert sess.execute("SELECT count() FROM p2").rows() == [(1,)]


class TestSequenceAggregates:
    """windowFunnel / sequenceMatch / retention / rankCorr / boundingRatio
    (exprs/agg_ext2.py)."""

    @pytest.fixture(scope="class")
    def ev(self):
        sess = ch.connect()
        sess.execute("CREATE TABLE ev (uid UInt32, t UInt32, e String)")
        sess.execute(
            "INSERT INTO ev VALUES (1,1,'view'),(1,2,'cart'),(1,3,'buy'),"
            "(2,1,'view'),(2,9,'cart'),(3,5,'cart'),(1,10,'view')")
        sess.execute("CREATE TABLE xy (g UInt8, x Float64, y Float64)")
        sess.execute("INSERT INTO xy VALUES (0,1,2),(0,2,4),(0,3,6),"
                     "(1,1,5),(1,2,3),(1,3,1)")
        return sess

    def test_window_funnel(self, ev):
        r = ev.execute("SELECT uid, windowFunnel(5)(t, e='view', e='cart', "
                       "e='buy') FROM ev GROUP BY uid ORDER BY uid").rows()
        assert r == [(1, 3), (2, 1), (3, 0)]

    def test_window_funnel_wide_window(self, ev):
        r = ev.execute("SELECT uid, windowFunnel(100)(t, e='view', "
                       "e='cart') FROM ev GROUP BY uid ORDER BY uid").rows()
        assert r == [(1, 2), (2, 2), (3, 0)]

    def test_sequence_match(self, ev):
        r = ev.execute("SELECT uid, sequenceMatch('(?1)(?2)')(t, e='view', "
                       "e='cart') FROM ev GROUP BY uid ORDER BY uid").rows()
        assert r == [(1, 1), (2, 1), (3, 0)]

    def test_sequence_match_reorder(self, ev):
        # pattern (?2)(?1): cart then view — only uid 1 (view again at t=10)
        r = ev.execute("SELECT uid, sequenceMatch('(?2)(?1)')(t, e='view', "
                       "e='cart') FROM ev GROUP BY uid ORDER BY uid").rows()
        assert r == [(1, 1), (2, 0), (3, 0)]

    def test_retention(self, ev):
        r = ev.execute("SELECT uid, retention(e='view', e='cart', e='buy') "
                       "FROM ev GROUP BY uid ORDER BY uid").rows()
        assert r == [(1, [1, 1, 1]), (2, [1, 1, 0]), (3, [0, 0, 0])]

    def test_rank_corr(self, ev):
        r = ev.execute("SELECT g, rankCorr(x, y) FROM xy GROUP BY g "
                       "ORDER BY g").rows()
        assert r == [(0, 1.0), (1, -1.0)]

    def test_rank_corr_ties(self, ev):
        sess = ev
        sess.execute("CREATE TABLE tie (x Float64, y Float64)")
        sess.execute("INSERT INTO tie VALUES (1,1),(1,2),(2,3),(3,4)")
        r = sess.execute("SELECT rankCorr(x, y) FROM tie").rows()
        # average-rank Spearman with one tie pair in x
        assert abs(r[0][0] - 0.9486832980505138) < 1e-9

    def test_bounding_ratio(self, ev):
        r = ev.execute("SELECT g, boundingRatio(x, y) FROM xy GROUP BY g "
                       "ORDER BY g").rows()
        assert r == [(0, 2.0), (1, -2.0)]
