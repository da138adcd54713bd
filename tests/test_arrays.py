"""Array(T) support: literals, element access, reductions, arrayJoin."""
import numpy as np
import pytest

import clickhouse_tpu as ch


@pytest.fixture(scope="module")
def session():
    s = ch.connect()
    s.execute("CREATE TABLE arr (id Int64, tags Array(String), "
              "nums Array(Int64))")
    s.insert_pydict("arr", {
        "id": np.arange(4, dtype=np.int64),
        "tags": np.asarray([["a", "b"], ["b"], [], ["c", "a", "b"]], object),
        "nums": np.asarray([[1, 2, 3], [10], [], [4, 5]], object),
    })
    return s


class TestArrays:
    def test_array_literal(self, session):
        r = session.execute("SELECT [1, 2, 3] AS a, length([1,2,3]) AS l")
        row = r.rows()[0]
        assert row[0] == [1, 2, 3] and row[1] == 3

    def test_length_empty(self, session):
        r = session.execute("SELECT id, length(nums) FROM arr ORDER BY id")
        assert [row[1] for row in r.rows()] == [3, 1, 0, 2]

    def test_array_element(self, session):
        r = session.execute("SELECT nums[1], nums[-1], nums[10] FROM arr "
                            "ORDER BY id LIMIT 1")
        assert r.rows()[0] == (1, 3, 0)

    def test_element_of_strings(self, session):
        r = session.execute("SELECT tags[1] FROM arr ORDER BY id")
        assert [row[0] for row in r.rows()] == ["a", "b", "", "c"]

    def test_has(self, session):
        r = session.execute("SELECT id FROM arr WHERE has(tags, 'b') "
                            "ORDER BY id")
        assert [row[0] for row in r.rows()] == [0, 1, 3]

    def test_index_of(self, session):
        r = session.execute("SELECT indexOf(nums, 5) FROM arr ORDER BY id")
        assert [row[0] for row in r.rows()] == [0, 0, 0, 2]

    def test_array_reductions(self, session):
        r = session.execute("SELECT arraySum(nums), arrayMin(nums), "
                            "arrayMax(nums) FROM arr ORDER BY id")
        rows = r.rows()
        assert rows[0] == (6, 1, 3)
        assert rows[2] == (0, 0, 0)      # empty array

    def test_array_join(self, session):
        r = session.execute("SELECT id, arrayJoin(nums) AS n FROM arr "
                            "ORDER BY id, n")
        assert r.rows() == [(0, 1), (0, 2), (0, 3), (1, 10), (3, 4), (3, 5)]

    def test_array_join_aggregate(self, session):
        r = session.execute(
            "SELECT arrayJoin(tags) AS t, count() AS c FROM arr "
            "GROUP BY t ORDER BY t")
        assert r.rows() == [("a", 2), ("b", 3), ("c", 1)]

    def test_array_in_where_via_join(self, session):
        r = session.execute(
            "SELECT sum(arrayJoin(nums)) FROM arr WHERE id < 2")
        assert r.scalar() == 16

    def test_roundtrip_materialization(self, session):
        r = session.execute("SELECT tags FROM arr ORDER BY id")
        assert [row[0] for row in r.rows()] == [["a", "b"], ["b"], [],
                                                ["c", "a", "b"]]


class TestHigherOrderBatch2:
    """Round-5 higher-order additions (ref: FunctionArrayMapped family —
    arrayFirst/Last/Sort/Fill/CumSum with lambdas)."""

    def test_first_last(self, session):
        r = session.execute(
            "SELECT arrayFirst(x -> x > 1, [1,2,3]),"
            " arrayLast(x -> x < 3, [1,2,3]),"
            " arrayFirst(x -> x > 9, [1,2,3]),"
            " arrayFirstOrNull(x -> x > 9, [1,2,3]),"
            " arrayLastIndex(x -> x < 3, [1,2,3])")
        assert list(r.rows()) == [(2, 2, 0, None, 2)]

    def test_sort_fill_cumsum(self, session):
        r = session.execute(
            "SELECT arraySort(x -> -x, [1,3,2]),"
            " arrayFill(x -> x != 0, [1,0,0,5,0]),"
            " arrayCumSumNonNegative(x -> x, [1,-5,3])")
        assert list(r.rows()) == [([3, 2, 1], [1, 1, 1, 5, 5], [1, 0, 3])]

    def test_min_max_avg_lambda(self, session):
        r = session.execute(
            "SELECT arrayMax(x -> x*2, [1,3,2]), arrayAvg(x -> x, [1,2,3])")
        assert list(r.rows()) == [(6, 2.0)]

    def test_string_first(self, session):
        r = session.execute(
            "SELECT arrayFirst(s -> s != '', ['', 'a', 'b'])")
        assert list(r.rows()) == [("a",)]
