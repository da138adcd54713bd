"""JSON column type with shredded device subcolumns (core/dtypes.py JSON +
storage/table.py json_shred — the ColumnObject/Dynamic analog, ref
src/Columns/ColumnObject.h, src/DataTypes/DataTypeObject.cpp): discovered
scalar paths become ordinary typed device columns; `j.path` lowers to a
plain column read; the full document stays as canonical dictionary-encoded
text (whole-doc equality/GROUP BY/printing)."""
import numpy as np
import pytest

import clickhouse_tpu as ch


@pytest.fixture(scope="module")
def session():
    s = ch.connect()
    s.execute("CREATE TABLE ev (id Int64, j JSON)")
    s.insert_pydict("ev", {
        "id": np.arange(4, dtype=np.int64),
        "j": np.array([
            {"user": "alice", "clicks": 3, "geo": {"cc": "US"}},
            {"user": "bob", "clicks": 5, "geo": {"cc": "DE"},
             "extra": [1, 2]},
            {"user": "alice", "clicks": 2, "geo": {"cc": "US"},
             "score": 1.5},
            None,
        ], object)})
    s.execute('INSERT INTO ev VALUES (9, '
              '\'{"user":"carol","clicks":7,"geo":{"cc":"US"}}\')')
    return s


def test_typed_path_group_by_on_device(session):
    assert session.execute(
        "SELECT j.user, sum(j.clicks) FROM ev GROUP BY j.user "
        "ORDER BY j.user").rows() == [
        ("alice", 5), ("bob", 5), ("carol", 7), (None, 0)]


def test_nested_path_access(session):
    assert session.execute(
        "SELECT j.geo.cc, count() FROM ev WHERE j.geo.cc IS NOT NULL "
        "GROUP BY j.geo.cc ORDER BY j.geo.cc").rows() == [
        ("DE", 1), ("US", 3)]


def test_missing_paths_are_null(session):
    assert session.execute(
        "SELECT count() FROM ev WHERE j.score IS NULL").rows() == [(4,)]
    assert session.execute(
        "SELECT sum(j.score) FROM ev").rows() == [(1.5,)]


def test_filter_on_typed_path(session):
    assert session.execute(
        "SELECT count() FROM ev WHERE j.clicks > 2").rows() == [(3,)]


def test_whole_document_prints_canonical(session):
    rows = session.execute(
        "SELECT j FROM ev WHERE j.user = 'bob'").rows()
    assert rows == [('{"clicks":5,"extra":[1,2],"geo":{"cc":"DE"},'
                     '"user":"bob"}',)]


def test_json_strings_and_dicts_unify(session):
    # same doc inserted as dict and as string dictionary-encode equally
    s = ch.connect()
    s.execute("CREATE TABLE u (j JSON)")
    s.insert_pydict("u", {"j": np.array([{"a": 1}], object)})
    s.execute("INSERT INTO u VALUES ('{ \"a\" : 1 }')")
    assert s.execute("SELECT count(DISTINCT j) FROM u").rows() == [(1,)]


def test_bad_json_rejected():
    s = ch.connect()
    s.execute("CREATE TABLE b (j JSON)")
    with pytest.raises(Exception, match="Cannot parse JSON"):
        s.execute("INSERT INTO b VALUES ('{nope')")


def test_mixed_type_path_widens_to_string():
    s = ch.connect()
    s.execute("CREATE TABLE m (j JSON)")
    s.insert_pydict("m", {"j": np.array(
        [{"v": 1}, {"v": "x"}, {"v": 2.5}], object)})
    rows = s.execute("SELECT j.v FROM m ORDER BY j.v").rows()
    assert rows == [("1",), ("2.5",), ("x",)]


def test_object_json_spelling_and_describe():
    s = ch.connect()
    s.execute("CREATE TABLE o (j Object('json'))")
    s.insert_pydict("o", {"j": np.array([{"k": 7}], object)})
    assert s.execute("SELECT j.k FROM o").rows() == [(7,)]


def test_tuple_postfix_element_access(session):
    assert session.execute(
        "SELECT tuple(1,'a').2, tuple(1, tuple(2.5,'x')).2.2").rows() \
        == [("a", "x")]
