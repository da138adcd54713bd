"""Variant / Dynamic types (VERDICT r04 item 8): discriminator + per-type
subcolumns via the shredding machinery (reference:
src/Columns/ColumnVariant.h, ColumnDynamic.h)."""
import numpy as np
import pytest

import clickhouse_tpu as ch


@pytest.fixture(scope="module")
def s():
    sess = ch.connect()
    sess.execute("CREATE TABLE vt (id Int64, v Variant(Int64, String))")
    sess.execute("INSERT INTO vt VALUES (1, 42), (2, 'hello'), (3, NULL), "
                 "(4, 42), (5, '42')")
    return sess


def test_values_round_trip_typed(s):
    assert s.execute("SELECT id, v FROM vt ORDER BY id").rows() == [
        (1, 42), (2, "hello"), (3, None), (4, 42), (5, "42")]


def test_variant_type_discriminator(s):
    assert s.execute(
        "SELECT id, variantType(v) FROM vt ORDER BY id").rows() == [
        (1, "Int64"), (2, "String"), (3, "None"), (4, "Int64"),
        (5, "String")]


def test_variant_element(s):
    rows = s.execute(
        "SELECT variantElement(v, 'Int64'), variantElement(v, 'String') "
        "FROM vt ORDER BY id").rows()
    assert rows == [(42, None), (None, "hello"), (None, None),
                    (42, None), (None, "42")]


def test_variant_element_absent_type_is_null(s):
    rows = s.execute(
        "SELECT variantElement(v, 'Float64') FROM vt ORDER BY id").rows()
    assert all(r == (None,) for r in rows)


def test_group_by_on_device_keeps_variants_distinct(s):
    # int 42 and string '42' are DIFFERENT variants
    rows = s.execute("SELECT v, count() FROM vt GROUP BY v "
                     "ORDER BY count() DESC").rows()
    assert (42, 2) in rows and ("42", 1) in rows and ("hello", 1) in rows


def test_group_by_large_on_device(s):
    s.execute("CREATE TABLE vbig (v Variant(Int64, String))")
    vals = np.empty(30_000, object)
    vals[0::3] = [int(i) % 7 for i in range(0, 30_000, 3)]
    vals[1::3] = [f"s{i % 5}" for i in range(1, 30_000, 3)]
    vals[2::3] = None
    s.insert_pydict("vbig", {"v": vals})
    rows = s.execute("SELECT variantType(v) AS t, count() FROM vbig "
                     "GROUP BY t ORDER BY t").rows()
    assert rows == [("Int64", 10_000), ("None", 10_000),
                    ("String", 10_000)]


def test_dynamic_discovers_types(s):
    s.execute("CREATE TABLE dyn (d Dynamic)")
    s.execute("INSERT INTO dyn VALUES (1), (2.5), ('x'), ([1,2])")
    rows = s.execute("SELECT d, dynamicType(d) FROM dyn").rows()
    assert rows == [(1, "Int64"), (2.5, "Float64"), ("x", "String"),
                    ([1, 2], "Array(Int64)")]


def test_mutation_round_trip(s):
    s.execute("CREATE TABLE vm (id Int64, v Variant(Int64, String))")
    s.execute("INSERT INTO vm VALUES (1, 10), (2, 'a'), (3, '10')")
    s.execute("ALTER TABLE vm DELETE WHERE id = 1")
    assert s.execute("SELECT v, variantType(v) FROM vm "
                     "ORDER BY id").rows() == [
        ("a", "String"), ("10", "String")]
