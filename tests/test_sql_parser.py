"""Parser tests (analog of the reference's parser unit tests)."""
import pytest

from clickhouse_tpu.sql import ast, parse, parse_expression
from clickhouse_tpu.core.errors import ParseError


class TestExpressions:
    def test_precedence(self):
        e = parse_expression("1 + 2 * 3")
        assert isinstance(e, ast.FuncCall) and e.name == "plus"
        assert e.args[1].name == "multiply"

    def test_comparison_desugar(self):
        e = parse_expression("a >= b")
        assert e.name == "greaterOrEquals"

    def test_and_or_chains(self):
        e = parse_expression("a AND b AND c OR d")
        assert e.name == "or"
        assert e.args[0].name == "and"
        assert len(e.args[0].args) == 3

    def test_between(self):
        e = parse_expression("x BETWEEN 1 AND 10")
        assert e.name == "and"

    def test_in_tuple(self):
        e = parse_expression("x IN (1, 2, 3)")
        assert e.name == "in"
        assert isinstance(e.args[1], ast.Tuple_)

    def test_not_in(self):
        e = parse_expression("x NOT IN (1, 2)")
        assert e.name == "notIn"

    def test_case_when(self):
        e = parse_expression("CASE WHEN a THEN 1 WHEN b THEN 2 ELSE 3 END")
        assert e.name == "multiIf"
        assert len(e.args) == 5

    def test_case_operand(self):
        e = parse_expression("CASE x WHEN 1 THEN 'a' ELSE 'b' END")
        assert e.name == "multiIf"
        assert e.args[0].name == "equals"

    def test_cast_forms(self):
        e1 = parse_expression("CAST(x AS Int64)")
        e2 = parse_expression("x :: Int64")
        assert e1.name == "CAST" and e2.name == "CAST"

    def test_string_escapes(self):
        e = parse_expression(r"'it\'s'")
        assert e.value == "it's"

    def test_ternary(self):
        e = parse_expression("a > 1 ? 'x' : 'y'")
        assert e.name == "if"

    def test_is_null(self):
        assert parse_expression("x IS NULL").name == "isNull"
        assert parse_expression("x IS NOT NULL").name == "isNotNull"

    def test_parameterized_aggregate(self):
        e = parse_expression("quantile(0.9)(x)")
        assert e.name == "quantile"
        assert e.params[0].value == 0.9
        assert isinstance(e.args[0], ast.Identifier)

    def test_count_star(self):
        e = parse_expression("count(*)")
        assert isinstance(e.args[0], ast.Star)

    def test_unary_minus_literal(self):
        e = parse_expression("-5")
        assert e.value == -5

    def test_hex_number(self):
        assert parse_expression("0xff").value == 255


class TestSelect:
    def test_minimal(self):
        s = parse("SELECT 1")
        assert isinstance(s, ast.Select)
        assert s.from_ is None

    def test_full_clause_order(self):
        s = parse("""
            SELECT a, sum(b) AS total
            FROM t
            WHERE a > 0
            GROUP BY a
            HAVING total > 10
            ORDER BY total DESC
            LIMIT 5 OFFSET 2
            SETTINGS max_threads = 4
        """)
        assert s.items[1].alias == "total"
        assert s.where is not None
        assert s.group_by and s.having is not None
        assert s.order_by[0].descending
        assert s.limit.value == 5 and s.offset.value == 2
        assert s.settings == {"max_threads": 4}

    def test_joins(self):
        s = parse("SELECT * FROM a INNER JOIN b ON a.x = b.x "
                  "LEFT JOIN c USING (x, y)")
        assert len(s.joins) == 2
        assert s.joins[0].kind == "inner" and s.joins[0].on is not None
        assert s.joins[1].kind == "left" and s.joins[1].using == ["x", "y"]

    def test_global_join(self):
        s = parse("SELECT * FROM a GLOBAL ANY LEFT JOIN b USING x")
        j = s.joins[0]
        assert j.is_global and j.strictness == "any" and j.kind == "left"

    def test_subquery(self):
        s = parse("SELECT x FROM (SELECT 1 AS x) AS sub")
        assert isinstance(s.from_, ast.SubqueryRef)
        assert s.from_.alias == "sub"

    def test_table_function(self):
        s = parse("SELECT * FROM numbers(100)")
        assert isinstance(s.from_, ast.TableFunctionRef)
        assert s.from_.func.name == "numbers"

    def test_cte(self):
        s = parse("WITH top AS (SELECT 1 AS x) SELECT * FROM top")
        assert s.ctes[0].name == "top"
        assert s.ctes[0].query is not None

    def test_scalar_cte(self):
        s = parse("WITH 10 AS n SELECT n + 1")
        assert s.ctes[0].expr is not None

    def test_union_all(self):
        u = parse("SELECT 1 UNION ALL SELECT 2")
        assert isinstance(u, ast.Union)
        assert len(u.selects) == 2

    def test_limit_by(self):
        s = parse("SELECT a, b FROM t ORDER BY a LIMIT 2 BY a LIMIT 10")
        assert s.limit_by[0].value == 2
        assert s.limit.value == 10

    def test_limit_comma(self):
        s = parse("SELECT 1 FROM t LIMIT 3, 7")
        assert s.offset.value == 3 and s.limit.value == 7

    def test_with_totals(self):
        s = parse("SELECT a, count() FROM t GROUP BY a WITH TOTALS")
        assert s.group_by_with_totals

    def test_prewhere(self):
        s = parse("SELECT * FROM t PREWHERE a = 1 WHERE b = 2")
        assert s.prewhere is not None and s.where is not None

    def test_distinct(self):
        assert parse("SELECT DISTINCT a FROM t").distinct


class TestDDL:
    def test_create_table(self):
        c = parse("""
            CREATE TABLE IF NOT EXISTS db.events (
                id UInt64,
                ts DateTime,
                name String,
                value Nullable(Float64)
            ) ENGINE = MergeTree
            PARTITION BY toYYYYMM(ts)
            ORDER BY (id, ts)
        """)
        assert isinstance(c, ast.CreateTable)
        assert c.if_not_exists and c.database == "db"
        assert [col.name for col in c.columns] == ["id", "ts", "name", "value"]
        assert c.columns[3].type_name == "Nullable(Float64)"
        assert c.engine == "MergeTree"
        assert len(c.order_by) == 2
        assert c.partition_by is not None

    def test_insert_values(self):
        i = parse("INSERT INTO t (a, b) VALUES (1, 'x'), (2, 'y')")
        assert i.columns == ["a", "b"]
        assert len(i.values) == 2

    def test_insert_select(self):
        i = parse("INSERT INTO t SELECT * FROM s")
        assert i.select is not None

    def test_drop(self):
        d = parse("DROP TABLE IF EXISTS t")
        assert d.if_exists

    def test_explain(self):
        e = parse("EXPLAIN PIPELINE SELECT 1")
        assert e.kind == "pipeline"

    def test_set(self):
        s = parse("SET max_threads = 8, join_algorithm = 'hash'")
        assert s.changes["max_threads"] == 8

    def test_show(self):
        assert parse("SHOW TABLES").databases is False
        assert parse("SHOW DATABASES").databases is True

    def test_describe(self):
        d = parse("DESCRIBE TABLE t")
        assert d.table == "t"


class TestErrors:
    def test_unterminated_string(self):
        with pytest.raises(ParseError):
            parse("SELECT 'abc")

    def test_trailing_garbage(self):
        with pytest.raises(ParseError):
            parse("SELECT 1 1 1 FROM")

    def test_bad_statement(self):
        with pytest.raises(ParseError):
            parse("FROBNICATE x")
