"""Hand-written recursive-descent SQL parser.

Analog of the reference's parser combinators (src/Parsers/ParserSelectQuery.cpp,
ExpressionListParsers.cpp).  Operators are desugared to ClickHouse function
names; clause order follows the reference's SELECT grammar.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

from ..core.errors import ParseError
from . import ast
from .lexer import Token, tokenize

__all__ = ["parse", "parse_expression"]

RESERVED = {
    "FROM", "WHERE", "PREWHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET",
    "BY", "AS", "ON", "USING", "JOIN", "INNER", "LEFT", "RIGHT", "FULL",
    "CROSS", "GLOBAL", "ANY", "ALL", "SEMI", "ANTI", "ASOF", "UNION",
    "SETTINGS", "WITH", "SELECT", "DISTINCT", "AND", "OR", "NOT", "IN",
    "LIKE", "ILIKE", "BETWEEN", "IS", "NULL", "CASE", "WHEN", "THEN", "ELSE",
    "END", "ASC", "DESC", "DESCENDING", "ASCENDING", "NULLS", "FIRST", "LAST",
    "INTO", "VALUES", "FORMAT", "TOTALS", "FINAL", "SAMPLE", "ROLLUP",
    "CUBE",
    "INTERVAL", "EXISTS", "ARRAY", "OUTFILE", "INFILE", "OVER",
    "INTERSECT", "EXCEPT",
}


def parse(sql: str):
    """Parse one statement (trailing semicolon tolerated)."""
    p = Parser(tokenize(sql))
    stmt = p.parse_statement()
    p.accept_op(";")
    p.expect_end()
    return stmt


def parse_expression(sql: str) -> ast.Expr:
    p = Parser(tokenize(sql))
    e = p.parse_expr()
    p.expect_end()
    return e


class Parser:
    def __init__(self, tokens: List[Token]):
        self.tokens = tokens
        self.i = 0

    # -- token plumbing ------------------------------------------------------
    @property
    def tok(self) -> Token:
        return self.tokens[self.i]

    def advance(self) -> Token:
        t = self.tok
        self.i += 1
        return t

    def accept_kw(self, *kws: str) -> Optional[Token]:
        if self.tok.is_kw(*kws):
            return self.advance()
        return None

    def expect_kw(self, *kws: str) -> Token:
        if not self.tok.is_kw(*kws):
            raise ParseError(f"Expected {'/'.join(kws)}, got {self.tok.text!r} "
                             f"at {self.tok.pos}")
        return self.advance()

    def accept_op(self, op: str) -> bool:
        if self.tok.kind == "op" and self.tok.text == op:
            self.advance()
            return True
        return False

    def expect_op(self, op: str):
        if not self.accept_op(op):
            raise ParseError(f"Expected {op!r}, got {self.tok.text!r} at "
                             f"{self.tok.pos}")

    def expect_word(self) -> str:
        if self.tok.kind != "word":
            raise ParseError(f"Expected identifier, got {self.tok.text!r} at "
                             f"{self.tok.pos}")
        return self.advance().text

    def expect_end(self):
        if self.tok.kind != "end":
            raise ParseError(f"Unexpected trailing input {self.tok.text!r} at "
                             f"{self.tok.pos}")

    # -- statements ----------------------------------------------------------
    def parse_statement(self):
        t = self.tok
        if t.is_kw("SELECT", "WITH"):
            return self.parse_select_union()
        if t.is_kw("EXPLAIN"):
            return self.parse_explain()
        if t.is_kw("DETACH"):
            self.advance()
            self.expect_kw("TABLE")
            if_exists = False
            if self.accept_kw("IF"):
                self.expect_kw("EXISTS")
                if_exists = True
            db, tbl = self.parse_table_name()
            return ast.DetachAttach("detach", db, tbl, if_exists)
        if t.is_kw("ATTACH"):
            # bare `ATTACH TABLE [db.]name` reloads from the durable store;
            # ATTACH with a full definition parses as CREATE (reference
            # behavior: ATTACH = CREATE without data initialization)
            save = self.i
            self.advance()
            if self.tok.is_kw("TABLE"):
                self.advance()
                if_exists = False
                if self.accept_kw("IF"):
                    self.expect_kw("EXISTS")
                    if_exists = True
                db, tbl = self.parse_table_name()
                if self.tok.kind == "end" or self.tok.text == ";":
                    return ast.DetachAttach("attach", db, tbl, if_exists)
            self.i = save
            return self.parse_create()
        if t.is_kw("KILL"):
            self.advance()
            self.expect_kw("QUERY")
            self.expect_kw("WHERE")
            cond = self.parse_expr()
            sync = bool(self.accept_kw("SYNC"))
            self.accept_kw("ASYNC")
            return ast.KillQuery(cond, sync)
        if t.is_kw("CREATE"):
            return self.parse_create()
        if t.is_kw("INSERT"):
            return self.parse_insert()
        if t.is_kw("DROP"):
            return self.parse_drop()
        if t.is_kw("TRUNCATE"):
            return self.parse_truncate()
        if t.is_kw("OPTIMIZE"):
            self.advance()
            self.expect_kw("TABLE")
            db, tbl = self.parse_table_name()
            final = bool(self.accept_kw("FINAL"))
            return ast.OptimizeTable(db, tbl, final)
        if t.is_kw("ALTER"):
            return self.parse_alter()
        if t.is_kw("GRANT", "REVOKE"):
            return self.parse_grant()
        if t.is_kw("BACKUP", "RESTORE"):
            kind = self.advance().text.lower()
            self.expect_kw("TABLE")
            db, tbl = self.parse_table_name()
            self.expect_kw("TO" if kind == "backup" else "FROM")
            pt = self.tok
            if pt.kind == "word" and pt.text.lower() == "disk":
                # Disk('name', 'path') target (reference: BackupFactory
                # engine syntax, src/Backups/registerBackupEnginesFileAndDisk)
                self.advance()
                self.expect_op("(")
                dn = self.tok
                if dn.kind != "string":
                    raise ParseError("Disk() expects a quoted disk name")
                self.advance()
                self.expect_op(",")
                dp = self.tok
                if dp.kind != "string":
                    raise ParseError("Disk() expects a quoted path")
                self.advance()
                self.expect_op(")")
                return ast.BackupRestore(kind, db, tbl, dp.text,
                                         disk=dn.text)
            if pt.kind != "string":
                raise ParseError("BACKUP/RESTORE expects a string path "
                                 "or Disk('name', 'path')")
            self.advance()
            return ast.BackupRestore(kind, db, tbl, pt.text)
        if t.is_kw("SHOW"):
            return self.parse_show()
        if t.is_kw("DESCRIBE", "DESC"):
            self.advance()
            self.accept_kw("TABLE")
            db, tbl = self.parse_table_name()
            return ast.Describe(db, tbl)
        if t.is_kw("SET"):
            return self.parse_set()
        if t.is_kw("USE"):
            self.advance()
            return ast.Use(self.expect_word())
        if t.is_kw("SYSTEM"):
            words = [self.advance().text]
            while self.tok.kind in ("word", "number", "string") \
                    or (self.tok.kind == "op" and self.tok.text == "."):
                words.append(self.advance().text)
            return ast.SystemCommand(" ".join(words[1:]))
        raise ParseError(f"Unknown statement start {t.text!r} at {t.pos}")

    def parse_select_union(self):
        left = self._parse_intersect_chain()
        while True:
            if self.accept_kw("UNION"):
                mode = "all"
                explicit = True
                if self.accept_kw("DISTINCT"):
                    mode = "distinct"
                elif not self.accept_kw("ALL"):
                    explicit = False   # bare UNION: DISTINCT in recursion
                right = self._parse_intersect_chain()
                # flatten consecutive same-mode unions
                if isinstance(left, ast.Union) and left.mode == mode:
                    left.selects.append(right)
                    if not explicit:
                        left.mode_explicit = False
                else:
                    left = ast.Union([left, right], mode, explicit)
            elif self.accept_kw("EXCEPT"):
                distinct = bool(self.accept_kw("DISTINCT"))
                self.accept_kw("ALL")
                right = self._parse_intersect_chain()
                left = ast.SetOp(left, right, "except", distinct)
            else:
                return left

    def _parse_select_or_parens(self):
        """SELECT ..., or a parenthesized (SELECT ... [UNION ...]) branch
        (reference: ParserUnionQueryElement accepts subquery elements)."""
        if self.tok.kind == "op" and self.tok.text == "(":
            nxt = self.tokens[self.i + 1]
            if nxt.is_kw("SELECT", "WITH") \
                    or (nxt.kind == "op" and nxt.text == "("):
                self.expect_op("(")
                q = self.parse_select_union()
                self.expect_op(")")
                return q
        return self.parse_select()

    def _parse_intersect_chain(self):
        left = self._parse_select_or_parens()
        while self.accept_kw("INTERSECT"):
            distinct = bool(self.accept_kw("DISTINCT"))
            self.accept_kw("ALL")
            right = self._parse_select_or_parens()
            left = ast.SetOp(left, right, "intersect", distinct)
        return left

    def parse_select(self) -> ast.Select:
        ctes: List[ast.CTE] = []
        if self.accept_kw("WITH"):
            recursive = bool(self.accept_kw("RECURSIVE"))
            while True:
                cte = self.parse_cte()
                cte.recursive = recursive and cte.query is not None
                ctes.append(cte)
                if not self.accept_op(","):
                    break
        self.expect_kw("SELECT")
        distinct = bool(self.accept_kw("DISTINCT"))
        items = [self.parse_select_item()]
        while self.accept_op(","):
            items.append(self.parse_select_item())

        sel = ast.Select(items=items, distinct=distinct, ctes=ctes)

        if self.accept_kw("FROM"):
            sel.from_ = self.parse_table_expression()
            while True:
                # comma-separated table list = CROSS JOIN (reference:
                # ParserTablesInSelectQuery comma element)
                if self.accept_op(","):
                    sel.joins.append(ast.Join(
                        "cross", "all", self.parse_table_expression()))
                    continue
                join = self.try_parse_join()
                if join is None:
                    break
                sel.joins.append(join)
        if self.accept_kw("PREWHERE"):
            sel.prewhere = self.parse_expr()
        if self.accept_kw("WHERE"):
            sel.where = self.parse_expr()
        if self.accept_kw("GROUP"):
            self.expect_kw("BY")
            if self.tok.is_kw("GROUPING") \
                    and self.tokens[self.i + 1].is_kw("SETS"):
                self.advance()
                self.advance()
                self.expect_op("(")
                sets: list = []
                while True:
                    exprs = []
                    if self.accept_op("("):
                        if not self.accept_op(")"):
                            exprs.append(self.parse_expr())
                            while self.accept_op(","):
                                exprs.append(self.parse_expr())
                            self.expect_op(")")
                    else:
                        exprs.append(self.parse_expr())
                    sets.append(exprs)
                    if not self.accept_op(","):
                        break
                self.expect_op(")")
                sel.group_by_modifier = "grouping_sets"
                sel.grouping_sets = sets
                # keys = union of all set expressions, first-appearance order
                seen: set = set()
                sel.group_by = []
                for st in sets:
                    for e in st:
                        k = ast.format_expr(e)
                        if k not in seen:
                            seen.add(k)
                            sel.group_by.append(e)
                if not sel.group_by:
                    raise ParseError("GROUPING SETS needs at least one key")
                if self.accept_kw("WITH"):
                    self.expect_kw("TOTALS")
                    sel.group_by_with_totals = True
            else:
                mod = self.accept_kw("ROLLUP", "CUBE")
                if mod:
                    sel.group_by_modifier = mod.text.lower()
                    self.expect_op("(")
                    sel.group_by = [self.parse_expr()]
                    while self.accept_op(","):
                        sel.group_by.append(self.parse_expr())
                    self.expect_op(")")
                else:
                    sel.group_by = [self.parse_expr()]
                    while self.accept_op(","):
                        sel.group_by.append(self.parse_expr())
                while self.accept_kw("WITH"):
                    kw = self.expect_kw("TOTALS", "ROLLUP", "CUBE")
                    if kw.text.upper() == "TOTALS":
                        sel.group_by_with_totals = True
                    else:
                        sel.group_by_modifier = kw.text.lower()
        if self.accept_kw("HAVING"):
            sel.having = self.parse_expr()
        if self.accept_kw("ORDER"):
            self.expect_kw("BY")
            nxt = self.tokens[self.i + 1]
            if self.tok.is_kw("ALL") and not (
                    nxt.kind == "op" and nxt.text in ("(", ".", "[")):
                self.advance()
                sel.order_by = [ast.OrderItem(ast.Identifier("__order_all__"))]
            else:
                sel.order_by = [self.parse_order_item()]
                while self.accept_op(","):
                    sel.order_by.append(self.parse_order_item())
        if self.accept_kw("LIMIT"):
            first = self.parse_expr()
            if self.accept_op(","):
                sel.offset = first
                sel.limit = self.parse_expr()
            elif self.accept_kw("BY"):
                by = [self.parse_expr()]
                while self.accept_op(","):
                    by.append(self.parse_expr())
                sel.limit_by = (first, by)
                if self.accept_kw("LIMIT"):
                    sel.limit = self.parse_expr()
                    if self.accept_kw("OFFSET"):
                        sel.offset = self.parse_expr()
            else:
                sel.limit = first
                if self.accept_kw("OFFSET"):
                    sel.offset = self.parse_expr()
        if self.accept_kw("SETTINGS"):
            sel.settings = self.parse_settings_list()
        if self.accept_kw("INTO"):
            self.expect_kw("OUTFILE")
            t = self.tok
            if t.kind != "string":
                raise ParseError("INTO OUTFILE expects a string path")
            sel.outfile = self.advance().text
        if self.accept_kw("FORMAT"):
            sel.format = self.expect_word()
        if self.accept_kw("SETTINGS") and not sel.settings:
            sel.settings = self.parse_settings_list()
        return sel

    def parse_cte(self) -> ast.CTE:
        # Two forms: `name AS (SELECT ...)` and `expr AS name`
        save = self.i
        if self.tok.kind == "word" and not self.tok.is_kw(*RESERVED):
            name = self.advance().text
            if self.accept_kw("AS"):
                if self.tok.kind == "op" and self.tok.text == "(":
                    self.expect_op("(")
                    q = self.parse_select_union()
                    self.expect_op(")")
                    return ast.CTE(name=name, query=q)
            self.i = save
        expr = self.parse_expr()
        self.expect_kw("AS")
        name = self.expect_word()
        return ast.CTE(name=name, expr=expr)

    def parse_select_item(self) -> ast.SelectItem:
        expr = self.parse_expr()
        alias = self.try_parse_alias()
        return ast.SelectItem(expr, alias)

    def try_parse_alias(self) -> Optional[str]:
        if self.accept_kw("AS"):
            return self.expect_word()
        t = self.tok
        if t.kind == "word" and not t.is_kw(*RESERVED):
            return self.advance().text
        return None

    def parse_order_item(self) -> ast.OrderItem:
        e = self.parse_expr()
        desc = False
        if self.accept_kw("DESC", "DESCENDING"):
            desc = True
        elif self.accept_kw("ASC", "ASCENDING"):
            desc = False
        nulls_last = None
        if self.accept_kw("NULLS"):
            kw = self.expect_kw("FIRST", "LAST")
            nulls_last = kw.text.upper() == "LAST"
        fill = None
        if self.accept_kw("WITH"):
            self.expect_kw("FILL")
            f_from = f_to = f_step = None
            while True:
                if self.accept_kw("FROM"):
                    f_from = self.parse_expr()
                elif self.accept_kw("TO"):
                    f_to = self.parse_expr()
                elif self.accept_kw("STEP"):
                    f_step = self.parse_expr()
                else:
                    break
            fill = (f_from, f_to, f_step)
        return ast.OrderItem(e, desc, nulls_last, fill)

    def parse_table_name(self) -> Tuple[Optional[str], str]:
        a = self.expect_word()
        if self.accept_op("."):
            return a, self.expect_word()
        return None, a

    def parse_table_expression(self):
        if self.tok.kind == "op" and self.tok.text == "(":
            self.expect_op("(")
            q = self.parse_select_union()
            self.expect_op(")")
            alias = self.try_parse_alias()
            return ast.SubqueryRef(q, alias)
        if self.tok.is_kw("VIEW") \
                and self.tokens[self.i + 1].kind == "op" \
                and self.tokens[self.i + 1].text == "(":
            # view(SELECT ...) table function: an inline subquery
            # (reference: src/TableFunctions/TableFunctionView.cpp)
            self.advance()
            self.expect_op("(")
            q = self.parse_select_union()
            self.expect_op(")")
            return ast.SubqueryRef(q, self.try_parse_alias())
        db, name = self.parse_table_name()
        if self.tok.kind == "op" and self.tok.text == "(" and db is None:
            # table function: numbers(10), file('x.parquet')
            self.expect_op("(")
            args = []
            if not (self.tok.kind == "op" and self.tok.text == ")"):
                args.append(self.parse_expr())
                while self.accept_op(","):
                    args.append(self.parse_expr())
            self.expect_op(")")
            alias = self.try_parse_alias()
            return ast.TableFunctionRef(ast.FuncCall(name, args), alias)
        alias = None
        final = False
        if self.accept_kw("FINAL"):
            final = True
        else:
            alias = self.try_parse_alias()
            if self.accept_kw("FINAL"):
                final = True
        sample = None
        if self.accept_kw("SAMPLE"):
            t = self.tok
            if t.kind != "number":
                raise ParseError("SAMPLE expects a numeric ratio")
            self.advance()
            sample = float(_parse_number(t.text))
            if self.accept_op("/"):
                d = self.tok
                if d.kind != "number":
                    raise ParseError("SAMPLE a/b expects numbers")
                self.advance()
                sample = sample / float(_parse_number(d.text))
        return ast.TableRef(db, name, alias, final, sample)

    def try_parse_join(self) -> Optional[ast.Join]:
        save = self.i
        is_global = bool(self.accept_kw("GLOBAL"))
        strictness = "all"
        if self.accept_kw("ANY"):
            strictness = "any"
        elif self.accept_kw("SEMI"):
            strictness = "semi"
        elif self.accept_kw("ANTI"):
            strictness = "anti"
        elif self.accept_kw("ASOF"):
            strictness = "asof"
        elif self.accept_kw("ALL"):
            strictness = "all"
        kind = None
        if self.accept_kw("INNER"):
            kind = "inner"
        elif self.accept_kw("LEFT"):
            kind = "left"
            self.accept_kw("OUTER")
        elif self.accept_kw("RIGHT"):
            kind = "right"
            self.accept_kw("OUTER")
        elif self.accept_kw("FULL"):
            kind = "full"
            self.accept_kw("OUTER")
        elif self.accept_kw("CROSS"):
            kind = "cross"
        # strictness may also follow the kind: LEFT SEMI JOIN, LEFT ANY JOIN
        # (the reference's documented order, ParserJoin)
        if strictness == "all" and kind in ("left", "right", "inner"):
            if self.accept_kw("SEMI"):
                strictness = "semi"
            elif self.accept_kw("ANTI"):
                strictness = "anti"
            elif self.accept_kw("ANY"):
                strictness = "any"
            elif self.accept_kw("ASOF"):
                strictness = "asof"
        if not self.accept_kw("JOIN"):
            if kind is None and strictness == "all" and not is_global:
                self.i = save
                return None
            if self.tok.is_kw("JOIN"):
                self.advance()
            else:
                self.i = save
                return None
        if kind is None:
            kind = "inner"
        table = self.parse_table_expression()
        on = None
        using = None
        if self.accept_kw("ON"):
            on = self.parse_expr()
        elif self.accept_kw("USING"):
            paren = self.accept_op("(")
            using = [self.expect_word()]
            while self.accept_op(","):
                using.append(self.expect_word())
            if paren:
                self.expect_op(")")
        return ast.Join(kind, strictness, table, on, using, is_global)

    def parse_settings_list(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        while True:
            name = self.expect_word()
            self.expect_op("=")
            out[name] = self.parse_setting_value()
            if not self.accept_op(","):
                break
        return out

    def parse_setting_value(self):
        t = self.tok
        if t.kind == "number":
            self.advance()
            return _parse_number(t.text)
        if t.kind == "string":
            self.advance()
            return t.text
        if t.kind == "word":
            self.advance()
            return t.text
        raise ParseError(f"Bad setting value at {t.pos}")

    # -- DDL/DML -------------------------------------------------------------
    def parse_create(self):
        self.advance()  # CREATE/ATTACH
        if self.accept_kw("USER"):
            ine = self._if_not_exists()
            name = self.expect_word()
            pwd = None
            if self.accept_kw("IDENTIFIED"):
                self.accept_kw("WITH")
                self.accept_kw("PLAINTEXT_PASSWORD")
                self.expect_kw("BY")
                t = self.tok
                if t.kind != "string":
                    raise ParseError("IDENTIFIED BY expects a string")
                pwd = self.advance().text
            return ast.CreateUser(name, pwd, ine)
        if self.accept_kw("DATABASE"):
            ine = self._if_not_exists()
            return ast.CreateDatabase(self.expect_word(), ine)
        if self.accept_kw("ROLE"):
            ine = self._if_not_exists()
            return ast.CreateRole(self.expect_word(), ine)
        if self.accept_kw("QUOTA"):
            ine = self._if_not_exists()
            name = self.expect_word()
            duration_s, maxes, users = 3600, {}, []
            if self.accept_kw("FOR"):
                self.accept_kw("RANDOMIZED")
                self.expect_kw("INTERVAL")
                amount = int(self.advance().text)
                unit = self.expect_word().lower().rstrip("s")
                mult = {"second": 1, "minute": 60, "hour": 3600,
                        "day": 86400, "week": 604800}.get(unit, 1)
                duration_s = amount * mult
            if self.accept_kw("MAX"):
                while True:
                    key = self.expect_word().lower()
                    self.expect_op("=")
                    maxes[key] = int(self.advance().text)
                    if not self.accept_op(","):
                        break
            if self.accept_kw("TO"):
                if not self.accept_kw("ALL"):
                    users.append(self.expect_word())
                    while self.accept_op(","):
                        users.append(self.expect_word())
            return ast.CreateQuota(name, duration_s, maxes, users, ine)
        if self.tok.is_kw("ROW"):
            save = self.i
            self.advance()
            if not self.accept_kw("POLICY"):
                self.i = save
            else:
                ine = self._if_not_exists()
                name = self.expect_word()
                self.expect_kw("ON")
                db, tbl = self.parse_table_name()
                self.expect_kw("USING")
                using = self.parse_expr()
                users = []
                if self.accept_kw("TO"):
                    if not self.accept_kw("ALL"):
                        users.append(self.expect_word())
                        while self.accept_op(","):
                            users.append(self.expect_word())
                return ast.CreateRowPolicy(name, db, tbl,
                                           ast.format_expr(using), users,
                                           ine)
        if self.accept_kw("DICTIONARY"):
            self._if_not_exists()
            db, name = self.parse_table_name()
            cols = []
            if self.accept_op("("):
                while True:
                    cname = self.expect_word()
                    ctype = self.parse_type_name()
                    self.accept_kw("DEFAULT") and self.parse_expr()
                    cols.append(ast.ColumnDef(cname, ctype))
                    if not self.accept_op(","):
                        break
                self.expect_op(")")
            pk = None
            src_table = None
            while self.tok.kind == "word":
                if self.accept_kw("PRIMARY"):
                    self.expect_kw("KEY")
                    pk = self.expect_word()
                elif self.tok.is_kw("SOURCE", "LAYOUT", "LIFETIME"):
                    self.advance()
                    # skim the parenthesized block, remembering any string
                    # or TABLE ident (the source table name)
                    depth = 0
                    while True:
                        t = self.advance()
                        if t.kind == "op" and t.text == "(":
                            depth += 1
                        elif t.kind == "op" and t.text == ")":
                            depth -= 1
                            if depth == 0:
                                break
                        elif t.kind == "string" and src_table is None:
                            src_table = t.text
                else:
                    break
            return ast.CreateDictionary(db, name, cols, pk, src_table)
        self.accept_kw("OR")  # CREATE OR REPLACE
        self.accept_kw("REPLACE")
        temporary = bool(self.accept_kw("TEMPORARY"))
        materialized = bool(self.accept_kw("MATERIALIZED"))
        if self.accept_kw("VIEW"):
            ine = self._if_not_exists()
            db, name = self.parse_table_name()
            to_table = None
            if self.accept_kw("TO"):
                _, to_table = self.parse_table_name()
            # tolerate an ENGINE clause on materialized views
            if self.accept_kw("ENGINE"):
                self.expect_op("=")
                self.expect_word()
            self.expect_kw("AS")
            q = self.parse_select_union()
            return ast.CreateView(db, name, q, materialized, to_table, ine)
        self.expect_kw("TABLE")
        ine = self._if_not_exists()
        db, tbl = self.parse_table_name()
        cols: List[ast.ColumnDef] = []
        ct_projections: List[tuple] = []
        ct_indexes: List[ast.IndexDef] = []
        if self.accept_op("("):
            while True:
                if self.accept_kw("PROJECTION"):
                    pname = self.expect_word()
                    self.expect_op("(")
                    psel = self.parse_select_union()
                    self.expect_op(")")
                    ct_projections.append((pname, psel))
                    if not self.accept_op(","):
                        break
                    continue
                if self.accept_kw("INDEX"):
                    # skip index: INDEX name expr TYPE kind(...) GRANULARITY n
                    iname = self.expect_word()
                    iexpr = self.parse_expr()
                    self.expect_kw("TYPE")
                    ikind = self.expect_word()
                    iparams: List = []
                    if self.tok.kind == "op" and self.tok.text == "(":
                        self.advance()
                        while not (self.tok.kind == "op"
                                   and self.tok.text == ")"):
                            if self.tok.kind in ("number", "string"):
                                iparams.append(
                                    _parse_number(self.tok.text)
                                    if self.tok.kind == "number"
                                    else self.tok.text)
                            self.advance()
                        self.expect_op(")")
                    igran = 1
                    if self.accept_kw("GRANULARITY"):
                        g = self.parse_expr()
                        if isinstance(g, ast.Literal) \
                                and isinstance(g.value, int):
                            igran = g.value
                    ct_indexes.append(ast.IndexDef(
                        iname, iexpr, ikind.lower(), iparams, igran))
                    if not self.accept_op(","):
                        break
                    continue
                cname = self.expect_word()
                ctype = self.parse_type_name()
                default = None
                if self.accept_kw("DEFAULT", "MATERIALIZED", "ALIAS"):
                    default = self.parse_expr()
                codec = None
                if self.accept_kw("CODEC") and self.tok.kind == "op" \
                        and self.tok.text == "(":
                    depth, names = 0, []
                    while True:
                        t = self.tok
                        if t.kind == "op" and t.text == "(":
                            depth += 1
                            self.advance()
                        elif t.kind == "op" and t.text == ")":
                            depth -= 1
                            self.advance()
                            if depth == 0:
                                break
                        else:
                            if t.kind == "word" and depth == 1:
                                names.append(t.text)
                            self.advance()
                    codec = ", ".join(names) if names else None
                elif self.tok.kind == "op" and self.tok.text == "(":
                    self._skim_parens()
                if self.accept_kw("TTL"):
                    self.parse_expr()
                if self.accept_kw("COMMENT") and self.tok.kind == "string":
                    self.advance()
                cols.append(ast.ColumnDef(cname, ctype, default,
                                          codec=codec))
                if not self.accept_op(","):
                    break
            self.expect_op(")")
        ct = ast.CreateTable(db, tbl, cols, if_not_exists=ine)
        ct.projections = ct_projections
        ct.indexes = ct_indexes
        if temporary:
            ct.engine = "Memory"
        if self.accept_kw("ENGINE"):
            self.accept_op("=")          # ENGINE MergeTree == ENGINE = ...
            ct.engine = self.expect_word()
            if self.tok.kind == "op" and self.tok.text == "(":
                # capture string-literal engine args (ReplicatedMergeTree
                # zk path + replica name); other tokens are skimmed
                depth, args = 0, []
                while True:
                    t = self.tok
                    if t.kind == "op" and t.text == "(":
                        depth += 1
                        self.advance()
                    elif t.kind == "op" and t.text == ")":
                        depth -= 1
                        self.advance()
                        if depth == 0:
                            break
                    else:
                        if depth == 1 and t.kind in ("string", "word",
                                                     "number"):
                            args.append(t.text)
                        self.advance()
                ct.engine_args = args
        while True:
            if self.accept_kw("ORDER"):
                self.expect_kw("BY")
                ct.order_by = self._parse_key_list()
            elif self.accept_kw("PARTITION"):
                self.expect_kw("BY")
                ct.partition_by = self.parse_expr()
            elif self.accept_kw("PRIMARY"):
                self.expect_kw("KEY")
                ct.primary_key = self._parse_key_list()
            elif self.accept_kw("SAMPLE"):
                self.expect_kw("BY")
                ct.sample_by = self.parse_expr()
            elif self.accept_kw("TTL"):
                ct.ttl = ast.format_expr(self.parse_expr())
            elif self.accept_kw("COMMENT"):
                if self.tok.kind == "string":
                    self.advance()
            elif self.accept_kw("SETTINGS"):
                ct.settings = self.parse_settings_list()
            else:
                break
        if self.accept_kw("AS"):
            ct.as_select = self.parse_select_union()
        return ct

    def _skim_parens(self) -> None:
        """Consume a balanced (...) group starting at the current '('."""
        depth = 0
        while True:
            if self.accept_op("("):
                depth += 1
            elif self.accept_op(")"):
                depth -= 1
                if depth == 0:
                    return
            else:
                if self.tok.kind == "end":
                    raise ParseError("Unbalanced parentheses")
                self.advance()

    def _parse_key_list(self) -> List[ast.Expr]:
        if self.accept_op("("):
            if self.accept_op(")"):
                return []
            out = [self.parse_expr()]
            while self.accept_op(","):
                out.append(self.parse_expr())
            self.expect_op(")")
            return out
        out = [self.parse_expr()]
        while self.accept_op(","):
            out.append(self.parse_expr())
        return out

    def _if_not_exists(self) -> bool:
        if self.accept_kw("IF"):
            self.expect_kw("NOT")
            self.expect_kw("EXISTS")
            return True
        return False

    def parse_type_name(self) -> str:
        name = self.expect_word()
        if self.tok.kind == "op" and self.tok.text == "(":
            depth = 0
            parts = [name]
            while True:
                t = self.advance()
                if t.kind == "string":   # Enum8('a' = 1): keep the quotes
                    parts.append("'" + t.text.replace("\\", "\\\\")
                                 .replace("'", "\\'") + "'")
                else:
                    parts.append(t.text)
                if t.kind == "op" and t.text == "(":
                    depth += 1
                elif t.kind == "op" and t.text == ")":
                    depth -= 1
                    if depth == 0:
                        break
            return "".join(parts)
        return name

    def parse_insert(self):
        self.advance()
        self.expect_kw("INTO")
        self.accept_kw("TABLE")
        db, tbl = self.parse_table_name()
        columns = None
        if self.tok.kind == "op" and self.tok.text == "(":
            save = self.i
            self.expect_op("(")
            try:
                columns = [self.expect_word()]
                while self.accept_op(","):
                    columns.append(self.expect_word())
                self.expect_op(")")
            except ParseError:
                self.i = save
                columns = None
        if self.accept_kw("FROM"):
            self.expect_kw("INFILE")
            t = self.tok
            if t.kind != "string":
                raise ParseError("FROM INFILE expects a string path")
            path = self.advance().text
            fmt = None
            if self.accept_kw("FORMAT"):
                fmt = self.expect_word()
            return ast.Insert(db, tbl, columns, infile=path, format=fmt)
        if self.accept_kw("VALUES"):
            rows = []
            while self.accept_op("("):
                row = [self.parse_expr()]
                while self.accept_op(","):
                    row.append(self.parse_expr())
                self.expect_op(")")
                rows.append(row)
                self.accept_op(",")   # tuple separator comma is optional
            return ast.Insert(db, tbl, columns, values=rows)
        if self.tok.is_kw("SELECT", "WITH"):
            return ast.Insert(db, tbl, columns, select=self.parse_select_union())
        if self.accept_kw("FORMAT"):
            # INSERT INTO t FORMAT X / bare INSERT INTO t: data arrives
            # out-of-band (native TCP Data packets / client streams)
            return ast.Insert(db, tbl, columns, format=self.expect_word())
        if self.tok.kind == "end" or (self.tok.kind == "op"
                                      and self.tok.text == ";"):
            return ast.Insert(db, tbl, columns)
        raise ParseError(f"Expected VALUES, SELECT or FROM INFILE at "
                         f"{self.tok.pos}")

    def parse_drop(self):
        self.advance()
        self.accept_kw("TEMPORARY")
        if self.accept_kw("USER"):
            ie = self._if_exists()
            return ast.DropUser(self.expect_word(), ie)
        if self.accept_kw("ROLE"):
            ie = self._if_exists()
            return ast.DropAccessEntity("role", self.expect_word(), ie)
        if self.accept_kw("QUOTA"):
            ie = self._if_exists()
            return ast.DropAccessEntity("quota", self.expect_word(), ie)
        if self.tok.is_kw("ROW"):
            save = self.i
            self.advance()
            if self.accept_kw("POLICY"):
                ie = self._if_exists()
                name = self.expect_word()
                if self.accept_kw("ON"):
                    self.parse_table_name()
                return ast.DropAccessEntity("row_policy", name, ie)
            self.i = save
        if self.accept_kw("DATABASE"):
            ie = self._if_exists()
            return ast.DropTable(None, self.expect_word(), ie, is_database=True)
        self.expect_kw("TABLE", "VIEW", "DICTIONARY")
        ie = self._if_exists()
        db, tbl = self.parse_table_name()
        return ast.DropTable(db, tbl, ie)

    def parse_alter(self):
        self.advance()
        self.expect_kw("TABLE")
        db, tbl = self.parse_table_name()
        if self.accept_kw("DELETE"):
            self.expect_kw("WHERE")
            return ast.AlterTable(db, tbl, "delete",
                                  predicate=self.parse_expr())
        if self.accept_kw("UPDATE"):
            updates = []
            while True:
                col = self.expect_word()
                self.expect_op("=")
                updates.append((col, self.parse_expr()))
                if not self.accept_op(","):
                    break
            self.expect_kw("WHERE")
            return ast.AlterTable(db, tbl, "update", updates=updates,
                                  predicate=self.parse_expr())
        if self.accept_kw("ADD"):
            if self.accept_kw("PROJECTION"):
                pname = self.expect_word()
                self.expect_op("(")
                psel = self.parse_select_union()
                self.expect_op(")")
                a = ast.AlterTable(db, tbl, "add_projection")
                a.projection = (pname, psel)
                return a
            self.expect_kw("COLUMN")
            self.accept_kw("IF")  # IF NOT EXISTS tolerated
            self.accept_kw("NOT")
            self.accept_kw("EXISTS")
            cname = self.expect_word()
            ctype = self.parse_type_name()
            default = None
            if self.accept_kw("DEFAULT"):
                default = self.parse_expr()
            return ast.AlterTable(db, tbl, "add_column",
                                  column=ast.ColumnDef(cname, ctype, default))
        if self.accept_kw("DROP"):
            if self.accept_kw("PROJECTION"):
                a = ast.AlterTable(db, tbl, "drop_projection")
                a.projection = (self.expect_word(), None)
                return a
            self.expect_kw("COLUMN")
            self.accept_kw("IF")
            self.accept_kw("EXISTS")
            return ast.AlterTable(db, tbl, "drop_column",
                                  column_name=self.expect_word())
        if self.accept_kw("MATERIALIZE"):
            self.expect_kw("PROJECTION")
            a = ast.AlterTable(db, tbl, "materialize_projection")
            a.projection = (self.expect_word(), None)
            return a
        if self.accept_kw("MODIFY"):
            if self.accept_kw("TTL"):
                a = ast.AlterTable(db, tbl, "modify_ttl")
                a.ttl = ast.format_expr(self.parse_expr())
                return a
        raise ParseError(f"Unsupported ALTER action at {self.tok.pos}")

    def parse_grant(self):
        kind = self.advance().text.lower()
        privs = [self.expect_word()]
        while self.accept_op(","):
            privs.append(self.expect_word())
        if self.accept_kw("TO" if kind == "grant" else "FROM"):
            # GRANT <role>[, ...] TO <user> -- role grant, no ON clause
            user = self.expect_word()
            return ast.GrantRevoke(kind, privs, "__role__", user)
        self.expect_kw("ON")
        if self.accept_op("*"):
            self.expect_op(".")
            self.expect_op("*")
            target = "*.*"
        else:
            a = self.expect_word()
            if self.accept_op("."):
                if self.accept_op("*"):
                    target = f"{a}.*"
                else:
                    target = f"{a}.{self.expect_word()}"
            else:
                target = f"*.{a}"
        self.expect_kw("TO" if kind == "grant" else "FROM")
        user = self.expect_word()
        return ast.GrantRevoke(kind, privs, target, user)

    def parse_truncate(self):
        self.advance()
        self.expect_kw("TABLE")
        db, tbl = self.parse_table_name()
        return ast.TruncateTable(db, tbl)

    def _if_exists(self) -> bool:
        if self.accept_kw("IF"):
            self.expect_kw("EXISTS")
            return True
        return False

    def parse_show(self):
        self.advance()
        if self.accept_kw("DATABASES"):
            return ast.ShowTables(databases=True)
        self.expect_kw("TABLES")
        like = None
        if self.accept_kw("LIKE"):
            t = self.tok
            if t.kind != "string":
                raise ParseError("SHOW TABLES LIKE expects a string")
            like = self.advance().text
        return ast.ShowTables(like=like)

    def parse_set(self):
        self.advance()
        return ast.SetStatement(self.parse_settings_list())

    def parse_explain(self):
        self.advance()
        kind = "plan"
        if self.tok.is_kw("AST", "PLAN", "PIPELINE", "ESTIMATE", "SYNTAX"):
            kind = self.advance().text.lower()
        q = self.parse_select_union()
        return ast.Explain(kind, q)

    # -- expressions ---------------------------------------------------------
    def parse_expr(self) -> ast.Expr:
        e = self.parse_ternary()
        if self.tok.kind == "op" and self.tok.text == "->":
            params = None
            if isinstance(e, ast.Identifier):
                params = [e.name]
            elif isinstance(e, ast.Tuple_) and all(
                    isinstance(i, ast.Identifier) for i in e.items):
                params = [i.name for i in e.items]
            elif isinstance(e, ast.FuncCall) and e.name == "tuple" and all(
                    isinstance(i, ast.Identifier) for i in e.args):
                params = [i.name for i in e.args]
            if params is not None:
                self.advance()
                return ast.Lambda(params, self.parse_expr())
        return e

    def parse_ternary(self) -> ast.Expr:
        cond = self.parse_or()
        if self.accept_op("?"):
            a = self.parse_or()
            self.expect_op(":")
            b = self.parse_ternary()
            return ast.FuncCall("if", [cond, a, b])
        return cond

    def parse_or(self) -> ast.Expr:
        left = self.parse_and()
        args = [left]
        while self.accept_kw("OR"):
            args.append(self.parse_and())
        return args[0] if len(args) == 1 else ast.FuncCall("or", args)

    def parse_and(self) -> ast.Expr:
        left = self.parse_not()
        args = [left]
        while self.accept_kw("AND"):
            args.append(self.parse_not())
        return args[0] if len(args) == 1 else ast.FuncCall("and", args)

    def parse_not(self) -> ast.Expr:
        if self.accept_kw("NOT"):
            return ast.FuncCall("not", [self.parse_not()])
        return self.parse_comparison()

    def parse_comparison(self) -> ast.Expr:
        left = self.parse_additive()
        t = self.tok
        if t.kind == "op" and t.text in ("=", "==", "!=", "<>", "<", "<=",
                                         ">", ">="):
            self.advance()
            right = self.parse_additive()
            name = {"=": "equals", "==": "equals", "!=": "notEquals",
                    "<>": "notEquals", "<": "less", "<=": "lessOrEquals",
                    ">": "greater", ">=": "greaterOrEquals"}[t.text]
            return ast.FuncCall(name, [left, right])
        negate = False
        save = self.i
        if self.accept_kw("NOT"):
            if self.tok.is_kw("LIKE", "ILIKE", "IN", "BETWEEN"):
                negate = True
            else:
                self.i = save
                return left
        if self.accept_kw("LIKE"):
            right = self.parse_additive()
            return ast.FuncCall("notLike" if negate else "like", [left, right])
        if self.accept_kw("ILIKE"):
            right = self.parse_additive()
            return ast.FuncCall("notILike" if negate else "ilike", [left, right])
        if self.accept_kw("IN"):
            right = self.parse_in_rhs()
            return ast.FuncCall("notIn" if negate else "in", [left, right])
        if self.accept_kw("BETWEEN"):
            lo = self.parse_additive()
            self.expect_kw("AND")
            hi = self.parse_additive()
            rng = ast.FuncCall("and", [
                ast.FuncCall("greaterOrEquals", [left, lo]),
                ast.FuncCall("lessOrEquals", [left, hi])])
            return ast.FuncCall("not", [rng]) if negate else rng
        if self.accept_kw("IS"):
            if self.accept_kw("NOT"):
                self.expect_kw("NULL")
                return ast.FuncCall("isNotNull", [left])
            self.expect_kw("NULL")
            return ast.FuncCall("isNull", [left])
        return left

    def parse_in_rhs(self) -> ast.Expr:
        if self.tok.kind == "op" and self.tok.text == "(":
            self.expect_op("(")
            if self.tok.is_kw("SELECT", "WITH"):
                q = self.parse_select_union()
                self.expect_op(")")
                if isinstance(q, ast.Union):
                    raise ParseError("UNION inside IN is not supported yet")
                return ast.Subquery(q)
            items = [self.parse_expr()]
            while self.accept_op(","):
                items.append(self.parse_expr())
            self.expect_op(")")
            return ast.Tuple_(items)
        return self.parse_additive()

    def parse_additive(self) -> ast.Expr:
        left = self.parse_multiplicative()
        while True:
            if self.accept_op("+"):
                left = ast.FuncCall("plus", [left, self.parse_multiplicative()])
            elif self.accept_op("-"):
                left = ast.FuncCall("minus", [left, self.parse_multiplicative()])
            elif self.accept_op("||"):
                left = ast.FuncCall("concat", [left, self.parse_multiplicative()])
            else:
                return left

    def parse_multiplicative(self) -> ast.Expr:
        left = self.parse_unary()
        while True:
            if self.accept_op("*"):
                left = ast.FuncCall("multiply", [left, self.parse_unary()])
            elif self.accept_op("/"):
                left = ast.FuncCall("divide", [left, self.parse_unary()])
            elif self.accept_op("%"):
                left = ast.FuncCall("modulo", [left, self.parse_unary()])
            else:
                return left

    def parse_unary(self) -> ast.Expr:
        if self.accept_op("-"):
            inner = self.parse_unary()
            if isinstance(inner, ast.Literal) and isinstance(inner.value,
                                                             (int, float)):
                return ast.Literal(-inner.value)
            return ast.FuncCall("negate", [inner])
        if self.accept_op("+"):
            return self.parse_unary()
        return self.parse_postfix()

    def parse_postfix(self) -> ast.Expr:
        e = self.parse_primary()
        while True:
            if isinstance(e, ast.FuncCall) and e.over is None \
                    and self.tok.is_kw("OVER"):
                self.advance()
                e = ast.FuncCall(e.name, e.args, e.params, e.distinct,
                                 over=self.parse_window_spec())
            elif self.accept_op("::"):
                tname = self.parse_type_name()
                e = ast.FuncCall("CAST", [e, ast.Literal(tname)])
            elif self.accept_op("["):
                idx = self.parse_expr()
                self.expect_op("]")
                e = ast.FuncCall("arrayElement", [e, idx])
            elif self.tok.kind == "op" and self.tok.text == "." \
                    and self.tokens[self.i + 1].kind in ("word", "number"):
                # postfix element access (ref ExpressionListParsers.cpp):
                # tuple(1,'a').2, deep dotted names j.geo.cc
                nxt = self.tokens[self.i + 1]
                if nxt.kind == "number":
                    if not nxt.text.isdigit():
                        return e
                    self.advance()
                    self.advance()
                    e = ast.FuncCall("tupleElement",
                                     [e, ast.Literal(int(nxt.text))])
                else:
                    self.advance()
                    self.advance()
                    if isinstance(e, ast.Identifier):
                        parts = tuple(e.parts) + (nxt.text,)
                        e = ast.Identifier(".".join(parts), parts)
                    else:
                        e = ast.FuncCall("tupleElement",
                                         [e, ast.Literal(nxt.text)])
            elif self.tok.kind == "number" \
                    and self.tok.text.startswith(".") \
                    and all(p.isdigit()
                            for p in self.tok.text[1:].split(".")):
                # the lexer folds '.2' (or a chain '.2.1') into one number
                # token after ')': each segment is an element access
                t = self.tok
                self.advance()
                for seg in t.text[1:].split("."):
                    e = ast.FuncCall("tupleElement",
                                     [e, ast.Literal(int(seg))])
            elif self.tok.kind == "op" and self.tok.text == "(" \
                    and isinstance(e, ast.FuncCall) and e.params is None:
                # parameterized aggregate: quantile(0.5)(x) — the first
                # argument list becomes the parameter list.
                self.expect_op("(")
                args = []
                if not (self.tok.kind == "op" and self.tok.text == ")"):
                    args.append(self.parse_expr())
                    while self.accept_op(","):
                        args.append(self.parse_expr())
                self.expect_op(")")
                e = ast.FuncCall(e.name, args, params=list(e.args))
            else:
                return e

    def parse_primary(self) -> ast.Expr:
        t = self.tok
        if t.kind == "number":
            self.advance()
            return ast.Literal(_parse_number(t.text))
        if t.kind == "string":
            self.advance()
            return ast.Literal(t.text)
        if t.kind == "op" and t.text == "*":
            self.advance()
            return ast.Star()
        if t.kind == "op" and t.text == "[":
            self.advance()
            items: List[ast.Expr] = []
            if not (self.tok.kind == "op" and self.tok.text == "]"):
                items.append(self.parse_expr())
                while self.accept_op(","):
                    items.append(self.parse_expr())
            self.expect_op("]")
            return ast.FuncCall("array", items)
        if t.kind == "op" and t.text == "(":
            self.advance()
            if self.tok.is_kw("SELECT", "WITH"):
                q = self.parse_select_union()
                self.expect_op(")")
                if isinstance(q, ast.Union):
                    raise ParseError("UNION subquery expression not supported")
                return ast.Subquery(q)
            first = self.parse_expr()
            if self.accept_op(","):
                items = [first, self.parse_expr()]
                while self.accept_op(","):
                    items.append(self.parse_expr())
                self.expect_op(")")
                return ast.Tuple_(items)
            self.expect_op(")")
            return first
        if t.kind == "word":
            up = t.text.upper()
            if up == "NULL":
                self.advance()
                return ast.Literal(None)
            if up == "TRUE":
                self.advance()
                return ast.Literal(1)
            if up == "FALSE":
                self.advance()
                return ast.Literal(0)
            if up == "CASE":
                return self.parse_case()
            if up == "CAST":
                self.advance()
                self.expect_op("(")
                e = self.parse_expr()
                if self.accept_kw("AS"):
                    tname = self.parse_type_name()
                    self.expect_op(")")
                    return ast.FuncCall("CAST", [e, ast.Literal(tname)])
                self.expect_op(",")
                tlit = self.parse_expr()
                self.expect_op(")")
                return ast.FuncCall("CAST", [e, tlit])
            if up == "INTERVAL":
                self.advance()
                n = self.parse_additive()
                unit = self.expect_word().upper()
                return ast.FuncCall(f"toInterval{unit.capitalize()}", [n])
            if up == "EXISTS" and self.tokens[self.i + 1].text == "(":
                self.advance()
                self.expect_op("(")
                q = self.parse_select_union()
                self.expect_op(")")
                if isinstance(q, ast.Union):
                    raise ParseError("UNION in EXISTS not supported")
                return ast.FuncCall("exists", [ast.Subquery(q)])
            # identifier or function call
            self.advance()
            name = t.text
            if self.accept_op("."):
                nxt = self.tok
                if nxt.kind == "op" and nxt.text == "*":
                    self.advance()
                    return ast.Star(table=name)
                part = self.expect_word()
                full = f"{name}.{part}"
                return ast.Identifier(full, (name, part))
            if self.tok.kind == "op" and self.tok.text == "(":
                self.expect_op("(")
                distinct = bool(self.accept_kw("DISTINCT"))
                args: List[ast.Expr] = []
                if not (self.tok.kind == "op" and self.tok.text == ")"):
                    args.append(self.parse_expr())
                    while self.accept_op(","):
                        args.append(self.parse_expr())
                self.expect_op(")")
                return ast.FuncCall(name, args, distinct=distinct)
            return ast.Identifier(name)
        raise ParseError(f"Unexpected token {t.text!r} at {t.pos}")

    def parse_window_spec(self) -> ast.WindowSpec:
        spec = ast.WindowSpec()
        self.expect_op("(")
        if self.accept_kw("PARTITION"):
            self.expect_kw("BY")
            spec.partition_by.append(self.parse_expr())
            while self.accept_op(","):
                spec.partition_by.append(self.parse_expr())
        if self.accept_kw("ORDER"):
            self.expect_kw("BY")
            spec.order_by.append(self.parse_order_item())
            while self.accept_op(","):
                spec.order_by.append(self.parse_order_item())
            spec.frame = "running"     # SQL default with ORDER BY
        else:
            spec.frame = "full"
        if self.tok.is_kw("ROWS", "RANGE"):
            mode = self.tok.text.lower()
            self.advance()
            if self.accept_kw("BETWEEN"):
                lo = self._parse_frame_bound(is_start=True)
                self.expect_kw("AND")
                hi = self._parse_frame_bound(is_start=False)
            else:                       # short form: frame start only
                lo = self._parse_frame_bound(is_start=True)
                hi = 0                  # .. AND CURRENT ROW
            if lo is None and hi is None:
                spec.frame = "full"
            elif mode == "range" and lo is None and hi == 0:
                spec.frame = "running"  # the SQL default (peers included)
            else:
                spec.frame = (mode, lo, hi)
        self.expect_op(")")
        return spec

    def _parse_frame_bound(self, is_start: bool):
        """-> None (unbounded), 0 (current row), or a signed row/value
        offset (negative = PRECEDING, positive = FOLLOWING)."""
        if self.accept_kw("UNBOUNDED"):
            self.expect_kw("PRECEDING" if is_start else "FOLLOWING")
            return None
        if self.accept_kw("CURRENT"):
            self.expect_kw("ROW")
            return 0
        t = self.tok
        if t.kind == "number":
            self.advance()
            n = int(t.text)
            kw = self.expect_kw("PRECEDING", "FOLLOWING")
            return -n if kw.text.upper() == "PRECEDING" else n
        raise ParseError(f"Unsupported frame bound at {self.tok.pos}")

    def parse_case(self) -> ast.Expr:
        self.expect_kw("CASE")
        operand = None
        if not self.tok.is_kw("WHEN"):
            operand = self.parse_expr()
        branches = []
        while self.accept_kw("WHEN"):
            cond = self.parse_expr()
            self.expect_kw("THEN")
            val = self.parse_expr()
            if operand is not None:
                cond = ast.FuncCall("equals", [operand, cond])
            branches.append((cond, val))
        default = None
        if self.accept_kw("ELSE"):
            default = self.parse_expr()
        self.expect_kw("END")
        args: List[ast.Expr] = []
        for c, v in branches:
            args.extend([c, v])
        if default is not None:
            args.append(default)
        return ast.FuncCall("multiIf", args)


def _parse_number(text: str):
    if text.startswith(("0x", "0X")):
        return int(text, 16)
    if any(c in text for c in ".eE") and not text.startswith("0x"):
        return float(text)
    return int(text)
