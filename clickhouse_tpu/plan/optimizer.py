"""Logical plan optimizer.

Analog of the reference's QueryPlan optimization passes
(src/Processors/QueryPlan/Optimizations/optimizeTree.cpp:23,121).  Round-1
rule set (the highest-leverage ones for a columnar engine):

  * column pruning     -- trim unused columns all the way into ScanNode
                          (the reference gets this from per-step header
                          tracking; for us it avoids HBM residency + transfer)
  * unused aggregates  -- drop aggregate items nobody reads
  * filter fusion      -- merge adjacent FilterNodes into one predicate

Top-N (limit -> sort hint) is applied by the analyzer; scan-level predicate
pruning (minmax/KeyCondition analog) hooks in here once parts expose stats.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Set

from ..core.settings import Settings
from ..exprs.expr import BoundCall, BoundColumn, BoundExpr, BoundInList
from . import logical as L

__all__ = ["optimize_plan", "expr_column_refs"]


def expr_column_refs(e: BoundExpr, out: Optional[Set[str]] = None) -> Set[str]:
    if out is None:
        out = set()
    if isinstance(e, BoundColumn):
        out.add(e.name)
    for c in e.children():
        expr_column_refs(c, out)
    return out


def optimize_plan(plan: L.PlanNode, settings: Settings) -> L.PlanNode:
    plan = _fuse_filters(plan)
    _push_limit_into_numbers(plan)
    needed = {f.id for f in plan.schema}
    _prune_columns(plan, needed)
    return plan


def _push_limit_into_numbers(node: L.PlanNode) -> None:
    """LIMIT n over a projection chain on the virtual numbers source shrinks
    the source itself (the reference reads only ceil(n/block) blocks from
    system.numbers; for us it shrinks the static capacity)."""
    if isinstance(node, L.LimitNode) and node.limit >= 0:
        child = node.child
        while isinstance(child, L.ProjectNode):
            child = child.child
        if isinstance(child, L.NumbersNode):
            child.count = min(child.count, node.limit + max(node.offset, 0))
    for c in node.children():
        _push_limit_into_numbers(c)


def _fuse_filters(node: L.PlanNode) -> L.PlanNode:
    for attr in ("child", "left", "right"):
        if hasattr(node, attr):
            setattr(node, attr, _fuse_filters(getattr(node, attr)))
    if isinstance(node, L.UnionNode):
        node.inputs = [_fuse_filters(c) for c in node.inputs]
    if isinstance(node, L.FilterNode) and isinstance(node.child, L.FilterNode):
        inner = node.child
        from ..core import dtypes as dt
        combined = BoundCall("and", [inner.predicate, node.predicate],
                             dt.UInt8)
        return L.FilterNode(inner.child, combined, node.schema)
    return node


def _prune_columns(node: L.PlanNode, needed: Set[str]) -> None:
    """Push the set of needed field ids down, trimming producers."""
    if isinstance(node, L.ScanNode):
        keep = [(f, n) for f, n in zip(node.schema, node.column_names)
                if f.id in needed
                or (node.final and n in node.order_by_cols)]
        if not keep:        # keep at least one column to carry the row count
            keep = [(node.schema[0], node.column_names[0])]
        node.schema = [f for f, _ in keep]
        node.column_names = [n for _, n in keep]
        return
    if isinstance(node, (L.OneRowNode, L.NumbersNode)):
        return
    if isinstance(node, L.FilterNode):
        child_needed = set(needed) | expr_column_refs(node.predicate)
        _prune_columns(node.child, child_needed)
        node.schema = [f for f in node.child.schema]
        return
    if isinstance(node, L.ProjectNode):
        keep = [(f, e) for f, e in zip(node.schema, node.exprs)
                if f.id in needed]
        if not keep:
            keep = [(node.schema[0], node.exprs[0])]
        node.schema = [f for f, _ in keep]
        node.exprs = [e for _, e in keep]
        child_needed: Set[str] = set()
        for e in node.exprs:
            expr_column_refs(e, child_needed)
        _prune_columns(node.child, child_needed)
        return
    if isinstance(node, L.AggregateNode):
        node.aggregates = [a for a in node.aggregates if a.field.id in needed]
        child_needed: Set[str] = set()
        for _, e in node.keys:
            expr_column_refs(e, child_needed)
        for a in node.aggregates:
            for e in a.args:
                expr_column_refs(e, child_needed)
            if a.cond is not None:
                expr_column_refs(a.cond, child_needed)
        if not child_needed and isinstance(node.child, L.PlanNode):
            # global count(): still need one column for the row mask
            for f in node.child.schema[:1]:
                child_needed.add(f.id)
        _prune_columns(node.child, child_needed)
        node.schema = [f for f, _ in node.keys] + [a.field
                                                   for a in node.aggregates]
        return
    if isinstance(node, L.SortNode):
        child_needed = set(needed)
        for i in node.items:
            expr_column_refs(i.expr, child_needed)
        _prune_columns(node.child, child_needed)
        node.schema = [f for f in node.child.schema]
        return
    if isinstance(node, (L.LimitNode,)):
        _prune_columns(node.child, set(needed))
        node.schema = [f for f in node.child.schema]
        return
    if isinstance(node, L.LimitByNode):
        child_needed = set(needed)
        for e in node.keys:
            expr_column_refs(e, child_needed)
        _prune_columns(node.child, child_needed)
        node.schema = [f for f in node.child.schema]
        return
    if isinstance(node, L.ArrayJoinNode):
        child_needed = set(needed) - {node.out_field.id}
        expr_column_refs(node.array_expr, child_needed)
        _prune_columns(node.child, child_needed)
        kept = {f.id for f in node.child.schema}
        node.schema = [f for f in node.schema
                       if f.id in kept or f.id == node.out_field.id]
        return
    if isinstance(node, L.WindowNode):
        child_needed = set(needed) - {i.field.id for i in node.items}
        for i in node.items:
            for e in i.args + i.partition_by:
                expr_column_refs(e, child_needed)
            for si in i.order_by:
                expr_column_refs(si.expr, child_needed)
        _prune_columns(node.child, child_needed)
        kept = {f.id for f in node.child.schema}
        node.schema = [f for f in node.schema
                       if f.id in kept or f.id in {i.field.id
                                                   for i in node.items}]
        return
    if isinstance(node, L.DistinctNode):
        # DISTINCT semantics depend on its full schema — keep everything
        _prune_columns(node.child, {f.id for f in node.schema})
        return
    if isinstance(node, L.JoinNode):
        left_ids = {f.id for f in node.left.schema}
        lneed: Set[str] = set()
        rneed: Set[str] = set()
        for e in node.left_keys:
            expr_column_refs(e, lneed)
        for e in node.right_keys:
            expr_column_refs(e, rneed)
        if node.asof_left is not None:
            expr_column_refs(node.asof_left, lneed)
        if node.asof_right is not None:
            expr_column_refs(node.asof_right, rneed)
        extra: Set[str] = set(needed)
        if node.residual is not None:
            expr_column_refs(node.residual, extra)
        for fid in extra:
            (lneed if fid in left_ids else rneed).add(fid)
        _prune_columns(node.left, lneed)
        _prune_columns(node.right, rneed)
        kept_left = {f.id for f in node.left.schema}
        kept_right = {f.id for f in node.right.schema}
        node.schema = [f for f in node.schema
                       if f.id in kept_left or f.id in kept_right
                       or f.id in needed]
        return
    if isinstance(node, L.UnionNode):
        # positional: keep positions needed in the union output
        keep_pos = [i for i, f in enumerate(node.schema) if f.id in needed]
        if not keep_pos:
            keep_pos = [0]
        node.schema = [node.schema[i] for i in keep_pos]
        for child in node.inputs:
            child_ids = {child.schema[i].id for i in keep_pos}
            _prune_columns(child, child_ids)
            child.schema = [f for f in child.schema if f.id in child_ids]
        return
    # default: pass everything through
    for c in node.children():
        _prune_columns(c, {f.id for f in c.schema})
