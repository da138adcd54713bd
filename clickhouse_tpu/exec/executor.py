"""Plan executor: lowers the logical plan onto device kernels.

The role of QueryPlan::buildQueryPipeline + PipelineExecutor
(src/Processors/QueryPlan/QueryPlan.cpp:166, Executors/PipelineExecutor.cpp:125)
— with the fundamental TPU-first inversion (SURVEY.md §7): instead of a
dynamic processor graph driven by a thread scheduler, the whole plan is a
single functional JAX computation over padded device arrays.  XLA is the
scheduler; operators exchange *masked blocks* (validity masks instead of
compaction), so Filter is an AND, and row movement happens only inside
sort/join/aggregate kernels that need it.

The executor is trace-compatible: running it under jax.jit compiles the whole
query into one fused XLA program (the Session decides when to jit).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import dtypes as dt
from ..core.block import Block
from ..core.column import Column, Dictionary, pad_to
from ..core.errors import (CapacityError, ExecutionError, NotImplementedError_)
from ..core.settings import Settings
from ..exprs import aggregates as agg_reg
from ..exprs.expr import ColVal, colval_from_column, evaluate
from ..exprs.functions import _string_codes_common
from ..ops import agg_ops, filter_ops, join_ops, sort_ops
from ..plan import logical as L

__all__ = ["ExecBlock", "ExecContext", "execute_plan", "materialize"]


@dataclasses.dataclass
class ExecBlock:
    """A masked block: full-capacity columns + row validity mask."""
    cols: Dict[str, ColVal]        # field id -> ColVal
    valid: jax.Array               # bool (capacity,)
    capacity: int

    def env(self) -> Dict[str, ColVal]:
        return self.cols

    def colval(self, field: L.Field) -> ColVal:
        return self.cols[field.id]


@dataclasses.dataclass
class Check:
    value: Any                     # device scalar
    limit: int
    message: str


class ExecContext:
    def __init__(self, table_blocks: Dict[Tuple[str, str], Block],
                 settings: Settings):
        self.table_blocks = table_blocks
        self.settings = settings
        self.checks: List[Check] = []
        self.profile: Dict[str, int] = {}
        self.totals: Optional[Dict[str, ColVal]] = None

    def count(self, name: str, value: int = 1):
        self.profile[name] = self.profile.get(name, 0) + value


# -- helpers -----------------------------------------------------------------

def _bool_mask(cv: ColVal, capacity: int) -> jax.Array:
    """Predicate ColVal -> bool mask (NULL -> False)."""
    cv = cv.broadcast(capacity)
    m = cv.data != jnp.zeros((), cv.data.dtype)
    if cv.validity is not None:
        m = m & cv.validity.astype(jnp.bool_)
    return m


def _key_arrays(cvs: Sequence[ColVal], capacity: int
                ) -> Tuple[List[jax.Array], List[Optional[ColVal]]]:
    """GROUP BY / join key storage arrays.  Nullable keys contribute their
    validity as an extra key column (NULLs form their own group, matching the
    reference's nullable key handling) with data normalized to 0."""
    arrays: List[jax.Array] = []
    metas: List[Optional[ColVal]] = []
    for cv in cvs:
        cv = cv.broadcast(capacity)
        data = cv.data
        if cv.validity is not None:
            v = cv.validity.astype(jnp.bool_)
            data = jnp.where(v, data, jnp.zeros((), data.dtype))
            arrays.append(v)
            metas.append(None)
        arrays.append(data)
        metas.append(cv)
    return arrays, metas


def _gather_colval(cv: ColVal, idx: jax.Array, capacity: int) -> ColVal:
    cv = cv.broadcast(capacity)
    data = cv.data[idx]
    validity = cv.validity[idx] if cv.validity is not None else None
    return ColVal(cv.dtype, data, validity, cv.dictionary)


# -- node execution ----------------------------------------------------------

def execute_plan(node: L.PlanNode, ctx: ExecContext) -> ExecBlock:
    fn = _DISPATCH.get(type(node))
    if fn is None:
        raise NotImplementedError_(f"No executor for {type(node).__name__}")
    return fn(node, ctx)


def _exec_scan(node: L.ScanNode, ctx: ExecContext) -> ExecBlock:
    blk = ctx.table_blocks[(node.database, node.table)]
    cols = {}
    for f, storage_name in zip(node.schema, node.column_names):
        cols[f.id] = colval_from_column(blk[storage_name])
    cap = blk.capacity
    n = blk.num_rows
    valid = jnp.arange(cap) < jnp.asarray(n)
    ctx.count("rows_scanned", int(n) if isinstance(n, (int, np.integer)) else 0)
    return ExecBlock(cols, valid, cap)


def _exec_onerow(node: L.OneRowNode, ctx: ExecContext) -> ExecBlock:
    cap = 1024
    f = node.schema[0]
    cols = {f.id: ColVal(f.dtype, jnp.zeros((cap,), f.dtype.jnp_dtype))}
    valid = jnp.arange(cap) < 1
    return ExecBlock(cols, valid, cap)


def _exec_numbers(node: L.NumbersNode, ctx: ExecContext) -> ExecBlock:
    cap = pad_to(node.count)
    f = node.schema[0]
    data = (jnp.arange(cap, dtype=jnp.uint64) + jnp.uint64(node.start))
    valid = jnp.arange(cap) < node.count
    return ExecBlock({f.id: ColVal(f.dtype, data)}, valid, cap)


def _exec_filter(node: L.FilterNode, ctx: ExecContext) -> ExecBlock:
    child = execute_plan(node.child, ctx)
    pred = evaluate(node.predicate, child.env())
    mask = _bool_mask(pred, child.capacity)
    return ExecBlock(child.cols, child.valid & mask, child.capacity)


def _exec_project(node: L.ProjectNode, ctx: ExecContext) -> ExecBlock:
    child = execute_plan(node.child, ctx)
    cols = {}
    for f, e in zip(node.schema, node.exprs):
        cv = evaluate(e, child.env())
        cols[f.id] = cv.broadcast(child.capacity)
    return ExecBlock(cols, child.valid, child.capacity)


def _exec_aggregate(node: L.AggregateNode, ctx: ExecContext) -> ExecBlock:
    child = execute_plan(node.child, ctx)
    cap = child.capacity
    s = ctx.settings

    key_cvs = [evaluate(e, child.env()) for _, e in node.keys]
    global_agg = not key_cvs
    if global_agg:
        # keys=[]: single group; aggregate over everything
        key_arrays = [jnp.zeros((cap,), jnp.int32)]
        key_metas: List[Optional[ColVal]] = [None]
        cap_g = 1024
    else:
        key_arrays, key_metas = _key_arrays(key_cvs, cap)
        cap_g = pad_to(min(cap, s.max_groups))

    grouping = agg_ops.group_by_sort(key_arrays, child.valid, cap_g)
    ctx.checks.append(Check(grouping.num_groups, cap_g,
                            "GROUP BY cardinality exceeded max_groups; "
                            "raise the max_groups setting"))

    gctx = agg_reg.GroupContext(keys=key_arrays, row_valid=child.valid,
                                grouping=grouping, num_groups_cap=cap_g)

    # Per-group row counts (for empty-group defaults & finalize fixups)
    mask_s = grouping.take(child.valid)
    ids = jnp.where(mask_s, grouping.group_ids, cap_g)
    group_counts = agg_ops.segment_reduce(
        "sum", jnp.ones((cap,), jnp.int64), ids, cap_g)

    cols: Dict[str, ColVal] = {}
    # key outputs: unique key values (skip the validity helper columns)
    ki = 0
    for (f, _), cv in zip(node.keys, key_cvs):
        cv_b = cv.broadcast(cap)
        if cv_b.validity is not None:
            uk_validity = grouping.unique_keys[ki].astype(jnp.uint8)
            ki += 1
            uk = grouping.unique_keys[ki]
            cols[f.id] = ColVal(f.dtype, uk, uk_validity, cv_b.dictionary)
        else:
            uk = grouping.unique_keys[ki]
            cols[f.id] = ColVal(f.dtype, uk, None, cv_b.dictionary)
        ki += 1

    for item in node.aggregates:
        arg_cvs = [evaluate(a, child.env()).broadcast(cap) for a in item.args]
        cond = None
        if item.cond is not None:
            cond = _bool_mask(evaluate(item.cond, child.env()), cap)
        states = item.fn.update(gctx, arg_cvs, cond)
        data, validity = item.fn.finalize(states)
        # Empty groups (only possible for the global aggregate or after
        # -If/NULL masking) return the dtype's identity from segment ops;
        # normalize to the reference's defaults (0 / empty).
        if not isinstance(item.fn, agg_reg.CountAgg):
            zero = jnp.zeros((), data.dtype)
            data = jnp.where(group_counts > 0, data, zero)
        dict_ = arg_cvs[0].dictionary if (item.args
                                          and item.field.dtype.is_dictionary) \
            else None
        cols[item.field.id] = ColVal(item.field.dtype, data, validity, dict_)

    if global_agg:
        num_groups = jnp.maximum(grouping.num_groups, 1)
    else:
        num_groups = grouping.num_groups
    valid = jnp.arange(cap_g, dtype=jnp.int64) < num_groups
    return ExecBlock(cols, valid, cap_g)


def _token_for_sort(cv: ColVal, item: L.SortItem, capacity: int) -> jax.Array:
    cv = cv.broadcast(capacity)
    rank = None
    if cv.dtype.is_dictionary:
        d = cv.dictionary
        if d is not None and len(d):
            vals = d.values.astype(str)
            order = np.argsort(vals, kind="stable")
            r = np.empty(len(vals), np.int64)
            r[order] = np.arange(len(vals))
            rank = jnp.asarray(r)[jnp.maximum(cv.data, 0)]
        else:
            rank = jnp.zeros(cv.data.shape, jnp.int64)
    return sort_ops.order_token(cv.data, descending=item.descending,
                                validity=cv.validity,
                                nulls_last=(item.nulls_last
                                            if not item.descending
                                            else item.nulls_last),
                                rank=rank)


def _exec_sort(node: L.SortNode, ctx: ExecContext) -> ExecBlock:
    child = execute_plan(node.child, ctx)
    cap = child.capacity
    tokens = [_token_for_sort(evaluate(i.expr, child.env()), i, cap)
              for i in node.items]
    n_valid = jnp.sum(child.valid.astype(jnp.int64))

    s = ctx.settings
    if (node.limit_hint is not None and len(tokens) == 1
            and node.limit_hint <= s.limit_pushdown_threshold
            and node.limit_hint < cap):
        k = int(node.limit_hint)
        idx = sort_ops.topk_permutation(tokens[0], child.valid, k)
        out_cap = pad_to(k)
        pad_idx = jnp.zeros((out_cap,), jnp.int32)
        idx_full = pad_idx.at[:k].set(idx)
        cols = {fid: _gather_colval(cv, idx_full, cap)
                for fid, cv in child.cols.items()}
        valid = jnp.arange(out_cap, dtype=jnp.int64) < jnp.minimum(n_valid, k)
        return ExecBlock(cols, valid, out_cap)

    perm = sort_ops.sort_permutation(tokens, child.valid)
    cols = {fid: _gather_colval(cv, perm, cap)
            for fid, cv in child.cols.items()}
    valid = jnp.arange(cap, dtype=jnp.int64) < n_valid
    return ExecBlock(cols, valid, cap)


def _exec_limit(node: L.LimitNode, ctx: ExecContext) -> ExecBlock:
    child = execute_plan(node.child, ctx)
    rank = jnp.cumsum(child.valid.astype(jnp.int64)) - 1
    keep = child.valid & (rank >= node.offset)
    if node.limit >= 0:
        keep = keep & (rank < node.offset + node.limit)
    return ExecBlock(child.cols, keep, child.capacity)


def _exec_limit_by(node: L.LimitByNode, ctx: ExecContext) -> ExecBlock:
    child = execute_plan(node.child, ctx)
    cap = child.capacity
    key_cvs = [evaluate(e, child.env()) for e in node.keys]
    key_arrays, _ = _key_arrays(key_cvs, cap)
    cap_g = pad_to(min(cap, ctx.settings.max_groups))
    g = agg_ops.group_by_sort(key_arrays, child.valid, cap_g)
    mask_s = g.take(child.valid)
    ids = jnp.where(mask_s, g.group_ids, cap_g)
    lens = agg_ops.segment_reduce("sum", mask_s.astype(jnp.int64), ids, cap_g)
    starts = jnp.cumsum(lens) - lens
    pos_in_group = (jnp.cumsum(mask_s.astype(jnp.int64)) - 1
                    - starts[jnp.minimum(ids, cap_g - 1)])
    keep_sorted = mask_s & (pos_in_group >= node.offset) \
        & (pos_in_group < node.offset + node.n)
    # scatter the keep decision back to original row order
    keep = jnp.zeros((cap,), jnp.bool_).at[g.perm].set(keep_sorted)
    return ExecBlock(child.cols, child.valid & keep, cap)


def _exec_distinct(node: L.DistinctNode, ctx: ExecContext) -> ExecBlock:
    child = execute_plan(node.child, ctx)
    cap = child.capacity
    cvs = [child.cols[f.id] for f in node.schema]
    key_arrays, _ = _key_arrays(cvs, cap)
    cap_g = pad_to(min(cap, ctx.settings.max_groups))
    g = agg_ops.group_by_sort(key_arrays, child.valid, cap_g)
    ctx.checks.append(Check(g.num_groups, cap_g,
                            "DISTINCT cardinality exceeded max_groups"))
    cols = {}
    ki = 0
    for f, cv in zip(node.schema, cvs):
        cv_b = cv.broadcast(cap)
        if cv_b.validity is not None:
            uv = g.unique_keys[ki].astype(jnp.uint8)
            ki += 1
            cols[f.id] = ColVal(cv_b.dtype, g.unique_keys[ki], uv,
                                cv_b.dictionary)
        else:
            cols[f.id] = ColVal(cv_b.dtype, g.unique_keys[ki], None,
                                cv_b.dictionary)
        ki += 1
    valid = jnp.arange(cap_g, dtype=jnp.int64) < g.num_groups
    return ExecBlock(cols, valid, cap_g)


def _unify_join_keys(lk: ColVal, rk: ColVal, lcap: int, rcap: int):
    """Common representation of one join key pair (dictionary unification
    for strings, numeric supertype cast otherwise)."""
    lk = lk.broadcast(lcap)
    rk = rk.broadcast(rcap)
    if lk.dtype.is_dictionary and rk.dtype.is_dictionary:
        la, ra, _merged = _string_codes_common(lk, rk)
        return la, ra, lk.validity, rk.validity
    ct = np.promote_types(lk.data.dtype, rk.data.dtype)
    return lk.data.astype(ct), rk.data.astype(ct), lk.validity, rk.validity


def _exec_join(node: L.JoinNode, ctx: ExecContext) -> ExecBlock:
    left = execute_plan(node.left, ctx)
    right = execute_plan(node.right, ctx)
    lcap, rcap = left.capacity, right.capacity
    s = ctx.settings

    if node.kind == "cross":
        lkeys = [jnp.zeros((lcap,), jnp.int32)]
        rkeys = [jnp.zeros((rcap,), jnp.int32)]
        probe_ok = left.valid
        build_ok = right.valid
    else:
        lkey_cvs = [evaluate(e, left.env()) for e in node.left_keys]
        rkey_cvs = [evaluate(e, right.env()) for e in node.right_keys]
        lkeys, rkeys = [], []
        probe_ok = left.valid
        build_ok = right.valid
        for lk_cv, rk_cv in zip(lkey_cvs, rkey_cvs):
            la, ra, lv, rv = _unify_join_keys(lk_cv, rk_cv, lcap, rcap)
            lkeys.append(la)
            rkeys.append(ra)
            if lv is not None:     # NULL keys never match
                probe_ok = probe_ok & lv.astype(jnp.bool_)
            if rv is not None:
                build_ok = build_ok & rv.astype(jnp.bool_)

    cap_g = pad_to(min(rcap, s.max_join_build_rows))
    table = join_ops.build_join_table(rkeys, build_ok, cap_g)
    matched_gid = join_ops.probe_join_table(table, lkeys, probe_ok)

    if node.strictness in ("semi", "anti"):
        matched = matched_gid >= 0
        keep = matched if node.strictness == "semi" else ~matched
        return ExecBlock(left.cols, left.valid & keep, lcap)

    left_outer = node.kind == "left"
    any_join = node.strictness == "any"
    if node.kind == "cross":
        out_cap = pad_to(min(lcap * rcap, 1 << 24))
    else:
        out_cap = lcap
    p_idx, b_idx, mmask, out_count = join_ops.expand_matches(
        table, matched_gid, left.valid, out_cap,
        left=left_outer, any_join=any_join)
    ctx.checks.append(Check(out_count, out_cap,
                            "JOIN result exceeded the output capacity; raise "
                            "max_block_size / join capacity settings"))

    cols: Dict[str, ColVal] = {}
    left_ids = {f.id for f in node.left.schema}
    for f in node.schema:
        if f.id in left_ids:
            cols[f.id] = _gather_colval(left.cols[f.id], p_idx, lcap)
        else:
            cv = right.cols[f.id].broadcast(rcap)
            data = cv.data[jnp.clip(b_idx, 0, rcap - 1)]
            validity = cv.validity[jnp.clip(b_idx, 0, rcap - 1)] \
                if cv.validity is not None else None
            if left_outer:
                # join_use_nulls=0 semantics: unmatched -> default value
                if s.join_use_nulls or cv.dtype.nullable:
                    v = validity if validity is not None \
                        else jnp.ones(data.shape, jnp.uint8)
                    validity = jnp.where(mmask, v, 0).astype(jnp.uint8)
                else:
                    default = _default_scalar(cv)
                    data = jnp.where(mmask, data, default)
            cols[f.id] = ColVal(cv.dtype, data, validity, cv.dictionary)

    j = jnp.arange(out_cap, dtype=jnp.int64)
    valid = j < out_count
    if node.kind != "left":
        valid = valid & mmask
    out = ExecBlock(cols, valid, out_cap)

    if node.residual is not None:
        pred = evaluate(node.residual, out.env())
        out = ExecBlock(out.cols, out.valid & _bool_mask(pred, out_cap),
                        out_cap)
    return out


def _default_scalar(cv: ColVal):
    if cv.dtype.is_dictionary:
        # default string is '' — ensure the dictionary has it
        d = cv.dictionary
        if d is not None:
            code = d.lookup("")
            if code < 0:
                d.values = np.append(d.values, "")
                d._index = None
                code = len(d.values) - 1
            return jnp.asarray(code, cv.data.dtype)
        return jnp.zeros((), cv.data.dtype)
    return jnp.zeros((), cv.data.dtype)


def _exec_union(node: L.UnionNode, ctx: ExecContext) -> ExecBlock:
    blocks = [execute_plan(c, ctx) for c in node.inputs]
    out_cap = sum(b.capacity for b in blocks)
    cols: Dict[str, ColVal] = {}
    for i, f in enumerate(node.schema):
        pieces, vals, dicts = [], [], []
        for b, child in zip(blocks, node.inputs):
            cf = child.schema[i]
            cv = b.cols[cf.id].broadcast(b.capacity)
            pieces.append(cv)
            dicts.append(cv.dictionary)
        if f.dtype.is_dictionary:
            # unify all dictionaries (host, trace-time)
            merged = None
            recoded = []
            for cv in pieces:
                d = cv.dictionary or Dictionary(np.asarray([], object))
                if merged is None:
                    merged = d
                    recoded.append(cv.data)
                else:
                    merged, ra, rb = Dictionary.unify(merged, d)
                    lut = jnp.asarray(rb)
                    recoded = [jnp.asarray(ra)[jnp.maximum(x, 0)]
                               for x in recoded]
                    recoded.append(lut[jnp.maximum(cv.data, 0)]
                                   if len(rb) else cv.data)
            data = jnp.concatenate(recoded)
            dict_ = merged
        else:
            st = dt.remove_nullable(f.dtype).jnp_dtype
            data = jnp.concatenate([cv.data.astype(st) for cv in pieces])
            dict_ = None
        if any(cv.validity is not None for cv in pieces):
            validity = jnp.concatenate(
                [cv.validity if cv.validity is not None
                 else jnp.ones((cv.data.shape[0],), jnp.uint8)
                 for cv in pieces])
        else:
            validity = None
        cols[f.id] = ColVal(f.dtype, data, validity, dict_)
    valid = jnp.concatenate([b.valid for b in blocks])
    return ExecBlock(cols, valid, out_cap)


_DISPATCH: Dict[type, Callable] = {
    L.ScanNode: _exec_scan,
    L.OneRowNode: _exec_onerow,
    L.NumbersNode: _exec_numbers,
    L.FilterNode: _exec_filter,
    L.ProjectNode: _exec_project,
    L.AggregateNode: _exec_aggregate,
    L.SortNode: _exec_sort,
    L.LimitNode: _exec_limit,
    L.LimitByNode: _exec_limit_by,
    L.DistinctNode: _exec_distinct,
    L.JoinNode: _exec_join,
    L.UnionNode: _exec_union,
}


# -- materialization ---------------------------------------------------------

def materialize(block: ExecBlock, schema: List[L.Field],
                ctx: ExecContext) -> Dict[str, np.ndarray]:
    """Pull the visible rows to host, in order (first host sync point)."""
    valid_np = np.asarray(jax.device_get(block.valid))
    for check in ctx.checks:
        actual = int(jax.device_get(check.value))
        if actual > check.limit:
            raise CapacityError(f"{check.message} (needed {actual}, "
                                f"capacity {check.limit})")
    out: Dict[str, np.ndarray] = {}
    used = {}
    for f in schema:
        cv = block.cols[f.id].broadcast(block.capacity)
        data = np.asarray(jax.device_get(cv.data))[valid_np]
        if cv.dtype.is_dictionary:
            codes = data.astype(np.int64)
            vals = np.empty(len(codes), object)
            d = cv.dictionary
            ok = (codes >= 0) & (codes < (len(d) if d else 0))
            if d is not None and len(d):
                vals[ok] = d.values[codes[ok]]
            vals[~ok] = ""
            data = vals
        if cv.validity is not None:
            v = np.asarray(jax.device_get(cv.validity))[valid_np]
            if data.dtype != object:
                data = data.astype(object)
            else:
                data = data.copy()
            data[v == 0] = None
        name = f.display
        if name in out:   # duplicate display names: disambiguate
            k = 1
            while f"{name}_{k}" in out:
                k += 1
            name = f"{name}_{k}"
        out[name] = data
    return out
