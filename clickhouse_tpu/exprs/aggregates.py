"""Aggregate function registry with the mergeable-state algebra.

The analog of the reference's IAggregateFunction
(src/AggregateFunctions/IAggregateFunction.h:55): each function defines
  * update  -- rows -> per-group partial states (add/addBatch analog)
  * merge   -- partial states re-grouped by key -> combined states
  * finalize-- states -> result column (insertResultInto analog)
States are ordinary fixed-width columns, so partial aggregation results ship
through the exact machinery of regular blocks — the property behind two-stage
distributed aggregation (QueryProcessingStage::WithMergeableState,
ColumnAggregateFunction made unnecessary by keeping states columnar).

Combinators (-If; reference: AggregateFunctionCombinatorFactory) wrap the row
mask.  `holistic` functions (uniqExact, quantileExact, median) need all rows
of a group co-located; the distributed planner repartitions by key for them
instead of two-stage merging (SURVEY.md §2.6 partition-parallel aggregation).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import dtypes as dt
from ..core.errors import TypeError_, UnknownFunction
from ..ops import agg_ops, sort_ops
from .expr import ColVal

__all__ = ["AggregateFunction", "get_aggregate", "is_aggregate_name",
           "AGGREGATES", "GroupContext"]


@dataclasses.dataclass
class GroupContext:
    """Everything an aggregate needs to produce per-group states."""
    keys: List[jax.Array]          # raw (unsorted) key storage arrays
    row_valid: jax.Array           # raw bool mask
    grouping: agg_ops.Grouping     # primary grouping (sorted by keys)
    num_groups_cap: int

    def sorted_mask(self, extra_valid=None) -> jax.Array:
        m = self.grouping.take(self.row_valid)
        if extra_valid is not None:
            m = m & self.grouping.take(extra_valid)
        return m

    def ids_where(self, mask_sorted) -> jax.Array:
        """Group ids with rows failing `mask_sorted` pushed out of range."""
        return jnp.where(mask_sorted, self.grouping.group_ids,
                         self.num_groups_cap)


def _arg_valid(cv: Optional[ColVal], capacity: int):
    if cv is None or cv.validity is None:
        return None
    v = cv.validity.astype(jnp.bool_)
    if v.ndim == 0:
        v = jnp.broadcast_to(v, (capacity,))
    return v


class AggregateFunction:
    """Base class.  Subclasses set `state_ops` (merge op per state column)."""

    name: str = ""
    holistic: bool = False

    def __init__(self, arg_types: List[dt.DType]):
        self.arg_types = arg_types

    # -- interface -----------------------------------------------------------
    def result_type(self) -> dt.DType:
        raise NotImplementedError

    def state_ops(self) -> List[str]:
        """Merge op per state column: sum|min|max|any."""
        raise NotImplementedError

    def update(self, ctx: GroupContext, args: List[ColVal],
               cond: Optional[jax.Array]) -> List[jax.Array]:
        """args are *raw* (unsorted) column values; cond is a raw bool mask
        from an -If combinator (or None)."""
        raise NotImplementedError

    def merge(self, states: List[jax.Array], group_ids: jax.Array,
              num_segments: int) -> List[jax.Array]:
        return [agg_ops.segment_reduce(op, s, group_ids, num_segments)
                for op, s in zip(self.state_ops(), states)]

    def finalize(self, states: List[jax.Array]
                 ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """-> (data, validity or None), each (num_groups_cap,)."""
        raise NotImplementedError

    # -- helpers -------------------------------------------------------------
    def _mask_and_ids(self, ctx: GroupContext, args: List[ColVal],
                      cond: Optional[jax.Array]):
        cap = ctx.row_valid.shape[0]
        extra = None
        for a in args:
            av = _arg_valid(a, cap)
            if av is not None:
                extra = av if extra is None else (extra & av)
        if cond is not None:
            extra = cond if extra is None else (extra & cond)
        mask_s = ctx.sorted_mask(extra)
        return mask_s, ctx.ids_where(mask_s)


# -- concrete aggregates -----------------------------------------------------

class CountAgg(AggregateFunction):
    name = "count"

    def result_type(self):
        return dt.UInt64

    def state_ops(self):
        return ["sum"]

    def update(self, ctx, args, cond):
        mask_s, ids = self._mask_and_ids(ctx, args, cond)
        ones = jnp.ones(mask_s.shape, jnp.int64)
        return [agg_ops.segment_reduce("sum", ones, ids, ctx.num_groups_cap,
                               ctx.grouping.ids_sorted)]

    def finalize(self, states):
        return states[0].astype(jnp.uint64), None


def _sum_state_dtype(t: dt.DType):
    t0 = dt.remove_nullable(t)
    if dt.is_float(t0):
        return jnp.float64
    if t0.np_dtype.kind == "u":
        return jnp.uint64
    return jnp.int64


class SumAgg(AggregateFunction):
    name = "sum"

    def result_type(self):
        t0 = dt.remove_nullable(self.arg_types[0])
        if dt.is_float(t0):
            return dt.Float64
        return dt.UInt64 if t0.np_dtype.kind == "u" else dt.Int64

    def state_ops(self):
        return ["sum"]

    def update(self, ctx, args, cond):
        mask_s, ids = self._mask_and_ids(ctx, args, cond)
        st = _sum_state_dtype(self.arg_types[0])
        v = ctx.grouping.take(args[0].broadcast(ctx.row_valid.shape[0]).data)
        v = v.astype(st)
        v = jnp.where(mask_s, v, jnp.zeros((), st))
        return [agg_ops.segment_reduce("sum", v, ids, ctx.num_groups_cap,
                               ctx.grouping.ids_sorted)]

    def finalize(self, states):
        return states[0], None


class MinMaxAgg(AggregateFunction):
    op = "min"

    def result_type(self):
        return dt.remove_nullable(self.arg_types[0])

    def state_ops(self):
        return [self.op]

    def update(self, ctx, args, cond):
        mask_s, ids = self._mask_and_ids(ctx, args, cond)
        v = ctx.grouping.take(args[0].broadcast(ctx.row_valid.shape[0]).data)
        return [agg_ops.segment_reduce(self.op, v, ids, ctx.num_groups_cap,
                               ctx.grouping.ids_sorted)]

    def finalize(self, states):
        return states[0], None


class MinAgg(MinMaxAgg):
    name, op = "min", "min"


class MaxAgg(MinMaxAgg):
    name, op = "max", "max"


class AvgAgg(AggregateFunction):
    name = "avg"

    def result_type(self):
        return dt.Float64

    def state_ops(self):
        return ["sum", "sum"]

    def update(self, ctx, args, cond):
        mask_s, ids = self._mask_and_ids(ctx, args, cond)
        v = ctx.grouping.take(args[0].broadcast(ctx.row_valid.shape[0]).data)
        v = jnp.where(mask_s, v.astype(jnp.float64), 0.0)
        ones = jnp.ones(mask_s.shape, jnp.int64)
        ss = ctx.grouping.ids_sorted
        return [agg_ops.segment_reduce("sum", v, ids, ctx.num_groups_cap, ss),
                agg_ops.segment_reduce("sum", ones, ids, ctx.num_groups_cap, ss)]

    def finalize(self, states):
        s, c = states
        safe = jnp.maximum(c, 1)
        return s / safe.astype(jnp.float64), None


class AnyAgg(AggregateFunction):
    name = "any"

    def result_type(self):
        return self.arg_types[0]

    def state_ops(self):
        return ["any"]

    def update(self, ctx, args, cond):
        mask_s, ids = self._mask_and_ids(ctx, args, cond)
        v = ctx.grouping.take(args[0].broadcast(ctx.row_valid.shape[0]).data)
        return [agg_ops.segment_reduce("any", v, ids, ctx.num_groups_cap,
                               ctx.grouping.ids_sorted)]

    def finalize(self, states):
        return states[0], None


class SumSquaresMixin(AggregateFunction):
    """Shared states for variance family: [sum, sum_sq, count]."""

    def state_ops(self):
        return ["sum", "sum", "sum"]

    def result_type(self):
        return dt.Float64

    def update(self, ctx, args, cond):
        mask_s, ids = self._mask_and_ids(ctx, args, cond)
        v = ctx.grouping.take(args[0].broadcast(ctx.row_valid.shape[0]).data)
        v = jnp.where(mask_s, v.astype(jnp.float64), 0.0)
        ones = jnp.ones(mask_s.shape, jnp.int64)
        n = ctx.num_groups_cap
        ss = ctx.grouping.ids_sorted
        return [agg_ops.segment_reduce("sum", v, ids, n, ss),
                agg_ops.segment_reduce("sum", v * v, ids, n, ss),
                agg_ops.segment_reduce("sum", ones, ids, n, ss)]

    def _moments(self, states):
        s, s2, c = states
        cf = jnp.maximum(c, 1).astype(jnp.float64)
        mean = s / cf
        var = s2 / cf - mean * mean
        return jnp.maximum(var, 0.0), c.astype(jnp.float64)


class VarPopAgg(SumSquaresMixin):
    name = "varPop"

    def finalize(self, states):
        var, _ = self._moments(states)
        return var, None


class VarSampAgg(SumSquaresMixin):
    name = "varSamp"

    def finalize(self, states):
        var, c = self._moments(states)
        corr = c / jnp.maximum(c - 1.0, 1.0)
        return var * corr, None


class StddevPopAgg(VarPopAgg):
    name = "stddevPop"

    def finalize(self, states):
        var, _ = self._moments(states)
        return jnp.sqrt(var), None


class StddevSampAgg(VarSampAgg):
    name = "stddevSamp"

    def finalize(self, states):
        v, _ = VarSampAgg.finalize(self, states)
        return jnp.sqrt(v), None


class ArgMinMaxAgg(AggregateFunction):
    """argMin(val, ord) / argMax: value at the extremum of ord.

    States: [best_token(u64, min-merged), value_at_best(any-merged)] — after
    the token reduce, a second masked scatter picks the value whose token
    equals the group's best (deterministic for ties up to 'any' semantics).
    """
    minimize = True

    def result_type(self):
        return dt.remove_nullable(self.arg_types[0])

    def state_ops(self):
        return ["min", "any"]

    def _token(self, ord_cv: ColVal, cap):
        tok = sort_ops.order_token(ord_cv.broadcast(cap).data,
                                   descending=not self.minimize)
        return tok

    def update(self, ctx, args, cond):
        cap = ctx.row_valid.shape[0]
        mask_s, ids = self._mask_and_ids(ctx, args, cond)
        val = ctx.grouping.take(args[0].broadcast(cap).data)
        tok = ctx.grouping.take(self._token(args[1], cap))
        tok = jnp.where(mask_s, tok, jnp.uint64(2**64 - 1))
        n = ctx.num_groups_cap
        ss = ctx.grouping.ids_sorted
        best = agg_ops.segment_reduce("min", tok, ids, n, ss)
        at_best = mask_s & (tok == best[jnp.minimum(ids, n - 1)])
        ids2 = jnp.where(at_best, ids, n)
        value = agg_ops.segment_reduce("any", val, ids2, n, ss)
        return [best, value]

    def merge(self, states, group_ids, num_segments):
        tok, val = states
        best = agg_ops.segment_reduce("min", tok, group_ids, num_segments)
        at_best = tok == best[jnp.minimum(group_ids, num_segments - 1)]
        ids2 = jnp.where(at_best & (group_ids < num_segments),
                         group_ids, num_segments)
        value = agg_ops.segment_reduce("any", val, ids2, num_segments)
        return [best, value]

    def finalize(self, states):
        return states[1], None


class ArgMinAgg(ArgMinMaxAgg):
    name, minimize = "argMin", True


class ArgMaxAgg(ArgMinMaxAgg):
    name, minimize = "argMax", False


class UniqExactAgg(AggregateFunction):
    """Exact distinct count — holistic (needs all rows of a key together).

    Single-node: secondary grouping by (keys, value); distinct count per key =
    number of (key,value) boundary rows landing in the key's group.
    """
    name = "uniqExact"
    holistic = True

    def result_type(self):
        return dt.UInt64

    def state_ops(self):
        return ["sum"]

    def update(self, ctx, args, cond):
        cap = ctx.row_valid.shape[0]
        value = args[0].broadcast(cap).data
        # Re-sort with the value as a secondary operand: rows within a key
        # group become value-ordered, so "first occurrence of value in group"
        # is detectable from neighbours.
        g2 = agg_ops.group_by_sort(ctx.keys, ctx.row_valid,
                                   ctx.num_groups_cap, secondary=[value])
        mask_s = g2.take(ctx.row_valid)
        if cond is not None:
            mask_s = mask_s & g2.take(cond)
        av = _arg_valid(args[0], cap)
        if av is not None:
            mask_s = mask_s & g2.take(av)
        v_s = g2.take(value)
        ids = jnp.where(mask_s, g2.group_ids, ctx.num_groups_cap)
        prev_same = jnp.concatenate([jnp.zeros((1,), jnp.bool_),
                                     (v_s[1:] == v_s[:-1])
                                     & (g2.group_ids[1:] == g2.group_ids[:-1])])
        is_first = mask_s & jnp.logical_not(prev_same)
        return [agg_ops.segment_reduce(
            "sum", is_first.astype(jnp.int64), ids, ctx.num_groups_cap)]

    def finalize(self, states):
        return states[0].astype(jnp.uint64), None


class QuantileExactAgg(AggregateFunction):
    """quantileExact(q)(x) — holistic; group-locally sorts values."""
    name = "quantileExact"
    holistic = True

    def __init__(self, arg_types, q: float = 0.5):
        super().__init__(arg_types)
        self.q = q

    def result_type(self):
        return dt.remove_nullable(self.arg_types[0])

    def state_ops(self):
        raise TypeError_("quantileExact states cannot be merged; "
                         "repartition by key instead")

    def update(self, ctx, args, cond):
        cap = ctx.row_valid.shape[0]
        value = args[0].broadcast(cap).data
        tok = sort_ops.order_token(value)
        g2 = agg_ops.group_by_sort(ctx.keys, ctx.row_valid,
                                   ctx.num_groups_cap, secondary=[tok])
        mask_s = g2.take(ctx.row_valid)
        if cond is not None:
            mask_s = mask_s & g2.take(cond)
        ids = jnp.where(mask_s, g2.group_ids, ctx.num_groups_cap)
        n = ctx.num_groups_cap
        lens = agg_ops.segment_reduce("sum", mask_s.astype(jnp.int64), ids, n)
        # Compact valid sorted rows: group g occupies [starts[g], starts[g]+lens[g])
        # in compacted coordinates, already value-ordered within the group.
        starts = jnp.cumsum(lens) - lens
        # index of the q-th element (nearest-rank, matching quantileExact)
        pick = starts + jnp.clip(
            jnp.floor(self.q * (lens - 1).astype(jnp.float64)).astype(jnp.int64),
            0, jnp.maximum(lens - 1, 0))
        v_s = g2.take(value)
        # Build the array of valid sorted values compacted to rank order.
        from ..ops import filter_ops
        compacted, _ = filter_ops.compact_arrays([v_s], mask_s)
        data = compacted[0][jnp.clip(pick, 0, cap - 1)]
        return [data]

    def merge(self, states, group_ids, num_segments):
        raise TypeError_("quantileExact cannot merge partial states")

    def finalize(self, states):
        return states[0], None


class MedianAgg(QuantileExactAgg):
    name = "median"

    def __init__(self, arg_types):
        super().__init__(arg_types, q=0.5)


# -- registry ----------------------------------------------------------------

_BASE: Dict[str, type] = {}
for _cls in [CountAgg, SumAgg, MinAgg, MaxAgg, AvgAgg, AnyAgg, VarPopAgg,
             VarSampAgg, StddevPopAgg, StddevSampAgg, ArgMinAgg, ArgMaxAgg,
             UniqExactAgg, MedianAgg]:
    _BASE[_cls.name.lower()] = _cls
_BASE["anylast"] = AnyAgg
_BASE["uniq"] = UniqExactAgg          # exact fallback; HLL sketch is a TODO
_BASE["countdistinct"] = UniqExactAgg
_BASE["var_pop"] = VarPopAgg
_BASE["var_samp"] = VarSampAgg
_BASE["stddev_pop"] = StddevPopAgg
_BASE["stddev_samp"] = StddevSampAgg


AGGREGATES = _BASE


def is_aggregate_name(name: str) -> bool:
    base = name.lower()
    if base.endswith("if"):
        base = base[:-2]
    return base in _BASE or name.lower() in _BASE


def get_aggregate(name: str, arg_types: List[dt.DType],
                  params: Optional[list] = None
                  ) -> Tuple[AggregateFunction, bool]:
    """-> (instance, has_if_combinator).  Raises UnknownFunction."""
    lname = name.lower()
    has_if = False
    if lname not in _BASE and lname.endswith("if") and lname[:-2] in _BASE:
        lname = lname[:-2]
        has_if = True
        arg_types = arg_types[:-1]  # last arg is the condition
    if lname not in _BASE:
        raise UnknownFunction(f"Unknown aggregate function '{name}'")
    cls = _BASE[lname]
    if cls is QuantileExactAgg or lname.startswith("quantile"):
        q = float(params[0]) if params else 0.5
        inst = QuantileExactAgg(arg_types, q)
    else:
        inst = cls(arg_types)
    return inst, has_if


AGGREGATES["quantile"] = QuantileExactAgg
AGGREGATES["quantileexact"] = QuantileExactAgg
