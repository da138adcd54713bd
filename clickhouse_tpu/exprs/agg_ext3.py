"""Aggregate breadth batch 3: time-decayed means, interval coverage,
interval sweeps, statistical tests, contingency-table associations,
ordered/sampled collectors.

References (function semantics, re-derived as whole-column segmented ops):
  src/AggregateFunctions/AggregateFunctionExponentialMovingAverage.cpp,
  AggregateFunctionIntervalLengthSum.h, AggregateFunctionMaxIntersections.h,
  AggregateFunctionMeanZTest.h, AggregateFunctionMannWhitney.h,
  AggregateFunctionCramersV(.h via CrossTab.h), AggregateFunctionTheilsU,
  AggregateFunctionContingency, AggregateFunctionSingleValueOrNull.h,
  AggregateFunctionGroupArraySorted.cpp, AggregateFunctionGroupArray.cpp
  (last/sample variants), AggregateFunctionSumMapFiltered via
  AggregateFunctionSumMap.h.

The per-group sequential scans of the reference become segmented
associative scans / run-length counts over device sorts — no per-group
Python loops, everything XLA-fusable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import dtypes as dt
from ..core.errors import TypeError_
from ..ops import agg_ops, scan_ops
from .aggregates import AggregateFunction
from .agg_sketch import GroupArrayAgg
from .expr import ColVal

_NEG_INF = jnp.float64(-np.inf)


def _raw_order(perm: jax.Array, vals: jax.Array) -> jax.Array:
    """Scatter-free recovery of raw row order from a sorted view."""
    _, back = jax.lax.sort([perm, vals], num_keys=1, is_stable=False)
    return back


def _erfc_p(z: jax.Array) -> jax.Array:
    """Two-sided normal p-value."""
    return jax.scipy.special.erfc(jnp.abs(z) / jnp.sqrt(2.0))


# -- exponentially time-decayed family ----------------------------------------

class _TimeDecayedBase(AggregateFunction):
    """Shared: per-group weights w_i = base^(-(t_max - t_i)/λ).

    Holistic (the rescale-on-merge of the reference state is non-linear);
    distributed plans repartition by key instead."""
    holistic = True
    base_e = True                  # e-base; EMA uses 2^x half-life decay
    param_ctor = True

    def __init__(self, arg_types, params=None):
        super().__init__(arg_types)
        self.decay = float(params[0]) if params else 1.0

    def result_type(self):
        return dt.Float64

    def state_ops(self):
        raise TypeError_(f"{self.name} states cannot be merged; "
                         "repartition by key instead")

    def _weights(self, ctx, args, cond):
        mask = self._row_mask(ctx, args, cond)
        v = self._value(ctx, args[0]).astype(jnp.float64)
        t = self._value(ctx, args[1]).astype(jnp.float64)
        g = ctx.grouping
        m_s = g.take(mask)
        t_s = g.take(t)
        v_s = g.take(v)
        tmax = g.reduce_sorted("max", t_s, m_s)
        gid = jnp.minimum(g.group_ids, g.num_groups_cap - 1)
        dtm = (tmax[gid] - t_s) / jnp.maximum(self.decay, 1e-300)
        w = jnp.where(m_s, jnp.exp(-dtm) if self.base_e
                      else jnp.exp2(-dtm), 0.0)
        return g, m_s, v_s, w

    def finalize(self, states):
        return states[0], None


class ExponentialMovingAverageAgg(_TimeDecayedBase):
    """exponentialMovingAverage(halflife)(value, time): weights halve per
    `halflife` of distance from the group's latest timestamp."""
    name = "exponentialMovingAverage"
    base_e = False

    def update(self, ctx, args, cond):
        g, m_s, v_s, w = self._weights(ctx, args, cond)
        sv = g.reduce_sorted("sum", v_s * w, m_s)
        sw = g.reduce_sorted("sum", w, m_s)
        return [sv / jnp.maximum(sw, 1e-300)]


class ExponentialTimeDecayedSumAgg(_TimeDecayedBase):
    name = "exponentialTimeDecayedSum"

    def update(self, ctx, args, cond):
        g, m_s, v_s, w = self._weights(ctx, args, cond)
        return [g.reduce_sorted("sum", v_s * w, m_s)]


class ExponentialTimeDecayedCountAgg(_TimeDecayedBase):
    name = "exponentialTimeDecayedCount"

    def update(self, ctx, args, cond):
        # single-argument form: count rows, arg is the time column
        mask = self._row_mask(ctx, args, cond)
        t = self._value(ctx, args[-1]).astype(jnp.float64)
        g = ctx.grouping
        m_s = g.take(mask)
        t_s = g.take(t)
        tmax = g.reduce_sorted("max", t_s, m_s)
        gid = jnp.minimum(g.group_ids, g.num_groups_cap - 1)
        w = jnp.where(m_s, jnp.exp(-(tmax[gid] - t_s)
                                   / jnp.maximum(self.decay, 1e-300)), 0.0)
        return [g.reduce_sorted("sum", w, m_s)]


class ExponentialTimeDecayedAvgAgg(_TimeDecayedBase):
    name = "exponentialTimeDecayedAvg"

    def update(self, ctx, args, cond):
        g, m_s, v_s, w = self._weights(ctx, args, cond)
        sv = g.reduce_sorted("sum", v_s * w, m_s)
        sw = g.reduce_sorted("sum", w, m_s)
        return [sv / jnp.maximum(sw, 1e-300)]


class ExponentialTimeDecayedMaxAgg(_TimeDecayedBase):
    name = "exponentialTimeDecayedMax"

    def update(self, ctx, args, cond):
        g, m_s, v_s, w = self._weights(ctx, args, cond)
        return [g.reduce_sorted("max", jnp.where(m_s, v_s * w, _NEG_INF),
                                m_s)]


# -- interval aggregates -------------------------------------------------------

def _seg_scan_max(flags: jax.Array, vals: jax.Array) -> jax.Array:
    """Inclusive segmented running max; flags mark segment starts."""
    def combine(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, jnp.maximum(va, vb))
    _, out = jax.lax.associative_scan(combine, (flags, vals))
    return out


class IntervalLengthSumAgg(AggregateFunction):
    """intervalLengthSum(start, end): total length of the UNION of the
    group's [start, end) intervals — sweep = sort by start + segmented
    running max of end (AggregateFunctionIntervalLengthSum.h)."""
    name = "intervalLengthSum"
    holistic = True

    def result_type(self):
        base = dt.remove_nullable(self.arg_types[0])
        return dt.Float64 if base.np_dtype.kind == "f" else dt.UInt64

    def state_ops(self):
        raise TypeError_("intervalLengthSum states cannot be merged; "
                         "repartition by key instead")

    def update(self, ctx, args, cond):
        mask = self._row_mask(ctx, args, cond)
        s = self._value(ctx, args[0]).astype(jnp.float64)
        e = self._value(ctx, args[1]).astype(jnp.float64)
        notm = jnp.logical_not(mask)
        g = agg_ops.group_by_sort(ctx.keys, ctx.row_valid,
                                  ctx.num_groups_cap,
                                  secondary=[notm, s], payloads=[e])
        m_s = jnp.logical_not(g.take(notm))
        s_s = g.take(s)
        e_s = g.take(e)
        cap = s_s.shape[0]
        gid = g.group_ids
        seg_start = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), gid[1:] != gid[:-1]])
        run = _seg_scan_max(seg_start, jnp.where(m_s, e_s, _NEG_INF))
        prev = jnp.concatenate([jnp.full((1,), _NEG_INF), run[:-1]])
        prev = jnp.where(seg_start, _NEG_INF, prev)
        contrib = jnp.where(m_s,
                            jnp.maximum(0.0, e_s - jnp.maximum(s_s, prev)),
                            0.0)
        return [g.reduce_sorted("sum", contrib, m_s)]

    def finalize(self, states):
        v = states[0]
        if dt.remove_nullable(self.arg_types[0]).np_dtype.kind == "f":
            return v, None
        return jnp.maximum(v, 0.0).astype(jnp.uint64), None


class MaxIntersectionsAgg(AggregateFunction):
    """maxIntersections(start, end): max number of simultaneously open
    intervals — the classic +1/-1 sweep as a 2N-event segmented cumsum
    (AggregateFunctionMaxIntersections.h)."""
    name = "maxIntersections"
    holistic = True
    want_position = False

    def result_type(self):
        return (dt.Float64 if self.want_position else dt.UInt64)

    def state_ops(self):
        raise TypeError_(f"{self.name} states cannot be merged; "
                         "repartition by key instead")

    def update(self, ctx, args, cond):
        mask = self._row_mask(ctx, args, cond)
        s = self._value(ctx, args[0]).astype(jnp.float64)
        e = self._value(ctx, args[1]).astype(jnp.float64)
        # 2N event rows: (pos, delta); ends sort before starts at equal pos
        # (half-open intervals)
        keys2 = [jnp.concatenate([k, k]) for k in ctx.keys]
        valid2 = jnp.concatenate([ctx.row_valid, ctx.row_valid])
        mask2 = jnp.concatenate([mask, mask])
        pos = jnp.concatenate([s, e])
        cap = s.shape[0]
        delta = jnp.concatenate([jnp.ones((cap,), jnp.int64),
                                 -jnp.ones((cap,), jnp.int64)])
        notm2 = jnp.logical_not(mask2)
        g = agg_ops.group_by_sort(keys2, valid2, ctx.num_groups_cap,
                                  secondary=[notm2, pos, delta],
                                  payloads=[pos, delta])
        m_s = jnp.logical_not(g.take(notm2))
        d_s = jnp.where(m_s, g.take(delta), 0)
        p_s = g.take(pos)
        gid = g.group_ids
        seg_start = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), gid[1:] != gid[:-1]])

        def combine(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb, vb, va + vb)
        _, depth = jax.lax.associative_scan(combine, (seg_start, d_s))
        best = g.reduce_sorted("max", jnp.where(m_s, depth, 0), m_s)
        if not self.want_position:
            return [best]
        # earliest sweep position attaining the max: rows at best depth,
        # then min sweep index among them, then that row's position
        gclip = jnp.minimum(gid, g.num_groups_cap - 1)
        idx = jnp.arange(depth.shape[0], dtype=jnp.int64)
        at_best = m_s & (depth == best[gclip])
        big = jnp.int64(1) << 62
        minidx = g.reduce_sorted("min", jnp.where(at_best, idx, big),
                                 at_best)
        at_first = at_best & (idx == minidx[gclip])
        posmax = g.reduce_sorted("any", jnp.where(at_first, p_s, 0.0),
                                 at_first)
        return [best, posmax]

    def finalize(self, states):
        if self.want_position:
            return states[1], None
        return jnp.maximum(states[0], 0).astype(jnp.uint64), None


class MaxIntersectionsPositionAgg(MaxIntersectionsAgg):
    name = "maxIntersectionsPosition"
    want_position = True


# -- statistical tests ---------------------------------------------------------

class MeanZTestAgg(AggregateFunction):
    """meanZTest(pop_var_x, pop_var_y, confidence)(value, sample_index) ->
    (z, p, ci_low, ci_high) (AggregateFunctionMeanZTest.h).  Mergeable:
    states are plain per-sample sums/counts."""
    name = "meanZTest"
    param_ctor = True

    def __init__(self, arg_types, params=None):
        super().__init__(arg_types)
        p = params or []
        self.var_x = float(p[0]) if len(p) > 0 else 1.0
        self.var_y = float(p[1]) if len(p) > 1 else 1.0
        self.confidence = float(p[2]) if len(p) > 2 else 0.95

    def result_type(self):
        return dt.Tuple([dt.Float64] * 4)

    def state_ops(self):
        return ["sum"] * 4

    def update(self, ctx, args, cond):
        mask = self._row_mask(ctx, args, cond)
        x = self._value(ctx, args[0]).astype(jnp.float64)
        grp = self._value(ctx, args[1]).astype(jnp.int64)
        g = ctx.grouping
        m0 = mask & (grp == 0)
        m1 = mask & (grp != 0)
        z = jnp.zeros((), jnp.float64)
        return [g.reduce("sum", m0.astype(jnp.float64), mask),
                g.reduce("sum", jnp.where(m0, x, z), mask),
                g.reduce("sum", m1.astype(jnp.float64), mask),
                g.reduce("sum", jnp.where(m1, x, z), mask)]

    def merge(self, states, grouping, mask_raw):
        return [grouping.reduce("sum", s, mask_raw) for s in states]

    def finalize(self, states):
        n0, s0, n1, s1 = states
        m0 = s0 / jnp.maximum(n0, 1.0)
        m1 = s1 / jnp.maximum(n1, 1.0)
        se = jnp.sqrt(self.var_x / jnp.maximum(n0, 1.0)
                      + self.var_y / jnp.maximum(n1, 1.0))
        zstat = (m0 - m1) / jnp.maximum(se, 1e-300)
        p = _erfc_p(zstat)
        zc = jax.scipy.special.ndtri(
            jnp.float64(1.0 - (1.0 - self.confidence) / 2.0))
        lo = (m0 - m1) - zc * se
        hi = (m0 - m1) + zc * se
        ts = dt.tuple_inner(self.result_type())
        sub = [ColVal(ts[0], zstat, None), ColVal(ts[1], p, None),
               ColVal(ts[2], lo, None), ColVal(ts[3], hi, None)]
        return jnp.zeros(zstat.shape, jnp.int32), None, None, sub


class MannWhitneyUTestAgg(AggregateFunction):
    """mannWhitneyUTest(value, sample_index) -> (u, p): rank-sum U via
    mid-ranks over a (group, value) sort, normal approximation with tie
    correction (AggregateFunctionMannWhitney.h)."""
    name = "mannWhitneyUTest"
    holistic = True
    param_ctor = True

    def __init__(self, arg_types, params=None):
        super().__init__(arg_types)  # alternative param accepted; two-sided

    def result_type(self):
        return dt.Tuple([dt.Float64, dt.Float64])

    def state_ops(self):
        raise TypeError_("mannWhitneyUTest states cannot be merged; "
                         "repartition by key instead")

    def update(self, ctx, args, cond):
        mask = self._row_mask(ctx, args, cond)
        x = self._value(ctx, args[0]).astype(jnp.float64)
        grp = self._value(ctx, args[1]).astype(jnp.int64)
        notm = jnp.logical_not(mask)
        g = agg_ops.group_by_sort(ctx.keys, ctx.row_valid,
                                  ctx.num_groups_cap,
                                  secondary=[notm, x], payloads=[grp])
        m_s = jnp.logical_not(g.take(notm))
        x_s = g.take(x)
        grp_s = g.take(grp)
        cap = x_s.shape[0]
        gid = g.group_ids
        gclip = jnp.minimum(gid, g.num_groups_cap - 1)
        pos = (jnp.arange(cap, dtype=jnp.int64)
               - g.starts[gclip] + 1)          # 1-based within group
        run_first = m_s & jnp.concatenate(
            [jnp.ones((1,), jnp.bool_),
             (x_s[1:] != x_s[:-1]) | (gid[1:] != gid[:-1])])
        run_id = jnp.where(m_s,
                           jnp.cumsum(run_first.astype(jnp.int64)) - 1, cap)
        starts_r, ends_r = scan_ops.segment_starts_ends(run_id, cap)
        rid = jnp.clip(run_id, 0, cap - 1)
        first_pos = starts_r[rid] - g.starts[gclip] + 1
        last_pos = ends_r[rid] - g.starts[gclip]
        mid = (first_pos + last_pos).astype(jnp.float64) / 2.0
        is0 = m_s & (grp_s == 0)
        is1 = m_s & (grp_s != 0)
        r0 = g.reduce_sorted("sum", jnp.where(is0, mid, 0.0), m_s)
        n0 = g.reduce_sorted("sum", is0.astype(jnp.float64), m_s)
        n1 = g.reduce_sorted("sum", is1.astype(jnp.float64), m_s)
        # tie correction: sum of t^3 - t over runs (counted once per run)
        tlen = (ends_r[rid] - starts_r[rid]).astype(jnp.float64)
        ties = jnp.where(run_first, tlen ** 3 - tlen, 0.0)
        tsum = g.reduce_sorted("sum", ties, m_s)
        return [r0, n0, n1, tsum]

    def finalize(self, states):
        r0, n0, n1, tsum = states
        u0 = r0 - n0 * (n0 + 1.0) / 2.0
        n = n0 + n1
        mu = n0 * n1 / 2.0
        var = n0 * n1 / 12.0 * (
            (n + 1.0) - tsum / jnp.maximum(n * (n - 1.0), 1.0))
        z = (u0 - mu) / jnp.maximum(jnp.sqrt(jnp.maximum(var, 0.0)), 1e-300)
        p = _erfc_p(z)
        t1, t2 = dt.tuple_inner(self.result_type())
        sub = [ColVal(t1, u0, None), ColVal(t2, p, None)]
        return jnp.zeros(u0.shape, jnp.int32), None, None, sub


# -- contingency-table association family --------------------------------------

class _CrossTabBase(AggregateFunction):
    """cramersV / theilsU / contingency(a, b): all reduce to per-row run
    counts n_a, n_b, n_ab over sorted views (reference: CrossTab.h).
    chi^2 = T * (sum_cells n_ab^2/(n_a n_b) - 1) computed as a per-row sum
    of n_ab/(n_a n_b)."""
    holistic = True

    def result_type(self):
        return dt.Float64

    def state_ops(self):
        raise TypeError_(f"{self.name} states cannot be merged; "
                         "repartition by key instead")

    @staticmethod
    def _run_counts(m_s, gid, cols):
        """Per-row run length + run-first flag of (group, cols...) runs in
        an already-sorted view."""
        cap = gid.shape[0]
        same = gid[1:] == gid[:-1]
        for c in cols:
            same = same & (c[1:] == c[:-1])
        run_first = m_s & jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), jnp.logical_not(same)])
        run_id = jnp.where(m_s,
                           jnp.cumsum(run_first.astype(jnp.int64)) - 1, cap)
        starts_r, ends_r = scan_ops.segment_starts_ends(run_id, cap)
        rid = jnp.clip(run_id, 0, cap - 1)
        cnt = (ends_r[rid] - starts_r[rid]).astype(jnp.float64)
        return cnt, run_first

    def update(self, ctx, args, cond):
        mask = self._row_mask(ctx, args, cond)
        a = self._value(ctx, args[0])
        b = self._value(ctx, args[1])
        notm = jnp.logical_not(mask)
        # main sort: (group, a, b) — runs of (g,a) and (g,a,b) contiguous
        g1 = agg_ops.group_by_sort(ctx.keys, ctx.row_valid,
                                   ctx.num_groups_cap,
                                   secondary=[notm, a, b])
        m1 = jnp.logical_not(g1.take(notm))
        a1, b1 = g1.take(a), g1.take(b)
        gid1 = g1.group_ids
        n_ab, first_ab = self._run_counts(m1, gid1, [a1, b1])
        n_a, first_a = self._run_counts(m1, gid1, [a1])
        # n_b needs its own sort; recover raw order, then view in sort1
        g2 = agg_ops.group_by_sort(ctx.keys, ctx.row_valid,
                                   ctx.num_groups_cap, secondary=[notm, b])
        m2 = jnp.logical_not(g2.take(notm))
        b2 = g2.take(b)
        n_b2, first_b2 = self._run_counts(m2, g2.group_ids, [b2])
        n_b_raw = _raw_order(g2.perm, n_b2)
        n_b = g1.take(n_b_raw)
        T = g1.reduce_sorted("sum", m1.astype(jnp.float64), m1)
        gclip = jnp.minimum(gid1, g1.num_groups_cap - 1)
        t_row = T[gclip]
        # S = sum_cells n_ab^2/(n_a n_b) as a per-row sum
        s_chi = g1.reduce_sorted(
            "sum", jnp.where(m1, n_ab / jnp.maximum(n_a * n_b, 1.0), 0.0),
            m1)
        R = g1.reduce_sorted("sum", first_a.astype(jnp.float64), m1)
        C = g2.reduce_sorted("sum", first_b2.astype(jnp.float64), m2)
        # entropies for theilsU: H(a) and H(a|b)
        h_a = g1.reduce_sorted(
            "sum", jnp.where(m1, jnp.log(jnp.maximum(
                t_row / jnp.maximum(n_a, 1.0), 1e-300))
                / jnp.maximum(t_row, 1.0), 0.0), m1)
        h_ab = g1.reduce_sorted(
            "sum", jnp.where(m1, jnp.log(jnp.maximum(
                n_b / jnp.maximum(n_ab, 1.0), 1e-300))
                / jnp.maximum(t_row, 1.0), 0.0), m1)
        return [T, s_chi, R, C, h_a, h_ab]

    @staticmethod
    def _chi2(states):
        T, s_chi, R, C, _, _ = states
        return T * jnp.maximum(s_chi - 1.0, 0.0)

    def finalize(self, states):
        return self._result(states), None


class CramersVAgg(_CrossTabBase):
    name = "cramersV"

    def _result(self, states):
        T, _, R, C, _, _ = states
        chi2 = self._chi2(states)
        k = jnp.maximum(jnp.minimum(R, C) - 1.0, 1.0)
        return jnp.sqrt(chi2 / jnp.maximum(T * k, 1e-300))


class CramersVBiasCorrectedAgg(_CrossTabBase):
    name = "cramersVBiasCorrected"

    def _result(self, states):
        T, _, R, C, _, _ = states
        chi2 = self._chi2(states)
        tm1 = jnp.maximum(T - 1.0, 1.0)
        phi2 = jnp.maximum(chi2 / jnp.maximum(T, 1.0)
                           - (R - 1.0) * (C - 1.0) / tm1, 0.0)
        rc = R - (R - 1.0) ** 2 / tm1
        cc = C - (C - 1.0) ** 2 / tm1
        k = jnp.maximum(jnp.minimum(rc, cc) - 1.0, 1e-300)
        return jnp.sqrt(phi2 / k)


class TheilsUAgg(_CrossTabBase):
    """theilsU(a, b): uncertainty coefficient U(a|b) in [0, 1]."""
    name = "theilsU"

    def _result(self, states):
        _, _, _, _, h_a, h_ab = states
        return jnp.where(h_a > 1e-300, (h_a - h_ab) / h_a, 0.0)


class ContingencyAgg(_CrossTabBase):
    name = "contingency"

    def _result(self, states):
        T = states[0]
        chi2 = self._chi2(states)
        return jnp.sqrt(chi2 / jnp.maximum(chi2 + T, 1e-300))


# -- misc ----------------------------------------------------------------------

class SingleValueOrNullAgg(AggregateFunction):
    """singleValueOrNull(x): the value if the group holds exactly one
    distinct value, else NULL (AggregateFunctionSingleValueOrNull.h)."""
    name = "singleValueOrNull"

    def result_type(self):
        return dt.make_nullable(self.arg_types[0])

    def state_ops(self):
        return ["min", "max", "sum"]

    def update(self, ctx, args, cond):
        mask = self._row_mask(ctx, args, cond)
        v = self._value(ctx, args[0])
        g = ctx.grouping
        return [g.reduce("min", v, mask), g.reduce("max", v, mask),
                g.reduce("sum", mask.astype(jnp.int64), mask)]

    def finalize(self, states):
        mn, mx, cnt = states
        valid = (mn == mx) & (cnt > 0)
        return mn, valid


# -- ordered / sampled collectors -----------------------------------------------

class GroupArraySortedAgg(GroupArrayAgg):
    """groupArraySorted(N)(x): the N smallest values, ascending
    (AggregateFunctionGroupArraySorted.cpp).  Dictionary columns order by
    code — exact when the dictionary is sorted (the engine's sorted-
    dictionary fast path), else code order."""
    name = "groupArraySorted"

    def _order_cols(self, ctx, value):
        return [value]


class GroupArrayLastAgg(GroupArrayAgg):
    """groupArrayLast(N)(x): the last N values in insertion order."""
    name = "groupArrayLast"

    def _order_cols(self, ctx, value):
        cap = ctx.row_valid.shape[0]
        return [-jnp.arange(cap, dtype=jnp.int64)]   # recency first

    def _post_matrix(self, mat, lens):
        # collected most-recent-first; flip each row back to insertion order
        L = mat.shape[1]
        idx = lens.astype(jnp.int64)[:, None] - 1 \
            - jnp.arange(L, dtype=jnp.int64)[None, :]
        out = jnp.take_along_axis(mat, jnp.clip(idx, 0, L - 1), axis=1)
        live = jnp.arange(L, dtype=jnp.int64)[None, :] < lens[:, None]
        return jnp.where(live, out, jnp.zeros((), mat.dtype))


class GroupArraySampleAgg(GroupArrayAgg):
    """groupArraySample(N[, seed])(x): N-element sample per group.
    Deterministic splitmix-style position hash stands in for the
    reference's reservoir RNG — uniform over positions, reproducible."""
    name = "groupArraySample"

    def _order_cols(self, ctx, value):
        cap = ctx.row_valid.shape[0]
        tok = jnp.arange(cap, dtype=jnp.int64) \
            * jnp.int64(-7046029254386353131)       # 0x9E3779B97F4A7C15
        return [tok & jnp.int64((1 << 62) - 1)]
