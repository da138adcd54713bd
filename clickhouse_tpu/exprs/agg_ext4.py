"""Aggregate batch 4: weighted top-K, timestamp-ordered delta sums,
two-sample Kolmogorov-Smirnov, one-way ANOVA, plus infrastructure
aggregates (nothing, aggThrow).

References (semantics only): src/AggregateFunctions/
AggregateFunctionTopK.cpp (-Weighted), AggregateFunctionDeltaSumTimestamp.cpp,
AggregateFunctionKolmogorovSmirnovTest.h, AggregateFunctionAnalysisOfVariance.h,
AggregateFunctionNothing.h, AggregateFunctionAggThrow.cpp.  All holistic
computations ride the engine's (group, value) device sort machinery —
segment runs, mid-rank style cumulative passes — no scatters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import dtypes as dt
from ..core.errors import ExecutionError, TypeError_
from ..ops import agg_ops, hash_ops, scan_ops
from .aggregates import AggregateFunction
from .agg_sketch import TopKAgg, _segment_prefix_matrix

__all__ = ["TopKWeightedAgg", "DeltaSumTimestampAgg",
           "KolmogorovSmirnovTestAgg", "AnalysisOfVarianceAgg",
           "NothingAgg", "AggThrowAgg"]


class TopKWeightedAgg(TopKAgg):
    """topKWeighted(N)(x, w): values with the largest per-value weight
    sums, heaviest first (exact — the reference's space-saving sketch is
    an approximation of exactly this)."""
    name = "topKWeighted"

    def update(self, ctx, args, cond):
        mask = self._row_mask(ctx, args, cond)
        value = self._value(ctx, args[0])
        w = self._value(ctx, args[1]).astype(jnp.int64)
        cap = ctx.row_valid.shape[0]
        notm = jnp.logical_not(mask)
        g1 = agg_ops.group_by_sort(ctx.keys, ctx.row_valid,
                                   ctx.num_groups_cap,
                                   secondary=[notm, value], payloads=[w])
        m1 = jnp.logical_not(g1.take(notm))
        v1 = g1.take(value)
        w1 = jnp.where(m1, g1.take(w), 0)
        gid = g1.group_ids
        run_first = m1 & jnp.concatenate(
            [jnp.ones((1,), jnp.bool_),
             (v1[1:] != v1[:-1]) | (gid[1:] != gid[:-1])])
        run_id = jnp.where(m1, jnp.cumsum(run_first.astype(jnp.int64)) - 1,
                           cap)
        # per-run weight sums via cumulative differences at run bounds
        cw = jnp.cumsum(w1)
        starts_r, ends_r = scan_ops.segment_starts_ends(run_id, cap)
        rid = jnp.clip(run_id, 0, cap - 1)
        lo = starts_r[rid]
        hi = ends_r[rid]
        wsum_row = cw[jnp.clip(hi - 1, 0, cap - 1)] \
            - jnp.where(lo > 0, cw[jnp.clip(lo - 1, 0, cap - 1)], 0)
        big = jnp.int64(1) << 60
        selkey = jnp.where(run_first, big - wsum_row, big + 1)
        v_enc, v_dec = hash_ops.sortable_bits(v1)
        _, _, v2 = jax.lax.sort([gid, selkey, v_enc], num_keys=2,
                                is_stable=True)
        if v_dec is not None:
            v2 = v_dec(v2)
        nsel = g1.reduce_sorted("sum", run_first.astype(jnp.int64),
                                run_first)
        mat, lens_c = _segment_prefix_matrix(v2, nsel, g1.starts, self.k)
        return [mat, lens_c.astype(jnp.int32)]


class DeltaSumTimestampAgg(AggregateFunction):
    """deltaSumTimestamp(value, timestamp): sum of positive value deltas
    taken in timestamp order within each group."""
    name = "deltaSumTimestamp"
    holistic = True

    def result_type(self):
        return dt.Float64

    def state_ops(self):
        raise TypeError_("deltaSumTimestamp states cannot be merged; "
                         "repartition by key instead")

    def update(self, ctx, args, cond):
        mask = self._row_mask(ctx, args, cond)
        x = self._value(ctx, args[0]).astype(jnp.float64)
        ts = self._value(ctx, args[1]).astype(jnp.int64)
        notm = jnp.logical_not(mask)
        g = agg_ops.group_by_sort(ctx.keys, ctx.row_valid,
                                  ctx.num_groups_cap,
                                  secondary=[notm, ts], payloads=[x])
        m_s = jnp.logical_not(g.take(notm))
        x_s = g.take(x)
        gid = g.group_ids
        prev = jnp.concatenate([x_s[:1], x_s[:-1]])
        same_run = m_s & jnp.concatenate(
            [jnp.zeros((1,), jnp.bool_), (gid[1:] == gid[:-1])]) \
            & jnp.concatenate([jnp.zeros((1,), jnp.bool_), m_s[:-1]])
        d = jnp.where(same_run, jnp.maximum(x_s - prev, 0.0), 0.0)
        return [g.reduce_sorted("sum", d, m_s)]

    def finalize(self, states):
        return states[0], None


def _run_bounds(flag_first, run_id, cap):
    starts_r, ends_r = scan_ops.segment_starts_ends(run_id, cap)
    rid = jnp.clip(run_id, 0, cap - 1)
    return starts_r[rid], ends_r[rid]


class KolmogorovSmirnovTestAgg(AggregateFunction):
    """kolmogorovSmirnovTest(value, sample_index) -> (d, p): two-sample
    KS statistic D = sup |F0 - F1| over the pooled sorted values, with the
    asymptotic Kolmogorov p-value."""
    name = "kolmogorovSmirnovTest"
    holistic = True
    param_ctor = True

    def __init__(self, arg_types, params=None):
        super().__init__(arg_types)      # 'exact'/'asymp' param accepted

    def result_type(self):
        return dt.Tuple([dt.Float64, dt.Float64])

    def state_ops(self):
        raise TypeError_("kolmogorovSmirnovTest states cannot be merged; "
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
        grp_s = g.take(grp)
        gid = g.group_ids
        gclip = jnp.minimum(gid, g.num_groups_cap - 1)
        is0 = (m_s & (grp_s == 0)).astype(jnp.float64)
        is1 = (m_s & (grp_s != 0)).astype(jnp.float64)
        # within-group cumulative counts: global cumsum minus the group's
        # prefix before its start
        c0 = jnp.cumsum(is0)
        c1 = jnp.cumsum(is1)
        start = g.starts[gclip]
        base0 = jnp.where(start > 0, c0[jnp.clip(start - 1, 0, None)], 0.0)
        base1 = jnp.where(start > 0, c1[jnp.clip(start - 1, 0, None)], 0.0)
        f0 = c0 - base0
        f1 = c1 - base1
        n0 = g.reduce_sorted("sum", is0, m_s)
        n1 = g.reduce_sorted("sum", is1, m_s)
        cap_g = n0.shape[0]
        n0_row = n0[gclip]
        n1_row = n1[gclip]
        diff = jnp.abs(f0 / jnp.maximum(n0_row, 1.0)
                       - f1 / jnp.maximum(n1_row, 1.0))
        d = g.reduce_sorted("max", jnp.where(m_s, diff, 0.0), m_s)
        return [d, n0, n1]

    def finalize(self, states):
        d, n0, n1 = states
        en = jnp.sqrt(n0 * n1 / jnp.maximum(n0 + n1, 1.0))
        t = (en + 0.12 + 0.11 / jnp.maximum(en, 1e-12)) * d
        # asymptotic Kolmogorov distribution Q(t) = 2 sum (-1)^{j-1} e^{-2 j^2 t^2}
        p = jnp.zeros_like(t)
        for j in range(1, 26):
            p = p + (2.0 * (-1.0) ** (j - 1)) * jnp.exp(
                -2.0 * (j * t) ** 2)
        p = jnp.clip(p, 0.0, 1.0)
        from .expr import ColVal
        sub = [ColVal(dt.Float64, d, None), ColVal(dt.Float64, p, None)]
        return jnp.zeros(d.shape, jnp.int32), None, None, sub


class AnalysisOfVarianceAgg(AggregateFunction):
    """analysisOfVariance(value, group_id) -> (f, p): one-way ANOVA
    F-statistic via per-category segment runs; p from the F-distribution
    survival function (regularized incomplete beta, continued fraction)."""
    name = "analysisOfVariance"
    holistic = True

    def result_type(self):
        return dt.Tuple([dt.Float64, dt.Float64])

    def state_ops(self):
        raise TypeError_("analysisOfVariance states cannot be merged; "
                         "repartition by key instead")

    def update(self, ctx, args, cond):
        mask = self._row_mask(ctx, args, cond)
        x = self._value(ctx, args[0]).astype(jnp.float64)
        cat = self._value(ctx, args[1]).astype(jnp.int64)
        cap = ctx.row_valid.shape[0]
        notm = jnp.logical_not(mask)
        g = agg_ops.group_by_sort(ctx.keys, ctx.row_valid,
                                  ctx.num_groups_cap,
                                  secondary=[notm, cat], payloads=[x])
        m_s = jnp.logical_not(g.take(notm))
        x_s = jnp.where(m_s, g.take(x), 0.0)
        cat_s = g.take(cat)
        gid = g.group_ids
        run_first = m_s & jnp.concatenate(
            [jnp.ones((1,), jnp.bool_),
             (cat_s[1:] != cat_s[:-1]) | (gid[1:] != gid[:-1])])
        run_id = jnp.where(m_s, jnp.cumsum(run_first.astype(jnp.int64)) - 1,
                           cap)
        lo, hi = _run_bounds(run_first, run_id, cap)
        cx = jnp.cumsum(x_s)
        run_sum = cx[jnp.clip(hi - 1, 0, cap - 1)] \
            - jnp.where(lo > 0, cx[jnp.clip(lo - 1, 0, cap - 1)], 0.0)
        run_len = (hi - lo).astype(jnp.float64)
        # per-group totals
        s1 = g.reduce_sorted("sum", x_s, m_s)                    # sum x
        s2 = g.reduce_sorted("sum", x_s * x_s, m_s)              # sum x^2
        n = g.reduce_sorted("sum", m_s.astype(jnp.float64), m_s)
        k = g.reduce_sorted("sum", run_first.astype(jnp.float64), m_s)
        sb = g.reduce_sorted(
            "sum", jnp.where(run_first,
                             run_sum * run_sum / jnp.maximum(run_len, 1.0),
                             0.0), m_s)   # sum_c n_c mean_c^2
        return [s1, s2, n, k, sb]

    def finalize(self, states):
        s1, s2, n, k, sb = states
        grand = s1 * s1 / jnp.maximum(n, 1.0)
        ss_between = sb - grand
        ss_within = s2 - sb
        df1 = jnp.maximum(k - 1.0, 1e-300)
        df2 = jnp.maximum(n - k, 1e-300)
        f = (ss_between / df1) / jnp.maximum(ss_within / df2, 1e-300)
        p = _f_sf(f, df1, df2)
        from .expr import ColVal
        sub = [ColVal(dt.Float64, f, None), ColVal(dt.Float64, p, None)]
        return jnp.zeros(f.shape, jnp.int32), None, None, sub


def _betainc_cf(a, b, x, iters=64):
    """Regularized incomplete beta via Lentz continued fraction (device)."""
    tiny = 1e-30
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = jnp.ones_like(x)
    d = 1.0 - qab * x / qap
    d = jnp.where(jnp.abs(d) < tiny, tiny, d)
    d = 1.0 / d
    h = d
    for m in range(1, iters):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        d = jnp.where(jnp.abs(d) < tiny, tiny, d)
        c = 1.0 + aa / c
        c = jnp.where(jnp.abs(c) < tiny, tiny, c)
        d = 1.0 / d
        h = h * d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        d = jnp.where(jnp.abs(d) < tiny, tiny, d)
        c = 1.0 + aa / c
        c = jnp.where(jnp.abs(c) < tiny, tiny, c)
        d = 1.0 / d
        h = h * d * c
    lbeta = (jax.scipy.special.gammaln(a) + jax.scipy.special.gammaln(b)
             - jax.scipy.special.gammaln(a + b))
    front = jnp.exp(a * jnp.log(jnp.maximum(x, tiny))
                    + b * jnp.log(jnp.maximum(1.0 - x, tiny)) - lbeta) / a
    return front * h


def _betainc(a, b, x):
    x = jnp.clip(x, 0.0, 1.0)
    flip = x > (a + 1.0) / (a + b + 2.0)
    xa = jnp.where(flip, 1.0 - x, x)
    aa = jnp.where(flip, b, a)
    bb = jnp.where(flip, a, b)
    v = _betainc_cf(aa, bb, xa)
    return jnp.where(flip, 1.0 - v, v)


def _f_sf(f, d1, d2):
    """P(F > f) for the F(d1, d2) distribution."""
    x = d2 / jnp.maximum(d2 + d1 * jnp.maximum(f, 0.0), 1e-300)
    return jnp.clip(_betainc(d2 / 2.0, d1 / 2.0, x), 0.0, 1.0)


class NothingAgg(AggregateFunction):
    """nothing(...): always NULL (AggregateFunctionNothing.h)."""
    name = "nothing"

    def result_type(self):
        return dt.make_nullable(dt.Nothing)

    def state_ops(self):
        return ["sum"]

    def update(self, ctx, args, cond):
        return [ctx.grouping.count_rows(self._row_mask(ctx, args, cond))]

    def finalize(self, states):
        z = jnp.zeros_like(states[0]).astype(jnp.uint8)
        return z, z    # validity all-zero: NULL everywhere


class AggThrowAgg(AggregateFunction):
    """aggThrow(p): throws during aggregation creation with probability p
    (the reference's fault-injection test helper,
    AggregateFunctionAggThrow.cpp).  Deterministic here: any p > 0 throws."""
    name = "aggThrow"
    param_ctor = True

    def __init__(self, arg_types, params=None):
        super().__init__(arg_types)
        p = float(params[0]) if params else 1.0
        if p > 0:
            raise ExecutionError("Aggregate function aggThrow has thrown "
                                 "exception successfully")

    def result_type(self):
        return dt.UInt8

    def state_ops(self):
        return ["sum"]

    def update(self, ctx, args, cond):
        return [ctx.grouping.count_rows(self._row_mask(ctx, args, cond))]

    def finalize(self, states):
        return states[0].astype(jnp.uint8), None
