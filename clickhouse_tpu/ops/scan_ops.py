"""Scatter-free segment reductions over key-sorted rows.

TPU scatter serializes updates (measured ~85ns/row — 8.5s per 100M-row
segment_sum), so the engine never scatters on hot paths.  After the rows are
key-sorted (sort: ~0.5s/100M — cheap), every per-group reduction becomes:

  * sums: plain cumsum + boundary differences (exact modulo 2^64 for
    integers; for floats XLA's native log-depth prefix sum behaves like
    pairwise summation — per-group error ~log2(n)*eps of the running
    prefix, far tighter than naive sequential accumulation over 100M rows);
  * min/max/any: ONE extra sort of (group_id, order_token) pairs, then the
    per-group extremum sits at the segment head/tail — picked by small
    gathers at starts/ends;
  * group start positions via merge-searchsorted on the sorted group-id
    array (ops/search.py).

`lax.associative_scan` is deliberately absent: over ~33M-element operands it
OOM-kills the XLA compile helper on TPU (measured), so every reduction here
lowers to native sort/cumsum/cummax primitives only.  (running_reduce — the
window-function path — still uses associative_scan; window partitions are
far smaller than GROUP BY inputs.)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import search, sort_ops

__all__ = ["segment_starts_ends", "seg_reduce_sorted", "running_reduce"]


def segment_starts_ends(group_ids_sorted: jax.Array, num_groups_cap: int
                        ) -> Tuple[jax.Array, jax.Array]:
    """starts[g], ends[g): row range of group g in sorted order (gather-only).

    group_ids_sorted must be ascending *integers* with padding rows at the
    end carrying id >= num_groups_cap.  Empty groups get starts==ends.
    One searchsorted suffices: for integer ids count(x <= g-1) == count(x < g),
    so starts[g] = ends[g-1] exactly.
    """
    g = jnp.arange(num_groups_cap, dtype=group_ids_sorted.dtype)
    ends = search.searchsorted(group_ids_sorted, g, side="right") \
        .astype(jnp.int64)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int64), ends[:-1]])
    return starts, ends


def _segmented_scan(op, data: jax.Array, boundary: jax.Array) -> jax.Array:
    """Inclusive segmented scan: combine resets at rows where boundary=True."""
    flags = boundary.astype(jnp.bool_)

    def combine(a, b):
        av, af = a
        bv, bf = b
        v = jnp.where(bf, bv, op(av, bv))
        return v, af | bf

    out, _ = jax.lax.associative_scan(combine, (data, flags))
    return out


def running_reduce(op: str, data: jax.Array, boundary: jax.Array,
                   mask: Optional[jax.Array] = None) -> jax.Array:
    """Per-row inclusive running reduction within segments (window frames:
    UNBOUNDED PRECEDING .. CURRENT ROW).  Masked rows pass the carry through.

    op: sum | min | max | first | last
    """
    if op == "sum":
        acc = data
        if acc.dtype in (jnp.int8, jnp.int16, jnp.int32, jnp.bool_):
            acc = acc.astype(jnp.int64)
        elif acc.dtype in (jnp.uint8, jnp.uint16, jnp.uint32):
            acc = acc.astype(jnp.uint64)
        if mask is not None:
            acc = jnp.where(mask, acc, jnp.zeros((), acc.dtype))
        return _segmented_scan(jnp.add, acc, boundary)
    if op in ("min", "max"):
        if jnp.issubdtype(data.dtype, jnp.integer) or data.dtype == jnp.bool_:
            ident = jnp.iinfo(data.dtype).max if op == "min" \
                else jnp.iinfo(data.dtype).min
            ident = jnp.asarray(ident, data.dtype)
        else:
            ident = jnp.asarray(jnp.inf if op == "min" else -jnp.inf,
                                data.dtype)
        acc = jnp.where(mask, data, ident) if mask is not None else data
        fn = jnp.minimum if op == "min" else jnp.maximum
        return _segmented_scan(fn, acc, boundary)
    if op in ("first", "last"):
        m = mask if mask is not None else jnp.ones(data.shape, jnp.bool_)
        keep_first = op == "first"

        def combine(a, b):
            av, ah, af = a
            bv, bh, bf = b
            if keep_first:
                v = jnp.where(bf, bv, jnp.where(ah, av, bv))
            else:
                v = jnp.where(bf, bv, jnp.where(bh, bv, av))
            h = jnp.where(bf, bh, ah | bh)
            return v, h, af | bf

        out, _, _ = jax.lax.associative_scan(
            combine, (data, m, boundary.astype(jnp.bool_)))
        return out
    raise ValueError(op)


def seg_reduce_sorted(op: str, data: jax.Array, group_ids_sorted: jax.Array,
                      boundary: jax.Array, starts: jax.Array,
                      ends: jax.Array, num_groups_cap: int,
                      mask_sorted: Optional[jax.Array] = None) -> jax.Array:
    """Per-group reduction over key-sorted rows; returns (num_groups_cap,).

    op           -- sum | min | max | any (first masked-in value)
    data         -- values in sorted-row order
    boundary     -- True at each segment's first row
    mask_sorted  -- rows to include (False rows contribute the identity)
    Empty groups get 0 (sum) / dtype identity (min/max).
    """
    cap = data.shape[0]
    last = jnp.maximum(ends - 1, 0)
    have = ends > starts

    if op == "sum":
        acc = data
        if acc.dtype in (jnp.int8, jnp.int16, jnp.int32):
            acc = acc.astype(jnp.int64)
        elif acc.dtype in (jnp.uint8, jnp.uint16, jnp.uint32):
            acc = acc.astype(jnp.uint64)
        elif acc.dtype == jnp.bool_:
            acc = acc.astype(jnp.int64)
        elif acc.dtype == jnp.float32:
            acc = acc.astype(jnp.float64)
        zero = jnp.zeros((), acc.dtype)
        if mask_sorted is not None:
            acc = jnp.where(mask_sorted, acc, zero)
        # cumsum + boundary difference: exact mod 2^64 for integers; for
        # floats the native log-depth prefix sum keeps per-group error at
        # ~log2(n)*eps of the prefix magnitude (cf. module docstring)
        c = jnp.cumsum(acc)
        total = c[last]
        before = jnp.where(starts > 0, c[jnp.maximum(starts - 1, 0)], zero)
        return jnp.where(have, total - before, zero)

    if op in ("min", "max"):
        cnt = _masked_counts(mask_sorted, starts, ends, last, have)
        havem = have & (cnt > 0)
        # one sort of (gid, order-token) pairs; segment ranges [starts, ends)
        # are unchanged (gid is the primary key), masked-out rows carry the
        # token sentinel and sink to each segment's tail.  The data itself
        # does NOT ride the sort (f64 sort operands break the TPU compile
        # helper); a position payload + two small gathers fetch the value.
        tok = sort_ops.order_token(data, validity=mask_sorted)
        rowpos = jnp.arange(cap, dtype=jnp.int32)
        _, _, pos2 = jax.lax.sort([group_ids_sorted, tok, rowpos],
                                  num_keys=2, is_stable=False)
        at = starts if op == "min" else starts + cnt - 1
        out = data[pos2[jnp.clip(at, 0, cap - 1)]]
        return jnp.where(havem, out, jnp.zeros((), data.dtype))

    if op == "any":
        # first masked-in value per segment: masked-in rows sort (stably,
        # via original position) to the segment head
        cnt = _masked_counts(mask_sorted, starts, ends, last, have)
        havem = have & (cnt > 0)
        if mask_sorted is None:
            out = data[jnp.clip(starts, 0, cap - 1)]
            return jnp.where(havem, out, jnp.zeros((), data.dtype))
        rowpos = jnp.arange(cap, dtype=jnp.int32)
        notm = jnp.logical_not(mask_sorted)
        _, _, pos2 = jax.lax.sort([group_ids_sorted, notm, rowpos],
                                  num_keys=3, is_stable=False)
        out = data[pos2[jnp.clip(starts, 0, cap - 1)]]
        return jnp.where(havem, out, jnp.zeros((), data.dtype))

    raise ValueError(f"Unknown segmented reduction '{op}'")


def _masked_counts(mask_sorted, starts, ends, last, have):
    """Masked-in rows per segment (int64), no scan beyond a native cumsum."""
    if mask_sorted is None:
        return ends - starts
    mc = jnp.cumsum(mask_sorted.astype(jnp.int64))
    total = mc[last]
    before = jnp.where(starts > 0, mc[jnp.maximum(starts - 1, 0)],
                       jnp.zeros((), jnp.int64))
    return jnp.where(have, total - before, jnp.zeros((), jnp.int64))
