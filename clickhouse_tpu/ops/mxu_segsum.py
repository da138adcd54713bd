"""Exact segment sums as MXU matmuls (factored one-hot histograms).

For a provably-small group count S, segment-sum becomes a matrix product:
factor the slot id into (hi, lo) digits, build two one-hot operands, and
contract  result[hi, lo] = sum_rows (onehot_hi * value)^T @ onehot_lo  on the
MXU — the systolic array does the "scatter".  Measured ~75ms/67M rows vs
8.5s for XLA scatter-add on TPU v5e.

Exactness: f32 matmul accumulators are exact for integer values < 2^24, so
  * counts: per-chunk counts <= chunk size (65536) — exact; accumulated f64;
  * integer sums: values biased to unsigned and split into 8-bit limbs
    (limb sums per chunk <= 65536*255 < 2^24 — exact); limbs recombined in
    modular u64 arithmetic, bias removed with the exact counts.
Float sums are served by the sort path (scan_ops) instead.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["MAX_DENSE_GROUPS", "mxu_counts_and_sums"]

MAX_DENSE_GROUPS = 16384          # 128 x 128 factorization
_CHUNK = 1 << 16


def _factor(S: int) -> Tuple[int, int]:
    s2 = min(S, 128)
    s1 = (S + s2 - 1) // s2
    return s1, s2


def mxu_counts_and_sums(ids: jax.Array, mask: jax.Array,
                        int_values: Sequence[Tuple[jax.Array, bool]],
                        S: int) -> Tuple[jax.Array, List[jax.Array]]:
    """-> (counts (S,) int64, [sums (S,) i64/u64 matching each value]).

    ids        -- int32 slot per row, in [0, S) (rows with mask=False ignored)
    int_values -- list of (values, is_signed); values any integer dtype
    """
    assert S <= MAX_DENSE_GROUPS
    s1, s2 = _factor(S)
    n = ids.shape[0]
    n_pad = ((n + _CHUNK - 1) // _CHUNK) * _CHUNK
    pad = n_pad - n

    def padded(a, fill=0):
        if pad == 0:
            return a
        return jnp.concatenate(
            [a, jnp.full((pad,), fill, a.dtype)])

    ids_p = padded(ids.astype(jnp.int32))
    mask_p = padded(mask, False)
    vals_u64 = []
    for v, signed in int_values:
        u = v.astype(jnp.uint64)
        if signed:
            u = u + jnp.uint64(1 << 63)        # bias to unsigned
        vals_u64.append(padded(u))

    R = n_pad // _CHUNK
    ids_c = ids_p.reshape(R, _CHUNK)
    mask_c = mask_p.reshape(R, _CHUNK)
    vals_c = [v.reshape(R, _CHUNK) for v in vals_u64]

    k = len(vals_u64)
    hi_range = jnp.arange(s1, dtype=jnp.int32)
    lo_range = jnp.arange(s2, dtype=jnp.int32)

    def body(carry, xs):
        count_acc, limb_accs = carry
        iv = xs[0]
        mv = xs[1]
        vs = xs[2:]
        hi = iv // s2
        lo = iv - hi * s2
        ohh = ((hi[:, None] == hi_range[None, :]) & mv[:, None]
               ).astype(jnp.float32)                        # (C, s1)
        ohl = (lo[:, None] == lo_range[None, :]).astype(jnp.float32)  # (C, s2)
        count_acc = count_acc + jnp.dot(
            ohh.T, ohl, preferred_element_type=jnp.float32
        ).astype(jnp.float64)
        new_limb_accs = []
        for vi, acc in zip(vs, limb_accs):
            limb_sums = []
            for l in range(8):
                limb = ((vi >> jnp.uint64(8 * l)) & jnp.uint64(0xFF)
                        ).astype(jnp.float32)
                lhs = ohh * limb[:, None]                   # (C, s1)
                limb_sums.append(jnp.dot(
                    lhs.T, ohl, preferred_element_type=jnp.float32
                ).astype(jnp.float64))
            new_limb_accs.append(acc + jnp.stack(limb_sums))
        return (count_acc, new_limb_accs), None

    init = (jnp.zeros((s1, s2), jnp.float64),
            [jnp.zeros((8, s1, s2), jnp.float64) for _ in range(k)])
    (count_acc, limb_accs), _ = jax.lax.scan(
        body, init, tuple([ids_c, mask_c] + vals_c))

    counts = count_acc.reshape(s1 * s2)[:S].astype(jnp.int64)

    sums: List[jax.Array] = []
    for (v, signed), limbs in zip(int_values, limb_accs):
        flat = limbs.reshape(8, s1 * s2)[:, :S]
        total = jnp.zeros((S,), jnp.uint64)
        for l in range(8):
            # limb sums < 2^53: exact in f64; wrap-around via u64 shifts
            total = total + (flat[l].astype(jnp.uint64) << jnp.uint64(8 * l))
        if signed:
            total = total - counts.astype(jnp.uint64) * jnp.uint64(1 << 63)
            sums.append(total.astype(jnp.int64))
        else:
            sums.append(total)
    return counts, sums
