"""Pallas TPU kernels for bandwidth-bound masked reductions.

The Q1 hot path (`SELECT count() WHERE pred`) is a single streaming pass:
read the column once, evaluate the predicate, popcount.  XLA handles this
adequately, but the hand-tiled Pallas kernel controls the HBM->VMEM pipeline
explicitly (grid-tiled blocks, f32/i32 lanes, no 64-bit emulation in the
reduction) and serves as the template for further streaming kernels.

Works on any 1-D int64/int32/float column reshaped to (rows, 512) lanes.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["masked_count_gt", "available"]

_LANES = 512
_TILE_ROWS = 2048            # (2048, 512) i32 tile = 4 MB VMEM per buffer


def available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "cpu")
    except Exception:
        return False


def _count_kernel(x_lo_ref, x_hi_ref, thresh_ref, out_ref):
    """Count elements of an int64 column (split in u32 halves) > thresh.

    The comparison runs in 32-bit lanes: value > t  <=>  (hi > t_hi) or
    (hi == t_hi and lo > t_lo) with signed hi and unsigned lo — no 64-bit
    emulation inside the kernel.  The TPU grid runs sequentially, so all
    programs accumulate into one (1,1) output cell.
    """
    i = pl.program_id(0)
    t_hi = thresh_ref[0]
    t_lo = thresh_ref[1]
    hi = x_hi_ref[:].astype(jnp.int32)
    lo = x_lo_ref[:]                      # uint32 low half (as int32 bits)
    # unsigned compare of the low halves via bias to signed
    bias = jnp.int32(-2147483648)
    lo_s = lo + bias
    tlo_s = t_lo + bias
    gt = (hi > t_hi) | ((hi == t_hi) & (lo_s > tlo_s))
    partial = jnp.sum(gt.astype(jnp.int32))

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = partial

    @pl.when(i != 0)
    def _():
        out_ref[0, 0] = out_ref[0, 0] + partial


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_count_gt(x: jax.Array, threshold, interpret: bool = False
                    ) -> jax.Array:
    """count(x > threshold) over an int64 array (padded with int64 min).

    One streaming pass at HBM bandwidth; returns int64.
    """
    n = x.shape[0]
    lanes = _LANES
    tile = _TILE_ROWS
    per_block = tile * lanes
    n_pad = ((n + per_block - 1) // per_block) * per_block
    if n_pad != n:
        pad_v = jnp.full((n_pad - n,), jnp.iinfo(jnp.int64).min, x.dtype)
        x = jnp.concatenate([x, pad_v])
    # split into 32-bit halves (layout change is fused by XLA)
    lo = (x & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32).astype(jnp.int32)
    hi = (x >> jnp.int64(32)).astype(jnp.int32)
    rows = n_pad // lanes
    lo2 = lo.reshape(rows, lanes)
    hi2 = hi.reshape(rows, lanes)

    t = jnp.asarray(threshold, jnp.int64)
    t_arr = jnp.stack([(t >> jnp.int64(32)).astype(jnp.int32),
                       (t & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
                       .astype(jnp.int32)])

    grid = rows // tile
    total = pl.pallas_call(
        _count_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        interpret=interpret,
    )(lo2, hi2, t_arr)
    return total[0, 0].astype(jnp.int64)
