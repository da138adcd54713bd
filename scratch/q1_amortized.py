"""Amortized device-time measurement: K distinct passes in one program.

Marginal pass cost = (t_K - t_1) / (K - 1); tunnel overhead cancels.
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from functools import partial

N = 100_000_000


def t_e2e(fn, *args, reps=7):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def main():
    print("devices:", jax.devices())
    x_host = (np.arange(N, dtype=np.int64) * 2654435761) % 1_000_003
    x = jnp.asarray(x_host)
    jax.block_until_ready(x)

    @partial(jax.jit, static_argnames="k")
    def f(x, k):
        tot = jnp.int64(0)
        for i in range(k):
            tot = tot + jnp.sum((x > (500_000 + i)).astype(jnp.int64))
        return tot

    t1 = t_e2e(f, x, 1)
    t9 = t_e2e(f, x, 9)
    print(f"i64 count: t1={t1*1e3:.2f}ms t9={t9*1e3:.2f}ms "
          f"marginal={((t9-t1)/8)*1e3:.3f}ms "
          f"({N/((t9-t1)/8)/1e9:.1f} G rows/s, roofline 102.4)")

    # i32 pallas kernel with fixed sum dtype -- is Pallas viable at all?
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    LANES, TILE = 512, 2048

    def kern(x_ref, out_ref, thresh):
        i = pl.program_id(0)
        partial_ = jnp.sum((x_ref[:] > thresh).astype(jnp.int32),
                           dtype=jnp.int32)
        @pl.when(i == 0)
        def _():
            out_ref[0, 0] = partial_
        @pl.when(i != 0)
        def _():
            out_ref[0, 0] = out_ref[0, 0] + partial_

    @partial(jax.jit, static_argnames="k")
    def g(x32, k):
        rows = x32.shape[0] // LANES
        x2 = x32.reshape(rows, LANES)
        tot = jnp.int32(0)
        for i in range(k):
            tot = tot + pl.pallas_call(
                partial(kern, thresh=500_000 + i),
                grid=(rows // TILE,),
                in_specs=[pl.BlockSpec((TILE, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                       memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            )(x2)[0, 0]
        return tot

    x32 = jnp.asarray((x_host % 1_000_003).astype(np.int32))
    jax.block_until_ready(x32)
    npad = (N // (LANES * TILE)) * LANES * TILE   # truncate for simplicity
    x32t = x32[:npad]
    try:
        t1 = t_e2e(g, x32t, 1)
        t9 = t_e2e(g, x32t, 9)
        print(f"i32 pallas: t1={t1*1e3:.2f}ms t9={t9*1e3:.2f}ms "
              f"marginal={((t9-t1)/8)*1e3:.3f}ms "
              f"({npad/((t9-t1)/8)/1e9:.1f} G rows/s, i32 roofline 204.8)")
    except Exception as e:
        print("i32 pallas FAILED:", str(e)[:300])

    # i32 fused XLA for comparison
    @partial(jax.jit, static_argnames="k")
    def h(x32, k):
        tot = jnp.int32(0)
        for i in range(k):
            tot = tot + jnp.sum((x32 > (500_000 + i)).astype(jnp.int32),
                                dtype=jnp.int32)
        return tot
    t1 = t_e2e(h, x32t, 1)
    t9 = t_e2e(h, x32t, 9)
    print(f"i32 fused XLA: t1={t1*1e3:.2f}ms t9={t9*1e3:.2f}ms "
          f"marginal={((t9-t1)/8)*1e3:.3f}ms "
          f"({npad/((t9-t1)/8)/1e9:.1f} G rows/s)")

    # split-halves pallas for i64 semantics: XLA computes lo/hi (2 extra
    # materializations) then kernel compares -- total 3x800MB traffic?
    def kern2(lo_ref, hi_ref, out_ref, t_hi, t_lo):
        i = pl.program_id(0)
        hi = hi_ref[:]
        lo = lo_ref[:]
        bias = jnp.int32(-2147483648)
        gt = (hi > t_hi) | ((hi == t_hi) & (lo + bias > t_lo + bias))
        partial_ = jnp.sum(gt.astype(jnp.int32), dtype=jnp.int32)
        @pl.when(i == 0)
        def _():
            out_ref[0, 0] = partial_
        @pl.when(i != 0)
        def _():
            out_ref[0, 0] = out_ref[0, 0] + partial_

    @partial(jax.jit, static_argnames="k")
    def p2(x, k):
        npad = (x.shape[0] // (LANES * TILE)) * LANES * TILE
        x = x[:npad]
        lo = (x & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32).astype(jnp.int32)
        hi = (x >> jnp.int64(32)).astype(jnp.int32)
        rows = npad // LANES
        lo2, hi2 = lo.reshape(rows, LANES), hi.reshape(rows, LANES)
        tot = jnp.int32(0)
        for i in range(k):
            t = 500_000 + i
            tot = tot + pl.pallas_call(
                partial(kern2, t_hi=t >> 32, t_lo=t & 0xFFFFFFFF),
                grid=(rows // TILE,),
                in_specs=[pl.BlockSpec((TILE, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((TILE, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                       memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            )(lo2, hi2)[0, 0]
        return tot
    try:
        t1 = t_e2e(p2, x, 1)
        t9 = t_e2e(p2, x, 9)
        print(f"i64-split pallas: t1={t1*1e3:.2f}ms t9={t9*1e3:.2f}ms "
              f"marginal={((t9-t1)/8)*1e3:.3f}ms "
              f"({npad/((t9-t1)/8)/1e9:.1f} G rows/s vs 102.4 roofline)")
    except Exception as e:
        print("i64-split pallas FAILED:", str(e)[:300])


if __name__ == "__main__":
    main()
