"""Experiment matrix: where does the 6x reduce slowdown come from, and which
kernel shape fixes it."""
import sys
sys.path.insert(0, "/root/repo")
import time
import traceback
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from functools import partial

N = 100_000_000
K = 4


def marginal(build_f1, build_fK, xs, n_rows, label):
    try:
        f1 = jax.jit(build_f1)
        fK = jax.jit(build_fK)
        jax.block_until_ready(f1(xs[0]))
        jax.block_until_ready(fK(*xs))
        t1s, tKs = [], []
        for _ in range(7):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(f1(xs[0])))
            t1s.append(time.perf_counter() - t0)
        for _ in range(7):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(fK(*xs)))
            tKs.append(time.perf_counter() - t0)
        t1, tK = np.min(t1s), np.min(tKs)
        m = (tK - t1) / (K - 1)
        print(f"{label:44s} marginal={m*1e3:7.3f}ms  "
              f"{n_rows/m/1e9:7.1f} G rows/s")
    except Exception as e:
        print(f"{label:44s} FAILED: {str(e)[:120]}")


def main():
    print("devices:", jax.devices())
    x_host = (np.arange(N, dtype=np.int64) * 2654435761) % 1_000_003

    # --- i32: is the slowdown i64-specific? -------------------------------
    xs32 = [jnp.asarray((x_host + i).astype(np.int32)) for i in range(K)]
    jax.block_until_ready(xs32)
    marginal(lambda x: jnp.sum((x > 500_000).astype(jnp.int32),
                               dtype=jnp.int32),
             lambda *xs: sum(jnp.sum((x > 500_000).astype(jnp.int32),
                                     dtype=jnp.int32) for x in xs),
             xs32, N, "i32 1-D fused count")

    # reshaped 2-D reduce
    def c2d(x):
        g = (x.reshape(-1, 512) > 500_000).astype(jnp.int32)
        return jnp.sum(jnp.sum(g, axis=0, dtype=jnp.int32), dtype=jnp.int32)
    marginal(c2d, lambda *xs: sum(c2d(x) for x in xs), xs32, N,
             "i32 (rows,512) axis0-then-1")

    del xs32
    xs = [jnp.asarray(x_host + i) for i in range(K)]
    jax.block_until_ready(xs)

    # i64 compare, i32 count
    def i64c(x):
        return jnp.sum((x > 500_000).astype(jnp.int32), dtype=jnp.int32)
    marginal(i64c, lambda *xs: sum(i64c(x) for x in xs), xs, N,
             "i64 cmp, i32 accumulate 1-D")

    def i64c2(x):
        g = (x.reshape(-1, 512) > 500_000).astype(jnp.int32)
        return jnp.sum(jnp.sum(g, axis=0, dtype=jnp.int32), dtype=jnp.int32)
    marginal(i64c2, lambda *xs: sum(i64c2(x) for x in xs), xs, N,
             "i64 cmp (rows,512) 2-D reduce")

    # manual 32-bit halves decode fused in XLA (no pallas):
    def i64split(x):
        lo = (x & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32).astype(jnp.int32)
        hi = (x >> jnp.int64(32)).astype(jnp.int32)
        bias = jnp.int32(-2147483648)
        t_hi, t_lo = jnp.int32(0), jnp.int32(500_000)
        gt = (hi > t_hi) | ((hi == t_hi) & (lo + bias > t_lo + bias))
        return jnp.sum(gt.astype(jnp.int32), dtype=jnp.int32)
    marginal(i64split, lambda *xs: sum(i64split(x) for x in xs), xs, N,
             "i64 manual-split cmp in XLA")

    # bitcast i64 -> (N,2) i32: supported?
    def bc(x):
        v = jax.lax.bitcast_convert_type(x, jnp.int32)   # (N,2)?
        return jnp.sum(v, dtype=jnp.int32)
    try:
        r = jax.jit(bc)(xs[0][:1024])
        print("bitcast i64->i32 works, shape trick viable:",
              np.asarray(r).shape)
        marginal(bc, lambda *xs: sum(bc(x) for x in xs), xs, N,
                 "bitcast-based i32 view reduce")
    except Exception as e:
        print("bitcast i64->(N,2)i32 FAILED:", str(e)[:150])

    # pallas with lax.reduce (no jnp.sum promotion)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    LANES, TILE = 512, 2048
    NP_ = (N // (LANES * TILE)) * LANES * TILE

    def kern(x_ref, out_ref):
        i = pl.program_id(0)
        gt = x_ref[:] > jnp.int32(500_000)
        ones = jnp.where(gt, jnp.int32(1), jnp.int32(0))
        p = jax.lax.reduce(ones, np.int32(0), jax.lax.add, (0, 1))
        @pl.when(i == 0)
        def _():
            out_ref[0, 0] = p
        @pl.when(i != 0)
        def _():
            out_ref[0, 0] = out_ref[0, 0] + p

    def pall(x):
        x32 = x.astype(jnp.int32)[:NP_]
        rows = NP_ // LANES
        x2 = x32.reshape(rows, LANES)
        return pl.pallas_call(
            kern, grid=(rows // TILE,),
            in_specs=[pl.BlockSpec((TILE, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        )(x2)[0, 0]
    try:
        r = jax.jit(pall)(xs[0])
        print("pallas lax.reduce kernel works:", int(np.asarray(r)))
        marginal(pall, lambda *xs: sum(pall(x) for x in xs), xs, N,
                 "pallas i32 tile kernel (+astype pass)")
    except Exception:
        print("pallas lax.reduce kernel traceback tail:")
        print(traceback.format_exc()[-1200:])


if __name__ == "__main__":
    main()
