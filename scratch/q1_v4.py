"""Can we read 64-bit data fast?  Candidate representations + pallas check."""
import sys
sys.path.insert(0, "/root/repo")
import time
import traceback
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from functools import partial

LANES = 512
N = (100_000_000 // (LANES * 256)) * (LANES * 256)   # multiple of 512*256
K = 4


def marginal(f1, fK, xs1, xsK, n_rows, label):
    try:
        f1 = jax.jit(f1)
        fK = jax.jit(fK)
        jax.block_until_ready(f1(*xs1))
        jax.block_until_ready(fK(*xsK))
        t1s, tKs = [], []
        for _ in range(7):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(f1(*xs1)))
            t1s.append(time.perf_counter() - t0)
        for _ in range(7):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(fK(*xsK)))
            tKs.append(time.perf_counter() - t0)
        t1, tK = np.min(t1s), np.min(tKs)
        m = (tK - t1) / (len(xsK) / len(xs1) - 1)
        print(f"{label:46s} marginal={m*1e3:7.3f}ms  "
              f"{n_rows/m/1e9:7.1f} G rows/s")
    except Exception as e:
        print(f"{label:46s} FAILED: {str(e)[:150]}")


def main():
    print("devices:", jax.devices(), "N =", N)
    x_host = (np.arange(N, dtype=np.int64) * 2654435761) % 1_000_003

    xs = [jnp.asarray(x_host + i) for i in range(K)]
    jax.block_until_ready(xs)

    # a. 2-D reshaped i64 reduce
    def r2d(x):
        g = (x.reshape(-1, LANES) > 500_000).astype(jnp.int32)
        return jnp.sum(jnp.sum(g, axis=0, dtype=jnp.int32), dtype=jnp.int32)
    marginal(r2d, lambda *xs: sum(r2d(x) for x in xs),
             xs[:1], xs, N, "i64 2-D reshaped reduce")

    # b. bitcast deinterleave planes
    def bcd(x):
        v = jax.lax.bitcast_convert_type(x, jnp.int32)   # (N,2) [lo,hi]?
        lo, hi = v[:, 0], v[:, 1]
        bias = jnp.int32(-2147483648)
        gt = (hi > 0) | ((hi == 0) & (lo + bias > jnp.int32(500_000) + bias))
        return jnp.sum(gt.astype(jnp.int32), dtype=jnp.int32)
    marginal(bcd, lambda *xs: sum(bcd(x) for x in xs),
             xs[:1], xs, N, "bitcast deinterleave cmp")
    del xs

    # c. plane storage: lo/hi i32 arrays
    lo_h = (x_host & 0xFFFFFFFF).astype(np.uint32).astype(np.int32)
    hi_h = (x_host >> 32).astype(np.int32)
    los = [jnp.asarray(lo_h + i) for i in range(K)]
    his = [jnp.asarray(hi_h) for _ in range(K)]
    jax.block_until_ready(los); jax.block_until_ready(his)

    def planes(lo, hi):
        bias = jnp.int32(-2147483648)
        gt = (hi > 0) | ((hi == 0) & (lo + bias > jnp.int32(500_000) + bias))
        return jnp.sum(gt.astype(jnp.int32), dtype=jnp.int32)
    marginal(planes,
             lambda *a: sum(planes(a[2*i], a[2*i+1]) for i in range(K)),
             [los[0], his[0]], [v for p in zip(los, his) for v in p],
             N, "i32 plane-pair cmp (target repr)")

    # d. pallas accumulate-no-reduce kernel on the plane pair
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    ROWS_BLK = 256

    def kern(lo_ref, hi_ref, acc_ref):
        i = pl.program_id(0)
        bias = jnp.int32(-2147483648)
        lo = lo_ref[:]
        hi = hi_ref[:]
        gt = (hi > 0) | ((hi == 0) & (lo + bias > jnp.int32(500_000) + bias))
        p = jnp.where(gt, jnp.int32(1), jnp.int32(0))
        @pl.when(i == 0)
        def _():
            acc_ref[:] = p
        @pl.when(i != 0)
        def _():
            acc_ref[:] = acc_ref[:] + p

    def pall(lo, hi):
        rows = lo.shape[0] // LANES
        lo2 = lo.reshape(rows, LANES)
        hi2 = hi.reshape(rows, LANES)
        acc = pl.pallas_call(
            kern, grid=(rows // ROWS_BLK,),
            in_specs=[pl.BlockSpec((ROWS_BLK, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((ROWS_BLK, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS_BLK, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS_BLK, LANES), jnp.int32),
        )(lo2, hi2)
        return jnp.sum(acc, dtype=jnp.int32)
    try:
        r = jax.jit(pall)(los[0], his[0])
        print("pallas plane kernel ok:", int(np.asarray(r)))
        marginal(pall,
                 lambda *a: sum(pall(a[2*i], a[2*i+1]) for i in range(K)),
                 [los[0], his[0]], [v for p in zip(los, his) for v in p],
                 N, "pallas plane kernel")
    except Exception:
        print("pallas plane kernel traceback tail:")
        print(traceback.format_exc()[-900:])
    del los, his

    # e. f64 plane compare + masked SUM via f32 limb trick?  First: f64 2-D.
    ys = [jnp.asarray((x_host + i).astype(np.float64)) for i in range(K)]
    jax.block_until_ready(ys)

    def f2d(y):
        g = y.reshape(-1, LANES)
        m = g > 500_000.0
        return jnp.sum(jnp.where(m, g, 0.0))
    marginal(f2d, lambda *ys: sum(f2d(y) for y in ys),
             ys[:1], ys, N, "f64 2-D filtered sum")
    del ys

    # f. f32 filtered sum (how fast if we accept f32 storage)
    zs = [jnp.asarray((x_host + i).astype(np.float32)) for i in range(K)]
    jax.block_until_ready(zs)

    def f32s(z):
        m = z > 500_000.0
        return jnp.sum(jnp.where(m, z, jnp.float32(0.0)), dtype=jnp.float32)
    marginal(f32s, lambda *zs: sum(f32s(z) for z in zs),
             zs[:1], zs, N, "f32 filtered sum")


if __name__ == "__main__":
    main()
