"""Round 2 of Q1 measurement: distinct arrays per pass + pallas x64 debug."""
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
K = 6


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

    # K distinct i64 arrays (K*0.8GB HBM)
    xs = [jnp.asarray(x_host + i) for i in range(K)]
    jax.block_until_ready(xs)

    @jax.jit
    def f1(x0):
        return jnp.sum((x0 > 500_000).astype(jnp.int64))

    @jax.jit
    def fK(*xs):
        return sum(jnp.sum((x > 500_000).astype(jnp.int64)) for x in xs)

    t1 = t_e2e(f1, xs[0])
    tK = t_e2e(fK, *xs)
    marg = (tK - t1) / (K - 1)
    print(f"i64 distinct arrays: t1={t1*1e3:.2f} tK={tK*1e3:.2f} "
          f"marginal={marg*1e3:.3f}ms ({N/marg/1e9:.1f} G rows/s; "
          f"roofline 102.4 @ 819GB/s)")

    # same for f64 predicate + float sum agg (checks float path speed)
    del xs
    ys = [jnp.asarray((x_host + i).astype(np.float64)) for i in range(K)]
    jax.block_until_ready(ys)

    @jax.jit
    def g1(y):
        m = y > 500_000.0
        return jnp.sum(jnp.where(m, y, 0.0))

    @jax.jit
    def gK(*ys):
        return sum(jnp.sum(jnp.where(y > 500_000.0, y, 0.0)) for y in ys)
    t1 = t_e2e(g1, ys[0])
    tK = t_e2e(gK, *ys)
    marg = (tK - t1) / (K - 1)
    print(f"f64 filtered-sum:    t1={t1*1e3:.2f} tK={tK*1e3:.2f} "
          f"marginal={marg*1e3:.3f}ms ({N/marg/1e9:.1f} G rows/s)")
    del ys

    # pallas i32 kernel under x64: full traceback
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    LANES, TILE = 512, 2048

    def kern(x_ref, out_ref):
        i = pl.program_id(0)
        p = jnp.sum((x_ref[:] > jnp.int32(500_000)).astype(jnp.int32),
                    dtype=jnp.int32)
        @pl.when(i == 0)
        def _():
            out_ref[0, 0] = p
        @pl.when(i != 0)
        def _():
            out_ref[0, 0] = out_ref[0, 0] + p

    x32 = jnp.asarray(x_host[: (N // (LANES * TILE)) * LANES * TILE]
                      .astype(np.int32))
    jax.block_until_ready(x32)

    @jax.jit
    def pall(x32):
        rows = x32.shape[0] // LANES
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
        print("pallas i32:", pall(x32))
    except Exception:
        tb = traceback.format_exc()
        print("pallas i32 traceback (last 2000 chars):")
        print(tb[-2000:])


if __name__ == "__main__":
    main()
