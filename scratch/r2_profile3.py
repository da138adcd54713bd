"""Amortized Q1 kernel measurements: 8 distinct 100M arrays in one program,
per-pass device time = (t8 - t1) / 7.  XLA fused vs pallas variants."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 512
TILE = 1024
N = (100_000_000 + TILE * LANES - 1) // (TILE * LANES) * (TILE * LANES)
K = 8


def timeit(fn, *args, reps=5, label=""):
    try:
        np.asarray(jax.device_get(fn(*args)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(fn(*args)))
            ts.append(time.perf_counter() - t0)
        t = float(np.min(ts))
        print(f"{label:58s} {t*1e3:9.2f} ms", flush=True)
        return t
    except Exception as e:
        print(f"{label:58s} FAILED {str(e)[:300]}", flush=True)
        return None


def main():
    print("devices:", jax.devices(), "N=", N, flush=True)

    arrays = []
    for i in range(K):
        f = jax.jit(lambda s: (jnp.arange(N, dtype=jnp.int64)
                               * 2654435761 + s) % 1_000_003)
        arrays.append(jax.block_until_ready(f(jnp.int64(i))))

    # ---- XLA fused count ----
    def xcount(x):
        return jnp.sum((x > 500000).astype(jnp.int32), dtype=jnp.int32)

    f1 = jax.jit(lambda a0: xcount(a0))
    fK = jax.jit(lambda *As: sum(xcount(a) for a in As))
    t1 = timeit(f1, arrays[0], label="XLA count x1")
    tK = timeit(fK, *arrays, label=f"XLA count x{K}")
    if t1 and tK:
        print(f"  -> XLA count per-pass: {(tK-t1)/(K-1)*1e3:.2f} ms", flush=True)

    # ---- XLA count+sum (i64) ----
    def xcs(x):
        m = x > 500000
        return (jnp.sum(m.astype(jnp.int32), dtype=jnp.int32),
                jnp.sum(jnp.where(m, x, jnp.int64(0))))
    g1 = jax.jit(lambda a0: xcs(a0))
    gK = jax.jit(lambda *As: tuple(sum(t) for t in zip(*(xcs(a) for a in As))))
    t1 = timeit(g1, arrays[0], label="XLA count+sum(i64) x1")
    tK = timeit(gK, *arrays, label=f"XLA count+sum(i64) x{K}")
    if t1 and tK:
        print(f"  -> XLA count+sum per-pass: {(tK-t1)/(K-1)*1e3:.2f} ms",
              flush=True)

    # ---- pallas roll-interleave count ----
    # i64 column bitcast to i32 pairs [lo,hi,lo,hi,...]; compare via roll
    def kern_cnt(x_ref, out_ref):
        i = pl.program_id(0)
        v = x_ref[:]                              # (TILE, 2*LANES) i32
        hi_at = pltpu.roll(v, np.int32(2 * LANES - 1), 1)              # lane j <- j+1 (hi next to lo)
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        even = (lane & 1) == 0
        bias = jnp.int32(-2147483648)
        gt = (hi_at > 0) | ((hi_at == 0) & ((v + bias) > (500000 + bias)))
        p = jnp.sum((gt & even).astype(jnp.int32), dtype=jnp.int32)
        @pl.when(i == 0)
        def _():
            out_ref[0, 0] = p
        @pl.when(i != 0)
        def _():
            out_ref[0, 0] = out_ref[0, 0] + p

    def pcount(x):
        x32 = jax.lax.bitcast_convert_type(x, jnp.int32)   # (N,2)
        rows = N // LANES
        x2 = x32.reshape(rows, LANES * 2)
        return pl.pallas_call(
            kern_cnt, grid=(rows // TILE,),
            in_specs=[pl.BlockSpec((TILE, LANES * 2), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        )(x2)[0, 0]

    p1 = jax.jit(lambda a: pcount(a))
    pK = jax.jit(lambda *As: sum(pcount(a) for a in As))
    t1 = timeit(p1, arrays[0], label="pallas roll count x1")
    if t1 is not None:
        # correctness
        want = int((np.asarray(jax.device_get(arrays[0])) > 500000).sum())
        got = int(np.asarray(jax.device_get(p1(arrays[0]))))
        print(f"  pallas count correct: {got == want} ({got} vs {want})",
              flush=True)
        tK = timeit(pK, *arrays, label=f"pallas roll count x{K}")
        if tK:
            print(f"  -> pallas count per-pass: {(tK-t1)/(K-1)*1e3:.2f} ms",
                  flush=True)

    # ---- pallas count + exact i64 sum via 16-bit limbs, i32 accumulators --
    TS = 512                    # smaller tile so accumulator cells stay safe

    def kern_cs(x_ref, acc_ref):
        i = pl.program_id(0)
        v = x_ref[:]                              # (TS, 2*LANES) i32
        hi_at = pltpu.roll(v, np.int32(2 * LANES - 1), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        even = (lane & 1) == 0
        bias = jnp.int32(-2147483648)
        gt = ((hi_at > 0) | ((hi_at == 0) & ((v + bias) > (500000 + bias)))) \
            & even
        m = gt.astype(jnp.int32)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # limbs: even lanes hold lo (limb0/1), odd lanes hold hi (limb2/3).
        # mask for odd lanes = gt rolled right by 1
        modd = pltpu.roll(m, np.int32(1), 1)
        msel = jnp.where(even, m, modd)
        l01 = (v & 0xFFFF) * msel
        l23 = ((v >> 16) & 0xFFFF) * msel
        acc_ref[0] += m                            # count (even lanes)
        acc_ref[1] += l01                          # limb0 at even, limb2 odd
        acc_ref[2] += l23                          # limb1 at even, limb3 odd

    def pcs(x):
        x32 = jax.lax.bitcast_convert_type(x, jnp.int32)
        rows = N // LANES
        x2 = x32.reshape(rows, LANES * 2)
        acc = pl.pallas_call(
            kern_cs, grid=(rows // TS,),
            in_specs=[pl.BlockSpec((TS, LANES * 2), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((3, TS, LANES * 2), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, TS, LANES * 2), jnp.int32),
        )(x2)
        lane = jnp.arange(LANES * 2)
        even = (lane & 1) == 0
        cnt = jnp.sum(acc[0], dtype=jnp.int64)
        s01 = jnp.sum(jnp.where(even, acc[1], 0), dtype=jnp.int64)
        s23 = jnp.sum(jnp.where(~even, acc[1], 0), dtype=jnp.int64)
        s45 = jnp.sum(jnp.where(even, acc[2], 0), dtype=jnp.int64)
        s67 = jnp.sum(jnp.where(~even, acc[2], 0), dtype=jnp.int64)
        total = s01 + (s45 << 16) + (s23 << 32) + (s67 << 48)
        return cnt, total

    q1 = jax.jit(lambda a: pcs(a))
    qK = jax.jit(lambda *As: tuple(sum(t) for t in
                                   zip(*(pcs(a) for a in As))))
    t1 = timeit(q1, arrays[0], label="pallas count+sum limbs x1")
    if t1 is not None:
        xh = np.asarray(jax.device_get(arrays[0]))
        want_c = int((xh > 500000).sum())
        want_s = int(xh[xh > 500000].sum())
        rc, rs = (int(np.asarray(jax.device_get(r))) for r in q1(arrays[0]))
        print(f"  pallas cs correct: {(rc, rs) == (want_c, want_s)} "
              f"({rc},{rs} vs {want_c},{want_s})", flush=True)
        tK = timeit(qK, *arrays, label=f"pallas count+sum limbs x{K}")
        if tK:
            print(f"  -> pallas cs per-pass: {(tK-t1)/(K-1)*1e3:.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
