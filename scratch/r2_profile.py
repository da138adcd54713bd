"""Round-2 opening profile: establish perf facts on the real TPU.

A. Q1 paths: XLA fused count, pallas i64-direct, pallas u32-planes,
   pallas with in-kernel i64 read.
B. lax.sort throughput vs operand count (join/groupby bottleneck).
C. random gather throughput vs table size (8KB / 8MB / 800MB).
D. cummax / cumsum throughput.
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import traceback
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 100_000_000
LANES = 512


def timeit(fn, *args, reps=5, label=""):
    try:
        r = fn(*args)
        np.asarray(jax.device_get(r))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(fn(*args)))
            ts.append(time.perf_counter() - t0)
        t = float(np.min(ts))
        print(f"{label:58s} {t*1e3:9.2f} ms", flush=True)
        return t
    except Exception as e:
        print(f"{label:58s} FAILED {str(e)[:200]}", flush=True)
        return None


def main():
    print("devices:", jax.devices(), flush=True)

    @jax.jit
    def mk(i):
        x = (jnp.arange(N, dtype=jnp.int64) * 2654435761 + i) % 1_000_003
        return x
    x = jax.block_until_ready(mk(0))

    # ---- A. Q1 variants ----
    @jax.jit
    def xla_count(x):
        return jnp.sum((x > 500000).astype(jnp.int32), dtype=jnp.int32)
    timeit(xla_count, x, label="A1: XLA fused count i64->i32 (800MB)")

    # A2: pallas direct-i64 kernel
    TILE = 1024
    def kern_i64(x_ref, out_ref):
        i = pl.program_id(0)
        p = jnp.sum((x_ref[:] > 500000).astype(jnp.int32))
        @pl.when(i == 0)
        def _():
            out_ref[0, 0] = p
        @pl.when(i != 0)
        def _():
            out_ref[0, 0] = out_ref[0, 0] + p

    @jax.jit
    def pall_i64(x):
        rows = N // LANES
        x2 = x.reshape(rows, LANES)
        return pl.pallas_call(
            kern_i64, grid=(rows // TILE,),
            in_specs=[pl.BlockSpec((TILE, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        )(x2)[0, 0]
    timeit(pall_i64, x, label="A2: pallas direct-i64 count")

    # A3: pallas on bitcast u32 planes (bitcast is free? view via XLA)
    def kern_u32(x_ref, out_ref):
        i = pl.program_id(0)
        v = x_ref[:]
        lo = v[:, 0::2]
        hi = v[:, 1::2]
        gt = (hi > 0) | ((hi == 0) & (lo > 500000))
        p = jnp.sum(gt.astype(jnp.int32))
        @pl.when(i == 0)
        def _():
            out_ref[0, 0] = p
        @pl.when(i != 0)
        def _():
            out_ref[0, 0] = out_ref[0, 0] + p

    @jax.jit
    def pall_u32(x):
        x32 = jax.lax.bitcast_convert_type(x, jnp.int32)  # (N, 2) lo,hi
        rows = N // LANES
        x2 = x32.reshape(rows, LANES * 2)
        return pl.pallas_call(
            kern_u32, grid=(rows // TILE,),
            in_specs=[pl.BlockSpec((TILE, LANES * 2), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        )(x2)[0, 0]
    timeit(pall_u32, x, label="A3: pallas bitcast-u32-interleaved count")

    # A4: masked sum via limbs inside pallas (count+sum fused)
    def kern_sum(x_ref, out_ref):
        i = pl.program_id(0)
        v = x_ref[:]
        lo = v[:, 0::2]
        hi = v[:, 1::2]
        gt = (hi > 0) | ((hi == 0) & (lo > 500000))
        cnt = jnp.sum(gt.astype(jnp.int32))
        m = gt.astype(jnp.int32)
        # 16-bit limbs of lo/hi, masked, accumulated in f32-safe i32
        l0 = jnp.sum((lo & 0xFFFF) * m)
        l1 = jnp.sum(((lo >> 16) & 0xFFFF) * m)
        l2 = jnp.sum((hi & 0xFFFF) * m)
        l3 = jnp.sum(((hi >> 16) & 0xFFFF) * m)
        @pl.when(i == 0)
        def _():
            out_ref[0, 0] = cnt
            out_ref[0, 1] = l0
            out_ref[0, 2] = l1
            out_ref[0, 3] = l2
            out_ref[0, 4] = l3
        @pl.when(i != 0)
        def _():
            out_ref[0, 0] = out_ref[0, 0] + cnt
            out_ref[0, 1] = out_ref[0, 1] + l0
            out_ref[0, 2] = out_ref[0, 2] + l1
            out_ref[0, 3] = out_ref[0, 3] + l2
            out_ref[0, 4] = out_ref[0, 4] + l3

    @jax.jit
    def pall_sum(x):
        x32 = jax.lax.bitcast_convert_type(x, jnp.int32)
        rows = N // LANES
        x2 = x32.reshape(rows, LANES * 2)
        return pl.pallas_call(
            kern_sum, grid=(rows // TILE,),
            in_specs=[pl.BlockSpec((TILE, LANES * 2), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 8), jnp.int32),
        )(x2)
    timeit(pall_sum, x, label="A4: pallas fused count+sum(limbs)")
    # NOTE: limb overflow — i32 limb sum over 2048*1024 rows*65535 max —
    # 2^21 rows/tile * 65535 = 2^37 overflows i32; this is a THROUGHPUT
    # probe only; real kernel must accumulate per-tile partials in i64 or
    # smaller tiles. Check correctness impact separately.

    # ---- B. sort throughput vs operands ----
    M = 50_000_000
    k1 = jax.block_until_ready(
        jax.jit(lambda: (jnp.arange(M, dtype=jnp.int64) * 40503) % 1_000_000)())
    p1 = jax.block_until_ready(
        jax.jit(lambda: jnp.arange(M, dtype=jnp.int32))())
    p2 = jax.block_until_ready(
        jax.jit(lambda: jnp.arange(M, dtype=jnp.int64))())

    @jax.jit
    def sort1(k):
        return jax.lax.sort([k], num_keys=1, is_stable=False)[0][::65536]
    timeit(sort1, k1, reps=3, label="B1: sort 50M x 1 operand (i64 key)")

    @jax.jit
    def sort2(k, p):
        r = jax.lax.sort([k, p], num_keys=1, is_stable=False)
        return r[1][::65536]
    timeit(sort2, k1, p1, reps=3, label="B2: sort 50M key + i32 payload")

    @jax.jit
    def sort3(k, p, q):
        r = jax.lax.sort([k, p, q], num_keys=1, is_stable=False)
        return r[2][::65536]
    timeit(sort3, k1, p1, p2, reps=3,
           label="B3: sort 50M key + i32 + i64 payloads")

    @jax.jit
    def sort1_32(k):
        return jax.lax.sort([k.astype(jnp.int32)], num_keys=1,
                            is_stable=False)[0][::65536]
    timeit(sort1_32, k1, reps=3, label="B4: sort 50M x 1 operand (i32 key)")

    # B5: stable vs not
    @jax.jit
    def sort2s(k, p):
        r = jax.lax.sort([k, p], num_keys=1, is_stable=True)
        return r[1][::65536]
    timeit(sort2s, k1, p1, reps=3, label="B5: stable sort 50M key+i32")

    # ---- C. gather throughput vs table size ----
    for tbits, label in ((10, "8KB table"), (20, "8MB table"),
                         (26, "512MB table")):
        T = 1 << tbits
        tbl = jax.block_until_ready(
            jax.jit(lambda: (jnp.arange(T, dtype=jnp.int64) * 7) % 97)())
        idx = jax.block_until_ready(
            jax.jit(lambda: ((jnp.arange(M, dtype=jnp.int32) * 40503)
                             % T))())
        @jax.jit
        def gat(tbl, idx):
            return jnp.sum(tbl[idx][::65536], dtype=jnp.int64)
        timeit(gat, tbl, idx, reps=3,
               label=f"C: gather 50M from {label}")

    # C2: monotone gather (sorted indices)
    T = 1 << 20
    tbl = jax.block_until_ready(
        jax.jit(lambda: (jnp.arange(T, dtype=jnp.int64) * 7) % 97)())
    idx_m = jax.block_until_ready(
        jax.jit(lambda: ((jnp.arange(M, dtype=jnp.int64) * T) // M)
                .astype(jnp.int32))())
    @jax.jit
    def gat2(tbl, idx):
        return jnp.sum(tbl[idx][::65536], dtype=jnp.int64)
    timeit(gat2, tbl, idx_m, reps=3, label="C2: MONOTONE gather 50M from 8MB")

    # ---- D. scans ----
    @jax.jit
    def cs(x):
        return jnp.cumsum(x)[::65536]
    timeit(cs, x, reps=3, label="D1: cumsum 100M i64")

    @jax.jit
    def cm(x):
        return jax.lax.cummax(x)[::65536]
    timeit(cm, x, reps=3, label="D2: cummax 100M i64")

    x32v = jax.block_until_ready(jax.jit(lambda: x.astype(jnp.int32))())
    @jax.jit
    def cs32(x):
        return jnp.cumsum(x)[::65536]
    timeit(cs32, x32v, reps=3, label="D3: cumsum 100M i32")


if __name__ == "__main__":
    main()
