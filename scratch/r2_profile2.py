"""Round-2 profile part 2: pallas Q1 kernels (padded), i64 in-kernel support,
overhead calibration, f32 sort, and propagate-join primitive costs."""
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
TILE = 2048
N = (100_000_000 + TILE * LANES - 1) // (TILE * LANES) * (TILE * LANES)
NREAL = 100_000_000


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

    @jax.jit
    def mk(i):
        x = (jnp.arange(N, dtype=jnp.int64) * 2654435761 + i) % 1_000_003
        return x
    x = jax.block_until_ready(mk(0))

    # overhead: null query
    @jax.jit
    def null(x):
        return x[0]
    t0 = timeit(null, x, label="O: null (overhead)")

    @jax.jit
    def xla_count(x):
        n = jnp.arange(N, dtype=jnp.int64) < NREAL
        return jnp.sum(((x > 500000) & n).astype(jnp.int32), dtype=jnp.int32)
    timeit(xla_count, x, label="A1: XLA fused count+validmask")

    # A2: pallas direct-i64 kernel
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

    # A3: pallas bitcast-u32 interleaved
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
        x32 = jax.lax.bitcast_convert_type(x, jnp.int32)  # (N,2)
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
    timeit(pall_u32, x, label="A3: pallas bitcast-u32 count")

    # A4: pallas count+sum with i64 accumulation in SMEM
    def kern_sum64(x_ref, out_ref):
        i = pl.program_id(0)
        v = x_ref[:]
        m = v > 500000
        cnt = jnp.sum(m.astype(jnp.int32))
        sm = jnp.sum(jnp.where(m, v, jnp.int64(0)))
        @pl.when(i == 0)
        def _():
            out_ref[0, 0] = cnt.astype(jnp.int64)
            out_ref[0, 1] = sm
        @pl.when(i != 0)
        def _():
            out_ref[0, 0] = out_ref[0, 0] + cnt.astype(jnp.int64)
            out_ref[0, 1] = out_ref[0, 1] + sm

    @jax.jit
    def pall_sum64(x):
        rows = N // LANES
        x2 = x.reshape(rows, LANES)
        return pl.pallas_call(
            kern_sum64, grid=(rows // TILE,),
            in_specs=[pl.BlockSpec((TILE, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int64),
        )(x2)
    timeit(pall_sum64, x, label="A4: pallas i64 count+sum (SMEM i64)")

    # correctness of A4
    try:
        r = np.asarray(jax.device_get(pall_sum64(x)))
        xh = np.asarray(jax.device_get(x))
        want_c = int((xh > 500000).sum())
        want_s = int(xh[xh > 500000].sum())
        print("A4 correct:", r[0, 0] == want_c and r[0, 1] == want_s,
              r, want_c, want_s, flush=True)
    except Exception as e:
        print("A4 check failed", e)

    # A5: f32 path (float column agg)
    @jax.jit
    def mkf():
        return (jnp.arange(N, dtype=jnp.int64) % 1000003).astype(jnp.float32)
    xf = jax.block_until_ready(mkf())

    def kern_f32(x_ref, out_ref):
        i = pl.program_id(0)
        v = x_ref[:]
        m = v > 500000.0
        cnt = jnp.sum(m.astype(jnp.int32))
        sm = jnp.sum(jnp.where(m, v.astype(jnp.float32), 0.0))
        @pl.when(i == 0)
        def _():
            out_ref[0, 0] = cnt.astype(jnp.float32)
            out_ref[0, 1] = sm
        @pl.when(i != 0)
        def _():
            out_ref[0, 0] = out_ref[0, 0] + cnt.astype(jnp.float32)
            out_ref[0, 1] = out_ref[0, 1] + sm

    @jax.jit
    def pall_f32(x):
        rows = N // LANES
        x2 = x.reshape(rows, LANES)
        return pl.pallas_call(
            kern_f32, grid=(rows // LANES // 4,),
            in_specs=[pl.BlockSpec((TILE * 2, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
        )(x2)
    timeit(pall_f32, xf, label="A5: pallas f32 count+sum (400MB)")

    # B: f64-as-u64 encoded sort 50M (for ORDER BY float)
    M = 50_000_000

    # E: propagate-join primitive: sort by i32 key + flag + 2 carries,
    # then 2 cummaxes, then masked sum — the whole Q4 inner
    @jax.jit
    def mkj():
        fk = ((jnp.arange(M, dtype=jnp.int64) * 40503) % 1_000_000) \
            .astype(jnp.int32)
        dk = jnp.arange(1_000_000, dtype=jnp.int32)
        lab = (jnp.arange(1_000_000, dtype=jnp.int64) * 7) % 97
        return fk, dk, lab
    fk, dk, lab = (jax.block_until_ready(a) for a in mkj())

    @jax.jit
    def prop_join(fk, dk, lab):
        G = dk.shape[0]
        Np = fk.shape[0]
        Mtot = G + Np
        key = jnp.concatenate([dk, fk])
        is_probe = jnp.concatenate([jnp.zeros((G,), jnp.bool_),
                                    jnp.ones((Np,), jnp.bool_)])
        pos = jnp.arange(Mtot, dtype=jnp.int32)
        # payload attached at table rows; 0 elsewhere
        pay = jnp.concatenate([lab.astype(jnp.int32),
                               jnp.zeros((Np,), jnp.int32)])
        key_s, probe_s, pay_s = jax.lax.sort(
            [key, is_probe, pay], num_keys=2, is_stable=False)
        # last table pos + its key packed: cummax over (pos<<32 | key?) —
        # we need: matched = last table row has same key as probe row.
        # pack (key == table's) check: propagate table key via cummax of
        # (pos<<32 | tablekey) restricted to table rows
        is_tbl = jnp.logical_not(probe_s)
        packed_k = jnp.where(
            is_tbl, (pos.astype(jnp.int64) << 32)
            | key_s.astype(jnp.uint32).astype(jnp.int64), -1)
        ck = jax.lax.cummax(packed_k)
        tbl_key = ck.astype(jnp.uint32).astype(jnp.int32)
        matched = probe_s & (tbl_key == key_s) & (ck >= 0)
        packed_p = jnp.where(
            is_tbl, (pos.astype(jnp.int64) << 32)
            | pay_s.astype(jnp.uint32).astype(jnp.int64), -1)
        cp = jax.lax.cummax(packed_p)
        pay_out = cp.astype(jnp.uint32).astype(jnp.int64)
        cnt = jnp.sum(matched.astype(jnp.int64))
        sm = jnp.sum(jnp.where(matched, pay_out, 0))
        return cnt, sm
    t = timeit(prop_join, fk, dk, lab, reps=3,
               label="E: propagate join 50Mx1M count+sum TOTAL")
    r = jax.device_get(prop_join(fk, dk, lab))
    fkh = np.asarray(jax.device_get(fk)).astype(np.int64)
    labh = np.asarray(jax.device_get(lab))
    want_s = labh[fkh].sum()
    print("E correct:", int(r[0]) == M and int(r[1]) == int(want_s),
          r, want_s, flush=True)


if __name__ == "__main__":
    main()
