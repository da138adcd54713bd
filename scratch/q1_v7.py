"""v6 redo with scalar-checksum outputs (tunnel's block_until_ready lies)."""
import sys
sys.path.insert(0, "/root/repo")
import time
import traceback
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

LANES = 512
N = (100_000_000 // (LANES * 256)) * (LANES * 256)


def timeit(fn, *args, reps=5, label=""):
    try:
        np.asarray(jax.device_get(fn(*args)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(fn(*args)))
            ts.append(time.perf_counter() - t0)
        t = float(np.min(ts))
        print(f"{label:52s} {t*1e3:9.2f} ms", flush=True)
        return t
    except Exception as e:
        print(f"{label:52s} FAILED {str(e)[:120]}", flush=True)


def cks(x):
    return jnp.sum(x[::65536], dtype=jnp.int32) if x.dtype in (jnp.int32,) \
        else jnp.sum(x[::65536].astype(jnp.int32), dtype=jnp.int32)


def main():
    print("devices:", jax.devices(), flush=True)

    @jax.jit
    def mkpl(i):
        x = (jnp.arange(N, dtype=jnp.int64) * 2654435761 + i) % 1_000_003
        lo = (x & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32).astype(jnp.int32)
        hi = (x >> jnp.int64(32)).astype(jnp.int32)
        return lo, hi
    lo, hi = (jax.block_until_ready(a) for a in mkpl(0))

    @jax.jit
    def recon(lo, hi):
        x = lo.astype(jnp.uint32).astype(jnp.uint64) \
            | (hi.astype(jnp.int64).astype(jnp.uint64) << jnp.uint64(32))
        return cks(x.astype(jnp.int64))
    timeit(recon, lo, hi, label="planes -> i64 reconstruct + cks")

    @jax.jit
    def mk64(i):
        return (jnp.arange(N, dtype=jnp.int64) * 2654435761 + i) % 1_000_003
    x64 = jax.block_until_ready(mk64(0))
    timeit(jax.jit(lambda x: cks(x + jnp.int64(1))), x64,
           label="i64 read+write pass (x+1) + cks")
    timeit(jax.jit(lambda l, h: cks(l + 1) + cks(h + 1)), lo, hi,
           label="plane read+write pass + cks")

    timeit(jax.jit(lambda x: cks(jax.lax.sort([x], num_keys=1)[0])), x64,
           label="lax.sort i64 100M")
    timeit(jax.jit(lambda h, l: sum(cks(o) for o in
                                    jax.lax.sort([h, l], num_keys=2))),
           hi, lo, label="lax.sort (hi,lo) i32 pair 100M")
    x32 = jax.block_until_ready(jax.jit(lambda x: x.astype(jnp.int32))(x64))
    timeit(jax.jit(lambda x: cks(jax.lax.sort([x], num_keys=1)[0])), x32,
           label="lax.sort i32 100M")
    timeit(jax.jit(lambda x, p: sum(cks(o) for o in
                                    jax.lax.sort([x, p], num_keys=1))),
           x64, x64, label="lax.sort i64 key + i64 payload")
    timeit(jax.jit(lambda h, l, p: sum(cks(o) for o in
                                       jax.lax.sort([h, l, p], num_keys=2))),
           hi, lo, x32, label="lax.sort i32 pair + i32 payload")

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    ROWS_BLK = 256

    def kern(lo_ref, hi_ref, acc_ref):
        i = pl.program_id(0)
        bias = jnp.int32(-2147483648)
        gt = (hi_ref[:] > 0) | ((hi_ref[:] == 0)
                                & (lo_ref[:] + bias > jnp.int32(500_000) + bias))
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
            in_specs=[pl.BlockSpec((ROWS_BLK, LANES),
                                   lambda i: (i, jnp.int32(0)),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((ROWS_BLK, LANES),
                                   lambda i: (i, jnp.int32(0)),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS_BLK, LANES),
                                   lambda i: (jnp.int32(0), jnp.int32(0)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS_BLK, LANES), jnp.int32),
        )(lo2, hi2)
        return jnp.sum(acc, dtype=jnp.int32)
    try:
        r = jax.jit(pall)(lo, hi)
        print("pallas i32-index_map kernel OK:", int(np.asarray(r)), flush=True)
        timeit(pall, lo, hi, label="pallas plane count kernel")
    except Exception:
        print("pallas still failing:", flush=True)
        print(traceback.format_exc()[-700:], flush=True)

    @jax.jit
    def limb_sum(lo, hi):
        mask = (hi > 0) | ((hi == 0) & (lo > 500_000))
        R = 16384
        C = lo.shape[0] // R
        def pack(v):
            return v.reshape(R, C)
        m = pack(jnp.where(mask, jnp.int32(1), jnp.int32(0)))
        out = jnp.int64(0)
        for src, sh in ((lo, 0), (lo, 16), (hi, 32), (hi, 48)):
            limb = (pack(src) >> (sh % 32)) & jnp.int32(0xFFFF)
            part = jnp.sum(limb * m, axis=0, dtype=jnp.int32)
            out = out + (jnp.sum(part.astype(jnp.int64)) << jnp.int64(sh))
        return out
    t = timeit(limb_sum, lo, hi, label="masked i64 SUM via 16-bit limbs")
    lo_np = np.asarray(jax.device_get(lo)).astype(np.uint32)
    hi_np = np.asarray(jax.device_get(hi)).astype(np.int64)
    x_np = (hi_np << 32) | lo_np
    want = x_np[x_np > 500_000].sum()
    got = int(np.asarray(jax.device_get(limb_sum(lo, hi))))
    print("limb sum correct:", got == int(want), flush=True)

    # count via planes for reference timing in same process
    @jax.jit
    def pcount(lo, hi):
        gt = (hi > 0) | ((hi == 0) & (lo > 500_000))
        return jnp.sum(gt.astype(jnp.int32), dtype=jnp.int32)
    timeit(pcount, lo, hi, label="plane count (XLA fused)")
if __name__ == "__main__":
    main()
