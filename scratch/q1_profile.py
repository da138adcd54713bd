"""Q1 device-time breakdown on the real TPU.

Measures, for 100M-row Int64:
  A. pure fused XLA count(x > t)
  B. same but with the executor's arange-validity AND
  C. round-1 pallas masked_count_gt (incl. its i64->2xi32 split passes)
  D. pallas kernel reading the i64 column directly (does Mosaic take i64?)
  E. i32 variants for the bandwidth sanity line
Run from /root/repo (axon plugin).  ONE process at a time.
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

N = 100_000_000
T = 500_000


def bench(fn, *args, reps=5, name=""):
    try:
        out = jax.block_until_ready(fn(*args))   # compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.device_get(out))      # materialize (trust e2e only)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(f"{name:42s} {med*1e3:8.2f} ms   {N/med/1e9:7.2f} G rows/s")
        return med
    except Exception as e:
        print(f"{name:42s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None


def main():
    print("devices:", jax.devices())
    x_host = (np.arange(N, dtype=np.int64) * 2654435761) % 1_000_003
    x = jnp.asarray(x_host)
    jax.block_until_ready(x)
    n_rows = jnp.asarray(N, jnp.int64)

    # A. pure fused count
    f_a = jax.jit(lambda x: jnp.sum((x > T).astype(jnp.int64)))
    bench(f_a, x, name="A: fused count(x>t)")

    # B. + arange validity mask (what the executor builds)
    def f_b(x, n):
        valid = jnp.arange(x.shape[0]) < n
        return jnp.sum(((x > T) & valid).astype(jnp.int64))
    bench(jax.jit(f_b), x, n_rows, name="B: count(x>t & arange<n)")

    # B2. i32 accumulate then widen
    def f_b2(x, n):
        valid = jnp.arange(x.shape[0]) < n
        return jnp.sum(((x > T) & valid).astype(jnp.int32)).astype(jnp.int64)
    bench(jax.jit(f_b2), x, n_rows, name="B2: i32 accumulate")

    # C. round-1 pallas kernel (external split)
    raise SystemExit("pallas kernel experiment removed; XLA reaches 0.92 of roofline")
    bench(masked_count_gt, x, T, name="C: pallas split-i64 kernel")

    # D. pallas reading i64 directly
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    LANES, TILE = 512, 2048

    def k_d(x_ref, out_ref):
        i = pl.program_id(0)
        gt = x_ref[:] > T
        partial = jnp.sum(gt.astype(jnp.int32))
        @pl.when(i == 0)
        def _():
            out_ref[0, 0] = partial
        @pl.when(i != 0)
        def _():
            out_ref[0, 0] = out_ref[0, 0] + partial

    @jax.jit
    def f_d(x):
        n = x.shape[0]
        per = TILE * LANES
        npad = ((n + per - 1) // per) * per
        if npad != n:
            x = jnp.concatenate([x, jnp.full((npad - n,), jnp.iinfo(jnp.int64).min, x.dtype)])
        x2 = x.reshape(npad // LANES, LANES)
        return pl.pallas_call(
            k_d, grid=(npad // per,),
            in_specs=[pl.BlockSpec((TILE, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        )(x2)[0, 0]
    bench(f_d, x, name="D: pallas direct-i64 kernel")

    # E. i32 sanity
    x32 = jnp.asarray(x_host.astype(np.int32))
    jax.block_until_ready(x32)
    f_e = jax.jit(lambda x: jnp.sum((x > T).astype(jnp.int32)))
    bench(f_e, x32, name="E: fused count i32 (400MB read)")

    # F. the actual SQL path today
    import clickhouse_tpu as ch
    s = ch.connect()
    s.execute("CREATE TABLE hits (x Int64)")
    s.insert_pydict("hits", {"x": x_host})
    sql = "SELECT count() FROM hits WHERE x > 500000"
    s.execute(sql)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        s.execute(sql)
        times.append(time.perf_counter() - t0)
    print(f"{'F: full SQL e2e':42s} {np.median(times)*1e3:8.2f} ms")

    s.execute("CREATE TABLE tiny (x Int64)")
    s.insert_pydict("tiny", {"x": np.arange(1024, dtype=np.int64)})
    s.execute("SELECT count() FROM tiny WHERE x > 500000")
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        s.execute("SELECT count() FROM tiny WHERE x > 500000")
        times.append(time.perf_counter() - t0)
    print(f"{'G: tiny-table e2e (overhead)':42s} {np.median(times)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
