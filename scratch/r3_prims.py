"""Primitive microbenchmarks on the real TPU: sort and gather walls."""
import time
import numpy as np
import jax
import jax.numpy as jnp

N = 100_000_000


def bench(name, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    r = fn_j(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{name}: {t*1e3:.1f} ms  ({N/t/1e9:.2f} G elem/s)", flush=True)


key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (N,), 0, 1_000_000, jnp.int32)
tbl_1m = jnp.arange(1_000_000, dtype=jnp.int32)
tbl_1k = jnp.arange(1024, dtype=jnp.int32)
x = jax.random.randint(key, (N,), 0, 2**31 - 1, jnp.int32)
x64 = x.astype(jnp.int64)

bench("gather 100M from 1M-entry i32", lambda i: tbl_1m[i].sum(), idx)
bench("gather 100M from 1k-entry i32", lambda i: tbl_1k[i & 1023].sum(), idx)
bench("sort 1-op i32", lambda a: jax.lax.sort([a], num_keys=1)[0].astype(jnp.int64).sum(), x)
bench("sort 1-op i64", lambda a: jax.lax.sort([a], num_keys=1)[0].astype(jnp.int64).sum(), x64)
bench("sort 2-op i32", lambda a, b: jax.lax.sort([a, b], num_keys=1)[0].astype(jnp.int64).sum(),
      x, idx)
bench("sort 5-op i32",
      lambda a, b: sum(o.astype(jnp.int64).sum() for o in jax.lax.sort([a, b, b, b, b], num_keys=2)), x, idx)
bench("sort bounded-key i32 (1M bound)",
      lambda a, b: jax.lax.sort([a, b], num_keys=1)[0].astype(jnp.int64).sum(), idx, x)
bench("cummax i64", lambda a: jax.lax.cummax(a)[-8:], x64)
bench("cumsum i32", lambda a: jnp.cumsum(a)[-8:], x)
