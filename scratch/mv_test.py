import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/scratch/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
V = jnp.asarray(np.random.default_rng(0).normal(size=(10_000_000, 128)).astype(np.float32))
q = jnp.asarray(np.random.default_rng(1).normal(size=128).astype(np.float32))
def chk(r):
    if isinstance(r, tuple):
        return sum(float(jnp.asarray(x).astype(jnp.float32).sum()) for x in r)
    return float(jnp.asarray(r).astype(jnp.float32).sum())
def timeit(name, f, *a, reps=5):
    chk(f(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); chk(f(*a)); ts.append(time.perf_counter()-t0)
    print(f"{name:28s} {min(ts)*1e3:7.2f} ms")
timeit("matvec a@q", jax.jit(lambda V,q: V @ q), V, q)
B = jnp.zeros((128, 8), jnp.float32).at[:, 0].set(q).at[:, 1].set(1.0)
timeit("matmul a@(128,8)", jax.jit(lambda V,B: V @ B), V, B)
timeit("sq-matvec (a*a)@1", jax.jit(lambda V: (V*V) @ jnp.ones((128,), jnp.float32)), V)
def both(V, B):
    d = V @ B
    n2 = (V*V) @ jnp.ones((128,), jnp.float32)
    return d[:,0], n2
timeit("dot + norms", jax.jit(both), V, B)
def cosfull(V, B):
    d, n2 = both(V, B)
    return 1.0 - d * jax.lax.rsqrt(n2 * 100.0 + 1e-30)
timeit("full cosine f32", jax.jit(cosfull), V, B)
def topk(V, B):
    c = cosfull(V, B)
    CH = 16384
    pad = (-c.shape[0]) % CH
    if pad:
        c = jnp.concatenate([c, jnp.full((pad,), jnp.inf, c.dtype)])
    rows = c.shape[0] // CH
    v2, i2 = jax.lax.top_k(-c.reshape(rows, CH), 10)
    fv = v2.reshape(-1); fi = (i2 + (jnp.arange(rows, dtype=jnp.int32)*CH)[:,None]).reshape(-1)
    _, i3 = jax.lax.top_k(fv, 10)
    return fi[i3]
timeit("cosine+topk e2e", jax.jit(topk), V, B)
