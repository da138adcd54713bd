"""Q8 anatomy: where do 175 ms go when the roofline is 6.3 ms?"""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/scratch/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_enable_x64", True)

NV, DV, K = 10_000_000, 128, 10
rng = np.random.default_rng(8)
V = jnp.asarray(rng.normal(size=(NV, DV)).astype(np.float32))
q = jnp.asarray(rng.normal(size=DV).astype(np.float32))


def timeit(name, f, *a, reps=5):
    r = jax.block_until_ready(f(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)*1e3:8.2f} ms")
    return r


# a) distance matmul alone
@jax.jit
def dist(Vm, qv):
    dots = Vm @ qv
    n2 = jnp.sum(Vm * Vm, axis=1)
    return 1.0 - dots * jax.lax.rsqrt(n2 * jnp.dot(qv, qv) + 1e-30)


d = timeit("matmul distance", dist, V, q)


# b) order token (f32 -> sortable u64)
@jax.jit
def tok(x):
    f = x.astype(jnp.float64)
    bits = f.view(jnp.int64)
    u = jnp.where(bits < 0, ~bits, bits | jnp.int64(-2**63))
    return u.astype(jnp.uint64)


t = timeit("order_token f64", tok, d)


# c) current hierarchical tile-sort topk (3 keys, 8192 tiles)
@jax.jit
def tile_sort_topk(token):
    CH = 8192
    rows = token.shape[0] // CH
    rowid = jnp.arange(token.shape[0], dtype=jnp.int32)
    inv = jnp.zeros(token.shape[0], jnp.bool_)
    s_inv, s_tok, s_id = jax.lax.sort(
        [inv.reshape(rows, CH), token.reshape(rows, CH),
         rowid.reshape(rows, CH)], num_keys=3, is_stable=False)
    cand = [s_inv[:, :K].reshape(-1), s_tok[:, :K].reshape(-1),
            s_id[:, :K].reshape(-1)]
    f = jax.lax.sort(cand, num_keys=3, is_stable=False)
    return f[2][:K]


timeit("tile-sort topk (current)", tile_sort_topk, t)


# d) lax.top_k on tiles of the RAW f32 distances (negated)
@jax.jit
def topk_tiles_f32(x):
    CH = 8192
    rows = x.shape[0] // CH
    v2, i2 = jax.lax.top_k(-x.reshape(rows, CH), K)
    flat_v = v2.reshape(-1)
    flat_i = (i2 + (jnp.arange(rows, dtype=jnp.int32) * CH)[:, None]
              ).reshape(-1)
    v3, i3 = jax.lax.top_k(flat_v, K)
    return flat_i[i3]


timeit("lax.top_k f32 tiles", topk_tiles_f32, d)


# e) lax.top_k on u64 tokens (complemented)
@jax.jit
def topk_tiles_u64(token):
    CH = 8192
    rows = token.shape[0] // CH
    neg = (~token).view(jnp.int64)     # not order-exact for full range; probe
    v2, i2 = jax.lax.top_k(neg.reshape(rows, CH), K)
    flat_v = v2.reshape(-1)
    flat_i = (i2 + (jnp.arange(rows, dtype=jnp.int32) * CH)[:, None]
              ).reshape(-1)
    v3, i3 = jax.lax.top_k(flat_v, K)
    return flat_i[i3]


timeit("lax.top_k u64 tiles", topk_tiles_u64, t)


# f) single flat lax.top_k over 10M
@jax.jit
def topk_flat(x):
    return jax.lax.top_k(-x, K)[1]


timeit("lax.top_k flat f32", topk_flat, d)


# g) fused: matmul + tile topk end-to-end
@jax.jit
def fused(Vm, qv):
    return topk_tiles_f32.__wrapped__(dist.__wrapped__(Vm, qv))


timeit("fused dist+topk", fused, V, q)

# h) wider tiles
for CH in (32768, 131072):
    @jax.jit
    def topk_w(x, CH=CH):
        rows = x.shape[0] // CH
        pad = (-x.shape[0]) % CH
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), jnp.inf, x.dtype)])
            rows = x.shape[0] // CH
        v2, i2 = jax.lax.top_k(-x.reshape(rows, CH), K)
        flat_v = v2.reshape(-1)
        flat_i = (i2 + (jnp.arange(rows, dtype=jnp.int32) * CH)[:, None]
                  ).reshape(-1)
        v3, i3 = jax.lax.top_k(flat_v, K)
        return flat_i[i3]
    timeit(f"lax.top_k f32 tiles CH={CH}", topk_w, d)
