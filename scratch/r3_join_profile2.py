"""Join-stage profile, order-dependent checksums, no captured constants."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
from clickhouse_tpu.ops import join_ops

N = 100_000_000
G = 1_048_576
M = G + N


def bench(name, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    r = jax.block_until_ready(fn_j(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms   [chk {r}]", flush=True)


fk = jnp.asarray((np.arange(N, dtype=np.int64) * 40503) % 1_000_000,
                 jnp.int32)
bk = jnp.arange(G, dtype=jnp.int32)
bv = jnp.arange(G) < 1_000_000
pv = jnp.ones((N,), jnp.bool_)
label = jnp.asarray((np.arange(G, dtype=np.int64) * 7) % 97, jnp.int32)
wM = jnp.arange(M, dtype=jnp.int32) % 127


def chk(o, w):
    return (o.astype(jnp.int64) * w[:o.shape[0]].astype(jnp.int64)).sum()


bench("propagate_join full",
      lambda a, b, c, d, e, w: chk(join_ops.propagate_join(
          [a], b, [c], d, [e]).words[0], w),
      bk, bv, fk, pv, label, wM)


def first_sort(bk_, bv_, fk_, pv_, lab_, w):
    invalid = jnp.concatenate([jnp.logical_not(bv_), jnp.logical_not(pv_)])
    keys = jnp.concatenate([bk_, fk_])
    is_probe = jnp.concatenate([jnp.zeros((G,), jnp.bool_),
                                jnp.ones((N,), jnp.bool_)])
    rowid = jnp.arange(M, dtype=jnp.int32)
    carry = jnp.concatenate([lab_, jnp.zeros((N,), jnp.int32)])
    out = jax.lax.sort([invalid, keys, is_probe, rowid, carry], num_keys=4,
                       is_stable=False)
    return sum(chk(o.astype(jnp.int32), w) for o in out)


bench("first sort (5 ops, nk=4)", first_sort, bk, bv, fk, pv, label, wM)


def first_sort_packed(bk_, bv_, fk_, pv_, lab_, w):
    invalid = jnp.concatenate([jnp.logical_not(bv_), jnp.logical_not(pv_)])
    keys = jnp.concatenate([bk_, fk_]).astype(jnp.int64)
    is_probe = jnp.concatenate([jnp.zeros((G,), jnp.int64),
                                jnp.ones((N,), jnp.int64)])
    tok = (invalid.astype(jnp.int64) << 40) | (keys << 8) | is_probe
    rowid = jnp.arange(M, dtype=jnp.int32)
    carry = jnp.concatenate([lab_, jnp.zeros((N,), jnp.int32)])
    out = jax.lax.sort([tok, rowid, carry], num_keys=1, is_stable=False)
    return sum(chk(o.astype(jnp.int32), w) for o in out)


bench("first sort packed (3 ops, nk=1)", first_sort_packed,
      bk, bv, fk, pv, label, wM)


def scans(tok, carry, w):
    pos = jnp.arange(M, dtype=jnp.int32)
    is_probe = (tok & 1).astype(jnp.bool_)
    key = (tok >> 8).astype(jnp.int32)
    boundary = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                key[1:] != key[:-1]])
    is_build = jnp.logical_not(is_probe)
    run_start = jax.lax.cummax(jnp.where(boundary, pos, 0))
    last_build = jax.lax.cummax(jnp.where(is_build, pos, -1))
    matched = (last_build >= run_start) & is_probe
    pos64 = pos.astype(jnp.int64)
    packed = jnp.where(is_build & boundary,
                       (pos64 << 32) | carry.astype(jnp.uint32)
                       .astype(jnp.int64), jnp.int64(-1))
    pr = jax.lax.cummax(packed)
    return chk(matched.astype(jnp.int32), w) + chk(pr.astype(jnp.int32), w)


tok0 = jnp.arange(M, dtype=jnp.int64)
carry0 = jnp.ones((M,), jnp.int32)
bench("scans (3 cummax)", scans, tok0, carry0, wM)


def backsort(rowid_s, m, ww, w):
    out = jax.lax.sort([rowid_s, m, ww], num_keys=1, is_stable=False)
    return sum(chk(o.astype(jnp.int32), w) for o in out)


bench("back sort (3 ops)", backsort,
      jax.random.permutation(jax.random.PRNGKey(1),
                             jnp.arange(M, dtype=jnp.int32)),
      jnp.zeros((M,), jnp.int8), carry0, wM)
