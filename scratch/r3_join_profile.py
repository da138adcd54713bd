"""Stage-by-stage profile of the Q4 join shape on the real TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
from clickhouse_tpu.ops import join_ops, hash_ops

N = 100_000_000
G = 1_048_576


def bench(name, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    r = jax.block_until_ready(fn_j(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)


fk = jnp.asarray((np.arange(N, dtype=np.int64) * 40503) % 1_000_000,
                 jnp.int32)
bk = jnp.arange(G, dtype=jnp.int32)
bv = jnp.ones((G,), jnp.bool_) & (jnp.arange(G) < 1_000_000)
pv = jnp.ones((N,), jnp.bool_)
label = jnp.asarray((np.arange(G, dtype=np.int64) * 7) % 97, jnp.int32)

# full current propagate join
bench("propagate_join full",
      lambda a, b, c, d, e: join_ops.propagate_join(
          [a], b, [c], d, [e]).words[0].astype(jnp.int64).sum(),
      bk, bv, fk, pv, label)

M = G + N


def first_sort(bk_, bv_, fk_, pv_, lab_):
    invalid = jnp.concatenate([jnp.logical_not(bv_), jnp.logical_not(pv_)])
    keys = jnp.concatenate([bk_, fk_])
    is_probe = jnp.concatenate([jnp.zeros((G,), jnp.bool_),
                                jnp.ones((N,), jnp.bool_)])
    rowid = jnp.arange(M, dtype=jnp.int32)
    carry = jnp.concatenate([lab_, jnp.zeros((N,), jnp.int32)])
    out = jax.lax.sort([invalid, keys, is_probe, rowid, carry], num_keys=4,
                       is_stable=False)
    return [jnp.sum(o.astype(jnp.int64) if o.dtype != jnp.bool_ else o.astype(jnp.int32)) for o in out]


bench("first sort (5 ops, nk=4)", first_sort, bk, bv, fk, pv, label)


def first_sort_packed(bk_, bv_, fk_, pv_, lab_):
    # pack [invalid:1 | key:32 | is_probe:1 | spare] into one i64 token
    invalid = jnp.concatenate([jnp.logical_not(bv_), jnp.logical_not(pv_)])
    keys = jnp.concatenate([bk_, fk_]).astype(jnp.int64)
    is_probe = jnp.concatenate([jnp.zeros((G,), jnp.int64),
                                jnp.ones((N,), jnp.int64)])
    tok = (invalid.astype(jnp.int64) << 40) | (keys << 8) | is_probe
    rowid = jnp.arange(M, dtype=jnp.int32)
    carry = jnp.concatenate([lab_, jnp.zeros((N,), jnp.int32)])
    out = jax.lax.sort([tok, rowid, carry], num_keys=1, is_stable=False)
    return [jnp.sum(o.astype(jnp.int64) if o.dtype != jnp.bool_ else o.astype(jnp.int32)) for o in out]


bench("first sort packed (3 ops, nk=1)", first_sort_packed,
      bk, bv, fk, pv, label)


def scans(tok, carry):
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
    return matched.sum(), pr.sum()


tok0 = jnp.arange(M, dtype=jnp.int64)
carry0 = jnp.zeros((M,), jnp.int32)
bench("scans (3 cummax)", scans, tok0, carry0)


def backsort(rowid_s, m, w):
    out = jax.lax.sort([rowid_s, m, w], num_keys=1, is_stable=False)
    return [jnp.sum(o.astype(jnp.int64) if o.dtype != jnp.bool_ else o.astype(jnp.int32)) for o in out]


bench("back sort (3 ops)", backsort, jnp.arange(M, dtype=jnp.int32),
      jnp.zeros((M,), jnp.int8), carry0)


# dense-table gather alternative for count+sum
def dense_gather(fk_, lab_):
    # table[k] = label+1, 0 = absent
    tbl = jnp.where(bv, lab_ + 1, 0)
    g = tbl[fk_]
    cnt = jnp.sum((g > 0).astype(jnp.int64))
    ssum = jnp.sum(jnp.where(g > 0, g - 1, 0).astype(jnp.int64))
    return cnt, ssum


bench("dense gather count+sum", dense_gather, fk, label)


# aggregate-in-sorted-order (no back sort): matched count + sum of
# propagated carry at probe rows
def agg_sorted(tok, carry):
    m, pr = None, None
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
    w = pr.astype(jnp.uint32).astype(jnp.int32)
    cnt = jnp.sum(matched.astype(jnp.int64))
    ssum = jnp.sum(jnp.where(matched, w, 0).astype(jnp.int64))
    return cnt, ssum


bench("sort+scan+agg (no back sort)",
      lambda a, b, c, d, e: agg_sorted(*
          jax.lax.sort([
              (jnp.concatenate([jnp.logical_not(b), jnp.logical_not(d)])
               .astype(jnp.int64) << 40)
              | (jnp.concatenate([a, c]).astype(jnp.int64) << 8)
              | jnp.concatenate([jnp.zeros((G,), jnp.int64),
                                 jnp.ones((N,), jnp.int64)]),
              jnp.concatenate([e, jnp.zeros((N,), jnp.int32)])],
              num_keys=1, is_stable=False)),
      bk, bv, fk, pv, label)
