"""Q2b (GROUP BY 1M keys) stage profile on the real TPU."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from clickhouse_tpu.ops import agg_ops, sort_ops

N = 100_000_000
CAPG = 1 << 21


def bench(name, fn, *args, reps=3):
    f = jax.jit(fn)
    int(f(*args))                  # value fetch forces completion (x64 +
    ts = []                        # axon: block_until_ready returns early)
    for _ in range(reps):
        t0 = time.perf_counter()
        int(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)


x = jnp.asarray((np.arange(N, dtype=np.int64) * 2654435761) % 1_000_003,
                jnp.int32)
valid = jnp.ones((N,), jnp.bool_)
w = jnp.arange(N, dtype=jnp.int32) % 127


def full(x_, v_):
    g = agg_ops.group_by_sort([x_], v_, CAPG)
    c = g.count_rows(v_)
    return (c * jnp.arange(CAPG, dtype=jnp.int64) % 1000003).sum() \
        + (g.unique_keys[0].astype(jnp.int64) * 3).sum()


bench("full group_by_sort + count + uniq", full, x, valid)


def sort_only(x_, v_, w):
    rowid = jnp.arange(N, dtype=jnp.int32)
    inv = jnp.logical_not(v_)
    o = jax.lax.sort([inv, x_, rowid], num_keys=2, is_stable=True)
    return sum((t.astype(jnp.int64) * w.astype(jnp.int64)).sum()
               for t in o[1:])


bench("sort (3 ops nk=2 stable)", sort_only, x, valid, w)


def sort_unstable(x_, v_, w):
    rowid = jnp.arange(N, dtype=jnp.int32)
    inv = jnp.logical_not(v_)
    o = jax.lax.sort([inv, x_, rowid], num_keys=2, is_stable=False)
    return sum((t.astype(jnp.int64) * w.astype(jnp.int64)).sum()
               for t in o[1:])


bench("sort (3 ops nk=2 UNstable)", sort_unstable, x, valid, w)


def sort_2op(x_, v_, w):
    rowid = jnp.arange(N, dtype=jnp.int32)
    o = jax.lax.sort([x_, rowid], num_keys=1, is_stable=False)
    return sum((t.astype(jnp.int64) * w.astype(jnp.int64)).sum()
               for t in o)


bench("sort (2 ops nk=1 unstable)", sort_2op, x, valid, w)


def scans_only(xs):
    boundary = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                xs[1:] != xs[:-1]])
    gid = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    from clickhouse_tpu.ops import scan_ops
    starts, ends = scan_ops.segment_starts_ends(
        jnp.minimum(gid, CAPG), CAPG)
    counts = (ends - starts).astype(jnp.int64)
    return (counts * (jnp.arange(CAPG) % 97)).sum()


xs0 = jax.lax.sort([x], num_keys=1)[0]
bench("boundary+extents+counts", scans_only, xs0)


def topk_only(c):
    v, i = jax.lax.top_k(c, 10)
    return v.sum() + i.sum()


cnts = jnp.ones((CAPG,), jnp.int64)
bench("top-10 of 2M", topk_only, cnts)
