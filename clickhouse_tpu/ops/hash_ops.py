"""Vectorized 64-bit column hashing.

Role of the reference's per-type hash methods (IColumn::updateHashWithValue /
WeakHash, src/Columns/IColumn.h:297) and the hash used for shard routing and
hash tables.  We use a splitmix64-style finalizer — a strong, multiply/xor
mixer that vectorizes cleanly on the VPU (64-bit ops are lane-pair emulated on
TPU, still far cheaper than the gather traffic it feeds).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = ["hash64", "hash_combine", "hash_columns", "bucket_of",
           "bitcast_f64_to_u64", "bitcast_u64_to_f64", "sortable_bits"]

_M1 = jnp.uint64(0xBF58476D1CE4E5B9)
_M2 = jnp.uint64(0x94D049BB133111EB)
_GOLDEN = jnp.uint64(0x9E3779B97F4A7C15)


def hash64(x: jax.Array) -> jax.Array:
    """splitmix64 finalizer over a u64 (or bit-castable) array."""
    z = _to_u64(x)
    z = (z + _GOLDEN).astype(jnp.uint64)
    z = (z ^ (z >> jnp.uint64(30))) * _M1
    z = (z ^ (z >> jnp.uint64(27))) * _M2
    z = z ^ (z >> jnp.uint64(31))
    return z


def bitcast_f64_to_u64(x: jax.Array) -> jax.Array:
    """f64 -> u64 bit pattern via two u32 bitcasts.

    The TPU x64-rewriting pass does not implement 64-bit bitcast-convert, so
    we split into u32 halves (supported) and reassemble with emulated u64
    arithmetic.
    """
    halves = jax.lax.bitcast_convert_type(x, jnp.uint32)  # (..., 2)
    lo = halves[..., 0].astype(jnp.uint64)
    hi = halves[..., 1].astype(jnp.uint64)
    return (hi << jnp.uint64(32)) | lo


def bitcast_u64_to_f64(x: jax.Array) -> jax.Array:
    """Inverse of bitcast_f64_to_u64 (same u32-halves decomposition)."""
    lo = x.astype(jnp.uint32)                      # wrapping: low 32 bits
    hi = (x >> jnp.uint64(32)).astype(jnp.uint32)
    pair = jnp.stack([lo, hi], axis=-1)
    return jax.lax.bitcast_convert_type(pair, jnp.float64)


def _bitcast_u32_to_f32(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def sortable_bits(x: jax.Array):
    """(encoded, decoder) so floats never enter lax.sort as raw operands.

    64-bit float sort operands at ~100M rows crash the TPU compile helper
    (measured); integer bit patterns sort fine.  The encoding is the exact
    bit pattern — which is also the reference's float GROUP BY / join-key
    semantics (hash tables key on the raw 8 bytes: -0.0 and +0.0 are
    distinct keys, equal-bit NaNs collapse into one).  decoder is None for
    non-floats.
    """
    if x.dtype == jnp.float64:
        return bitcast_f64_to_u64(x), bitcast_u64_to_f64
    if x.dtype == jnp.float32:
        return jax.lax.bitcast_convert_type(x, jnp.uint32), _bitcast_u32_to_f32
    return x, None


def _to_u64(x: jax.Array) -> jax.Array:
    dt = x.dtype
    if dt == jnp.uint64:
        return x
    if dt in (jnp.int64, jnp.int8, jnp.int16, jnp.int32, jnp.uint8,
              jnp.uint16, jnp.uint32, jnp.bool_):
        # Wrapping conversion == bit pattern for signed types.
        return x.astype(jnp.uint64)
    if dt == jnp.float64:
        return bitcast_f64_to_u64(x)
    if dt == jnp.float32:
        return jax.lax.bitcast_convert_type(x, jnp.uint32).astype(jnp.uint64)
    raise TypeError(f"hash64: unsupported dtype {dt}")


def hash_combine(h: jax.Array, x: jax.Array) -> jax.Array:
    """Order-dependent combiner (boost-style): h' = mix(h ^ (x + c + h<<6 + h>>2))."""
    x = hash64(x)
    return hash64(h ^ (x + _GOLDEN + (h << jnp.uint64(6)) + (h >> jnp.uint64(2))))


def hash_columns(arrays: Sequence[jax.Array]) -> jax.Array:
    """One u64 hash per row over multiple key columns."""
    assert arrays, "hash_columns requires at least one column"
    h = hash64(arrays[0])
    for a in arrays[1:]:
        h = hash_combine(h, a)
    return h


def bucket_of(h: jax.Array, num_buckets: int) -> jax.Array:
    """Exchange bucket = high hash bits (the reference's two-level convention:
    TwoLevelHashTable.h:32 selects sub-table by high bits)."""
    assert num_buckets & (num_buckets - 1) == 0, "num_buckets must be a power of 2"
    shift = jnp.uint64(64 - num_buckets.bit_length() + 1)
    return (h >> shift).astype(jnp.int32)
