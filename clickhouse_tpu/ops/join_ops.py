"""Hash-join kernels: build, probe, expand.

TPU-native replacement for the reference HashJoin
(src/Interpreters/HashJoin/HashJoin.h:110, probe loops in
HashJoinMethodsImpl.h:334).  The reference builds a linear-probe hash table
with arena-allocated row lists; on TPU we avoid atomics/CAS entirely:

  build:  group the build side by key (sort-based, reuses agg_ops machinery)
          -> per-group [seg_start, seg_len] into the key-sorted row order;
          then order the unique groups by their 64-bit key hash.  The "hash
          table" is simply this hash-sorted array — fully deterministic,
          built by two large sorts.
  probe:  vectorized binary search of each probe row's hash in the sorted
          group hashes (log2(G) gathers), then verify actual key equality
          scanning the (device-computed, ~1) maximal equal-hash run.
  expand: 1-to-N match expansion via the scatter + cumsum replicate trick —
          the analog of IColumn::replicate (src/Columns/IColumn.h:440).

LEFT joins emit one row per unmatched probe row with a match_mask=0 so the
executor can null build-side columns (join_use_nulls semantics).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import agg_ops, hash_ops

__all__ = ["JoinTable", "build_join_table", "probe_join_table", "expand_matches"]


@dataclasses.dataclass
class JoinTable:
    """Build-side index, ordered by key hash."""
    hashes: jax.Array        # (G,) uint64 sorted; padding = u64 max
    key_cols: List[jax.Array]  # each (G,) unique key values, hash-sorted
    seg_start: jax.Array     # (G,) int64 start into row_order
    seg_len: jax.Array       # (G,) int64 rows per group (0 for padding)
    row_order: jax.Array     # (N,) int32 build row ids, key-sorted
    num_groups: jax.Array    # int64 device scalar
    max_run: jax.Array       # int64 device scalar: max equal-hash run length

    @property
    def group_capacity(self) -> int:
        return int(self.hashes.shape[0])


_PAD_HASH = jnp.uint64(2**64 - 1)


def build_join_table(keys: Sequence[jax.Array], row_valid: jax.Array,
                     group_capacity: int) -> JoinTable:
    g = agg_ops.group_by_sort(keys, row_valid, group_capacity)
    seg_len = g.ends - g.starts          # scatter-free (searchsorted-derived)
    seg_start = g.starts

    h = hash_ops.hash_columns(g.unique_keys)
    gidx = jnp.arange(group_capacity, dtype=jnp.int64)
    is_group = gidx < g.num_groups
    h = jnp.where(is_group, h, _PAD_HASH)
    # Hash-sort the groups (payload: original group index).
    h_sorted, order = jax.lax.sort([h, gidx.astype(jnp.int32)], num_keys=1)
    key_cols = [k[order] for k in g.unique_keys]
    seg_start_s = seg_start[order]
    seg_len_s = jnp.where(is_group[order], seg_len[order], jnp.int64(0))

    # Maximal run of equal hashes (>=1 when any group exists): needed to bound
    # the probe-side collision scan.  64-bit collisions make runs >1 rare.
    same = jnp.concatenate([jnp.zeros((1,), jnp.int64),
                            (h_sorted[1:] == h_sorted[:-1]).astype(jnp.int64)])
    same = jnp.where(h_sorted == _PAD_HASH, 0, same)
    idx = jnp.arange(group_capacity, dtype=jnp.int64)
    last_reset = jax.lax.cummax(jnp.where(same == 0, idx, -1))
    run = idx - last_reset               # consecutive equal-hash count at i
    max_run = jnp.maximum(jnp.max(run) + 1, 1)

    return JoinTable(hashes=h_sorted, key_cols=key_cols, seg_start=seg_start_s,
                     seg_len=seg_len_s, row_order=g.perm,
                     num_groups=g.num_groups, max_run=max_run)


def probe_join_table(table: JoinTable, probe_keys: Sequence[jax.Array],
                     probe_valid: jax.Array) -> jax.Array:
    """Group index (into the hash-sorted table) per probe row, or -1."""
    G = table.group_capacity
    h = hash_ops.hash_columns(list(probe_keys))
    h = jnp.where(probe_valid, h, _PAD_HASH)
    base = jnp.searchsorted(table.hashes, h, side="left").astype(jnp.int32)

    def body(state):
        r, found = state
        cand = jnp.clip(base + r, 0, G - 1)
        hash_eq = (table.hashes[cand] == h) & (base + r < G)
        key_eq = hash_eq
        for tk, pk in zip(table.key_cols, probe_keys):
            key_eq = key_eq & (tk[cand] == pk)
        key_eq = key_eq & probe_valid
        found = jnp.where((found < 0) & key_eq, cand, found)
        return r + 1, found

    def cond(state):
        r, _ = state
        return r < table.max_run.astype(jnp.int32)

    _, found = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.full(h.shape, -1, jnp.int32)))
    return found


def expand_matches(table: JoinTable, matched_gid: jax.Array,
                   probe_valid: jax.Array, out_capacity: int,
                   left: bool = False, any_join: bool = False
                   ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Expand 1-to-N matches into flat output row pairs.

    Returns (probe_row_idx, build_row_idx, match_mask, out_count):
      probe_row_idx[j] -- source probe row of output row j
      build_row_idx[j] -- source build row (undefined where match_mask=0)
      match_mask[j]    -- False for LEFT-join null rows and padding
      out_count        -- device scalar of real output rows
    """
    matched = matched_gid >= 0
    safe_gid = jnp.maximum(matched_gid, 0)
    # 32-bit expansion arithmetic: out_capacity < 2^31 always; halves the
    # intermediate footprint on billion-row probes
    lens = jnp.where(matched & probe_valid,
                     table.seg_len[safe_gid].astype(jnp.int32), 0)
    if any_join:
        lens = jnp.minimum(lens, 1)
    if left:
        lens = jnp.where(probe_valid, jnp.maximum(lens, 1), 0)
    cum = jnp.cumsum(lens)                       # inclusive prefix
    first_out = cum - lens                       # exclusive prefix
    out_count = cum[-1].astype(jnp.int64)

    # Replicate (IColumn::replicate analog), gather-only: output slot j
    # belongs to the probe row whose cumulative range covers j — a vectorized
    # binary search over the inclusive prefix (no scatter: TPU serializes it).
    j = jnp.arange(out_capacity, dtype=jnp.int32)
    probe_row_idx = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
    probe_row_idx = jnp.clip(probe_row_idx, 0, lens.shape[0] - 1)

    k = j - first_out[probe_row_idx]             # offset within the segment
    gid_out = safe_gid[probe_row_idx]
    m_out = matched[probe_row_idx] & probe_valid[probe_row_idx]
    sorted_pos = jnp.clip(table.seg_start[gid_out].astype(jnp.int32) + k, 0,
                          table.row_order.shape[0] - 1)
    build_row_idx = table.row_order[sorted_pos]
    valid_out = j.astype(jnp.int64) < out_count
    match_mask = m_out & valid_out
    return probe_row_idx, build_row_idx, match_mask, out_count
