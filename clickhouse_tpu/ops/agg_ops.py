"""Grouping machinery: sort-based and (later) hash-based GROUP BY cores.

TPU-native replacement for the reference Aggregator's 143 hash-table variants
(src/Interpreters/Aggregator.h:71, AggregatedDataVariants.h:20-137).  Per
SURVEY.md §7 the robust core is *sort-based grouping*: sort rows by key,
derive segment ids, and run segment reductions — every step is a large
bandwidth-bound vector op that XLA tiles well, with no atomics and no dynamic
memory.  The output has a static capacity (`num_groups_cap`) and a device
scalar group count, mirroring the fixed-capacity block discipline.

The mergeable-state algebra (partial states that can be re-grouped and merged,
reference: IAggregateFunction::merge + QueryProcessingStage::WithMergeableState)
is preserved: states are ordinary columns, so the distributed two-stage
aggregation reuses this exact machinery after an all-to-all by bucket.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["Grouping", "group_by_sort", "segment_reduce", "SEGMENT_OPS"]


@dataclasses.dataclass
class Grouping:
    """Result of assigning each (valid) row to a dense group id.

    sorted rows [0, capacity): rows reordered so equal keys are adjacent;
    group_ids[i] = dense id of sorted row i, or num_groups_cap for padding
    rows (so scatters/segment ops drop them).

    perm=None marks the sort-free trivial grouping (single global group):
    rows keep their original order and ids are NOT sorted.
    """
    perm: Optional[jax.Array]    # int32 row permutation applied to inputs
    group_ids: jax.Array         # int32, padding rows -> num_groups_cap
    num_groups: jax.Array        # int64 device scalar
    unique_keys: List[jax.Array]  # each (num_groups_cap,), padding = 0
    num_groups_cap: int
    ids_sorted: bool = True
    # dense grouping: slots are a direct function of the key, so empty slots
    # exist between groups; `present` marks live slots (else prefix layout)
    present: Optional[jax.Array] = None

    def take(self, array: jax.Array) -> jax.Array:
        """Reorder a payload column into sorted-by-key order."""
        if self.perm is None:
            return array
        return array[self.perm]

    def group_valid(self) -> jax.Array:
        if self.present is not None:
            return self.present
        return jnp.arange(self.num_groups_cap, dtype=jnp.int64) \
            < self.num_groups


def group_by_sort(keys: Sequence[jax.Array], row_valid: jax.Array,
                  num_groups_cap: int,
                  secondary: Sequence[jax.Array] = ()) -> Grouping:
    """Dense group ids via multi-operand sort.

    keys      -- storage arrays of the GROUP BY columns (any fixed-width dtype;
                 strings arrive as dictionary codes)
    row_valid -- bool mask of valid rows (False rows are excluded)
    secondary -- extra sort operands ordering rows *within* each group without
                 affecting group boundaries (used by holistic aggregates:
                 quantileExact needs group-local value order).  Group ids are
                 identical to a call without `secondary`.
    """
    cap = keys[0].shape[0]
    rowid = jnp.arange(cap, dtype=jnp.int32)
    invalid = jnp.logical_not(row_valid)
    # Sort with validity first so padding rows sink to the end, then the key
    # columns lexicographically; rowid payload carries the permutation.
    operands = [invalid] + list(keys) + list(secondary) + [rowid]
    sorted_ops = jax.lax.sort(operands, num_keys=1 + len(keys) + len(secondary))
    inv_s = sorted_ops[0]
    keys_s = sorted_ops[1:1 + len(keys)]
    perm = sorted_ops[-1]

    boundary = jnp.zeros(cap, dtype=jnp.bool_).at[0].set(True)
    for ks in keys_s:
        boundary = boundary | jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), ks[1:] != ks[:-1]])
    boundary = boundary | jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), inv_s[1:] != inv_s[:-1]])

    gid = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    valid_s = jnp.logical_not(inv_s)
    num_groups = jnp.max(jnp.where(valid_s, gid, -1)).astype(jnp.int64) + 1
    # Padding rows get an out-of-range id so downstream scatters drop them.
    gid = jnp.where(valid_s, gid, num_groups_cap)

    unique_keys = []
    for ks in keys_s:
        uk = jnp.zeros((num_groups_cap,), ks.dtype).at[gid].set(ks, mode="drop")
        unique_keys.append(uk)
    return Grouping(perm=perm, group_ids=gid, num_groups=num_groups,
                    unique_keys=unique_keys, num_groups_cap=num_groups_cap)


def group_by_dense(keys: Sequence[jax.Array],
                   dims: Sequence[Tuple[int, int]],
                   row_valid: jax.Array, num_groups_cap: int) -> Grouping:
    """Direct-array grouping: the slot is computed from the key, no sort.

    The generalized FixedHashMap (src/Common/HashTable/FixedHashMap.h) path:
    chosen when interval analysis proves prod(sizes) <= max_groups.

    keys -- key storage arrays;  dims[i] = (lo_i, size_i) proven bounds.
    Multi-key grouping linearizes: slot = sum((k_i - lo_i) * stride_i).
    """
    cap = keys[0].shape[0]
    slot = jnp.zeros((cap,), jnp.int64)
    stride = 1
    total = 1
    for k, (lo, size) in zip(keys, dims):
        d = jnp.clip(k.astype(jnp.int64) - lo, 0, size - 1)
        slot = slot + d * stride
        stride *= size
        total *= size
    assert total <= num_groups_cap, "dense grouping exceeds capacity"
    ids = jnp.where(row_valid, slot, num_groups_cap).astype(jnp.int32)
    present = jnp.zeros((num_groups_cap,), jnp.bool_).at[ids].set(
        True, mode="drop")
    num_groups = jnp.sum(present.astype(jnp.int64))
    # slot -> key value per dimension (pure arithmetic on the slot index)
    uks = []
    idx = jnp.arange(num_groups_cap, dtype=jnp.int64)
    stride = 1
    for k, (lo, size) in zip(keys, dims):
        uks.append(((idx // stride) % size + lo).astype(k.dtype))
        stride *= size
    return Grouping(perm=None, group_ids=ids, num_groups=num_groups,
                    unique_keys=uks, num_groups_cap=num_groups_cap,
                    ids_sorted=False, present=present)


def group_trivial(row_valid: jax.Array, num_groups_cap: int = 1024
                  ) -> Grouping:
    """Sort-free grouping for GROUP BY (): one global group.

    The reference's Aggregator::executeWithoutKey analog — a global
    count()/sum() must cost one masked reduction, not a 100M-row sort.
    """
    cap = row_valid.shape[0]
    gid = jnp.where(row_valid, 0, num_groups_cap).astype(jnp.int32)
    num_groups = jnp.any(row_valid).astype(jnp.int64)
    uk = jnp.zeros((num_groups_cap,), jnp.int32)
    return Grouping(perm=None, group_ids=gid, num_groups=num_groups,
                    unique_keys=[uk], num_groups_cap=num_groups_cap,
                    ids_sorted=False)


# -- segment reductions ------------------------------------------------------

def _segment_sum(data, ids, n, sorted_):
    return jax.ops.segment_sum(data, ids, num_segments=n,
                               indices_are_sorted=sorted_)


def _segment_min(data, ids, n, sorted_):
    return jax.ops.segment_min(data, ids, num_segments=n,
                               indices_are_sorted=sorted_)


def _segment_max(data, ids, n, sorted_):
    return jax.ops.segment_max(data, ids, num_segments=n,
                               indices_are_sorted=sorted_)


def _segment_any(data, ids, n, sorted_):
    # 'any value of the segment' — last write wins is fine (reference `any`
    # is explicitly non-deterministic; we are at least deterministic).
    return jnp.zeros((n,), data.dtype).at[ids].set(data, mode="drop")


SEGMENT_OPS = {
    "sum": _segment_sum,
    "min": _segment_min,
    "max": _segment_max,
    "any": _segment_any,
}


def segment_reduce(op: str, data: jax.Array, group_ids: jax.Array,
                   num_segments: int, ids_sorted: bool = True) -> jax.Array:
    """Reduce `data` per group.  Padding rows must carry out-of-range ids.

    For min/max the caller must have substituted the op's identity into
    padding rows OR rely on out-of-range drop (segment_min/max drop them and
    fill empty segments with the dtype's identity).
    """
    return SEGMENT_OPS[op](data, group_ids, num_segments, ids_sorted)
