"""Filter: predicate mask -> compacted block.

TPU-native replacement for FilterTransform + IColumn::filter
(src/Processors/Transforms/FilterTransform.cpp:128, SIMD compaction loops at
src/Columns/ColumnsCommon.cpp:145-235).  Output capacity equals input capacity
(static shapes); the surviving-row count is a device scalar — no host sync on
the hot path (SURVEY.md §7 "Dynamic shapes").
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["compaction_indices", "compact_arrays", "count_mask"]


def count_mask(mask: jax.Array) -> jax.Array:
    """Number of selected rows (device scalar, int64)."""
    return jnp.sum(mask.astype(jnp.int64))


def compaction_indices(mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Scatter positions for stream compaction.

    Returns (positions, count): positions[i] is the output slot of row i when
    mask[i], else an out-of-range slot (dropped by the scatter).  One
    cumsum + one scatter per column — O(n), bandwidth-bound, exactly the work
    the reference's SIMD filter loop does per column.
    """
    m = mask.astype(jnp.int32)
    pos = jnp.cumsum(m) - 1
    cap = mask.shape[0]
    positions = jnp.where(mask, pos, cap)  # cap = out-of-bounds -> dropped
    count = (pos[-1] + 1).astype(jnp.int64)
    return positions, count


def compact_arrays(arrays: Sequence[jax.Array], mask: jax.Array
                   ) -> Tuple[list, jax.Array]:
    """Compact each array by the mask into the leading slots.

    Padding slots keep each array's zero value; consumers must respect count.
    """
    positions, count = compaction_indices(mask)
    out = []
    for a in arrays:
        res = jnp.zeros_like(a).at[positions].set(a, mode="drop")
        out.append(res)
    return out, count
