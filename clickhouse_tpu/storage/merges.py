"""Part-merge fold algorithms (numpy, host-side).

The reference's *SortedAlgorithm family applied during merges and OPTIMIZE
(src/Processors/Merges/Algorithms/): rows with equal sort key fold
according to the engine —

  ReplacingMergeTree[(ver)]    keep one row per key: max `ver`, ties → last
                               inserted (ReplacingSortedAlgorithm.cpp)
  SummingMergeTree             sum numeric non-key columns
                               (SummingSortedAlgorithm.cpp)
  CollapsingMergeTree(sign)    ±1 pair cancellation per key
                               (CollapsingSortedAlgorithm.cpp:88-114:
                               p>n → last positive; p<n → first negative;
                               p==n & last positive → both; else nothing)
  VersionedCollapsingMergeTree(sign, ver)
                               pair cancellation per (key, ver)
                               (VersionedCollapsingAlgorithm.cpp)

All folds run on numpy (no pandas round-trip): one stable lexsort +
boundary masks + reduceat — linear after the sort at any table size.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..core import dtypes as dt

__all__ = ["fold_merge"]


def _sort_tokens(v: np.ndarray) -> np.ndarray:
    if v.dtype == object:
        # dictionary rank: stable order for strings / mixed objects
        uniq, codes = np.unique(np.asarray([str(x) for x in v]),
                                return_inverse=True)
        return codes.astype(np.int64)
    return v


def _order_and_bounds(key_cols: List[np.ndarray], n: int):
    """Stable sort order by keys (+insertion order) and group-start mask."""
    toks = [_sort_tokens(k) for k in key_cols]
    order = np.lexsort(tuple(reversed(toks)))  # lexsort is stable
    starts = np.ones(n, bool)
    if n > 1:
        same = np.ones(n - 1, bool)
        for t in toks:
            ts = t[order]
            same &= ts[1:] == ts[:-1]
        starts[1:] = ~same
    return order, starts


def _take(cols: Dict[str, np.ndarray], idx: np.ndarray
          ) -> Dict[str, np.ndarray]:
    return {k: v[idx] for k, v in cols.items()}


def fold_merge(cols: Dict[str, np.ndarray], schema: Dict[str, dt.DType],
               engine: str, order_by: List[str],
               engine_args: Optional[List[str]] = None
               ) -> Dict[str, np.ndarray]:
    """Fold concatenated part columns under the engine's merge algorithm.
    Always returns rows sorted by the sort key (merge output invariant)."""
    engine = engine.lower()
    args = list(engine_args or [])
    keys = [k for k in order_by if k in cols]
    n = len(next(iter(cols.values()))) if cols else 0
    if not keys or n == 0:
        return cols
    key_cols = [cols[k] for k in keys]

    if engine == "replacingmergetree":
        ver = args[0] if args and args[0] in cols else None
        sort_cols = key_cols + ([cols[ver]] if ver else [])
        order, starts = _order_and_bounds(sort_cols if ver else key_cols, n)
        if ver:
            # secondary sort by version puts the max-version row last in
            # its key group; recompute key-only boundaries on that order
            toks = [_sort_tokens(k)[order] for k in key_cols]
            starts = np.ones(n, bool)
            if n > 1:
                same = np.ones(n - 1, bool)
                for t in toks:
                    same &= t[1:] == t[:-1]
                starts[1:] = ~same
        # keep the LAST row of each group (newest insert / max version)
        keep = np.zeros(n, bool)
        keep[:-1] = starts[1:]
        keep[-1] = True
        return _take(cols, order[keep])

    if engine == "summingmergetree":
        order, starts = _order_and_bounds(key_cols, n)
        group_starts = np.nonzero(starts)[0]
        out = {}
        for name, v in cols.items():
            vs = v[order]
            t = schema.get(name)
            if name in keys or v.dtype == object \
                    or (t is not None and t.is_dictionary) \
                    or v.dtype.kind not in "iuf":
                out[name] = vs[group_starts]       # first row's value
            else:
                out[name] = np.add.reduceat(vs, group_starts).astype(v.dtype)
        return out

    if engine == "collapsingmergetree":
        sign_col = args[0] if args else "sign"
        if sign_col not in cols:
            return _plain_sort(cols, key_cols, n)
        order, starts = _order_and_bounds(key_cols, n)
        sign = np.asarray(cols[sign_col][order], np.int64)
        gid = np.cumsum(starts) - 1
        ng = int(gid[-1]) + 1
        pos_cnt = np.bincount(gid, weights=(sign > 0), minlength=ng)
        neg_cnt = np.bincount(gid, weights=(sign < 0), minlength=ng)
        group_end = np.zeros(ng, np.int64)
        group_end[gid] = np.arange(n)              # last index per group
        isp = sign > 0
        isn = sign < 0
        idxs = np.arange(n)
        last_pos_idx = np.full(ng, -1, np.int64)
        np.maximum.at(last_pos_idx, gid[isp], idxs[isp])
        first_neg_idx = np.full(ng, n, np.int64)
        np.minimum.at(first_neg_idx, gid[isn], idxs[isn])
        last_is_positive = sign[group_end] > 0
        keepable = ((last_is_positive | (pos_cnt != neg_cnt))
                    & ((pos_cnt > 0) | (neg_cnt > 0)))
        emit_first_neg = keepable & (pos_cnt <= neg_cnt) & (first_neg_idx < n)
        emit_last_pos = keepable & (pos_cnt >= neg_cnt) & (last_pos_idx >= 0)
        sel = np.concatenate([first_neg_idx[emit_first_neg],
                              last_pos_idx[emit_last_pos]])
        sel.sort()
        return _take(cols, order[sel])

    if engine == "versionedcollapsingmergetree":
        sign_col = args[0] if args else "sign"
        ver_col = args[1] if len(args) > 1 else None
        if sign_col not in cols or ver_col is None or ver_col not in cols:
            return _plain_sort(cols, key_cols, n)
        # group by (key..., version); pairs of opposite sign annihilate;
        # the |p-n| surplus rows of the majority sign survive
        order, starts = _order_and_bounds(key_cols + [cols[ver_col]], n)
        sign = np.asarray(cols[sign_col][order], np.int64)
        gid = np.cumsum(starts) - 1
        ng = int(gid[-1]) + 1
        pos_cnt = np.bincount(gid, weights=(sign > 0),
                              minlength=ng).astype(np.int64)
        neg_cnt = np.bincount(gid, weights=(sign < 0),
                              minlength=ng).astype(np.int64)
        surplus = pos_cnt - neg_cnt
        # rank of each row within its (group, sign) run, counted from the
        # END: the last |surplus| same-sign rows survive
        keep = np.zeros(n, bool)
        for s, cnt in ((1, surplus), (-1, -surplus)):
            m = sign == s
            if not m.any():
                continue
            # per-group position from the end among rows of sign s
            pos_in = np.cumsum(m) - 1
            base = np.zeros(ng, np.int64)
            first_of_group = np.nonzero(starts)[0]
            # count of sign-s rows before each group start
            cum = np.concatenate([[0], np.cumsum(m)])
            before = cum[first_of_group]
            total = (np.bincount(gid, weights=m, minlength=ng)
                     .astype(np.int64))
            from_end = (before[gid] + total[gid] - 1) - pos_in
            keep |= m & (from_end < np.maximum(cnt, 0)[gid])
        return _take(cols, order[keep])

    # plain MergeTree / AggregatingMergeTree: merge = stable key sort
    return _plain_sort(cols, key_cols, n)


def _plain_sort(cols, key_cols, n):
    toks = [_sort_tokens(k) for k in key_cols]
    order = np.lexsort(tuple(reversed(toks)))
    return {k: v[order] for k, v in cols.items()}
