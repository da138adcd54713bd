"""Out-of-core streaming execution: tables larger than the device-block
budget stream through the engine chunk by chunk.

The TPU translation of the reference's external aggregation
(src/Interpreters/Aggregator.h:273 writeToTemporaryFile +
src/Interpreters/TemporaryDataOnDisk.cpp): instead of spilling hash-table
state to disk and merging bucket streams, the plan is split at the
aggregation pipeline breaker —

    upper  (ORDER BY / HAVING / LIMIT / projections over the merged groups)
    -------- AggregateNode ----------------------------- breaker
    lower  (scan -> filter -> project -> probe-side joins)

— and the lower part runs once per fixed-capacity chunk inside ONE compiled
XLA program whose carried state is the per-group mergeable aggregation
states (the reference's WithMergeableState algebra).  Each step re-groups
`carry ++ chunk_partials` with the collision-free sort grouping and merges;
this is the sequential twin of the distributed two-stage exchange
(executor._aggregate_two_stage).  Probe-side joins against small build
tables stream for free: the build block is an ordinary argument of the
per-chunk program, so grace-style partitioning is only needed when BOTH
sides exceed HBM.

Chunks come from host RAM (host memory plays the role disk plays for the
reference) with chunk-invariant physical dtypes and global dictionaries
(storage/table.py ChunkSource) so every chunk reuses the same program.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.block import Block
from ..core.column import Column, pad_to
from ..core.errors import CapacityError
from ..core.settings import Settings
from ..core import dtypes as dt
from ..exprs.expr import ColVal
from ..plan import logical as L
from ..ops import agg_ops
from .executor import (Check, ExecBlock, ExecContext, execute_plan,
                       materialize, _agg_key_arrays, _agg_capacity,
                       _finalize, _stage1)

__all__ = ["try_streaming"]

_STREAM_KEY = "__stream__"

# join kinds safe to evaluate independently per probe-side chunk: every
# output row is decided by the probe row alone (right/full joins would need
# cross-chunk matched-build-row tracking)
_STREAMABLE_JOIN_KINDS = ("inner", "left", "semi", "anti", "cross")


@dataclasses.dataclass
class StreamSplit:
    agg: L.AggregateNode
    upper: L.PlanNode             # plan with agg replaced by BlockSourceNode
    scan: L.ScanNode              # the big streamed scan
    big_key: Tuple[str, str]
    lower_scan_keys: List[Tuple[str, str]]   # small tables under the breaker
    upper_scan_keys: List[Tuple[str, str]]   # small tables above the breaker


def _collect_scans(node: L.PlanNode, out: List[L.ScanNode]) -> None:
    if isinstance(node, L.ScanNode):
        out.append(node)
    for c in node.children():
        _collect_scans(c, out)


def _path_to(root: L.PlanNode, target: L.PlanNode) -> Optional[List[L.PlanNode]]:
    if root is target:
        return [root]
    for c in root.children():
        p = _path_to(c, target)
        if p is not None:
            return [root] + p
    return None


def _replace_node(root: L.PlanNode, old: L.PlanNode,
                  new: L.PlanNode) -> L.PlanNode:
    """Clone the spine from root to `old`, swapping `old` for `new`."""
    if root is old:
        return new
    for f in dataclasses.fields(root):
        v = getattr(root, f.name)
        if isinstance(v, L.PlanNode):
            if _path_to(v, old) is not None:
                return dataclasses.replace(
                    root, **{f.name: _replace_node(v, old, new)})
        elif isinstance(v, list) and v and isinstance(v[0], L.PlanNode):
            for i, item in enumerate(v):
                if _path_to(item, old) is not None:
                    nv = list(v)
                    nv[i] = _replace_node(item, old, new)
                    return dataclasses.replace(root, **{f.name: nv})
    raise AssertionError("old node not under root")


def _prune_parts(split: StreamSplit, table, session):
    """Part-level minmax pruning for the streamed scan (the IO-skipping
    KeyCondition role): parts whose stats refute every row of a filter are
    never read off the host.  -> tuple of surviving part indices, or None
    (= all parts) when there is nothing to prune on."""
    from ..plan import ranges as R
    scan = split.scan
    # filters whose ONLY source is the streamed scan
    preds = []

    def walk(n):
        if isinstance(n, L.FilterNode):
            ss: List[L.ScanNode] = []
            _collect_scans(n, ss)
            if len(ss) == 1 and ss[0] is scan:
                preds.append(n.predicate)
        for c in n.children():
            walk(c)

    walk(split.agg)
    if not preds:
        return None, None
    col_of = {f.id: nm for f, nm in zip(scan.schema, scan.column_names)}
    keep = []
    pruned = 0
    for i, p in enumerate(table.parts):
        fb = {}
        for fid, nm in col_of.items():
            mm = p.minmax.get(nm)
            t = table.schema.get(nm)
            if mm is not None and t is not None                     and t.np_dtype.kind in ("i", "u"):
                fb[fid] = (int(mm[0]), int(mm[1]))
        if all(R.predicate_may_hold(pr, fb) for pr in preds):
            keep.append(i)
        else:
            pruned += 1
    if pruned:
        session.profile_events["PrunedParts"] = \
            session.profile_events.get("PrunedParts", 0) + pruned
        part_idx = tuple(keep)
    else:
        part_idx = None
        keep = list(range(len(table.parts)))
    spans = _prune_granules(preds, col_of, table, keep, session)
    return part_idx, spans


def _equality_constraints(pred, col_of):
    """Flatten a predicate's top-level conjuncts into (column_name, values)
    membership constraints usable by set/bloom granule summaries: conjuncts
    of the form col = lit and col IN (lits)."""
    from ..exprs.expr import BoundCall, BoundColumn, BoundLiteral, BoundInList
    out = []

    def conjuncts(e):
        if isinstance(e, BoundCall) and e.name == "and":
            for a in e.args:
                yield from conjuncts(a)
        else:
            yield e

    for c in conjuncts(pred):
        if isinstance(c, BoundCall) and c.name == "equals" \
                and len(c.args) == 2:
            a, b = c.args
            if isinstance(b, BoundColumn) and isinstance(a, BoundLiteral):
                a, b = b, a
            if isinstance(a, BoundColumn) and isinstance(b, BoundLiteral) \
                    and a.name in col_of:
                out.append((col_of[a.name], frozenset([b.value])))
        elif isinstance(c, BoundInList) and not c.negated \
                and isinstance(c.arg, BoundColumn) and c.arg.name in col_of:
            try:
                vals = frozenset(np.asarray(c.values).tolist())
            except TypeError:
                continue
            out.append((col_of[c.arg.name], vals))
    return out


def _granule_span(gi, g_rows, gran_base, ngr):
    """Granule gi of width g_rows -> [a, b) range in base-granule units."""
    a = gi * g_rows // gran_base
    b = min(-(-((gi + 1) * g_rows) // gran_base), ngr)
    return a, b


def _prune_granules(preds, col_of, table, part_indices, session):
    """Skip-index granule pruning within surviving parts (reference:
    MergeTreeDataSelectExecutor filters granule ranges through
    MergeTreeIndex* conditions, src/Storages/MergeTree/
    MergeTreeDataSelectExecutor.cpp).  -> spans
    ((pos_in_pruned_part_list, lo, hi), ...) or None when nothing pruned."""
    from ..plan import ranges as R
    from ..storage.table import Part, SkipIndex
    idxs = list(getattr(table, "skip_indexes", []) or [])
    # the sort key's leading column gets an implicit minmax skip index —
    # the primary-index KeyCondition analog (parts are sorted on insert)
    order_cols = [c for c in (table.order_by or []) if c in table.schema]
    for c in order_cols[:1]:
        if not any(ix.column == c and ix.kind == "minmax" for ix in idxs):
            idxs.append(SkipIndex(f"_pk_{c}", c, "minmax"))
    idxs = [ix for ix in idxs if ix.column in col_of.values()]
    if not idxs:
        return None
    name_to_fid = {nm: fid for fid, nm in col_of.items()}
    eq_constraints = []
    for pr in preds:
        eq_constraints.extend(_equality_constraints(pr, col_of))
    gran_base = max(int(getattr(table, "index_granularity", 8192)), 1)
    spans = []
    pruned_granules = 0
    any_pruned = False
    for pos, pi in enumerate(part_indices):
        p = table.parts[pi]
        n = p.num_rows
        if n == 0:
            continue
        ngr = -(-n // gran_base)
        keep = np.ones(ngr, bool)
        for ix in idxs:
            g_rows = gran_base * max(ix.granularity, 1)
            if ix.kind == "minmax":
                t = table.schema.get(ix.column)
                if t is None or t.np_dtype.kind not in ("i", "u"):
                    continue
                mm = p.granule_minmax(ix.column, g_rows)
                if mm is None:
                    continue
                fid = name_to_fid[ix.column]
                for gi, (lo_v, hi_v) in enumerate(mm):
                    fb = {fid: (int(lo_v), int(hi_v))}
                    if not all(R.predicate_may_hold(pr, fb)
                               for pr in preds):
                        a, b = _granule_span(gi, g_rows, gran_base, ngr)
                        keep[a:b] = False
            elif ix.kind == "set" and eq_constraints:
                max_vals = int(ix.params[0]) if ix.params and ix.params[0] \
                    else Part.SET_INDEX_DEFAULT_MAX
                sets = p.granule_sets(ix.column, g_rows, max_vals)
                if sets is None:
                    continue
                for gi, sset in enumerate(sets):
                    if sset is None:
                        continue
                    for nm, vals in eq_constraints:
                        if nm == ix.column and not (vals & sset):
                            a, b = _granule_span(gi, g_rows, gran_base, ngr)
                            keep[a:b] = False
                            break
            elif ix.kind == "bloom_filter" and eq_constraints:
                consts = [vals for nm, vals in eq_constraints
                          if nm == ix.column]
                if not consts:
                    continue
                blooms = p.granule_blooms(ix.column, g_rows)
                if blooms is None:
                    continue
                for gi, bits in enumerate(blooms):
                    refuted = False
                    for vals in consts:
                        posn = Part._bloom_positions(
                            sorted(vals, key=repr))
                        # a value may be present iff ALL its k bits are set;
                        # the constraint may hold iff ANY value may be there
                        if not bits[posn].all(axis=1).any():
                            refuted = True
                            break
                    if refuted:
                        a, b = _granule_span(gi, g_rows, gran_base, ngr)
                        keep[a:b] = False
        if keep.all():
            spans.append((pos, 0, n))
            continue
        any_pruned = True
        pruned_granules += int((~keep).sum())
        gi = 0
        while gi < ngr:                    # merge kept granules into spans
            if not keep[gi]:
                gi += 1
                continue
            gj = gi
            while gj + 1 < ngr and keep[gj + 1]:
                gj += 1
            spans.append((pos, gi * gran_base,
                          min((gj + 1) * gran_base, n)))
            gi = gj + 1
    if not any_pruned:
        return None
    session.profile_events["PrunedGranules"] = \
        session.profile_events.get("PrunedGranules", 0) + pruned_granules
    return tuple(spans)


def find_split(plan: L.PlanNode, big_key: Tuple[str, str]
               ) -> Optional[StreamSplit]:
    """Locate the aggregation breaker for streaming the scan of big_key."""
    scans: List[L.ScanNode] = []
    _collect_scans(plan, scans)
    big_scans = [s for s in scans
                 if (s.database, s.table) == big_key]
    if len(big_scans) != 1:
        return None
    scan = big_scans[0]
    if scan.final:
        return None                      # FINAL folds need the whole table
    path = _path_to(plan, scan)
    if path is None:
        return None
    # lowest AggregateNode above the scan
    agg = None
    agg_i = -1
    for i in range(len(path) - 1, -1, -1):
        if isinstance(path[i], L.AggregateNode):
            agg = path[i]
            agg_i = i
            break
    if agg is None or agg.with_totals:
        return None
    if any(a.fn.holistic for a in agg.aggregates):
        return None                      # needs raw rows per group (v1)
    # nodes strictly between the breaker and the scan must be streamable
    for i in range(agg_i + 1, len(path) - 1):
        node = path[i]
        if isinstance(node, (L.FilterNode, L.ProjectNode)):
            continue
        if isinstance(node, L.JoinNode):
            # the big table must be the probe (left) side; the build side
            # is an ordinary small block argument of the per-chunk program
            if node.left is not path[i + 1] \
                    or node.kind not in _STREAMABLE_JOIN_KINDS:
                return None
            continue
        return None
    lower_scans: List[L.ScanNode] = []
    _collect_scans(agg.child, lower_scans)
    lower_keys = [(s.database, s.table) for s in lower_scans
                  if s is not scan]
    upper = _replace_node(plan, agg,
                          L.BlockSourceNode(agg.schema, _STREAM_KEY))
    upper_scans: List[L.ScanNode] = []
    _collect_scans(upper, upper_scans)
    upper_keys = [(s.database, s.table) for s in upper_scans]
    return StreamSplit(agg, upper, scan, big_key, lower_keys, upper_keys)


# -- per-chunk program construction -------------------------------------------

def _chunk_block(chunk_args, src, table) -> Block:
    cols: Dict[str, Column] = {}
    for name in src.columns:
        t = table.schema[name]
        e = chunk_args["cols"][name]
        validity = e.get("validity")
        ctype = dt.make_nullable(t) if (validity is not None
                                        and not t.nullable) else t
        cols[name] = Column(ctype, e["data"], validity,
                            src.dictionaries.get(name))
    return Block(cols, chunk_args["num_rows"])


def _rebuild_blocks(meta_blocks, args) -> Dict[Tuple[str, str], Block]:
    out = {}
    for k, blk in meta_blocks.items():
        akey = f"{k[0]}.{k[1]}"
        cols = {}
        for name, col in blk.columns.items():
            e = args[akey]["cols"][name]
            cols[name] = Column(col.dtype, e["data"], e.get("validity"),
                                col.dictionary, lengths=e.get("lengths"))
        out[k] = Block(cols, args[akey]["num_rows"])
    return out


def _stage1_on_chunk(split: StreamSplit, settings: Settings, src, table,
                     small_meta, chunk_args, small_args, struct: dict):
    """Trace the lower plan on one chunk -> grouped partial states."""
    agg = split.agg
    blocks = _rebuild_blocks(small_meta, small_args)
    blocks[split.big_key] = _chunk_block(chunk_args, src, table)
    ctx = ExecContext(blocks, settings)
    child = execute_plan(agg.child, ctx)
    key_cvs, key_arrays, dims, global_agg = _agg_key_arrays(agg, child, ctx)
    if not all(a.fn.sum_only for a in agg.aggregates):
        dims = None
    cap_g = _agg_capacity(child, dims, global_agg, settings)
    grouping, counts, states_per_agg = _stage1(
        agg, child, key_arrays, dims, cap_g, ctx, global_agg)

    flat: List[jax.Array] = [counts]
    arity: List[int] = [1]
    for item, _, states in states_per_agg:
        flat.extend(states)
        arity.append(len(states))

    # trace-time structure shared by init/step/fin (identical every chunk:
    # dictionaries are global, bounds are table-wide)
    struct["arity"] = arity
    struct["items"] = [item for item, _, _ in states_per_agg]
    struct["key_meta"] = [(cv.broadcast(child.capacity).validity is not None,
                           cv.dictionary) for cv in key_cvs]
    struct["agg_dicts"] = [
        (arg_cvs[0].dictionary if item.args else None)
        for item, arg_cvs, _ in states_per_agg]
    struct["global_agg"] = global_agg
    struct["cap_g"] = cap_g
    struct["lower_checks"] = [(c.limit, c.message, c.setting)
                              for c in ctx.checks]
    lower_check_vals = [jnp.asarray(c.value, jnp.int64) for c in ctx.checks]
    chunk_groups = jnp.asarray(grouping.num_groups, jnp.int64)
    return (grouping.unique_keys, grouping.group_valid(), flat,
            lower_check_vals, chunk_groups)


def _merge_carry(carry, keys_u, gvalid, flat, items, arity, cap_c):
    """carry ++ chunk partial states -> re-grouped, merged carry."""
    keys_cat = [jnp.concatenate([ck, uk.astype(ck.dtype)])
                for ck, uk in zip(carry["keys"], keys_u)]
    valid_cat = jnp.concatenate([carry["valid"], gvalid])
    states_cat = [jnp.concatenate([cs, s.astype(cs.dtype)])
                  for cs, s in zip(carry["states"], flat)]
    g2 = agg_ops.group_by_sort(keys_cat, valid_cat, cap_c)
    merged = [g2.reduce("sum", states_cat[0], valid_cat)]
    i = 1
    for item, n in zip(items, arity[1:]):
        merged.extend(item.fn.merge(states_cat[i:i + n], g2, valid_cat))
        i += n
    return {"keys": [uk for uk in g2.unique_keys],
            "valid": g2.group_valid(),
            "states": merged,
            "num_groups": jnp.asarray(g2.num_groups, jnp.int64)}


def _widen_carry(keys_u, gvalid, flat, cap_g, cap_c):
    """Pad stage-1 outputs (cap_g) up to the carry capacity (cap_c)."""
    if cap_c == cap_g:
        return list(keys_u), gvalid, list(flat)
    pad = cap_c - cap_g
    keys = [jnp.concatenate([k, jnp.zeros((pad,), k.dtype)])
            for k in keys_u]
    valid = jnp.concatenate([gvalid, jnp.zeros((pad,), jnp.bool_)])
    states = [jnp.concatenate([s, jnp.zeros((pad,), s.dtype)])
              for s in flat]
    return keys, valid, states


class StreamProgram:
    """Compiled init/step/fin triple for one (plan, settings, layout)."""

    def __init__(self, session, split: StreamSplit, settings: Settings,
                 src, table, cap_c: int):
        self.split = split
        self.settings = settings
        self.src = src
        self.cap_c = cap_c
        self.struct: Dict[str, Any] = {}
        catalog = session.catalog
        self.small_lower = {k: catalog.get_table(*k).read_block()
                            for k in split.lower_scan_keys}
        self.small_upper = {k: catalog.get_table(*k).read_block()
                            for k in split.upper_scan_keys}
        struct = self.struct
        split_ = split

        def init_fn(chunk_args, small_args):
            keys_u, gvalid, flat, lchecks, groups = _stage1_on_chunk(
                split_, settings, src, table, self.small_lower,
                chunk_args, small_args, struct)
            keys, valid, states = _widen_carry(keys_u, gvalid, flat,
                                               struct["cap_g"], cap_c)
            return {"keys": keys, "valid": valid, "states": states,
                    "num_groups": jnp.asarray(groups, jnp.int64),
                    "chunk_groups": groups,
                    "lower_checks": lchecks}

        def step_fn(carry, chunk_args, small_args):
            keys_u, gvalid, flat, lchecks, groups = _stage1_on_chunk(
                split_, settings, src, table, self.small_lower,
                chunk_args, small_args, struct)
            merged = _merge_carry(carry, keys_u, gvalid, flat,
                                  struct["items"], struct["arity"], cap_c)
            merged["chunk_groups"] = jnp.maximum(carry["chunk_groups"],
                                                 groups)
            merged["lower_checks"] = [jnp.maximum(a, b) for a, b in
                                      zip(carry["lower_checks"], lchecks)]
            return merged

        def fin_fn(carry, small_args):
            agg = split_.agg
            ctx = ExecContext(_rebuild_blocks(self.small_upper, small_args),
                              settings)
            fake_keys = []
            for (f, _), (has_v, dic) in zip(agg.keys, struct["key_meta"]):
                fake_keys.append(ColVal(
                    f.dtype, jnp.zeros((1,), jnp.int32),
                    jnp.ones((1,), jnp.uint8) if has_v else None, dic))
            states_per_agg = []
            i = 1
            for item, dic, n in zip(struct["items"], struct["agg_dicts"],
                                    struct["arity"][1:]):
                fake_args = [ColVal(item.field.dtype,
                                    jnp.zeros((1,), jnp.int32), None, dic)] \
                    if item.args else []
                states_per_agg.append(
                    (item, fake_args, carry["states"][i:i + n]))
                i += n
            merged_eb = _finalize(
                agg, fake_keys, carry["keys"], carry["num_groups"],
                carry["states"][0], states_per_agg, cap_c,
                struct["global_agg"], False, ctx,
                group_valid=None if struct["global_agg"]
                else carry["valid"])
            ctx.injected[_STREAM_KEY] = merged_eb
            out = execute_plan(split_.upper, ctx)
            data_leaves, validity_leaves, dicts, length_leaves = {}, {}, {}, {}
            for f in split_.upper.schema:
                cv = out.cols[f.id].broadcast(out.capacity)
                data_leaves[f.id] = cv.data
                if cv.validity is not None:
                    validity_leaves[f.id] = cv.validity
                if cv.lengths is not None:
                    length_leaves[f.id] = cv.lengths
                dicts[f.id] = cv.dictionary
            struct["out_dicts"] = dicts
            struct["capacity"] = out.capacity
            struct["fin_checks"] = [(c.limit, c.message, c.setting)
                                    for c in ctx.checks]
            return {"valid": out.valid, "data": data_leaves,
                    "validity": validity_leaves, "lengths": length_leaves,
                    "checks": [c.value for c in ctx.checks],
                    "carry_checks": ([carry["chunk_groups"],
                                      carry["num_groups"]]
                                     + carry["lower_checks"])}

        self.init_fn = jax.jit(init_fn)
        self.step_fn = jax.jit(step_fn, donate_argnums=(0,))
        self.fin_fn = jax.jit(fin_fn)

    def small_args(self, blocks) -> Dict[str, Any]:
        from .session import Session
        return Session._block_args(blocks)

    def run(self, session) -> Tuple[Dict[str, np.ndarray], ExecContext]:
        src = self.src
        lower_args = self.small_args(self.small_lower)
        upper_args = self.small_args(self.small_upper)

        def to_device(data, n):
            cols = {}
            for name, (d, v) in data.items():
                e = {"data": jax.device_put(d)}
                if v is not None:
                    e["validity"] = jax.device_put(v)
                cols[name] = e
            return {"cols": cols, "num_rows": jnp.asarray(n, jnp.int64)}

        n_readers = max(int(self.settings.max_parallel_replicas), 1)
        if n_readers > 1 and src.num_chunks > 1:
            # work-stealing read pool: host chunk prep overlaps device
            # compute (MergeTreeReadPool / parallel-replicas coordinator
            # analog, storage/read_pool.py); index order is preserved so
            # the float merge tree stays deterministic
            from ..storage.read_pool import ParallelChunkReader
            reader = ParallelChunkReader(src, n_readers,
                                         max_buffered=n_readers + 2)
            carry = None
            for i, data, n in reader.iter_ordered():
                args = to_device(data, n)
                carry = self.init_fn(args, lower_args) if carry is None \
                    else self.step_fn(carry, args, lower_args)
        else:
            carry = self.init_fn(to_device(*src.chunk(0)), lower_args)
            for i in range(1, src.num_chunks):
                carry = self.step_fn(carry, to_device(*src.chunk(i)),
                                     lower_args)
        leaves = self.fin_fn(carry, upper_args)

        struct = self.struct
        settings = self.settings
        ctx = ExecContext({}, settings)
        # carry checks: [chunk-level groups vs cap_g, merged groups vs cap_c,
        #                *lower-plan checks (max over chunks)]
        cvals = leaves["carry_checks"]
        ctx.checks.append(Check(
            cvals[0], struct["cap_g"],
            "per-chunk GROUP BY cardinality exceeded max_groups; raise the "
            "max_groups setting", setting="max_groups"))
        if not struct["global_agg"]:
            ctx.checks.append(Check(
                cvals[1], self.cap_c,
                "GROUP BY cardinality exceeded max_groups; raise the "
                "max_groups setting", setting="max_groups"))
        for val, (limit, msg, setting) in zip(cvals[2:],
                                              struct["lower_checks"]):
            ctx.checks.append(Check(val, limit, msg, setting))
        for val, (limit, msg, setting) in zip(leaves["checks"],
                                              struct["fin_checks"]):
            ctx.checks.append(Check(val, limit, msg, setting))
        cols = {}
        for f in self.split.upper.schema:
            cols[f.id] = ColVal(f.dtype, leaves["data"][f.id],
                                leaves["validity"].get(f.id),
                                struct["out_dicts"][f.id],
                                lengths=leaves["lengths"].get(f.id))
        out = ExecBlock(cols, leaves["valid"], struct["capacity"])
        cols_np = materialize(out, self.split.upper.schema, ctx)
        ctx.profile["rows_scanned"] = src.total_rows
        return cols_np, ctx


# -- entry point ---------------------------------------------------------------

def _stream_threshold(settings: Settings) -> int:
    thr = settings.max_device_block_bytes
    ext = settings.max_bytes_before_external_group_by
    if ext > 0:
        thr = min(thr, ext) if thr > 0 else ext
    return thr if thr > 0 else (2 << 30)


def _chunk_rows_for(table, columns, settings: Settings) -> int:
    if settings.stream_chunk_rows > 0:
        return pad_to(settings.stream_chunk_rows)
    n = max(table.num_rows, 1)
    row_bytes = max(table.physical_bytes(columns) // n, 1)
    return pad_to(min(settings.stream_chunk_bytes // row_bytes, n))


def try_streaming(session, stmt, settings: Settings, sql: str):
    """Streaming SELECT entry: None when the plan isn't streamable."""
    from ..storage.table import NotStreamable

    thr = _stream_threshold(settings)
    catalog = session.catalog
    # cheap gate: nothing in the catalog is over the threshold
    over = False
    for db in catalog.databases.values():
        for t in db.tables.values():
            if t.num_rows and t.physical_bytes() > thr:
                over = True
                break
        if over:
            break
    if not over:
        return None

    import json
    skey = json.dumps(settings.as_dict(), sort_keys=True, default=str) \
        + "@" + catalog.current_database
    cache = getattr(session, "_stream_cache", None)
    if cache is None:
        cache = session._stream_cache = {}
    hit = cache.get((sql, skey)) if sql else None
    if hit is not None:
        prog, sig0 = hit
        sig = tuple(sorted(
            (db, tbl, catalog.get_table(db, tbl).version)
            for (db, tbl) in ([prog.split.big_key]
                              + prog.split.lower_scan_keys
                              + prog.split.upper_scan_keys)))
        if sig == sig0:
            cols, ctx = prog.run(session)
            return prog.split.upper, cols, ctx

    plan = session._plan(stmt, settings)
    scans: List[L.ScanNode] = []
    _collect_scans(plan, scans)
    # stream the largest over-threshold table; the others stay whole device
    # blocks (both-sides-huge joins need grace partitioning — future work)
    big = None
    big_bytes = 0
    for s in scans:
        try:
            t = catalog.get_table(s.database, s.table)
        except Exception:
            continue
        b = t.physical_bytes(set(s.column_names)) if t.num_rows else 0
        if b > thr and b > big_bytes:
            big = (s.database, s.table)
            big_bytes = b
    if big is None:
        return None
    split = find_split(plan, big)
    if split is None:
        return None
    table = catalog.get_table(*big)
    columns = list(split.scan.column_names)
    part_idx, spans = _prune_parts(split, table, session)
    try:
        chunk_rows = _chunk_rows_for(table, columns, settings)
        src = table.chunk_source(columns, chunk_rows, part_idx=part_idx,
                                 spans=spans)
    except NotStreamable:
        return None
    cap_c = pad_to(min(table.num_rows, settings.max_groups))
    prog = StreamProgram(session, split, settings, src, table, cap_c)
    cols, ctx = prog.run(session)
    if sql:
        sig = tuple(sorted(
            (db, tbl, catalog.get_table(db, tbl).version)
            for (db, tbl) in ([big] + split.lower_scan_keys
                              + split.upper_scan_keys)))
        if len(cache) > 64:
            cache.clear()
        cache[(sql, skey)] = (prog, sig)
    return split.upper, cols, ctx
