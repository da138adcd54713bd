"""Multi-host distributed execution over a JAX device mesh.

The replacement for the reference's distributed stack (StorageDistributed +
ClusterProxy + RemoteQueryExecutor, SURVEY.md §2.6/§2.7): tables are
hash-partitioned across the mesh axis, and the *same* plan executor runs
inside `shard_map` on every shard — collective-aware operators (two-stage
aggregation via all_to_all, broadcast/shuffle joins, distributed top-k)
insert ICI collectives exactly where the reference ships blocks over TCP.

Design notes:
  * one mesh axis ("shards") = the host/data-parallel axis; within-chip
    parallelism belongs to XLA;
  * per-shard row counts differ, so sharded tables carry an explicit
    __row_valid column instead of a scalar row count;
  * the whole distributed query compiles to ONE XLA program (shard_map under
    jit) — plan dispatch is the only host round-trip, like the reference's
    single scatter/gather exchange per query.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import dtypes as dt
from ..core.block import Block
from ..core.column import Column, Dictionary, pad_to
from ..core.settings import Settings
from ..exec.executor import (Check, ExecBlock, ExecContext, _gather_block,
                             execute_plan, materialize)
from ..exec.session import Session
from ..exprs.expr import ColVal
from ..ops import hash_ops
from ..storage.table import Table

try:                                   # JAX >= 0.6 exposes it at top level
    from jax import shard_map as _shard_map_fn

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_fn(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
except ImportError:                    # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_fn

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_fn(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False)

__all__ = ["DistributedSession", "make_mesh"]

AXIS = "shards"


def make_mesh(n_devices: Optional[int] = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _splitmix64_np(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


class DistributedSession(Session):
    """Session whose Distributed-engine tables are sharded over a mesh."""

    _streaming_enabled = False     # sharding, not chunking, scales this path

    def __init__(self, mesh: Optional[Mesh] = None,
                 settings: Optional[Settings] = None, **kw):
        super().__init__(settings=settings, **kw)
        self.mesh = mesh or make_mesh()
        self.axis = self.mesh.axis_names[0]
        self.n_shards = self.mesh.shape[self.axis]
        self._sharded_cache: Dict[Tuple[str, str, int], Block] = {}

    # -- which tables are distributed ---------------------------------------
    def _is_distributed(self, db: str, name: str) -> bool:
        try:
            t = self.catalog.get_table(db, name)
        except Exception:
            return False
        return t.engine.lower() == "distributed" \
            or getattr(t, "distributed", False)

    def _sharded_block(self, db: str, name: str) -> Block:
        t = self.catalog.get_table(db, name)
        key = (db, name, t.version)
        blk = self._sharded_cache.get(key)
        if blk is None:
            cols_np, valid_np, per_cap = self._layout_incremental(db, name, t)
            spec = NamedSharding(self.mesh, P(self.axis))
            cols: Dict[str, Column] = {}
            from ..core.column import column_from_numpy
            cap = self.n_shards * per_cap
            for cname, vals in cols_np.items():
                col = column_from_numpy(vals, t.schema[cname], capacity=cap)
                col.data = jax.device_put(col.data, spec)
                if col.validity is not None:
                    col.validity = jax.device_put(col.validity, spec)
                cols[cname] = col
            vcol = Column(dt.UInt8, jax.device_put(jnp.asarray(valid_np), spec))
            cols["__row_valid"] = vcol
            blk = Block(cols, int(valid_np.sum()))
            self._sharded_cache = {key: blk}   # keep one layout alive
        return blk

    # -- incremental sharding (DistributedSink analog) -----------------------
    # Appends shard only the NEW parts' rows (hash + bucket once per row
    # ever) instead of re-laying-out the whole table per insert
    # (reference: src/Storages/Distributed/DistributedSink.cpp routes each
    # insert block to per-shard queues).

    def _layout_incremental(self, db: str, name: str, t: Table):
        states = getattr(self, "_layout_states", None)
        if states is None:
            states = self._layout_states = {}
        st = states.get((db, name))
        part_ids = [id(p) for p in t.parts]
        if st is not None and len(part_ids) >= len(st["part_ids"]) \
                and part_ids[:len(st["part_ids"])] == st["part_ids"]:
            new_parts = t.parts[len(st["part_ids"]):]
        else:
            st = {"part_ids": [], "chunks": [
                {n: [] for n in t.schema} for _ in range(self.n_shards)],
                "rr": 0}
            new_parts = t.parts
        if new_parts:
            self._shard_parts_into(st, new_parts, t)
        st["part_ids"] = part_ids
        states[(db, name)] = st
        return self._assemble_layout(st, t)

    def _shard_parts_into(self, st, parts, t: Table) -> None:
        shard_key = next((c for c in t.order_by if c in t.schema), None)
        for p in parts:
            n = p.num_rows
            if not n:
                continue
            if shard_key is not None:
                kv = np.asarray(p.columns[shard_key])
                if kv.dtype == object:
                    assign = np.asarray(
                        [hash(str(x)) for x in kv]) % self.n_shards
                else:
                    assign = _splitmix64_np(
                        kv.astype(np.uint64)) % self.n_shards
                assign = assign.astype(np.int64)
            else:
                assign = (np.arange(n, dtype=np.int64)
                          + st["rr"]) % self.n_shards
                st["rr"] += n
            order = np.argsort(assign, kind="stable")
            counts = np.bincount(assign, minlength=self.n_shards)
            off = 0
            for s in range(self.n_shards):
                c = int(counts[s])
                if not c:
                    continue
                sel = order[off:off + c]
                off += c
                for cname in t.schema:
                    st["chunks"][s][cname].append(
                        np.asarray(p.columns[cname])[sel])

    def _assemble_layout(self, st, t: Table):
        counts = [sum(len(ch) for ch in st["chunks"][s][next(iter(t.schema))])
                  if t.schema else 0 for s in range(self.n_shards)]
        per_cap = pad_to(max(counts) if any(counts) else 1)
        total_cap = self.n_shards * per_cap
        valid = np.zeros(total_cap, np.uint8)
        for s, c in enumerate(counts):
            valid[s * per_cap:s * per_cap + c] = 1
        out = {}
        for cname, ctype in t.schema.items():
            if ctype.is_dictionary:
                g = np.empty(total_cap, object)
                g[:] = ""
            else:
                g = np.zeros(total_cap, ctype.np_dtype)
            for s in range(self.n_shards):
                chunks = st["chunks"][s][cname]
                if chunks:
                    merged = np.concatenate(
                        [np.asarray(ch, object if ctype.is_dictionary
                                    else None) for ch in chunks]) \
                        if len(chunks) > 1 else np.asarray(chunks[0])
                    g[s * per_cap:s * per_cap + len(merged)] = merged
            out[cname] = g
        return out, valid, per_cap

    # -- execution override --------------------------------------------------
    def _collect_table_blocks(self, plan, out=None):
        from ..plan import logical as L
        if out is None:
            out = {}
        if isinstance(plan, L.ScanNode):
            key = (plan.database, plan.table)
            if key not in out:
                if self._is_distributed(*key):
                    out[key] = self._sharded_block(*key)
                else:
                    out[key] = self.catalog.get_table(*key).read_block()
        for c in plan.children():
            self._collect_table_blocks(c, out)
        return out

    def _execute(self, plan, settings: Settings):
        blocks = self._collect_table_blocks(plan)
        sharded_keys = {k for k in blocks if self._is_distributed(*k)}
        if not sharded_keys:
            return super()._execute(plan, settings)
        return self._execute_sharded(plan, blocks, sharded_keys, settings)

    def _execute_compiled(self, stmt, settings: Settings, sql: str):
        # Distributed plans always go through the shard_map runner (itself
        # jitted); reuse the uncompiled dispatch to decide.
        plan = self._plan(stmt, settings)
        cols, ctx = self._execute(plan, settings)
        return plan, cols, ctx

    # -- partition-parallel aggregation (shuffle elision) ---------------------
    def _shard_key_column(self, db: str, name: str) -> Optional[str]:
        """The column whose hash assigns rows to shards (see
        _shard_parts_into); None for round-robin layouts."""
        try:
            t = self.catalog.get_table(db, name)
        except Exception:
            return None
        return next((c for c in t.order_by if c in t.schema), None)

    def _colocated_fids(self, plan) -> frozenset:
        """Field ids provably hash-partition-aligned with the shard layout:
        rows with equal values of these fields live on one shard, so a
        GROUP BY containing one of them needs no exchange (reference:
        src/Processors/QueryPlan/Optimizations/useDataParallelAggregation.cpp,
        optimize_distributed_group_by_sharding_key)."""
        from ..plan import logical as L
        from ..exprs.expr import BoundColumn

        def walk(n) -> frozenset:
            if isinstance(n, L.ScanNode):
                if not self._is_distributed(n.database, n.table):
                    return frozenset()
                key_col = self._shard_key_column(n.database, n.table)
                if key_col is None:
                    return frozenset()
                return frozenset(
                    f.id for f, nm in zip(n.schema, n.column_names)
                    if nm == key_col)
            if isinstance(n, L.FilterNode):
                return walk(n.child)         # filters keep rows in place
            if isinstance(n, L.ProjectNode):
                s = walk(n.child)
                return frozenset(
                    f.id for f, e in zip(n.schema, n.exprs)
                    if isinstance(e, BoundColumn) and e.name in s)
            return frozenset()               # joins/limits/etc. may move rows

        # alignment is a property of each aggregate's own subtree; collect
        # per-AggregateNode so nested aggregations resolve independently
        out = {}

        def visit(n):
            if isinstance(n, L.AggregateNode):
                out[id(n)] = walk(n.child)
            for c in n.children():
                visit(c)

        visit(plan)
        return out

    def _execute_sharded(self, plan, blocks, sharded_keys, settings):
        axis, n = self.axis, self.n_shards
        meta = dict(blocks)
        struct: Dict[str, Any] = {}
        colocated = self._colocated_fids(plan)

        arg_specs = {}
        args = {}
        for k, blk in meta.items():
            akey = f"{k[0]}.{k[1]}"
            spec = P(axis) if k in sharded_keys else P()
            cols, specs = {}, {}
            for cname, col in blk.columns.items():
                e = {"data": col.data}
                es = {"data": spec}
                if col.validity is not None:
                    e["validity"] = col.validity
                    es["validity"] = spec
                if col.lengths is not None:
                    e["lengths"] = col.lengths
                    es["lengths"] = spec
                cols[cname] = e
                specs[cname] = es
            args[akey] = cols
            arg_specs[akey] = specs

        def fn(a):
            blocks2 = {}
            for k, blk in meta.items():
                akey = f"{k[0]}.{k[1]}"
                cols = {}
                for cname, col in blk.columns.items():
                    e = a[akey][cname]
                    cols[cname] = Column(col.dtype, e["data"],
                                         e.get("validity"), col.dictionary,
                                         lengths=e.get("lengths"))
                local_cap = next(iter(cols.values())).capacity
                blocks2[k] = Block(cols, local_cap)
            ctx = ExecContext(blocks2, settings, axis_name=axis, n_shards=n,
                              sharded_tables=sharded_keys)
            ctx.colocated_agg = colocated
            out = execute_plan(plan, ctx)
            out = _gather_block(out, ctx)
            data_leaves, validity_leaves, dicts = {}, {}, {}
            length_leaves = {}
            for f in plan.schema:
                cv = out.cols[f.id].broadcast(out.capacity)
                data_leaves[f.id] = cv.data
                if cv.validity is not None:
                    validity_leaves[f.id] = cv.validity
                if cv.lengths is not None:
                    length_leaves[f.id] = cv.lengths
                dicts[f.id] = cv.dictionary
            struct["dicts"] = dicts
            struct["checks"] = [(c.limit, c.message, c.setting)
                                for c in ctx.checks]
            struct["capacity"] = out.capacity
            struct["profile"] = dict(ctx.profile)
            checks = [jax.lax.pmax(jnp.asarray(c.value), axis)
                      for c in ctx.checks]
            return {"valid": out.valid, "data": data_leaves,
                    "validity": validity_leaves, "lengths": length_leaves,
                    "checks": checks}

        from ..core.failpoints import fail_point
        fail_point("exchange_before_all_to_all")
        mapped = shard_map(fn, mesh=self.mesh, in_specs=(arg_specs,),
                           out_specs=P())
        leaves = jax.jit(mapped)(args)

        ctx2 = ExecContext({}, settings)
        for val, (limit, msg, setting) in zip(leaves["checks"],
                                              struct["checks"]):
            ctx2.checks.append(Check(val, limit, msg, setting))
        for k, v in struct.get("profile", {}).items():
            ctx2.profile[k] = ctx2.profile.get(k, 0) + v
        cols = {}
        for f in plan.schema:
            cols[f.id] = ColVal(f.dtype, leaves["data"][f.id],
                                leaves["validity"].get(f.id),
                                struct["dicts"][f.id],
                                lengths=leaves.get("lengths", {}).get(f.id))
        out = ExecBlock(cols, leaves["valid"], struct["capacity"])
        cols_np = materialize(out, plan.schema, ctx2)
        return cols_np, ctx2
