"""Bound (typed) expressions and their evaluation over blocks.

The analog of ActionsDAG -> ExpressionActions (src/Interpreters/ActionsDAG.h:51,
ExpressionActions.cpp:747): an analyzer-produced DAG of column transforms,
lowered here into a JAX computation over the block's device arrays.  Because
evaluation happens *during jit tracing*, XLA plays the role of the reference's
optional LLVM JIT fusion (src/Interpreters/JIT/compileFunction.cpp) — every
expression chain fuses into the surrounding operator for free.

Dictionary-encoded string columns carry a host-side Dictionary; string
functions compute per-code lookup tables with numpy *at trace time* (the
dictionary is query metadata, never traced) and emit only device gathers.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import dtypes as dt
from ..core.column import Column, Dictionary
from ..core.errors import TypeError_, UnknownIdentifier

__all__ = ["ColVal", "BoundExpr", "BoundColumn", "BoundLiteral", "BoundCall",
           "evaluate", "colval_from_column", "colval_to_column"]


@dataclasses.dataclass
class ColVal:
    """A column value during evaluation: device data + metadata.

    data may be a full (capacity,) array or a scalar (constants broadcast
    lazily, the reference's ColumnConst analog).
    """
    dtype: dt.DType
    data: Any                          # jax array (scalar or (cap,))
    validity: Optional[Any] = None     # None = all valid
    dictionary: Optional[Dictionary] = None

    @property
    def is_const(self) -> bool:
        return getattr(self.data, "ndim", 0) == 0

    def broadcast(self, capacity: int) -> "ColVal":
        if not self.is_const:
            return self
        data = jnp.broadcast_to(self.data, (capacity,))
        v = self.validity
        if v is not None and getattr(v, "ndim", 0) == 0:
            v = jnp.broadcast_to(v, (capacity,))
        return ColVal(self.dtype, data, v, self.dictionary)


def colval_from_column(col: Column) -> ColVal:
    return ColVal(col.dtype, col.data, col.validity, col.dictionary)


def colval_to_column(cv: ColVal, capacity: int) -> Column:
    cv = cv.broadcast(capacity)
    validity = cv.validity
    if cv.dtype.nullable and validity is None:
        validity = jnp.ones((capacity,), jnp.uint8)
    if validity is not None and validity.dtype != jnp.uint8:
        validity = validity.astype(jnp.uint8)
    return Column(cv.dtype, cv.data, validity, cv.dictionary)


# -- bound expression nodes --------------------------------------------------

class BoundExpr:
    """Base: every node knows its result dtype after analysis."""
    dtype: dt.DType

    def children(self) -> Sequence["BoundExpr"]:
        return ()


@dataclasses.dataclass
class BoundColumn(BoundExpr):
    name: str
    dtype: dt.DType


@dataclasses.dataclass
class BoundLiteral(BoundExpr):
    value: Any
    dtype: dt.DType


@dataclasses.dataclass
class BoundCall(BoundExpr):
    name: str                      # resolved function name
    args: List[BoundExpr]
    dtype: dt.DType

    def children(self):
        return self.args


def evaluate(expr: BoundExpr, env: Dict[str, ColVal]) -> ColVal:
    """Evaluate a bound expression against a block environment.

    env maps column name -> ColVal.  Runs under jit tracing; host-side numpy
    work on dictionaries executes at trace time.
    """
    if isinstance(expr, BoundColumn):
        if expr.name not in env:
            raise UnknownIdentifier(f"Column '{expr.name}' not in block "
                                    f"(have: {list(env)})")
        return env[expr.name]
    if isinstance(expr, BoundLiteral):
        return _literal_colval(expr)
    if isinstance(expr, BoundCall):
        from . import functions
        fn = functions.get(expr.name)
        args = [evaluate(a, env) for a in expr.args]
        return fn.execute(args, expr.dtype)
    raise TypeError_(f"Cannot evaluate expression node {expr!r}")


def _literal_colval(expr: BoundLiteral) -> ColVal:
    v = expr.value
    t = expr.dtype
    if v is None:
        return ColVal(t, jnp.zeros((), t.jnp_dtype), jnp.zeros((), jnp.uint8))
    if t.is_dictionary:
        d = Dictionary(np.asarray([v], dtype=object))
        return ColVal(t, jnp.zeros((), jnp.int32), None, d)
    return ColVal(t, jnp.asarray(v, t.jnp_dtype))
