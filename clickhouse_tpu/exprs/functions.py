"""Scalar function registry — whole-column execution.

The analog of the reference's FunctionFactory + IFunction::executeImpl
(src/Functions/IFunction.h:426, 1263 registered functions).  Every function
executes over entire padded columns as jnp expressions; XLA fuses chains of
them into surrounding operators (replacing the reference's hand-rolled SIMD
loops and optional LLVM JIT).

String semantics run on the host-side dictionary at trace time (per-code
lookup tables), emitting only device gathers — the dictionary-function
strategy the reference applies to LowCardinality columns
(src/Functions/IFunction.h executeOnLowCardinality path), made universal.
"""
from __future__ import annotations

import fnmatch
import math
import re
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import dtypes as dt
from ..core.column import Dictionary
from ..core.errors import NotImplementedError_, TypeError_, UnknownFunction
from .expr import ColVal

__all__ = ["get", "exists", "register", "ScalarFunction", "FUNCTIONS",
           "canonical_name"]

FUNCTIONS: Dict[str, "ScalarFunction"] = {}
_CASE_INSENSITIVE: Dict[str, str] = {}


class ScalarFunction:
    def __init__(self, name: str, resolve: Callable, execute: Callable,
                 case_insensitive: bool = False):
        self.name = name
        self._resolve = resolve
        self._execute = execute
        self.case_insensitive = case_insensitive
        # set for functions whose semantics depend on which block rows are
        # real (throwIf): evaluate() passes the block mask when available
        self.wants_row_mask = False

    def resolve(self, arg_types: List[dt.DType]) -> dt.DType:
        return self._resolve(arg_types)

    def execute(self, args: List[ColVal], out_dtype: dt.DType,
                row_mask=None) -> ColVal:
        if self.wants_row_mask:
            return self._execute(args, out_dtype, row_mask)
        return self._execute(args, out_dtype)


def register(name: str, resolve, execute, case_insensitive=False):
    fn = ScalarFunction(name, resolve, execute, case_insensitive)
    FUNCTIONS[name] = fn
    if case_insensitive:
        _CASE_INSENSITIVE[name.lower()] = name
    return fn


def canonical_name(name: str) -> str:
    if name in FUNCTIONS:
        return name
    lower = name.lower()
    if lower in _CASE_INSENSITIVE:
        return _CASE_INSENSITIVE[lower]
    raise UnknownFunction(f"Unknown function '{name}'")


def get(name: str) -> ScalarFunction:
    return FUNCTIONS[canonical_name(name)]


def exists(name: str) -> bool:
    try:
        canonical_name(name)
        return True
    except UnknownFunction:
        return False


# -- helpers -----------------------------------------------------------------

def _and_validity(args: Sequence[ColVal]):
    v = None
    for a in args:
        if a.validity is not None:
            av = a.validity.astype(jnp.bool_)
            v = av if v is None else (v & av)
    return v


def _numeric_data(a: ColVal):
    if a.dtype.is_dictionary:
        raise TypeError_("Expected a numeric argument, got String")
    return a.data


def _signed(t: dt.DType) -> dt.DType:
    if t.np_dtype.kind == "u":
        mapping = {1: dt.Int16, 2: dt.Int32, 4: dt.Int64, 8: dt.Int64}
        return mapping[t.itemsize].with_nullable(t.nullable)
    return t


def _check_numeric(ts, name):
    for t in ts:
        if t.is_dictionary:
            raise TypeError_(f"Function '{name}' expects numeric arguments")


def _resolve_arith(promote=None):
    def r(ts):
        _check_numeric(ts, "arithmetic")
        out = ts[0]
        for t in ts[1:]:
            out = dt.common_supertype(out, t)
        if promote:
            out = promote(out)
        return out
    return r


def _resolve_fixed(out_type):
    def r(ts):
        return out_type.with_nullable(any(t.nullable for t in ts))
    return r


def _resolve_float(ts):
    _check_numeric(ts, "math")
    return dt.Float64.with_nullable(any(t.nullable for t in ts))


def _binary_numeric(op, promote=None, int_only=False):
    def ex(args, out_dtype):
        a, b = args
        st = dt.remove_nullable(out_dtype)
        target = st.jnp_dtype
        x = _numeric_data(a)
        y = _numeric_data(b)
        if promote is None and not int_only:
            x = x.astype(target)
            y = y.astype(target)
        data = op(x, y)
        if data.dtype != target:
            data = data.astype(target)
        return ColVal(out_dtype, data, _and_validity(args))
    return ex


def _unary_numeric(op):
    def ex(args, out_dtype):
        a = args[0]
        st = dt.remove_nullable(out_dtype)
        data = op(_numeric_data(a))
        if data.dtype != st.jnp_dtype:
            data = data.astype(st.jnp_dtype)
        return ColVal(out_dtype, data, _and_validity(args))
    return ex


# -- arithmetic --------------------------------------------------------------

def _resolve_plusminus(ts):
    a, b = ts
    a0, b0 = dt.remove_nullable(a), dt.remove_nullable(b)
    nullable = a.nullable or b.nullable
    # date/time ± interval keeps the date/time type (DataTypeInterval rules)
    for x, y in ((a0, b0), (b0, a0)):
        if dt.is_datetime_like(x) and (dt.is_interval(y) or dt.is_integer(y)):
            return x.with_nullable(nullable)
    if dt.is_datetime_like(a0) and dt.is_datetime_like(b0):
        return dt.Int32.with_nullable(nullable)      # date difference (ref:
        # DateTime - DateTime = Int32, src/Functions/FunctionBinaryArithmetic.h)
    return None


def _datetime_arith(sign):
    def ex(args, out_dtype):
        a, b = args
        date_cv, iv_cv = (a, b) if dt.is_datetime_like(
            dt.remove_nullable(a.dtype)) else (b, a)
        d0 = dt.remove_nullable(date_cv.dtype)
        unit = iv_cv.dtype.name[len("Interval"):] \
            if dt.is_interval(iv_cv.dtype) else ("Day" if d0.name == "Date"
                                                 else "Second")
        n = (iv_cv.data.astype(jnp.int64) * sign)
        base = date_cv.data.astype(jnp.int64)
        if unit in ("Month", "Quarter", "Year"):
            months = n * {"Month": 1, "Quarter": 3, "Year": 12}[unit]
            days = base if d0.name == "Date" else jnp.floor_divide(base, 86400)
            secs_in_day = jnp.zeros_like(base) if d0.name == "Date" \
                else base - days * 86400
            y, m, dd = _civil_from_days(days)
            tot = (y * 12 + (m - 1)) + months
            ny = jnp.floor_divide(tot, 12)
            nm = tot - ny * 12 + 1
            # clamp the day to the target month's length
            ml = _days_in_month(ny, nm)
            nd = jnp.minimum(dd, ml)
            out_days = _days_from_civil(ny, nm, nd)
            data = out_days if d0.name == "Date" \
                else out_days * 86400 + secs_in_day
        elif unit in ("Nanosecond", "Microsecond", "Millisecond"):
            # DateTime storage is second-granular; sub-second deltas floor
            den = {"Nanosecond": 10**9, "Microsecond": 10**6,
                   "Millisecond": 10**3}[unit]
            data = base + jnp.floor_divide(n, den)
        else:
            scale = {"Second": 1, "Minute": 60, "Hour": 3600,
                     "Day": 86400, "Week": 7 * 86400}[unit]
            if d0.name == "Date":
                # Date stays day-granular for >= Day units; smaller units
                # promote conceptually to DateTime — round-1: day units only
                day_units = {"Day": 1, "Week": 7}
                data = base + n * day_units.get(unit, 0)
            else:
                data = base + n * scale
        data = data.astype(dt.remove_nullable(out_dtype).jnp_dtype)
        return ColVal(out_dtype, data, _and_validity(args))
    return ex


def _days_in_month(y, m):
    leap = ((jnp.mod(y, 4) == 0) & (jnp.mod(y, 100) != 0)) \
        | (jnp.mod(y, 400) == 0)
    base = jnp.asarray([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
                       jnp.int64)
    d = base[jnp.clip(m - 1, 0, 11)]
    return jnp.where((m == 2) & leap, 29, d)



def _p10i(n) -> "jnp.ndarray":
    """10^n as int64, saturated at 10^18 (the Decimal64 physical cap)."""
    return jnp.int64(10 ** min(max(int(n), 0), 18))

def _dec_prep(args, out_dtype):
    """Rescale decimal operands for arithmetic with result type out_dtype.

    Decimal result: every operand becomes the result-scale int64 (decimal
    rescaled by 10^dS, integers scaled up).  Float result: decimals become
    f64 values.  Reference scale rules: src/Functions/
    FunctionBinaryArithmetic.h DecimalBinaryOperation.
    """
    out0 = dt.remove_nullable(out_dtype)
    prepped = []
    for a in args:
        a0 = dt.remove_nullable(a.dtype)
        if dt.is_decimal(out0):
            s_out = out0.decimal_scale
            if dt.is_decimal(a0):
                d = s_out - a0.decimal_scale
                data = a.data.astype(jnp.int64) * _p10i(d)
            else:
                data = a.data.astype(jnp.int64) * _p10i(s_out)
        elif dt.is_decimal(a0):
            data = (a.data.astype(jnp.float64)
                    / float(10 ** a0.decimal_scale))
        else:
            data = a.data
        prepped.append(ColVal(a.dtype, data, a.validity))
    return prepped


def _has_decimal(*ts):
    return any(dt.is_decimal(dt.remove_nullable(t)) for t in ts)


def _plus_exec(args, out_dtype):
    a, b = args
    a0 = dt.remove_nullable(a.dtype)
    b0 = dt.remove_nullable(b.dtype)
    if (dt.is_datetime_like(a0) and (dt.is_interval(b0) or dt.is_integer(b0))) \
            or (dt.is_datetime_like(b0) and (dt.is_interval(a0)
                                             or dt.is_integer(a0))):
        return _datetime_arith(1)(args, out_dtype)
    if _has_decimal(a0, b0):
        x, y = _dec_prep(args, out_dtype)
        return ColVal(out_dtype, x.data + y.data, _and_validity(args))
    return _binary_numeric(jnp.add)(args, out_dtype)


def _minus_exec(args, out_dtype):
    a, b = args
    a0 = dt.remove_nullable(a.dtype)
    b0 = dt.remove_nullable(b.dtype)
    if dt.is_datetime_like(a0) and dt.is_datetime_like(b0):
        data = a.data.astype(jnp.int64) - b.data.astype(jnp.int64)
        data = data.astype(dt.remove_nullable(out_dtype).jnp_dtype)
        return ColVal(out_dtype, data, _and_validity(args))
    if dt.is_datetime_like(a0) and (dt.is_interval(b0) or dt.is_integer(b0)):
        return _datetime_arith(-1)(args, out_dtype)
    if _has_decimal(a0, b0):
        x, y = _dec_prep(args, out_dtype)
        return ColVal(out_dtype, x.data - y.data, _and_validity(args))
    return _binary_numeric(jnp.subtract)(args, out_dtype)


_INT_BY_SIGN_SIZE = {
    (False, 1): dt.UInt8, (False, 2): dt.UInt16,
    (False, 4): dt.UInt32, (False, 8): dt.UInt64,
    (True, 1): dt.Int8, (True, 2): dt.Int16,
    (True, 4): dt.Int32, (True, 8): dt.Int64,
}


def _resolve_addsubmul(signed_force=False):
    """Integer +/-/* widen to the next size like the reference's
    NumberTraits::ResultOfAdditionMultiplication / ResultOfSubtraction
    (base/base/arithmeticOverflow.h analog): UInt8+UInt8 -> UInt16,
    Int32*Int32 -> Int64, capped at 64 bits; subtraction is always signed."""
    base = _resolve_arith(_signed if signed_force else None)

    def r(ts):
        if len(ts) == 2:
            a0, b0 = (dt.remove_nullable(t) for t in ts)
            if dt.is_integer(a0) and dt.is_integer(b0):
                signed = signed_force or a0.np_dtype.kind == "i" \
                    or b0.np_dtype.kind == "i"
                size = min(8, 2 * max(a0.itemsize, b0.itemsize))
                out = _INT_BY_SIGN_SIZE[(signed, size)]
                return out.with_nullable(any(t.nullable for t in ts))
        return base(ts)
    return r


def _resolve_arith_dates(promote=None, signed_force=False):
    base = _resolve_addsubmul(signed_force)

    def r(ts):
        special = _resolve_plusminus(ts) if len(ts) == 2 else None
        if special is not None:
            return special
        return base(ts)
    return r


def _resolve_multiply(ts):
    a0, b0 = (dt.remove_nullable(t) for t in ts)
    nullable = any(t.nullable for t in ts)
    if dt.is_decimal(a0) and dt.is_decimal(b0):
        # multiply adds scales (reference: DecimalBinaryOperation)
        return dt.Decimal(min(a0.decimal_prec + b0.decimal_prec, 76),
                          a0.decimal_scale + b0.decimal_scale) \
            .with_nullable(nullable)
    return _resolve_addsubmul()(ts)


def _multiply_exec(args, out_dtype):
    a0 = dt.remove_nullable(args[0].dtype)
    b0 = dt.remove_nullable(args[1].dtype)
    if _has_decimal(a0, b0):
        out0 = dt.remove_nullable(out_dtype)
        if dt.is_decimal(out0):
            # scaled ints multiply raw: scales add; int operands need no
            # scaling when the other operand already carries the out scale
            xs = []
            for a in args:
                t = dt.remove_nullable(a.dtype)
                xs.append(a.data.astype(jnp.int64))
            return ColVal(out_dtype, xs[0] * xs[1], _and_validity(args))
        x, y = _dec_prep(args, out_dtype)   # float result
        return _binary_numeric(jnp.multiply)([x, y], out_dtype)
    return _binary_numeric(jnp.multiply)(args, out_dtype)


register("plus", _resolve_arith_dates(), _plus_exec)
register("minus", _resolve_arith_dates(signed_force=True), _minus_exec)
register("multiply", _resolve_multiply, _multiply_exec)


def _div_exec(args, out_dtype):
    a, b = args
    out0 = dt.remove_nullable(out_dtype)
    if dt.is_decimal(out0):
        # (a/10^Sa) / (b/10^Sb) at result scale Sa:
        # raw = a * 10^Sb / b, truncated toward zero (reference semantics)
        a0 = dt.remove_nullable(a.dtype)
        b0 = dt.remove_nullable(b.dtype)
        sa = a0.decimal_scale if dt.is_decimal(a0) else 0
        sb = b0.decimal_scale if dt.is_decimal(b0) else 0
        x = a.data.astype(jnp.int64) * _p10i(sb)
        x = x * _p10i(out0.decimal_scale - sa)
        y = b.data.astype(jnp.int64)
        safe = jnp.where(y == 0, jnp.ones_like(y), y)
        q = jax.lax.div(x, safe)
        data = jnp.where(y == 0, jnp.zeros_like(q), q)
        v = _and_validity(args)
        zero = (y == 0)
        v = jnp.logical_and(v, ~zero) if v is not None else ~zero
        return ColVal(out_dtype.with_nullable(True), data, v)
    x = _numeric_data(a).astype(jnp.float64)
    y = _numeric_data(b).astype(jnp.float64)
    if dt.is_decimal(dt.remove_nullable(a.dtype)):
        x = x / float(10 ** dt.remove_nullable(a.dtype).decimal_scale)
    if dt.is_decimal(dt.remove_nullable(b.dtype)):
        y = y / float(10 ** dt.remove_nullable(b.dtype).decimal_scale)
    data = x / y  # inf/nan on zero divide, like the reference's Float division
    return ColVal(out_dtype, data.astype(dt.remove_nullable(out_dtype).jnp_dtype),
                  _and_validity(args))


def _resolve_divide(ts):
    a0, b0 = (dt.remove_nullable(t) for t in ts)
    nullable = any(t.nullable for t in ts)
    if (dt.is_decimal(a0) or dt.is_decimal(b0)) \
            and not (dt.is_float(a0) or dt.is_float(b0)):
        # result scale = dividend's scale (reference divide rule)
        sa = a0.decimal_scale if dt.is_decimal(a0) else 0
        prec = a0.decimal_prec if dt.is_decimal(a0) else 18
        return dt.Decimal(prec, sa).with_nullable(nullable)
    return _resolve_float(ts)


register("divide", _resolve_divide, _div_exec)


def _const_nonzero(b: ColVal) -> bool:
    """True when the divisor is a compile-time nonzero constant (the common
    `x % 1024` shape) — no zero-divide mask needed."""
    if not b.is_const:
        return False
    try:
        return float(np.asarray(b.data)) != 0.0
    except Exception:
        return False


def _intdiv_exec(args, out_dtype):
    a, b = args
    st = dt.remove_nullable(out_dtype).jnp_dtype
    x = _numeric_data(a).astype(st)
    y = _numeric_data(b).astype(st)
    if _const_nonzero(b):
        return ColVal(dt.remove_nullable(out_dtype).with_nullable(
            a.dtype.nullable), jax.lax.div(x, y), _and_validity(args))
    safe = jnp.where(y == 0, jnp.ones_like(y), y)
    q = jax.lax.div(x, safe)       # C-style truncation, as the reference
    data = jnp.where(y == 0, jnp.zeros_like(q), q)
    v = _and_validity(args)
    zero = (y == 0)
    v = jnp.logical_and(v, ~zero) if v is not None else ~zero
    return ColVal(out_dtype.with_nullable(True), data, v)


def _resolve_intdiv(ts):
    _check_numeric(ts, "intDiv")
    out = ts[0]
    for t in ts[1:]:
        out = dt.common_supertype(out, t)
    if dt.is_float(dt.remove_nullable(out)):
        out = dt.Int64.with_nullable(out.nullable)
    return out.with_nullable(True)


register("intDiv", _resolve_intdiv, _intdiv_exec)


def _or_zero(base_exec):
    """xOrZero variants: zero result (and valid) where the divisor is 0."""
    def ex(args, out_dtype):
        out = base_exec(args, out_dtype)
        y = args[1].data
        zero = (y == 0)
        v = _and_validity(args)
        data = jnp.where(zero, jnp.zeros((), out.data.dtype), out.data)
        return ColVal(dt.remove_nullable(out.dtype).with_nullable(
            any(a.dtype.nullable for a in args)), data, v)
    return ex


def _intdiv_orzero_exec(args, out_dtype):
    out = _or_zero(_intdiv_exec)(args, out_dtype)
    st = dt.remove_nullable(out_dtype)
    if st.np_dtype.kind == "i":
        # signed MIN / -1 overflows: the reference returns 0, not a trap
        info = np.iinfo(st.np_dtype)
        x = _numeric_data(args[0]).astype(st.jnp_dtype)
        y = _numeric_data(args[1]).astype(st.jnp_dtype)
        ovf = (x == info.min) & (y == -1)
        return ColVal(out.dtype, jnp.where(ovf, jnp.zeros((), out.data.dtype),
                                           out.data), out.validity)
    return out


register("intDivOrZero", _resolve_intdiv, _intdiv_orzero_exec)


def _mod_exec(args, out_dtype):
    a, b = args
    st = dt.remove_nullable(out_dtype).jnp_dtype
    x = _numeric_data(a).astype(st)
    y = _numeric_data(b).astype(st)
    if _const_nonzero(b):
        return ColVal(dt.remove_nullable(out_dtype).with_nullable(
            a.dtype.nullable), jax.lax.rem(x, y), _and_validity(args))
    safe = jnp.where(y == 0, jnp.ones_like(y), y)
    r = jax.lax.rem(x, safe)
    data = jnp.where(y == 0, jnp.zeros_like(r), r)
    v = _and_validity(args)
    zero = (y == 0)
    v = jnp.logical_and(v, ~zero) if v is not None else ~zero
    return ColVal(out_dtype.with_nullable(True), data, v)


register("modulo", _resolve_intdiv, _mod_exec)
register("moduloOrZero", _resolve_intdiv, _or_zero(_mod_exec))
def _negate_exec(args, out_dtype):
    # widen BEFORE negating: -UInt32(1) must be -1 in the signed result
    # type, not the wrapped unsigned value (ref: src/Functions/negate.cpp)
    st = dt.remove_nullable(out_dtype).jnp_dtype
    x = _numeric_data(args[0]).astype(st)
    return ColVal(out_dtype, jnp.negative(x), _and_validity(args))


register("negate", lambda ts: _signed(_resolve_arith()(ts)), _negate_exec)
register("abs", _resolve_arith(), _unary_numeric(jnp.abs), case_insensitive=True)

def _bitwise(op):
    # float operands are truncated to integers (reference: bit functions
    # run on the integer image of the argument, FunctionsBinaryArithmetic)
    def wrapped(x, y):
        if jnp.issubdtype(x.dtype, jnp.floating):
            x = x.astype(jnp.int64)
        if jnp.issubdtype(y.dtype, jnp.floating):
            y = y.astype(jnp.int64)
        if x.dtype != y.dtype:
            y = y.astype(x.dtype)
        return op(x, y)
    return wrapped


for _n, _op in [("bitAnd", jnp.bitwise_and), ("bitOr", jnp.bitwise_or),
                ("bitXor", jnp.bitwise_xor)]:
    register(_n, _resolve_arith(), _binary_numeric(_bitwise(_op),
                                                   int_only=True))
register("bitNot", _resolve_arith(), _unary_numeric(jnp.bitwise_not))
register("bitShiftLeft", _resolve_arith(),
         _binary_numeric(lambda x, y: jnp.left_shift(x, y.astype(x.dtype))))
register("bitShiftRight", _resolve_arith(),
         _binary_numeric(lambda x, y: jnp.right_shift(x, y.astype(x.dtype))))


def _minmax2(op):
    def ex(args, out_dtype):
        a, b = args
        st = dt.remove_nullable(out_dtype).jnp_dtype
        return ColVal(out_dtype,
                      op(_numeric_data(a).astype(st), _numeric_data(b).astype(st)),
                      _and_validity(args))
    return ex


register("least", _resolve_arith(), _minmax2(jnp.minimum), case_insensitive=True)
register("greatest", _resolve_arith(), _minmax2(jnp.maximum), case_insensitive=True)


# -- comparisons -------------------------------------------------------------

def _resolve_cmp(ts):
    a, b = ts
    a0, b0 = dt.remove_nullable(a), dt.remove_nullable(b)
    # String vs non-String: allowed — the string side converts to the other
    # side's domain at execution (enum name table, date/decimal parse LUT)
    return dt.UInt8.with_nullable(a.nullable or b.nullable)


def _string_codes_common(a: ColVal, b: ColVal):
    """Bring two string ColVals onto one merged dictionary (trace-time host op)."""
    da = a.dictionary or Dictionary(np.asarray([], object))
    db = b.dictionary or Dictionary(np.asarray([], object))
    merged, ra, rb = Dictionary.unify(da, db)
    lut_a = jnp.asarray(ra)
    lut_b = jnp.asarray(rb)
    ca = lut_a[jnp.maximum(a.data, 0)] if len(ra) else jnp.full_like(a.data, -1)
    cb = lut_b[jnp.maximum(b.data, 0)] if len(rb) else jnp.full_like(b.data, -1)
    ca = jnp.where(a.data < 0, -1, ca)
    cb = jnp.where(b.data < 0, -1, cb)
    return ca, cb, merged


def _dict_rank_lut(d: Dictionary) -> jnp.ndarray:
    """rank[code] = lexicographic rank of the dictionary value."""
    if d.sorted_:
        # np.unique dictionaries are already in lexicographic order
        return jnp.arange(len(d), dtype=jnp.int64)
    vals = d.values.astype(str)
    order = np.argsort(vals, kind="stable")
    rank = np.empty(len(vals), np.int64)
    rank[order] = np.arange(len(vals))
    return jnp.asarray(rank)


# dictionaries in this size range route prefix/suffix predicates through
# the HBM-resident byte matrix (device compute per unique value) instead of
# host numpy over the values — the device-ColumnString hot path.  Above the
# cap the matrix would ship as a multi-hundred-MB program constant (the
# compile transport rejects it); host numpy (C-speed np.char) takes over,
# producing only a U-bit LUT constant.
_DEVICE_STRING_MIN_DICT = 1 << 16
_DEVICE_STRING_MAX_DICT = 1 << 22


def _device_prefix_lut(d: Dictionary, needle: str, reverse: bool):
    """Device LUT: value startsWith(needle) (or reversed = endsWith).
    -> bool (U,) jax array, or None when the device path doesn't apply."""
    if d is None or not (_DEVICE_STRING_MIN_DICT <= len(d)
                         <= _DEVICE_STRING_MAX_DICT):
        return None
    nb = needle.encode()
    if reverse:
        nb = nb[::-1]
    db = d.device_bytes_reversed() if reverse else d.device_bytes()
    if db is None:
        return None
    mat_np, lens_np, w = db
    p = len(nb)
    if p > w:
        return None
    mat = jnp.asarray(mat_np[:, :p])     # constant-hoisted into the program
    lens = jnp.asarray(lens_np)
    if p == 0:
        return jnp.ones((mat_np.shape[0],), jnp.bool_)
    pat = jnp.asarray(np.frombuffer(nb, np.uint8))
    return (mat == pat[None, :]).all(axis=1) & (lens >= p)


def _cmp_exec(op, code_op=None, name=None):
    def ex(args, out_dtype):
        a, b = args
        if a.sub is not None and b.sub is not None:
            return _tuple_cmp(name, a, b, out_dtype)
        if a.dtype.is_dictionary and b.dtype.is_dictionary:
            ca, cb, merged = _string_codes_common(a, b)
            if code_op is not None:        # equality: codes suffice
                data = code_op(ca, cb)
            else:                          # ordering: compare value ranks
                rank = _dict_rank_lut(merged)
                if len(merged) == 0:
                    data = op(ca, cb)
                else:
                    data = op(rank[jnp.maximum(ca, 0)], rank[jnp.maximum(cb, 0)])
            return ColVal(out_dtype, data.astype(jnp.uint8), _and_validity(args))
        a0 = dt.remove_nullable(a.dtype)
        b0 = dt.remove_nullable(b.dtype)
        if a0.is_dictionary != b0.is_dictionary \
                and not (dt.is_enum(a0) or dt.is_enum(b0)):
            # String vs Date/DateTime/Decimal/IPv4: parse the string side
            # into the typed side's domain (reference: comparing with a
            # constant string converts the string, FunctionsComparison.h)
            from .conv import cast_exec
            o = b0 if a0.is_dictionary else a0
            if a0.is_dictionary:
                a = cast_exec([a], o.with_nullable(a.dtype.nullable))
                a0 = o
            else:
                b = cast_exec([b], o.with_nullable(b.dtype.nullable))
                b0 = o
        if dt.is_enum(a0) != dt.is_enum(b0) \
                and (a0.is_dictionary or b0.is_dictionary):
            # Enum vs String: map strings to enum codes via the name table
            from .conv import cast_exec
            e = a0 if dt.is_enum(a0) else b0
            if a0.is_dictionary:
                a = cast_exec([a], e.with_nullable(a.dtype.nullable))
            else:
                b = cast_exec([b], e.with_nullable(b.dtype.nullable))
            a0 = b0 = e
        if _has_decimal(a0, b0):
            sa = a0.decimal_scale if dt.is_decimal(a0) else 0
            sb = b0.decimal_scale if dt.is_decimal(b0) else 0
            if dt.is_float(a0) or dt.is_float(b0):
                x = a.data.astype(jnp.float64) / float(10 ** sa)
                y = b.data.astype(jnp.float64) / float(10 ** sb)
            else:
                s = max(sa, sb)
                x = a.data.astype(jnp.int64) * _p10i(s - sa)
                y = b.data.astype(jnp.int64) * _p10i(s - sb)
            return ColVal(out_dtype, op(x, y).astype(jnp.uint8),
                          _and_validity(args))
        x = a.data if dt.is_enum(a0) else _numeric_data(a)
        y = b.data if dt.is_enum(b0) else _numeric_data(b)
        ct = np.promote_types(x.dtype, y.dtype)
        data = op(x.astype(ct), y.astype(ct))
        return ColVal(out_dtype, data.astype(jnp.uint8), _and_validity(args))
    return ex


register("equals", _resolve_cmp,
         _cmp_exec(jnp.equal, jnp.equal, name="equals"))
register("notEquals", _resolve_cmp,
         _cmp_exec(jnp.not_equal, jnp.not_equal, name="notEquals"))
register("less", _resolve_cmp, _cmp_exec(jnp.less, name="less"))
register("greater", _resolve_cmp, _cmp_exec(jnp.greater, name="greater"))
register("lessOrEquals", _resolve_cmp,
         _cmp_exec(jnp.less_equal, name="lessOrEquals"))
register("greaterOrEquals", _resolve_cmp,
         _cmp_exec(jnp.greater_equal, name="greaterOrEquals"))


# -- logical -----------------------------------------------------------------

def _resolve_bool(ts):
    return dt.UInt8.with_nullable(any(t.nullable for t in ts))


def _bool_data(a: ColVal):
    d = _numeric_data(a)
    if d.dtype == jnp.bool_:
        return d
    return d != jnp.zeros((), d.dtype)


def _and_exec(args, out_dtype):
    data = _bool_data(args[0])
    for a in args[1:]:
        data = data & _bool_data(a)
    v = _and_validity(args)
    if v is not None:
        # NULL-as-false inside conjunctions (simplified Kleene)
        data = data & v
    return ColVal(out_dtype, data.astype(jnp.uint8), None)


def _or_exec(args, out_dtype):
    data = _bool_data(args[0]) if args[0].validity is None else (
        _bool_data(args[0]) & args[0].validity.astype(jnp.bool_))
    for a in args[1:]:
        d = _bool_data(a)
        if a.validity is not None:
            d = d & a.validity.astype(jnp.bool_)
        data = data | d
    return ColVal(out_dtype, data.astype(jnp.uint8), None)


register("and", _resolve_bool, _and_exec)
register("or", _resolve_bool, _or_exec)
register("xor", _resolve_bool,
         lambda args, t: ColVal(t, (_bool_data(args[0]) ^ _bool_data(args[1]))
                                .astype(jnp.uint8), _and_validity(args)))
register("not", _resolve_bool,
         lambda args, t: ColVal(t, (~_bool_data(args[0])).astype(jnp.uint8),
                                _and_validity(args)))


# -- conditionals / NULL handling -------------------------------------------

def _resolve_if(ts):
    cond, a, b = ts
    return dt.common_supertype(a, b)


def _if_exec(args, out_dtype):
    cond, a, b = args
    c = _bool_data(cond)
    if cond.validity is not None:
        c = c & cond.validity.astype(jnp.bool_)
    st = dt.remove_nullable(out_dtype)
    if st.is_dictionary:
        ca, cb, merged = _string_codes_common(a, b)
        data = jnp.where(c, ca, cb)
        va = a.validity if a.validity is not None else jnp.ones((), jnp.uint8)
        vb = b.validity if b.validity is not None else jnp.ones((), jnp.uint8)
        v = jnp.where(c, va.astype(jnp.bool_), vb.astype(jnp.bool_)) \
            if (a.validity is not None or b.validity is not None) else None
        return ColVal(out_dtype, data, v, merged)
    x = _numeric_data(a).astype(st.jnp_dtype)
    y = _numeric_data(b).astype(st.jnp_dtype)
    data = jnp.where(c, x, y)
    v = None
    if a.validity is not None or b.validity is not None:
        va = a.validity.astype(jnp.bool_) if a.validity is not None else jnp.ones((), jnp.bool_)
        vb = b.validity.astype(jnp.bool_) if b.validity is not None else jnp.ones((), jnp.bool_)
        v = jnp.where(c, va, vb)
    return ColVal(out_dtype, data, v)


register("if", _resolve_if, _if_exec, case_insensitive=True)


def _resolve_multiif(ts):
    branches = [ts[i] for i in range(1, len(ts), 2)]
    if len(ts) % 2 == 1:
        branches.append(ts[-1])
    out = branches[0]
    for b in branches[1:]:
        out = dt.common_supertype(out, b)
    return out


def _multiif_exec(args, out_dtype):
    # multiIf(c1, v1, c2, v2, ..., default)
    pairs = [(args[i], args[i + 1]) for i in range(0, len(args) - 1, 2)]
    default = args[-1] if len(args) % 2 == 1 else None
    from .expr import ColVal as CV
    if default is None:
        default = CV(out_dtype, jnp.zeros((), dt.remove_nullable(out_dtype).jnp_dtype),
                     jnp.zeros((), jnp.uint8))
    result = default
    for cond, val in reversed(pairs):
        result = _if_exec([cond, val, result], out_dtype)
    return result


register("multiIf", _resolve_multiif, _multiif_exec)

register("isNull", lambda ts: dt.UInt8,
         lambda args, t: ColVal(t, (jnp.zeros_like(_numeric_or_codes(args[0]),
                                                   dtype=jnp.uint8)
                                    if args[0].validity is None else
                                    (~args[0].validity.astype(jnp.bool_)).astype(jnp.uint8)),
                                None))
register("isNotNull", lambda ts: dt.UInt8,
         lambda args, t: ColVal(t, (jnp.ones_like(_numeric_or_codes(args[0]),
                                                  dtype=jnp.uint8)
                                    if args[0].validity is None else
                                    args[0].validity.astype(jnp.uint8)), None))


def _numeric_or_codes(a: ColVal):
    return a.data


def _resolve_coalesce(ts):
    out = ts[0]
    for t in ts[1:]:
        out = dt.common_supertype(out, t)
    if not all(t.nullable for t in ts):
        out = dt.remove_nullable(out)
    return out


def _coalesce_exec(args, out_dtype):
    result = args[-1]
    for a in reversed(args[:-1]):
        is_valid = a.validity.astype(jnp.bool_) if a.validity is not None \
            else jnp.ones((), jnp.bool_)
        cond = ColVal(dt.UInt8, is_valid.astype(jnp.uint8))
        result = _if_exec([cond, a, result], out_dtype)
    return result


register("coalesce", _resolve_coalesce, _coalesce_exec, case_insensitive=True)
register("ifNull", lambda ts: _resolve_coalesce(list(ts)), _coalesce_exec,
         case_insensitive=True)


def _nullif_exec(args, out_dtype):
    a, b = args
    eq = _cmp_exec(jnp.equal, jnp.equal)([a, b], dt.UInt8)
    v = eq.data == 0
    if a.validity is not None:
        v = v & a.validity.astype(jnp.bool_)
    return ColVal(out_dtype, a.data, v, a.dictionary)


register("nullIf", lambda ts: dt.make_nullable(ts[0]), _nullif_exec,
         case_insensitive=True)


def _assume_not_null(args, out_dtype):
    a = args[0]
    return ColVal(out_dtype, a.data, None, a.dictionary)


register("assumeNotNull", lambda ts: dt.remove_nullable(ts[0]), _assume_not_null)
register("toNullable", lambda ts: dt.make_nullable(ts[0]),
         lambda args, t: ColVal(t, args[0].data, args[0].validity, args[0].dictionary))


# -- math --------------------------------------------------------------------

def _float_unary(op):
    def ex(args, out_dtype):
        x = _numeric_data(args[0]).astype(jnp.float64)
        return ColVal(out_dtype, op(x), _and_validity(args))
    return ex


for _n, _op in [
    ("sqrt", jnp.sqrt), ("cbrt", jnp.cbrt), ("exp", jnp.exp), ("log", jnp.log),
    ("ln", jnp.log), ("exp2", jnp.exp2), ("log2", jnp.log2),
    ("exp10", lambda x: jnp.power(10.0, x)),
    ("log10", jnp.log10), ("sin", jnp.sin), ("cos", jnp.cos), ("tan", jnp.tan),
    ("asin", jnp.arcsin), ("acos", jnp.arccos), ("atan", jnp.arctan),
    ("sigmoid", jax.nn.sigmoid), ("tanh", jnp.tanh), ("erf", jax.lax.erf),
    ("erfc", lambda x: 1.0 - jax.lax.erf(x)),
    ("lgamma", jax.lax.lgamma),
    ("tgamma", lambda x: jnp.where(x > 0, jnp.exp(jax.lax.lgamma(x)),
                                   jnp.nan)),
]:
    register(_n, _resolve_float, _float_unary(_op), case_insensitive=True)

register("pow", _resolve_float,
         lambda args, t: ColVal(t, jnp.power(
             _numeric_data(args[0]).astype(jnp.float64),
             _numeric_data(args[1]).astype(jnp.float64)), _and_validity(args)),
         case_insensitive=True)
register("power", _resolve_float, FUNCTIONS["pow"]._execute, case_insensitive=True)
register("atan2", _resolve_float,
         lambda args, t: ColVal(t, jnp.arctan2(
             _numeric_data(args[0]).astype(jnp.float64),
             _numeric_data(args[1]).astype(jnp.float64)), _and_validity(args)),
         case_insensitive=True)

register("pi", lambda ts: dt.Float64,
         lambda args, t: ColVal(t, jnp.asarray(math.pi, jnp.float64)),
         case_insensitive=True)
register("e", lambda ts: dt.Float64,
         lambda args, t: ColVal(t, jnp.asarray(math.e, jnp.float64)),
         case_insensitive=True)


def _resolve_rounding(ts):
    t = ts[0] if len(ts) else dt.Float64
    _check_numeric(ts, "round")
    return t


def _round_exec(kind):
    def ex(args, out_dtype):
        x = _numeric_data(args[0])
        out0 = dt.remove_nullable(out_dtype)
        if dt.is_decimal(out0):
            # exact integer rounding on the scaled representation
            # (reference: src/Functions/FunctionsRound.h DecimalRoundingImpl);
            # q = 10^(S-N) clipped to 1 when N >= S (identity)
            s = out0.decimal_scale
            n = args[1].data.astype(jnp.int64) if len(args) >= 2 \
                else jnp.int64(0)
            q = jnp.power(jnp.int64(10), jnp.clip(s - n, 0, 18))
            xi = x.astype(jnp.int64)
            ax = jnp.abs(xi)
            if kind is jnp.trunc:
                data = jnp.sign(xi) * (ax // q) * q
            elif kind is jnp.floor:
                data = jnp.where(xi >= 0, (ax // q) * q,
                                 -((ax + q - 1) // q) * q)
            elif kind is jnp.ceil:
                data = jnp.where(xi >= 0, ((ax + q - 1) // q) * q,
                                 -(ax // q) * q)
            elif kind == "bankers":   # round half to even
                base = ax // q
                rem = ax - base * q
                half = q // 2
                up = (2 * rem > q) | ((2 * rem == q) & (base % 2 == 1))
                data = jnp.sign(xi) * (base + up.astype(jnp.int64)) * q
            else:   # round half away from zero (reference decimal rule)
                data = jnp.sign(xi) * ((ax + q // 2) // q) * q
            return ColVal(out_dtype, data, _and_validity(args))
        if dt.is_integer(out0) and len(args) < 2:
            return ColVal(out_dtype, x, _and_validity(args))
        k = jnp.round if kind == "bankers" else kind   # jnp.round is half-even
        xf = x.astype(jnp.float64)
        if len(args) >= 2:
            # round to N decimal places
            scale = jnp.power(10.0, _numeric_data(args[1]).astype(jnp.float64))
            data = k(xf * scale) / scale
        else:
            data = k(xf)
        return ColVal(out_dtype, data.astype(dt.remove_nullable(out_dtype).jnp_dtype),
                      _and_validity(args))
    return ex


register("floor", _resolve_rounding, _round_exec(jnp.floor), case_insensitive=True)
register("ceil", _resolve_rounding, _round_exec(jnp.ceil), case_insensitive=True)
register("ceiling", _resolve_rounding, _round_exec(jnp.ceil), case_insensitive=True)
register("round", _resolve_rounding,
         _round_exec(lambda x: jnp.round(x)), case_insensitive=True)
register("trunc", _resolve_rounding, _round_exec(jnp.trunc), case_insensitive=True)
register("truncate", _resolve_rounding, _round_exec(jnp.trunc), case_insensitive=True)
register("roundBankers", _resolve_rounding, _round_exec("bankers"))
register("sign", lambda ts: dt.Int8.with_nullable(any(t.nullable for t in ts)),
         _unary_numeric(lambda x: jnp.sign(x.astype(jnp.float64))),
         case_insensitive=True)
register("isNaN", _resolve_bool,
         lambda args, t: ColVal(t, jnp.isnan(
             _numeric_data(args[0]).astype(jnp.float64)).astype(jnp.uint8),
             _and_validity(args)))
register("isFinite", _resolve_bool,
         lambda args, t: ColVal(t, jnp.isfinite(
             _numeric_data(args[0]).astype(jnp.float64)).astype(jnp.uint8),
             _and_validity(args)))
register("isInfinite", _resolve_bool,
         lambda args, t: ColVal(t, jnp.isinf(
             _numeric_data(args[0]).astype(jnp.float64)).astype(jnp.uint8),
             _and_validity(args)))


# -- type conversions --------------------------------------------------------

def _conv(name, target: dt.DType):
    def resolve(ts):
        return target.with_nullable(ts[0].nullable)

    def ex(args, out_dtype):
        # unified cast machine (conv.py) — covers string parse LUTs,
        # decimal rescale, date/enum conversions
        from .conv import cast_exec
        return cast_exec(args[:1], out_dtype)

    register(name, resolve, ex)


for _t in [dt.Int8, dt.Int16, dt.Int32, dt.Int64, dt.UInt8, dt.UInt16,
           dt.UInt32, dt.UInt64, dt.Float32, dt.Float64]:
    _conv(f"to{_t.name}", _t)
for _wide in ("Int128", "Int256", "UInt128", "UInt256"):
    _conv(f"to{_wide}", dt.parse_type_name(_wide))
register("toBool", lambda ts: dt.Boolean.with_nullable(ts[0].nullable),
         lambda args, t: ColVal(t, _bool_data(args[0]).astype(jnp.uint8),
                                _and_validity(args)))


def _to_string_exec(args, out_dtype):
    a = args[0]
    if a.dtype.is_dictionary:
        if dt.remove_nullable(a.dtype).name.startswith("FixedString"):
            # toString(FixedString) strips the zero-byte padding
            # (ref: src/Functions/toString with FixedString input)
            return _string_fn_lut(lambda s: s.rstrip("\x00"), object)(
                args, out_dtype)
        return ColVal(out_dtype, a.data, a.validity, a.dictionary)
    from .conv import cast_exec
    return cast_exec(args[:1], out_dtype)   # enums, constants


register("toString", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _to_string_exec)


# -- date / time -------------------------------------------------------------
# Civil-calendar math (integer-only, vectorized): Howard Hinnant's algorithms.

def _civil_from_days(z):
    z = z.astype(jnp.int64) + 719468
    era = jnp.floor_divide(z, 146097)
    doe = z - era * 146097
    yoe = jnp.floor_divide(doe - jnp.floor_divide(doe, 1460)
                           + jnp.floor_divide(doe, 36524)
                           - jnp.floor_divide(doe, 146096), 365)
    y = yoe + era * 400
    doy = doe - (365 * yoe + jnp.floor_divide(yoe, 4) - jnp.floor_divide(yoe, 100))
    mp = jnp.floor_divide(5 * doy + 2, 153)
    d = doy - jnp.floor_divide(153 * mp + 2, 5) + 1
    m = jnp.where(mp < 10, mp + 3, mp - 9)
    y = y + (m <= 2)
    return y, m, d


def _days_from_civil(y, m, d):
    y = y - (m <= 2)
    era = jnp.floor_divide(y, 400)
    yoe = y - era * 400
    mp = jnp.where(m > 2, m - 3, m + 9)
    doy = jnp.floor_divide(153 * mp + 2, 5) + d - 1
    doe = yoe * 365 + jnp.floor_divide(yoe, 4) - jnp.floor_divide(yoe, 100) + doy
    return era * 146097 + doe - 719468


def _as_days(a: ColVal):
    if a.dtype.name == "DateTime":
        return jnp.floor_divide(a.data, 86400)
    return a.data.astype(jnp.int64)


def _date_part(part, out_type=dt.UInt16):
    def ex(args, out_dtype):
        days = _as_days(args[0])
        y, m, d = _civil_from_days(days)
        val = {"year": y, "month": m, "day": d}[part]
        return ColVal(out_dtype, val.astype(out_dtype.np_dtype.name),
                      _and_validity(args))
    return ex


register("toYear", lambda ts: dt.UInt16.with_nullable(ts[0].nullable),
         _date_part("year"))
register("toMonth", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _date_part("month", dt.UInt8))
register("toDayOfMonth", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _date_part("day", dt.UInt8))


def _time_part(divisor, modulo, out_type=dt.UInt8):
    def ex(args, out_dtype):
        secs = args[0].data.astype(jnp.int64)
        val = jnp.mod(jnp.floor_divide(secs, divisor), modulo)
        return ColVal(out_dtype, val.astype(out_dtype.np_dtype.name),
                      _and_validity(args))
    return ex


register("toHour", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _time_part(3600, 24))
register("toMinute", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _time_part(60, 60))
register("toSecond", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _time_part(1, 60))
register("toDate", lambda ts: dt.Date.with_nullable(ts[0].nullable),
         lambda args, t: ColVal(t, _as_days(args[0]).astype(jnp.int32),
                                _and_validity(args)))
register("toUnixTimestamp", lambda ts: dt.UInt32.with_nullable(ts[0].nullable),
         lambda args, t: ColVal(t, args[0].data.astype(jnp.uint32),
                                _and_validity(args)))
register("toDayOfWeek", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         lambda args, t: ColVal(
             t, (jnp.mod(_as_days(args[0]) + 3, 7) + 1).astype(jnp.uint8),
             _and_validity(args)))  # 1970-01-01 = Thursday; Monday = 1


def _yyyymm_exec(args, out_dtype):
    y, m, _ = _civil_from_days(_as_days(args[0]))
    return ColVal(out_dtype, (y * 100 + m).astype(jnp.uint32), _and_validity(args))


def _yyyymmdd_exec(args, out_dtype):
    y, m, d = _civil_from_days(_as_days(args[0]))
    return ColVal(out_dtype, (y * 10000 + m * 100 + d).astype(jnp.uint32),
                  _and_validity(args))


register("toYYYYMM", lambda ts: dt.UInt32.with_nullable(ts[0].nullable), _yyyymm_exec)
register("toYYYYMMDD", lambda ts: dt.UInt32.with_nullable(ts[0].nullable), _yyyymmdd_exec)


def _yyyymmddhhmmss_exec(args, out_dtype):
    a = args[0]
    secs = a.data.astype(jnp.int64)
    if dt.remove_nullable(a.dtype).name == "Date":
        secs = secs * 86400
    days = jnp.floor_divide(secs, 86400)
    rem = secs - days * 86400
    y, m, d = _civil_from_days(days)
    hh = jnp.floor_divide(rem, 3600)
    mm = jnp.mod(jnp.floor_divide(rem, 60), 60)
    ss = jnp.mod(rem, 60)
    data = ((y * 10000 + m * 100 + d).astype(jnp.uint64) * 1000000
            + (hh * 10000 + mm * 100 + ss).astype(jnp.uint64))
    return ColVal(out_dtype, data, _and_validity(args))


register("toYYYYMMDDhhmmss",
         lambda ts: dt.UInt64.with_nullable(ts[0].nullable),
         _yyyymmddhhmmss_exec)


def _start_of(period):
    def ex(args, out_dtype):
        days = _as_days(args[0])
        y, m, d = _civil_from_days(days)
        if period == "year":
            out = _days_from_civil(y, jnp.ones_like(m), jnp.ones_like(m))
        elif period == "month":
            out = _days_from_civil(y, m, jnp.ones_like(m))
        else:  # week: Monday
            out = days - jnp.mod(days + 3, 7)
        return ColVal(out_dtype, out.astype(jnp.int32), _and_validity(args))
    return ex


register("toStartOfYear", lambda ts: dt.Date.with_nullable(ts[0].nullable),
         _start_of("year"))
register("toStartOfMonth", lambda ts: dt.Date.with_nullable(ts[0].nullable),
         _start_of("month"))
register("toStartOfWeek", lambda ts: dt.Date.with_nullable(ts[0].nullable),
         _start_of("week"))


for _unit in dt.INTERVAL_UNITS:
    def _mk_interval(unit=_unit):
        t = dt.INTERVALS[unit]

        def ex(args, out_dtype):
            return ColVal(t, args[0].data.astype(jnp.int64),
                          _and_validity(args), host=args[0].host)
        return ex
    register(f"toInterval{_unit}",
             (lambda u: lambda ts: dt.INTERVALS[u])(_unit),
             _mk_interval())


def _now_exec(args, out_dtype):
    import time as _time
    return ColVal(out_dtype, jnp.asarray(int(_time.time()), jnp.int64))


register("now", lambda ts: dt.DateTime, _now_exec, case_insensitive=True)
register("today", lambda ts: dt.Date,
         lambda args, t: ColVal(t, jnp.asarray(
             int(__import__("time").time()) // 86400, jnp.int32)),
         case_insensitive=True)
register("yesterday", lambda ts: dt.Date,
         lambda args, t: ColVal(t, jnp.asarray(
             int(__import__("time").time()) // 86400 - 1, jnp.int32)),
         case_insensitive=True)


def _add_unit(unit, sign):
    def resolve(ts):
        return ts[0]

    def ex(args, out_dtype):
        iv = ColVal(dt.INTERVALS[unit], args[1].data.astype(jnp.int64),
                    args[1].validity)
        return _datetime_arith(sign)([args[0], iv], out_dtype)
    return resolve, ex


for _unit in dt.INTERVAL_UNITS:
    _r, _e = _add_unit(_unit, 1)
    register(f"add{_unit}s", _r, _e)
    _r2, _e2 = _add_unit(_unit, -1)
    register(f"subtract{_unit}s", _r2, _e2)


def _date_diff_exec(args, out_dtype):
    unit_cv, a, b = args
    unit = str(unit_cv.dictionary.values[0]).lower() \
        if unit_cv.dictionary is not None else "day"
    def days_of(cv):
        base = cv.data.astype(jnp.int64)
        return base if dt.remove_nullable(cv.dtype).name == "Date" \
            else jnp.floor_divide(base, 86400)
    def secs_of(cv):
        base = cv.data.astype(jnp.int64)
        return base * 86400 if dt.remove_nullable(cv.dtype).name == "Date" \
            else base
    if unit in ("second", "minute", "hour"):
        scale = {"second": 1, "minute": 60, "hour": 3600}[unit]
        data = jnp.floor_divide(secs_of(b) - secs_of(a), scale)
    elif unit in ("day", "week"):
        scale = {"day": 1, "week": 7}[unit]
        data = jnp.floor_divide(days_of(b) - days_of(a), scale)
    elif unit in ("month", "quarter", "year"):
        ya, ma, _ = _civil_from_days(days_of(a))
        yb, mb, _ = _civil_from_days(days_of(b))
        months = (yb * 12 + mb) - (ya * 12 + ma)
        scale = {"month": 1, "quarter": 3, "year": 12}[unit]
        data = jnp.floor_divide(months, scale)
    else:
        raise TypeError_(f"dateDiff: unknown unit '{unit}'")
    return ColVal(out_dtype, data.astype(jnp.int64),
                  _and_validity(args[1:]))


register("dateDiff", lambda ts: dt.Int64.with_nullable(
    any(t.nullable for t in ts[1:])), _date_diff_exec)
register("toStartOfDay", lambda ts: dt.DateTime.with_nullable(ts[0].nullable),
         lambda args, t: ColVal(t, _as_days(args[0]) * 86400,
                                _and_validity(args)))
register("toStartOfHour", lambda ts: dt.DateTime.with_nullable(ts[0].nullable),
         lambda args, t: ColVal(
             t, jnp.floor_divide(args[0].data.astype(jnp.int64), 3600) * 3600,
             _and_validity(args)))
register("toStartOfMinute", lambda ts: dt.DateTime.with_nullable(ts[0].nullable),
         lambda args, t: ColVal(
             t, jnp.floor_divide(args[0].data.astype(jnp.int64), 60) * 60,
             _and_validity(args)))


# -- strings (dictionary-LUT execution) --------------------------------------

def _string_fn_lut(host_fn, out_np_dtype, vec_fn=None):
    """Apply host_fn to each dictionary value, gather the LUT by code.

    vec_fn, when given, is a numpy-vectorized implementation over the whole
    unique-value array — the path that keeps 10M-distinct dictionaries
    tractable (per-value python loops are reserved for small dictionaries
    and functions numpy cannot vectorize)."""
    def ex(args, out_dtype):
        a = args[0]
        if not a.dtype.is_dictionary:
            raise TypeError_("String function expects a String argument")
        vals = a.dictionary.values if a.dictionary else np.asarray([], object)
        if vec_fn is not None and len(vals) > 512:
            sv = vals.astype(str)
            lut_np = np.asarray(vec_fn(sv), dtype=out_np_dtype)
        else:
            lut_np = np.asarray(
                [host_fn(str(v)) for v in vals] or [host_fn("")],
                dtype=out_np_dtype)
        if out_np_dtype == object:
            # produces a new string dictionary
            uniq, codes = np.unique(lut_np.astype(str), return_inverse=True)
            lut = jnp.asarray(codes.astype(np.int32))
            data = lut[jnp.maximum(a.data, 0)]
            return ColVal(out_dtype, data, _and_validity(args),
                          Dictionary(uniq.astype(object), sorted_=True))
        lut = jnp.asarray(lut_np)
        data = lut[jnp.maximum(a.data, 0)]
        return ColVal(out_dtype, data, _and_validity(args))
    return ex


register("length", lambda ts: dt.UInt64.with_nullable(ts[0].nullable),
         _string_fn_lut(lambda s: len(s.encode()), np.uint64,
                        vec_fn=lambda sv: np.char.str_len(
                            np.char.encode(sv, "utf-8"))),
         case_insensitive=True)
register("lengthUTF8", lambda ts: dt.UInt64.with_nullable(ts[0].nullable),
         _string_fn_lut(len, np.uint64, vec_fn=np.char.str_len))
register("empty", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _string_fn_lut(lambda s: np.uint8(len(s) == 0), np.uint8,
                        vec_fn=lambda sv: np.char.str_len(sv) == 0))
register("notEmpty", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _string_fn_lut(lambda s: np.uint8(len(s) != 0), np.uint8,
                        vec_fn=lambda sv: np.char.str_len(sv) != 0))
register("lower", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _string_fn_lut(str.lower, object, vec_fn=np.char.lower),
         case_insensitive=True)
register("upper", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _string_fn_lut(str.upper, object, vec_fn=np.char.upper),
         case_insensitive=True)
register("reverse", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _string_fn_lut(lambda s: s[::-1], object), case_insensitive=True)
register("trim", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _string_fn_lut(str.strip, object, vec_fn=np.char.strip),
         case_insensitive=True)


def _like_to_regex(pattern: str) -> str:
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if c == "%":
            out.append(".*")
        elif c == "_":
            out.append(".")
        else:
            out.append(re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"


def _like_exec(negate=False, icase=False):
    def ex(args, out_dtype):
        a, pat = args
        if not pat.is_const or pat.dictionary is None:
            raise TypeError_("LIKE pattern must be a constant string")
        pattern = str(pat.dictionary.values[0])
        rx = re.compile(_like_to_regex(pattern),
                        re.IGNORECASE if icase else 0, )
        fn = lambda s: np.uint8((rx.match(s) is not None) != negate)
        # vectorized fast paths for %-only patterns (prefix/suffix/contains)
        vec = None
        core = pattern.strip("%")
        plain = "%" not in core and "_" not in core and "\\" not in core
        if plain and not icase:
            # device-ColumnString path: prefix/suffix LIKE over large
            # dictionaries computes the per-unique LUT on the device
            dev = None
            if a.dtype.is_dictionary:
                if pattern == f"{core}%":
                    dev = _device_prefix_lut(a.dictionary, core, False)
                elif pattern == f"%{core}":
                    dev = _device_prefix_lut(a.dictionary, core, True)
            if dev is not None:
                if negate:
                    dev = jnp.logical_not(dev)
                data = dev.astype(jnp.uint8)[jnp.maximum(a.data, 0)]
                return ColVal(out_dtype, data, _and_validity([a]))
            if pattern == f"{core}%":
                vec = lambda sv: np.char.startswith(sv, core) != negate
            elif pattern == f"%{core}":
                vec = lambda sv: np.char.endswith(sv, core) != negate
            elif pattern == f"%{core}%":
                vec = lambda sv: (np.char.find(sv, core) >= 0) != negate
            elif "%" not in pattern and "_" not in pattern:
                vec = lambda sv: (sv == pattern) != negate
        return _string_fn_lut(fn, np.uint8, vec_fn=vec)([a], out_dtype)
    return ex


register("like", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _like_exec(False))
register("notLike", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _like_exec(True))
register("ilike", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _like_exec(False, True))
register("notILike", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _like_exec(True, True))
register("match", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         lambda args, t: _string_fn_lut(
             lambda s, rx=re.compile(str(args[1].dictionary.values[0])):
             np.uint8(rx.search(s) is not None), np.uint8)([args[0]], t))


def _affix_exec(reverse: bool):
    def ex(args, out_dtype):
        a, pref = args
        p = str(pref.dictionary.values[0])
        dev = _device_prefix_lut(a.dictionary, p, reverse) \
            if a.dtype.is_dictionary else None
        if dev is not None:
            data = dev.astype(jnp.uint8)[jnp.maximum(a.data, 0)]
            return ColVal(out_dtype, data, _and_validity(args))
        if reverse:
            return _string_fn_lut(
                lambda s: np.uint8(s.endswith(p)), np.uint8,
                vec_fn=lambda sv: np.char.endswith(sv, p))([a], out_dtype)
        return _string_fn_lut(
            lambda s: np.uint8(s.startswith(p)), np.uint8,
            vec_fn=lambda sv: np.char.startswith(sv, p))([a], out_dtype)
    return ex


_startswith_exec = _affix_exec(reverse=False)
_endswith_exec = _affix_exec(reverse=True)


register("startsWith", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _startswith_exec)
register("endsWith", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _endswith_exec)
register("position", lambda ts: dt.UInt64.with_nullable(ts[0].nullable),
         lambda args, t: _string_fn_lut(
             lambda s, sub=str(args[1].dictionary.values[0]):
             np.uint64(s.find(sub) + 1), np.uint64)([args[0]], t))


def _substring_exec(args, out_dtype):
    a = args[0]
    start = int(np.asarray(args[1].data))
    length = int(np.asarray(args[2].data)) if len(args) > 2 else None

    def fn(s):
        b = start - 1 if start > 0 else len(s) + start
        return s[b:b + length] if length is not None else s[b:]
    return _string_fn_lut(fn, object)([a], out_dtype)


register("substring", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _substring_exec, case_insensitive=True)
register("substr", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _substring_exec, case_insensitive=True)


def _concat_exec(args, out_dtype):
    # Fold pairwise on the merged-dictionary cross pairs that actually occur
    # is too costly in general; support const+column and column+const via LUT,
    # and column+column by pairwise host product only when both dicts are tiny.
    strings = [a for a in args]
    non_const = [a for a in strings if not a.is_const]
    if len(non_const) <= 1:
        consts_before = []
        col = non_const[0] if non_const else None
        if col is None:
            s = "".join(str(a.dictionary.values[0]) for a in strings)
            d = Dictionary(np.asarray([s], object))
            return ColVal(out_dtype, jnp.zeros((), jnp.int32), None, d)
        idx = next(i for i, a in enumerate(strings) if a is col)
        pre = "".join(str(a.dictionary.values[0]) for a in strings[:idx])
        post = "".join(str(a.dictionary.values[0]) for a in strings[idx + 1:])
        return _string_fn_lut(
            lambda s: pre + s + post, object,
            vec_fn=lambda sv: np.char.add(np.char.add(pre, sv), post))(
            [col], out_dtype)
    a, b = non_const[0], non_const[1]
    da = a.dictionary.values if a.dictionary else np.asarray([], object)
    db = b.dictionary.values if b.dictionary else np.asarray([], object)
    if len(da) * len(db) > 1 << 20:
        raise TypeError_("concat of two high-cardinality string columns is "
                         "not supported yet")
    prod = np.asarray([str(x) + str(y) for x in da for y in db] or [""], object)
    uniq, codes = np.unique(prod.astype(str), return_inverse=True)
    lut = jnp.asarray(codes.astype(np.int32).reshape(max(len(da), 1),
                                                     max(len(db), 1)))
    data = lut[jnp.maximum(a.data, 0), jnp.maximum(b.data, 0)]
    out = ColVal(out_dtype, data, _and_validity(args),
                 Dictionary(uniq.astype(object), sorted_=True))
    if len(non_const) > 2:
        rest = [out] + non_const[2:]
        return _concat_exec(rest, out_dtype)
    return out


register("concat", lambda ts: dt.String.with_nullable(any(t.nullable for t in ts)),
         _concat_exec, case_insensitive=True)


# -- hashing / misc ----------------------------------------------------------

def _hash_exec(args, out_dtype):
    from ..ops import hash_ops
    arrays = []
    for a in args:
        arrays.append(a.data)
    return ColVal(out_dtype, hash_ops.hash_columns(arrays), _and_validity(args))


register("cityHash64", lambda ts: dt.UInt64, _hash_exec)
register("sipHash64", lambda ts: dt.UInt64, _hash_exec)
register("xxHash64", lambda ts: dt.UInt64, _hash_exec)


def _identity_exec(args, out_dtype):
    a = args[0]
    return ColVal(out_dtype, a.data, a.validity, a.dictionary)


register("identity", lambda ts: ts[0], _identity_exec)
register("materialize", lambda ts: ts[0], _identity_exec)
register("ignore", lambda ts: dt.UInt8,
         lambda args, t: ColVal(t, jnp.zeros((), jnp.uint8)))


# -- arrays (padded (rows, max_len) + lengths; SURVEY §2.1 ColumnArray) ------

def _elem_mask(cv: ColVal):
    ml = cv.data.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, cv.data.shape, len(cv.data.shape) - 1)
    if cv.lengths is None:       # no lengths recorded: full-width rows
        return idx < jnp.int32(ml)
    return idx < cv.lengths[..., None].astype(jnp.int32)


def _resolve_array_ctor(ts):
    if not ts:
        return dt.Array(dt.Int64)
    inner = ts[0]
    for t in ts[1:]:
        inner = dt.common_supertype(inner, t)
    return dt.Array(dt.remove_nullable(inner))


def _array_ctor_exec(args, out_dtype):
    inner = dt.array_inner(out_dtype)
    k = len(args)
    if k > 0 and all(a.sub is not None for a in args) \
            and len({len(a.sub) for a in args}) == 1:
        # array of tuples: struct-of-arrays composite — one Array per
        # tuple member (ColumnArray(ColumnTuple) as nesting)
        arity = len(args[0].sub)
        subs = []
        for i in range(arity):
            member_t = dt.Array(dt.remove_nullable(args[0].sub[i].dtype))
            subs.append(_array_ctor_exec([a.sub[i] for a in args],
                                         member_t))
        return ColVal(out_dtype, jnp.zeros((), jnp.int8),
                      _and_validity(args), sub=subs,
                      lengths=subs[0].lengths)
    if k == 0:
        # 1-D data marks an array constant (broadcast tiles it per row)
        return ColVal(out_dtype, jnp.zeros((8,), inner.jnp_dtype), None,
                      None, lengths=jnp.zeros((), jnp.int32))
    if not inner.is_dictionary and all(a.is_const for a in args):
        # literal element lists stay HOST-concrete so consumers that need
        # the values at trace time (transform, IN, range) can read them
        vals = [_const_int(a) if not dt.is_float(inner)
                else (a.host if a.host is not None else None)
                for a in args]
        host = np.asarray(vals, inner.np_dtype) \
            if all(v is not None for v in vals) else None
        if host is not None:
            ml = max(((k + 7) // 8) * 8, 8)
            data = np.zeros((ml,), inner.np_dtype)
            data[:k] = host
            b = (int(host.min()), int(host.max())) \
                if host.dtype.kind in "iu" and k else None
            return ColVal(out_dtype, jnp.asarray(data), _and_validity(args),
                          None, bounds=b,
                          lengths=jnp.asarray(k, jnp.int32),
                          host=list(host))
    if inner.is_dictionary and all(a.is_const and a.dictionary is not None
                                   for a in args):
        try:
            texts = [str(a.host) if a.host is not None
                     else str(a.dictionary.values[
                         int(np.asarray(jax.device_get(a.data)).item())])
                     for a in args]
        except Exception:
            texts = None
        if texts is not None:
            uniq, codes = np.unique(np.asarray(texts, object).astype(str),
                                    return_inverse=True)
            ml = max(((k + 7) // 8) * 8, 8)
            data = np.zeros((ml,), np.int32)
            data[:k] = codes.astype(np.int32)
            return ColVal(out_dtype, jnp.asarray(data), _and_validity(args),
                          Dictionary(uniq.astype(object), sorted_=True),
                          lengths=jnp.asarray(k, jnp.int32),
                          host=list(codes))
    if inner.is_dictionary:
        # unify element dictionaries pairwise
        merged = args[0].dictionary or Dictionary(np.asarray([], object))
        datas = [args[0].data]
        for a in args[1:]:
            d = a.dictionary or Dictionary(np.asarray([], object))
            merged, ra, rb = Dictionary.unify(merged, d)
            lut_a = jnp.asarray(ra)
            datas = [lut_a[jnp.maximum(x, 0)] if len(ra) else x
                     for x in datas]
            lut_b = jnp.asarray(rb)
            datas.append(lut_b[jnp.maximum(a.data, 0)] if len(rb) else a.data)
        stacked = jnp.stack(jnp.broadcast_arrays(*datas), axis=-1)
        dict_ = merged
    else:
        st = inner.jnp_dtype
        stacked = jnp.stack(
            jnp.broadcast_arrays(*[a.data.astype(st) for a in args]), axis=-1)
        dict_ = None
    ml = max(((k + 7) // 8) * 8, 8)
    pad_shape = stacked.shape[:-1] + (ml - k,)
    stacked = jnp.concatenate(
        [stacked, jnp.zeros(pad_shape, stacked.dtype)], axis=-1)
    if stacked.ndim == 1:
        lengths = jnp.asarray(k, jnp.int32)
    else:
        lengths = jnp.full(stacked.shape[:-1], k, jnp.int32)
    return ColVal(out_dtype, stacked, _and_validity(args), dict_,
                  lengths=lengths)


register("array", _resolve_array_ctor, _array_ctor_exec)


def _array_arg(a: ColVal):
    if not a.dtype.is_array:
        raise TypeError_("Expected an Array argument")
    return a


def _resolve_arr_len(ts):
    if ts and ts[0].is_array:
        return dt.UInt64.with_nullable(ts[0].nullable)
    return dt.UInt64.with_nullable(ts[0].nullable)


_string_length_exec = FUNCTIONS["length"]._execute


def _length_exec(args, out_dtype):
    a = args[0]
    if dt.is_map(a.dtype) and a.sub is not None:
        return ColVal(out_dtype, a.sub[0].lengths.astype(jnp.uint64),
                      _and_validity(args))
    if a.dtype.is_array:
        return ColVal(out_dtype, a.lengths.astype(jnp.uint64),
                      _and_validity(args))
    return _string_length_exec(args, out_dtype)


register("length", _resolve_arr_len, _length_exec, case_insensitive=True)


def _array_element_exec(args, out_dtype):
    a, i = args
    if dt.is_map(a.dtype):
        return _map_element(a, i, out_dtype)
    _array_arg(a)
    idx = i.data.astype(jnp.int64)
    lens = a.lengths.astype(jnp.int64)
    # 1-based; negative counts from the end (reference semantics)
    pos = jnp.where(idx > 0, idx - 1, lens + idx)
    ok = (pos >= 0) & (pos < lens)
    pos_c = jnp.clip(pos, 0, max(a.data.shape[-1] - 1, 0)).astype(jnp.int32)
    if a.data.ndim == 1:           # constant array
        data = a.data[pos_c]
    else:
        data = jnp.take_along_axis(a.data, pos_c[..., None], axis=-1)[..., 0]
    # out-of-range default: '' for strings (code -1 decodes to ''), 0 else
    default = jnp.asarray(-1, data.dtype) if a.dtype.is_dictionary \
        else jnp.zeros((), data.dtype)
    data = jnp.where(ok, data, default)
    return ColVal(out_dtype, data, _and_validity(args), a.dictionary)


def _resolve_array_element(ts):
    if dt.is_map(ts[0]):
        return dt.map_inner(ts[0])[1]
    return dt.array_inner(ts[0])


register("arrayElement", _resolve_array_element, _array_element_exec)


def _member_eq(a: ColVal, v: ColVal):
    """Element-vs-needle equality matrix for one has() member pair."""
    if a.dtype.is_dictionary or (a.dictionary is not None):
        ca, cb, merged = _string_codes_common(
            ColVal(dt.String, a.data, None, a.dictionary),
            ColVal(dt.String, v.data, None, v.dictionary))
        return ca == cb[..., None] if getattr(cb, "ndim", 0) else ca == cb
    return a.data == v.data[..., None] if getattr(v.data, "ndim", 0) \
        else a.data == v.data


def _has_exec(args, out_dtype):
    a, v = args
    _array_arg(a)
    if a.sub is not None:
        # array-of-tuples composite (struct-of-arrays): the needle tuple
        # matches where EVERY member matches in the same slot
        vsubs = v.sub if v.sub is not None else None
        if vsubs is None or len(vsubs) != len(a.sub):
            raise TypeError_("has(): needle arity does not match the "
                             "array's tuple elements")
        eq = None
        for sa, sv in zip(a.sub, vsubs):
            e = _member_eq(sa, sv)
            eq = e if eq is None else (eq & e)
        m = _elem_mask(a.sub[0])
        hit = jnp.any(eq & m, axis=-1)
        return ColVal(out_dtype, hit.astype(jnp.uint8),
                      _and_validity(args))
    m = _elem_mask(a)
    eq = _member_eq(a, v)
    hit = jnp.any(eq & m, axis=-1)
    return ColVal(out_dtype, hit.astype(jnp.uint8), _and_validity(args))


register("has", lambda ts: dt.UInt8.with_nullable(any(t.nullable for t in ts)),
         _has_exec)


def _index_of_exec(args, out_dtype):
    a, v = args
    _array_arg(a)
    m = _elem_mask(a)
    eq = (a.data == (v.data[..., None] if getattr(v.data, "ndim", 0)
                     else v.data)) & m
    ml = a.data.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int64, eq.shape, eq.ndim - 1)
    first = jnp.min(jnp.where(eq, idx, ml), axis=-1)
    return ColVal(out_dtype, jnp.where(first < ml, first + 1, 0)
                  .astype(jnp.uint64), _and_validity(args))


register("indexOf", lambda ts: dt.UInt64.with_nullable(
    any(t.nullable for t in ts)), _index_of_exec)


def _arr_reduce(op, out_type_fn):
    def resolve(ts):
        return out_type_fn(dt.array_inner(ts[0])).with_nullable(ts[0].nullable)

    def ex(args, out_dtype):
        a = _array_arg(args[0])
        m = _elem_mask(a)
        st = dt.remove_nullable(out_dtype).jnp_dtype
        x = a.data.astype(st)
        if op == "sum":
            data = jnp.sum(jnp.where(m, x, jnp.zeros((), st)), axis=-1)
        elif op == "avg":
            s = jnp.sum(jnp.where(m, x, jnp.zeros((), st)), axis=-1)
            data = s / jnp.maximum(a.lengths, 1).astype(st)
        elif op == "min":
            big = jnp.asarray(jnp.iinfo(st).max
                              if jnp.issubdtype(st, jnp.integer)
                              else jnp.inf, st)
            data = jnp.min(jnp.where(m, x, big), axis=-1)
            data = jnp.where(a.lengths > 0, data, jnp.zeros((), st))
        else:
            small = jnp.asarray(jnp.iinfo(st).min
                                if jnp.issubdtype(st, jnp.integer)
                                else -jnp.inf, st)
            data = jnp.max(jnp.where(m, x, small), axis=-1)
            data = jnp.where(a.lengths > 0, data, jnp.zeros((), st))
        return ColVal(out_dtype, data, _and_validity(args))
    return resolve, ex


for _n, _op, _ot in [("arraySum", "sum",
                      lambda t: dt.Float64 if dt.is_float(t) else dt.Int64),
                     ("arrayAvg", "avg", lambda t: dt.Float64),
                     ("arrayMin", "min", lambda t: t),
                     ("arrayMax", "max", lambda t: t)]:
    _r, _e = _arr_reduce(_op, _ot)
    register(_n, _r, _e)


register("emptyArrayInt64", lambda ts: dt.Array(dt.Int64),
         lambda args, t: ColVal(t, jnp.zeros((8,), jnp.int64), None, None,
                                lengths=jnp.asarray(0, jnp.int32)))


# -- hex / unhex / repeat / range / transform --------------------------------


def _const_int(cv) -> "Optional[int]":
    """Host value of a constant ColVal, or None when it's a traced const."""
    if cv.host is not None and not isinstance(cv.host, (list, tuple, str)):
        return int(cv.host)
    try:
        return int(np.asarray(jax.device_get(cv.data)).item())
    except Exception:
        return None


def _hex_host(v, src_t: dt.DType) -> str:
    """Reference hex(): full-width big-endian for ints, raw bytes for
    strings (src/Functions/FunctionsCoding.h)."""
    if isinstance(v, str):
        return v.encode("utf-8", "surrogateescape").hex().upper()
    n = int(v)
    w = dt.remove_nullable(src_t).itemsize
    return n.to_bytes(w, "big", signed=n < 0).hex().upper()


def _exec_hex(args, out_dtype):
    a = args[0]
    if a.dtype.is_dictionary:
        return _string_fn_lut(
            lambda s: _hex_host(s, dt.String), object)(args, out_dtype)
    src = dt.remove_nullable(a.dtype)
    if a.is_const:
        try:
            v = int(np.asarray(jax.device_get(a.data)).item())
        except Exception:        # traced const (under jit): use bounds
            v = None
        if v is not None:
            s = _hex_host(v, src)
            return ColVal(out_dtype, jnp.zeros((), jnp.int32), a.validity,
                          Dictionary(np.asarray([s], object)))
    if a.bounds is not None and (a.bounds[1] - a.bounds[0]) < (1 << 16):
        lo, hi = int(a.bounds[0]), int(a.bounds[1])
        texts = np.asarray([_hex_host(x, src) for x in range(lo, hi + 1)],
                           object)
        uniq, codes = np.unique(texts.astype(str), return_inverse=True)
        idx = jnp.clip(a.data.astype(jnp.int64) - lo, 0, hi - lo)
        lut = jnp.asarray(codes.astype(np.int32))
        return ColVal(out_dtype, lut[idx], a.validity,
                      Dictionary(uniq.astype(object), sorted_=True))
    if not isinstance(a.data, jax.core.Tracer):
        # eager execution: concrete values — stringify on host
        vals = np.asarray(jax.device_get(a.data))
        texts = np.asarray([_hex_host(x, src) for x in vals.tolist()],
                           object)
        uniq, codes = np.unique(texts.astype(str), return_inverse=True)
        return ColVal(out_dtype, jnp.asarray(codes.astype(np.int32)),
                      a.validity, Dictionary(uniq.astype(object),
                                             sorted_=True))
    from ..core.errors import RequiresMaterialization
    raise RequiresMaterialization(
        "hex of unbounded numeric columns requires materialization")


register("hex", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _exec_hex, case_insensitive=True)
register("unhex",
         lambda ts: dt.String.with_nullable(ts[0].nullable),
         lambda args, t: _string_fn_lut(
             lambda s: bytes.fromhex(s).decode("utf-8", "surrogateescape")
             if s else "", object)(args, t),
         case_insensitive=True)
register("bin", lambda ts: dt.String.with_nullable(ts[0].nullable),
         lambda args, t: _string_fn_lut(
             lambda s: "".join(
                 f"{b:08b}" for b in s.encode("utf-8", "surrogateescape")),
             object)(args, t),
         case_insensitive=True)


def _exec_repeat(args, out_dtype):
    n_cv = args[1]
    n = _const_int(n_cv) if n_cv.is_const else None
    if n is None:
        raise NotImplementedError_("repeat() requires a constant count")
    # host-memory governor: the per-unique LUT materializes len(s)*n bytes
    # per dictionary value — a 1M-unique dictionary repeated 1M times is
    # terabytes; raise the catchable limit error instead of dying in the
    # allocator (ref: 01586_columns_pruning expects MEMORY_LIMIT_EXCEEDED)
    a = args[0]
    if a.dictionary is not None and n > 0:
        est = sum(len(str(v)) for v in a.dictionary.values[:1000])
        est = est * max(len(a.dictionary) // max(min(
            len(a.dictionary), 1000), 1), 1) * n
        from ..core.errors import MemoryLimitExceeded
        from ..exec.session import active_session
        s = active_session()
        budget = int(getattr(s.settings, "max_memory_usage", 0) or
                     10_000_000_000) if s is not None else 10_000_000_000
        if est > budget:
            raise MemoryLimitExceeded(
                f"repeat(): estimated {est} bytes of string data exceeds "
                f"max_memory_usage ({budget})")
    return _string_fn_lut(lambda s: s * max(n, 0), object)(args[:1],
                                                           out_dtype)


register("repeat", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _exec_repeat, case_insensitive=True)


def _resolve_range(ts):
    return dt.Array(dt.UInt64)


def _exec_range(args, out_dtype):
    a = args[0]
    if len(args) > 1:
        raise NotImplementedError_("range(start, end[, step]) with multiple "
                                   "arguments is not supported yet")
    hi = None
    if a.is_const:
        hi = _const_int(a)
    if hi is None and a.bounds is not None:
        hi = int(a.bounds[1])
    if hi is None or hi > (1 << 16):
        raise NotImplementedError_("range() needs a bounded length")
    L = max(hi, 1)
    n = a.data.astype(jnp.int32)
    elems = jnp.arange(L, dtype=jnp.uint64)
    if a.is_const:
        return ColVal(out_dtype, elems[:max(hi, 0)], None,
                      lengths=jnp.asarray(max(hi, 0), jnp.int32))
    cap = a.data.shape[0]
    mat = jnp.broadcast_to(elems[None, :], (cap, L))
    lens = jnp.clip(n, 0, L)
    mat = jnp.where(jnp.arange(L, dtype=jnp.int32)[None, :] < lens[:, None],
                    mat, jnp.uint64(0))
    return ColVal(out_dtype, mat, a.validity, lengths=lens)


register("range", _resolve_range, _exec_range, case_insensitive=True)


def _exec_transform(args, out_dtype):
    """transform(x, [from...], [to...], default) — literal arrays become a
    chain of where()s (src/Functions/transform.cpp)."""
    x, frm, to = args[0], args[1], args[2]
    dflt = args[3] if len(args) > 3 else None
    if not (frm.is_const and to.is_const):
        raise NotImplementedError_("transform() requires constant arrays")

    def host_elems(cv):
        if isinstance(cv.host, list):
            return cv.host
        return list(np.asarray(jax.device_get(cv.data))[
            :int(jax.device_get(cv.lengths))])
    f_np = host_elems(frm)
    t_np = host_elems(to)
    if x.dtype.is_dictionary:
        # from-values are strings: translate them into x's dictionary codes
        # (codes absent from x never match)
        if frm.dictionary is None:
            raise TypeError_("transform() from-array must be strings for a "
                             "String first argument")
        fstr = [str(frm.dictionary.values[int(c)]) for c in f_np]
        xd = x.dictionary
        f_np = [xd.lookup(s) if xd is not None else -1 for s in fstr]
    if to.dictionary is not None:
        t_vals = [str(to.dictionary.values[int(c)]) for c in t_np]
    else:
        t_vals = list(t_np)
    if out_dtype.is_dictionary:
        d_val = ""
        if dflt is not None and dflt.host is not None:
            d_val = str(dflt.host)
        elif dflt is not None and dflt.dictionary is not None:
            d_val = str(dflt.dictionary.values[int(jax.device_get(
                dflt.data))])
        uniq, codes = np.unique(np.asarray([str(v) for v in t_vals]
                                           + [d_val], object).astype(str),
                                return_inverse=True)
        out = jnp.full(x.data.shape, int(codes[-1]), jnp.int32)
        for fv, c in zip(f_np, codes[:-1]):
            out = jnp.where(x.data == jnp.asarray(fv, x.data.dtype),
                            jnp.int32(int(c)), out)
        return ColVal(out_dtype, out, x.validity,
                      Dictionary(uniq.astype(object), sorted_=True))
    dv = dflt.data if dflt is not None else x.data
    out = jnp.asarray(dv, out_dtype.jnp_dtype) if dflt is not None \
        and dflt.is_const else dv.astype(out_dtype.jnp_dtype)
    if getattr(out, "ndim", 0) == 0:
        out = jnp.full(x.data.shape, out, out_dtype.jnp_dtype)
    for fv, tv in zip(f_np, t_np):
        out = jnp.where(x.data == jnp.asarray(fv, x.data.dtype),
                        jnp.asarray(tv, out_dtype.jnp_dtype), out)
    return ColVal(out_dtype, out, x.validity)


def _resolve_transform(ts):
    to_t = ts[2]
    inner = dt.parse_type_name(to_t.name[len("Array("):-1]) \
        if to_t.is_array else to_t
    return inner.with_nullable(ts[0].nullable)


register("transform", _resolve_transform, _exec_transform,
         case_insensitive=True)



# -- misc compat: toLowCardinality / sleep / rand / arraySort / arrayReduce --

register("toLowCardinality", lambda ts: ts[0],
         lambda args, t: args[0])       # dictionary layout is our default
register("materialize", lambda ts: ts[0], lambda args, t: args[0])
register("ignore", lambda ts: dt.UInt8,
         lambda args, t: ColVal(t, jnp.zeros((), jnp.uint8), None))
register("sleep", lambda ts: dt.UInt8,
         lambda args, t: ColVal(t, jnp.zeros((), jnp.uint8), None))
register("sleepEachRow", lambda ts: dt.UInt8,
         lambda args, t: ColVal(t, jnp.zeros((), jnp.uint8), None))


def _exec_rand(bits: int):
    def ex(args, out_dtype):
        # per-row splitmix64 of (row index, query nonce): deterministic
        # within a query plan, different across compiles — the reference's
        # rand() contract (pseudo-random per row; no distributional tests)
        import random as _pyrandom
        nonce = _pyrandom.getrandbits(63)
        cap = args[0].data.shape[0] if args and getattr(
            args[0].data, "ndim", 0) else 1 << 10
        from ..ops import hash_ops
        h = hash_ops.hash_columns(
            [jnp.arange(cap, dtype=jnp.uint64) + jnp.uint64(nonce)])
        if bits == 32:
            return ColVal(out_dtype, (h & jnp.uint64(0xFFFFFFFF))
                          .astype(jnp.uint32), None)
        return ColVal(out_dtype, h, None)
    return ex


register("rand", lambda ts: dt.UInt32, _exec_rand(32), case_insensitive=True)
register("rand32", lambda ts: dt.UInt32, _exec_rand(32))
register("rand64", lambda ts: dt.UInt64, _exec_rand(64))
register("randConstant", lambda ts: dt.UInt32,
         lambda args, t: ColVal(t, jnp.asarray(
             np.uint32(np.random.randint(0, 2**32, dtype=np.uint64))), None))


def _exec_array_sort(args, out_dtype):
    a = args[0]
    if a.dtype.is_dictionary:
        raise NotImplementedError_("arraySort of String arrays is not "
                                   "supported yet")
    mat = a.data if getattr(a.data, "ndim", 0) == 2 else a.data[None, :]
    L = mat.shape[-1]
    lens = a.lengths
    if getattr(lens, "ndim", 0) == 0:
        lens_b = jnp.broadcast_to(jnp.asarray(lens, jnp.int32),
                                  (mat.shape[0],))
    else:
        lens_b = lens
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    pad = idx >= lens_b[:, None]
    if jnp.issubdtype(mat.dtype, jnp.integer):
        big = jnp.asarray(jnp.iinfo(mat.dtype).max, mat.dtype)
    else:
        big = jnp.asarray(jnp.inf, mat.dtype)
    out = jax.lax.sort(jnp.where(pad, big, mat), dimension=-1)
    out = jnp.where(pad, jnp.zeros((), mat.dtype), out)
    if getattr(a.data, "ndim", 0) != 2:
        out = out[0]
    return ColVal(out_dtype, out, a.validity, None, lengths=a.lengths)


register("arraySort", lambda ts: ts[0], _exec_array_sort)


def _exec_array_rsort(args, out_dtype):
    """arrayReverseSort: sort ascending with pads at +inf, then reverse the
    VALID prefix per row (gather by reversed index within length)."""
    a = args[0]
    if a.dtype.is_dictionary:
        raise NotImplementedError_("arrayReverseSort of String arrays is "
                                   "not supported yet")
    mat = a.data if getattr(a.data, "ndim", 0) == 2 else a.data[None, :]
    L = mat.shape[-1]
    lens = a.lengths
    if getattr(lens, "ndim", 0) == 0:
        lens_b = jnp.broadcast_to(jnp.asarray(lens, jnp.int32),
                                  (mat.shape[0],))
    else:
        lens_b = lens
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    pad = idx >= lens_b[:, None]
    if jnp.issubdtype(mat.dtype, jnp.integer):
        big = jnp.asarray(jnp.iinfo(mat.dtype).max, mat.dtype)
    else:
        big = jnp.asarray(jnp.inf, mat.dtype)
    asc = jax.lax.sort(jnp.where(pad, big, mat), dimension=-1)
    src_idx = jnp.clip(lens_b[:, None] - 1 - idx, 0, L - 1)
    out = jnp.take_along_axis(asc, src_idx, axis=-1)
    out = jnp.where(pad, jnp.zeros((), mat.dtype), out)
    if getattr(a.data, "ndim", 0) != 2:
        out = out[0]
    return ColVal(out_dtype, out, a.validity, None, lengths=a.lengths)


register("arrayReverseSort", lambda ts: ts[0], _exec_array_rsort)


_ARRAY_REDUCE_OPS = {"sum": "arraySum", "min": "arrayMin", "max": "arrayMax",
                     "avg": "arrayAvg"}


def _exec_array_reduce(args, out_dtype):
    name_cv = args[0]
    if name_cv.dictionary is None:
        raise TypeError_("arrayReduce expects a constant aggregate name")
    agg = str(name_cv.host if name_cv.host is not None
              else name_cv.dictionary.values[0]).lower()
    arr = args[1]
    if agg == "count":
        lens = arr.lengths
        data = lens.astype(jnp.uint64) if getattr(lens, "ndim", 0)             else jnp.asarray(lens, jnp.uint64)
        return ColVal(out_dtype, data, arr.validity)
    mapped = _ARRAY_REDUCE_OPS.get(agg)
    if mapped is None:
        raise NotImplementedError_(f"arrayReduce('{agg}', ...) is not "
                                   "supported yet")
    return get(mapped).execute([arr], out_dtype)


register("arrayReduce",
         lambda ts: dt.Float64,
         _exec_array_reduce)



# -- formatDateTime + JSON extraction ----------------------------------------

_CH_STRFTIME = {
    "%F": "%Y-%m-%d", "%T": "%H:%M:%S", "%D": "%m/%d/%y", "%R": "%H:%M",
}


def _exec_format_datetime(args, out_dtype):
    """formatDateTime(t, 'fmt') via bounded-domain enumeration (the same
    device-gather LUT scheme as toString of bounded ints).  Reference:
    src/Functions/formatDateTime.cpp."""
    import datetime as _dt_mod
    a, f = args[0], args[1]
    if f.dictionary is None:
        raise TypeError_("formatDateTime needs a constant format string")
    fmt = str(f.host if f.host is not None else f.dictionary.values[0])
    for ch_spec, py_spec in _CH_STRFTIME.items():
        fmt = fmt.replace(ch_spec, py_spec)
    src_t = dt.remove_nullable(a.dtype)
    is_date = src_t.name in ("Date", "Date32")

    def render(v: int) -> str:
        if is_date:
            d = _dt_mod.date(1970, 1, 1) + _dt_mod.timedelta(days=int(v))
            return d.strftime(fmt)
        return _dt_mod.datetime.fromtimestamp(
            int(v), _dt_mod.timezone.utc).strftime(fmt)

    # quantize by the format's finest-grained specifier: a date-only format
    # over a DateTime column enumerates DAYS, so unbounded columns still
    # render (no more dependence on part minmax for the common formats)
    if is_date:
        gran = 1
    elif "%S" in fmt or "%s" in fmt:
        gran = 1
    elif "%M" in fmt:
        gran = 60
    elif any(x in fmt for x in ("%H", "%I", "%l", "%p", "%k")):
        gran = 3600
    else:
        gran = 86400

    b = a.bounds
    if b is None and a.is_const:
        v = _const_int(a)
        if v is not None:
            b = (v, v)
    if b is None:
        # full epoch domain, quantized: Date = 0..65535 days; DateTime =
        # 0..2^32 seconds -> ~49.7k days / 1.2M hours
        b = (0, 65535) if is_date else (0, (1 << 32) - 1)
    qlo, qhi = int(b[0]) // gran, int(b[1]) // gran
    if qhi - qlo >= (1 << 21):
        raise NotImplementedError_(
            "formatDateTime needs a bounded time domain for "
            "second/minute-granular formats (part minmax)")
    texts = np.asarray([render(x * gran) for x in range(qlo, qhi + 1)],
                       object)
    uniq, codes = np.unique(texts.astype(str), return_inverse=True)
    lut = jnp.asarray(codes.astype(np.int32))
    idx = jnp.clip(a.data.astype(jnp.int64) // gran - qlo, 0, qhi - qlo)
    return ColVal(out_dtype, lut[idx], a.validity,
                  Dictionary(uniq.astype(object), sorted_=True))


register("formatDateTime",
         lambda ts: dt.String.with_nullable(ts[0].nullable),
         _exec_format_datetime, case_insensitive=True)


def _json_lut(extract):
    """JSON functions run as dictionary LUTs (host json parse per distinct
    document — JSON blobs are dictionary values like any string)."""
    import json as _json

    def host(s: str):
        try:
            doc = _json.loads(s) if s else None
        except Exception:
            doc = None
        return extract(doc)
    return host


def _json_path(doc, keys):
    for k in keys:
        if isinstance(doc, dict):
            doc = doc.get(k)
        elif isinstance(doc, list) and isinstance(k, int)                 and 1 <= k <= len(doc):
            doc = doc[k - 1]           # CH JSON indexing is 1-based
        else:
            return None
    return doc


def _exec_json(kind):
    def ex(args, out_dtype):
        keys = []
        for k in args[1:]:
            if k.dictionary is not None:
                keys.append(str(k.host if k.host is not None
                                else k.dictionary.values[0]))
            else:
                kv = _const_int(k)
                if kv is None:
                    raise TypeError_("JSON path arguments must be constant")
                keys.append(kv)

        def extract(doc):
            v = _json_path(doc, keys)
            if kind == "has":
                return np.uint8(v is not None)
            if kind == "length":
                return np.uint64(len(v)) if isinstance(v, (list, dict))                     else np.uint64(0)
            if kind == "int":
                try:
                    return np.int64(int(v))
                except (TypeError, ValueError):
                    return np.int64(0)
            if kind == "float":
                try:
                    return np.float64(float(v))
                except (TypeError, ValueError):
                    return np.float64(0.0)
            if kind == "bool":
                return np.uint8(bool(v)) if isinstance(v, bool)                     else np.uint8(0)
            if kind == "string":
                if isinstance(v, str):
                    return v
                return "" if v is None else _json_dump(v)
            return "" if v is None else _json_dump(v)   # raw

        np_t = {"has": np.uint8, "length": np.uint64, "int": np.int64,
                "float": np.float64, "bool": np.uint8}.get(kind, object)
        return _string_fn_lut(_json_lut(extract), np_t)(args[:1], out_dtype)
    return ex


def _json_dump(v):
    import json as _json
    return _json.dumps(v, separators=(",", ":"))


for _nm, _kind, _rt in [
        ("JSONHas", "has", dt.UInt8),
        ("JSONLength", "length", dt.UInt64),
        ("JSONExtractInt", "int", dt.Int64),
        ("JSONExtractUInt", "int", dt.Int64),
        ("JSONExtractFloat", "float", dt.Float64),
        ("JSONExtractBool", "bool", dt.UInt8),
        ("JSONExtractString", "string", dt.String),
        ("JSONExtractRaw", "raw", dt.String),
        ("simpleJSONExtractString", "string", dt.String),
        ("simpleJSONExtractInt", "int", dt.Int64),
        ("simpleJSONHas", "has", dt.UInt8),
]:
    register(_nm, (lambda rt: lambda ts: rt.with_nullable(ts[0].nullable))(
        _rt), _exec_json(_kind))



# -- Tuple values -------------------------------------------------------------
# tuple(a, b, ...) evaluates to a composite ColVal carrying sub-ColVals
# (ColumnTuple analog); comparisons expand lexicographically; tupleElement
# selects a member.  Tuples exist at evaluation time and in results (not as
# storage columns yet).

def _resolve_tuple(ts):
    return dt.Tuple(ts)


def _exec_tuple(args, out_dtype):
    cap = max((a.data.shape[0] for a in args
               if getattr(a.data, "ndim", 0)), default=1)
    return ColVal(out_dtype, jnp.zeros((), jnp.int8), None, sub=list(args))


register("tuple", _resolve_tuple, _exec_tuple, case_insensitive=True)


def _resolve_tuple_element(ts):
    if not dt.is_tuple(ts[0]):
        raise TypeError_("tupleElement expects a Tuple")
    return dt.parse_type_name(ts[0].tuple_types[0])   # refined at exec


def _exec_tuple_element(args, out_dtype):
    t, idx = args
    if t.sub is None:
        raise TypeError_("tupleElement expects a Tuple value")
    i = _const_int(idx)
    if i is None or not (1 <= i <= len(t.sub)):
        raise TypeError_("tupleElement index must be a constant in range")
    return t.sub[i - 1]


register("tupleElement", _resolve_tuple_element, _exec_tuple_element,
         case_insensitive=True)


def _tuple_cmp(op_name, a, b, out_dtype):
    """Lexicographic tuple comparison via pairwise expansion."""
    if len(a.sub) != len(b.sub):
        raise TypeError_("Cannot compare tuples of different sizes")
    eq = get("equals")
    u8 = dt.UInt8
    if op_name in ("equals", "notEquals"):
        acc = None
        for x, y in zip(a.sub, b.sub):
            e = eq.execute([x, y], u8)
            acc = e if acc is None else ColVal(
                u8, acc.data.astype(jnp.bool_) & e.data.astype(jnp.bool_),
                _and_validity([acc, e]))
        data = acc.data.astype(jnp.bool_)
        if op_name == "notEquals":
            data = jnp.logical_not(data)
        return ColVal(out_dtype, data.astype(jnp.uint8), acc.validity)
    strict = get("less" if op_name in ("less", "lessOrEquals") else "greater")
    result = None                       # running lexicographic verdict
    undecided = None
    for x, y in zip(a.sub, b.sub):
        lt = strict.execute([x, y], u8).data.astype(jnp.bool_)
        e = eq.execute([x, y], u8).data.astype(jnp.bool_)
        if result is None:
            result = lt
            undecided = e
        else:
            result = result | (undecided & lt)
            undecided = undecided & e
    if op_name in ("lessOrEquals", "greaterOrEquals"):
        result = result | undecided
    return ColVal(out_dtype, result.astype(jnp.uint8), None)


# -- Map values ----------------------------------------------------------------
# Map(K, V) evaluates to a composite ColVal with two Array sub-ColVals
# (keys, values) sharing per-row lengths — the struct-of-arrays expression
# of the reference's ColumnMap = Array(Tuple(K, V))
# (src/Columns/ColumnMap.h).  Lookup (m[k]) is a masked equality scan over
# the padded keys matrix + take_along_axis on values: one fused whole-column
# op, no per-row host work.

def _resolve_map_ctor(ts):
    if not ts:
        return dt.Map(dt.String, dt.String)
    if len(ts) % 2:
        raise TypeError_("map() expects an even number of arguments")
    kt = ts[0]
    vt = ts[1]
    for i in range(2, len(ts), 2):
        kt = dt.common_supertype(kt, ts[i])
        vt = dt.common_supertype(vt, ts[i + 1])
    return dt.Map(kt, vt)


def _exec_map_ctor(args, out_dtype):
    kt, vt = dt.map_inner(out_dtype)
    arr = get("array")
    keys = arr.execute(args[0::2], dt.Array(kt))
    vals = arr.execute(args[1::2], dt.Array(vt))
    return ColVal(out_dtype, jnp.zeros((), jnp.int8), None,
                  sub=[keys, vals])


register("map", _resolve_map_ctor, _exec_map_ctor, case_insensitive=True)


def _resolve_map_from_arrays(ts):
    if len(ts) != 2 or not ts[0].is_array or not ts[1].is_array:
        raise TypeError_("mapFromArrays expects two Array arguments")
    return dt.Map(dt.array_inner(ts[0]), dt.array_inner(ts[1]))


def _exec_map_from_arrays(args, out_dtype):
    return ColVal(out_dtype, jnp.zeros((), jnp.int8),
                  _and_validity(args), sub=[args[0], args[1]])


register("mapFromArrays", _resolve_map_from_arrays, _exec_map_from_arrays)


def _map_arg(a: ColVal):
    if not dt.is_map(a.dtype) or a.sub is None:
        raise TypeError_("Expected a Map argument")
    return a


def _resolve_map_keys(ts):
    if not dt.is_map(ts[0]):
        raise TypeError_("mapKeys expects a Map")
    return dt.Array(dt.map_inner(ts[0])[0])


def _resolve_map_values(ts):
    if not dt.is_map(ts[0]):
        raise TypeError_("mapValues expects a Map")
    return dt.Array(dt.map_inner(ts[0])[1])


register("mapKeys", _resolve_map_keys,
         lambda args, out_dtype: _map_arg(args[0]).sub[0])
register("mapValues", _resolve_map_values,
         lambda args, out_dtype: _map_arg(args[0]).sub[1])


def _exec_map_contains(args, out_dtype):
    m = _map_arg(args[0])
    return get("has").execute([m.sub[0], args[1]], out_dtype)


register("mapContains", lambda ts: dt.UInt8, _exec_map_contains)


def _map_element(m: ColVal, k: ColVal, out_dtype):
    """m[k]: value of the FIRST matching key, default value when absent
    (reference: ColumnMap element access returns the value type's default
    for missing keys, not NULL)."""
    keys, vals = m.sub[0], m.sub[1]
    mask = _elem_mask(keys)
    if keys.dtype.is_dictionary:
        ca, cb, _ = _string_codes_common(
            ColVal(dt.String, keys.data, None, keys.dictionary),
            ColVal(dt.String, k.data, None, k.dictionary))
        eq = ca == (cb[..., None] if getattr(cb, "ndim", 0) else cb)
    else:
        kd = k.data.astype(keys.data.dtype)
        eq = keys.data == (kd[..., None] if getattr(kd, "ndim", 0) else kd)
    eq = eq & mask
    ml = keys.data.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, eq.shape, eq.ndim - 1)
    first = jnp.min(jnp.where(eq, idx, ml), axis=-1)
    found = first < ml
    pos = jnp.clip(first, 0, max(ml - 1, 0))
    vdata = vals.data
    if vdata.ndim == 1:                    # constant values row
        data = vdata[pos]
    else:
        # constant key against per-row values: broadcast the position
        posb = jnp.broadcast_to(pos, vdata.shape[:-1]) \
            if getattr(pos, "ndim", 0) < vdata.ndim - 1 else pos
        data = jnp.take_along_axis(vdata, posb[..., None], axis=-1)[..., 0]
    default = jnp.asarray(-1, data.dtype) if vals.dtype.is_dictionary \
        else jnp.zeros((), data.dtype)
    data = jnp.where(found, data, default)
    return ColVal(out_dtype, data, _and_validity([m, k]), vals.dictionary)


register("mapElement",
         lambda ts: dt.map_inner(ts[0])[1],
         lambda args, out_dtype: _map_element(
             _map_arg(args[0]), args[1], out_dtype))


def _resolve_finalize_agg(ts):
    st = dt.remove_nullable(ts[0])
    if not dt.is_agg_state(st):
        raise TypeError_("finalizeAggregation expects an "
                         "AggregateFunction(...) argument")
    from .aggregates import make_merge_for_dtype
    return make_merge_for_dtype(st).result_type()


def _exec_finalize_agg(args, out_dtype):
    """Per-row state -> value (each row is its own group; finalize is
    elementwise over state columns).  Reference:
    src/Functions/finalizeAggregation.cpp."""
    a = args[0]
    st = dt.remove_nullable(a.dtype)
    from .aggregates import make_merge_for_dtype, unpack_state_columns
    m = make_merge_for_dtype(st)
    adata = a.data
    const_row = getattr(adata, "ndim", 0) == 1   # one constant state row
    if const_row:
        adata = adata[None, :]
    states = unpack_state_columns(adata, m.spec)
    res = m.finalize(states)
    data, validity = res[0], res[1]
    if const_row:
        data = data[0]
        validity = None if validity is None else validity[0]
    if a.validity is not None:
        av = a.validity.astype(jnp.uint8)
        validity = av if validity is None \
            else (validity.astype(jnp.uint8) & av)
    return ColVal(out_dtype, data, validity, None)


register("finalizeAggregation", _resolve_finalize_agg, _exec_finalize_agg,
         case_insensitive=True)


# Unified CAST machine + parametric constructors (registers _cast, toDate,
# toDateTime, toUUID, toIPv4/6, IPv4 helpers) — keep last so it can reuse
# everything above.
from . import conv as _conv_module  # noqa: E402,F401

# Extended registrations (math/bit/string/URL/IP/date/misc families) — keep
# after conv so they can reference the cast machinery.
from . import functions_ext as _functions_ext  # noqa: E402,F401
