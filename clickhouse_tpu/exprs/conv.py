"""Unified CAST machine + parametric type constructors.

One generic `_cast` scalar function covers every (source, target) type pair
— the analog of the reference's FunctionCast dispatch
(src/Functions/FunctionsConversion.cpp, ~13k LoC of pairwise templates)
collapsed into a single dtype-driven dispatcher.  Parametric constructors
(toDecimal32(x, S), toDateTime64(x, S), toFixedString(s, N)) are bound by
the analyzer as `_cast` calls whose result dtype carries the parameters.

Device data is always integer/float; anything involving text goes through
host dictionary LUTs at trace time (the engine's standard string strategy).
"""
from __future__ import annotations

import datetime
import decimal

import jax.numpy as jnp
import numpy as np

from ..core import dtypes as dt
from ..core import typed
from ..core.column import Dictionary
from ..core.errors import NotImplementedError_, TypeError_
from .expr import ColVal
from .functions import _and_validity, register

__all__ = ["cast_exec", "literal_typed_target"]


def _pow10_i64(n: int):
    """10^n as int64, saturated at 10^18 (the Decimal64 physical cap)."""
    return jnp.int64(10 ** min(max(int(n), 0), 18))


def _dict_lut(a: ColVal, host_fn, out_np_dtype):
    """LUT over the argument's dictionary values (trace-time host work)."""
    vals = a.dictionary.values if a.dictionary else np.asarray([], object)
    lut_np = np.asarray([host_fn(str(v)) for v in vals] or [host_fn("")],
                        dtype=out_np_dtype)
    lut = jnp.asarray(lut_np)
    return lut[jnp.maximum(a.data, 0)]


def _retype_dictionary(a: ColVal, out_dtype: dt.DType, host_fn) -> ColVal:
    """String-ish -> string-ish cast: transform dictionary values on host,
    keep device codes."""
    vals = a.dictionary.values if a.dictionary else np.asarray([], object)
    new_vals = np.asarray([host_fn(str(v)) for v in vals], object)
    return ColVal(out_dtype, a.data, a.validity, Dictionary(new_vals))


def _num(a: ColVal):
    if a.dtype.is_dictionary:
        raise TypeError_("Expected a non-string argument")
    return a.data


def _dec_parse(s: str, scale: int) -> int:
    try:
        return typed.decimal_to_int(s.strip().rstrip('\x00'), scale)
    except (decimal.InvalidOperation, ValueError):
        return 0


def _date_parse(s: str) -> int:
    try:
        return typed._parse_date(s.rstrip('\x00'))
    except (ValueError, TypeError):
        return 0


def _datetime_parse(s: str) -> int:
    try:
        return typed._parse_datetime(s.rstrip('\x00'))
    except (ValueError, TypeError):
        return 0


def cast_exec(args, out_dtype: dt.DType) -> ColVal:
    a = args[0]
    src = dt.remove_nullable(a.dtype)
    dst = dt.remove_nullable(out_dtype)
    v = _and_validity(args)

    # identical physical+logical type: retag only
    if src == dst:
        return ColVal(out_dtype, a.data, v, a.dictionary, lengths=a.lengths)

    # ---- to Decimal --------------------------------------------------------
    if dt.is_decimal(dst):
        S = dst.decimal_scale
        if dt.is_decimal(src):
            d = S - src.decimal_scale
            if d >= 0:
                data = a.data.astype(jnp.int64) * _pow10_i64(d)
            else:
                q = _pow10_i64(-d)
                x = a.data.astype(jnp.int64)
                half = q // 2
                data = jnp.sign(x) * ((jnp.abs(x) + half) // q)
            return ColVal(out_dtype, data, v)
        if src.is_dictionary:
            data = _dict_lut(a, lambda s: _dec_parse(s, S), np.int64)
            return ColVal(out_dtype, data, v)
        if dt.is_float(src):
            data = jnp.round(a.data.astype(jnp.float64) * float(10 ** S)) \
                .astype(jnp.int64)
            return ColVal(out_dtype, data, v)
        data = a.data.astype(jnp.int64) * _pow10_i64(S)
        return ColVal(out_dtype, data, v)

    # ---- to DateTime64 -----------------------------------------------------
    if dt.is_datetime64(dst):
        S = dst.decimal_scale
        if src.is_dictionary:
            data = _dict_lut(a, lambda s: typed._parse_datetime64(s, S),
                             np.int64)
        elif dt.is_datetime64(src):
            d = S - src.decimal_scale
            data = a.data.astype(jnp.int64) * _pow10_i64(max(d, 0))
            if d < 0:
                data = a.data.astype(jnp.int64) // _pow10_i64(-d)
        elif src.name == "Date":
            data = a.data.astype(jnp.int64) * jnp.int64(86400) \
                * _pow10_i64(S)
        else:   # DateTime / numeric seconds
            data = a.data.astype(jnp.int64) * _pow10_i64(S)
        return ColVal(out_dtype, data, v)

    # ---- to Date / DateTime ------------------------------------------------
    if dst.name == "Date":
        if src.is_dictionary:
            data = _dict_lut(a, _date_parse, np.int32)
        elif src.name == "DateTime":
            data = jnp.floor_divide(a.data.astype(jnp.int64),
                                    86400).astype(jnp.int32)
        elif dt.is_datetime64(src):
            tick = 86400 * 10 ** src.decimal_scale
            data = jnp.floor_divide(a.data.astype(jnp.int64),
                                    tick).astype(jnp.int32)
        else:
            data = a.data.astype(jnp.int32)
        return ColVal(out_dtype, data, v)
    if dst.name == "DateTime":
        if src.is_dictionary:
            data = _dict_lut(a, _datetime_parse, np.int64)
        elif src.name == "Date":
            data = a.data.astype(jnp.int64) * jnp.int64(86400)
        elif dt.is_datetime64(src):
            data = jnp.floor_divide(a.data.astype(jnp.int64),
                                    _pow10_i64(src.decimal_scale))
        else:
            data = a.data.astype(jnp.int64)
        return ColVal(out_dtype, data, v)

    # ---- to Enum -----------------------------------------------------------
    if dt.is_enum(dst):
        if src.is_dictionary:
            by_name = dict(dst.enum_values)

            def look(s):
                if s in by_name:
                    return by_name[s]
                raise TypeError_(f"Unknown element '{s}' for {dst.name}")
            data = _dict_lut(a, look, dst.np_dtype)
            return ColVal(out_dtype, data, v)
        return ColVal(out_dtype, a.data.astype(dst.jnp_dtype), v)

    # ---- to FixedString(N) -------------------------------------------------
    if dst.fixed_len is not None:
        n = dst.fixed_len
        if not src.is_dictionary:
            raise TypeError_("toFixedString expects a string argument")

        def pad(s):
            if len(s) > n:
                raise TypeError_(f"String '{s}' too long for "
                                 f"FixedString({n})")
            return s + "\x00" * (n - len(s))
        return _retype_dictionary(a, out_dtype, pad)

    # ---- to UUID / IPv6 (dictionary identity types) ------------------------
    if dst.name in ("UUID", "IPv6"):
        if not src.is_dictionary:
            raise TypeError_(f"Cannot cast {src} to {dst.name}")
        return ColVal(out_dtype, a.data, v, a.dictionary)

    # ---- to IPv4 -----------------------------------------------------------
    if dst.name == "IPv4":
        if src.is_dictionary:
            data = _dict_lut(a, typed._parse_ipv4, np.uint32)
            return ColVal(out_dtype, data, v)
        return ColVal(out_dtype, a.data.astype(jnp.uint32), v)

    # ---- to String ---------------------------------------------------------
    if dst.is_dictionary:
        if src.is_dictionary:
            return ColVal(out_dtype, a.data, v, a.dictionary)
        if dt.is_enum(src):
            codes = {val: i for i, (_, val) in enumerate(src.enum_values)}
            names = np.asarray([k for k, _ in src.enum_values], object)
            lo = min(codes) if codes else 0
            span = (max(codes) - lo + 1) if codes else 1
            lut_np = np.zeros(span, np.int32)
            for val, i in codes.items():
                lut_np[val - lo] = i
            lut = jnp.asarray(lut_np)
            idx = jnp.clip(a.data.astype(jnp.int64) - lo, 0, span - 1)
            return ColVal(out_dtype, lut[idx].astype(jnp.int32), v,
                          Dictionary(names))
        import jax as _jax
        if a.is_const and not isinstance(a.data, _jax.core.Tracer):
            raw = np.asarray(a.data).item()     # concrete const: host fold
            text = _const_to_text(src, raw)
            return ColVal(out_dtype, jnp.zeros((), jnp.int32), v,
                          Dictionary(np.asarray([text], object)))
        if a.bounds is not None and not dt.is_float(src):
            # bounded integer domain (interval analysis): enumerate the
            # range as a dictionary and emit a gather — device-side
            # stringification without per-row host work
            lo, hi = int(a.bounds[0]), int(a.bounds[1])
            if hi - lo < (1 << 16):
                texts = np.asarray(
                    [_const_to_text(src, x) for x in range(lo, hi + 1)],
                    object)
                codes = (a.data.astype(jnp.int64) - lo).astype(jnp.int32)
                codes = jnp.clip(codes, 0, hi - lo)
                return ColVal(out_dtype, codes, v, Dictionary(texts))
        if not isinstance(a.data, _jax.core.Tracer):
            # eager execution: values are concrete — stringify on host
            return _materialize_strings(src, a, v, out_dtype)
        from ..core.errors import RequiresMaterialization
        raise RequiresMaterialization(
            "toString of non-constant numeric columns requires "
            "materialization; use it at the top level of SELECT")

    # ---- array -> array (element cast) -------------------------------------
    if dst.is_array and src.is_array:
        inner_d = dt.array_inner(dst)
        if not inner_d.is_dictionary and a.data is not None \
                and getattr(a.data, "ndim", 0) in (1, 2):
            return ColVal(out_dtype, a.data.astype(inner_d.jnp_dtype), v,
                          lengths=a.lengths)

    # ---- to numeric / bool -------------------------------------------------
    if dst.name == "Bool":
        data = (_cast_to_numeric(a, src, dt.Float64) != 0)
        return ColVal(out_dtype, data.astype(jnp.uint8), v)
    if dt.is_numeric(dst):
        return ColVal(out_dtype, _cast_to_numeric(a, src, dst), v)

    raise NotImplementedError_(f"CAST from {src} to {dst} not supported")


def _cast_to_numeric(a: ColVal, src: dt.DType, dst: dt.DType):
    target = dst.jnp_dtype
    if dt.is_decimal(src):
        if dt.is_float(dst):
            return (a.data.astype(jnp.float64)
                    / float(10 ** src.decimal_scale)).astype(target)
        # integer target: truncate toward zero, like the reference
        q = _pow10_i64(src.decimal_scale)
        x = a.data.astype(jnp.int64)
        return (jnp.sign(x) * (jnp.abs(x) // q)).astype(target)
    if src.is_dictionary:
        def parse(s):
            try:
                # FixedString zero padding parses as its unpadded value
                f = float(s.strip().rstrip('\x00') or 0)
            except ValueError:
                f = 0.0
            return f if np.dtype(target).kind == "f" else int(f)
        return _dict_lut(a, parse, dst.np_dtype)
    return a.data.astype(target)


def _materialize_strings(src: dt.DType, a: ColVal, v, out_dtype) -> ColVal:
    """Eager per-row stringification: concrete device values -> sorted
    dictionary + codes (the reference's ColumnString materialization in
    FunctionToString, executed host-side here)."""
    import jax as _jax
    vals = np.asarray(_jax.device_get(a.data))
    if vals.ndim == 0:
        vals = vals[None]
    texts = np.asarray([_const_to_text(src, x) for x in vals.tolist()],
                       object)
    uniq, codes = np.unique(texts.astype(str), return_inverse=True)
    return ColVal(out_dtype, jnp.asarray(codes.astype(np.int32)), v,
                  Dictionary(uniq.astype(object), sorted_=True))


def _const_to_text(src: dt.DType, raw) -> str:
    if dt.is_decimal(src) and not dt.is_datetime64(src):
        return typed.format_value(
            decimal.Decimal(int(raw)).scaleb(-src.decimal_scale))
    if src.name == "Date":
        return (datetime.date(1970, 1, 1)
                + datetime.timedelta(days=int(raw))).isoformat()
    if src.name == "DateTime":
        return (datetime.datetime(1970, 1, 1)
                + datetime.timedelta(seconds=int(raw))) \
            .strftime("%Y-%m-%d %H:%M:%S")
    if dt.is_datetime64(src):
        return typed.decode_for_display(
            src, np.asarray([int(raw)], object))[0]
    if src.name == "IPv4":
        return typed.decode_for_display(
            src, np.asarray([int(raw)], object))[0]
    x = np.asarray(raw).item()
    if isinstance(x, float):
        if x != x:
            return "nan"
        if x == float("inf"):
            return "inf"
        if x == float("-inf"):
            return "-inf"
        return repr(x) if x != int(x) else str(int(x))
    return str(x)


def _resolve_cast(ts):
    raise TypeError_("_cast result type is set by the analyzer")


register("_cast", _resolve_cast, cast_exec)


# -- parametric constructors bound by the analyzer ---------------------------

def literal_typed_target(name: str, arg_types, literals):
    """Result dtype for literal-parameterized constructors, or None.

    literals[i] is the python literal value of argument i when the argument
    is a literal, else None.  Returns the target DType — the analyzer then
    binds the call as `_cast` with extra args dropped.
    """
    lname = name.lower()
    for suf in ("orzero", "ornull"):
        if lname.endswith(suf) and lname[:-len(suf)] in (
                "todecimal32", "todecimal64", "todecimal128",
                "todecimal256", "todatetime64"):
            lname = lname[:-len(suf)]
            break
    if lname in ("todecimal32", "todecimal64", "todecimal128",
                 "todecimal256"):
        prec = {"todecimal32": 9, "todecimal64": 18, "todecimal128": 38,
                "todecimal256": 76}[lname]
        s = int(literals[1]) if len(literals) > 1 and literals[1] is not None \
            else 0
        return dt.Decimal(prec, s)
    if lname == "todatetime64":
        s = int(literals[1]) if len(literals) > 1 and literals[1] is not None \
            else 3
        return dt.DateTime64(s)
    if lname == "tofixedstring":
        if len(literals) < 2 or literals[1] is None:
            raise TypeError_("toFixedString requires a constant length")
        return dt.FixedString(int(literals[1]))
    return None


# -- simple named conversions ------------------------------------------------

def _conv_to(target: dt.DType, case_insensitive=False):
    def resolve(ts):
        return target.with_nullable(ts[0].nullable)

    def ex(args, out_dtype):
        return cast_exec(args[:1], out_dtype)
    return resolve, ex


for _name, _t in [("toDate", dt.Date), ("toDate32", dt.Date),
                  ("toDateTime", dt.DateTime),
                  ("toUUID", dt.UUID), ("toIPv4", dt.IPv4),
                  ("toIPv6", dt.IPv6)]:
    _res, _ex = _conv_to(_t)
    register(_name, _res, _ex)

register("IPv4StringToNum",
         lambda ts: dt.UInt32.with_nullable(ts[0].nullable),
         lambda args, t: ColVal(t, _dict_lut(args[0], typed._parse_ipv4,
                                             np.uint32),
                                _and_validity(args)))
register("IPv4NumToString",
         lambda ts: dt.String.with_nullable(ts[0].nullable),
         lambda args, t: cast_exec(
             [ColVal(dt.IPv4, args[0].data.astype(jnp.uint32),
                     args[0].validity)], t))
