"""Seventh scalar-function batch: generic typed JSONExtract, OrZero/OrNull
cast fallbacks, SipHash128, time slots, per-row aggregate-state
construction (initializeAggregation / runningAccumulate), reinterpret and
conversion spellings.

References (semantics only): src/Functions/{FunctionsJSON.cpp JSONExtract
generic form, FunctionsConversion.h toDecimalNNOrZero/OrNull,
FunctionsHashing.h sipHash128 via SipHash.h get128, timeSlots.cpp,
reinterpretAs.cpp, initializeAggregation.cpp, runningAccumulate.cpp,
dateTimeToSnowflake family absent here}.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import dtypes as dt
from ..core.errors import TypeError_, NotImplementedError_
from .expr import ColVal
from .functions import (FUNCTIONS, _and_validity as _andv, _const_int,
                        _json_lut, _json_path, _string_fn_lut, register)
from ..core.column import Dictionary
from .functions_ext import (_eager_rowfn, _exec_parse_best_effort,
                            _resolve_str_array, _string_to_array_lut)


def _num(out_t):
    def resolve(ts):
        return out_t.with_nullable(any(t.nullable for t in ts))
    return resolve


# ------------------------------------------- OrZero / OrNull cast fallback
# The analyzer binds toDecimal32OrZero(x, S) / toDateTime64OrNull(x, S) to
# `_castOrZero` / `_castOrNull` with the literal-parameterized target dtype
# (plan/analyzer.py literal_typed_target path); these execs parse each
# distinct string on the host, mapping failures to 0 / NULL instead of an
# error (ref: FunctionsConversion.h accurateCastOrNull machinery).

def _host_parse_scaled(base: dt.DType, text: str) -> int:
    """Parse a string into the scaled-int64 payload of `base`; raises on
    unparseable / out-of-range input."""
    from decimal import Decimal as _D
    s = text.strip()
    if not s:
        raise ValueError("empty")
    if base.decimal_scale is not None and base.name.startswith("Decimal"):
        v = _D(s).scaleb(base.decimal_scale)
        iv = int(v.to_integral_value(rounding="ROUND_HALF_UP"))
        if not (-(2**63) <= iv < 2**63):
            raise OverflowError("decimal out of range")
        return iv
    if base.decimal_scale is not None:   # DateTime64
        import datetime as _dtm
        t = _dtm.datetime.fromisoformat(s.replace(" ", "T"))
        epoch = _dtm.datetime(1970, 1, 1)
        secs = (t - epoch).total_seconds()
        return int(round(secs * 10 ** base.decimal_scale))
    if base.np_dtype.kind in "iu":
        return int(s, 0)
    raise ValueError("unsupported target")


def _exec_cast_or(null: bool):
    def ex(args, out_dtype):
        a = args[0]
        base = dt.remove_nullable(out_dtype)
        if a.dtype.is_dictionary and a.dictionary is not None:
            vals = a.dictionary.values
            parsed, ok = [], []
            for v in vals:
                try:
                    parsed.append(_host_parse_scaled(base, str(v)))
                    ok.append(1)
                except Exception:        # noqa: BLE001 — Or* contract
                    parsed.append(0)
                    ok.append(0)
            lut = jnp.asarray(np.asarray(parsed or [0], np.int64)) \
                .astype(base.np_dtype.name)
            okl = jnp.asarray(np.asarray(ok or [0], np.uint8))
            codes = jnp.maximum(a.data, 0)
            data, okv = lut[codes], okl[codes]
            if a.validity is not None:
                okv = (okv.astype(jnp.bool_)
                       & a.validity.astype(jnp.bool_)).astype(jnp.uint8)
            if null:
                return ColVal(out_dtype, data, okv)
            return ColVal(out_dtype,
                          jnp.where(okv > 0, data,
                                    jnp.zeros((), data.dtype)), a.validity)
        try:
            out = FUNCTIONS["_cast"]._execute([a], base)
        except Exception:                # noqa: BLE001 — Or* contract
            shape = getattr(a.data, "shape", ())
            z = jnp.zeros(shape, base.np_dtype.name)
            return ColVal(out_dtype, z,
                          jnp.zeros(shape, jnp.uint8) if null else None)
        if null and out.validity is None:
            return ColVal(out_dtype, out.data,
                          jnp.ones(getattr(out.data, "shape", ()),
                                   jnp.uint8), out.dictionary,
                          lengths=out.lengths)
        return ColVal(out_dtype, out.data, out.validity, out.dictionary,
                      lengths=out.lengths)
    return ex


register("_castOrZero", lambda ts: ts[0], _exec_cast_or(False))
register("_castOrNull", lambda ts: dt.make_nullable(ts[0]),
         _exec_cast_or(True))


# ------------------------------------------------ generic typed JSONExtract
# JSONExtract(json, k1, ..., 'Type'): the analyzer refines the result type
# from the trailing literal; exec dispatches extraction on that dtype.

def _exec_json_extract_typed(args, out_dtype):
    keys = []
    for k in args[1:-1]:
        if k.dictionary is not None:
            keys.append(str(k.host if k.host is not None
                            else k.dictionary.values[0]))
        else:
            kv = _const_int(k)
            if kv is None:
                raise TypeError_("JSON path arguments must be constant")
            keys.append(kv)
    base = dt.remove_nullable(out_dtype)

    def _scalar(v, t: dt.DType):
        if t.is_dictionary or t.name.startswith("FixedString"):
            if isinstance(v, str):
                return v
            return "" if v is None else __import__("json").dumps(
                v, separators=(",", ":"))
        k = t.np_dtype.kind
        if k in "iu":
            try:
                return int(v) if not isinstance(v, bool) else int(v)
            except (TypeError, ValueError):
                return 0
        if k == "f":
            try:
                return float(v)
            except (TypeError, ValueError):
                return 0.0
        return 0

    if base.is_array:
        inner = dt.array_inner(base)
        if inner.is_dictionary:
            def lister(s):
                v = _json_path(_try_json(s), keys)
                return [str(_scalar(x, inner)) for x in v] \
                    if isinstance(v, list) else []
            return _string_to_array_lut(lister)([args[0]], out_dtype)
        # numeric array: padded LUT per distinct document
        a = args[0]
        vals = a.dictionary.values if a.dictionary is not None \
            else np.asarray([""], object)
        lists = []
        for s in vals:
            v = _json_path(_try_json(str(s)), keys)
            lists.append([_scalar(x, inner) for x in v]
                         if isinstance(v, list) else [])
        W = max(1, max((len(li) for li in lists), default=1))
        lut = np.zeros((len(lists) or 1, W), inner.np_dtype.name)
        lens = np.zeros(len(lists) or 1, np.int32)
        for i, li in enumerate(lists):
            lens[i] = len(li)
            lut[i, :len(li)] = li
        codes = jnp.maximum(a.data, 0)
        return ColVal(out_dtype, jnp.asarray(lut)[codes], _andv([a]),
                      lengths=jnp.asarray(lens)[codes])
    if base.is_dictionary:
        f = lambda s: str(_scalar(_json_path(_try_json(s), keys), base))
        return _string_fn_lut(f, object)([args[0]], out_dtype)
    f = lambda s: _scalar(_json_path(_try_json(s), keys), base)
    return _string_fn_lut(f, base.np_dtype)([args[0]], out_dtype)


def _try_json(s):
    import json as _json
    try:
        return _json.loads(s) if s else None
    except Exception:                    # noqa: BLE001
        return None


register("JSONExtract", lambda ts: dt.String, _exec_json_extract_typed)


def _jx_path_args(args):
    keys = []
    for k in args[1:]:
        if k.dictionary is not None:
            keys.append(str(k.dictionary.values[0]))
        else:
            kv = _const_int(k)
            keys.append(kv if kv is not None else 0)
    return keys


def _jx_array_raw(s, keys):
    import json as _json
    v = _json_path(_try_json(s), keys)
    if not isinstance(v, list):
        return []
    return [_json.dumps(x, separators=(",", ":")) for x in v]


def _jx_keys(s, keys):
    v = _json_path(_try_json(s), keys)
    return list(v.keys()) if isinstance(v, dict) else []


if "JSONExtractArrayRaw" not in FUNCTIONS:
    register(
        "JSONExtractArrayRaw", _resolve_str_array,
        lambda args, t: _string_to_array_lut(
            lambda s, ks=tuple(_jx_path_args(args)):
            _jx_array_raw(s, list(ks)))([args[0]], t))

if "JSONExtractKeys" not in FUNCTIONS:
    register(
        "JSONExtractKeys", _resolve_str_array,
        lambda args, t: _string_to_array_lut(
            lambda s, ks=tuple(_jx_path_args(args)):
            _jx_keys(s, list(ks)))([args[0]], t))


# ------------------------------------------------------------- time pieces

register("toTime", lambda ts: dt.DateTime.with_nullable(ts[0].nullable),
         lambda args, t: ColVal(
             t, jnp.mod(args[0].data.astype(jnp.int64), 86400) + 86400,
             _andv(args)))

register("timeZoneOf", lambda ts: dt.String,
         lambda args, t: ColVal(t, jnp.zeros((), jnp.int32), None,
                                Dictionary(np.asarray(["UTC"], object))))


def _exec_time_slots(args, out_dtype):
    start = args[0].data.astype(jnp.int64)
    dur = args[1].data.astype(jnp.int64)
    size = 1800
    if len(args) > 2:
        c = _const_int(args[2])
        if c:
            size = int(c)
    # slots: floor(start/size)*size .. floor((start+dur)/size)*size
    if getattr(start, "ndim", 0) == 0:
        start = start[None]
        dur = jnp.broadcast_to(jnp.asarray(dur).reshape(-1), (1,))
        scalar = True
    else:
        scalar = False
        dur = jnp.broadcast_to(dur, start.shape)
    first = jnp.floor_divide(start, size) * size
    n = jnp.floor_divide(start + dur, size) - jnp.floor_divide(start, size) \
        + 1
    W = 64
    idx = jnp.arange(W, dtype=jnp.int64)[None, :]
    mat = first[:, None] + idx * size
    lens = jnp.clip(n, 0, W).astype(jnp.int32)
    mat = jnp.where(idx < lens[:, None], mat, 0)
    if scalar:
        return ColVal(out_dtype, mat[0], None,
                      lengths=lens[0])
    return ColVal(out_dtype, mat, _andv(args[:2]), lengths=lens)


register("timeSlots", lambda ts: dt.Array(dt.DateTime), _exec_time_slots)


# ------------------------------------------------------------ reinterprets

def _exec_reinterpret_as_fixed(args, out_dtype):
    a = args[0]
    if a.dtype.is_dictionary:
        return ColVal(out_dtype, a.data, a.validity, a.dictionary)
    width = dt.remove_nullable(a.dtype).np_dtype.itemsize

    def f(v):
        b = int(v).to_bytes(width, "little", signed=int(v) < 0)
        return b.decode("utf-8", "surrogateescape")
    return _eager_rowfn(f)(args, out_dtype)


register("reinterpretAsFixedString", lambda ts: dt.String,
         _exec_reinterpret_as_fixed)


# ----------------------------------------------------------- SipHash-128
# ClickHouse sipHash128: SipHash-2-4 with the two-halves finalization
# (SipHash.h get128: out = LE64(v0^v1) || LE64(v2^v3)), zero key.

_M64 = (1 << 64) - 1


def _rotl(x, b):
    return ((x << b) | (x >> (64 - b))) & _M64


def _siphash128(data: bytes) -> bytes:
    v0, v1 = 0x736F6D6570736575, 0x646F72616E646F6D
    v2, v3 = 0x6C7967656E657261, 0x7465646279746573

    def rnd(v0, v1, v2, v3):
        v0 = (v0 + v1) & _M64
        v1 = _rotl(v1, 13) ^ v0
        v0 = _rotl(v0, 32)
        v2 = (v2 + v3) & _M64
        v3 = _rotl(v3, 16) ^ v2
        v0 = (v0 + v3) & _M64
        v3 = _rotl(v3, 21) ^ v0
        v2 = (v2 + v1) & _M64
        v1 = _rotl(v1, 17) ^ v2
        v2 = _rotl(v2, 32)
        return v0, v1, v2, v3

    n = len(data)
    i = 0
    while i + 8 <= n:
        m = int.from_bytes(data[i:i + 8], "little")
        v3 ^= m
        v0, v1, v2, v3 = rnd(v0, v1, v2, v3)
        v0, v1, v2, v3 = rnd(v0, v1, v2, v3)
        v0 ^= m
        i += 8
    tail = data[i:] + b"\x00" * (7 - (n - i))
    m = int.from_bytes(tail + bytes([n & 0xFF]), "little")
    v3 ^= m
    v0, v1, v2, v3 = rnd(v0, v1, v2, v3)
    v0, v1, v2, v3 = rnd(v0, v1, v2, v3)
    v0 ^= m
    v2 ^= 0xFF
    for _ in range(4):
        v0, v1, v2, v3 = rnd(v0, v1, v2, v3)
    return ((v0 ^ v1).to_bytes(8, "little")
            + (v2 ^ v3).to_bytes(8, "little"))


def _exec_siphash128(args, out_dtype):
    def f(s):
        b = str(s).encode("utf-8", "surrogateescape")
        return _siphash128(b).decode("utf-8", "surrogateescape")
    a = args[0]
    if a.dtype.is_dictionary:
        return _string_fn_lut(f, object)(args, out_dtype)
    return _eager_rowfn(f)(args, out_dtype)


register("sipHash128", lambda ts: dt.FixedString(16), _exec_siphash128)
register("sipHash128Keyed", lambda ts: dt.FixedString(16),
         lambda args, t: _exec_siphash128(args[-1:], t))


# ----------------------------------------------------- substring counting

def _count_ci(utf8: bool):
    def ex(args, out_dtype):
        sub = str(args[1].dictionary.values[0]).lower() \
            if args[1].dictionary is not None else ""
        return _string_fn_lut(
            lambda s: np.uint64(s.lower().count(sub) if sub else 0),
            np.uint64)([args[0]], out_dtype)
    return ex


register("countSubstringsCaseInsensitive", _num(dt.UInt64), _count_ci(False))
register("countSubstringsCaseInsensitiveUTF8", _num(dt.UInt64),
         _count_ci(True))


# -------------------------------------------------------------- replicate
# replicate(x, arr): internal — x broadcast to arr's per-row shape as an
# Array (ref: src/Functions/replicate.cpp).

def _exec_replicate(args, out_dtype):
    x, arr = args
    if arr.lengths is None:
        raise TypeError_("replicate expects an array second argument")
    lens = arr.lengths
    W = arr.data.shape[-1] if getattr(arr.data, "ndim", 0) else 1
    xd = x.data
    if getattr(xd, "ndim", 0) == 0:
        if getattr(lens, "ndim", 0) == 0:
            mat = jnp.broadcast_to(xd, (W,))
            return ColVal(out_dtype, mat, None, x.dictionary, lengths=lens)
        mat = jnp.broadcast_to(xd, (lens.shape[0], W))
    else:
        mat = jnp.broadcast_to(xd[:, None], (xd.shape[0], W))
    idx = jnp.arange(W, dtype=jnp.int32)[None, :]
    l2 = lens if getattr(lens, "ndim", 0) else lens[None]
    mat = jnp.where(idx < l2[:, None], mat, jnp.zeros((), mat.dtype))
    return ColVal(out_dtype, mat, _andv([x]), x.dictionary, lengths=lens)


register("replicate",
         lambda ts: dt.Array(ts[0]), _exec_replicate)


# ------------------------------------------------- parse spellings (Or*)

for _nm, _md in (("parseDateTime64BestEffortOrNull", "ornull"),
                 ("parseDateTime64BestEffortOrZero", "orzero"),
                 ("parseDateTimeBestEffortUSOrNull", "ornull"),
                 ("parseDateTimeBestEffortUSOrZero", "orzero"),
                 ("parseDateTime32BestEffortOrNull", "ornull"),
                 ("parseDateTime32BestEffortOrZero", "orzero")):
    register(_nm, (lambda md: lambda ts: dt.DateTime.with_nullable(
        ts[0].nullable or md == "ornull"))(_md),
        _exec_parse_best_effort(_md), case_insensitive=True)


# -------------------------------------------------------- introspection

def _exec_dump_structure(args, out_dtype):
    a = args[0]
    tname = dt.remove_nullable(a.dtype).name
    n = a.data.shape[0] if getattr(a.data, "ndim", 0) else 1
    if a.is_const:
        s = f"{tname} Const(size = {n}, {tname}(size = 1))"
    else:
        s = f"{tname} {tname}(size = {n})"
    return ColVal(out_dtype, jnp.zeros(
        getattr(a.data, "shape", ()) if getattr(a.data, "ndim", 0)
        else (), jnp.int32), None, Dictionary(np.asarray([s], object)))


register("dumpColumnStructure", lambda ts: dt.String, _exec_dump_structure)

register("toBFloat16", _num(dt.Float32),
         lambda args, t: ColVal(
             t, args[0].data.astype(jnp.bfloat16).astype(jnp.float32),
             _andv(args)))


# ------------------------------------------------------- great-circle angle

def _exec_gc_angle(args, out_dtype):
    lon1, lat1, lon2, lat2 = [a.data.astype(jnp.float64) * (jnp.pi / 180)
                              for a in args]
    d = (jnp.sin(lat1) * jnp.sin(lat2)
         + jnp.cos(lat1) * jnp.cos(lat2) * jnp.cos(lon1 - lon2))
    ang = jnp.arccos(jnp.clip(d, -1.0, 1.0)) * (180 / jnp.pi)
    return ColVal(out_dtype, ang.astype(jnp.float32), _andv(args))


register("greatCircleAngle", _num(dt.Float32), _exec_gc_angle)


# ---------------------------------------- per-row aggregate-state plumbing
# initializeAggregation('aggState', v...): each row becomes a single-row
# group whose packed state is emitted (ref: initializeAggregation.cpp).
# The analyzer refines the result dtype from the literal name
# (plan/analyzer.py _bind_call).

class _PerRowGrouping:
    """Duck-typed Grouping where every row is its own group."""
    kind = "perrow"
    perm = None
    row_valid_ref = None

    def __init__(self, cap):
        self.num_groups_cap = cap
        self.num_groups = jnp.asarray(cap, jnp.int64)
        self.group_ids = jnp.arange(cap, dtype=jnp.int32)
        self.unique_keys = []
        self.present = jnp.ones((cap,), jnp.bool_)
        self.starts = jnp.arange(cap, dtype=jnp.int64)
        self.ends = self.starts + 1
        self.boundary = jnp.ones((cap,), jnp.bool_)

    def take(self, a):
        return a

    def group_valid(self):
        return self.present

    def _ident(self, op, dtype):
        if op == "sum" or op == "any":
            return jnp.zeros((), dtype)
        if op == "min":
            return jnp.asarray(jnp.finfo(dtype).max
                               if jnp.issubdtype(dtype, jnp.floating)
                               else jnp.iinfo(dtype).max, dtype)
        return jnp.asarray(jnp.finfo(dtype).min
                           if jnp.issubdtype(dtype, jnp.floating)
                           else jnp.iinfo(dtype).min, dtype)

    def reduce(self, op, data_raw, mask_raw, value_bounds=None):
        d = data_raw
        if mask_raw is None:
            return d
        m = mask_raw
        if getattr(m, "ndim", 0) < getattr(d, "ndim", 0):
            m = m[:, None] if getattr(d, "ndim", 0) == 2 else m
        return jnp.where(m, d, self._ident(op, d.dtype))

    def reduce_sorted(self, op, data, mask, value_bounds=None):
        return self.reduce(op, data, mask)

    def count_rows(self, mask_raw):
        return mask_raw.astype(jnp.int64)

    def dense_counts(self, mask_raw):
        return mask_raw.astype(jnp.int64)


def _exec_initialize_aggregation(args, out_dtype):
    if args[0].dictionary is None:
        raise TypeError_("initializeAggregation expects a constant "
                         "aggregate name")
    name = str(args[0].dictionary.values[0])
    from .aggregates import GroupContext, get_aggregate
    vals = list(args[1:])
    cap = 1
    for a in vals:
        nd = getattr(a.data, "ndim", 0)
        if (not dt.remove_nullable(a.dtype).is_array and nd >= 1) or nd >= 2:
            cap = max(cap, a.data.shape[0])
    agg, _ = get_aggregate(name, [a.dtype for a in vals])
    g = _PerRowGrouping(cap)
    ctx = GroupContext(keys=[], row_valid=jnp.ones((cap,), jnp.bool_),
                       grouping=g, num_groups_cap=cap, checks=[])
    try:
        states = agg.update(ctx, vals, None)
        fin = agg.finalize(states)
    except (KeyError, AttributeError, ValueError) as e:
        raise NotImplementedError_(
            f"initializeAggregation over '{name}' is not supported "
            f"({type(e).__name__})")
    data, validity = fin[0], fin[1]
    if all(a.is_const for a in args):
        # constant args: single-row state rides as a (B,) constant (the
        # finalizeAggregation exec accepts the 1-D const form)
        return ColVal(out_dtype, data[0],
                      None if validity is None else validity[0])
    return ColVal(out_dtype, data, validity)


register("initializeAggregation", lambda ts: dt.String,
         _exec_initialize_aggregation)


# runningAccumulate(state): cumulative state merge down the block, then
# finalize per row (ref: src/Functions/runningAccumulate.cpp).  The merge
# op per state column is the aggregate's declared one — cumulative via an
# associative scan.

def _resolve_running_acc(ts):
    st = dt.remove_nullable(ts[0])
    if not dt.is_agg_state(st):
        raise TypeError_("runningAccumulate expects an "
                         "AggregateFunction(...) argument")
    from .aggregates import make_merge_for_dtype
    return make_merge_for_dtype(st).result_type()


def _exec_running_acc(args, out_dtype):
    a = args[0]
    st = dt.remove_nullable(a.dtype)
    from .aggregates import make_merge_for_dtype, unpack_state_columns
    m = make_merge_for_dtype(st)
    states = unpack_state_columns(a.data, m.spec)
    ops = m.inner.state_ops()
    acc = []
    for op, s in zip(ops, states):
        if op == "sum":
            acc.append(jnp.cumsum(s, axis=0, dtype=s.dtype))
        elif op == "min":
            acc.append(jax.lax.associative_scan(jnp.minimum, s, axis=0))
        elif op == "max":
            acc.append(jax.lax.associative_scan(jnp.maximum, s, axis=0))
        else:                            # any: keep the first state
            acc.append(jnp.broadcast_to(s[:1], s.shape)
                       if getattr(s, "ndim", 0) else s)
    res = m.inner.finalize(acc)
    data, validity = res[0], res[1]
    if a.validity is not None:
        av = a.validity.astype(jnp.uint8)
        validity = av if validity is None \
            else (validity.astype(jnp.uint8) & av)
    return ColVal(out_dtype, data, validity)


register("runningAccumulate", _resolve_running_acc, _exec_running_acc)
