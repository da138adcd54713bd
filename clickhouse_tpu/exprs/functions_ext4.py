"""Fifth scalar-function batch: bitmaps, tuple/map arithmetic, vector
norms, array similarity metrics, JSON utilities, polygon geo, date
spellings (YYYYMMDD*, snowflake IDs, sub-second add/subtract), string
encoding extras.

References (semantics only; execution follows this engine's models —
device elementwise over padded matrices, dictionary LUTs, eager per-row
host fallback): src/Functions/FunctionsBitmap.h, tupleOperators.cpp,
map.cpp, vectorFunctions.cpp, array/arrayAUC.cpp, arrayJaccardIndex.cpp,
arrayFold.cpp, pointInPolygon.cpp, geohashDecode.cpp,
FunctionsConversion.h YYYYMMDD*, snowflake.cpp, bitSlice.cpp,
FunctionBase32.cpp, splitByRegexp.cpp.

Bitmaps here ARE sorted unique Array columns (the roaring container is an
implementation detail of the reference; the value contract — a set of
UInts with set algebra — is what queries observe).
"""
from __future__ import annotations

import base64 as _b64
import datetime as _dtm
import json as _json
import math as _math
import re as _re

import jax
import jax.numpy as jnp
import numpy as np

from ..core import dtypes as dt
from ..core.column import Dictionary
from ..core.errors import TypeError_
from .expr import ColVal
from .functions import (FUNCTIONS, _and_validity as _andv, _array_arg,
                        _string_fn_lut, register)
from .functions_ext import (_arrfn, _compact_left, _eager_rowfn, _elem_mask,
                            _resolve_str_array, _string_to_array_lut)


def _get(name):
    return FUNCTIONS[name]


def _u8(ts):
    return dt.UInt8.with_nullable(any(t.nullable for t in ts))


def _u64r(ts):
    return dt.UInt64.with_nullable(any(t.nullable for t in ts))


# ------------------------------------------------------------------ bitmaps
# A bitmap value is a SORTED, DISTINCT Array of unsigned integers.

def _bitmap_norm(cv, out_dtype):
    """arraySort(arrayDistinct(x)) composition on device."""
    d = _get("arrayDistinct")._execute([cv], out_dtype)
    return _get("arraySort")._execute([d], out_dtype)


def _member_matrix(a, b):
    """bool (N, Wa): a's element present in b's row set."""
    m = a.data[:, :, None] == b.data[:, None, :]
    m = m & _elem_mask(b)[:, None, :]
    return jnp.any(m, axis=2) & _elem_mask(a)


def _exec_bitmap_build(args, out_dtype):
    return _bitmap_norm(args[0], out_dtype)


register("bitmapBuild", lambda ts: ts[0], _arrfn(_exec_bitmap_build))
register("bitmapToArray", lambda ts: ts[0],
         lambda args, t: args[0])


def _bitmap_setop(kind):
    def ex(args, out_dtype):
        a, b = _array_arg(args[0]), _array_arg(args[1])
        in_b = _member_matrix(a, b)
        if kind == "and":
            keep = in_b
            data, lens = _compact_left(a, keep)
            out = ColVal(out_dtype, data, _andv(args), a.dictionary,
                         lengths=lens)
            return _bitmap_norm(out, out_dtype)
        if kind == "andnot":
            keep = _elem_mask(a) & ~in_b
            data, lens = _compact_left(a, keep)
            out = ColVal(out_dtype, data, _andv(args), a.dictionary,
                         lengths=lens)
            return _bitmap_norm(out, out_dtype)
        # or / xor need both sides: concatenate, then keep by rule
        cat = _get("arrayConcat")._execute([args[0], args[1]], out_dtype)
        if kind == "or":
            return _bitmap_norm(cat, out_dtype)
        # xor: concat rows, drop elements present in BOTH inputs
        c = _array_arg(cat)
        in_a = _member_matrix(c, a)
        in_bb = _member_matrix(c, b)
        keep = _elem_mask(c) & ~(in_a & in_bb)
        data, lens = _compact_left(c, keep)
        out = ColVal(out_dtype, data, _andv(args), c.dictionary,
                     lengths=lens)
        return _bitmap_norm(out, out_dtype)
    return _arrfn(ex)


for _k in ("And", "Or", "Xor", "Andnot"):
    register(f"bitmap{_k}", lambda ts: ts[0], _bitmap_setop(_k.lower()))


def _bitmap_card_of(inner_kind):
    def ex(args, out_dtype):
        if inner_kind is None:
            arr = args[0]
        else:
            arr = _bitmap_setop(inner_kind)(args, args[0].dtype)
        a = _array_arg(arr)
        n = jnp.sum(_elem_mask(a), axis=1).astype(jnp.uint64)
        if getattr(args[0].data, "ndim", 0) == 1 \
                and getattr(n, "ndim", 0) and n.shape[0] == 1 \
                and all(getattr(x.data, "ndim", 0) == 1 for x in args):
            n = n[0]
        return ColVal(out_dtype, n, _andv(args))
    return _arrfn(ex)


register("bitmapCardinality", _u64r, _bitmap_card_of(None))
register("bitmapAndCardinality", _u64r, _bitmap_card_of("and"))
register("bitmapOrCardinality", _u64r, _bitmap_card_of("or"))
register("bitmapXorCardinality", _u64r, _bitmap_card_of("xor"))
register("bitmapAndnotCardinality", _u64r, _bitmap_card_of("andnot"))

register("bitmapContains", _u8,
         lambda args, t: _get("has")._execute(args, t))
register("bitmapHasAll", _u8,
         lambda args, t: _get("hasAll")._execute(args, t))
register("bitmapHasAny", _u8,
         lambda args, t: _get("hasAny")._execute(args, t))


def _bitmap_minmax(is_min):
    def ex(args, out_dtype):
        a = _array_arg(args[0])
        m = _elem_mask(a)
        x = a.data.astype(jnp.int64)
        if is_min:
            big = jnp.iinfo(jnp.int64).max
            v = jnp.min(jnp.where(m, x, big), axis=1)
            v = jnp.where(jnp.any(m, axis=1), v, 0)
        else:
            v = jnp.max(jnp.where(m, x, 0), axis=1)
        return ColVal(out_dtype, v.astype(jnp.uint64), _andv(args))
    return _arrfn(ex)


register("bitmapMin", _u64r, _bitmap_minmax(True))
register("bitmapMax", _u64r, _bitmap_minmax(False))


def _exec_bitmap_subset_range(args, out_dtype):
    a = _array_arg(args[0])
    lo = args[1].data.astype(jnp.int64).reshape(-1)[0]
    hi = args[2].data.astype(jnp.int64).reshape(-1)[0]
    x = a.data.astype(jnp.int64)
    keep = _elem_mask(a) & (x >= lo) & (x < hi)
    data, lens = _compact_left(a, keep)
    return ColVal(out_dtype, data, _andv(args), a.dictionary, lengths=lens)


register("bitmapSubsetInRange", lambda ts: ts[0],
         _arrfn(_exec_bitmap_subset_range))


def _exec_bitmap_subset_limit(args, out_dtype):
    a = _array_arg(args[0])
    lo = args[1].data.astype(jnp.int64).reshape(-1)[0]
    limit = args[2].data.astype(jnp.int64).reshape(-1)[0]
    x = a.data.astype(jnp.int64)
    keep = _elem_mask(a) & (x >= lo)
    # sorted input: rank among kept elements < limit
    rank = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    keep = keep & (rank < limit)
    data, lens = _compact_left(a, keep)
    return ColVal(out_dtype, data, _andv(args), a.dictionary, lengths=lens)


register("bitmapSubsetLimit", lambda ts: ts[0],
         _arrfn(_exec_bitmap_subset_limit))


def _exec_sub_bitmap(args, out_dtype):
    a = _array_arg(args[0])
    off = args[1].data.astype(jnp.int64).reshape(-1)[0]
    limit = args[2].data.astype(jnp.int64).reshape(-1)[0]
    idx = jnp.arange(a.data.shape[1])[None, :]
    keep = _elem_mask(a) & (idx >= off) & (idx < off + limit)
    data, lens = _compact_left(a, keep)
    return ColVal(out_dtype, data, _andv(args), a.dictionary, lengths=lens)


register("subBitmap", lambda ts: ts[0], _arrfn(_exec_sub_bitmap))


def _exec_bitmap_transform(args, out_dtype):
    """bitmapTransform(bitmap, from_arr, to_arr): replace members."""
    a = _array_arg(args[0])
    f = _array_arg(args[1])
    t = _array_arg(args[2])
    fd = f.data[0] if f.data.ndim == 2 else f.data
    td = t.data[0] if t.data.ndim == 2 else t.data
    x = a.data
    out = x
    for i in range(fd.shape[-1]):
        out = jnp.where(x == fd[i], jnp.broadcast_to(
            td[i].astype(x.dtype), x.shape), out)
    cv = ColVal(out_dtype, out, _andv(args), a.dictionary,
                lengths=a.lengths)
    return _bitmap_norm(cv, out_dtype)


register("bitmapTransform", lambda ts: ts[0],
         _arrfn(_exec_bitmap_transform))


# ----------------------------------------------- tuple / vector arithmetic

def _tuple_zipwith(name, op):
    def resolve(ts):
        if not dt.is_tuple(ts[0]) or not dt.is_tuple(ts[1]):
            raise TypeError_(f"{name} expects two tuples")
        n = min(len(ts[0].tuple_types), len(ts[1].tuple_types))
        return dt.Tuple([dt.Float64] * n)

    def ex(args, out_dtype):
        a, b = args
        if a.sub is None or b.sub is None:
            raise TypeError_(f"{name} expects tuple values")
        subs = []
        for x, y in zip(a.sub, b.sub):
            subs.append(ColVal(dt.Float64, op(
                x.data.astype(jnp.float64), y.data.astype(jnp.float64)),
                None))
        return ColVal(out_dtype, jnp.zeros((), jnp.int8), _andv(args),
                      sub=subs)
    register(name, resolve, ex)


_tuple_zipwith("tuplePlus", jnp.add)
_tuple_zipwith("tupleMinus", jnp.subtract)
_tuple_zipwith("tupleMultiply", jnp.multiply)
_tuple_zipwith("tupleDivide", jnp.divide)
register("vectorSum", FUNCTIONS["tuplePlus"]._resolve,
         FUNCTIONS["tuplePlus"]._execute)
register("vectorDifference", FUNCTIONS["tupleMinus"]._resolve,
         FUNCTIONS["tupleMinus"]._execute)


def _tuple_scalar(name, op):
    def resolve(ts):
        if not dt.is_tuple(ts[0]):
            raise TypeError_(f"{name} expects a tuple")
        return dt.Tuple([dt.Float64] * len(ts[0].tuple_types))

    def ex(args, out_dtype):
        a = args[0]
        if a.sub is None:
            raise TypeError_(f"{name} expects a tuple value")
        k = args[1].data.astype(jnp.float64) if len(args) > 1 else None
        subs = [ColVal(dt.Float64, op(x.data.astype(jnp.float64), k), None)
                for x in a.sub]
        return ColVal(out_dtype, jnp.zeros((), jnp.int8), _andv(args),
                      sub=subs)
    register(name, resolve, ex)


_tuple_scalar("tupleMultiplyByNumber", lambda x, k: x * k)
_tuple_scalar("tupleDivideByNumber", lambda x, k: x / k)
_tuple_scalar("tupleNegate", lambda x, k: -x)


def _exec_tuple_concat(args, out_dtype):
    subs = []
    for a in args:
        if a.sub is None:
            raise TypeError_("tupleConcat expects tuple values")
        subs += list(a.sub)
    return ColVal(out_dtype, jnp.zeros((), jnp.int8), _andv(args),
                  sub=subs)


register("tupleConcat",
         lambda ts: dt.Tuple([dt.parse_type_name(n) for tt in ts
                              for n in (tt.tuple_types or ())]),
         _exec_tuple_concat)


def _exec_tuple_hamming(args, out_dtype):
    a, b = args
    if a.sub is None or b.sub is None:
        raise TypeError_("tupleHammingDistance expects tuples")
    acc = None
    for x, y in zip(a.sub, b.sub):
        d = (x.data != y.data).astype(jnp.uint64)
        acc = d if acc is None else acc + d
    return ColVal(out_dtype, acc, _andv(args))


register("tupleHammingDistance", _u64r, _exec_tuple_hamming)


# ------------------------------------------------------------- map algebra
# Maps are (keys Array, values Array) composites sharing lengths.

def _map_parts(cv):
    if cv.sub is None or len(cv.sub) != 2:
        raise TypeError_("expected a Map value")
    return cv.sub[0], cv.sub[1]


def _map_of(keys, vals, out_dtype):
    return ColVal(out_dtype, jnp.zeros((), jnp.int8), None,
                  sub=[keys, vals])


def _arr2(cv):
    """Normalize an array ColVal to 2-D data + 1-D lengths; -> (cv2,
    was_const)."""
    d = cv.data
    if getattr(d, "ndim", 0) == 2:
        lens = cv.lengths
        if lens is None:
            lens = jnp.full((d.shape[0],), d.shape[1], jnp.int32)
        return ColVal(cv.dtype, d, cv.validity, cv.dictionary,
                      lengths=lens), False
    lens = cv.lengths
    if lens is None:
        lens = jnp.asarray(d.shape[0], jnp.int32)
    if getattr(lens, "ndim", 0) == 0:
        lens = lens[None]
    return ColVal(cv.dtype, d[None, :], cv.validity, cv.dictionary,
                  lengths=lens), True


def _arr1(cv, was_const):
    if not was_const:
        return cv
    return ColVal(cv.dtype, cv.data[0], cv.validity, cv.dictionary,
                  lengths=cv.lengths[0])


def _exec_map_add(sign):
    def ex(args, out_dtype):
        # merge by key with summed values: concat keys, for each slot sum
        # the values of equal keys, keep first occurrences
        ka, va = _map_parts(args[0])
        kb, vb = _map_parts(args[1])
        kcat = _get("arrayConcat")._execute([ka, kb], ka.dtype)
        if sign < 0:
            vb = ColVal(vb.dtype, -vb.data.astype(jnp.float64),
                        vb.validity, lengths=vb.lengths)
        vcat = _get("arrayConcat")._execute([va, vb], va.dtype)
        k, kc = _arr2(_array_arg(kcat))
        v, _vc = _arr2(_array_arg(vcat))
        m = _elem_mask(k)
        eq = (k.data[:, :, None] == k.data[:, None, :]) \
            & m[:, :, None] & m[:, None, :]
        sums = jnp.sum(jnp.where(
            eq, v.data[:, None, :].astype(jnp.float64), 0.0), axis=2)
        first = jnp.argmax(eq, axis=2) == jnp.arange(
            k.data.shape[1])[None, :]
        keep = m & first
        kd, lens = _compact_left(k, keep)
        # compact the per-slot sums with the same keep mask
        shim = ColVal(v.dtype, sums, None, lengths=v.lengths)
        vd, _ = _compact_left(shim, keep)
        keys_out = _arr1(ColVal(ka.dtype, kd, None, k.dictionary,
                                lengths=lens), kc)
        vals_out = _arr1(ColVal(dt.Array(dt.Float64), vd, None,
                                lengths=lens), kc)
        return _map_of(keys_out, vals_out, out_dtype)
    return ex


register("mapAdd", lambda ts: ts[0], _exec_map_add(+1))
register("mapSubtract", lambda ts: ts[0], _exec_map_add(-1))


def _exec_map_concat(args, out_dtype):
    ka, va = _map_parts(args[0])
    kb, vb = _map_parts(args[1])
    kcat = _get("arrayConcat")._execute([ka, kb], ka.dtype)
    vcat = _get("arrayConcat")._execute([va, vb], va.dtype)
    # last-wins per key (reference mapUpdate); mapConcat keeps first
    return _map_of(kcat, vcat, out_dtype)


register("mapConcat", lambda ts: ts[0], _exec_map_concat)


def _exec_map_update(args, out_dtype):
    """mapUpdate(a, b): b's entries replace a's on key collision."""
    ka, va = _map_parts(args[0])
    kb, vb = _map_parts(args[1])
    # concat with b FIRST, keep first occurrence per key
    kcat = _get("arrayConcat")._execute([kb, ka], ka.dtype)
    vcat = _get("arrayConcat")._execute([vb, va], va.dtype)
    k, kc = _arr2(_array_arg(kcat))
    v, _vc = _arr2(_array_arg(vcat))
    m = _elem_mask(k)
    eq = (k.data[:, :, None] == k.data[:, None, :]) \
        & m[:, :, None] & m[:, None, :]
    first = jnp.argmax(eq, axis=2) == jnp.arange(
        k.data.shape[1])[None, :]
    keep = m & first
    kd, lens = _compact_left(k, keep)
    vd, _ = _compact_left(v, keep)
    keys_out = _arr1(ColVal(ka.dtype, kd, None, k.dictionary,
                            lengths=lens), kc)
    vals_out = _arr1(ColVal(va.dtype, vd, None, v.dictionary,
                            lengths=lens), kc)
    return _map_of(keys_out, vals_out, out_dtype)


register("mapUpdate", lambda ts: ts[0], _exec_map_update)


# ------------------------------------------------------------ vector norms

def _vec_one(args):
    a = _array_arg(args[0])
    d = a.data if a.data.ndim == 2 else a.data[None, :]
    m = _elem_mask(a)
    if m.shape[0] != d.shape[0]:
        m = jnp.broadcast_to(m, d.shape)
    return d.astype(jnp.float64) * m, m


def _norm(name, fn):
    def ex(args, out_dtype):
        x, m = _vec_one(args)
        v = fn(x, args)
        if getattr(args[0].data, "ndim", 0) != 2:
            v = v[0]
        return ColVal(out_dtype, v, _andv(args))
    register(name, lambda ts: dt.Float64.with_nullable(
        any(t.nullable for t in ts)), _arrfn(ex))


_norm("L1Norm", lambda x, a: jnp.sum(jnp.abs(x), -1))
_norm("L2Norm", lambda x, a: jnp.sqrt(jnp.sum(x * x, -1)))
_norm("L2SquaredNorm", lambda x, a: jnp.sum(x * x, -1))
_norm("LinfNorm", lambda x, a: jnp.max(jnp.abs(x), -1))
_norm("LpNorm", lambda x, a: jnp.power(
    jnp.sum(jnp.power(jnp.abs(x),
                      a[1].data.astype(jnp.float64).reshape(-1)[0]), -1),
    1.0 / a[1].data.astype(jnp.float64).reshape(-1)[0]))


def _normalize(name, norm_fn):
    def ex(args, out_dtype):
        a = _array_arg(args[0])
        x, m = _vec_one(args)
        n = norm_fn(x)[:, None]
        out = jnp.where(n > 0, x / jnp.maximum(n, 1e-300), 0.0) * m
        return ColVal(out_dtype, out, _andv(args), lengths=a.lengths)
    register(name, lambda ts: dt.Array(dt.Float64), _arrfn(ex))


_normalize("normalizeL1", lambda x: jnp.sum(jnp.abs(x), -1))
_normalize("normalizeL2", lambda x: jnp.sqrt(jnp.sum(x * x, -1)))
_normalize("normalizeLinf", lambda x: jnp.max(jnp.abs(x), -1))


# ------------------------------------------------------- array similarity

def _exec_array_jaccard(args, out_dtype):
    a, b = _array_arg(args[0]), _array_arg(args[1])
    in_b = _member_matrix(a, b)
    in_a = _member_matrix(b, a)
    # count DISTINCT intersection/union on each side
    from .functions_ext import _first_occurrence_mask
    fa = _first_occurrence_mask(a)
    fb = _first_occurrence_mask(b)
    inter = jnp.sum(fa & in_b, axis=1).astype(jnp.float64)
    ua = jnp.sum(fa, axis=1).astype(jnp.float64)
    ub = jnp.sum(fb, axis=1).astype(jnp.float64)
    union = ua + ub - inter
    v = jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 1.0)
    return ColVal(out_dtype, v, _andv(args))


register("arrayJaccardIndex", lambda ts: dt.Float64.with_nullable(
    any(t.nullable for t in ts)), _arrfn(_exec_array_jaccard))


def _exec_array_auc(args, out_dtype):
    """arrayAUC(scores, labels): area under ROC via pairwise comparison
    (exact O(W^2) — the reference sorts; W is a row's array length)."""
    s, l = _array_arg(args[0]), _array_arg(args[1])
    m = _elem_mask(s)
    sc = s.data.astype(jnp.float64)
    lb = (l.data > 0) & _elem_mask(l)
    pos = lb & m
    neg = (~lb) & m
    gt = (sc[:, :, None] > sc[:, None, :]).astype(jnp.float64) \
        + 0.5 * (sc[:, :, None] == sc[:, None, :])
    pairs = pos[:, :, None] & neg[:, None, :]
    wins = jnp.sum(jnp.where(pairs, gt, 0.0), axis=(1, 2))
    n_pairs = jnp.sum(pos, 1).astype(jnp.float64) \
        * jnp.sum(neg, 1).astype(jnp.float64)
    v = jnp.where(n_pairs > 0, wins / jnp.maximum(n_pairs, 1.0), 0.0)
    return ColVal(out_dtype, v, _andv(args))


register("arrayAUC", lambda ts: dt.Float64.with_nullable(
    any(t.nullable for t in ts)), _arrfn(_exec_array_auc))


def _exec_array_zip(args, out_dtype):
    """arrayZip(a, b, ...) -> Array(Tuple(...)): element-wise tuples.
    Composite result: sub-ColVals are the member arrays."""
    arrs = [_array_arg(a) for a in args]
    subs = [ColVal(dt.Array(dt.array_inner(dt.remove_nullable(a.dtype))),
                   a.data, a.validity, a.dictionary, lengths=a.lengths)
            for a in arrs]
    return ColVal(out_dtype, jnp.zeros((), jnp.int8), _andv(args),
                  sub=subs, lengths=arrs[0].lengths)


register("arrayZip", lambda ts: dt.Array(dt.Tuple(
    [dt.array_inner(dt.remove_nullable(t)) for t in ts])),
    _arrfn(_exec_array_zip))
register("arrayZipUnaligned", FUNCTIONS["arrayZip"]._resolve,
         FUNCTIONS["arrayZip"]._execute)


# ----------------------------------------------------------- JSON extras

def _is_valid_json(s):
    try:
        _json.loads(s)
        return True
    except ValueError:
        return False


register("isValidJSON", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _string_fn_lut(lambda s: 1 if _is_valid_json(s) else 0, np.uint8))


def _json_type_of(s):
    try:
        v = _json.loads(s)
    except ValueError:
        return ""
    return {dict: "Object", list: "Array", str: "String", bool: "Bool",
            int: "Int64", float: "Double",
            type(None): "Null"}[type(v)]


register("JSONType", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _string_fn_lut(_json_type_of, object))


def _to_json_string(v):
    if isinstance(v, bytes):
        v = v.decode(errors="replace")
    try:
        # already-JSON text passes through re-canonicalized
        if isinstance(v, str):
            return _json.dumps(_json.loads(v), separators=(",", ":"))
    except ValueError:
        pass
    return _json.dumps(v, default=str, separators=(",", ":"))


register("toJSONString", lambda ts: dt.String,
         _eager_rowfn(_to_json_string, result="str"))


# visitParam* legacy spellings = simpleJSON* (ref: FunctionsVisitParam.h)
for _vp, _sj in (("visitParamExtractInt", "simpleJSONExtractInt"),
                 ("visitParamExtractUInt", "simpleJSONExtractUInt"),
                 ("visitParamExtractFloat", "simpleJSONExtractFloat"),
                 ("visitParamExtractBool", "simpleJSONExtractBool"),
                 ("visitParamExtractString", "simpleJSONExtractString"),
                 ("visitParamExtractRaw", "simpleJSONExtractRaw"),
                 ("visitParamHas", "simpleJSONHas")):
    if _sj in FUNCTIONS:
        register(_vp, FUNCTIONS[_sj]._resolve, FUNCTIONS[_sj]._execute)


# ------------------------------------------------------------------- geo

def _exec_point_in_polygon(args, out_dtype):
    """pointInPolygon((x,y), [(x1,y1), ...]): ray casting, device
    vectorized over rows (ref: src/Functions/pointInPolygon.cpp)."""
    pt = args[0]
    if pt.sub is None or len(pt.sub) != 2:
        raise TypeError_("pointInPolygon expects a (x, y) tuple")
    px = pt.sub[0].data.astype(jnp.float64)
    py = pt.sub[1].data.astype(jnp.float64)
    poly = args[1]
    if poly.sub is not None:
        # array of tuples (arrayZip-style composite)
        xs = poly.sub[0].data
        ys = poly.sub[1].data
        xs = xs[0] if xs.ndim == 2 else xs
        ys = ys[0] if ys.ndim == 2 else ys
    elif getattr(poly.data, "ndim", 0) == 1 \
            and poly.data.shape[0] % 2 == 0:
        # array literal of 2-tuples flattens to interleaved (x0,y0,x1,y1..)
        xs = poly.data[0::2]
        ys = poly.data[1::2]
    else:
        raise TypeError_("pointInPolygon expects an array of (x, y)")
    xs = xs.astype(jnp.float64)
    ys = ys.astype(jnp.float64)
    n = xs.shape[-1]
    inside = jnp.zeros(px.shape, jnp.bool_)
    j = n - 1
    for i in range(n):
        xi, yi = xs[i], ys[i]
        xj, yj = xs[j], ys[j]
        cond = ((yi > py) != (yj > py)) & (
            px < (xj - xi) * (py - yi)
            / jnp.where(yj - yi == 0, 1e-300, yj - yi) + xi)
        inside = inside ^ cond
        j = i
    return ColVal(out_dtype, inside.astype(jnp.uint8), _andv(args))


register("pointInPolygon", _u8, _exec_point_in_polygon)


def _geohash_decode(s):
    table = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat = [-90.0, 90.0]
    lon = [-180.0, 180.0]
    even = True
    for ch in str(s):
        cd = table.find(ch)
        if cd < 0:
            break
        for bit in (16, 8, 4, 2, 1):
            rng = lon if even else lat
            mid = (rng[0] + rng[1]) / 2
            if cd & bit:
                rng[0] = mid
            else:
                rng[1] = mid
            even = not even
    return ((lon[0] + lon[1]) / 2, (lat[0] + lat[1]) / 2)


def _exec_geohash_decode(args, out_dtype):
    a = args[0]
    vals = a.dictionary.values if a.dictionary is not None \
        else np.asarray([], object)
    pts = [_geohash_decode(v) for v in vals] or [(0.0, 0.0)]
    lons = jnp.asarray(np.asarray([p[0] for p in pts], np.float64))
    lats = jnp.asarray(np.asarray([p[1] for p in pts], np.float64))
    codes = jnp.maximum(a.data, 0)
    return ColVal(out_dtype, jnp.zeros((), jnp.int8), _andv(args),
                  sub=[ColVal(dt.Float64, lons[codes], None),
                       ColVal(dt.Float64, lats[codes], None)])


register("geohashDecode", lambda ts: dt.Tuple([dt.Float64, dt.Float64]),
         _exec_geohash_decode)


# ----------------------------------------------------------------- dates

_EPOCH = _dtm.date(1970, 1, 1)


def _yyyymmdd_to_days(v):
    v = int(v or 0)
    y, md = divmod(v, 10000)
    m, d = divmod(md, 100)
    try:
        return (_dtm.date(y, max(m, 1), max(d, 1)) - _EPOCH).days
    except ValueError:
        return 0


register("YYYYMMDDToDate", lambda ts: dt.Date,
         _eager_rowfn(_yyyymmdd_to_days, result="num"))
register("YYYYMMDDToDate32", lambda ts: dt.parse_type_name("Date32"),
         _eager_rowfn(_yyyymmdd_to_days, result="num"))


def _yyyymmddhhmmss_to_dt(v):
    v = int(v or 0)
    day, hms = divmod(v, 1000000)
    h, ms_ = divmod(hms, 10000)
    mi, s = divmod(ms_, 100)
    return _yyyymmdd_to_days(day) * 86400 + h * 3600 + mi * 60 + s


register("YYYYMMDDhhmmssToDateTime", lambda ts: dt.DateTime,
         _eager_rowfn(_yyyymmddhhmmss_to_dt, result="num"))
register("YYYYMMDDhhmmssToDateTime64",
         lambda ts: dt.DateTime64(3),
         _eager_rowfn(lambda v: _yyyymmddhhmmss_to_dt(v) * 1000,
                      result="num"))

# snowflake IDs: ms timestamp in bits 22.. with the twitter epoch
_SNOWFLAKE_EPOCH_MS = 1288834974657


def _exec_snowflake_to_dt(args, out_dtype):
    x = args[0].data.astype(jnp.int64)
    ms = (x >> 22) + _SNOWFLAKE_EPOCH_MS
    return ColVal(out_dtype, (ms // 1000).astype(jnp.int64), _andv(args))


register("snowflakeToDateTime", lambda ts: dt.DateTime,
         _exec_snowflake_to_dt)
register("snowflakeIDToDateTime", lambda ts: dt.DateTime,
         lambda args, t: ColVal(t, (
             (args[0].data.astype(jnp.int64) >> 22) // 1000
         ).astype(jnp.int64), _andv(args)))
register("dateTimeToSnowflake", lambda ts: dt.Int64,
         lambda args, t: ColVal(t, (
             (args[0].data.astype(jnp.int64) * 1000
              - _SNOWFLAKE_EPOCH_MS) << 22), _andv(args)))
register("snowflakeToDateTime64", lambda ts: dt.DateTime64(3),
         lambda args, t: ColVal(t, (
             (args[0].data.astype(jnp.int64) >> 22)
             + _SNOWFLAKE_EPOCH_MS), _andv(args)))
register("dateTime64ToSnowflake", lambda ts: dt.Int64,
         lambda args, t: ColVal(t, (
             (args[0].data.astype(jnp.int64) - _SNOWFLAKE_EPOCH_MS) << 22),
             _andv(args)))

# sub-second add/subtract, storage-granularity aware: DateTime64(S) holds
# 10^S ticks/s, DateTime holds whole seconds (sub-second deltas floor)
for _unit, _ms in (("Milliseconds", 1), ("Microseconds", 0.001),
                   ("Nanoseconds", 0.000001)):
    def _mk(msf, sign):
        def ex(args, out_dtype):
            t0 = dt.remove_nullable(args[0].dtype)
            sc = t0.decimal_scale \
                if t0.name.startswith("DateTime64") else 0
            ticks_per_ms = 10.0 ** sc / 1000.0
            x = args[0].data.astype(jnp.float64)
            n = args[1].data.astype(jnp.float64)
            return ColVal(out_dtype,
                          jnp.floor(x + sign * n * msf * ticks_per_ms)
                          .astype(jnp.int64),
                          _andv(args))
        return ex
    register(f"add{_unit}", lambda ts: ts[0], _mk(_ms, +1))
    register(f"subtract{_unit}", lambda ts: ts[0], _mk(_ms, -1))


# --------------------------------------------------------- string extras

register("base32Encode", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _string_fn_lut(lambda s: _b64.b32encode(
             s.encode()).decode().rstrip("="), object))


def _b32_decode(s):
    s = str(s)
    pad = "=" * (-len(s) % 8)
    try:
        return _b64.b32decode(s.upper() + pad).decode(errors="replace")
    except Exception:       # noqa: BLE001 — reference throws; empty here
        return ""


register("base32Decode", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _string_fn_lut(_b32_decode, object))


def _exec_split_by_regexp(args, out_dtype):
    sep = args[0]
    if sep.dictionary is None or len(sep.dictionary) != 1:
        raise TypeError_("splitByRegexp: pattern must be a constant")
    pat = _re.compile(str(sep.dictionary.values[0]))
    return _string_to_array_lut(
        lambda s: pat.split(s) if s else [])([args[1]], out_dtype)


register("splitByRegexp", lambda ts: _resolve_str_array(ts[1:]),
         _exec_split_by_regexp)


def _exec_bit_slice(args, out_dtype):
    def host(s, off, ln=None):
        bits = "".join(f"{b:08b}" for b in str(s).encode())
        o = int(off)
        start = o - 1 if o > 0 else max(len(bits) + o, 0)
        sub = bits[start:start + int(ln)] if ln is not None \
            else bits[start:]
        sub = sub + "0" * (-len(sub) % 8)
        return "".join(chr(int(sub[i:i + 8], 2))
                       for i in range(0, len(sub), 8))
    return _eager_rowfn(host, result="str")(args, out_dtype)


register("bitSlice", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _exec_bit_slice)


def _jaccard_str(a, b):
    sa, sb = set(str(a)), set(str(b))
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / max(len(sa | sb), 1)


register("stringJaccardIndex", lambda ts: dt.Float64.with_nullable(
    any(t.nullable for t in ts)),
    _eager_rowfn(_jaccard_str, result="num"))


def _instr(h, n):
    return str(h).find(str(n)) + 1


register("instr", lambda ts: dt.UInt64.with_nullable(
    any(t.nullable for t in ts)), _eager_rowfn(_instr, result="num"))


# ------------------------------------------------------------ RNG extras

def _rng_fn(name, sampler, n_params=2):
    def ex(args, out_dtype):
        import numpy.random as npr
        cap = 1
        for a in args:
            if getattr(a.data, "ndim", 0) == 1:
                cap = max(cap, a.data.shape[0])
        ps = [float(np.asarray(jax.device_get(a.data)).reshape(-1)[0])
              for a in args[:n_params]]
        rng = npr.default_rng()
        vals = sampler(rng, ps, cap)
        return ColVal(out_dtype, jnp.asarray(
            np.asarray(vals, np.float64)), None)
    register(name, lambda ts: dt.Float64, ex)


_rng_fn("randBinomial",
        lambda rng, ps, n: rng.binomial(int(ps[0]), ps[1], n).astype(float))
_rng_fn("randNegativeBinomial",
        lambda rng, ps, n: rng.negative_binomial(
            int(ps[0]), ps[1], n).astype(float))
_rng_fn("randLogNormal",
        lambda rng, ps, n: rng.lognormal(ps[0], ps[1], n))
_rng_fn("randChiSquared",
        lambda rng, ps, n: rng.chisquare(ps[0], n), n_params=1)
_rng_fn("randStudentT",
        lambda rng, ps, n: rng.standard_t(ps[0], n), n_params=1)
_rng_fn("randFisherF",
        lambda rng, ps, n: rng.f(ps[0], ps[1], n))

from . import functions_ext5 as _functions_ext5  # noqa: E402,F401
