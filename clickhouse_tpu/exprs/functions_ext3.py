"""Fourth scalar-function batch: numeric utilities, distribution RNGs,
string similarity/encoding, URL form encoding, IP OrNull parsers,
array rotation/shift, LowCardinality introspection, geo ellipses.

References: src/Functions/{clamp,countDigits,pointInEllipses,randDistribution,
base58,FunctionsStringSimilarity,padString,concatWithSeparator,URL/*,
FunctionsCodingIP,array/arrayRotate*,lowCardinality*}.cpp — semantics
re-derived, execution follows functions.py's models (device elementwise,
dictionary LUTs, eager per-row host fallback).
"""
from __future__ import annotations

import math as _math
import re
import urllib.parse

import jax
import jax.numpy as jnp
import numpy as np

from ..core import dtypes as dt
from ..core.column import Dictionary
from ..core.errors import TypeError_
from .expr import ColVal
from .functions import (FUNCTIONS, _and_validity, _string_fn_lut, register)
from .functions_ext import _eager_rowfn

_SLUT = _string_fn_lut


# ----------------------------------------------------------------- numerics

def _exec_clamp(args, out_dtype):
    x, lo, hi = (a.data for a in args)
    return ColVal(out_dtype,
                  jnp.minimum(jnp.maximum(x.astype(jnp.float64),
                                          lo.astype(jnp.float64)),
                              hi.astype(jnp.float64)),
                  _and_validity(args))


register("clamp", lambda ts: dt.Float64.with_nullable(
    any(t.nullable for t in ts)), _exec_clamp)


def _exec_count_digits(args, out_dtype):
    """Decimal digits of the integer part — exact via power-of-10
    threshold comparisons (no float log10 edge cases)."""
    x = jnp.abs(args[0].data.astype(jnp.int64))
    n = jnp.zeros(x.shape, jnp.uint8)
    p = jnp.int64(1)
    for _ in range(19):
        n = n + (x >= p).astype(jnp.uint8)
        p = p * jnp.int64(10)
    return ColVal(out_dtype, jnp.maximum(n, 1).astype(jnp.uint8),
                  args[0].validity)


register("countDigits", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _exec_count_digits)


def _exec_point_in_ellipses(args, out_dtype):
    """pointInEllipses(x, y, x0, y0, a0, b0, ...): 1 when (x, y) falls in
    ANY of the axis-aligned ellipses."""
    if (len(args) - 2) % 4 != 0 or len(args) < 6:
        raise TypeError_("pointInEllipses expects (x, y, x0,y0,a,b,...)")
    x = args[0].data.astype(jnp.float64)
    y = args[1].data.astype(jnp.float64)
    hit = jnp.zeros(jnp.broadcast_shapes(x.shape, y.shape), jnp.bool_)
    for i in range(2, len(args), 4):
        x0, y0, a, b = (args[i + j].data.astype(jnp.float64)
                        for j in range(4))
        d = ((x - x0) / jnp.maximum(a, 1e-300)) ** 2 \
            + ((y - y0) / jnp.maximum(b, 1e-300)) ** 2
        hit = hit | (d <= 1.0)
    return ColVal(out_dtype, hit.astype(jnp.uint8), _and_validity(args))


register("pointInEllipses", lambda ts: dt.UInt8, _exec_point_in_ellipses)


# ------------------------------------------------- distribution RNG family
# Counter-based via jax.random with a per-call nonce (the reference's
# randDistribution.cpp draws from pcg64; values are random either way).

def _exec_rand_dist(kind):
    import random as _pyrandom

    def ex(args, out_dtype, row_mask=None):
        key = jax.random.PRNGKey(_pyrandom.getrandbits(31))
        cap = 1
        if row_mask is not None and getattr(row_mask.data, "ndim", 0):
            cap = row_mask.data.shape[0]
        for a in args:
            if getattr(a.data, "ndim", 0):
                cap = max(cap, a.data.shape[0])
        shape = (cap,) if cap > 1 else ()

        def p(i, default):
            if len(args) <= i:
                return default
            v = args[i].data
            return float(v.reshape(-1)[0]) if getattr(v, "ndim", 0) \
                else float(v)
        if kind == "canonical":
            out = jax.random.uniform(key, shape, jnp.float64)
        elif kind == "uniform":
            out = jax.random.uniform(key, shape, jnp.float64,
                                     minval=p(0, 0.0), maxval=p(1, 1.0))
        elif kind == "normal":
            out = p(0, 0.0) + p(1, 1.0) * jax.random.normal(
                key, shape, jnp.float64)
        elif kind == "bernoulli":
            return ColVal(out_dtype, jax.random.bernoulli(
                key, p(0, 0.5), shape).astype(jnp.uint8), None)
        elif kind == "exponential":
            out = jax.random.exponential(key, shape, jnp.float64) \
                / max(p(0, 1.0), 1e-300)
        elif kind == "poisson":
            return ColVal(out_dtype, jax.random.poisson(
                key, p(0, 1.0), shape).astype(jnp.uint64), None)
        else:
            raise TypeError_(f"unknown distribution {kind}")
        return ColVal(out_dtype, out, None)
    return ex


register("randCanonical", lambda ts: dt.Float64,
         _exec_rand_dist("canonical"))
register("randUniform", lambda ts: dt.Float64, _exec_rand_dist("uniform"))
register("randNormal", lambda ts: dt.Float64, _exec_rand_dist("normal"))
register("randBernoulli", lambda ts: dt.UInt8,
         _exec_rand_dist("bernoulli"))
register("randExponential", lambda ts: dt.Float64,
         _exec_rand_dist("exponential"))
register("randPoisson", lambda ts: dt.UInt64, _exec_rand_dist("poisson"))
for _rn in ("randCanonical", "randUniform", "randNormal", "randBernoulli",
            "randExponential", "randPoisson"):
    FUNCTIONS[_rn].wants_row_mask = True


# --------------------------------------------------------- string encoding

_B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def _b58encode(s: str) -> str:
    b = s.encode()
    n = int.from_bytes(b, "big") if b else 0
    out = ""
    while n:
        n, r = divmod(n, 58)
        out = _B58[r] + out
    pad = len(b) - len(b.lstrip(b"\x00"))
    return "1" * pad + out


def _b58decode(s: str) -> str:
    n = 0
    for c in s:
        idx = _B58.find(c)
        if idx < 0:
            raise ValueError(f"invalid base58 character {c!r}")
        n = n * 58 + idx
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    pad = len(s) - len(s.lstrip("1"))
    return (b"\x00" * pad + raw).decode(errors="replace")


register("base58Encode", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _SLUT(_b58encode, object))
register("base58Decode", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _SLUT(_b58decode, object))


def _unbin(s: str) -> str:
    s = s.strip()
    if not s:
        return ""
    pad = (-len(s)) % 8
    n = int(s, 2)
    return n.to_bytes((len(s) + pad) // 8, "big").decode(errors="replace")


register("unbin", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _SLUT(_unbin, object))
register("regexpQuoteMeta",
         lambda ts: dt.String.with_nullable(ts[0].nullable),
         _SLUT(re.escape, object))
register("encodeURLFormComponent",
         lambda ts: dt.String.with_nullable(ts[0].nullable),
         _SLUT(lambda s: urllib.parse.quote_plus(s), object))
register("decodeURLFormComponent",
         lambda ts: dt.String.with_nullable(ts[0].nullable),
         _SLUT(lambda s: urllib.parse.unquote_plus(s), object))

_TD_UNITS = {
    "ns": 1e-9, "us": 1e-6, "ms": 1e-3,
    "s": 1.0, "sec": 1.0, "second": 1.0, "seconds": 1.0,
    "m": 60.0, "min": 60.0, "minute": 60.0, "minutes": 60.0,
    "h": 3600.0, "hr": 3600.0, "hour": 3600.0, "hours": 3600.0,
    "d": 86400.0, "day": 86400.0, "days": 86400.0,
    "w": 604800.0, "week": 604800.0, "weeks": 604800.0,
}


def _parse_time_delta(s: str) -> float:
    total = 0.0
    found = False
    for num, unit in re.findall(
            r"([0-9]*\.?[0-9]+)\s*([a-zA-Zµ]+)", s):
        u = _TD_UNITS.get(unit.lower())
        if u is None:
            raise ValueError(f"unknown time unit '{unit}' in '{s}'")
        total += float(num) * u
        found = True
    if not found:
        raise ValueError(f"cannot parse time delta from '{s}'")
    return total


register("parseTimeDelta",
         lambda ts: dt.Float64.with_nullable(ts[0].nullable),
         _SLUT(lambda s: np.float64(_parse_time_delta(s)), np.float64))

register("space", lambda ts: dt.String,
         _eager_rowfn(lambda n: " " * max(int(n), 0)))

# UTF8 spellings: python string ops are already unicode-aware
for _name, _base in (("initcapUTF8", "initcap"),
                     ("leftPadUTF8", "leftPad"),
                     ("rightPadUTF8", "rightPad")):
    register(_name, FUNCTIONS[_base]._resolve, FUNCTIONS[_base]._execute)


def _concat_ws_exec(args, out_dtype):
    """concatWithSeparator(sep, s...): interleave the constant separator
    and reuse concat's LUT machinery."""
    if not args:
        raise TypeError_("concatWithSeparator expects a separator")
    sep = args[0]
    inter = []
    for i, a in enumerate(args[1:]):
        if i:
            inter.append(ColVal(sep.dtype, sep.data, sep.validity,
                                sep.dictionary))
        inter.append(a)
    return FUNCTIONS["concat"]._execute(inter, out_dtype)


register("concatWithSeparator", lambda ts: dt.String.with_nullable(
    any(t.nullable for t in ts[1:])), _concat_ws_exec)
register("concat_ws", lambda ts: dt.String.with_nullable(
    any(t.nullable for t in ts[1:])), _concat_ws_exec,
    case_insensitive=True)


# ------------------------------------------------------- string similarity
# Constant second argument (the needle), like editDistance above.

def _const_needle(args, name):
    if args[1].dictionary is None or len(args[1].dictionary.values) != 1:
        raise TypeError_(f"{name} expects a constant second argument")
    return str(args[1].dictionary.values[0])


def _damerau(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + cost)
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] \
                    and a[i - 2] == b[j - 1]:
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[la][lb]


def _jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if not la or not lb:
        return 0.0
    win = max(la, lb) // 2 - 1
    ma = [False] * la
    mb = [False] * lb
    matches = 0
    for i in range(la):
        for j in range(max(0, i - win), min(lb, i + win + 1)):
            if not mb[j] and a[i] == b[j]:
                ma[i] = mb[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if ma[i]:
            while not mb[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3.0


def _jaro_winkler(a: str, b: str) -> float:
    j = _jaro(a, b)
    pre = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        pre += 1
    return j + pre * 0.1 * (1.0 - j)


def _ngrams(s: str, n: int = 4):
    s = f" {s.lower()} "
    if len(s) < n:
        return {s}
    return {s[i:i + n] for i in range(len(s) - n + 1)}


def _ngram_distance(a: str, b: str) -> float:
    sa, sb = _ngrams(a), _ngrams(b)
    union = len(sa | sb)
    return (union - len(sa & sb)) / union if union else 0.0


def _ngram_search(a: str, b: str) -> float:
    """Asymmetric: how much of needle b's n-grams appear in haystack a."""
    sa, sb = _ngrams(a), _ngrams(b)
    return len(sa & sb) / len(sb) if sb else 0.0


def _two_string_metric(py_fn, np_dtype, name):
    def ex(args, out_dtype):
        needle = _const_needle(args, name)
        return _SLUT(lambda s: np_dtype(py_fn(s, needle)),
                     np_dtype)([args[0]], out_dtype)
    return ex


register("damerauLevenshteinDistance",
         lambda ts: dt.UInt64.with_nullable(ts[0].nullable),
         _two_string_metric(_damerau, np.uint64,
                            "damerauLevenshteinDistance"))
register("jaroSimilarity",
         lambda ts: dt.Float64.with_nullable(ts[0].nullable),
         _two_string_metric(_jaro, np.float64, "jaroSimilarity"))
register("jaroWinklerSimilarity",
         lambda ts: dt.Float64.with_nullable(ts[0].nullable),
         _two_string_metric(_jaro_winkler, np.float64,
                            "jaroWinklerSimilarity"))
register("ngramDistance",
         lambda ts: dt.Float64.with_nullable(ts[0].nullable),
         _two_string_metric(_ngram_distance, np.float64, "ngramDistance"))
register("ngramSearch",
         lambda ts: dt.Float64.with_nullable(ts[0].nullable),
         _two_string_metric(_ngram_search, np.float64, "ngramSearch"))


# -------------------------------------------------------------- IP parsers

def _ip_or_null(v6: bool):
    import socket

    def ex(args, out_dtype):
        a = args[0]
        if a.dictionary is None:
            raise TypeError_("toIPv*OrNull expects a String argument")
        vals = a.dictionary.values
        out = np.zeros(len(vals), np.uint64 if not v6 else object)
        ok = np.zeros(len(vals), np.bool_)
        for i, s in enumerate(vals):
            try:
                if v6:
                    socket.inet_pton(socket.AF_INET6, str(s))
                    out[i] = str(s)
                else:
                    out[i] = np.uint64(int.from_bytes(
                        socket.inet_aton(str(s)), "big"))
                ok[i] = True
            except (OSError, ValueError):
                ok[i] = False
        codes = jnp.maximum(a.data, 0)
        okv = jnp.asarray(ok)[codes]
        valid = okv if a.validity is None else (okv & a.validity)
        if v6:
            return ColVal(out_dtype, a.data, valid,
                          Dictionary(np.where(ok, out, "::").astype(object)))
        lut = jnp.asarray(out.astype(np.uint32))
        return ColVal(out_dtype, lut[codes], valid)
    return ex


register("toIPv4OrNull", lambda ts: dt.Nullable(dt.IPv4),
         _ip_or_null(False))
register("toIPv6OrNull", lambda ts: dt.Nullable(dt.IPv6), _ip_or_null(True))


# ----------------------------------------------------------- array motion

def _exec_array_rotate(left: bool):
    def ex(args, out_dtype):
        a = args[0]
        mat = a.data if getattr(a.data, "ndim", 0) == 2 else a.data[None, :]
        L = mat.shape[-1]
        lens = a.lengths
        lens_b = jnp.broadcast_to(jnp.asarray(lens, jnp.int64),
                                  (mat.shape[0],)) \
            if getattr(lens, "ndim", 0) == 0 else lens.astype(jnp.int64)
        n = args[1].data.astype(jnp.int64)
        n_b = jnp.broadcast_to(n, (mat.shape[0],)) \
            if getattr(n, "ndim", 0) == 0 else n
        if not left:
            n_b = -n_b
        ln = jnp.maximum(lens_b, 1)
        idx = (jnp.arange(L, dtype=jnp.int64)[None, :]
               + n_b[:, None]) % ln[:, None]
        idx = jnp.where(idx < 0, idx + ln[:, None], idx)
        out = jnp.take_along_axis(mat, jnp.clip(idx, 0, L - 1), axis=1)
        live = jnp.arange(L, dtype=jnp.int64)[None, :] < lens_b[:, None]
        out = jnp.where(live, out, jnp.zeros((), mat.dtype))
        if getattr(a.data, "ndim", 0) != 2:
            out = out[0]
        return ColVal(out_dtype, out, a.validity, a.dictionary,
                      lengths=a.lengths)
    return ex


def _exec_array_shift(left: bool):
    def ex(args, out_dtype):
        a = args[0]
        mat = a.data if getattr(a.data, "ndim", 0) == 2 else a.data[None, :]
        L = mat.shape[-1]
        lens = a.lengths
        lens_b = jnp.broadcast_to(jnp.asarray(lens, jnp.int64),
                                  (mat.shape[0],)) \
            if getattr(lens, "ndim", 0) == 0 else lens.astype(jnp.int64)
        n = args[1].data.astype(jnp.int64)
        n_b = jnp.broadcast_to(n, (mat.shape[0],)) \
            if getattr(n, "ndim", 0) == 0 else n
        if not left:
            n_b = -n_b
        fill = args[2].data if len(args) > 2 else jnp.zeros((), mat.dtype)
        idx = jnp.arange(L, dtype=jnp.int64)[None, :] + n_b[:, None]
        oob = (idx < 0) | (idx >= lens_b[:, None])
        out = jnp.take_along_axis(mat, jnp.clip(idx, 0, L - 1), axis=1)
        out = jnp.where(oob, jnp.asarray(fill, mat.dtype), out)
        live = jnp.arange(L, dtype=jnp.int64)[None, :] < lens_b[:, None]
        out = jnp.where(live, out, jnp.zeros((), mat.dtype))
        if getattr(a.data, "ndim", 0) != 2:
            out = out[0]
        return ColVal(out_dtype, out, a.validity, a.dictionary,
                      lengths=a.lengths)
    return ex


register("arrayRotateLeft", lambda ts: ts[0], _exec_array_rotate(True))
register("arrayRotateRight", lambda ts: ts[0], _exec_array_rotate(False))
register("arrayShiftLeft", lambda ts: ts[0], _exec_array_shift(True))
register("arrayShiftRight", lambda ts: ts[0], _exec_array_shift(False))


def _exec_array_shuffle(args, out_dtype):
    """Deterministic per-query permutation (reference uses a thread RNG)."""
    import random as _pyrandom
    a = args[0]
    mat = a.data if getattr(a.data, "ndim", 0) == 2 else a.data[None, :]
    L = mat.shape[-1]
    lens = a.lengths
    lens_b = jnp.broadcast_to(jnp.asarray(lens, jnp.int64),
                              (mat.shape[0],)) \
        if getattr(lens, "ndim", 0) == 0 else lens.astype(jnp.int64)
    key = jax.random.PRNGKey(_pyrandom.getrandbits(31))
    # per-row random sort tokens; padding sorts to the end
    tok = jax.random.uniform(key, mat.shape)
    live = jnp.arange(L, dtype=jnp.int64)[None, :] < lens_b[:, None]
    tok = jnp.where(live, tok, 2.0)
    order = jnp.argsort(tok, axis=-1)
    out = jnp.take_along_axis(mat, order, axis=1)
    out = jnp.where(live, out, jnp.zeros((), mat.dtype))
    if getattr(a.data, "ndim", 0) != 2:
        out = out[0]
    return ColVal(out_dtype, out, a.validity, a.dictionary,
                  lengths=a.lengths)


register("arrayShuffle", lambda ts: ts[0], _exec_array_shuffle)


def _exec_array_partial_sort(args, out_dtype):
    """arrayPartialSort(n, arr): first n sorted, rest unspecified order —
    a full device sort satisfies the contract."""
    return FUNCTIONS["arraySort"]._execute(args[1:], out_dtype)


register("arrayPartialSort", lambda ts: ts[1], _exec_array_partial_sort)


# ------------------------------------------------ LowCardinality introspection

register("lowCardinalityKeys", lambda ts: ts[0],
         lambda args, t: ColVal(t, args[0].data, args[0].validity,
                                args[0].dictionary))
register("lowCardinalityIndices", lambda ts: dt.UInt64,
         lambda args, t: ColVal(
             t, jnp.maximum(args[0].data, 0).astype(jnp.uint64), None))

from . import functions_ext4 as _functions_ext4  # noqa: E402,F401
