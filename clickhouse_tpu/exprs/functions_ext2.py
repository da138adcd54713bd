"""Third scalar-function batch: block/running functions, bit-exact hash
families, consistent hashing, geo, morton codes, string search, and misc
introspection — continued breadth toward the reference's src/Functions/.

Execution models follow functions.py: device elementwise for numerics,
dictionary LUTs for strings, per-row host (`_eager_rowfn`) for functions
numpy cannot vectorize (the engine retries eagerly on
RequiresMaterialization).
"""
from __future__ import annotations

import math as _math
import re

import jax.numpy as jnp
import numpy as np

from ..core import dtypes as dt
from ..core.column import Dictionary
from ..core.errors import TypeError_
from .expr import ColVal
from .functions import (FUNCTIONS, _and_validity, _numeric_data,
                        _string_fn_lut, register)
from .functions_ext import _const_int, _eager_rowfn

_SLUT = _string_fn_lut


def _const_str(cv: ColVal, name: str) -> str:
    if cv.dictionary is None or len(cv.dictionary.values) != 1:
        raise TypeError_(f"{name} expects a constant string argument")
    return str(cv.dictionary.values[0])


# ------------------------------------------------------- block/row functions
# The engine executes whole tables as one block (SURVEY §2.3: the static-
# dataflow inversion of IProcessor), so blockSize() == table rows and the
# two rowNumber functions coincide (ref: src/Functions/blockSize.cpp,
# rowNumberInBlock.cpp, rowNumberInAllBlocks.cpp).

def _exec_block_size(args, out_dtype, row_mask=None):
    if row_mask is not None and getattr(row_mask.data, "ndim", 0):
        return ColVal(out_dtype,
                      jnp.sum(row_mask.data.astype(jnp.uint64)), None)
    return ColVal(out_dtype, jnp.asarray(1, jnp.uint64), None)


def _exec_row_number(args, out_dtype, row_mask=None):
    if row_mask is None or not getattr(row_mask.data, "ndim", 0):
        return ColVal(out_dtype, jnp.asarray(0, jnp.uint64), None)
    m = row_mask.data
    # number the SURVIVING rows consecutively (masked slots get arbitrary
    # values; they are never emitted)
    idx = jnp.cumsum(m.astype(jnp.uint64)) - 1
    return ColVal(out_dtype, idx.reshape((m.shape[0],)), None)


register("blockSize", lambda ts: dt.UInt64, _exec_block_size)
FUNCTIONS["blockSize"].wants_row_mask = True
register("rowNumberInBlock", lambda ts: dt.UInt64, _exec_row_number)
FUNCTIONS["rowNumberInBlock"].wants_row_mask = True
register("rowNumberInAllBlocks", lambda ts: dt.UInt64, _exec_row_number)
FUNCTIONS["rowNumberInAllBlocks"].wants_row_mask = True


def _exec_neighbor(args, out_dtype):
    """neighbor(col, offset[, default]) — cross-row shift inside the block
    (ref: src/Functions/neighbor.cpp)."""
    a = args[0]
    off = _const_int(args[1], "neighbor")
    d = a.data
    if getattr(d, "ndim", 0) == 0:
        return a
    n = d.shape[0]
    idx = jnp.arange(n) + off
    inb = (idx >= 0) & (idx < n)
    src = jnp.clip(idx, 0, n - 1)
    out = d[src]
    if a.dtype.is_dictionary:
        vals = a.dictionary.values if a.dictionary is not None \
            else np.asarray([], object)
        if len(args) > 2:
            fill = _const_str(args[2], "neighbor")
        else:
            fill = ""
        where = np.where(vals.astype(str) == fill)[0]
        if len(where):
            fcode = int(where[0])
            nd = a.dictionary
        else:
            nd = Dictionary(np.append(vals, fill))
            fcode = len(vals)
        data = jnp.where(inb, out, fcode)
        return ColVal(a.dtype, data, a.validity, nd)
    if len(args) > 2:
        fill = args[2].data
    else:
        fill = jnp.zeros((), d.dtype)
    data = jnp.where(inb, out, jnp.asarray(fill, d.dtype))
    return ColVal(out_dtype, data, a.validity)


register("neighbor", lambda ts: ts[0], _exec_neighbor)


def _exec_running_difference(first_from_value: bool):
    def ex(args, out_dtype):
        a = args[0]
        d = _numeric_data(a)
        if getattr(d, "ndim", 0) == 0:
            z = jnp.zeros((), d.dtype)
            return ColVal(out_dtype, d - d if first_from_value is False
                          else z, a.validity)
        prev = jnp.roll(d, 1)
        diff = d - prev
        first = d[0] if first_from_value else d[0] - d[0]
        diff = diff.at[0].set(first)
        return ColVal(out_dtype, diff, a.validity)
    return ex


def _run_diff_type(ts):
    base = dt.remove_nullable(ts[0])
    out = dt.Float64 if "Float" in base.name else dt.Int64
    return out.with_nullable(ts[0].nullable)


register("runningDifference", _run_diff_type,
         _exec_running_difference(False))
register("runningDifferenceStartingWithFirstValue", _run_diff_type,
         _exec_running_difference(True))


# --------------------------------------------------------- bit-exact hashes
# Reference hash functions hash each argument's raw memory: strings hash
# their bytes, integers their little-endian fixed-width bytes
# (ref: src/Functions/FunctionsHashing.h).

def _arg_bytes(v) -> bytes:
    if isinstance(v, str):
        return v.encode("utf-8", "surrogateescape")
    if isinstance(v, bytes):
        return v
    if isinstance(v, (bool, np.bool_)):
        return bytes([int(v)])
    if isinstance(v, (float, np.floating)):
        return np.float64(v).tobytes()
    iv = int(v)
    width = 8
    if isinstance(v, np.integer):
        width = v.dtype.itemsize
    return iv.to_bytes(width, "little", signed=iv < 0)


_M64 = (1 << 64) - 1
_M32 = (1 << 32) - 1


def _rotl64(x, r):
    return ((x << r) | (x >> (64 - r))) & _M64


def _rotl32(x, r):
    return ((x << r) | (x >> (32 - r))) & _M32


def xxhash64(data: bytes, seed: int = 0) -> int:
    """xxHash64 (public algorithm spec, github.com/Cyan4973/xxHash)."""
    P1, P2, P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
    P4, P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M64
        v2 = (seed + P2) & _M64
        v3 = seed & _M64
        v4 = (seed - P1) & _M64
        while i + 32 <= n:
            for k, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 8 * k:i + 8 * k + 8], "little")
                v = _rotl64((v + lane * P2) & _M64, 31) * P1 & _M64
                if k == 0:
                    v1 = v
                elif k == 1:
                    v2 = v
                elif k == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12)
             + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= _rotl64((v * P2) & _M64, 31) * P1 & _M64
            h = (h * P1 + P4) & _M64
    else:
        h = (seed + P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        lane = int.from_bytes(data[i:i + 8], "little")
        h ^= _rotl64((lane * P2) & _M64, 31) * P1 & _M64
        h = (_rotl64(h, 27) * P1 + P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= int.from_bytes(data[i:i + 4], "little") * P1 & _M64
        h = (_rotl64(h, 23) * P2 + P3) & _M64
        i += 4
    while i < n:
        h ^= data[i] * P5 & _M64
        h = _rotl64(h, 11) * P1 & _M64
        i += 1
    h ^= h >> 33
    h = (h * P2) & _M64
    h ^= h >> 29
    h = (h * P3) & _M64
    h ^= h >> 32
    return h


def xxhash32(data: bytes, seed: int = 0) -> int:
    P1, P2, P3, P4, P5 = (2654435761, 2246822519, 3266489917,
                          668265263, 374761393)
    n = len(data)
    i = 0
    if n >= 16:
        v1, v2 = (seed + P1 + P2) & _M32, (seed + P2) & _M32
        v3, v4 = seed & _M32, (seed - P1) & _M32
        while i + 16 <= n:
            vs = [v1, v2, v3, v4]
            for k in range(4):
                lane = int.from_bytes(data[i + 4 * k:i + 4 * k + 4], "little")
                vs[k] = (_rotl32((vs[k] + lane * P2) & _M32, 13) * P1) & _M32
            v1, v2, v3, v4 = vs
            i += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12)
             + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        h = (h + int.from_bytes(data[i:i + 4], "little") * P3) & _M32
        h = (_rotl32(h, 17) * P4) & _M32
        i += 4
    while i < n:
        h = (h + data[i] * P5) & _M32
        h = (_rotl32(h, 11) * P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * P2) & _M32
    h ^= h >> 13
    h = (h * P3) & _M32
    h ^= h >> 16
    return h


def murmurhash2_64(data: bytes, seed: int = 0) -> int:
    """MurmurHash64A (public domain, Austin Appleby)."""
    m = 0xC6A4A7935BD1E995
    r = 47
    h = (seed ^ (len(data) * m)) & _M64
    i = 0
    while i + 8 <= len(data):
        k = int.from_bytes(data[i:i + 8], "little")
        k = (k * m) & _M64
        k ^= k >> r
        k = (k * m) & _M64
        h = ((h ^ k) * m) & _M64
        i += 8
    tail = data[i:]
    if tail:
        h ^= int.from_bytes(tail, "little")
        h = (h * m) & _M64
    h ^= h >> r
    h = (h * m) & _M64
    h ^= h >> r
    return h


def murmurhash2_32(data: bytes, seed: int = 0) -> int:
    m = 0x5BD1E995
    h = (seed ^ len(data)) & _M32
    i = 0
    while i + 4 <= len(data):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * m) & _M32
        k ^= k >> 24
        k = (k * m) & _M32
        h = ((h * m) & _M32) ^ k
        i += 4
    tail = data[i:]
    if len(tail) >= 3:
        h ^= tail[2] << 16
    if len(tail) >= 2:
        h ^= tail[1] << 8
    if len(tail) >= 1:
        h ^= tail[0]
        h = (h * m) & _M32
    h ^= h >> 13
    h = (h * m) & _M32
    h ^= h >> 15
    return h


def murmurhash3_32(data: bytes, seed: int = 0) -> int:
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _M32
    i = 0
    while i + 4 <= len(data):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & _M32
        k = _rotl32(k, 15)
        k = (k * c2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
        i += 4
    k = 0
    tail = data[i:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & _M32
        k = _rotl32(k, 15)
        k = (k * c2) & _M32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def _mmh3_fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmurhash3_64(data: bytes, seed: int = 0) -> int:
    """Low 64 bits of MurmurHash3_x64_128 (the reference's murmurHash3_64
    truncation, src/Functions/FunctionsHashing.h MurmurHash3Impl64)."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed & _M64
    n = len(data)
    nblocks = n // 16
    for b in range(nblocks):
        k1 = int.from_bytes(data[16 * b:16 * b + 8], "little")
        k2 = int.from_bytes(data[16 * b + 8:16 * b + 16], "little")
        k1 = _rotl64((k1 * c1) & _M64, 31) * c2 & _M64
        h1 = ((_rotl64(h1 ^ k1, 27) + h2) * 5 + 0x52DCE729) & _M64
        k2 = _rotl64((k2 * c2) & _M64, 33) * c1 & _M64
        h2 = ((_rotl64(h2 ^ k2, 31) + h1) * 5 + 0x38495AB5) & _M64
    tail = data[16 * nblocks:]
    k1 = k2 = 0
    for j in range(len(tail) - 1, 7, -1):
        k2 |= tail[j] << (8 * (j - 8))
    for j in range(min(len(tail), 8) - 1, -1, -1):
        k1 |= tail[j] << (8 * j)
    if len(tail) > 8:
        k2 = _rotl64((k2 * c2) & _M64, 33) * c1 & _M64
        h2 ^= k2
    if len(tail) > 0:
        k1 = _rotl64((k1 * c1) & _M64, 31) * c2 & _M64
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _mmh3_fmix64(h1)
    h2 = _mmh3_fmix64(h2)
    h1 = (h1 + h2) & _M64
    return h1


def _hash_fn_register(name, pyfn, out_dt, np_t):
    def ex(args, out_dtype):
        a = args[0]
        if len(args) == 1 and a.dtype.is_dictionary:
            return _SLUT(
                lambda s: np_t(pyfn(s.encode("utf-8", "surrogateescape"))),
                np_t)(args, out_dtype)
        return _eager_rowfn(lambda *vs: np_t(pyfn(b"".join(
            _arg_bytes(v) for v in vs))), result="num")(args, out_dtype)
    register(name, lambda ts: out_dt, ex)


_hash_fn_register("xxHash32", xxhash32, dt.UInt32, np.uint32)
_hash_fn_register("xxHash64", xxhash64, dt.UInt64, np.uint64)
_hash_fn_register("murmurHash2_32", murmurhash2_32, dt.UInt32, np.uint32)
_hash_fn_register("murmurHash2_64", murmurhash2_64, dt.UInt64, np.uint64)
_hash_fn_register("murmurHash3_32", murmurhash3_32, dt.UInt32, np.uint32)
_hash_fn_register("murmurHash3_64", murmurhash3_64, dt.UInt64, np.uint64)
_hash_fn_register("gccMurmurHash", lambda b: murmurhash2_64(b, 0xc70f6907),
                  dt.UInt64, np.uint64)


def _hivehash(s: str) -> np.int32:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) & 0xFFFFFFFF
    return np.int32(h & 0x7FFFFFFF)   # javaHash with the sign bit cleared


register("hiveHash", lambda ts: dt.Int32.with_nullable(ts[0].nullable),
         _SLUT(_hivehash, np.int32))


def _jump_consistent_hash(key: int, buckets: int) -> np.int32:
    """Lamping-Veach jump consistent hash — bit-exact
    (ref: src/Functions/jumpConsistentHash.cpp)."""
    key &= _M64
    b, j = -1, 0
    while j < buckets:
        b = j
        key = (key * 2862933555777941757 + 1) & _M64
        j = int((b + 1) * ((1 << 31) / ((key >> 33) + 1)))
    return np.int32(b)


register("jumpConsistentHash", lambda ts: dt.Int32,
         _eager_rowfn(lambda k, n: _jump_consistent_hash(int(k), int(n)),
                      result="num"))


# ------------------------------------------------------------------- geo
_EARTH_R = 6371007.180918475   # mean radius used by greatCircleDistance


def _haversine_m(lon1, lat1, lon2, lat2):
    la1, la2 = jnp.radians(lat1), jnp.radians(lat2)
    dlat = la2 - la1
    dlon = jnp.radians(lon2 - lon1)
    a = jnp.sin(dlat / 2) ** 2 + jnp.cos(la1) * jnp.cos(la2) \
        * jnp.sin(dlon / 2) ** 2
    return 2 * _EARTH_R * jnp.arcsin(jnp.sqrt(jnp.clip(a, 0.0, 1.0)))


def _exec_great_circle(angle: bool):
    def ex(args, out_dtype):
        lon1, lat1, lon2, lat2 = [
            _numeric_data(a).astype(jnp.float64) for a in args[:4]]
        m = _haversine_m(lon1, lat1, lon2, lat2)
        if angle:
            m = jnp.degrees(m / _EARTH_R)
        return ColVal(out_dtype, m.astype(jnp.float32),
                      _and_validity(args))
    return ex


register("greatCircleDistance", lambda ts: dt.Float32.with_nullable(
    any(t.nullable for t in ts)), _exec_great_circle(False))
register("geoDistance", lambda ts: dt.Float32.with_nullable(
    any(t.nullable for t in ts)), _exec_great_circle(False))
register("greatCircleAngle", lambda ts: dt.Float32.with_nullable(
    any(t.nullable for t in ts)), _exec_great_circle(True))

_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_encode(lon: float, lat: float, prec: int = 12) -> str:
    prec = max(1, min(int(prec) or 12, 12))
    lo = [-180.0, 180.0]
    la = [-90.0, 90.0]
    bits, ch, out, even = 0, 0, [], True
    while len(out) < prec:
        if even:
            mid = (lo[0] + lo[1]) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lo[0] = mid
            else:
                ch *= 2
                lo[1] = mid
        else:
            mid = (la[0] + la[1]) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                la[0] = mid
            else:
                ch *= 2
                la[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(_GEOHASH32[ch])
            bits, ch = 0, 0
    return "".join(out)


register("geohashEncode", lambda ts: dt.String,
         _eager_rowfn(lambda lon, lat, prec=12: _geohash_encode(
             float(lon), float(lat), int(prec))))


def _morton_encode(*vals) -> np.uint64:
    n = len(vals)
    out = 0
    for bit in range(64 // n):
        for k, v in enumerate(vals):
            out |= ((int(v) >> bit) & 1) << (bit * n + k)
    return np.uint64(out)


register("mortonEncode", lambda ts: dt.UInt64,
         _eager_rowfn(_morton_encode, result="num"))


# ------------------------------------------------------------ string search
def _const_pattern(args, idx, name):
    return _const_str(args[idx], name)


def _exec_regexp_extract(args, out_dtype):
    pat = _const_pattern(args, 1, "regexpExtract")
    idx = _const_int(args[2], "regexpExtract") if len(args) > 2 else 1
    rx = re.compile(pat)

    def f(s):
        m = rx.search(s)
        if not m:
            return ""
        try:
            return m.group(idx) or ""
        except IndexError:
            return ""
    return _SLUT(f, object)([args[0]], out_dtype)


register("regexpExtract", lambda ts: dt.String.with_nullable(
    ts[0].nullable), _exec_regexp_extract, case_insensitive=True)


def _exec_count_matches(ci: bool):
    def ex(args, out_dtype):
        pat = _const_pattern(args, 1, "countMatches")
        rx = re.compile(pat, re.IGNORECASE if ci else 0)
        return _SLUT(lambda s: np.uint64(sum(
            1 for m in rx.finditer(s) if m.end() > m.start() or True)),
            np.uint64)([args[0]], out_dtype)
    return ex


register("countMatches", lambda ts: dt.UInt64.with_nullable(ts[0].nullable),
         _exec_count_matches(False))
register("countMatchesCaseInsensitive",
         lambda ts: dt.UInt64.with_nullable(ts[0].nullable),
         _exec_count_matches(True))


_TOKEN_SEP = re.compile(r"[^A-Za-z0-9_]+")


def _exec_has_token(ci: bool):
    def ex(args, out_dtype):
        tok = _const_str(args[1], "hasToken")
        if ci:
            tok = tok.lower()

        def f(s):
            hay = s.lower() if ci else s
            return np.uint8(tok in _TOKEN_SEP.split(hay))
        return _SLUT(f, np.uint8)([args[0]], out_dtype)
    return ex


register("hasToken", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _exec_has_token(False))
register("hasTokenCaseInsensitive",
         lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _exec_has_token(True))

if "positionCaseInsensitive" in FUNCTIONS:
    register("positionCaseInsensitiveUTF8",
             FUNCTIONS["positionCaseInsensitive"]._resolve,
             FUNCTIONS["positionCaseInsensitive"]._execute)


def _exec_multi_search_first_position(args, out_dtype):
    needles = args[1]
    if needles.dictionary is None:
        raise TypeError_("multiSearchFirstPosition expects constant needles")
    vals = [str(v) for v in needles.dictionary.values]

    def f(s):
        best = 0
        for nd in vals:
            p = s.find(nd)
            if p >= 0 and (best == 0 or p + 1 < best):
                best = p + 1
        return np.uint64(best)
    return _SLUT(f, np.uint64)([args[0]], out_dtype)


register("multiSearchFirstPosition",
         lambda ts: dt.UInt64.with_nullable(ts[0].nullable),
         _exec_multi_search_first_position)


_NORM_LIT = re.compile(
    r"(?<![a-zA-Z_0-9])-?\d+(\.\d+)?([eE][+-]?\d+)?|'(?:[^'\\]|\\.)*'")
_NORM_WS = re.compile(r"\s+")
_NORM_LIST = re.compile(r"\?(?:\s*,\s*\?)+")


def _normalize_query(q: str) -> str:
    """Literal-erasing query normalizer
    (ref: src/Common/SensitiveDataMasker + normalizeQuery.cpp semantics:
    literals -> '?', literal lists -> '?..')."""
    out = _NORM_LIT.sub("?", q)
    out = _NORM_WS.sub(" ", out).strip()
    out = _NORM_LIST.sub("?..", out)
    return out


register("normalizeQuery", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _SLUT(_normalize_query, object))
register("normalizedQueryHash",
         lambda ts: dt.UInt64.with_nullable(ts[0].nullable),
         _SLUT(lambda s: np.uint64(xxhash64(
             _normalize_query(s).encode())), np.uint64))


def _jaccard(a: str, b: str) -> np.float64:
    sa, sb = set(a.encode()), set(b.encode())
    if not sa and not sb:
        return np.float64(0.0)
    return np.float64(len(sa & sb) / len(sa | sb))


register("stringJaccardIndex", lambda ts: dt.Float64.with_nullable(
    any(t.nullable for t in ts)),
    _eager_rowfn(_jaccard, result="num"))


# ------------------------------------------------------------------ dates
def _yearweek(y: int, m: int, d: int, mode: int = 0):
    """MySQL-compatible YEARWEEK (ref: src/Functions/toYearWeek.cpp via
    DateLUtImpl::toYearWeek; modes 0-7, default 0 = week starts Sunday,
    week 1 requires a Sunday in the year)."""
    import datetime as _dtm
    day = _dtm.date(y, m, d)
    if mode in (1, 3):   # ISO week
        iso = day.isocalendar()
        return iso[0] * 100 + iso[1]
    # modes 0/2: week starts Sunday; week 1 = first week containing a Sunday
    jan1 = _dtm.date(y, 1, 1)
    # days since the Sunday on/before jan1
    off = (jan1.weekday() + 1) % 7   # 0 if jan1 is Sunday
    doy = (day - jan1).days
    week = (doy + off) // 7
    if off == 0:
        week += 1
    if week == 0:
        # belongs to last week of previous year
        return _yearweek(y - 1, 12, 31, mode)
    return y * 100 + week


def _exec_to_yearweek(args, out_dtype):
    mode = _const_int(args[1], "toYearWeek") if len(args) > 1 else 0
    from .functions import _as_days, _civil_from_days
    days = np.asarray(_as_days(args[0]).astype(jnp.int64))
    y, m, d = (np.asarray(v) for v in _civil_from_days(jnp.asarray(days)))
    out = np.asarray([_yearweek(int(yy), int(mm), int(dd), mode)
                      for yy, mm, dd in zip(
                          np.atleast_1d(y), np.atleast_1d(m),
                          np.atleast_1d(d))], np.uint32)
    if np.ndim(y) == 0:
        out = out[0]
    return ColVal(out_dtype, jnp.asarray(out), _and_validity(args[:1]))


register("toYearWeek", lambda ts: dt.UInt32.with_nullable(ts[0].nullable),
         _exec_to_yearweek, case_insensitive=True)


_DATE_PARTS = {
    "year": "%Y", "quarter": None, "month": "%B", "week": None,
    "dayofyear": "%j", "day": "%d", "weekday": "%A", "hour": "%H",
    "minute": "%M", "second": "%S",
}


def _exec_date_name(args, out_dtype):
    part = _const_str(args[0], "dateName").lower()
    import datetime as _dtm
    from .functions import _as_days
    a = args[1]
    base = dt.remove_nullable(a.dtype)
    if base.name.startswith("DateTime"):
        secs = np.asarray(a.data).astype(np.int64)
    else:
        secs = np.asarray(_as_days(a)).astype(np.int64) * 86400

    def f(s):
        t = _dtm.datetime(1970, 1, 1) + _dtm.timedelta(seconds=int(s))
        if part == "quarter":
            return str((t.month - 1) // 3 + 1)
        if part == "week":
            return str(t.isocalendar()[1])
        fmt = _DATE_PARTS.get(part)
        if fmt is None:
            raise TypeError_(f"dateName: unknown part '{part}'")
        v = t.strftime(fmt)
        return v.lstrip("0") if part in ("day", "hour", "minute",
                                         "second") and v != "0" else v
    texts = np.asarray([f(s) for s in np.atleast_1d(secs)], object)
    uniq, codes = np.unique(texts.astype(str), return_inverse=True)
    data = jnp.asarray(codes.astype(np.int32))
    if np.ndim(secs) == 0:
        data = data.reshape(())
    return ColVal(out_dtype, data, _and_validity(args[1:]),
                  Dictionary(uniq.astype(object), sorted_=True))


register("dateName", lambda ts: dt.String.with_nullable(ts[1].nullable),
         _exec_date_name, case_insensitive=True)


# Modified Julian Day: days since 1858-11-17 == unix days + 40587
register("toModifiedJulianDay", lambda ts: dt.Int32.with_nullable(
    ts[0].nullable),
    _SLUT(lambda s: np.int32(
        (np.datetime64(s, "D") - np.datetime64("1970-01-01", "D"))
        .astype(int) + 40587), np.int32))
register("fromModifiedJulianDay", lambda ts: dt.String.with_nullable(
    ts[0].nullable),
    _eager_rowfn(lambda v: str(np.datetime64("1970-01-01", "D")
                               + np.timedelta64(int(v) - 40587, "D"))))


# ------------------------------------------------------------------- misc
def _exec_width_bucket(args, out_dtype):
    x, lo, hi, cnt = [_numeric_data(a).astype(jnp.float64) for a in args]
    w = (hi - lo) / jnp.maximum(cnt, 1)
    b = jnp.floor((x - lo) / jnp.where(w == 0, 1.0, w)) + 1
    b = jnp.where(x < lo, 0, b)
    b = jnp.where(x >= hi, cnt + 1, b)
    return ColVal(out_dtype, b.astype(jnp.uint64), _and_validity(args))


register("widthBucket", lambda ts: dt.UInt64.with_nullable(
    any(t.nullable for t in ts)), _exec_width_bucket,
    case_insensitive=True)

register("indexHint", lambda ts: dt.UInt8,
         lambda args, t: ColVal(t, jnp.asarray(1, jnp.uint8), None))


def _exec_to_column_type_name(args, out_dtype):
    name = args[0].dtype.name
    return ColVal(out_dtype, jnp.zeros((), jnp.int32), None,
                  Dictionary(np.asarray([name], object)))


register("toColumnTypeName", lambda ts: dt.String,
         _exec_to_column_type_name)


def _exec_default_value_of_arg(args, out_dtype):
    base = dt.remove_nullable(args[0].dtype)
    if base.is_dictionary:
        return ColVal(dt.String, jnp.zeros((), jnp.int32), None,
                      Dictionary(np.asarray([""], object)))
    return ColVal(base, jnp.zeros((), base.np_dtype
                                  if not base.is_dictionary else jnp.int32),
                  None)


register("defaultValueOfArgumentType", lambda ts: dt.remove_nullable(ts[0]),
         _exec_default_value_of_arg)


def _exec_byte_size(args, out_dtype):
    total = None
    n = 1
    for a in args:
        if getattr(a.data, "ndim", 0) >= 1:
            n = max(n, a.data.shape[0])
    for a in args:
        base = dt.remove_nullable(a.dtype)
        if base.is_dictionary:
            lens = _SLUT(lambda s: np.uint64(len(s.encode()) + 9),
                         np.uint64)([a], dt.UInt64)
            part = lens.data
        else:
            part = jnp.asarray(np.dtype(base.np_dtype).itemsize, jnp.uint64)
        part = jnp.broadcast_to(part, (n,)) if n > 1 else part
        total = part if total is None else total + part
    return ColVal(out_dtype, total, _and_validity(args))


register("byteSize", lambda ts: dt.UInt64, _exec_byte_size)


def _exec_to_decimal_string(args, out_dtype):
    scale = _const_int(args[1], "toDecimalString")

    def f(v):
        return f"{float(v):.{max(0, min(scale, 77))}f}"
    return _eager_rowfn(f)([args[0]], out_dtype)


register("toDecimalString", lambda ts: dt.String.with_nullable(
    ts[0].nullable), _exec_to_decimal_string)

from . import functions_ext3 as _functions_ext3  # noqa: E402,F401
