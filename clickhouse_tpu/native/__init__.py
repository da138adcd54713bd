"""Native (C++) runtime components, loaded via ctypes.

Provides the host-side hot loops the reference keeps in C++
(SURVEY.md §2.1 compression codecs + Native format serialization):

  * lz4_compress / lz4_decompress       -- LZ4 block codec
  * encode_strings / decode_strings     -- Native-format varint string columns
  * hash64                              -- splitmix64 (matches ops.hash_ops)

Falls back to pure-Python implementations when the toolchain is unavailable
(`HAVE_NATIVE` tells you which you got).
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["HAVE_NATIVE", "lz4_compress", "lz4_decompress",
           "encode_strings", "decode_strings", "hash64_np",
           "cityhash128_rows",
           "delta_encode", "delta_decode", "dd_encode", "dd_decode",
           "gorilla_encode", "gorilla_decode", "t64_encode", "t64_decode",
           "cityhash128"]

_lib = None
HAVE_NATIVE = False


def _load():
    global _lib, HAVE_NATIVE
    if _lib is not None:
        return _lib
    try:
        from .build import build
        path = build()
        lib = ctypes.CDLL(path)
        lib.chn_lz4_compress.restype = ctypes.c_int
        lib.chn_lz4_compress.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                         ctypes.c_void_p, ctypes.c_int]
        lib.chn_lz4_decompress.restype = ctypes.c_int
        lib.chn_lz4_decompress.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                           ctypes.c_void_p, ctypes.c_int]
        lib.chn_write_strcol.restype = ctypes.c_longlong
        lib.chn_write_strcol.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                         ctypes.c_longlong, ctypes.c_void_p,
                                         ctypes.c_longlong]
        lib.chn_read_strcol.restype = ctypes.c_longlong
        lib.chn_read_strcol.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                                        ctypes.c_longlong, ctypes.c_void_p,
                                        ctypes.c_void_p, ctypes.c_longlong]
        lib.chn_hash64.restype = None
        lib.chn_hash64.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                                   ctypes.c_void_p]
        lib.chn_cityhash128_rows.restype = None
        lib.chn_cityhash128_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_void_p]
        lib.chn_cityhash128.restype = None
        lib.chn_cityhash128.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                        ctypes.c_void_p]
        for nm in ("chn_delta_encode", "chn_delta_decode"):
            fn = getattr(lib, nm)
            fn.restype = None
            fn.argtypes = [ctypes.c_void_p, ctypes.c_longlong, ctypes.c_int,
                           ctypes.c_void_p]
        for nm in ("chn_dd_encode", "chn_gorilla_encode", "chn_t64_encode"):
            fn = getattr(lib, nm)
            fn.restype = ctypes.c_longlong
            fn.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                           ctypes.c_void_p]
        for nm in ("chn_dd_decode", "chn_gorilla_decode", "chn_t64_decode"):
            fn = getattr(lib, nm)
            fn.restype = ctypes.c_longlong
            fn.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                           ctypes.c_longlong, ctypes.c_void_p]
        _lib = lib
        HAVE_NATIVE = True
    except Exception:
        _lib = False
        HAVE_NATIVE = False
    return _lib


# -- LZ4 block codec ---------------------------------------------------------

def lz4_compress(data: bytes) -> bytes:
    lib = _load()
    if lib:
        cap = len(data) + len(data) // 250 + 64
        dst = ctypes.create_string_buffer(cap)
        n = lib.chn_lz4_compress(data, len(data), dst, cap)
        if n < 0:
            raise ValueError("lz4 compression overflow")
        return dst.raw[:n]
    return _py_lz4_compress(data)


def lz4_decompress(data: bytes, decompressed_size: int) -> bytes:
    lib = _load()
    if lib:
        dst = ctypes.create_string_buffer(decompressed_size)
        n = lib.chn_lz4_decompress(data, len(data), dst, decompressed_size)
        if n != decompressed_size:
            raise ValueError(f"lz4 decompression failed ({n})")
        return dst.raw
    return _py_lz4_decompress(data, decompressed_size)


# -- CityHash128 v1.0.2 (wire-frame checksums) --------------------------------

def cityhash128(data: bytes) -> bytes:
    """16-byte checksum: low64 LE ++ high64 LE, matching the reference's
    compressed-frame checksums (src/Compression/CompressedWriteBuffer.cpp)."""
    lib = _load()
    if lib:
        out = (ctypes.c_uint64 * 2)()
        lib.chn_cityhash128(data, len(data), out)
        import struct
        return struct.pack("<QQ", out[0], out[1])
    return _py_cityhash128(data)


_M64 = (1 << 64) - 1
_CK0 = 0xC3A5C85C97CB3127
_CK1 = 0xB492B66FBE98F273
_CK2 = 0x9AE16A3B2F90404F
_CK3 = 0xC949D7C7509E6557


def _py_cityhash128(data: bytes) -> bytes:
    """Pure-Python CityHash128 v1.0.2 (toolchain-less fallback)."""
    import struct

    def rot(v, s):
        return v if s == 0 else ((v >> s) | (v << (64 - s))) & _M64

    def mix(v):
        return v ^ (v >> 47)

    def f64(s, i=0):
        return struct.unpack_from("<Q", s, i)[0]

    def f32(s, i=0):
        return struct.unpack_from("<I", s, i)[0]

    def h16(u, v):
        m = 0x9DDFEA08EB382D69
        a = ((u ^ v) * m) & _M64
        a ^= a >> 47
        b = ((v ^ a) * m) & _M64
        b ^= b >> 47
        return (b * m) & _M64

    def short(s):
        n = len(s)
        if n > 8:
            a, b = f64(s), f64(s, n - 8)
            return h16(a, rot((b + n) & _M64, n)) ^ b
        if n >= 4:
            return h16((n + (f32(s) << 3)) & _M64, f32(s, n - 4))
        if n > 0:
            y = s[0] + (s[n >> 1] << 8)
            z = n + (s[n - 1] << 2)
            return (mix((y * _CK2 ^ z * _CK3) & _M64) * _CK2) & _M64
        return _CK2

    def weak32(s, o, a, b):
        w, x = f64(s, o), f64(s, o + 8)
        y, z = f64(s, o + 16), f64(s, o + 24)
        a = (a + w) & _M64
        b = rot((b + a + z) & _M64, 21)
        c = a
        a = (a + x + y) & _M64
        b = (b + rot(a, 44)) & _M64
        return (a + z) & _M64, (b + c) & _M64

    def murmur(s, sa, sb):
        n = len(s)
        a, b, c, d = sa, sb, 0, 0
        if n <= 16:
            a = (mix((a * _CK1) & _M64) * _CK1) & _M64
            c = (b * _CK1 + short(s)) & _M64
            d = mix((a + (f64(s) if n >= 8 else c)) & _M64)
        else:
            c = h16((f64(s, n - 8) + _CK1) & _M64, a)
            d = h16((b + n) & _M64, (c + f64(s, n - 16)) & _M64)
            a = (a + d) & _M64
            o = 0
            l = n - 16
            while True:
                a = ((a ^ ((mix((f64(s, o) * _CK1) & _M64) * _CK1) & _M64))
                     * _CK1) & _M64
                b ^= a
                c = ((c ^ ((mix((f64(s, o + 8) * _CK1) & _M64) * _CK1)
                           & _M64)) * _CK1) & _M64
                d ^= c
                o += 16
                l -= 16
                if l <= 0:
                    break
        a = h16(a, c)
        b = h16(d, b)
        return a ^ b, h16(b, a)

    def seed128(s, sa, sb):
        n = len(s)
        if n < 128:
            return murmur(s, sa, sb)
        x, y, z = sa, sb, (n * _CK1) & _M64
        vlo = (rot(y ^ _CK1, 49) * _CK1 + f64(s)) & _M64
        vhi = (rot(vlo, 42) * _CK1 + f64(s, 8)) & _M64
        wlo = (rot((y + z) & _M64, 35) * _CK1 + x) & _M64
        whi = (rot((x + f64(s, 88)) & _M64, 53) * _CK1) & _M64
        o = 0
        while True:
            for _ in range(2):
                x = (rot((x + y + vlo + f64(s, o + 16)) & _M64, 37)
                     * _CK1) & _M64
                y = (rot((y + vhi + f64(s, o + 48)) & _M64, 42)
                     * _CK1) & _M64
                x ^= whi
                y ^= vlo
                z = rot(z ^ wlo, 33)
                vlo, vhi = weak32(s, o, (vhi * _CK1) & _M64,
                                  (x + wlo) & _M64)
                wlo, whi = weak32(s, o + 32, (z + whi) & _M64, y)
                z, x = x, z
                o += 64
            n -= 128
            if n < 128:
                break
        y = (y + rot(wlo, 37) * _CK0 + z) & _M64
        x = (x + rot((vlo + z) & _M64, 49) * _CK0) & _M64
        done = 0
        while done < n:
            done += 32
            y = (rot((y - x) & _M64, 42) * _CK0 + vhi) & _M64
            wlo = (wlo + f64(s, o + n - done + 16)) & _M64
            x = (rot(x, 49) * _CK0 + wlo) & _M64
            wlo = (wlo + vlo) & _M64
            vlo, vhi = weak32(s, o + n - done, vlo, vhi)
        x = h16(x, vlo)
        y = h16(y, wlo)
        return (h16((x + vhi) & _M64, whi) + y) & _M64, \
            h16((x + whi) & _M64, (y + vhi) & _M64)

    n = len(data)
    if n >= 16:
        lo, hi = seed128(data[16:], f64(data) ^ _CK3, f64(data, 8))
    elif n >= 8:
        lo, hi = seed128(b"", f64(data) ^ ((n * _CK0) & _M64),
                         f64(data, n - 8) ^ _CK1)
    else:
        lo, hi = seed128(data, _CK0, _CK1)
    return struct.pack("<QQ", lo, hi)


# -- Native string column codec ----------------------------------------------

def encode_strings(values: np.ndarray) -> bytes:
    """Object array of str -> varint-length-framed bytes."""
    blobs = [("" if v is None else str(v)).encode() for v in values]
    blob = b"".join(blobs)
    offsets = np.zeros(len(blobs) + 1, np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    lib = _load()
    if lib:
        cap = len(blob) + 10 * max(len(blobs), 1)
        dst = ctypes.create_string_buffer(cap)
        n = lib.chn_write_strcol(blob, offsets.ctypes.data, len(blobs),
                                 dst, cap)
        if n < 0:
            raise ValueError("strcol encode overflow")
        return dst.raw[:n]
    out = bytearray()
    for b in blobs:
        x = len(b)
        while True:
            byte = x & 0x7F
            x >>= 7
            out.append(byte | 0x80 if x else byte)
            if not x:
                break
        out += b
    return bytes(out)


def decode_strings(data: bytes, n_rows: int) -> Tuple[np.ndarray, int]:
    """varint-framed bytes -> (object array, bytes consumed)."""
    lib = _load()
    if lib:
        offsets = np.zeros(n_rows + 1, np.int64)
        blob = ctypes.create_string_buffer(max(len(data), 1))
        consumed = lib.chn_read_strcol(data, len(data), n_rows,
                                       offsets.ctypes.data, blob, len(data))
        if consumed < 0:
            raise ValueError("strcol decode error")
        raw = blob.raw
        out = np.empty(n_rows, object)
        for i in range(n_rows):
            out[i] = raw[offsets[i]:offsets[i + 1]].decode(errors="replace")
        return out, int(consumed)
    # pure python
    out = np.empty(n_rows, object)
    pos = 0
    for i in range(n_rows):
        ln = 0
        shift = 0
        while True:
            b = data[pos]
            pos += 1
            ln |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        out[i] = data[pos:pos + ln].decode(errors="replace")
        pos += ln
    return out, pos


def cityhash128_rows(fixed: np.ndarray) -> np.ndarray:
    """Fixed-width 'S' byte rows -> (n, 2) uint64 CityHash128 per row
    (trailing NUL bytes trimmed — the 'S'-array length convention).  The
    hash-token path for high-cardinality string factorization."""
    a = np.ascontiguousarray(fixed)
    n = len(a)
    w = a.dtype.itemsize
    out = np.empty((n, 2), np.uint64)
    lib = _load()
    if lib:
        lib.chn_cityhash128_rows(a.ctypes.data, w, n, out.ctypes.data)
        return out
    for i in range(n):
        h = cityhash128(bytes(a[i]))       # bytes() of an S scalar trims NULs
        out[i, 0] = int.from_bytes(h[:8], "little")
        out[i, 1] = int.from_bytes(h[8:], "little")
    return out


def hash64_np(x: np.ndarray) -> np.ndarray:
    """Host-side splitmix64 (bit-identical to ops.hash_ops.hash64)."""
    x = np.ascontiguousarray(x.astype(np.uint64))
    lib = _load()
    if lib:
        out = np.empty_like(x)
        lib.chn_hash64(x.ctypes.data, len(x), out.ctypes.data)
        return out
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


# -- pure-python LZ4 fallback (decompress-only oriented; compress = stored) --

def _py_lz4_compress(data: bytes) -> bytes:
    # trivial literal-only LZ4 stream (valid but uncompressed)
    out = bytearray()
    n = len(data)
    lit = n
    token_lit = 15 if lit >= 15 else lit
    out.append(token_lit << 4)
    if lit >= 15:
        rest = lit - 15
        while rest >= 255:
            out.append(255)
            rest -= 255
        out.append(rest)
    out += data
    return bytes(out)


def _py_lz4_decompress(data: bytes, size: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        token = data[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = data[i]
                i += 1
                lit += b
                if b != 255:
                    break
        out += data[i:i + lit]
        i += lit
        if i >= n:
            break
        offset = data[i] | (data[i + 1] << 8)
        i += 2
        mlen = (token & 15) + 4
        if (token & 15) == 15:
            while True:
                b = data[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - offset
        for k in range(mlen):
            out.append(out[start + k])
    if len(out) != size:
        raise ValueError("decompressed size mismatch")
    return bytes(out)


# -- codec family (Delta / DoubleDelta / Gorilla / T64) ----------------------
# C++ hot loops with numpy fallbacks; formats documented in chnative.cpp.

def delta_encode(v: "np.ndarray") -> bytes:
    v = np.ascontiguousarray(v)
    lib = _load()
    if lib:
        out = np.empty(v.nbytes, np.uint8)
        lib.chn_delta_encode(v.ctypes.data, len(v), v.itemsize,
                             out.ctypes.data)
        return out.tobytes()
    d = np.empty_like(v)
    d[0:1] = v[0:1]
    d[1:] = v[1:] - v[:-1]
    return d.tobytes()


def delta_decode(b: bytes, dtype, n: int) -> "np.ndarray":
    src = np.frombuffer(b, np.uint8).copy()
    out = np.empty(n, dtype)
    lib = _load()
    if lib:
        lib.chn_delta_decode(src.ctypes.data, n, out.itemsize,
                             out.ctypes.data)
        return out
    return np.cumsum(np.frombuffer(b, dtype), dtype=dtype)


def dd_encode(v: "np.ndarray") -> bytes:
    v = np.ascontiguousarray(v, np.int64)
    lib = _load()
    out = np.empty(v.nbytes + 10 * len(v) + 64, np.uint8)
    if lib:
        n = lib.chn_dd_encode(v.ctypes.data, len(v), out.ctypes.data)
        return out[:n].tobytes()
    raise RuntimeError("DoubleDelta requires the native library")


def dd_decode(b: bytes, n: int) -> "np.ndarray":
    src = np.frombuffer(b, np.uint8).copy()
    out = np.empty(n, np.int64)
    lib = _load()
    if lib:
        r = lib.chn_dd_decode(src.ctypes.data, len(src), n, out.ctypes.data)
        if r < 0:
            raise ValueError("corrupt DoubleDelta stream")
        return out
    raise RuntimeError("DoubleDelta requires the native library")


def gorilla_encode(v: "np.ndarray") -> bytes:
    v = np.ascontiguousarray(v).view(np.uint64)
    lib = _load()
    out = np.empty(v.nbytes + 2 * len(v) + 64, np.uint8)
    if lib:
        n = lib.chn_gorilla_encode(v.ctypes.data, len(v), out.ctypes.data)
        return out[:n].tobytes()
    raise RuntimeError("Gorilla requires the native library")


def gorilla_decode(b: bytes, n: int) -> "np.ndarray":
    src = np.frombuffer(b, np.uint8).copy()
    out = np.empty(n, np.uint64)
    lib = _load()
    if lib:
        r = lib.chn_gorilla_decode(src.ctypes.data, len(src), n,
                                   out.ctypes.data)
        if r < 0:
            raise ValueError("corrupt Gorilla stream")
        return out
    raise RuntimeError("Gorilla requires the native library")


def t64_encode(v: "np.ndarray") -> bytes:
    v = np.ascontiguousarray(v, np.int64)
    lib = _load()
    out = np.empty(v.nbytes + 16 * (len(v) // 64 + 2), np.uint8)
    if lib:
        n = lib.chn_t64_encode(v.ctypes.data, len(v), out.ctypes.data)
        return out[:n].tobytes()
    raise RuntimeError("T64 requires the native library")


def t64_decode(b: bytes, n: int) -> "np.ndarray":
    src = np.frombuffer(b, np.uint8).copy()
    out = np.empty(n, np.int64)
    lib = _load()
    if lib:
        r = lib.chn_t64_decode(src.ctypes.data, len(src), n, out.ctypes.data)
        if r < 0:
            raise ValueError("corrupt T64 stream")
        return out
    raise RuntimeError("T64 requires the native library")
