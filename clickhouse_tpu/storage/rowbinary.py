"""RowBinary / RowBinaryWithNamesAndTypes formats.

Reference: src/Processors/Formats/Impl/BinaryRowInputFormat.cpp +
RowBinary serialization contract (docs/en/interfaces/formats): values are
serialized row-major, little-endian; String = varint length + bytes;
Nullable = 1-byte null flag (1 = NULL) then the (default) value;
Array = varint count + elements.  WithNamesAndTypes prefixes
varint column count, the names, then the type names.
"""
from __future__ import annotations

import datetime
import struct
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..core.errors import EngineError, NotImplementedError_

__all__ = ["write_rowbinary", "read_rowbinary"]

_EPOCH = datetime.date(1970, 1, 1)

_NUM = {
    "uint8": "<B", "uint16": "<H", "uint32": "<I", "uint64": "<Q",
    "int8": "<b", "int16": "<h", "int32": "<i", "int64": "<q",
    "float32": "<f", "float64": "<d", "bool": "<B",
}


def _write_varint(out: bytearray, x: int) -> None:
    while True:
        b = x & 0x7F
        x >>= 7
        out.append(b | 0x80 if x else b)
        if not x:
            break


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    x = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        x |= (b & 0x7F) << shift
        if not b & 0x80:
            return x, pos
        shift += 7


def _norm_type(tname: str) -> str:
    return tname.strip()


def _split_nullable(tname: str) -> Tuple[bool, str]:
    t = _norm_type(tname)
    if t.lower().startswith("nullable(") and t.endswith(")"):
        return True, t[len("Nullable("):-1]
    return False, t


def _write_value(out: bytearray, tname: str, v: Any) -> None:
    t = tname.lower()
    if t in _NUM:
        if t.startswith("f"):
            out += struct.pack(_NUM[t], float(v))
        else:
            out += struct.pack(_NUM[t], int(v) & ((1 << 64) - 1)
                               if t == "uint64" else int(v))
        return
    if t == "string":
        b = ("" if v is None else str(v)).encode()
        _write_varint(out, len(b))
        out += b
        return
    if t.startswith("fixedstring(") and t.endswith(")"):
        n = int(t[len("fixedstring("):-1])
        b = ("" if v is None else str(v)).encode()[:n]
        out += b + b"\x00" * (n - len(b))
        return
    if t == "date":
        if isinstance(v, datetime.date):
            days = (v - _EPOCH).days
        else:
            days = int(v)
        out += struct.pack("<H", max(days, 0) & 0xFFFF)
        return
    if t == "date32":
        days = (v - _EPOCH).days if isinstance(v, datetime.date) else int(v)
        out += struct.pack("<i", days)
        return
    if t == "datetime" or t.startswith("datetime("):
        if isinstance(v, datetime.datetime):
            ts = int(v.replace(tzinfo=datetime.timezone.utc).timestamp())
        else:
            ts = int(v)
        out += struct.pack("<I", max(ts, 0) & 0xFFFFFFFF)
        return
    if t.startswith("array(") and t.endswith(")"):
        inner = tname[len("Array("):-1]
        seq = list(v) if v is not None else []
        _write_varint(out, len(seq))
        for item in seq:
            _write_value(out, inner, item)
        return
    raise NotImplementedError_(f"RowBinary type '{tname}' is not supported")


def _default_of(tname: str) -> Any:
    t = tname.lower()
    if t == "string" or t.startswith("fixedstring"):
        return ""
    if t.startswith("array"):
        return []
    return 0


def _read_value(buf: bytes, pos: int, tname: str) -> Tuple[Any, int]:
    t = tname.lower()
    if t in _NUM:
        fmtc = _NUM[t]
        size = struct.calcsize(fmtc)
        (v,) = struct.unpack_from(fmtc, buf, pos)
        return v, pos + size
    if t == "string":
        n, pos = _read_varint(buf, pos)
        return buf[pos:pos + n].decode(errors="replace"), pos + n
    if t.startswith("fixedstring(") and t.endswith(")"):
        n = int(t[len("fixedstring("):-1])
        return buf[pos:pos + n].rstrip(b"\x00").decode(
            errors="replace"), pos + n
    if t == "date":
        (d,) = struct.unpack_from("<H", buf, pos)
        return _EPOCH + datetime.timedelta(days=int(d)), pos + 2
    if t == "date32":
        (d,) = struct.unpack_from("<i", buf, pos)
        return _EPOCH + datetime.timedelta(days=int(d)), pos + 4
    if t == "datetime" or t.startswith("datetime("):
        (s,) = struct.unpack_from("<I", buf, pos)
        return datetime.datetime.utcfromtimestamp(int(s)), pos + 4
    if t.startswith("array(") and t.endswith(")"):
        inner = tname[len("Array("):-1] if tname.lower().startswith("array(") \
            else tname[6:-1]
        n, pos = _read_varint(buf, pos)
        out = []
        for _ in range(n):
            v, pos = _read_value(buf, pos, inner)
            out.append(v)
        return out, pos
    raise NotImplementedError_(f"RowBinary type '{tname}' is not supported")


def write_rowbinary(data: Dict[str, np.ndarray],
                    types: Optional[List[Tuple[str, str]]],
                    with_names_types: bool) -> bytes:
    names = list(data.keys())
    if types is None:
        raise EngineError("RowBinary output needs column types")
    tnames = [t for _, t in types]
    out = bytearray()
    if with_names_types:
        _write_varint(out, len(names))
        for nm in names:
            b = nm.encode()
            _write_varint(out, len(b))
            out += b
        for t in tnames:
            b = t.encode()
            _write_varint(out, len(b))
            out += b
    n = len(next(iter(data.values()))) if data else 0
    cols = [data[nm] for nm in names]
    for i in range(n):
        for col, tname in zip(cols, tnames):
            v = col[i]
            nullable, inner = _split_nullable(tname)
            if nullable:
                if v is None:
                    out.append(1)
                    _write_value(out, inner, _default_of(inner))
                    continue
                out.append(0)
                _write_value(out, inner, v)
            else:
                _write_value(out, inner, 0 if v is None else v)
    return bytes(out)


def read_rowbinary(buf: bytes,
                   schema: Optional[List[Tuple[str, str]]] = None
                   ) -> Dict[str, np.ndarray]:
    """Parse RowBinaryWithNamesAndTypes (schema embedded), or bare
    RowBinary when ``schema`` [(name, type)] is supplied."""
    pos = 0
    if schema is None:
        ncols, pos = _read_varint(buf, 0)
        names = []
        for _ in range(ncols):
            n, pos = _read_varint(buf, pos)
            names.append(buf[pos:pos + n].decode())
            pos += n
        tnames = []
        for _ in range(ncols):
            n, pos = _read_varint(buf, pos)
            tnames.append(buf[pos:pos + n].decode())
            pos += n
    else:
        names = [nm for nm, _ in schema]
        tnames = [t for _, t in schema]
    cols: Dict[str, list] = {nm: [] for nm in names}
    total = len(buf)
    while pos < total:
        for nm, tname in zip(names, tnames):
            nullable, inner = _split_nullable(tname)
            if nullable:
                flag = buf[pos]
                pos += 1
                v, pos = _read_value(buf, pos, inner)
                cols[nm].append(None if flag else v)
            else:
                v, pos = _read_value(buf, pos, inner)
                cols[nm].append(v)
    out = {}
    for nm, tname in zip(names, tnames):
        vals = cols[nm]
        t = tname.lower()
        if t in _NUM and t[0] in "uif" and "float" not in t:
            out[nm] = np.asarray(vals, np.dtype(t))
        elif t in ("float32", "float64"):
            out[nm] = np.asarray(vals, np.dtype(t))
        else:
            out[nm] = np.asarray(vals, object)
    return out
