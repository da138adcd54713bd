"""Avro Object Container File reader/writer, from scratch.

Analog of the reference's Avro input/output format
(src/Processors/Formats/Impl/AvroRowInputFormat.cpp /
AvroRowOutputFormat.cpp, which wrap contrib/avro): no Avro library is
available in this image, so this implements the OCF spec directly —
magic ``Obj\\x01``, metadata map carrying the JSON schema, zigzag-varint
primitive encoding, sync-marker-delimited data blocks (null codec).

Engine type mapping (same choices as the reference's AvroSerializer):
Int8/16/32 -> int, Int64/UInt* -> long, Float32 -> float,
Float64 -> double, String -> string, Bool -> boolean,
Nullable(T) -> union ["null", T].
"""
from __future__ import annotations

import io
import json
import struct
from typing import Any, BinaryIO, Dict, List, Optional, Tuple

import numpy as np

from ..core.errors import EngineError

__all__ = ["read_avro", "write_avro"]

_MAGIC = b"Obj\x01"
_SYNC = bytes(range(16))                  # deterministic sync marker


# -- primitive encoding -------------------------------------------------------

def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: BinaryIO) -> int:
    shift = 0
    u = 0
    while True:
        c = buf.read(1)
        if not c:
            raise EOFError
        b = c[0]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _enc_str(s: str) -> bytes:
    b = s.encode()
    return _zigzag_encode(len(b)) + b


def _dec_bytes(buf: BinaryIO) -> bytes:
    n = _zigzag_decode(buf)
    return buf.read(n)


# -- schema -------------------------------------------------------------------

def _avro_type_for(type_name: str) -> Any:
    t = type_name
    if t.startswith("LowCardinality(") and t.endswith(")"):
        t = t[15:-1]
    if t.startswith("Nullable(") and t.endswith(")"):
        return ["null", _avro_type_for(t[9:-1])]
    if t in ("Int8", "Int16", "Int32", "UInt8", "UInt16"):
        return "int"
    if t in ("Int64", "UInt32", "UInt64"):
        return "long"
    if t == "Float32":
        return "float"
    if t == "Float64":
        return "double"
    if t == "Bool":
        return "boolean"
    return "string"


def _write_value(out: bytearray, avro_type: Any, v: Any) -> None:
    if isinstance(avro_type, list):       # union ["null", T]
        if v is None or (isinstance(v, float) and v != v and
                         avro_type[1] not in ("float", "double")):
            out += _zigzag_encode(0)
            return
        out += _zigzag_encode(1)
        _write_value(out, avro_type[1], v)
        return
    if avro_type in ("int", "long"):
        out += _zigzag_encode(int(v))
    elif avro_type == "float":
        out += struct.pack("<f", float(v))
    elif avro_type == "double":
        out += struct.pack("<d", float(v))
    elif avro_type == "boolean":
        out += b"\x01" if v else b"\x00"
    elif avro_type == "string":
        out += _enc_str(str(v))
    else:
        raise EngineError(f"Avro type {avro_type!r} not writable")


def _read_value(buf: BinaryIO, avro_type: Any) -> Any:
    if isinstance(avro_type, dict):       # {"type": ..} or logical type
        return _read_value(buf, avro_type["type"])
    if isinstance(avro_type, list):
        idx = _zigzag_decode(buf)
        branch = avro_type[idx]
        if branch == "null":
            return None
        return _read_value(buf, branch)
    if avro_type in ("int", "long"):
        return _zigzag_decode(buf)
    if avro_type == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if avro_type == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if avro_type == "boolean":
        return buf.read(1) == b"\x01"
    if avro_type == "string":
        return _dec_bytes(buf).decode()
    if avro_type == "bytes":
        return _dec_bytes(buf)
    if avro_type == "null":
        return None
    raise EngineError(f"Avro type {avro_type!r} not readable")


# -- container file -----------------------------------------------------------

def write_avro(data: Dict[str, np.ndarray],
               types: Optional[List[Tuple[str, str]]] = None) -> bytes:
    from .formats import _infer_type_name
    names = list(data.keys())
    tmap = dict(types or [])
    fields = []
    ftypes = []
    for n in names:
        tn = tmap.get(n) or _infer_type_name(np.asarray(data[n]))
        at = _avro_type_for(tn)
        fields.append({"name": n, "type": at})
        ftypes.append(at)
    schema = {"type": "record", "name": "row", "fields": fields}

    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {"avro.schema": json.dumps(schema), "avro.codec": "null"}
    out.write(_zigzag_encode(len(meta)))
    for k, v in meta.items():
        out.write(_enc_str(k))
        out.write(_enc_str(v))
    out.write(_zigzag_encode(0))          # end of metadata map
    out.write(_SYNC)

    n_rows = len(next(iter(data.values()))) if names else 0
    body = bytearray()
    arrays = [np.asarray(data[n]) for n in names]
    for i in range(n_rows):
        for a, at in zip(arrays, ftypes):
            _write_value(body, at, a[i])
    if n_rows:
        out.write(_zigzag_encode(n_rows))
        out.write(_zigzag_encode(len(body)))
        out.write(bytes(body))
        out.write(_SYNC)
    return out.getvalue()


def read_avro(raw: bytes) -> Dict[str, np.ndarray]:
    buf = io.BytesIO(raw)
    if buf.read(4) != _MAGIC:
        raise EngineError("not an Avro object container file")
    meta: Dict[str, bytes] = {}
    while True:
        n = _zigzag_decode(buf)
        if n == 0:
            break
        if n < 0:                         # negative count: size follows
            n = -n
            _zigzag_decode(buf)
        for _ in range(n):
            k = _dec_bytes(buf).decode()
            meta[k] = _dec_bytes(buf)
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", ""):
        raise EngineError(f"Avro codec '{codec}' not supported (null only)")
    schema = json.loads(meta["avro.schema"])
    if schema.get("type") != "record":
        raise EngineError("top-level Avro schema must be a record")
    names = [f["name"] for f in schema["fields"]]
    ftypes = [f["type"] for f in schema["fields"]]
    sync = buf.read(16)

    cols: Dict[str, list] = {n: [] for n in names}
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = _zigzag_decode(buf)
        if count < 0:
            # Avro spec: a negative block count means |count| objects and
            # an extra byte-size varint follows (before the regular one)
            count = -count
        _zigzag_decode(buf)               # block byte size
        for _ in range(count):
            for n, at in zip(names, ftypes):
                cols[n].append(_read_value(buf, at))
        if buf.read(16) != sync:
            raise EngineError("Avro sync marker mismatch")

    out: Dict[str, np.ndarray] = {}
    for n, at in zip(names, ftypes):
        vals = cols[n]
        base = at["type"] if isinstance(at, dict) else at
        if isinstance(base, list):
            out[n] = np.asarray(vals, dtype=object)
        elif base in ("int", "long"):
            out[n] = np.asarray(vals, dtype=np.int64)
        elif base in ("float", "double"):
            out[n] = np.asarray(vals, dtype=np.float64)
        elif base == "boolean":
            out[n] = np.asarray(vals, dtype=np.bool_)
        else:
            out[n] = np.asarray(vals, dtype=object)
    return out
