"""ClickHouse Native format reader/writer.

The reference's columnar interchange format (src/Formats/NativeWriter.h:21,
NativeReader.h:21): a stream of blocks, each = varuint(n_columns),
varuint(n_rows), then per column: name, type string, raw column data
(fixed-width LE for numbers, varint-length-prefixed bytes for String,
null-mask-then-data for Nullable).  Used at the storage/ingest boundary —
device-side data stays in our padded columnar layout (SURVEY.md §2.7).

This is the portable Python implementation; the C++ twin in
clickhouse_tpu/native accelerates the hot (de)serialization loops.
"""
from __future__ import annotations

import io
import struct
from typing import Any, BinaryIO, Dict, List, Optional, Tuple

import numpy as np

from ..core import dtypes as dt
from ..core.errors import NotImplementedError_

__all__ = ["write_native", "read_native", "write_native_file",
           "read_native_file"]

_NUMERIC = {
    "UInt8": np.uint8, "UInt16": np.uint16, "UInt32": np.uint32,
    "UInt64": np.uint64, "Int8": np.int8, "Int16": np.int16,
    "Int32": np.int32, "Int64": np.int64, "Float32": np.float32,
    "Float64": np.float64, "Bool": np.uint8,
    "Date32": np.int32, "Date": np.uint16, "DateTime": np.uint32,
}


def _write_varuint(out: BinaryIO, x: int) -> None:
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_varuint(inp: BinaryIO) -> int:
    shift = 0
    result = 0
    while True:
        c = inp.read(1)
        if not c:
            raise EOFError
        b = c[0]
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result
        shift += 7


def _write_binary_str(out: BinaryIO, s: str) -> None:
    b = s.encode()
    _write_varuint(out, len(b))
    out.write(b)


def _read_binary_str(inp: BinaryIO) -> str:
    n = _read_varuint(inp)
    return inp.read(n).decode()


def _engine_type_to_native(v: np.ndarray, nullable: bool) -> str:
    if v.dtype == object:
        non_null = [x for x in v if x is not None]
        if all(isinstance(x, str) for x in non_null):
            base = "String"
        elif all(isinstance(x, (int, np.integer)) for x in non_null):
            base = "Int64"
        else:
            base = "Float64"
    else:
        for name, npdt in _NUMERIC.items():
            if np.dtype(npdt) == v.dtype and name not in ("Bool", "Date",
                                                          "DateTime", "Date32"):
                base = name
                break
        else:
            base = "Float64"
    return f"Nullable({base})" if nullable else base


def _write_column_data(out: BinaryIO, type_name: str, v: np.ndarray) -> None:
    if type_name.startswith("Nullable(") and type_name.endswith(")"):
        inner = type_name[len("Nullable("):-1]
        nulls = np.asarray([1 if x is None else 0 for x in v], np.uint8)
        out.write(nulls.tobytes())
        filled = np.asarray(
            [x if x is not None else ("" if inner == "String" else 0)
             for x in v], dtype=object)
        _write_column_data(out, inner, filled)
        return
    if type_name.startswith("AggregateFunction("):
        # Mergeable partial states as packed fixed-width byte rows (this
        # engine's ColumnAggregateFunction layout): varuint state width,
        # then rows*width raw bytes.  Engine-private framing — reference
        # states are likewise version-gated (the stage-2 initiator and the
        # shards must run the same engine), see
        # src/Columns/ColumnAggregateFunction.h.  Carries the
        # WithMergeableState stage of distributed queries over the wire.
        if v.dtype == object:
            rows = [bytes(x) if x is not None else b"" for x in v]
        elif v.ndim == 2:
            rows = [r.tobytes() for r in np.ascontiguousarray(
                v.astype(np.uint8))]
        else:
            rows = [bytes(x) for x in v]
        width = max((len(r) for r in rows), default=0)
        _write_varuint(out, width)
        for r in rows:
            out.write(r.ljust(width, b"\0"))
        return
    if type_name in ("String", "FixedString", "JSON"):
        # JSON columns materialize as canonical serialized text
        from .. import native as chnative
        out.write(chnative.encode_strings(np.asarray(v, dtype=object)))
        return
    if type_name.startswith("LowCardinality("):
        _write_column_data(out, type_name[len("LowCardinality("):-1], v)
        return
    npdt = _NUMERIC.get(type_name)
    if npdt is None:
        raise NotImplementedError_(f"Native type '{type_name}' unsupported")
    out.write(np.ascontiguousarray(v.astype(npdt)).tobytes())


def _read_column_data(inp: BinaryIO, type_name: str, n_rows: int) -> np.ndarray:
    if type_name.startswith("Nullable(") and type_name.endswith(")"):
        inner = type_name[len("Nullable("):-1]
        nulls = np.frombuffer(inp.read(n_rows), np.uint8)
        vals = _read_column_data(inp, inner, n_rows)
        out = vals.astype(object)
        out[nulls == 1] = None
        return out
    if type_name.startswith("AggregateFunction("):
        width = _read_varuint(inp)
        buf = inp.read(width * n_rows)
        out = np.empty(n_rows, object)
        for i in range(n_rows):
            out[i] = buf[i * width:(i + 1) * width]
        return out
    if type_name in ("String", "JSON"):
        if n_rows == 0:
            return np.asarray([], object)
        if not inp.seekable():
            # socket streams (native TCP protocol): read per-row frames —
            # a read-ahead would block on the live connection
            out = np.empty(n_rows, object)
            for i in range(n_rows):
                ln = _read_varuint(inp)
                out[i] = inp.read(ln).decode(errors="replace")
            return out
        from .. import native as chnative
        # Read the remaining stream window and let the C++ codec consume
        # exactly the column's bytes, then rewind the extra.
        here = inp.tell()
        data = inp.read()
        out, consumed = chnative.decode_strings(data, n_rows)
        inp.seek(here + consumed)
        return out
    if type_name.startswith("FixedString(") and type_name.endswith(")"):
        width = int(type_name[len("FixedString("):-1])
        out = np.empty(n_rows, object)
        for i in range(n_rows):
            out[i] = inp.read(width).rstrip(b"\0").decode(errors="replace")
        return out
    if type_name.startswith("LowCardinality("):
        # A genuine ClickHouse Native LowCardinality column is a
        # version-prefixed dictionary stream (SerializationLowCardinality),
        # not the plain inner column; misparsing it would yield garbage.
        # Our own writer never emits LowCardinality (it writes the inner
        # type), so fail cleanly here.
        raise NotImplementedError_(
            "Native LowCardinality dictionary streams are not supported; "
            "re-export the file with a plain column type")
    if type_name.startswith("Enum"):
        raise NotImplementedError_("Enum columns are not supported yet")
    npdt = _NUMERIC.get(type_name)
    if npdt is None:
        raise NotImplementedError_(f"Native type '{type_name}' unsupported")
    nbytes = np.dtype(npdt).itemsize * n_rows
    return np.frombuffer(inp.read(nbytes), npdt).copy()


def write_native(out: BinaryIO, data: Dict[str, np.ndarray],
                 types: Optional[List[Tuple[str, str]]] = None,
                 block_rows: int = 1 << 20) -> None:
    """Write pydict columns as a stream of Native blocks."""
    names = list(data.keys())
    type_map = dict(types or [])
    n = len(next(iter(data.values()))) if data else 0
    arrays = {k: np.asarray(v) for k, v in data.items()}
    native_types = {}
    for k in names:
        v = arrays[k]
        t = type_map.get(k)
        if t is None or t.startswith("LowCardinality"):
            nullable = v.dtype == object and any(x is None for x in v)
            t = _engine_type_to_native(v, nullable)
        native_types[k] = t
    start = 0
    while True:
        stop = min(start + block_rows, n)
        _write_varuint(out, len(names))
        _write_varuint(out, stop - start)
        for k in names:
            _write_binary_str(out, k)
            _write_binary_str(out, native_types[k])
            _write_column_data(out, native_types[k], arrays[k][start:stop])
        start = stop
        if start >= n:
            break


def read_native(inp: BinaryIO) -> Tuple[Dict[str, np.ndarray],
                                        List[Tuple[str, str]]]:
    """Read all Native blocks from a stream; returns (columns, types)."""
    chunks: Dict[str, List[np.ndarray]] = {}
    types: List[Tuple[str, str]] = []
    first = True
    while True:
        try:
            n_cols = _read_varuint(inp)
        except EOFError:
            break
        n_rows = _read_varuint(inp)
        for _ in range(n_cols):
            name = _read_binary_str(inp)
            type_name = _read_binary_str(inp)
            col = _read_column_data(inp, type_name, n_rows)
            chunks.setdefault(name, []).append(col)
            if first:
                types.append((name, type_name))
        first = False
    data = {k: (np.concatenate(v) if len(v) > 1 else v[0])
            for k, v in chunks.items()}
    return data, types


def write_native_file(path: str, data: Dict[str, np.ndarray],
                      types: Optional[List[Tuple[str, str]]] = None) -> None:
    with open(path, "wb") as f:
        write_native(f, data, types)


def read_native_file(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        data, _ = read_native(f)
    return data
