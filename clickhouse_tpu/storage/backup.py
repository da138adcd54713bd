"""BACKUP / RESTORE (reference: src/Backups/).

On-disk format: JSON header (schema/engine/sort key) + LZ4-framed Native
blocks.  Frames: [u32 compressed][u32 raw][lz4 block] — compression via the
native C++ codec (clickhouse_tpu/native), mirroring the reference's
CompressedWriteBuffer framing role (checksums TODO).
"""
from __future__ import annotations

import io
import json
import os
import struct
from typing import Optional

import numpy as np

from .. import native as chnative
from ..core import dtypes as dt
from .native_format import read_native, write_native
from .table import Table

__all__ = ["backup_table", "restore_table"]

_MAGIC = b"CHTPUBK1"
_FRAME = 1 << 20


def backup_table(table: Table, path: str) -> None:
    from ..core.failpoints import fail_point
    fail_point("backup_before_write")
    cols = {}
    for name in table.schema:
        pieces = [p.columns[name] for p in table.parts]
        if table.schema[name].is_dictionary:
            cols[name] = np.concatenate(
                [np.asarray(p, object) for p in pieces]) if pieces else \
                np.zeros(0, object)
        else:
            cols[name] = np.concatenate(pieces) if pieces else \
                np.zeros(0, table.schema[name].np_dtype)
    # columns with a declared CODEC chain are stored as codec frames
    # (storage/codecs.py); the rest travel in the Native block
    codec_frames = {}
    codecs = dict(getattr(table, "codecs", {}) or {})
    for name in list(cols.keys()):
        chain_txt = codecs.get(name)
        if chain_txt and not table.schema[name].is_dictionary:
            from .codecs import compress_column, parse_codec_spec
            codec_frames[name] = compress_column(
                cols.pop(name), parse_codec_spec(chain_txt))
    buf = io.BytesIO()
    write_native(buf, cols)
    native_bytes = buf.tell()
    for name, frame in codec_frames.items():
        buf.write(b"CODC")
        nb = name.encode()
        buf.write(struct.pack("<I", len(nb)))
        buf.write(nb)
        buf.write(struct.pack("<Q", len(frame)))
        buf.write(frame)
    payload = buf.getvalue()
    header = json.dumps({
        "table": table.name,
        "engine": table.engine,
        "order_by": table.order_by,
        "schema": [(n, str(t)) for n, t in table.schema_items()],
        "codecs": codecs,
        "codec_columns": sorted(codec_frames.keys()),
        "native_bytes": native_bytes,
        "rows": table.num_rows,
    }).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        for off in range(0, max(len(payload), 1), _FRAME):
            raw = payload[off:off + _FRAME]
            comp = chnative.lz4_compress(raw)
            f.write(struct.pack("<II", len(comp), len(raw)))
            f.write(comp)


def restore_table(path: str) -> Table:
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise ValueError("not a clickhouse-tpu backup file")
        (hlen,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hlen).decode())
        payload = io.BytesIO()
        while True:
            frame_hdr = f.read(8)
            if len(frame_hdr) < 8:
                break
            clen, rlen = struct.unpack("<II", frame_hdr)
            payload.write(chnative.lz4_decompress(f.read(clen), rlen))
    payload.seek(0)
    raw = payload.getvalue()
    nb = header.get("native_bytes", len(raw))
    data, _types = read_native(io.BytesIO(raw[:nb]))
    payload.seek(nb)
    for _ in header.get("codec_columns", []):
        from .codecs import decompress_column
        magic = payload.read(4)
        if magic != b"CODC":
            raise ValueError("corrupt codec frame")
        (nlen,) = struct.unpack("<I", payload.read(4))
        name = payload.read(nlen).decode()
        (flen,) = struct.unpack("<Q", payload.read(8))
        data[name] = decompress_column(payload.read(flen))
    schema = [(n, dt.parse_type_name(t)) for n, t in header["schema"]]
    t = Table(header["table"], schema, header.get("engine", "Memory"),
              order_by=header.get("order_by") or [])
    t.codecs = dict(header.get("codecs", {}) or {})
    if data:
        # preserve declared column order
        data = {n: data[n] for n, _ in schema if n in data}
        t.insert_pydict(data)
    return t
