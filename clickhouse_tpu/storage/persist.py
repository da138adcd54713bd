"""Durable tables through the IDisk layer.

Reference discipline (src/Storages/MergeTree/MergeTreeDataWriter.h:67 +
MergeTreeDataPartWriterWide.h:20): every INSERT writes an immutable part
blob, then the table's manifest is atomically replaced to publish it —
write-tmp-then-rename, no write-ahead log needed.  Restart recovery =
reload metadata + manifests + part blobs from the disk (DatabaseCatalog
loadTables analog).

Layout on an IDisk (works on LocalDisk and ObjectStorageDisk alike):

    metadata/<db>/<table>.json            schema/engine/order key/codecs
    data/<db>/<table>/<part>.bin          one immutable part per blob
    data/<db>/<table>/manifest.json       ordered list of active parts

Part blob: JSON header + LZ4-framed Native payload (the BACKUP format's
framing, storage/backup.py) covering one part's columns.
"""
from __future__ import annotations

import io
import json
import struct
import uuid
from typing import Dict, List, Optional

import numpy as np

from .. import native as chnative
from ..core import dtypes as dt
from ..core.errors import EngineError, UnknownTable
from .native_format import read_native, write_native

__all__ = ["TableStore", "attach_store", "persisted_engine"]

_FRAME = 1 << 20
_PART_MAGIC = b"CHTPUPT1"


def _sample_by_text(table) -> Optional[str]:
    e = getattr(table, "sample_by", None)
    if e is None:
        return None
    try:
        from ..sql import ast
        return ast.format_expr(e)
    except Exception:        # noqa: BLE001
        return None


def persisted_engine(engine: str) -> bool:
    """Engines whose data survives restart (the reference's durable
    family); Memory/Null/Buffer/Set/Join stay RAM-resident."""
    e = engine.lower()
    return e.endswith("mergetree") or e in ("log", "tinylog", "stripelog")


def _part_to_bytes(part, schema: Dict[str, dt.DType]) -> bytes:
    cols = {}
    for name, t in schema.items():
        v = part.columns.get(name)
        if v is None:
            v = np.zeros(part.num_rows,
                         object if t.is_dictionary else t.np_dtype)
        cols[name] = np.asarray(v, object) if t.is_dictionary \
            or v.dtype == object else v
    buf = io.BytesIO()
    write_native(buf, cols)
    payload = buf.getvalue()
    header = json.dumps({
        "rows": part.num_rows,
        "minmax": {k: [float(a), float(b)]
                   for k, (a, b) in part.minmax.items()},
    }).encode()
    out = io.BytesIO()
    out.write(_PART_MAGIC)
    out.write(struct.pack("<I", len(header)))
    out.write(header)
    for off in range(0, max(len(payload), 1), _FRAME):
        raw = payload[off:off + _FRAME]
        comp = chnative.lz4_compress(raw)
        out.write(struct.pack("<II", len(comp), len(raw)))
        out.write(comp)
    return out.getvalue()


def _part_from_bytes(blob: bytes, schema: Dict[str, dt.DType]):
    from .table import Part
    if blob[:8] != _PART_MAGIC:
        raise EngineError("not a clickhouse-tpu part blob")
    (hlen,) = struct.unpack("<I", blob[8:12])
    header = json.loads(blob[12:12 + hlen].decode())
    pos = 12 + hlen
    payload = io.BytesIO()
    while pos + 8 <= len(blob):
        clen, rlen = struct.unpack("<II", blob[pos:pos + 8])
        pos += 8
        payload.write(chnative.lz4_decompress(blob[pos:pos + clen], rlen))
        pos += clen
    payload.seek(0)
    data, _types = read_native(payload)
    cols = {}
    for name, t in schema.items():
        v = data.get(name)
        if v is None:
            v = np.zeros(header["rows"],
                         object if t.is_dictionary else t.np_dtype)
        elif not t.is_dictionary and v.dtype == object \
                and not any(x is None for x in v):
            v = v.astype(t.np_dtype)
        cols[name] = v
    minmax = {k: (mm[0], mm[1]) for k, mm in header["minmax"].items()}
    return Part(cols, header["rows"], minmax)


class TableStore:
    """Catalog-attached durable store over an IDisk."""

    def __init__(self, disk):
        self.disk = disk

    # -- paths -----------------------------------------------------------
    @staticmethod
    def _meta_path(db: str, name: str) -> str:
        return f"metadata/{db}/{name}.json"

    @staticmethod
    def _manifest_path(db: str, name: str) -> str:
        return f"data/{db}/{name}/manifest.json"

    @staticmethod
    def _part_path(db: str, name: str, fname: str) -> str:
        return f"data/{db}/{name}/{fname}"

    # -- metadata ----------------------------------------------------------
    def save_meta(self, db: str, table) -> None:
        meta = {
            "name": table.name,
            "engine": table.engine,
            "order_by": table.order_by,
            "partition_by": table.partition_by,
            "index_granularity": table.index_granularity,
            "schema": [(n, str(t)) for n, t in table.schema_items()],
            "codecs": dict(getattr(table, "codecs", {}) or {}),
            "ttl": getattr(table, "ttl_text", None),
            "sample_by": _sample_by_text(table),
        }
        self.disk.write_file(self._meta_path(db, table.name),
                             json.dumps(meta).encode())

    # -- part lifecycle ------------------------------------------------------
    def save_part(self, db: str, table, part) -> str:
        fname = f"part_{uuid.uuid4().hex}.bin"
        self.disk.write_file(self._part_path(db, table.name, fname),
                             _part_to_bytes(part, table.schema))
        return fname

    def publish(self, db: str, name: str, part_files: List[str]) -> None:
        """Atomically replace the active part set (commit point)."""
        old = self._read_manifest(db, name)
        self.disk.write_file(self._manifest_path(db, name),
                             json.dumps({"parts": part_files}).encode())
        for f in old:
            if f not in part_files:
                self.disk.remove_file(self._part_path(db, name, f))

    def _read_manifest(self, db: str, name: str) -> List[str]:
        try:
            raw = self.disk.read_file(self._manifest_path(db, name))
        except EngineError:
            return []
        return json.loads(raw.decode()).get("parts", [])

    def drop_table(self, db: str, name: str) -> None:
        for f in self._read_manifest(db, name):
            self.disk.remove_file(self._part_path(db, name, f))
        self.disk.remove_file(self._manifest_path(db, name))
        self.disk.remove_file(self._meta_path(db, name))

    # -- recovery --------------------------------------------------------
    def list_tables(self) -> List[tuple]:
        out = []
        for f in self.disk.list_files():
            if f.startswith("metadata/") and f.endswith(".json"):
                parts = f[len("metadata/"):-len(".json")].split("/")
                if len(parts) == 2:
                    out.append((parts[0], parts[1]))
        return sorted(out)

    def load_table(self, db: str, name: str):
        from .table import Table
        try:
            meta = json.loads(
                self.disk.read_file(self._meta_path(db, name)).decode())
        except EngineError:
            raise UnknownTable(f"No persisted table '{db}.{name}'")
        schema = [(n, dt.parse_type_name(t)) for n, t in meta["schema"]]
        t = Table(name, schema, meta.get("engine", "MergeTree"),
                  order_by=meta.get("order_by") or [],
                  partition_by=meta.get("partition_by"),
                  index_granularity=meta.get("index_granularity", 8192))
        t.codecs = dict(meta.get("codecs", {}) or {})
        t.ttl_text = meta.get("ttl")
        if meta.get("sample_by"):
            # SAMPLE BY survives restart (advisor r04: DDL semantics were
            # silently lost — SAMPLE r failed after reload)
            try:
                from ..sql.parser import parse
                st = parse(f"SELECT {meta['sample_by']}")
                t.sample_by = st.items[0].expr
            except Exception:        # noqa: BLE001
                pass
        t.projections = {}
        files = self._read_manifest(db, name)
        for f in files:
            blob = self.disk.read_file(self._part_path(db, name, f))
            t.parts.append(_part_from_bytes(blob, t.schema))
        t._version += 1
        attach_store(t, self, db, part_files=files)
        return t


def attach_store(table, store: TableStore, db: str,
                 part_files: Optional[List[str]] = None) -> None:
    """Bind a table to a store: subsequent inserts/merges/mutations
    persist automatically (hooks in storage/table.py)."""
    table._store = store
    table._store_db = db
    table._store_files = list(part_files or [])
