"""Checksummed compressed frames for the native wire protocol.

Frame layout mirrors the reference's CompressedWriteBuffer
(ref: src/Compression/CompressedWriteBuffer.cpp, src/IO/CompressedStream.h):

    [16-byte checksum][1-byte method][u32 LE compressed_size]
    [u32 LE decompressed_size][compressed payload]

where compressed_size counts the 9-byte header.  The checksum is
CityHash128 v1.0.2 (low64 LE ++ high64 LE) over method+sizes+payload —
byte-identical to the reference's CompressedWriteBuffer
(src/Compression/CompressedWriteBuffer.cpp:38-41), so a stock
clickhouse-client can validate and produce these frames.

Method bytes follow the reference's CompressionMethodByte: 0x82 = LZ4,
0x02 = None.
"""
from __future__ import annotations

import struct
from typing import BinaryIO

from ..core.errors import EngineError
from ..native import cityhash128, lz4_compress, lz4_decompress

METHOD_LZ4 = 0x82
METHOD_NONE = 0x02

_MAX_FRAME = 1 << 30     # defensive cap, matches reference protections


def _checksum(body: bytes) -> bytes:
    return cityhash128(body)


def write_frame(out: BinaryIO, data: bytes, method: int = METHOD_LZ4) -> None:
    if method == METHOD_LZ4:
        payload = lz4_compress(data)
    elif method == METHOD_NONE:
        payload = data
    else:
        raise EngineError(f"Unknown compression method byte {method:#x}")
    body = (bytes([method])
            + struct.pack("<I", 9 + len(payload))
            + struct.pack("<I", len(data))
            + payload)
    out.write(_checksum(body))
    out.write(body)


def read_frame(inp: BinaryIO) -> bytes:
    """Read + verify one frame -> decompressed bytes."""
    head = inp.read(16 + 9)
    if len(head) < 25:
        raise EOFError("Truncated compressed frame header")
    checksum, method = head[:16], head[16]
    comp_size, raw_size = struct.unpack("<II", head[17:25])
    if not 9 <= comp_size <= _MAX_FRAME or raw_size > _MAX_FRAME:
        raise EngineError(f"Implausible compressed frame sizes "
                          f"({comp_size}, {raw_size})")
    payload = inp.read(comp_size - 9)
    if len(payload) != comp_size - 9:
        raise EOFError("Truncated compressed frame payload")
    if _checksum(head[16:] + payload) != checksum:
        raise EngineError("Compressed frame checksum mismatch "
                          "(corrupted wire data)")
    if method == METHOD_LZ4:
        data = lz4_decompress(payload, raw_size)
        if len(data) != raw_size:
            raise EngineError("LZ4 frame decompressed to wrong size")
        return data
    if method == METHOD_NONE:
        if len(payload) != raw_size:
            raise EngineError("Uncompressed frame size mismatch")
        return payload
    raise EngineError(f"Unknown compression method byte {method:#x}")
