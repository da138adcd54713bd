"""Column compression codec registry.

The reference's codec pipeline (src/Compression/CompressionFactory.cpp)
declares per-column codec CHAINS — `CODEC(Delta, LZ4)` transforms then
entropy-codes.  Same model here: transform codecs (typed array -> bytes)
followed by at most one entropy codec (bytes -> bytes).  Implementations:

  NONE / LZ4 (C++ block codec, chnative.cpp) / ZSTD (bundled zstandard)
  Delta      — fixed-width element delta        (CompressionCodecDelta.cpp)
  DoubleDelta— zigzag varint delta-of-delta     (...DoubleDelta.cpp)
  Gorilla    — XOR bit-packed floats            (...Gorilla.cpp)
  T64        — 64-block min-subtracted bit transpose (...T64.cpp)

The encoded frame records (chain, dtype, rows, entropy-input size), so
decoding is self-describing.
"""
from __future__ import annotations

import json
from typing import List

import numpy as np

from .. import native as chn

__all__ = ["compress_column", "decompress_column", "parse_codec_spec",
           "KNOWN_CODECS"]

KNOWN_CODECS = ("NONE", "LZ4", "ZSTD", "Delta", "DoubleDelta", "Gorilla",
                "T64")
_TRANSFORMS = ("Delta", "DoubleDelta", "Gorilla", "T64")
_ENTROPY = ("LZ4", "ZSTD")


def parse_codec_spec(spec: str) -> List[str]:
    """'CODEC(Delta, LZ4)' / 'Delta, LZ4' -> ['Delta', 'LZ4'] (validated)."""
    s = spec.strip()
    if s.upper().startswith("CODEC"):
        s = s[s.index("(") + 1:s.rindex(")")]
    out = []
    for part in s.split(","):
        name = part.strip().split("(")[0]
        if not name:
            continue
        for k in KNOWN_CODECS:
            if k.lower() == name.lower():
                out.append(k)
                break
        else:
            raise ValueError(f"Unknown codec '{name}'")
    return out or ["LZ4"]


def compress_column(v: np.ndarray, chain: List[str]) -> bytes:
    v = np.ascontiguousarray(v)
    n = len(v)
    applied: List[str] = []
    cur = v
    payload: bytes = b""
    typed = True
    entropy = None
    for name in chain:
        if name == "NONE":
            continue
        if name in _ENTROPY:
            entropy = name
            break                        # entropy terminates the chain
        if not typed:
            raise ValueError(f"Codec {name} cannot follow a bytes codec")
        if name == "Delta":
            d = np.empty_like(cur)
            if n:
                d[0:1] = cur[0:1]
                d[1:] = cur[1:] - cur[:-1]
            cur = d
        elif name == "DoubleDelta":
            payload = chn.dd_encode(cur.astype(np.int64))
            typed = False
        elif name == "Gorilla":
            payload = chn.gorilla_encode(
                cur.astype(np.float64) if cur.dtype.kind == "f"
                else cur.astype(np.uint64))
            typed = False
        elif name == "T64":
            payload = chn.t64_encode(cur.astype(np.int64))
            typed = False
        applied.append(name)
    if typed:
        payload = cur.tobytes()
    pre_size = len(payload)
    if entropy is not None:
        if entropy == "LZ4":
            payload = chn.lz4_compress(payload)
        else:
            import zstandard
            payload = zstandard.ZstdCompressor(level=3).compress(payload)
        applied.append(entropy)
    head = json.dumps({"chain": applied, "dtype": str(v.dtype), "n": n,
                       "pre": pre_size}).encode()
    return len(head).to_bytes(4, "little") + head + payload


def decompress_column(frame: bytes) -> np.ndarray:
    hlen = int.from_bytes(frame[:4], "little")
    head = json.loads(frame[4:4 + hlen].decode())
    data = frame[4 + hlen:]
    chain = list(head["chain"])
    dtype = np.dtype(head["dtype"])
    n = head["n"]
    if chain and chain[-1] in _ENTROPY:
        name = chain.pop()
        if name == "LZ4":
            data = chn.lz4_decompress(data, head["pre"])
        else:
            import zstandard
            data = zstandard.ZstdDecompressor().decompress(
                data, max_output_size=head["pre"])
    if chain and chain[-1] == "DoubleDelta":
        arr = chn.dd_decode(data, n).astype(dtype)
        chain.pop()
    elif chain and chain[-1] == "Gorilla":
        raw = chn.gorilla_decode(data, n)
        arr = raw.view(np.float64).astype(dtype) if dtype.kind == "f" \
            else raw.astype(dtype)
        chain.pop()
    elif chain and chain[-1] == "T64":
        arr = chn.t64_decode(data, n).astype(dtype)
        chain.pop()
    else:
        arr = np.frombuffer(data, dtype, count=n).copy()
    while chain:
        if chain.pop() == "Delta":
            arr = np.cumsum(arr, dtype=arr.dtype)
    return arr
