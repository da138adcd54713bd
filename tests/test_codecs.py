"""Compression codec family (reference: src/Compression/CompressionCodec*.cpp)."""
import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.storage.codecs import (compress_column,
                                           decompress_column,
                                           parse_codec_spec)


RNG = np.random.default_rng(7)
SERIES = {
    "timestamps": (np.arange(5000, dtype=np.int64) * 15
                   + 1_600_000_000).astype(np.int64),
    "noisy_int": RNG.integers(-10**6, 10**6, 5000).astype(np.int64),
    "smooth_float": np.cumsum(RNG.normal(size=5000) * 0.01) + 42.0,
    "small_range": RNG.integers(0, 100, 5000).astype(np.int64),
    "int32": RNG.integers(0, 10**6, 5000).astype(np.int32),
}


@pytest.mark.parametrize("chain", [
    ["NONE"], ["LZ4"], ["ZSTD"], ["Delta"], ["Delta", "LZ4"],
    ["Delta", "ZSTD"], ["DoubleDelta"], ["DoubleDelta", "LZ4"],
    ["T64"], ["T64", "LZ4"],
])
@pytest.mark.parametrize("name", ["timestamps", "noisy_int", "small_range"])
def test_int_round_trip(chain, name):
    v = SERIES[name]
    out = decompress_column(compress_column(v, chain))
    assert out.dtype == v.dtype
    assert (out == v).all()


@pytest.mark.parametrize("chain", [["Gorilla"], ["Gorilla", "LZ4"],
                                   ["Gorilla", "ZSTD"]])
def test_float_round_trip(chain):
    v = SERIES["smooth_float"]
    out = decompress_column(compress_column(v, chain))
    assert (out == v).all()


def test_int32_round_trip():
    v = SERIES["int32"]
    out = decompress_column(compress_column(v, ["Delta", "LZ4"]))
    assert out.dtype == v.dtype and (out == v).all()


def test_compression_ratios():
    """Transform codecs must actually compress their target patterns."""
    ts = SERIES["timestamps"]
    raw = ts.nbytes
    dd = len(compress_column(ts, ["DoubleDelta"]))
    t64 = len(compress_column(ts, ["T64"]))
    assert dd < raw / 4          # constant stride -> tiny delta-of-delta
    assert t64 < raw / 3
    sm = SERIES["smooth_float"]
    go = len(compress_column(sm, ["Gorilla"]))
    assert go < sm.nbytes        # XOR packing beats raw on smooth series


def test_parse_codec_spec():
    assert parse_codec_spec("CODEC(Delta, LZ4)") == ["Delta", "LZ4"]
    assert parse_codec_spec("zstd") == ["ZSTD"]
    with pytest.raises(ValueError):
        parse_codec_spec("CODEC(Bogus)")


def test_codec_in_create_and_backup(tmp_path):
    s = ch.connect()
    s.execute("CREATE TABLE ct (ts Int64 CODEC(DoubleDelta, LZ4), "
              "v Float64 CODEC(Gorilla), name String)")
    n = 2000
    ts = np.arange(n, dtype=np.int64) * 60
    v = np.cumsum(RNG.normal(size=n) * 0.1)
    s.insert_pydict("ct", {"ts": ts, "v": v,
                           "name": np.asarray(["x"] * n, object)})
    t = s.catalog.get_table("default", "ct")
    assert t.codecs == {"ts": "DoubleDelta, LZ4", "v": "Gorilla"}
    path = str(tmp_path / "ct.backup")
    s.execute(f"BACKUP TABLE ct TO '{path}'")
    s.execute("DROP TABLE ct")
    s.execute(f"RESTORE TABLE ct FROM '{path}'")
    got = s.execute("SELECT sum(ts), max(v) FROM ct").rows()[0]
    assert got[0] == int(ts.sum())
    assert got[1] == pytest.approx(v.max())
    assert s.catalog.get_table("default", "ct").codecs["v"] == "Gorilla"
