"""Native C++ runtime component tests (LZ4 codec, string codec, hasher)."""
import numpy as np
import pytest

from clickhouse_tpu import native


@pytest.fixture(scope="module", autouse=True)
def ensure_built():
    native._load()


class TestLZ4:
    def test_roundtrip_compressible(self):
        data = (b"hello world, hello world, hello world! " * 100)
        c = native.lz4_compress(data)
        assert len(c) < len(data) // 2 or not native.HAVE_NATIVE
        assert native.lz4_decompress(c, len(data)) == data

    def test_roundtrip_random(self):
        rng = np.random.default_rng(3)
        data = rng.integers(0, 256, 10000).astype(np.uint8).tobytes()
        c = native.lz4_compress(data)
        assert native.lz4_decompress(c, len(data)) == data

    def test_empty(self):
        assert native.lz4_decompress(native.lz4_compress(b""), 0) == b""

    def test_small(self):
        for n in range(1, 20):
            data = bytes(range(n))
            assert native.lz4_decompress(native.lz4_compress(data), n) == data

    def test_long_match_and_literals(self):
        data = b"A" * 10000 + bytes(np.arange(256, dtype=np.uint8)) * 4
        c = native.lz4_compress(data)
        assert native.lz4_decompress(c, len(data)) == data

    def test_python_fallback_agrees(self):
        data = b"abcabcabcabc" * 50 + b"tail-literals-here"
        c = native.lz4_compress(data)
        # the pure-python decompressor must accept native-compressed data
        assert native._py_lz4_decompress(c, len(data)) == data


class TestStringCodec:
    def test_roundtrip(self):
        vals = np.asarray(["", "a", "hello", "héllo wörld", "x" * 300],
                          object)
        enc = native.encode_strings(vals)
        dec, consumed = native.decode_strings(enc, len(vals))
        assert consumed == len(enc)
        assert list(dec) == list(vals)

    def test_large_column(self):
        vals = np.asarray([f"value_{i}" for i in range(10000)], object)
        enc = native.encode_strings(vals)
        dec, _ = native.decode_strings(enc, len(vals))
        assert list(dec) == list(vals)

    def test_interop_with_native_format(self):
        """The C++ string codec must produce exactly the Native-format
        byte stream the Python reader understands."""
        import io
        from clickhouse_tpu.storage import native_format
        vals = np.asarray(["x", "yy", "zzz"], object)
        enc = native.encode_strings(vals)
        back = native_format._read_column_data(io.BytesIO(enc), "String", 3)
        assert list(back) == ["x", "yy", "zzz"]


class TestHasher:
    def test_matches_device_hash(self):
        import jax.numpy as jnp
        from clickhouse_tpu.ops import hash_ops
        x = np.asarray([0, 1, 2, 12345678901234567], np.uint64)
        host = native.hash64_np(x)
        dev = np.asarray(hash_ops.hash64(jnp.asarray(x)))
        np.testing.assert_array_equal(host, dev)
