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


class TestCityHash128:
    """CityHash128 v1.0.2 — the reference's compressed-frame checksum
    (src/Compression/CompressedWriteBuffer.cpp:38).  Expected values were
    produced by compiling the reference's vendored contrib/cityhash102 and
    hashing prefixes of a fixed LCG byte stream."""

    # (length, low64, high64)
    VECTORS = [
        (0, 4463240938071824939, 4374473821787594281),
        (1, 8844236077112413634, 16069063581692500755),
        (3, 3142164928783398545, 1726284097749069921),
        (4, 6528914767755952347, 5824878644558525755),
        (7, 12619342414558028666, 2504092284577919134),
        (8, 16058182292754343474, 8473100674131140636),
        (9, 10720042232786483565, 6243791916291514532),
        (15, 13256128838049846941, 1804874465203703246),
        (16, 9612451368687417663, 944840382185044203),
        (17, 13521379192136727546, 13399382255433260982),
        (31, 11166308815281013586, 14470909399459285891),
        (32, 14853371121364875680, 14951053386660795420),
        (33, 1513705158158276989, 18130248870270302313),
        (63, 16979915460339597185, 15057940416574015295),
        (64, 4464895272306789487, 394512510116768730),
        (65, 14160253492471058802, 850125386272390000),
        (100, 4924821590460835808, 10743495867110604167),
        (127, 9293071371313939827, 1604867561506277401),
        (128, 6525083457041515478, 14512914407863999333),
        (129, 10818172391934880657, 1977332169125804015),
        (200, 715751247517763894, 5949353971915929536),
        (255, 18267273417191066354, 890970985396517982),
        (256, 8310017627252450208, 17714541661286767308),
        (257, 1365436217426717722, 3458121658182926419),
        (500, 13356042617046531056, 3705456797098715513),
        (1000, 17313149582011185820, 16894989019747783485),
        (2000, 10528944442454229161, 8212990069430729311),
    ]

    @staticmethod
    def _data():
        out = bytearray()
        v = 12345
        for _ in range(2000):
            v = (v * 1103515245 + 12345) & 0xFFFFFFFF
            out.append((v >> 16) & 0xFF)
        return bytes(out)

    def test_reference_vectors(self):
        import struct
        from clickhouse_tpu.native import cityhash128
        data = self._data()
        for n, lo, hi in self.VECTORS:
            assert cityhash128(data[:n]) == struct.pack("<QQ", lo, hi), n

    def test_python_fallback_matches(self):
        from clickhouse_tpu.native import cityhash128, _py_cityhash128
        data = self._data()
        for n, _, _ in self.VECTORS:
            assert _py_cityhash128(data[:n]) == cityhash128(data[:n])

    def test_wire_frame_checksum_is_cityhash(self):
        import io
        import struct
        from clickhouse_tpu.native import cityhash128
        from clickhouse_tpu.storage import wire_compression as wc
        buf = io.BytesIO()
        payload = b"hello columnar world" * 30
        wc.write_frame(buf, payload)
        raw = buf.getvalue()
        assert raw[:16] == cityhash128(raw[16:])
        buf.seek(0)
        assert wc.read_frame(buf) == payload
