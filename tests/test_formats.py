"""Format round-trip tests (CSV/Parquet/JSONEachRow/Native) + file() +
INTO OUTFILE / FROM INFILE."""
import os

import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.storage import formats, native_format


@pytest.fixture
def session():
    return ch.connect()


@pytest.fixture
def sample():
    return {
        "id": np.arange(100, dtype=np.int64),
        "name": np.asarray([f"name_{i % 10}" for i in range(100)], object),
        "score": np.arange(100, dtype=np.float64) * 1.5,
    }


class TestNativeFormat:
    def test_roundtrip_numeric_string(self, tmp_path, sample):
        p = str(tmp_path / "t.native")
        native_format.write_native_file(p, sample)
        back = native_format.read_native_file(p)
        np.testing.assert_array_equal(back["id"], sample["id"])
        np.testing.assert_array_equal(back["name"], sample["name"])
        np.testing.assert_allclose(back["score"], sample["score"])

    def test_roundtrip_nullable(self, tmp_path):
        vals = np.asarray([1.5, None, 3.5, None], object)
        p = str(tmp_path / "n.native")
        native_format.write_native_file(p, {"v": vals})
        back = native_format.read_native_file(p)
        assert back["v"][1] is None and back["v"][0] == 1.5

    def test_explicit_types(self, tmp_path):
        p = str(tmp_path / "typed.native")
        native_format.write_native_file(
            p, {"a": np.asarray([1, 2], np.int64)}, [("a", "UInt32")])
        with open(p, "rb") as f:
            data, types = native_format.read_native(f)
        assert types == [("a", "UInt32")]
        assert data["a"].dtype == np.uint32

    def test_multiblock(self, tmp_path):
        import io
        buf = io.BytesIO()
        native_format.write_native(buf, {"x": np.arange(10, dtype=np.int64)},
                                   block_rows=3)
        buf.seek(0)
        data, _ = native_format.read_native(buf)
        np.testing.assert_array_equal(data["x"], np.arange(10))


class TestFileFormats:
    @pytest.mark.parametrize("ext", ["parquet", "csv", "jsonl", "native", "orc", "avro"])
    def test_roundtrip(self, tmp_path, sample, ext):
        p = str(tmp_path / f"t.{ext}")
        formats.write_file(p, sample)
        back = formats.read_file(p)
        np.testing.assert_array_equal(np.asarray(back["id"], np.int64),
                                      sample["id"])
        assert list(back["name"]) == list(sample["name"])

    def test_file_table_function(self, tmp_path, session, sample):
        p = str(tmp_path / "data.parquet")
        formats.write_file(p, sample)
        r = session.execute(f"SELECT count(), sum(id) FROM file('{p}')")
        assert r.rows()[0] == (100, int(sample["id"].sum()))

    def test_file_group_by(self, tmp_path, session, sample):
        p = str(tmp_path / "data.csv")
        formats.write_file(p, sample)
        r = session.execute(
            f"SELECT name, count() AS c FROM file('{p}') "
            f"GROUP BY name ORDER BY name LIMIT 3")
        assert r.rows()[0] == ("name_0", 10)

    def test_into_outfile(self, tmp_path, session, sample):
        session.create_table_from_pydict("src", sample)
        out = str(tmp_path / "out.parquet")
        session.execute(f"SELECT id, score FROM src WHERE id < 10 "
                        f"INTO OUTFILE '{out}'")
        back = formats.read_file(out)
        assert len(back["id"]) == 10

    def test_from_infile(self, tmp_path, session, sample):
        p = str(tmp_path / "in.csv")
        formats.write_file(p, sample)
        session.execute("CREATE TABLE dst (id Int64, name String, score Float64)")
        session.execute(f"INSERT INTO dst FROM INFILE '{p}'")
        assert session.execute("SELECT count() FROM dst").scalar() == 100

    def test_text_format_rendering(self, sample):
        txt = formats.format_rows_text(
            {"a": np.asarray([1, 2]), "b": np.asarray(["x", "y"], object)},
            "CSVWithNames")
        assert txt == "a,b\n1,x\n2,y\n"
        j = formats.format_rows_text({"a": np.asarray([1])}, "JSONEachRow")
        assert j == '{"a": 1}\n'


class TestNativeCodecRobustness:
    """Malformed input must error cleanly, never read/write out of bounds
    (ADVICE r1: varint/LZ4 length overflows defeated the bounds checks)."""

    def test_huge_varint_length_rejected(self):
        from clickhouse_tpu import native as chn
        # varint encoding of 2^64-1: nine 0xFF bytes + 0x01
        evil = b"\xff" * 9 + b"\x01" + b"abc"
        with pytest.raises(ValueError):
            chn.decode_strings(evil, 1)

    def test_varint_length_beyond_input_rejected(self):
        from clickhouse_tpu import native as chn
        # plausible length (1000) but only 3 bytes of payload
        evil = b"\xe8\x07" + b"abc"
        with pytest.raises(ValueError):
            chn.decode_strings(evil, 1)

    def test_lz4_literal_run_overflow_rejected(self):
        from clickhouse_tpu import native as chn
        # token=0xF0 (literal run w/ extension), then a long 0xFF run that
        # would wrap a 32-bit length counter
        evil = b"\xf0" + b"\xff" * (1 << 15) + b"\x00"
        with pytest.raises(ValueError):
            chn.lz4_decompress(evil, 64)

    def test_lz4_match_run_overflow_rejected(self):
        from clickhouse_tpu import native as chn
        evil = b"\x1fA\x01\x00" + b"\xff" * (1 << 15) + b"\x00"
        with pytest.raises(ValueError):
            chn.lz4_decompress(evil, 64)

    def test_lz4_roundtrip_still_works(self):
        from clickhouse_tpu import native as chn
        data = (b"hello world " * 1000) + b"tail"
        comp = chn.lz4_compress(data)
        assert chn.lz4_decompress(comp, len(data)) == data


class TestRowBinary:
    """RowBinary[WithNamesAndTypes] (reference:
    src/Processors/Formats/Impl/BinaryRowInputFormat.cpp)."""

    def test_roundtrip_with_names_types(self, tmp_path):
        import numpy as np
        import clickhouse_tpu as ch
        s = ch.connect()
        s.execute("CREATE TABLE t (a Int64, b Float64, s String, "
                  "n Nullable(Int32))")
        s.execute("INSERT INTO t VALUES (1, 2.5, 'x', 3), "
                  "(-7, 0.25, 'hello world', NULL)")
        p = str(tmp_path / "out.rb")
        s.execute(f"SELECT * FROM t INTO OUTFILE '{p}' "
                  "FORMAT RowBinaryWithNamesAndTypes")
        s2 = ch.connect()
        s2.execute("CREATE TABLE t2 (a Int64, b Float64, s String, "
                   "n Nullable(Int32))")
        s2.execute(f"INSERT INTO t2 FROM INFILE '{p}' "
                   "FORMAT RowBinaryWithNamesAndTypes")
        assert s2.execute("SELECT * FROM t2 ORDER BY a").rows() == \
            s.execute("SELECT * FROM t ORDER BY a").rows()

    def test_wire_bytes_exact(self, tmp_path):
        # byte-level check against the published layout: varint ncols,
        # names, types, then row-major LE values
        from clickhouse_tpu.storage.rowbinary import write_rowbinary
        import numpy as np
        out = write_rowbinary(
            {"a": np.asarray([1], np.uint8),
             "s": np.asarray(["hi"], object)},
            [("a", "UInt8"), ("s", "String")], with_names_types=True)
        assert out == (b"\x02" b"\x01a" b"\x01s"
                       b"\x05UInt8" b"\x06String"
                       b"\x01" b"\x02hi")

    def test_bare_rowbinary_write(self, tmp_path):
        from clickhouse_tpu.storage.rowbinary import (read_rowbinary,
                                                      write_rowbinary)
        import numpy as np
        data = {"x": np.asarray([3, -9], np.int64),
                "f": np.asarray([1.5, 2.25], np.float64)}
        types = [("x", "Int64"), ("f", "Float64")]
        blob = write_rowbinary(data, types, with_names_types=False)
        assert len(blob) == 2 * (8 + 8)
        back = read_rowbinary(blob, schema=types)
        assert back["x"].tolist() == [3, -9]
        assert back["f"].tolist() == [1.5, 2.25]

    def test_arrays_and_dates(self):
        import datetime
        import numpy as np
        from clickhouse_tpu.storage.rowbinary import (read_rowbinary,
                                                      write_rowbinary)
        arrs = np.empty(2, object)
        arrs[0] = [1, 2, 3]
        arrs[1] = []
        data = {"d": np.asarray([datetime.date(2020, 1, 2),
                                 datetime.date(1970, 1, 1)], object),
                "a": arrs}
        types = [("d", "Date"), ("a", "Array(Int32)")]
        blob = write_rowbinary(data, types, with_names_types=True)
        back = read_rowbinary(blob)
        assert back["d"].tolist() == [datetime.date(2020, 1, 2),
                                      datetime.date(1970, 1, 1)]
        assert back["a"].tolist() == [[1, 2, 3], []]


class TestOrcAvro:
    """ORC (via arrow) + Avro OCF (from-scratch codec, storage/avro_format.py
    — ref src/Processors/Formats/Impl/AvroRowInputFormat.cpp)."""

    def test_avro_nullable_union(self, tmp_path):
        p = str(tmp_path / "n.avro")
        data = {"v": np.asarray([1, None, 3], dtype=object),
                "s": np.asarray(["a", None, "c"], dtype=object)}
        formats.write_file(p, data, types=[("v", "Nullable(Int64)"),
                                           ("s", "Nullable(String)")])
        back = formats.read_file(p)
        assert list(back["v"]) == [1, None, 3]
        assert list(back["s"]) == ["a", None, "c"]

    def test_avro_header_is_spec_conformant(self, tmp_path):
        import json
        p = str(tmp_path / "h.avro")
        formats.write_file(p, {"x": np.arange(4, dtype=np.int64)})
        raw = open(p, "rb").read()
        assert raw[:4] == b"Obj\x01"            # OCF magic per the spec
        assert b"avro.schema" in raw
        schema_start = raw.index(b'{"type"')
        depth = 0
        for i in range(schema_start, len(raw)):
            if raw[i:i+1] == b"{":
                depth += 1
            elif raw[i:i+1] == b"}":
                depth -= 1
                if depth == 0:
                    schema = json.loads(raw[schema_start:i+1])
                    break
        assert schema["type"] == "record"
        assert schema["fields"][0]["name"] == "x"

    def test_orc_file_table_function(self, tmp_path, session, sample):
        p = str(tmp_path / "d.orc")
        formats.write_file(p, sample)
        r = session.execute(f"SELECT count(), sum(id) FROM file('{p}')")
        assert r.rows()[0] == (100, int(np.asarray(sample["id"]).sum()))

    def test_avro_file_table_function(self, tmp_path, session, sample):
        p = str(tmp_path / "d.avro")
        formats.write_file(p, sample)
        r = session.execute(
            f"SELECT name, count() AS c FROM file('{p}') "
            f"GROUP BY name ORDER BY name LIMIT 1")
        assert r.rows()[0] == ("name_0", 10)
