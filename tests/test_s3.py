"""S3-compatible object storage (storage/s3.py — the
src/Disks/ObjectStorages/S3 analog): SigV4-signed REST client against the
bundled MiniS3Server (the minio-integration-environment stand-in, which
RECOMPUTES and verifies every signature), durable MergeTree tables whose
parts live only in the object store, BACKUP TO an S3 disk."""
import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.core.errors import EngineError
from clickhouse_tpu.storage.disks import ObjectStorageDisk
from clickhouse_tpu.storage.s3 import MiniS3Server, S3ObjectStorage
from clickhouse_tpu.storage.table import Catalog

CREDS = dict(access_key_id="AKIATEST", secret_access_key="sekrit")


@pytest.fixture()
def s3server():
    srv = MiniS3Server(bucket="eng", **CREDS).start_background()
    yield srv
    srv.shutdown()


def _store(srv, **kw):
    return S3ObjectStorage(srv.endpoint, "eng", region="us-east-1",
                           **{**CREDS, **kw})


def test_blob_contract_roundtrip(s3server):
    st = _store(s3server)
    st.put("a/b/one.bin", b"\x00\x01payload")
    st.put("a/two.bin", b"xyz")
    assert st.get("a/b/one.bin") == b"\x00\x01payload"
    assert st.list_keys("a/") == ["a/b/one.bin", "a/two.bin"]
    assert st.list_keys() == ["a/b/one.bin", "a/two.bin"]
    st.delete("a/two.bin")
    assert st.list_keys() == ["a/b/one.bin"]
    with pytest.raises(EngineError, match="not found"):
        st.get("a/two.bin")


def test_sigv4_is_verified(s3server):
    bad = S3ObjectStorage(s3server.endpoint, "eng",
                          access_key_id="AKIATEST",
                          secret_access_key="wrong")
    with pytest.raises(EngineError, match="HTTP 403"):
        bad.put("k", b"v")
    # keys with characters needing URL encoding round-trip
    st = _store(s3server)
    st.put("dir/We ird+key%3.bin", b"ok")
    assert st.get("dir/We ird+key%3.bin") == b"ok"


def test_tables_survive_restart_on_s3_only(s3server, tmp_path):
    """Kill-and-restart with parts living ONLY in the object store: a
    fresh catalog (new process analog) reloads everything from S3."""

    def fresh():
        c = Catalog()
        c.enable_persistence(ObjectStorageDisk("s3", _store(s3server,
                                                            prefix="data")))
        return ch.connect(catalog=c)

    s = fresh()
    s.execute("CREATE TABLE t (k Int64, v Float64, s String) "
              "ENGINE = MergeTree ORDER BY k")
    s.insert_pydict("t", {"k": np.arange(200, dtype=np.int64),
                          "v": np.arange(200) * 0.5,
                          "s": np.array([f"x{i % 9}" for i in range(200)],
                                        object)})
    want = s.execute("SELECT sum(k), sum(v), count(DISTINCT s) "
                     "FROM t").rows()
    assert any(k.startswith("data/") for k in s3server.blobs)
    s2 = fresh()
    assert s2.execute("SELECT sum(k), sum(v), count(DISTINCT s) "
                      "FROM t").rows() == want


def test_backup_to_s3_disk(s3server):
    c = Catalog()
    from clickhouse_tpu.storage.disks import DiskRegistry
    c.disks = DiskRegistry()
    c.disks.register(ObjectStorageDisk("s3", _store(s3server)))
    s = ch.connect(catalog=c)
    s.execute("CREATE TABLE t (k Int64)")
    s.insert_pydict("t", {"k": np.arange(50, dtype=np.int64)})
    s.execute("BACKUP TABLE t TO Disk('s3', 'bk1')")
    s.execute("DROP TABLE t")
    s.execute("RESTORE TABLE t FROM Disk('s3', 'bk1')")
    assert s.execute("SELECT sum(k) FROM t").rows() == [(1225,)]


def test_s3_disk_from_config(s3server, tmp_path):
    cfg = tmp_path / "server.yaml"
    cfg.write_text(f"""
disks:
  s3main:
    type: s3
    endpoint: {s3server.endpoint}
    bucket: eng
    access_key_id: AKIATEST
    secret_access_key: sekrit
""")
    s = ch.connect(catalog=Catalog(), config_path=str(cfg))
    disk = s.catalog.disks.get("s3main")
    assert disk is not None
    disk.write_file("probe/x.txt", b"hello")
    assert disk.read_file("probe/x.txt") == b"hello"
    rows = s.execute("SELECT name, type FROM system.disks "
                     "ORDER BY name").rows()
    assert any(n == "s3main" for n, _ in rows)
