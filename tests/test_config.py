"""Server config files (core/config.py — ConfigProcessor analog)."""
import numpy as np
import pytest

import clickhouse_tpu as ch


YAML_CFG = """
path: {data}
keeper: ""
tcp_port: 9003
http_port: 8125
profiles:
  default:
    max_groups: 131072
    group_array_max_size: 64
users:
  alice:
    password: secret
    readonly: 0
    grants: [select]
disks:
  snaps:
    type: local
    path: {snaps}
"""

XML_CFG = """<clickhouse>
  <profiles><default>
    <max_groups>65536</max_groups>
  </default></profiles>
  <users>
    <bob><password>pw</password></bob>
  </users>
  <tcp_port>9500</tcp_port>
</clickhouse>
"""


def test_yaml_config(tmp_path):
    from clickhouse_tpu.storage.table import Catalog
    cfg = tmp_path / "server.yaml"
    cfg.write_text(YAML_CFG.format(data=tmp_path / "data",
                                   snaps=tmp_path / "snaps"))
    s = ch.connect(catalog=Catalog(), config_path=str(cfg))
    assert s.settings.max_groups == 131072
    assert s.settings.group_array_max_size == 64
    # durable path live
    s.execute("CREATE TABLE t (x Int64) ENGINE = MergeTree ORDER BY x")
    s.execute("INSERT INTO t VALUES (5)")
    s2 = ch.connect(catalog=Catalog(), config_path=str(cfg))
    assert s2.execute("SELECT x FROM t").rows() == [(5,)]
    # users + disks registered
    s.login("alice", "secret")
    assert ("snaps", "local") in [
        (n, ty) for n, ty, _ in
        [tuple(r) for r in s2.execute(
            "SELECT name, type, path FROM system.disks").rows()]]
    # BACKUP to the configured named disk
    s2.execute("BACKUP TABLE t TO Disk('snaps', 't.bak')")
    s2.execute("DROP TABLE t")
    s2.execute("RESTORE TABLE t FROM Disk('snaps', 't.bak')")
    assert s2.execute("SELECT x FROM t").rows() == [(5,)]


def test_xml_config(tmp_path):
    from clickhouse_tpu.core.config import listener_ports, load_config
    from clickhouse_tpu.storage.table import Catalog
    cfg = tmp_path / "server.xml"
    cfg.write_text(XML_CFG)
    parsed = load_config(str(cfg))
    assert listener_ports(parsed)[1] == 9500
    s = ch.connect(catalog=Catalog(), config_path=str(cfg))
    assert s.settings.max_groups == 65536
    s.login("bob", "pw")


def test_hot_reload(tmp_path):
    from clickhouse_tpu.storage.table import Catalog
    cfg = tmp_path / "server.yaml"
    cfg.write_text("profiles: {default: {max_groups: 4096}}\n")
    s = ch.connect(catalog=Catalog(), config_path=str(cfg))
    assert s.settings.max_groups == 4096
    cfg.write_text("profiles: {default: {max_groups: 8192}}\n")
    s.execute("SYSTEM RELOAD CONFIG")
    assert s.settings.max_groups == 8192
