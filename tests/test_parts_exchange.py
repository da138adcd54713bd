"""Interserver part exchange (storage/parts_exchange.py — the
DataPartsExchange analog, ref src/Storages/MergeTree/DataPartsExchange.h):
replication log entries carry metadata only; part DATA travels
replica-to-replica over real sockets, with failover to any live peer."""
import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.coordination.keeper import reset_keepers
from clickhouse_tpu.coordination.keeper_net import KeeperServer
from clickhouse_tpu.storage.parts_exchange import fetch_part
from clickhouse_tpu.storage.table import Catalog


@pytest.fixture()
def kserver():
    srv = KeeperServer(port=0).start_background()
    yield srv
    srv.shutdown()
    reset_keepers()


def _mk_session(kserver, replica):
    s = ch.connect(catalog=Catalog())
    s.execute(f"SET keeper_address = '{kserver.host}:{kserver.port}'")
    s.replica_name = replica
    s.enable_parts_exchange()
    return s


DDL = ("CREATE TABLE r (k Int64, v Float64, s String) "
       "ENGINE = ReplicatedMergeTree('/t/px', '{replica}') ORDER BY k")


def test_metadata_only_log_and_wire_fetch(kserver):
    a = _mk_session(kserver, "ra")
    b = _mk_session(kserver, "rb")
    a.execute(DDL)
    b.execute(DDL)
    a.execute("INSERT INTO r VALUES (1, 0.5, 'x'), (2, 1.5, 'y')")
    # the log entry itself must NOT carry the column data
    rep_a = a.catalog.get_table("default", "r").replication
    entries = rep_a.keeper.get_children("/t/px/log")
    entry, _ = rep_a.keeper.get(f"/t/px/log/{entries[0]}")
    assert "data" not in entry
    assert entry["source"] == "ra"
    # the peer replays the log by fetching the part over the socket
    b.execute("SYSTEM SYNC REPLICA r")
    assert b.execute("SELECT k, v, s FROM r ORDER BY k").rows() \
        == [(1, 0.5, "x"), (2, 1.5, "y")]


def test_fetch_part_client_direct(kserver):
    a = _mk_session(kserver, "ra")
    a.execute(DDL)
    a.execute("INSERT INTO r VALUES (7, 2.0, 'q')")
    rep = a.catalog.get_table("default", "r").replication
    bid = next(iter(rep._block_store))
    data = fetch_part(a.parts_exchange.address, "/t/px", "ra", bid)
    assert data["k"].tolist() == [7]
    assert list(data["s"]) == ["q"]
    # miss -> None (not an exception)
    assert fetch_part(a.parts_exchange.address, "/t/px", "ra",
                      "nope") is None


def test_failover_to_surviving_replica(kserver):
    a = _mk_session(kserver, "ra")
    b = _mk_session(kserver, "rb")
    a.execute(DDL)
    b.execute(DDL)
    a.execute("INSERT INTO r VALUES (1, 1.0, 'a'), (2, 2.0, 'b')")
    b.execute("SYSTEM SYNC REPLICA r")        # rb now holds a copy too
    # source replica dies: endpoint down
    a.parts_exchange.shutdown()
    late = _mk_session(kserver, "rc")
    late.execute(DDL.replace("'ra'", "'rc'"))
    late.execute("SYSTEM SYNC REPLICA r")     # falls back to rb's endpoint
    assert late.execute("SELECT sum(k) FROM r").rows() == [(3,)]


def test_unfetchable_part_is_retried_not_skipped(kserver):
    a = _mk_session(kserver, "ra")
    a.execute(DDL)
    a.execute("INSERT INTO r VALUES (5, 5.0, 'e')")
    a.parts_exchange.shutdown()               # nobody can serve the part
    b = _mk_session(kserver, "rb")
    b.execute(DDL)
    with pytest.raises(Exception, match="unavailable from any replica"):
        b.execute("SYSTEM SYNC REPLICA r")
    # bring up a server again on the SOURCE and retry the same entry
    a.parts_exchange = None
    a.enable_parts_exchange()
    rep_a = a.catalog.get_table("default", "r").replication
    rep_a.attach_exchange(a.parts_exchange)
    b.execute("SYSTEM SYNC REPLICA r")
    assert b.execute("SELECT count() FROM r").rows() == [(1,)]
