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


def test_block_store_gc_and_clone_recovery(kserver):
    """Advisor r03: _block_store must not retain every block forever.  Once
    every registered replica applied an entry, its block is evicted; a
    replica attaching later recovers by cloning a peer's snapshot."""
    a = _mk_session(kserver, "ra")
    b = _mk_session(kserver, "rb")
    a.execute(DDL)
    b.execute(DDL)
    rep_a = a.catalog.get_table("default", "r").replication
    rep_b = b.catalog.get_table("default", "r").replication
    a.execute("INSERT INTO r VALUES (1, 1.0, 'a')")
    b.execute("SYSTEM SYNC REPLICA r")
    a.execute("INSERT INTO r VALUES (2, 2.0, 'b')")
    b.execute("SYSTEM SYNC REPLICA r")
    # ra pulls -> sees every pointer advanced past entry 1 -> evicts it
    a.execute("SYSTEM SYNC REPLICA r")
    assert len(rep_a._block_store) <= 1          # entry-2 may remain
    assert len(rep_b._block_store) <= 1
    # a replica registering AFTER eviction replays -> miss -> clones
    late = _mk_session(kserver, "rc")
    late.execute(DDL.replace("'ra'", "'rc'"))
    late.execute("SYSTEM SYNC REPLICA r")
    assert late.execute("SELECT k, v, s FROM r ORDER BY k").rows() \
        == [(1, 1.0, "a"), (2, 2.0, "b")]
    # and it keeps receiving NEW entries normally afterwards
    a.execute("INSERT INTO r VALUES (3, 3.0, 'c')")
    late.execute("SYSTEM SYNC REPLICA r")
    assert late.execute("SELECT sum(k) FROM r").rows() == [(6,)]


def test_interserver_credentials(kserver):
    """Fetches without the shared secret are rejected (InterserverCredentials
    analog); matching secrets replicate normally."""
    a = ch.connect(catalog=Catalog())
    a.execute(f"SET keeper_address = '{kserver.host}:{kserver.port}'")
    a.replica_name = "ra"
    a.enable_parts_exchange(secret="topsecret")
    a.execute(DDL)
    a.execute("INSERT INTO r VALUES (1, 1.0, 'a')")
    rep = a.catalog.get_table("default", "r").replication
    bid = next(iter(rep._block_store))
    # wrong/missing secret -> auth error, not a silent miss
    with pytest.raises(Exception, match="credentials"):
        fetch_part(a.parts_exchange.address, "/t/px", "ra", bid)
    with pytest.raises(Exception, match="credentials"):
        fetch_part(a.parts_exchange.address, "/t/px", "ra", bid,
                   secret="wrong")
    assert fetch_part(a.parts_exchange.address, "/t/px", "ra", bid,
                      secret="topsecret")["k"].tolist() == [1]
    # a peer configured with the same secret replicates fine
    b = ch.connect(catalog=Catalog())
    b.execute(f"SET keeper_address = '{kserver.host}:{kserver.port}'")
    b.replica_name = "rb"
    b.enable_parts_exchange(secret="topsecret")
    b.execute(DDL)
    b.execute("SYSTEM SYNC REPLICA r")
    assert b.execute("SELECT count() FROM r").rows() == [(1,)]
