"""Async INSERT batching (AsynchronousInsertQueue analog).

Reference semantics under test (src/Interpreters/AsynchronousInsertQueue.cpp):
wait_for_async_insert=1 blocks until the batch commits; batches flush on the
busy timeout or on the size threshold; SYSTEM FLUSH ASYNC INSERT QUEUE drains
synchronously; fire-and-forget inserts become visible after a flush; small
inserts coalesce into fewer parts than queries.
"""
import time

import numpy as np
import pytest

from clickhouse_tpu.exec.session import Session


def _mk(s):
    s.execute("CREATE TABLE ai (x Int64, s String) ENGINE = MergeTree "
              "ORDER BY x")


def test_wait_for_async_insert_visible_immediately():
    s = Session()
    _mk(s)
    s.execute("SET async_insert = 1")
    s.execute("INSERT INTO ai VALUES (1, 'a'), (2, 'b')")
    r = s.execute("SELECT count() FROM ai")
    assert r.rows()[0][0] == 2


def test_fire_and_forget_then_system_flush():
    s = Session()
    _mk(s)
    s.execute("SET async_insert = 1")
    s.execute("SET wait_for_async_insert = 0")
    s.execute("SET async_insert_busy_timeout_ms = 60000")  # no timer rescue
    s.execute("INSERT INTO ai VALUES (1, 'a')")
    s.execute("INSERT INTO ai VALUES (2, 'b')")
    pend = s.execute("SELECT table, total_rows FROM "
                     "system.asynchronous_inserts").rows()
    assert pend == [("ai", 2)]
    assert s.execute("SELECT count() FROM ai").rows()[0][0] == 0
    s.execute("SYSTEM FLUSH ASYNC INSERT QUEUE")
    assert s.execute("SELECT count() FROM ai").rows()[0][0] == 2


def test_small_inserts_coalesce_into_one_part():
    s = Session()
    _mk(s)
    s.execute("SET async_insert = 1")
    s.execute("SET wait_for_async_insert = 0")
    s.execute("SET async_insert_busy_timeout_ms = 60000")
    for i in range(8):
        s.execute(f"INSERT INTO ai VALUES ({i}, 'v{i}')")
    s.execute("SYSTEM FLUSH ASYNC INSERT QUEUE")
    t = s.catalog.get_table("default", "ai")
    assert len(t.parts) == 1          # 8 queries -> one committed part
    assert s.execute("SELECT sum(x) FROM ai").rows()[0][0] == 28


def test_busy_timeout_flushes_in_background():
    s = Session()
    _mk(s)
    s.execute("SET async_insert = 1")
    s.execute("SET wait_for_async_insert = 0")
    s.execute("SET async_insert_busy_timeout_ms = 50")
    s.execute("INSERT INTO ai VALUES (7, 'z')")
    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        if s.execute("SELECT count() FROM ai").rows()[0][0] == 1:
            break
        time.sleep(0.02)
    assert s.execute("SELECT count() FROM ai").rows()[0][0] == 1


def test_size_threshold_flushes_inline():
    s = Session()
    _mk(s)
    s.execute("SET async_insert = 1")
    s.execute("SET wait_for_async_insert = 0")
    s.execute("SET async_insert_busy_timeout_ms = 60000")
    s.execute("SET async_insert_max_data_size = 32")   # tiny threshold
    s.execute("INSERT INTO ai VALUES (1, 'aaaaaaaaaaaaaaaaaaaaaaaaaaaaa')")
    assert s.execute("SELECT count() FROM ai").rows()[0][0] == 1


def test_flush_error_propagates_to_waiter():
    s = Session()
    _mk(s)
    s.execute("SET async_insert = 1")
    with pytest.raises(Exception):
        s.execute("INSERT INTO ai (x, s, nosuch) VALUES (1, 'a', 2)")


def test_async_insert_feeds_materialized_view():
    s = Session()
    _mk(s)
    s.execute("CREATE TABLE ai_tgt (x Int64) ENGINE = MergeTree ORDER BY x")
    s.execute("CREATE MATERIALIZED VIEW ai_mv TO ai_tgt AS "
              "SELECT x * 10 AS x FROM ai")
    s.execute("SET async_insert = 1")
    s.execute("INSERT INTO ai VALUES (3, 'm')")
    assert s.execute("SELECT x FROM ai_tgt").rows() == [(30,)]
