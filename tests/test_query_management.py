"""Query management: KILL QUERY + max_execution_time (exec/session.py
check_limits — the ProcessList / ExecutionSpeedLimits analog, ref
src/Interpreters/ProcessList.h, InterpreterKillQuery.cpp)."""
import threading
import time

import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.core.errors import QueryCancelled, TimeoutExceeded

STREAM = {"max_device_block_bytes": 1, "stream_chunk_rows": 1024}


@pytest.fixture(scope="module")
def session():
    s = ch.connect()
    s.execute("CREATE TABLE qm (k Int64, v Float64)")
    s.insert_pydict("qm", {"k": np.arange(50_000) % 13,
                           "v": np.arange(50_000) * 0.5})
    return s


def test_max_execution_time_interrupts_streamed_query(session):
    with pytest.raises(TimeoutExceeded, match="max_execution_time"):
        session.execute(
            "SELECT k, sum(v) FROM qm GROUP BY k "
            "SETTINGS max_execution_time = 0.0001, "
            "max_device_block_bytes = 1, stream_chunk_rows = 1024")
    # and it unregisters cleanly: the next query runs fine
    assert session.execute("SELECT count() FROM qm").rows() == [(50_000,)]


def test_kill_query_interrupts_running_query(session):
    """A second session kills a long streamed query mid-flight."""
    killer = ch.connect(catalog=session.catalog)
    errors = []

    def victim():
        try:
            session.execute(
                "SELECT k, sum(v) FROM qm GROUP BY k "
                "SETTINGS max_device_block_bytes = 1, "
                "stream_chunk_rows = 64",
                settings={"query_id": "victim-1"})
        except QueryCancelled as e:
            errors.append(e)

    t = threading.Thread(target=victim)
    t.start()
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline \
            and "victim-1" not in session.catalog.running_queries:
        time.sleep(0.005)
    r = killer.execute("KILL QUERY WHERE query_id = 'victim-1'")
    assert r.rows() == [("waiting", "victim-1", "default")]
    t.join(timeout=30)
    assert errors, "victim query was not cancelled"


def test_kill_query_no_match(session):
    assert session.execute(
        "KILL QUERY WHERE query_id = 'nope'").rows() == []


def test_processes_table_lists_running(session):
    rows = session.execute(
        "SELECT query_id, user FROM system.processes").rows()
    assert len(rows) == 1            # this very query
    assert rows[0][1] == "default"


class TestSampling:
    """SAMPLE ratio enforcement (plan/analyzer.py — the
    MergeTreeDataSelectExecutor sampling analog as a hash threshold on the
    declared SAMPLE BY key; VERDICT r03: previously parsed-but-ignored)."""

    @pytest.fixture(scope="class")
    def s(self):
        s = ch.connect()
        s.execute("CREATE TABLE smp (u Int64, v Float64) "
                  "ENGINE = MergeTree ORDER BY u SAMPLE BY u")
        s.insert_pydict("smp", {"u": np.arange(100_000, dtype=np.int64),
                                "v": np.ones(100_000)})
        return s

    def test_ratio_subsets(self, s):
        n = s.execute("SELECT count() FROM smp SAMPLE 0.1").rows()[0][0]
        assert 8_000 < n < 12_000
        n4 = s.execute("SELECT count() FROM smp SAMPLE 1/4").rows()[0][0]
        assert 22_000 < n4 < 28_000
        assert s.execute("SELECT count() FROM smp SAMPLE 1"
                         ).rows() == [(100_000,)]

    def test_deterministic_subset(self, s):
        a = s.execute("SELECT sum(u) FROM smp SAMPLE 0.5").rows()
        assert a == s.execute("SELECT sum(u) FROM smp SAMPLE 0.5").rows()

    def test_rejected_without_sample_by(self, s):
        s.execute("CREATE TABLE nosmp (x Int64)")
        with pytest.raises(Exception, match="does not support sampling"):
            s.execute("SELECT count() FROM nosmp SAMPLE 0.5")
