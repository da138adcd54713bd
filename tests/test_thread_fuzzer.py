"""ThreadFuzzer (core/thread_fuzzer.py — ref src/Common/ThreadFuzzer.cpp):
random sleeps/yields at concurrency-sensitive sites widen race windows;
the ordinary correctness assertions then run under perturbed scheduling.
This is the race-detection tier: any latent race in the read pool,
background merges, async inserts, or replication becomes vastly more
likely to fire here."""
import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.core.thread_fuzzer import ThreadFuzzer, fuzz_yield


@pytest.fixture()
def fuzzer():
    f = ThreadFuzzer.start(sleep_probability=0.3, sleep_time_us=2000,
                           yield_probability=0.4, seed=7)
    yield f
    ThreadFuzzer.stop()


def test_disabled_is_noop():
    ThreadFuzzer.stop()
    fuzz_yield("anywhere")             # must not record or sleep
    assert not ThreadFuzzer.is_active()


def test_env_contract(monkeypatch):
    monkeypatch.setenv("THREAD_FUZZER_ENABLED", "1")
    monkeypatch.setenv("THREAD_FUZZER_SLEEP_PROBABILITY", "0.25")
    f = ThreadFuzzer.maybe_start_from_env()
    assert f is not None and f.sleep_probability == 0.25
    ThreadFuzzer.stop()


def test_read_pool_under_fuzzing(fuzzer):
    """Parallel chunk readers + reorder buffer stay exact under perturbed
    scheduling."""
    from clickhouse_tpu.storage.read_pool import ParallelChunkReader

    class _Src:
        num_chunks = 24

        def chunk(self, i):
            return {"x": np.full(10, i, dtype=np.int64)}, 10

    rd = ParallelChunkReader(_Src(), num_readers=4, max_buffered=6)
    seen = [i for i, data, n in rd.iter_ordered()]
    assert seen == list(range(24))     # ordered, none lost, none duplicated
    assert fuzzer.hits.get("read_pool_before_get_task", 0) > 0


def test_background_merges_under_fuzzing(fuzzer):
    s = ch.connect()
    s.execute("CREATE TABLE bm (x Int64) ENGINE = MergeTree ORDER BY x")
    for i in range(12):
        s.execute(f"INSERT INTO bm VALUES ({i})",
                  settings={"background_merge_min_parts": 4})
    s.execute("SYSTEM WAIT MERGES")
    assert s.execute("SELECT count(), sum(x) FROM bm").rows() == [(12, 66)]
    assert fuzzer.hits.get("background_merge_dequeue", 0) > 0


def test_concurrent_inserts_and_replication_under_fuzzing(fuzzer):
    import threading
    s = ch.connect()
    s.execute("CREATE TABLE rr (x Int64) "
              "ENGINE = ReplicatedMergeTree('/tf/rr', 'r1') ORDER BY x")
    errors = []

    def writer(base):
        try:
            for i in range(5):
                s2 = ch.connect(catalog=s.catalog)
                s2.execute(f"INSERT INTO rr VALUES ({base + i})")
        except Exception as e:         # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(b * 100,))
               for b in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert s.execute("SELECT count() FROM rr").rows() == [(15,)]
