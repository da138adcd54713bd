"""Work-stealing parallel read pool (storage/read_pool.py) — the analog of
MergeTreeReadPool dynamic task pull (ref: src/Storages/MergeTree/
MergeTreeReadPool.h:22) and ParallelReplicasReadingCoordinator failure
reassignment (ref: ParallelReplicasReadingCoordinator.cpp:219)."""
import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.storage.read_pool import (ParallelChunkReader,
                                              ReadCoordinator)

N = 20_000
STREAM = {"max_device_block_bytes": 1, "stream_chunk_rows": 1024}


class TestReadCoordinator:
    def test_tasks_handed_out_once_in_order(self):
        c = ReadCoordinator(5)
        got = [c.get_task("a") for _ in range(6)]
        assert got == [0, 1, 2, 3, 4, None]

    def test_work_stealing_across_readers(self):
        c = ReadCoordinator(4)
        assert c.get_task("fast") == 0
        assert c.get_task("slow") == 1
        assert c.finish_task("fast", 0)
        # the fast reader keeps pulling while slow still holds task 1
        assert c.get_task("fast") == 2
        assert c.get_task("fast") == 3

    def test_unavailable_reader_tasks_reassigned(self):
        c = ReadCoordinator(3)
        assert c.get_task("dead") == 0
        assert c.get_task("live") == 1
        assert c.mark_unavailable("dead") == 1       # task 0 requeued
        assert c.get_task("dead") is None            # no work for the dead
        assert c.get_task("live") == 0               # live replica absorbs it
        assert c.get_task("live") == 2

    def test_reassigned_task_result_discarded(self):
        """Exactly-once: a zombie reader's late finish must not count."""
        c = ReadCoordinator(2)
        assert c.get_task("zombie") == 0
        c.mark_unavailable("zombie")
        assert c.get_task("live") == 0
        assert not c.finish_task("zombie", 0)        # late result dropped
        assert c.finish_task("live", 0)
        assert c.get_task("live") == 1
        assert c.finish_task("live", 1)
        assert c.all_done


@pytest.fixture(scope="module")
def session():
    s = ch.connect()
    s.execute("CREATE TABLE big (id Int64, k Int64, v Float64, s String)")
    rng = np.random.default_rng(3)
    ids = np.arange(N, dtype=np.int64)
    for lo in range(0, N, 7_000):
        hi = min(lo + 7_000, N)
        s.insert_pydict("big", {
            "id": ids[lo:hi],
            "k": (ids[lo:hi] % 53),
            "v": rng.normal(0, 1, hi - lo).round(4),
            "s": np.asarray([f"s{i % 17}" for i in range(lo, hi)], object)})
    return s


class TestParallelChunkReader:
    def test_ordered_iteration_matches_sequential(self, session):
        t = session.catalog.get_table("default", "big")
        src = t.chunk_source(["id", "k", "v", "s"], 1024)
        seq = [src.chunk(i) for i in range(src.num_chunks)]
        rdr = ParallelChunkReader(src, num_readers=4, max_buffered=6)
        got = list(rdr.iter_ordered())
        assert [i for i, _, _ in got] == list(range(src.num_chunks))
        for (i, data, n) in got:
            ref_data, ref_n = seq[i]
            assert n == ref_n
            for name in ref_data:
                np.testing.assert_array_equal(data[name][0],
                                              ref_data[name][0])

    def test_reader_exception_surfaces(self, session):
        t = session.catalog.get_table("default", "big")
        src = t.chunk_source(["id"], 1024)

        class Boom(Exception):
            pass

        class BadSrc:
            num_chunks = src.num_chunks

            def chunk(self, i):
                raise Boom("disk gone")

        rdr = ParallelChunkReader(BadSrc(), num_readers=2)
        with pytest.raises(Boom):
            list(rdr.iter_ordered())


class TestParallelStreamedQueries:
    """Same SQL with 1 vs 4 readers must agree exactly (the reference's
    parallel-replicas correctness bar: partial results merge to the same
    answer regardless of which replica read which range)."""

    QUERIES = [
        "SELECT count(), sum(v), min(id), max(id) FROM big",
        "SELECT k, count(), round(sum(v), 3) FROM big GROUP BY k ORDER BY k",
        "SELECT s, count() FROM big GROUP BY s ORDER BY s",
        "SELECT count() FROM big WHERE id % 3 = 0 AND v > 0",
    ]

    @pytest.mark.parametrize("sql", QUERIES)
    def test_parallel_equals_serial(self, session, sql):
        serial = session.execute(
            sql, settings=dict(STREAM, stream_readers=1)).rows()
        parallel = session.execute(
            sql, settings=dict(STREAM, stream_readers=4)).rows()
        assert serial == parallel
