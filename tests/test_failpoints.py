"""SQL-toggleable fault injection (reference: src/Common/FailPoint.h:32,
SYSTEM ENABLE FAILPOINT) — named host-side hooks on storage mutation,
backup, async-insert flush, and distributed dispatch paths."""
import time

import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.core.failpoints import (GLOBAL_FAILPOINTS,
                                            FailPointTriggered)


@pytest.fixture(autouse=True)
def clean_failpoints():
    GLOBAL_FAILPOINTS.disable_all()
    yield
    GLOBAL_FAILPOINTS.disable_all()


@pytest.fixture()
def sess():
    s = ch.connect()
    s.execute("CREATE TABLE t (x Int64) ENGINE = MergeTree ORDER BY x")
    return s


def rows(res):
    return res.rows()


class TestFailPointRegistry:
    def test_unknown_name_rejected(self, sess):
        with pytest.raises(Exception, match="Unknown failpoint"):
            sess.execute("SYSTEM ENABLE FAILPOINT not_a_failpoint")

    def test_insert_failpoint_blocks_commit(self, sess):
        sess.execute("SYSTEM ENABLE FAILPOINT insert_before_commit_part")
        with pytest.raises(FailPointTriggered):
            sess.execute("INSERT INTO t VALUES (1)")
        sess.execute("SYSTEM DISABLE FAILPOINT insert_before_commit_part")
        sess.execute("INSERT INTO t VALUES (2)")
        assert rows(sess.execute("SELECT count() FROM t")) == [(1,)]

    def test_once_mode_fires_single_time(self, sess):
        sess.execute("SYSTEM ENABLE FAILPOINT insert_before_commit_part ONCE")
        with pytest.raises(FailPointTriggered):
            sess.execute("INSERT INTO t VALUES (1)")
        sess.execute("INSERT INTO t VALUES (2)")   # second attempt succeeds
        assert rows(sess.execute("SELECT count() FROM t")) == [(1,)]

    def test_sleep_mode_delays_not_fails(self, sess):
        sess.execute(
            "SYSTEM ENABLE FAILPOINT insert_before_commit_part SLEEP 0.05")
        t0 = time.monotonic()
        sess.execute("INSERT INTO t VALUES (1)")
        assert time.monotonic() - t0 >= 0.05
        assert rows(sess.execute("SELECT count() FROM t")) == [(1,)]

    def test_merge_failpoint_keeps_parts_intact(self, sess):
        sess.execute("INSERT INTO t VALUES (1)")
        sess.execute("INSERT INTO t VALUES (2)")
        sess.execute("SYSTEM ENABLE FAILPOINT merge_before_commit")
        with pytest.raises(FailPointTriggered):
            sess.execute("OPTIMIZE TABLE t")
        # the failed merge must not have corrupted the working set
        sess.execute("SYSTEM DISABLE FAILPOINT merge_before_commit")
        assert rows(sess.execute("SELECT sum(x) FROM t")) == [(3,)]

    def test_backup_failpoint(self, sess, tmp_path):
        sess.execute("INSERT INTO t VALUES (1)")
        sess.execute("SYSTEM ENABLE FAILPOINT backup_before_write")
        with pytest.raises(FailPointTriggered):
            sess.execute(f"BACKUP TABLE t TO '{tmp_path}/b.bak'")

    def test_system_failpoints_table(self, sess):
        sess.execute("SYSTEM ENABLE FAILPOINT merge_before_commit")
        got = rows(sess.execute(
            "SELECT name, mode, hits FROM system.failpoints"))
        assert got == [("merge_before_commit", "error", 0)]
