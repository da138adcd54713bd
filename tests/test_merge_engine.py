"""Merge table engine (StorageMerge analog) + system.part_log."""
import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.core.errors import AnalysisError


def test_merge_engine_union():
    s = ch.connect()
    s.execute("CREATE TABLE m1 (x Int64, s String)")
    s.execute("CREATE TABLE m2 (x Int64, s String)")
    s.execute("INSERT INTO m1 VALUES (1, 'a'), (2, 'b')")
    s.execute("INSERT INTO m2 VALUES (3, 'c')")
    s.execute("CREATE TABLE allm (x Int64, s String) "
              "ENGINE = Merge(currentDatabase, '^m[0-9]$')")
    assert s.execute("SELECT x, s FROM allm ORDER BY x").rows() \
        == [(1, "a"), (2, "b"), (3, "c")]
    assert s.execute("SELECT count() FROM allm WHERE x >= 2").rows() \
        == [(2,)]
    # grouping across sources
    assert s.execute("SELECT s, count() FROM allm GROUP BY s ORDER BY s"
                     ).rows() == [("a", 1), ("b", 1), ("c", 1)]


def test_merge_engine_no_match():
    s = ch.connect()
    s.execute("CREATE TABLE nm (x Int64) "
              "ENGINE = Merge(currentDatabase, '^zzz$')")
    with pytest.raises(AnalysisError):
        s.execute("SELECT * FROM nm")


def test_part_log():
    s = ch.connect()
    s.execute("CREATE TABLE p (x Int64) ENGINE = MergeTree ORDER BY x")
    s.execute("INSERT INTO p VALUES (1)")
    s.execute("INSERT INTO p VALUES (2)")
    s.execute("OPTIMIZE TABLE p")
    rows = s.execute("SELECT event_type, rows FROM system.part_log "
                     "WHERE table = 'p' ORDER BY event_time").rows()
    assert rows[:2] == [("NewPart", 1), ("NewPart", 1)]
    assert rows[-1] == ("MergeParts", 2)
