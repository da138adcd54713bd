"""Cross-process parallel replicas (VERDICT r04 item 10, second half):
N sessions over independent catalogs share ONE shard's scan through the
networked Keeper — announce ranges once, claim with ephemeral znodes,
a crashed replica's unfinished ranges reassign to the survivors
(ParallelReplicasReadingCoordinator analog)."""
import threading

import numpy as np
import pytest

import clickhouse_tpu as ch
from clickhouse_tpu.coordination.keeper import reset_keepers
from clickhouse_tpu.coordination.keeper_net import KeeperClient, KeeperServer
from clickhouse_tpu.parallel.replica_scan import coordinated_agg_scan
from clickhouse_tpu.storage.table import Catalog

N = 100_000
GR = 10_000
TPL = ("SELECT count() AS c, sum(v) AS s FROM t "
       "WHERE k >= {lo} AND k < {hi}")


@pytest.fixture()
def kserver():
    srv = KeeperServer(port=0).start_background()
    yield srv
    srv.shutdown()
    reset_keepers()


def _replica():
    s = ch.connect(catalog=Catalog())
    s.execute("CREATE TABLE t (k Int64, v Int64) ENGINE = MergeTree "
              "ORDER BY k")
    s.insert_pydict("t", {"k": np.arange(N, dtype=np.int64),
                          "v": (np.arange(N, dtype=np.int64) * 7) % 101})
    return s


def _merge(parts):
    c = sum(int(d["c"][0]) for d in parts.values())
    sv = sum(int(d["s"][0]) for d in parts.values())
    return c, sv


def test_two_replicas_split_the_scan(kserver):
    addr = f"127.0.0.1:{kserver.port}"
    a, b = _replica(), _replica()
    ka = KeeperClient("127.0.0.1", kserver.port)
    kb = KeeperClient("127.0.0.1", kserver.port)
    results = {}

    def run(name, sess, kc):
        results[name] = coordinated_agg_scan(
            sess, "t", "scan1", TPL, granule_rows=GR, keeper=kc)

    ta = threading.Thread(target=run, args=("a", a, ka))
    tb = threading.Thread(target=run, args=("b", b, kb))
    ta.start()
    tb.start()
    ta.join()
    tb.join()
    ra, rb = results["a"], results["b"]
    # every range done exactly once, work actually split
    assert set(ra) | set(rb) == set(range(N // GR))
    assert not (set(ra) & set(rb))
    c, sv = _merge({**ra, **rb})
    exp = int(((np.arange(N, dtype=np.int64) * 7) % 101).sum())
    assert (c, sv) == (N, exp)


def test_failed_replica_ranges_reassign(kserver):
    addr = f"127.0.0.1:{kserver.port}"
    a, b = _replica(), _replica()
    ka = KeeperClient("127.0.0.1", kserver.port)
    kb = KeeperClient("127.0.0.1", kserver.port)
    # replica A claims + finishes 2 ranges, then CRASHES (its keeper
    # session drops, ephemerals vanish)
    ra = coordinated_agg_scan(a, "t", "scan2", TPL, granule_rows=GR,
                              fail_after=2, keeper=ka)
    assert len(ra) == 2
    # A dies HOLDING a live claim on a range it never finished
    from clickhouse_tpu.parallel.replica_scan import ReplicaScanCoordinator
    orphan = ReplicaScanCoordinator(ka, "scan2").claim_next()
    assert orphan is not None
    ka.close()
    # survivor B completes everything A never finished
    rb = coordinated_agg_scan(b, "t", "scan2", TPL, granule_rows=GR,
                              keeper=kb)
    assert set(ra) | set(rb) == set(range(N // GR))
    c, sv = _merge({**ra, **rb})
    exp = int(((np.arange(N, dtype=np.int64) * 7) % 101).sum())
    assert (c, sv) == (N, exp)
