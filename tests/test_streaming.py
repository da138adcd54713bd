"""Out-of-core streaming execution: chunked scans with mergeable aggregation
states carried across chunks (exec/streaming.py).

Every test runs the same SQL twice — once whole-block, once with thresholds
forcing streaming over many small chunks — and demands identical results
(the reference validates external aggregation the same way: same answer
with and without max_bytes_before_external_group_by)."""
import numpy as np
import pytest

import clickhouse_tpu as ch

# thresholds that force streaming on tiny test tables: every table is "big",
# chunks are one pad unit (1024 rows) -> ~10 chunks for the fixture
STREAM = {"max_device_block_bytes": 1, "stream_chunk_rows": 1024}

N = 10_000


@pytest.fixture(scope="module")
def session():
    s = ch.connect()
    s.execute("""
        CREATE TABLE big (
            id Int64, k Int64, kw Int64, v Float64,
            cat String, nv Nullable(Int64)
        )
    """)
    rng = np.random.default_rng(7)
    ids = np.arange(N, dtype=np.int64)
    k = (ids % 97).astype(np.int64)
    kw = rng.integers(0, 3000, N).astype(np.int64) * 1_000_003
    v = rng.normal(100.0, 10.0, N).round(3)
    cat = np.asarray([f"c{i % 13}" for i in range(N)], object)
    nv = np.asarray([None if i % 11 == 0 else int(i % 7)
                     for i in range(N)], object)
    # several inserts -> several parts (chunks cross part boundaries)
    for lo in range(0, N, 3_000):
        hi = min(lo + 3_000, N)
        s.insert_pydict("big", {
            "id": ids[lo:hi], "k": k[lo:hi], "kw": kw[lo:hi],
            "v": v[lo:hi], "cat": cat[lo:hi], "nv": nv[lo:hi]})
    s.execute("CREATE TABLE dim (k Int64, name String)")
    s.insert_pydict("dim", {
        "k": np.arange(97, dtype=np.int64),
        "name": np.asarray([f"name{i}" for i in range(97)], object)})
    return s


def both(session, sql):
    """(plain rows, streamed rows); asserts streaming actually engaged."""
    plain = session.execute(sql).rows()
    before = session.profile_events.get("StreamedQueries", 0)
    streamed = session.execute(sql, settings=STREAM).rows()
    after = session.profile_events.get("StreamedQueries", 0)
    assert after == before + 1, f"did not stream: {sql}"
    return plain, streamed


class TestStreamingAggregation:
    def test_global_aggregates(self, session):
        p, s = both(session,
                    "SELECT count(), sum(v), min(v), max(v), avg(v), "
                    "sum(k * 2 + 1) FROM big")
        assert len(s) == 1
        for a, b in zip(p[0], s[0]):
            assert a == pytest.approx(b, rel=1e-9)

    def test_global_with_filter(self, session):
        p, s = both(session,
                    "SELECT count(), sum(v) FROM big WHERE k < 40 AND v > 95")
        assert p[0][0] == s[0][0]
        assert p[0][1] == pytest.approx(s[0][1], rel=1e-9)

    def test_group_by_int(self, session):
        p, s = both(session,
                    "SELECT k, count(), sum(v), min(id), max(id) FROM big "
                    "GROUP BY k ORDER BY k")
        assert len(s) == 97
        for rp, rs in zip(p, s):
            assert rp[0] == rs[0] and rp[1] == rs[1]
            assert rp[2] == pytest.approx(rs[2], rel=1e-9)
            assert rp[3:] == rs[3:]

    def test_group_by_wide_key(self, session):
        # ~3000 distinct sparse keys spread over 10 chunks
        p, s = both(session,
                    "SELECT kw, count() AS c FROM big GROUP BY kw "
                    "ORDER BY c DESC, kw LIMIT 20")
        assert p == s

    def test_group_by_string(self, session):
        p, s = both(session,
                    "SELECT cat, count(), avg(v) FROM big "
                    "GROUP BY cat ORDER BY cat")
        assert len(s) == 13
        for rp, rs in zip(p, s):
            assert rp[0] == rs[0] and rp[1] == rs[1]
            assert rp[2] == pytest.approx(rs[2], rel=1e-9)

    def test_group_by_nullable_key(self, session):
        p, s = both(session,
                    "SELECT nv, count() FROM big GROUP BY nv ORDER BY nv")
        assert p == s
        assert any(r[0] is None for r in s)

    def test_conditional_and_arg_aggregates(self, session):
        p, s = both(session,
                    "SELECT countIf(v > 100), sumIf(v, k = 5), "
                    "argMax(id, v), any(k) FROM big")
        assert p[0][0] == s[0][0]
        assert p[0][1] == pytest.approx(s[0][1], rel=1e-9)
        assert p[0][2] == s[0][2]

    def test_having_order_limit(self, session):
        p, s = both(session,
                    "SELECT k, count() AS c, sum(v) AS sv FROM big GROUP BY k "
                    "HAVING c > 100 ORDER BY sv DESC LIMIT 5")
        for rp, rs in zip(p, s):
            assert rp[0] == rs[0] and rp[1] == rs[1]
            assert rp[2] == pytest.approx(rs[2], rel=1e-9)

    def test_expression_keys(self, session):
        p, s = both(session,
                    "SELECT k % 10 AS b, intDiv(k, 10) AS h, count() "
                    "FROM big GROUP BY b, h ORDER BY b, h")
        assert p == s

    def test_var_stddev(self, session):
        p, s = both(session,
                    "SELECT k, varSamp(v), stddevPop(v) FROM big "
                    "WHERE k < 5 GROUP BY k ORDER BY k")
        for rp, rs in zip(p, s):
            assert rp[0] == rs[0]
            assert rp[1] == pytest.approx(rs[1], rel=1e-6)
            assert rp[2] == pytest.approx(rs[2], rel=1e-6)

    def test_empty_result(self, session):
        p, s = both(session,
                    "SELECT k, count() FROM big WHERE v > 1e9 GROUP BY k")
        assert p == s == []

    def test_subquery_over_streamed_agg(self, session):
        p, s = both(session,
                    "SELECT count() FROM "
                    "(SELECT k FROM big GROUP BY k HAVING count() > 0)")
        assert p == s == [(97,)]


class TestStreamingJoin:
    def test_probe_side_join(self, session):
        p, s = both(session,
                    "SELECT name, count(), sum(v) FROM big "
                    "INNER JOIN dim ON big.k = dim.k "
                    "GROUP BY name ORDER BY name")
        assert len(s) == 97
        for rp, rs in zip(p, s):
            assert rp[0] == rs[0] and rp[1] == rs[1]
            assert rp[2] == pytest.approx(rs[2], rel=1e-9)

    def test_left_join_grouped(self, session):
        p, s = both(session,
                    "SELECT count() FROM big "
                    "LEFT JOIN dim ON big.k = dim.k WHERE dim.k >= 0")
        assert p == s


class TestStreamingMechanics:
    def test_autotune_rescues_chunk_overflow(self, session):
        # 3000 distinct kw values, chunk capacity 1024 -> the per-chunk
        # grouping cap (max_groups=512) overflows; the capacity autotuner
        # must re-plan instead of failing
        r = session.execute(
            "SELECT count() FROM (SELECT kw FROM big GROUP BY kw)",
            settings={**STREAM, "max_groups": 512})
        plain = session.execute(
            "SELECT count() FROM (SELECT kw FROM big GROUP BY kw)")
        assert r.rows() == plain.rows()

    def test_capacity_error_when_autotune_off(self, session):
        from clickhouse_tpu.core.errors import CapacityError
        with pytest.raises(CapacityError):
            session.execute(
                "SELECT kw, count() FROM big GROUP BY kw",
                settings={**STREAM, "max_groups": 512,
                          "capacity_autotune": 0})

    def test_stream_cache_reuse(self, session):
        sql = "SELECT k, sum(v) FROM big GROUP BY k ORDER BY k LIMIT 3"
        r1 = session.execute(sql, settings=STREAM).rows()
        cache_size = len(session._stream_cache)
        r2 = session.execute(sql, settings=STREAM).rows()
        assert r1 == r2
        assert len(session._stream_cache) == cache_size

    def test_insert_invalidates_stream_cache(self, session):
        s = ch.connect()
        s.execute("CREATE TABLE inc (k Int64, v Int64)")
        s.insert_pydict("inc", {"k": np.zeros(2048, np.int64),
                                "v": np.ones(2048, np.int64)})
        sql = "SELECT sum(v) FROM inc"
        assert s.execute(sql, settings=STREAM).rows() == [(2048,)]
        s.insert_pydict("inc", {"k": np.zeros(10, np.int64),
                                "v": np.full(10, 5, np.int64)})
        assert s.execute(sql, settings=STREAM).rows() == [(2098,)]

    def test_uneven_final_chunk(self, session):
        s = ch.connect()
        s.execute("CREATE TABLE odd (x Int64)")
        s.insert_pydict("odd", {"x": np.arange(2500, dtype=np.int64)})
        r = s.execute("SELECT count(), sum(x), max(x) FROM odd",
                      settings=STREAM)
        assert r.rows() == [(2500, 2500 * 2499 // 2, 2499)]

    def test_external_group_by_setting_triggers(self, session):
        # the reference's spill threshold setting engages streaming here
        before = session.profile_events.get("StreamedQueries", 0)
        r = session.execute(
            "SELECT count() FROM big",
            settings={"max_bytes_before_external_group_by": 1,
                      "stream_chunk_rows": 2048})
        assert r.rows() == [(N,)]
        assert session.profile_events.get("StreamedQueries", 0) == before + 1

    def test_holistic_aggregate_streams_via_collect(self, session):
        # holistic aggregate (quantileExact) needs raw rows: the agg breaker
        # refuses, but the collect breaker streams the scan to host and
        # aggregates the collected block
        p, s = both(session, "SELECT quantileExact(0.5)(v) FROM big")
        assert p == s
        assert 95 < s[0][0] < 105

    def test_final_read_falls_back(self):
        # FINAL folds need the whole table: genuinely not streamable
        s = ch.connect()
        s.execute("CREATE TABLE r (k Int64, v Int64) "
                  "ENGINE = ReplacingMergeTree ORDER BY k")
        s.insert_pydict("r", {"k": np.arange(2000, dtype=np.int64),
                              "v": np.ones(2000, np.int64)})
        before = s.profile_events.get("StreamedQueries", 0)
        r = s.execute("SELECT count() FROM r FINAL", settings=STREAM)
        assert s.profile_events.get("StreamedQueries", 0) == before
        assert r.rows() == [(2000,)]


class TestStreamingTopK:
    """ORDER BY ... LIMIT breaker: per-chunk device top-k carried across
    chunks (exec/streaming.py TopKProgram)."""

    def test_topk_asc(self, session):
        p, s = both(session, "SELECT id, v FROM big ORDER BY v LIMIT 7")
        assert p == s

    def test_topk_desc_with_offset(self, session):
        p, s = both(session,
                    "SELECT id, v FROM big ORDER BY v DESC LIMIT 5 OFFSET 3")
        assert p == s

    def test_topk_multi_key(self, session):
        p, s = both(session,
                    "SELECT k, id FROM big ORDER BY k DESC, id LIMIT 9")
        assert p == s

    def test_topk_string_key(self, session):
        p, s = both(session,
                    "SELECT cat, id FROM big ORDER BY cat, id LIMIT 6")
        assert p == s

    def test_topk_nullable_key(self, session):
        p, s = both(session,
                    "SELECT nv, id FROM big ORDER BY nv, id LIMIT 8")
        assert p == s

    def test_topk_expression_key(self, session):
        p, s = both(session,
                    "SELECT id FROM big ORDER BY v * -1 LIMIT 4")
        assert p == s

    def test_topk_after_filter(self, session):
        p, s = both(session,
                    "SELECT id, v FROM big WHERE k < 10 "
                    "ORDER BY v LIMIT 5")
        assert p == s

    def test_topk_over_probe_join(self, session):
        p, s = both(session,
                    "SELECT id, name FROM big INNER JOIN dim "
                    "ON big.k = dim.k ORDER BY v, id LIMIT 5")
        assert p == s


class TestStreamingCollect:
    """Collect breaker: surviving rows stream to host, the rest of the plan
    runs on the collected block (exec/streaming.py CollectProgram)."""

    def test_filtered_select(self, session):
        p, s = both(session, "SELECT id, v FROM big WHERE k = 13")
        assert p == s

    def test_limit_early_stop(self, session):
        p, s = both(session, "SELECT id FROM big WHERE k >= 0 LIMIT 10")
        assert len(s) == 10 and p == s

    def test_full_table_scan(self, session):
        p, s = both(session, "SELECT id, k, v, cat FROM big")
        assert p == s

    def test_full_order_by_device(self, session):
        # collected rows fit the budget -> the SortNode runs on device
        p, s = both(session,
                    "SELECT id FROM big WHERE k < 3 ORDER BY v DESC")
        assert p == s

    def test_full_order_by_host_external_sort(self, session):
        # budget too small for the collected block -> host lexsort finalizer
        plain = session.execute(
            "SELECT id, v FROM big ORDER BY v, id").rows()
        streamed = session.execute(
            "SELECT id, v FROM big ORDER BY v, id",
            settings={**STREAM, "max_device_memory_bytes": 1}).rows()
        assert plain == streamed

    def test_host_sort_desc_nullable(self, session):
        plain = session.execute(
            "SELECT nv, id FROM big ORDER BY nv DESC, id LIMIT 20").rows()
        streamed = session.execute(
            "SELECT nv, id FROM big ORDER BY nv DESC, id LIMIT 20",
            settings={**STREAM, "max_device_memory_bytes": 1,
                      "stream_topk_max": 1}).rows()
        assert plain == streamed

    def test_distinct_upper(self, session):
        p, s = both(session, "SELECT DISTINCT cat FROM big ORDER BY cat")
        assert p == s

    def test_window_upper(self, session):
        p, s = both(session,
                    "SELECT id, row_number() OVER (ORDER BY v) AS rn "
                    "FROM big WHERE k = 5 ORDER BY rn LIMIT 6")
        assert p == s


class TestGraceJoin:
    """Both join sides exceed the device budget: hash-partition both into
    host buckets and stream bucket by bucket (GraceHashJoin analog)."""

    GRACE = {**STREAM, "grace_join_buckets": 4}

    @pytest.fixture(scope="class")
    def gsession(self):
        s = ch.connect()
        rng = np.random.default_rng(3)
        nf, nd = 20_000, 4_000
        s.execute("CREATE TABLE fact (fk Int64, w Int64)")
        s.insert_pydict("fact", {
            "fk": rng.integers(0, nd + 500, nf),   # some unmatched keys
            "w": rng.integers(0, 100, nf)})
        s.execute("CREATE TABLE bigdim (k Int64, label Int64, tag String)")
        s.insert_pydict("bigdim", {
            "k": np.arange(nd, dtype=np.int64),
            "label": (np.arange(nd, dtype=np.int64) * 7) % 97,
            "tag": np.asarray([f"t{i % 11}" for i in range(nd)], object)})
        s.execute("CREATE TABLE sfact (sk String, w Int64)")
        s.insert_pydict("sfact", {
            "sk": np.asarray([f"key{i % 700}" for i in range(10_000)],
                             object),
            "w": np.arange(10_000, dtype=np.int64) % 50})
        s.execute("CREATE TABLE sdim (sk String, lab Int64)")
        s.insert_pydict("sdim", {
            "sk": np.asarray([f"key{i}" for i in range(600)], object),
            "lab": np.arange(600, dtype=np.int64)})
        return s

    def gboth(self, s, sql):
        plain = s.execute(sql).rows()
        before = s.profile_events.get("GraceJoinBuckets", 0)
        streamed = s.execute(sql, settings=self.GRACE).rows()
        assert s.profile_events.get("GraceJoinBuckets", 0) > before, \
            f"grace did not engage: {sql}"
        return plain, streamed

    def test_inner_agg(self, gsession):
        p, s = self.gboth(gsession,
                          "SELECT count(), sum(label), sum(w) FROM fact "
                          "INNER JOIN bigdim ON fact.fk = bigdim.k")
        assert p == s

    def test_left_join_group(self, gsession):
        p, s = self.gboth(gsession,
                          "SELECT count(), countIf(label >= 0) FROM fact "
                          "LEFT JOIN bigdim ON fact.fk = bigdim.k")
        assert p == s

    def test_grouped_by_build_column(self, gsession):
        p, s = self.gboth(gsession,
                          "SELECT tag, count() AS c FROM fact "
                          "INNER JOIN bigdim ON fact.fk = bigdim.k "
                          "GROUP BY tag ORDER BY tag")
        assert p == s

    def test_topk_over_grace(self, gsession):
        p, s = self.gboth(gsession,
                          "SELECT fk, label FROM fact INNER JOIN bigdim "
                          "ON fact.fk = bigdim.k "
                          "ORDER BY label DESC, fk LIMIT 7")
        assert p == s

    def test_string_keys(self, gsession):
        p, s = self.gboth(gsession,
                          "SELECT count(), sum(lab) FROM sfact "
                          "INNER JOIN sdim ON sfact.sk = sdim.sk")
        assert p == s

    def test_semi_join(self, gsession):
        p, s = self.gboth(gsession,
                          "SELECT count() FROM fact LEFT SEMI JOIN bigdim "
                          "ON fact.fk = bigdim.k")
        assert p == s


class TestMemoryGovernor:
    """Over-budget plans raise a catchable MEMORY_LIMIT_EXCEEDED before
    dispatch (MemoryTracker-hard-limit analog)."""

    def test_unstreamable_over_budget_raises(self):
        from clickhouse_tpu.core.errors import MemoryLimitExceeded
        s = ch.connect()
        s.execute("CREATE TABLE r (k Int64, v Int64) "
                  "ENGINE = ReplacingMergeTree ORDER BY k")
        s.insert_pydict("r", {"k": np.arange(3000, dtype=np.int64),
                              "v": np.ones(3000, np.int64)})
        with pytest.raises(MemoryLimitExceeded):
            s.execute("SELECT count() FROM r FINAL",
                      settings={"max_device_block_bytes": 1,
                                "max_device_memory_bytes": 1})
        # the session survives and serves further queries
        assert s.execute("SELECT count() FROM r").rows() == [(3000,)]

    def test_eager_path_governed(self):
        from clickhouse_tpu.core.errors import MemoryLimitExceeded
        s = ch.connect()
        s.execute("CREATE TABLE t (x Int64)")
        s.insert_pydict("t", {"x": np.arange(4096, dtype=np.int64)})
        with pytest.raises(MemoryLimitExceeded):
            s.execute("SELECT count() FROM t FINAL",
                      settings={"compile_queries": 0,
                                "max_device_memory_bytes": 1})

    def test_streaming_rescues_over_budget(self):
        s = ch.connect()
        s.execute("CREATE TABLE t (x Int64)")
        s.insert_pydict("t", {"x": np.arange(5000, dtype=np.int64)})
        r = s.execute("SELECT sum(x) FROM t",
                      settings={"max_device_block_bytes": 1,
                                "stream_chunk_rows": 1024,
                                "max_device_memory_bytes": 1})
        assert r.rows() == [(5000 * 4999 // 2,)]


class TestPartPruning:
    """Part-level minmax IO pruning on the streamed read path
    (KeyCondition::checkInRange analog)."""

    def _mk(self):
        s = ch.connect()
        s.execute("CREATE TABLE big (k Int64, v Int64)")
        for p in range(4):
            base = p * 1000
            s.insert_pydict("big", {
                "k": np.arange(base, base + 1000, dtype=np.int64),
                "v": np.ones(1000, np.int64) * p})
        return s

    STREAM = {"max_device_block_bytes": 1024, "stream_chunk_rows": 1024}

    def test_range_filter_skips_parts(self):
        s = self._mk()
        r = s.execute("SELECT count(), sum(v) FROM big "
                      "WHERE k >= 2000 AND k < 3000", settings=self.STREAM)
        assert r.rows() == [(1000, 2000)]
        assert s.profile_events.get("PrunedParts") == 3

    def test_point_filter_skips_parts(self):
        s = self._mk()
        r = s.execute("SELECT count() FROM big WHERE k = 3500",
                      settings=self.STREAM)
        assert r.rows() == [(1,)]
        assert s.profile_events.get("PrunedParts") == 3

    def test_no_filter_reads_all(self):
        s = self._mk()
        r = s.execute("SELECT count() FROM big", settings=self.STREAM)
        assert r.rows() == [(4000,)]
        assert s.profile_events.get("PrunedParts") is None

    def test_unprovable_filter_reads_all(self):
        s = self._mk()
        r = s.execute("SELECT count() FROM big WHERE v % 2 = 0",
                      settings=self.STREAM)
        assert r.rows() == [(2000,)]

    def test_all_parts_pruned(self):
        s = self._mk()
        r = s.execute("SELECT count() FROM big WHERE k > 100000",
                      settings=self.STREAM)
        assert r.rows() == [(0,)]
        assert s.profile_events.get("PrunedParts") == 4


class TestBlowupStreaming:
    """Expanding-join (cross-join) intermediates over the budget stream the
    probe side in bounded chunks (max_joined_block_size_rows analog,
    reference: 01109_inflating_cross_join)."""

    def test_cross_join_streams_under_budget(self):
        s = ch.connect()
        r = s.execute(
            "SELECT count(*) FROM numbers(10000) n1 CROSS JOIN "
            "numbers(1000) n2",
            settings={"max_memory_usage": 16000000,
                      "max_joined_block_size_rows": 1000})
        assert r.rows() == [(10000000,)]
        assert s.profile_events.get("BlowupStreamedQueries", 0) >= 1

    def test_cross_join_sum_parity(self):
        s = ch.connect()
        streamed = s.execute(
            "SELECT sum(n1.number + n2.number) FROM numbers(20000) n1 "
            "CROSS JOIN numbers(500) n2",
            settings={"max_memory_usage": 20000000}).rows()
        whole = s.execute(
            "SELECT sum(n1.number + n2.number) FROM numbers(20000) n1 "
            "CROSS JOIN numbers(500) n2").rows()
        assert streamed == whole

    def test_huge_joined_block_refused(self):
        from clickhouse_tpu.core.errors import MemoryLimitExceeded
        s = ch.connect()
        with pytest.raises(MemoryLimitExceeded):
            s.execute(
                "SELECT count(*) FROM numbers(10000) n1 CROSS JOIN "
                "numbers(1000) n2",
                settings={"max_memory_usage": 16000000,
                          "max_joined_block_size_rows": 10000000})

    def test_stored_probe_side(self):
        s = ch.connect()
        s.execute("CREATE TABLE bp (x Int64) ENGINE = MergeTree ORDER BY x")
        s.insert_pydict("bp", {"x": np.arange(30000, dtype=np.int64)})
        r = s.execute(
            "SELECT count(*), sum(bp.x) FROM bp CROSS JOIN numbers(400)",
            settings={"max_memory_usage": 30000000})
        assert r.rows() == [(30000 * 400, 400 * 30000 * 29999 // 2)]


class TestTopKDescExtremes:
    """ORDER BY DESC LIMIT over values whose order tokens hit the u64
    extremes: validity must be a separate sort key, never folded into the
    token (regression: 01018_optimize_read_in_order_with_in_subquery)."""

    def test_desc_limit_small_uints(self):
        s = ch.connect()
        s.execute("CREATE TABLE dx (x UInt64) ENGINE = MergeTree ORDER BY x")
        s.execute("INSERT INTO dx VALUES (0),(1),(2)")
        assert s.execute("SELECT x FROM dx ORDER BY x DESC LIMIT 10"
                         ).rows() == [(2,), (1,), (0,)]
        assert s.execute("SELECT x FROM dx ORDER BY x LIMIT 2"
                         ).rows() == [(0,), (1,)]

    def test_desc_limit_signed_min(self):
        s = ch.connect()
        s.execute("CREATE TABLE dsm (x Int64) ENGINE = MergeTree ORDER BY x")
        s.execute("INSERT INTO dsm VALUES (-9223372036854775808),"
                  "(-9223372036854775807),(5)")
        assert s.execute("SELECT x FROM dsm ORDER BY x LIMIT 2").rows() == \
            [(-9223372036854775808,), (-9223372036854775807,)]
        assert s.execute("SELECT x FROM dsm ORDER BY x DESC LIMIT 3"
                         ).rows() == [(5,), (-9223372036854775807,),
                                      (-9223372036854775808,)]

    def test_nulls_last_with_filter_padding(self):
        s = ch.connect()
        s.execute("CREATE TABLE dnl (x Nullable(UInt64), f UInt8) "
                  "ENGINE = MergeTree ORDER BY f")
        s.execute("INSERT INTO dnl VALUES (0, 1), (NULL, 1), (1, 0), (2, 1)")
        assert s.execute("SELECT x FROM dnl WHERE f = 1 "
                         "ORDER BY x DESC LIMIT 10").rows() == \
            [(2,), (0,), (None,)]


class TestHostPrewhere:
    """Host-side PREWHERE for streamed scans (streaming.host_prewhere_sel —
    the MergeTreeRangeReader two-pass read recast for the host->device
    wire): predicate columns are evaluated on the host and only surviving
    rows are transferred; the device filter re-runs over survivors."""

    def test_selective_filter_streams_survivors_only(self, session):
        before = session.profile_events.get("PrewhereRowsDropped", 0)
        plain, streamed = both(
            session,
            "SELECT count(), sum(v) FROM big WHERE k = 13")
        assert plain == streamed
        dropped = session.profile_events.get("PrewhereRowsDropped", 0) \
            - before
        assert dropped > 0.9 * N          # ~1/97 of rows survive

    def test_prewhere_disabled_setting(self, session):
        st = dict(STREAM, optimize_move_to_prewhere=0)
        before = session.profile_events.get("PrewhereStreamedScans", 0)
        rows = session.execute(
            "SELECT count() FROM big WHERE k = 13", settings=st).rows()
        assert session.profile_events.get("PrewhereStreamedScans",
                                          0) == before
        assert rows == session.execute(
            "SELECT count() FROM big WHERE k = 13").rows()

    def test_unselective_predicate_keeps_aligned_path(self, session):
        before = session.profile_events.get("PrewhereStreamedScans", 0)
        plain, streamed = both(
            session, "SELECT count() FROM big WHERE k >= 0")  # keeps all
        assert plain == streamed
        assert session.profile_events.get("PrewhereStreamedScans",
                                          0) == before

    def test_mixed_conjuncts_partial_host_eval(self, session):
        """String conjunct stays on device; numeric conjunct pre-filters."""
        plain, streamed = both(
            session,
            "SELECT count(), avg(v) FROM big "
            "WHERE k = 13 AND cat != 'c1'")
        assert plain == streamed

    def test_prewhere_with_order_by_limit(self, session):
        plain, streamed = both(
            session,
            "SELECT id, v FROM big WHERE k = 13 AND id > 100 "
            "ORDER BY id LIMIT 7")
        assert plain == streamed
