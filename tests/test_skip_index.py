"""Skip indexes: granule-level minmax/set/bloom_filter pruning on streamed
scans (reference: src/Storages/MergeTree/MergeTreeIndices.h,
MergeTreeDataSelectExecutor granule filtering).

Each test compares plain vs streamed execution (identical results) and
asserts the PrunedGranules profile event fired where pruning should apply.
"""
import numpy as np
import pytest

import clickhouse_tpu as ch

# force streaming on tiny tables, with chunks smaller than a granule group
STREAM = {"max_device_block_bytes": 1, "stream_chunk_rows": 2048}

N = 16384
GRAN = 1024


@pytest.fixture(scope="module")
def session():
    s = ch.connect()
    s.execute(
        "CREATE TABLE skp (id Int64, grp Int64, word String, v Float64, "
        " INDEX sx grp TYPE set(100) GRANULARITY 1, "
        " INDEX bx word TYPE bloom_filter GRANULARITY 1) "
        "ENGINE = MergeTree ORDER BY id "
        f"SETTINGS index_granularity = {GRAN}")
    ids = np.arange(N, dtype=np.int64)
    grp = ids // GRAN                       # one distinct value per granule
    word = np.asarray([f"w{int(g)}" for g in grp], object)
    v = np.sin(ids).astype(np.float64)
    s.insert_pydict("skp", {"id": ids, "grp": grp, "word": word, "v": v})
    return s


def run_both(session, sql, expect_pruned=True):
    plain = session.execute(sql).rows()
    before = session.profile_events.get("PrunedGranules", 0)
    streamed = session.execute(sql, settings=STREAM).rows()
    after = session.profile_events.get("PrunedGranules", 0)
    if expect_pruned:
        assert after > before, f"no granules pruned for: {sql}"
    assert plain == streamed or all(
        a == pytest.approx(b, rel=1e-9) for ra, rb in zip(plain, streamed)
        for a, b in zip(ra, rb)), sql
    return streamed


class TestMinmaxGranules:
    def test_pk_range(self, session):
        got = run_both(session,
                       "SELECT count(), sum(id) FROM skp WHERE id < 100")
        assert got == [(100, 4950)]

    def test_pk_point(self, session):
        got = run_both(session,
                       "SELECT count() FROM skp WHERE id = 5000")
        assert got == [(1,)]

    def test_no_pruning_full_range(self, session):
        got = run_both(session, "SELECT count() FROM skp WHERE id >= 0",
                       expect_pruned=False)
        assert got == [(N,)]


class TestSetIndex:
    def test_equality(self, session):
        got = run_both(session,
                       "SELECT count(), min(id), max(id) FROM skp "
                       "WHERE grp = 3")
        assert got == [(GRAN, 3 * GRAN, 4 * GRAN - 1)]

    def test_in_list(self, session):
        got = run_both(session,
                       "SELECT count() FROM skp WHERE grp IN (2, 5)")
        assert got == [(2 * GRAN,)]


class TestBloomIndex:
    def test_string_equality(self, session):
        got = run_both(session,
                       "SELECT count() FROM skp WHERE word = 'w7'")
        assert got == [(GRAN,)]

    def test_string_miss(self, session):
        got = run_both(session,
                       "SELECT count() FROM skp WHERE word = 'absent'")
        assert got == [(0,)]


class TestTextIndexes:
    """tokenbf_v1 / ngrambf_v1 / full_text granule pruning for
    hasToken/LIKE/equality (reference: MergeTreeIndexBloomFilterText,
    MergeTreeIndexGin) — VERDICT r04 item 7."""

    @pytest.fixture(scope="class")
    def tsession(self):
        s = ch.connect()
        s.execute(
            "CREATE TABLE txt (id Int64, msg String, "
            " INDEX tk msg TYPE tokenbf_v1(4096, 3, 0) GRANULARITY 1, "
            " INDEX ng msg TYPE ngrambf_v1(3, 4096, 3, 0) GRANULARITY 1) "
            "ENGINE = MergeTree ORDER BY id "
            f"SETTINGS index_granularity = {GRAN}")
        ids = np.arange(N, dtype=np.int64)
        msg = np.asarray(
            [f"error code={i % 7} in module alpha{i // GRAN}"
             for i in ids], object)
        s.insert_pydict("txt", {"id": ids, "msg": msg})
        return s

    def _pruned(self, s, sql, expect_rows, min_frac=0.9):
        plain = s.execute(sql).rows()
        before = s.profile_events.get("PrunedGranules", 0)
        streamed = s.execute(sql, settings=STREAM).rows()
        pruned = s.profile_events.get("PrunedGranules", 0) - before
        assert plain == streamed == expect_rows, sql
        total = N // GRAN
        assert pruned >= int(total * min_frac), \
            f"only {pruned}/{total} granules pruned for: {sql}"

    def test_has_token_prunes(self, tsession):
        self._pruned(tsession,
                     "SELECT count() FROM txt WHERE hasToken(msg, 'alpha3')",
                     [(GRAN,)], min_frac=0.9)

    def test_like_interior_token(self, tsession):
        self._pruned(tsession,
                     "SELECT count() FROM txt "
                     "WHERE msg LIKE '%module alpha5 %'",
                     [(0,)], min_frac=0.9)

    def test_ngram_like(self, tsession):
        # 'alpha12' only appears in granule 12; its ngrams prune the rest
        self._pruned(tsession,
                     "SELECT count() FROM txt WHERE msg LIKE '%alpha12%'",
                     [(GRAN,)], min_frac=0.8)

    def test_no_false_negatives(self, tsession):
        got = tsession.execute(
            "SELECT count() FROM txt WHERE hasToken(msg, 'error')",
            settings=STREAM).rows()
        assert got == [(N,)]


class TestCorrectnessUnderSpans:
    def test_group_by_on_pruned_scan(self, session):
        got = run_both(session,
                       "SELECT grp, count() FROM skp WHERE grp IN (1, 9) "
                       "GROUP BY grp ORDER BY grp")
        assert got == [(1, GRAN), (9, GRAN)]

    def test_filter_mix(self, session):
        # minmax (id) + set (grp) prune together; residual filter on v
        got = run_both(session,
                       "SELECT count() FROM skp "
                       "WHERE grp = 2 AND id < 2500 AND v > 0")
        plain = session.execute(
            "SELECT count() FROM skp WHERE grp = 2 AND id < 2500 AND v > 0"
        ).rows()
        assert got == plain
