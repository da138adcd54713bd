"""Propagate-join path: correctness vs pandas and vs the expand path.

The propagate join (ops/join_ops.py propagate_join) serves N:1 joins against
unique build keys, ANY strictness, SEMI/ANTI, and ASOF — the reference's
HashJoin strictness matrix (src/Interpreters/HashJoin/HashJoin.h:110).
"""
import numpy as np
import pandas as pd
import pytest

import clickhouse_tpu as ch


@pytest.fixture()
def s():
    return ch.connect()


def make_tables(s, n_fact=5000, n_dim=97, dup_dim=False, null_keys=False):
    rng = np.random.default_rng(7)
    fk = rng.integers(0, n_dim * 2, n_fact)          # half miss
    s.execute("CREATE TABLE fact (fk Int64, w Float64)")
    s.insert_pydict("fact", {"fk": fk,
                             "w": rng.standard_normal(n_fact)})
    k = np.arange(n_dim)
    if dup_dim:
        k = np.concatenate([k, k[: n_dim // 3]])
    lab = (k * 1000003) % 881
    big = k.astype(np.uint64) * np.uint64(2**40)      # forces 2-word carry
    f = k * 0.5 - 3.0
    name = np.asarray([f"v{x}" for x in k], object)
    s.execute("CREATE TABLE dim (k Int64, lab Int64, big UInt64, "
              "f Float64, name String)")
    s.insert_pydict("dim", {"k": k, "lab": lab, "big": big, "f": f,
                            "name": name})
    return fk, np.arange(n_dim), lab, big, f, name


def pdf(res):
    return res.to_pandas()


def test_inner_n1_unique_dim(s):
    fk, k, lab, big, f, name = make_tables(s)
    r = s.execute("SELECT fk, lab, big, f, name FROM fact "
                  "INNER JOIN dim ON fact.fk = dim.k ORDER BY fk, lab")
    d = pdf(r)
    ref = pd.merge(pd.DataFrame({"fk": fk}),
                   pd.DataFrame({"k": k, "lab": lab, "big": big, "f": f,
                                 "name": name}),
                   left_on="fk", right_on="k")
    ref = ref.sort_values(["fk", "lab"]).reset_index(drop=True)
    assert len(d) == len(ref)
    assert (d["fk"].to_numpy() == ref["fk"].to_numpy()).all()
    assert (d["lab"].to_numpy() == ref["lab"].to_numpy()).all()
    assert (d["big"].to_numpy().astype(np.uint64)
            == ref["big"].to_numpy().astype(np.uint64)).all()
    assert np.allclose(d["f"].to_numpy().astype(float),
                       ref["f"].to_numpy().astype(float))
    assert list(d["name"]) == list(ref["name"])


def test_left_n1_defaults(s):
    fk, k, lab, *_ = make_tables(s)
    r = s.execute("SELECT fk, lab, name FROM fact "
                  "LEFT JOIN dim ON fact.fk = dim.k ORDER BY fk")
    d = pdf(r)
    assert len(d) == len(fk)
    miss = d["fk"].to_numpy() >= len(k)
    assert (d.loc[miss, "lab"].to_numpy() == 0).all()
    assert all(v == "" for v in d.loc[miss, "name"])
    hit = ~miss
    assert (d.loc[hit, "lab"].to_numpy()
            == (d.loc[hit, "fk"].to_numpy() * 1000003) % 881).all()


def test_count_sum_matches_expand_path(s):
    """The headline Q4 shape: count()+sum through the propagate join must
    agree with a pandas merge."""
    fk, k, lab, *_ = make_tables(s, n_fact=20000)
    r = s.execute("SELECT count(), sum(lab) FROM fact "
                  "INNER JOIN dim ON fact.fk = dim.k")
    ref = pd.merge(pd.DataFrame({"fk": fk}),
                   pd.DataFrame({"k": k, "lab": lab}),
                   left_on="fk", right_on="k")
    assert int(r.rows()[0][0]) == len(ref)
    assert int(r.rows()[0][1]) == int(ref["lab"].sum())


def test_any_join_dup_dim(s):
    """ANY join with duplicate build keys: one row per probe row, the first
    inserted build row (reference ANY semantics)."""
    fk, k, lab, *_ = make_tables(s, dup_dim=True)
    r = s.execute("SELECT fk, lab FROM fact "
                  "ANY LEFT JOIN dim ON fact.fk = dim.k ORDER BY fk")
    d = pdf(r)
    assert len(d) == len(fk)           # no expansion
    hit = d["fk"].to_numpy() < len(k)
    assert (d.loc[hit, "lab"].to_numpy()
            == (d.loc[hit, "fk"].to_numpy() * 1000003) % 881).all()


def test_semi_anti(s):
    fk, k, *_ = make_tables(s, dup_dim=True)
    r1 = s.execute("SELECT count() FROM fact SEMI LEFT JOIN dim "
                   "ON fact.fk = dim.k")
    r2 = s.execute("SELECT count() FROM fact ANTI LEFT JOIN dim "
                   "ON fact.fk = dim.k")
    n_in = int((fk < len(k)).sum())
    assert int(r1.rows()[0][0]) == n_in
    assert int(r2.rows()[0][0]) == len(fk) - n_in


def test_nonunique_dim_falls_back_to_expand(s):
    """ALL join with duplicate build keys must still expand (1-to-N)."""
    fk, k, lab, *_ = make_tables(s, dup_dim=True)
    r = s.execute("SELECT count() FROM fact INNER JOIN dim "
                  "ON fact.fk = dim.k")
    dimk = np.concatenate([k, k[: len(k) // 3]])
    ref = pd.merge(pd.DataFrame({"fk": fk}), pd.DataFrame({"k": dimk}),
                   left_on="fk", right_on="k")
    assert int(r.rows()[0][0]) == len(ref)


def test_asof_join(s):
    rng = np.random.default_rng(3)
    n = 2000
    uid = rng.integers(0, 20, n)
    t = rng.integers(0, 1000, n)
    s.execute("CREATE TABLE ev (uid Int64, t Int64)")
    s.insert_pydict("ev", {"uid": uid, "t": t})
    m = 300
    quid = rng.integers(0, 20, m)
    qt = rng.integers(0, 1000, m)
    price = rng.integers(1, 100, m)
    s.execute("CREATE TABLE px (uid Int64, t Int64, price Int64)")
    s.insert_pydict("px", {"uid": quid, "t": qt, "price": price})

    def ref_asof(op):
        out = []
        for u, tt in zip(uid, t):
            cands = [(t2, p) for u2, t2, p in zip(quid, qt, price)
                     if u2 == u and ((op == "<=" and t2 <= tt)
                                     or (op == "<" and t2 < tt)
                                     or (op == ">=" and t2 >= tt)
                                     or (op == ">" and t2 > tt))]
            if not cands:
                continue
            if op in ("<=", "<"):
                best = max(cands)[1]
            else:
                best = min(cands)[1]
            out.append((u, tt, best))
        return sorted(out)

    for op in ("<=", "<", ">=", ">"):
        r = s.execute(f"SELECT ev.uid, ev.t, price FROM ev "
                      f"ASOF INNER JOIN px ON ev.uid = px.uid "
                      f"AND px.t {op} ev.t ORDER BY ev.uid, ev.t, price")
        d = pdf(r)
        ref = ref_asof(op)
        got = sorted(zip(d.iloc[:, 0], d.iloc[:, 1], d.iloc[:, 2]))
        ref_rows = [(int(a), int(b), int(c)) for a, b, c in ref]
        got_rows = [(int(a), int(b), int(c)) for a, b, c in got]
        # ties on t with multiple prices: compare the (uid, t) match sets
        assert [x[:2] for x in got_rows] == [x[:2] for x in ref_rows], op


def test_nullable_keys_never_match(s):
    s.execute("CREATE TABLE l (k Nullable(Int64))")
    s.insert_pydict("l", {"k": np.asarray([1, None, 2, None, 3], object)})
    s.execute("CREATE TABLE r (k Int64, v Int64)")
    s.insert_pydict("r", {"k": np.arange(5), "v": np.arange(5) * 10})
    res = s.execute("SELECT l.k, v FROM l LEFT JOIN r ON l.k = r.k "
                    "ORDER BY v")
    d = pdf(res)
    assert len(d) == 5
    vs = sorted(int(x) for x in d["v"])
    assert vs == [0, 0, 10, 20, 30]


class TestDenseGatherJoin:
    """Dense direct-address join path (ops/join_ops.py dense_gather_join):
    must match the sort-merge propagate path exactly."""

    @pytest.fixture()
    def sess(self):
        import numpy as np
        s = ch.connect()
        rng = np.random.default_rng(9)
        n = 30000
        s.execute("CREATE TABLE fact (fk Int64, w Int64)")
        s.insert_pydict("fact", {
            "fk": rng.integers(0, 1500, n).astype(np.int64),
            "w": rng.integers(-10, 10, n).astype(np.int64)})
        s.execute("CREATE TABLE dim (k Int64, lab Int64, nm String)")
        s.insert_pydict("dim", {
            "k": np.arange(0, 1000, dtype=np.int64),
            "lab": (np.arange(0, 1000, dtype=np.int64) * 3) % 17,
            "nm": np.asarray([f"n{i%5}" for i in range(1000)], object)})
        return s

    @pytest.mark.parametrize("sql", [
        "SELECT count(), sum(w), sum(lab) FROM fact "
        "INNER JOIN dim ON fact.fk = dim.k",
        "SELECT count(), sum(lab) FROM fact LEFT JOIN dim ON fact.fk = dim.k",
        "SELECT count() FROM fact LEFT SEMI JOIN dim ON fact.fk = dim.k",
        "SELECT count() FROM fact LEFT ANTI JOIN dim ON fact.fk = dim.k",
        "SELECT nm, count() AS c FROM fact INNER JOIN dim "
        "ON fact.fk = dim.k GROUP BY nm ORDER BY nm",
    ])
    def test_matches_propagate_path(self, sess, sql):
        fast = sess.execute(sql).rows()
        slow = sess.execute(
            sql + " SETTINGS join_dense_gather = 0").rows()
        assert fast == slow

    def test_dense_path_taken(self, sess):
        sess.execute("SELECT count(), sum(lab) FROM fact "
                     "INNER JOIN dim ON fact.fk = dim.k")
        assert sess.profile_events.get("DenseGatherJoins", 0) >= 1


class TestJoinReorder:
    """Join side reordering (plan/optimizer.py _reorder_join_sides — the
    optimizeJoin.cpp analog): an INNER join written with the big fact
    table as the build side swaps sides; results identical either way."""

    def test_written_order_is_swapped_and_equal(self):
        s = ch.connect()
        n_fact, n_dim = 100_000, 500
        s.execute("CREATE TABLE fct (fk Int64, v Int64)")
        s.insert_pydict("fct", {
            "fk": np.arange(n_fact, dtype=np.int64) % 300,
            "v": np.ones(n_fact, np.int64)})
        s.execute("CREATE TABLE dm (k Int64, label Int64)")
        s.insert_pydict("dm", {"k": np.arange(n_dim, dtype=np.int64),
                               "label": np.arange(n_dim, dtype=np.int64) * 7})
        a = s.execute("SELECT count(), sum(label) FROM fct "
                      "INNER JOIN dm ON fct.fk = dm.k").rows()
        b = s.execute("SELECT count(), sum(label) FROM dm "
                      "INNER JOIN fct ON dm.k = fct.fk").rows()
        assert a == b

    def test_reorder_pass_swaps_plan(self):
        from clickhouse_tpu.plan import logical as L
        from clickhouse_tpu.plan.optimizer import _reorder_join_sides
        s = ch.connect()
        s.execute("CREATE TABLE big_r (k Int64)")
        s.insert_pydict("big_r", {"k": np.arange(50_000, dtype=np.int64) % 30_000})
        s.execute("CREATE TABLE small_l (k Int64)")
        s.insert_pydict("small_l", {"k": (np.arange(100) % 77).astype(
            np.int64)})
        plan = s._plan(__import__(
            "clickhouse_tpu.sql.parser", fromlist=["parse"]).parse(
            "SELECT count() FROM small_l INNER JOIN big_r "
            "ON small_l.k = big_r.k"), s.settings)

        def find_join(n):
            if isinstance(n, L.JoinNode):
                return n
            for c in n.children():
                j = find_join(c)
                if j is not None:
                    return j
            return None
        j = find_join(plan)
        assert j is not None
        # after optimize (already applied in _plan), the 50k table must be
        # the PROBE (left) side
        def scans(n, out):
            if isinstance(n, L.ScanNode):
                out.append(n.table)
            for c in n.children():
                scans(c, out)
            return out
        assert "big_r" in scans(j.left, [])
