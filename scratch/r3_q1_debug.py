"""Q1 regression bisect: literal bounds on/off, dense join on/off."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def bench(s, sql, reps=8):
    s.execute(sql)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s.execute(sql)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import clickhouse_tpu as ch
    s = ch.connect()
    n = 100_000_000
    s.execute("CREATE TABLE hits (x Int64)")
    x = (np.arange(n, dtype=np.int64) * 2654435761) % 1_000_003
    s.insert_pydict("hits", {"x": x})
    sql = "SELECT count() FROM hits WHERE x > 500000"
    t1 = bench(s, sql)
    t0n = bench(s, "SELECT count() FROM hits WHERE x > 500001")  # cache-buster
    print(f"Q1 with literal bounds: {t1*1e3:.1f} ms / {t0n*1e3:.1f}",
          flush=True)

    # disable literal bounds and re-measure
    from clickhouse_tpu.exprs import expr as E
    orig = E._literal_colval

    def no_bounds(e):
        cv = orig(e)
        return E.ColVal(cv.dtype, cv.data, cv.validity, cv.dictionary,
                        None, cv.lengths, cv.host)
    E._literal_colval = no_bounds
    t2 = bench(s, "SELECT count() FROM hits WHERE x > 500002")
    print(f"Q1 without literal bounds: {t2*1e3:.1f} ms", flush=True)
    E._literal_colval = orig

    # join: dense vs propagate
    s2 = ch.connect()
    s2.execute("CREATE TABLE dim (k Int64, label Int64)")
    nd = 1_000_000
    s2.execute("CREATE TABLE fact (fk Int64)")
    s2.insert_pydict("dim", {"k": np.arange(nd, dtype=np.int64),
                             "label": (np.arange(nd, dtype=np.int64) * 7) % 97})
    s2.insert_pydict("fact", {"fk": (np.arange(n, dtype=np.int64) * 40503) % nd})
    jq = "SELECT count(), sum(label) FROM fact INNER JOIN dim ON fact.fk = dim.k"
    tj = bench(s2, jq, reps=4)
    print(f"Q4 default: {tj*1e3:.1f} ms; DenseGatherJoins="
          f"{s2.profile_events.get('DenseGatherJoins', 0)}", flush=True)
    tj2 = bench(s2, jq + " SETTINGS join_dense_gather = 0", reps=4)
    print(f"Q4 propagate: {tj2*1e3:.1f} ms", flush=True)


main()
