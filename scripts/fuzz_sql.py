"""Grammar-driven SQL fuzzer with oracles.

The QueryFuzzer/BuzzHouse analog (reference: src/Common/QueryFuzzer.cpp,
src/Client/BuzzHouse/): generates random queries over the engine's own
feature surface and checks invariants —

  no-crash        any failure must be a typed EngineError, never a python
                  crash or an XLA abort
  replan parity   compiled (whole-query jit) == eager execution
  stream parity   forced out-of-core streaming == whole-block execution
  dist parity     (opt-in) 8-device mesh == local execution

Usage: python scripts/fuzz_sql.py [N] [SEED]
"""
from __future__ import annotations

import random
import sys
from typing import List, Optional

import numpy as np


NUM_COLS = ["a", "b", "n"]
FLOAT_COLS = ["f"]
STR_COLS = ["s"]
ALL_COLS = NUM_COLS + FLOAT_COLS + STR_COLS

UNARY_NUM = ["abs", "negate", "sign", "bitNot", "intHash64", "bitCount"]
BINARY_NUM = ["plus", "minus", "multiply", "intDivOrZero", "moduloOrZero",
              "gcd", "bitAnd", "bitOr", "bitXor", "greatest", "least"]
UNARY_STR = ["length", "lower", "upper", "reverse", "trim", "soundex"]
CMP = ["=", "!=", "<", "<=", ">", ">="]
AGGS = ["count()", "sum({})", "min({})", "max({})", "avg({})",
        "uniqExact({})", "any({})", "median({})", "sumDistinct({})",
        "quantileExact(0.25)({})", "varPop({})", "deltaSum({})"]


class Gen:
    def __init__(self, rng: random.Random):
        self.r = rng

    def num_expr(self, depth=0) -> str:
        r = self.r
        if depth > 2 or r.random() < 0.35:
            return r.choice(NUM_COLS + [str(r.randint(-5, 100))])
        kind = r.random()
        if kind < 0.4:
            return (f"{r.choice(BINARY_NUM)}({self.num_expr(depth + 1)}, "
                    f"{self.num_expr(depth + 1)})")
        if kind < 0.7:
            return f"{r.choice(UNARY_NUM)}({self.num_expr(depth + 1)})"
        if kind < 0.85:
            return (f"if({self.pred(depth + 1)}, "
                    f"{self.num_expr(depth + 1)}, "
                    f"{self.num_expr(depth + 1)})")
        return f"{r.choice(UNARY_STR[:1])}({self.str_expr(depth + 1)})"

    def str_expr(self, depth=0) -> str:
        r = self.r
        if depth > 2 or r.random() < 0.5:
            return r.choice(STR_COLS + ["'lit%d'" % r.randint(0, 5)])
        return f"{r.choice(UNARY_STR[1:])}({self.str_expr(depth + 1)})"

    def pred(self, depth=0) -> str:
        r = self.r
        if depth > 2 or r.random() < 0.5:
            lhs = self.num_expr(depth + 1)
            return f"({lhs} {r.choice(CMP)} {self.num_expr(depth + 1)})"
        k = r.random()
        if k < 0.3:
            return (f"({self.pred(depth + 1)} AND {self.pred(depth + 1)})")
        if k < 0.6:
            return f"({self.pred(depth + 1)} OR {self.pred(depth + 1)})"
        if k < 0.8:
            return f"(NOT {self.pred(depth + 1)})"
        return (f"({self.str_expr(depth + 1)} "
                f"{r.choice(['=', '!=', 'LIKE'])} "
                f"{self.str_expr(0) if r.random() < 0.5 else self._pat()})")

    def _pat(self) -> str:
        core = "lit%d" % self.r.randint(0, 5)
        return self.r.choice([f"'{core}%'", f"'%{core}'", f"'%{core}%'"])

    def agg(self) -> str:
        a = self.r.choice(AGGS)
        return a.format(self.r.choice(NUM_COLS + FLOAT_COLS))

    def query(self) -> str:
        r = self.r
        shape = r.random()
        if shape < 0.25:                       # plain select
            k = r.randint(1, 3)
            items = ", ".join(
                f"{self.num_expr()} AS c{i}" for i in range(k))
            q = f"SELECT {items} FROM t"
            if r.random() < 0.7:
                q += f" WHERE {self.pred()}"
            # ORDER BY every column: a LIMIT over ties would otherwise be
            # legitimately nondeterministic and break the parity oracles
            q += " ORDER BY " + ", ".join(f"c{i}" for i in range(k))
            q += f" LIMIT {r.randint(1, 50)}"
            return q
        if shape < 0.6:                        # group by
            key = r.choice(["a % 7", "b % 13", "s", "a % 3, b % 5"])
            aggs = ", ".join(f"{self.agg()} AS g{i}"
                             for i in range(r.randint(1, 3)))
            q = f"SELECT {key} AS k, {aggs} FROM t"
            if r.random() < 0.6:
                q += f" WHERE {self.pred()}"
            q = q.replace(f"SELECT {key} AS k",
                          f"SELECT ({key.split(',')[0]}) AS k")
            q += " GROUP BY k"
            if r.random() < 0.4:
                q += " HAVING g0 >= 0"
            q += " ORDER BY k LIMIT 100"
            return q
        if shape < 0.8:                        # join
            q = (f"SELECT count() AS c, sum(a) AS sa FROM t "
                 f"{r.choice(['INNER', 'LEFT'])} JOIN d ON t.a % 50 = d.k")
            if r.random() < 0.5:
                q += f" WHERE {self.pred()}"
            return q
        # subquery / distinct
        inner = (f"SELECT a % {r.randint(2, 9)} AS x, count() AS c FROM t "
                 f"GROUP BY x")
        return (f"SELECT count() FROM ({inner}) WHERE c > {r.randint(0, 3)}")


def build_session(factory):
    s = factory()
    rng = np.random.default_rng(11)
    n = 3000
    s.execute("CREATE TABLE t (a Int64, b Int64, n Nullable(Int64), "
              "f Float64, s String)")
    s.insert_pydict("t", {
        "a": rng.integers(-100, 100, n),
        "b": rng.integers(0, 1000, n),
        "n": np.asarray([None if i % 7 == 0 else int(i % 11)
                         for i in range(n)], object),
        "f": rng.normal(size=n).round(3),
        "s": np.asarray([f"lit{i % 6}" for i in range(n)], object)})
    s.execute("CREATE TABLE d (k Int64, lbl String)")
    s.insert_pydict("d", {
        "k": np.arange(50, dtype=np.int64),
        "lbl": np.asarray([f"L{i % 4}" for i in range(50)], object)})
    return s


def norm(rows) -> list:
    out = []
    for row in rows:
        cells = []
        for c in row:
            if isinstance(c, float):
                if c != c:
                    cells.append("nan")
                else:
                    cells.append(round(c, 6))
            else:
                cells.append(c)
        out.append(tuple(cells))
    return sorted(out, key=repr)


def run_fuzz(n_queries: int = 200, seed: int = 0, factory=None,
             verbose: bool = True) -> List[str]:
    """-> list of failure descriptions (empty = clean run)."""
    import clickhouse_tpu as ch
    from clickhouse_tpu.core.errors import EngineError
    factory = factory or ch.connect
    gen = Gen(random.Random(seed))
    s = build_session(factory)
    failures: List[str] = []
    STREAM = {"max_device_block_bytes": 1, "stream_chunk_rows": 1024}
    ran = errs = 0
    for i in range(n_queries):
        q = gen.query()
        try:
            base = s.execute(q).rows()
        except EngineError:
            errs += 1
            continue                      # typed rejection is legal
        except Exception as e:            # noqa: BLE001 — the oracle
            failures.append(f"CRASH [{type(e).__name__}] {q!r}: {e}")
            continue
        ran += 1
        # oracle: eager == compiled
        try:
            eager = s.execute(q, settings={"compile_queries": 0}).rows()
            if norm(eager) != norm(base):
                failures.append(f"REPLAN-MISMATCH {q!r}")
        except EngineError:
            pass
        except Exception as e:            # noqa: BLE001
            failures.append(f"EAGER-CRASH [{type(e).__name__}] {q!r}: {e}")
        # oracle: streamed == whole-block
        try:
            streamed = s.execute(q, settings=STREAM).rows()
            if norm(streamed) != norm(base):
                failures.append(f"STREAM-MISMATCH {q!r}")
        except EngineError:
            pass
        except Exception as e:            # noqa: BLE001
            failures.append(f"STREAM-CRASH [{type(e).__name__}] {q!r}: {e}")
    if verbose:
        print(f"fuzz: {n_queries} generated, {ran} executed, "
              f"{errs} typed-rejected, {len(failures)} failures")
        for f in failures[:20]:
            print(" ", f)
    return failures


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    fails = run_fuzz(n, seed)
    sys.exit(1 if fails else 0)
