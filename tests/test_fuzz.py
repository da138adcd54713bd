"""Bounded, seeded fuzz tier (scripts/fuzz_sql.py) — the QueryFuzzer/
BuzzHouse analog run as part of CI."""
import pytest


def test_fuzz_clean():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from fuzz_sql import run_fuzz
    failures = run_fuzz(n_queries=40, seed=7, verbose=False)
    assert failures == []
