"""The driver's entry points must always compile (regression guard)."""
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    keys, counts, sums = [np.asarray(o) for o in out]
    assert keys.shape == (8,) and counts.shape == (8,)
    assert (counts[:3] > 0).all()


def test_dryrun_multichip():
    import __graft_entry__ as g
    n = min(8, len(jax.devices()))
    g.dryrun_multichip(n)
