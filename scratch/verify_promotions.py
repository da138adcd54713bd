import sys, os
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from test_reference_compat import run_case
names = [ln.split()[1] for ln in open("/root/repo/scratch/triage_results.txt")
         if ln.startswith("PASS")]
bad = []
for i, nm in enumerate(names):
    try:
        run_case(nm)
    except Exception as e:
        bad.append((nm, type(e).__name__))
        print("FAIL", nm, type(e).__name__, flush=True)
print("done", len(names), "checked,", len(bad), "failed")
