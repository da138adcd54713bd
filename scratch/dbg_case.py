import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from test_reference_compat import run_case
import traceback
for nm in sys.argv[1:]:
    try:
        run_case(nm)
        print("PASS", nm)
    except AssertionError as e:
        print("DIFF", nm, str(e)[:500].replace("\n", " | "))
    except Exception as e:
        print("ERR ", nm, type(e).__name__, str(e)[:200])
