"""Re-verify triaged PASS candidates under current code; print PASS/FAIL."""
import os
import signal
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tests')
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from test_reference_compat import run_case, CASES


class T(Exception):
    pass


def _alarm(s, f):
    raise T()


signal.signal(signal.SIGALRM, _alarm)

names = [ln.strip() for ln in open(sys.argv[1]) if ln.strip()]
done = set(CASES)
for name in names:
    if name in done:
        continue
    try:
        signal.alarm(60)
        run_case(name)
        print("PASS", name, flush=True)
    except T:
        print("TIME", name, flush=True)
    except BaseException as e:  # noqa: BLE001
        print("FAIL", name, type(e).__name__, flush=True)
    finally:
        signal.alarm(0)
