"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding is validated on
XLA's host-platform virtual devices (the reference validates multi-node
behaviour on single-host pseudo-clusters the same way — SURVEY.md §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS to the TPU tunnel plugin; the config
# update (applied after import) is what actually redirects tests to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Watchdog: when CHTPU_WATCHDOG is set, dump all thread stacks to stderr
# every N seconds — identifies tests that grind without failing.
if os.environ.get("CHTPU_WATCHDOG"):
    import faulthandler
    import sys
    faulthandler.dump_traceback_later(
        int(os.environ["CHTPU_WATCHDOG"]), repeat=True, file=sys.stderr)
