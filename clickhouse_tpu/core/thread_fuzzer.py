"""ThreadFuzzer: random scheduling perturbation to widen race windows.

Analog of the reference's ThreadFuzzer (src/Common/ThreadFuzzer.cpp):
with no custom race detector, races are surfaced by injecting random
sleeps/yields at concurrency-sensitive points so that unlikely
interleavings become likely, then running the ordinary test assertions.
The reference hooks pthread functions via signals; Python's GIL makes
that moot, so this instruments the engine's own threaded host paths
directly — the read pool, background merge executor, async-insert flush,
keeper ops, part exchange — via ``fuzz_yield(site)`` calls.

Activation mirrors the reference's env-var contract
(THREAD_FUZZER_* in ThreadFuzzer::initConfiguration):

    THREAD_FUZZER_ENABLED=1          enable with defaults
    THREAD_FUZZER_SLEEP_PROBABILITY  p of sleeping at a site (default .05)
    THREAD_FUZZER_SLEEP_TIME_US      max sleep in microseconds (default 5000)
    THREAD_FUZZER_YIELD_PROBABILITY  p of a bare yield (default .1)

or programmatically / per-test via ``ThreadFuzzer.start(...)``.
Disabled cost: one module-global None check per site.
"""
from __future__ import annotations

import os
import random
import threading
import time
from typing import Dict, Optional

__all__ = ["ThreadFuzzer", "fuzz_yield"]

_active: Optional["ThreadFuzzer"] = None


class ThreadFuzzer:
    """Process-wide scheduling perturbator."""

    def __init__(self, sleep_probability: float = 0.05,
                 sleep_time_us: int = 5000,
                 yield_probability: float = 0.1,
                 seed: Optional[int] = None):
        self.sleep_probability = sleep_probability
        self.sleep_time_us = sleep_time_us
        self.yield_probability = yield_probability
        self._rng = random.Random(seed)
        self._lock = threading.Lock()
        self.hits: Dict[str, int] = {}

    # -- lifecycle -----------------------------------------------------------
    @classmethod
    def start(cls, **kw) -> "ThreadFuzzer":
        global _active
        _active = cls(**kw)
        return _active

    @classmethod
    def stop(cls) -> None:
        global _active
        _active = None

    @classmethod
    def is_active(cls) -> bool:
        return _active is not None

    @classmethod
    def maybe_start_from_env(cls) -> Optional["ThreadFuzzer"]:
        """Honor the THREAD_FUZZER_* environment contract."""
        if os.environ.get("THREAD_FUZZER_ENABLED", "0") not in ("1", "true"):
            return None
        return cls.start(
            sleep_probability=float(
                os.environ.get("THREAD_FUZZER_SLEEP_PROBABILITY", "0.05")),
            sleep_time_us=int(
                os.environ.get("THREAD_FUZZER_SLEEP_TIME_US", "5000")),
            yield_probability=float(
                os.environ.get("THREAD_FUZZER_YIELD_PROBABILITY", "0.1")))

    # -- the perturbation ----------------------------------------------------
    def _perturb(self, site: str) -> None:
        with self._lock:
            self.hits[site] = self.hits.get(site, 0) + 1
            r = self._rng.random()
            sleep_r = self._rng.random()
        if r < self.sleep_probability:
            time.sleep(sleep_r * self.sleep_time_us / 1e6)
        elif r < self.sleep_probability + self.yield_probability:
            time.sleep(0)                   # bare yield: release the GIL


def fuzz_yield(site: str) -> None:
    """Instrumentation hook: a possible context-switch point in threaded
    host code.  No-op unless a ThreadFuzzer is active."""
    if _active is not None:
        _active._perturb(site)


ThreadFuzzer.maybe_start_from_env()
