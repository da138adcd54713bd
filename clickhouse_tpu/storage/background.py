"""Background merge executor.

Analog of MergeTreeBackgroundExecutor + MergeTask scheduling
(src/Storages/MergeTree/MergeTreeBackgroundExecutor.cpp): inserts notify
the executor; a worker thread merges any table whose part count crossed
the threshold, off the query path.  Merges apply the engine's fold
semantics (storage/merges.py) and persist through the durable store when
one is attached.  `SYSTEM STOP/START MERGES` toggles it;
`system.merges` shows in-flight merges.
"""
from __future__ import annotations

import queue
import threading
import time
from typing import Dict, List, Optional, Tuple

__all__ = ["BackgroundExecutor"]


class BackgroundExecutor:
    def __init__(self, catalog, min_parts: int = 64):
        self.catalog = catalog
        self.min_parts = min_parts
        self.enabled = True
        self._q: "queue.Queue[Optional[Tuple[str, str, int]]]" = queue.Queue()
        self._active: Dict[Tuple[str, str], float] = {}
        self._lock = threading.Lock()
        self.merges_done = 0
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="bg-merges")
        self._thread.start()

    # -- producer side ---------------------------------------------------
    def notify(self, db: str, name: str,
               min_parts: Optional[int] = None) -> None:
        if not self.enabled:
            return
        self._q.put((db, name, min_parts or self.min_parts))

    def stop(self) -> None:
        self.enabled = False

    def start(self) -> None:
        self.enabled = True

    def wait_idle(self, timeout_s: float = 30.0) -> None:
        """Drain the queue (tests / SYSTEM commands)."""
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            # unfinished_tasks covers the get()->task_done() window where the
            # queue is already empty but the item is not yet in _active.
            with self._q.all_tasks_done:
                busy = self._q.unfinished_tasks > 0
            if not busy:
                return
            time.sleep(0.01)

    def active(self) -> List[Tuple[str, str, float]]:
        with self._lock:
            now = time.monotonic()
            return [(db, tbl, now - t0)
                    for (db, tbl), t0 in self._active.items()]

    # -- worker ----------------------------------------------------------
    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            db, name, min_parts = item
            from ..core.thread_fuzzer import fuzz_yield
            fuzz_yield("background_merge_dequeue")
            try:
                if not self.enabled:
                    continue
                try:
                    t = self.catalog.get_table(db, name)
                except Exception:
                    continue
                if len(t.parts) < max(min_parts, 2):
                    continue
                key = (db, name)
                with self._lock:
                    self._active[key] = time.monotonic()
                try:
                    t.optimize()
                    self.merges_done += 1
                finally:
                    with self._lock:
                        self._active.pop(key, None)
            except Exception:
                pass                   # background failures never propagate
            finally:
                self._q.task_done()
