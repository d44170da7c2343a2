"""Observability: structured metrics + on-demand TPU profiling.

The reference had only console logging and an unused TF-summary helper
(utils/runner_utils.py:18-23, SURVEY.md §5).  Here:

* :class:`MetricsWriter` appends one JSON object per event to a .jsonl file
  (epoch metrics, step timing, round stats) — greppable and plottable.
* :func:`trace` wraps a block in a jax.profiler trace when
  ``HUAL_PROFILE_DIR`` is set (view with TensorBoard / xprof).
* :class:`StepTimer` tracks wall-time + pairs/sec with warmup skip.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Optional


class MetricsWriter:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self._f = open(path, "a", encoding="utf-8")

    def write(self, kind: str, **fields: Any) -> None:
        rec = {"ts": time.time(), "kind": kind, **fields}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


@contextlib.contextmanager
def trace(name: str, profile_dir: Optional[str] = None):
    """jax.profiler trace scope, enabled by HUAL_PROFILE_DIR (or arg)."""
    profile_dir = profile_dir or os.environ.get("HUAL_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(profile_dir):
        with jax.profiler.TraceAnnotation(name):
            yield


class StepTimer:
    """Step-time / throughput accounting with warmup-step exclusion."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup = warmup_steps
        self.reset()

    def reset(self) -> None:
        self._seen = 0
        self._time = 0.0
        self._items = 0
        self._last: Optional[float] = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def stop(self, n_items: int) -> None:
        assert self._last is not None
        dt = time.perf_counter() - self._last
        self._seen += 1
        if self._seen > self.warmup:
            self._time += dt
            self._items += n_items

    @property
    def pairs_per_sec(self) -> float:
        return self._items / self._time if self._time > 0 else 0.0

    @property
    def mean_step_ms(self) -> float:
        steps = self._seen - self.warmup
        return (self._time / steps * 1e3) if steps > 0 else 0.0
