"""Tracing / profiling utilities.

The reference's observability is two wall-clock prints
(``train_eval.py:14,50-51,62,117-118``) plus a per-epoch history JSON in the
videomamba trainer (``lrcn/mamba.py:412-420`` -> ``training_history.json``).
This module keeps those contracts (the Trainer emits both) and adds what a
TPU production stack actually uses: ``jax.profiler`` device traces viewable
in XProf/TensorBoard, and a per-step timer with percentile summaries.
"""

from __future__ import annotations

import contextlib
import json
import math
import time
from typing import Dict, List, Optional

__all__ = ["device_trace", "StepTimer", "write_history"]


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Step timing that is truthful under async dispatch.

    JAX step calls return as soon as the work is *enqueued*; the only
    observable walltime is between device->host sync points. So the timer
    measures sync-to-sync spans: ``start()`` opens a span (no-op if one is
    already open), ``step()`` counts a dispatched step, and ``sync()`` —
    called immediately after a real value fetch — closes the span and
    records elapsed/steps once per counted step. With a sync every step
    (``log_every=1``) this is exact per-step walltime; with one fetch per
    epoch it is the exact epoch-mean step time. Never records bare dispatch
    latency.
    """

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._steps: int = 0

    def start(self):
        if self._t0 is None:
            self._t0 = time.perf_counter()

    def step(self):
        self._steps += 1

    def sync(self):
        """Close the span at a device->host sync; attribute time per step."""
        if self._t0 is not None and self._steps:
            per_step = (time.perf_counter() - self._t0) / self._steps
            self.times.extend([per_step] * self._steps)
        self._t0 = None
        self._steps = 0

    @property
    def last_ms(self) -> float:
        return self.times[-1] * 1e3 if self.times else 0.0

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"steps": 0}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_ms": sum(ts) / n * 1e3,
            "p50_ms": ts[n // 2] * 1e3,
            # nearest-rank percentile: ceil(0.9n)-1 (int(0.9n) hits max
            # for small n)
            "p90_ms": ts[max(math.ceil(0.9 * n) - 1, 0)] * 1e3,
            "max_ms": ts[-1] * 1e3,
        }


def write_history(path: str, history: dict) -> None:
    """Per-epoch training history JSON (lrcn/training_history.json shape)."""
    import os

    if os.path.dirname(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(history, f, indent=2)
