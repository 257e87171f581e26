"""Tracing / profiling helpers (new capability — the reference has none
beyond wall-clock spans, SURVEY.md §5.1).

* ``trace(logdir)``: context manager around ``jax.profiler`` — produces a
  TensorBoard-loadable trace of the device timeline (XLA ops, fusion,
  memory).
* ``StepTimer``: steady-state step timing that excludes the first
  (compile) step and reports mean/p50/p99.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step stats, first ``skip`` steps excluded (compile)."""

    def __init__(self, skip: int = 1):
        self.skip = skip
        self.times: list[float] = []
        self._t0: float | None = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        dt = time.time() - self._t0
        self._count += 1
        if self._count > self.skip:
            self.times.append(dt)
        return False

    def stats(self) -> dict:
        if not self.times:
            return {"steps": 0}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p99_s": float(np.percentile(arr, 99)),
            "steps_per_sec": float(1.0 / arr.mean()),
        }


def attention_fallback_counts() -> dict:
    """Per-site Pallas->XLA attention fallback counters (see
    ops/attention.py): nonzero values on TPU mean the fused kernel failed
    to dispatch somewhere and the model silently ran the ~2x slower XLA
    path — check the warn-once log for the first failure's shapes."""
    from controlnet_tpu.ops.attention import fallback_count

    return fallback_count()
