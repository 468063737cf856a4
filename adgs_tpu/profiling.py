"""Profiling and tracing hooks (green-field vs the reference, which only
measures wall-clock FPS — SURVEY.md §5).

- `trace(logdir)`: context manager around jax.profiler.trace; view with
  TensorBoard's profile plugin or xprof. The trainer wraps a short window
  of steps in it when launched with --profile.
- `StepTimer`: EMA wall-clock per-step timer; the trainer logs its
  steps_per_sec alongside the losses.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self._ema_coef = ema
        self.ema_s: Optional[float] = None
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.ema_s = (dt if self.ema_s is None
                      else self._ema_coef * self.ema_s
                      + (1 - self._ema_coef) * dt)

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self.ema_s if self.ema_s else 0.0
