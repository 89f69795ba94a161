"""Profiling / tracing utilities (SURVEY.md section 5: the reference has
only ad-hoc ptflops counts; here we provide first-class hooks).

* ``trace(log_dir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-compatible trace (gated: returns a no-op if the backend does
  not support profiling, e.g. tunnelled TPUs).
* ``StepTimer`` — cheap wall-clock step timing with EMA smoothing; feeds
  the `steps_per_sec` scalar the Trainer logs.
* ``flops_estimate`` — XLA cost-analysis FLOPs of a jitted function, the
  replacement for the reference's ptflops `__main__` blocks
  (ncsnpp_v2.py:464-481, tfgridnet.py:521-538).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is falsy or the
    backend refuses to start a trace."""
    if not log_dir:
        yield
        return
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class StepTimer:
    """EMA-smoothed step timing."""

    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self._last: Optional[float] = None
        self.ema: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.ema = dt if self.ema is None else (
                self.decay * self.ema + (1 - self.decay) * dt)
        self._last = now
        return self.ema

    @property
    def steps_per_sec(self) -> Optional[float]:
        return (1.0 / self.ema) if self.ema else None


def flops_estimate(fn: Callable, *args) -> Optional[float]:
    """Total FLOPs of `fn(*args)` from XLA cost analysis (None if the
    backend does not expose it)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        compiled = lowered.compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", None)) if analysis else None
    except Exception:
        return None
