"""Tracing / profiling utilities.

The reference's only instrumentation is commented-out wall-clock probes and
ms/batch logging (train.py:310-311, :423-430). TPU-native equivalents:

- ``trace(logdir)``: jax.profiler trace context (view in TensorBoard /
  xprof) around any region.
- ``StepTimer``: EMA step timing that syncs only when read, so it does not
  serialize the async dispatch queue (a device sync costs ~25 ms through a
  TPU tunnel).
- ``annotate``: named TraceAnnotation for kernel-level attribution.
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


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Exponential-moving-average step timer; wall-clock only (no device
    syncs injected)."""

    def __init__(self, alpha: float = 0.05):
        self.alpha = alpha
        self.ema_ms: Optional[float] = None
        self._last: Optional[float] = None

    def update(self, ms: float) -> float:
        """Feed an externally measured ms/batch sample into the EMA (used by
        the train loop at log-interval sync points, where wall-clock over the
        interval is the accurate measure under async dispatch)."""
        self.ema_ms = ms if self.ema_ms is None else (
            self.alpha * ms + (1 - self.alpha) * self.ema_ms
        )
        return self.ema_ms

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            ms = (now - self._last) * 1000.0
            self.ema_ms = ms if self.ema_ms is None else (
                self.alpha * ms + (1 - self.alpha) * self.ema_ms
            )
        self._last = now
        return self.ema_ms


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
