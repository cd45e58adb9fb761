"""Suppress cyclic GC inside latency-sensitive passes.

A full gen-2 collection on a JAX-loaded heap measures ~110 ms on this
host — longer than a whole warm rescoring pass (~90 ms for 2000
hypotheses), so a collection triggered mid-pass doubles that pass's
latency. Per-pass garbage is almost entirely acyclic (numpy buffers,
tuples, lists), which reference counting frees immediately; deferring
*cycle* collection to the gap between passes costs nothing.

``quiet_gc()`` disables the cyclic collector for the duration of the
block and restores the previous state on exit (exception-safe). It does
NOT force a collection on exit — the collector's own allocation
thresholds fire naturally once re-enabled. Nested uses are safe: only
the outermost block toggles the collector.
"""

import gc
from contextlib import contextmanager

_depth = 0


@contextmanager
def quiet_gc():
    global _depth
    outermost = _depth == 0
    was_enabled = gc.isenabled()
    if outermost and was_enabled:
        gc.disable()
    _depth += 1
    try:
        yield
    finally:
        _depth -= 1
        if outermost and was_enabled:
            gc.enable()
