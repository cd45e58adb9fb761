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
thresholds fire naturally once re-enabled, i.e. the deferred gen-2
sweep lands between passes instead of inside one. Cyclic garbage
*created inside* the block (rare on these paths: no exception handling,
no reference cycles in the hot loops) is likewise deferred, so very
long blocks trade a bounded RSS bump for latency; keep blocks to one
logical pass. Nested uses are safe: the collector is re-enabled only
when the outermost block exits (depth returns to 0), so a non-LIFO
exit cannot re-enable it while another block is still active. The
depth counter assumes the single-threaded host-dispatch model used
throughout this package (same assumption as the kernel_gate).
"""

import gc
from contextlib import contextmanager

_depth = 0
_reenable = False


@contextmanager
def quiet_gc():
    global _depth, _reenable
    if _depth == 0:
        _reenable = gc.isenabled()
        if _reenable:
            gc.disable()
    _depth += 1
    try:
        yield
    finally:
        _depth -= 1
        if _depth == 0 and _reenable:
            gc.enable()
