"""Trace-time switch for the opaque Pallas fast paths.

A Mosaic custom call is opaque to GSPMD: inside a jit partitioned with
in_shardings, XLA cannot split it and instead all-gathers its operands onto
every device — silently destroying dp/tp scaling. shard_map bodies have no
such problem (the kernel runs per device on local shards).

`no_pallas()` is entered while TRACING a GSPMD-partitioned computation
(parallel/train_parallel.py wraps the tp>1 train step with it); every
Pallas availability gate consults `pallas_allowed()`. Pure-dp meshes use a
shard_map train step instead and keep all fused kernels.
"""

from __future__ import annotations

import contextlib
import contextvars

# A ContextVar (not a module global) so the switch is confined to the code
# that actually runs under the `with no_pallas()` block in THIS context:
# a jit cache miss traced concurrently from another thread/task does not
# observe the flag and keeps its Pallas fast paths.
_disabled: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "bayeslm_no_pallas", default=False
)


def pallas_allowed() -> bool:
    return not _disabled.get()


@contextlib.contextmanager
def no_pallas():
    token = _disabled.set(True)
    try:
        yield
    finally:
        _disabled.reset(token)
