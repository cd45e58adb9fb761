"""Multi-host (DCN) initialization.

The reference has no multi-node story beyond SGE/Slurm job arrays
(utils/parallel/*.pl). TPU-native equivalent: `jax.distributed.initialize`
joins this process into a multi-host SPMD job; the (dp, tp) mesh in mesh.py
then spans all hosts' devices — dp over DCN, tp kept inside a host's ICI
domain by construction (make_mesh fills tp with adjacent devices).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join a multi-host job. No-op (returns False) when single-process.

    Arguments default to the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID environment (the usual TPU pod launcher contract).
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 or not coordinator_address:
        return False
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_primary() -> bool:
    return jax.process_index() == 0
