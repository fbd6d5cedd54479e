"""Multi-host runtime initialization.

The reference has no cooperative multi-node execution (its SLURM arrays are
independent seeds, metered_formation_rotate.sh:6-12).  Here scale-out across
hosts of a TPU slice is first-class: call :func:`init_distributed` once per
host process before building the mesh; ``jax.devices()`` then spans the whole
slice, and the same :class:`~..parallel.mesh.DistributedRunner` code runs
unchanged — env shards stay host-local, gradient all-reduces ride ICI within
the slice and DCN across slices.

Host-0-only logging mirrors the reference's single-process logger.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """``jax.distributed.initialize`` with env-var fallbacks.

    On Cloud TPU the arguments auto-detect; elsewhere pass them or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.  Returns
    True if a multi-process runtime was initialized.
    """
    num = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num <= 1 and coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_host_zero() -> bool:
    return jax.process_index() == 0
