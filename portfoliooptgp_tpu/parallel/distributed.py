"""Multi-host bring-up helpers.

The reference is a single process (SURVEY.md §2.3); multi-host runs here use
JAX's standard distributed runtime: call `initialize()` once per process
before any JAX computation, then every `jax.devices()` spans the pod slice
and the mesh/collective code in this package works unchanged — `psum` rides
ICI within a slice and DCN across slices, scheduled by XLA.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID). No-op when unset and
    running single-process."""
    import jax

    coordinator_address = coordinator_address or os.getenv("COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return  # single-process run
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None or os.getenv("NUM_PROCESSES"):
        kwargs["num_processes"] = int(num_processes or os.getenv("NUM_PROCESSES"))
    if process_id is not None or os.getenv("PROCESS_ID"):
        kwargs["process_id"] = int(process_id if process_id is not None else os.getenv("PROCESS_ID"))
    jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
