"""Multi-host distributed initialization + mesh construction.

Replaces the reference's ROS master + TCPROS topic fabric (SURVEY.md §2d P4)
with the JAX coordination service: `jax.distributed.initialize` forms the
process group over gRPC, after which every host participates in one SPMD
program over a global mesh — keyframe/descriptor/factor axes shard across
hosts (DCN) and chips (ICI), with the collectives in `parallel/sharded.py`.

On a single host this degrades gracefully to the local mesh.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join (or form) the multi-host process group.

    Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); a no-op
    when single-process."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return  # single host
    kwargs = {}
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(coordinator_address=coordinator, **kwargs)


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every device of every participating host."""
    return Mesh(np.array(jax.devices()), (axis,))


def host_local_mesh(axis: str = "data") -> Mesh:
    """Mesh over this host's devices only (for host-local stages)."""
    return Mesh(np.array(jax.local_devices()), (axis,))


def topology() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
