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


def initialize_cpu(coordinator: str, num_processes: int, process_id: int,
                   local_devices: int | None = None) -> None:
    """Form a multi-process group over CPU devices with gloo cross-process
    collectives — the testable stand-in for a multi-host TPU pod (ICI/DCN):
    N OS processes × M virtual CPU devices each join one global mesh through
    the JAX coordination service, and every collective in parallel/sharded.py
    crosses the process boundary over gloo exactly where it would cross
    DCN on real hardware.

    Must be called before any JAX backend is touched (device queries included)
    and with the axon/sitecustomize PJRT shim absent from PYTHONPATH — the
    shim registers a backend at interpreter start, which pins the process to
    a pre-distributed client (tools/mp_spmd_worker.py strips it)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    if local_devices is not None:
        jax.config.update("jax_num_cpu_devices", local_devices)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


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
