"""Device mesh utilities.

The reference has no multi-device story (SURVEY.md §2.5: EnsembleThreads CPU
threading and single-GPU Flux only). The TPU-native equivalent layer:
`jax.sharding.Mesh` over the chips, batch sharded on a ``data`` axis,
parameters replicated, gradient allreduce riding ICI via XLA collectives.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicate", "shard_batch", "P", "NamedSharding",
           "initialize_distributed"]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           **kwargs) -> int:
    """Multi-host entry point: initialize `jax.distributed` so
    ``jax.devices()`` (and therefore :func:`make_mesh`) spans every host in
    the pod/slice, with collectives riding ICI within a slice and DCN
    across slices.

    On TPU pods the arguments are auto-detected from the environment —
    call with no arguments. Elsewhere pass the coordinator address and the
    process grid explicitly. Returns the global device count. Idempotent:
    a second call is a no-op (jax raises if re-initialized; swallowed).
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id, **kwargs)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    return len(jax.devices())


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default).

    After :func:`initialize_distributed`, ``jax.devices()`` is the GLOBAL
    device list, so the same call builds a multi-host mesh."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"requested {n_devices} devices, "
                             f"have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(x, mesh: Mesh, axis_name: str = "data"):
    """Shard an array's leading (batch) axis across the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(x, sharding)
