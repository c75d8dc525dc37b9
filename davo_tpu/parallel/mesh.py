"""Device-mesh helpers for multi-chip execution.

The framework scales by sharding the *batch of optimisation problems* (and
later, keyframe/map blocks of the distributed BA factor graph) over a
``jax.sharding.Mesh``.  XLA inserts the collectives; these helpers only
define the mesh and the placement of pytrees on it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replicate",
    "shard_along",
    "initialize_distributed",
    "DATA_AXIS",
]

DATA_AXIS = "data"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialise the multi-host runtime (``jax.distributed.initialize``
    over ICI/DCN) and return this process's index.

    With no arguments, auto-detects the cluster environment (TPU pod
    metadata / SLURM / GKE); a no-op when already initialised or when
    running single-process.

    Error contract: when the caller passes explicit cluster coordinates,
    a failure is a real misconfiguration and **raises**; only the
    implicit auto-detect path treats failure as "no cluster here" (and
    says so in a warning rather than silently running single-process).
    """
    explicit = any(
        v is not None
        for v in (coordinator_address, num_processes, process_id)
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as exc:
        if explicit:
            raise RuntimeError(
                "jax.distributed.initialize failed for the explicitly "
                f"configured cluster ({coordinator_address=}, "
                f"{num_processes=}, {process_id=})"
            ) from exc
        import warnings

        warnings.warn(
            "multi-host auto-detection found no cluster "
            f"({type(exc).__name__}: {exc}); continuing single-process",
            stacklevel=2,
        )
    return jax.process_index()


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = (DATA_AXIS,)
) -> Mesh:
    """A 1-D (or reshaped N-D) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if len(axis_names) == 1:
        shape = (n_devices,)
    else:
        # Put all devices on the first axis by default; callers needing a
        # 2-D layout reshape explicitly.
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def replicate(tree, mesh: Mesh):
    """Place every leaf replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_along(tree, mesh: Mesh, axis_name: str = DATA_AXIS, dim: int = 0):
    """Shard every leaf's ``dim`` dimension along ``axis_name``."""

    def _shard(x):
        spec = [None] * x.ndim
        spec[dim] = axis_name
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(_shard, tree)
