"""Device-mesh + sharding helpers (SURVEY.md §2.2, §5 comm-backend bullet).

The reference runs single-process/single-GPU with no collectives
(SURVEY.md §2.2); the TPU build's one required parallelism strategy is data
parallelism: shard the cloud batch axis over a 1-D `jax.sharding.Mesh` and
let XLA emit the gradient all-reduce (psum) over ICI from the sharding
annotations — never hand-written collectives in the train path.

Eval-time pairwise metric matrices reuse the same mesh by sharding the
generated-set axis (SURVEY.md §5 long-context bullet).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    axis_name: str = "data",
    n_devices: int = -1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) local devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices == 0:
        raise ValueError("n_devices must be -1 (all) or positive, got 0")
    if n_devices > 0:
        if n_devices > len(devs):
            raise ValueError(
                f"parallel.data_axis={n_devices} devices requested but only "
                f"{len(devs)} are visible"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int = 3, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (the cloud batch) over the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put a host batch (pytree of arrays) with axis-0 sharding."""
    def _put(x):
        return jax.device_put(x, batch_sharding(mesh, ndim=x.ndim, axis_name=axis_name))

    return jax.tree.map(_put, batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
