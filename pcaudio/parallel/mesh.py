"""Device mesh + sharding helpers — the DataParallel replacement.

The reference's only parallelism is single-process ``nn.DataParallel``
scatter/gather over 2 GPUs (``Code/settransformer.py:94`` and five sibling
call sites; SURVEY.md §2.3).  TPU-native equivalent: a ``jax.sharding.Mesh``
with a ``data`` axis (DP over the batch, gradients reduced over ICI by XLA's
SPMD partitioner) and an optional ``set`` axis sharding the point dimension —
the context-parallel analogue for very large point budgets (ISAB/PMA only
exchange the m inducing/seed vectors across set shards; SURVEY.md §5).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SET_AXIS = "set"


def make_mesh(
    n_data: Optional[int] = None,
    n_set: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, set)`` mesh.  Defaults to all devices on ``data``."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_set
    use = n_data * n_set
    assert use <= len(devices), (
        f"mesh {n_data}x{n_set} needs {use} devices, have {len(devices)}"
    )
    arr = np.array(devices[:use]).reshape(n_data, n_set)
    return Mesh(arr, (DATA_AXIS, SET_AXIS))


def batch_sharding(mesh: Mesh, shard_set_axis: bool = False) -> NamedSharding:
    """Sharding for a ``[B, N, d]`` point-cloud batch: batch over ``data``,
    optionally the point dimension over ``set``."""
    return NamedSharding(
        mesh, P(DATA_AXIS, SET_AXIS if shard_set_axis else None)
    )


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, shard_set_axis: bool = False):
    """Place a host batch pytree onto the mesh: leading axis over ``data``;
    for rank≥3 float leaves (point clouds), optionally axis 1 over ``set``."""

    def put(x):
        x = np.asarray(x)
        spec = [DATA_AXIS] + [None] * (x.ndim - 1)
        if shard_set_axis and x.ndim >= 2:
            spec[1] = SET_AXIS
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(put, tree)
