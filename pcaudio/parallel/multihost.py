"""Multi-host (DCN) scale-out helpers.

The reference's parallelism tops out at single-process DataParallel
(SURVEY.md §2.3).  pcaudio's device-side story is mesh-based and host-count
agnostic: on a multi-host TPU slice, initialize the distributed runtime, build
the global mesh over all hosts' devices, and feed each host its batch shard —
XLA runs the same SPMD program with gradient collectives over ICI within a
slice and DCN across slices.

Not exercisable in this single-host environment; kept thin and standard.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from pcaudio.parallel.mesh import DATA_AXIS, SET_AXIS


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` passthrough (no-op if already up or
    single-process with auto-detected env)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized


def global_mesh(n_set: int = 1) -> Mesh:
    """Mesh over ALL devices across hosts: ``(data, set)``."""
    devices = np.array(jax.devices())
    n_data = len(devices) // n_set
    return Mesh(devices[: n_data * n_set].reshape(n_data, n_set),
                (DATA_AXIS, SET_AXIS))


def local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-indexed batch (equal split by process
    index; pair with ``jax.make_array_from_process_local_data``)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def global_batch_array(mesh: Mesh, local_tree):
    """Assemble a globally-sharded batch from THIS host's local shard.

    ``local_tree`` leaves are numpy arrays holding this process's slice of
    the global batch (``local_batch_slice``); returns jax Arrays sharded
    over the mesh ``data`` axis whose global shape is the concatenation
    across processes.  This is the multi-host data-feeding primitive: each
    host touches only its own data, XLA sees one global array.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(DATA_AXIS))
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, local_tree)
