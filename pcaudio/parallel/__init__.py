from pcaudio.parallel.mesh import (
    DATA_AXIS,
    SET_AXIS,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS", "SET_AXIS", "make_mesh", "batch_sharding", "replicated",
    "shard_batch",
]
