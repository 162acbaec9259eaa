from pcaudio.parallel.mesh import (
    DATA_AXIS,
    SET_AXIS,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from pcaudio.parallel.set_sharded import set_sharded_st_forward

__all__ = [
    "DATA_AXIS", "SET_AXIS", "make_mesh", "batch_sharding", "replicated",
    "shard_batch", "set_sharded_st_forward",
]
