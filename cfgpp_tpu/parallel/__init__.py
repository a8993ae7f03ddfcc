from cfgpp_tpu.parallel.mesh import (
    DP_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = ["DP_AXIS", "batch_sharding", "make_mesh", "replicate", "replicated",
           "shard_batch"]
