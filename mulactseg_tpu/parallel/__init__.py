from mulactseg_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    replicate,
    pad_to_multiple,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "replicate", "pad_to_multiple", "shard_batch"]
