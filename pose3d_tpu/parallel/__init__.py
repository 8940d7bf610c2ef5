from pose3d_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_host_local_batch,
    pad_batch,
    replicate,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_host_local_batch",
    "pad_batch",
    "replicate",
]
