"""Device-mesh parallelism (the nn.DataParallel slot, done the TPU way)."""

from unet_zoo_tpu.parallel.mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate_state,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate_state",
]
