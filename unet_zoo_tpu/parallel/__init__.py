"""Device-mesh parallelism (the nn.DataParallel slot, done the TPU way)."""

from unet_zoo_tpu.parallel.mesh import (
    create_mesh_for_batch,
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate_state,
)
from unet_zoo_tpu.parallel.fsdp import fsdp_sharding_for, shard_state_fsdp

__all__ = [
    "create_mesh",
    "create_mesh_for_batch",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate_state",
    "fsdp_sharding_for",
    "shard_state_fsdp",
]
