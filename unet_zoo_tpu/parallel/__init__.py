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
from unet_zoo_tpu.parallel.tensor import tp_sharding_for, shard_state_tp
from unet_zoo_tpu.parallel.expert import ep_sharding_for, shard_state_ep
from unet_zoo_tpu.parallel.pipeline import (
    pipeline_spmd,
    pipeline_bridge,
    stack_stage_params,
    split_microbatches,
    merge_microbatches,
)
from unet_zoo_tpu.parallel.spatial import (
    halo_exchange_h,
    make_spatial_fn,
    spatial_conv2d,
    spatial_sharding,
)
from unet_zoo_tpu.parallel.spatial_models import SPATIAL_TOPOLOGIES
from unet_zoo_tpu.parallel.spatial_unet import (
    make_spatial_eval_step,
    make_spatial_train_step,
)
from unet_zoo_tpu.parallel.multihost import (
    fully_replicate_to_host,
    global_mesh,
    initialize_distributed,
    is_primary,
    make_global_batch,
    process_batch_slice,
    sync_global_devices,
)

__all__ = [
    "create_mesh",
    "create_mesh_for_batch",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate_state",
    "fsdp_sharding_for",
    "shard_state_fsdp",
    "tp_sharding_for",
    "shard_state_tp",
    "ep_sharding_for",
    "shard_state_ep",
    "pipeline_spmd",
    "pipeline_bridge",
    "stack_stage_params",
    "split_microbatches",
    "merge_microbatches",
    "initialize_distributed",
    "is_primary",
    "global_mesh",
    "process_batch_slice",
    "make_global_batch",
    "sync_global_devices",
    "fully_replicate_to_host",
    "halo_exchange_h",
    "make_spatial_fn",
    "spatial_conv2d",
    "spatial_sharding",
    "SPATIAL_TOPOLOGIES",
    "make_spatial_eval_step",
    "make_spatial_train_step",
]
