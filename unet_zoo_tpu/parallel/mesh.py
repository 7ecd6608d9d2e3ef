"""Mesh setup + sharding helpers.

TPU-native replacement for the reference's ``MultiGPUManager``/
``nn.DataParallel`` (ref: unet_zoo/utils/multi_gpu.py:8-37): a
``jax.sharding.Mesh`` over all chips with the batch dim sharded along the
``data`` axis and parameters replicated. Under ``jit`` XLA partitions the
step SPMD and inserts the gradient all-reduce over ICI itself — no
explicit collectives needed for pure data parallelism.

A second mesh axis (``model``) is exposed for tensor-parallel sharding of
the largest variants; convolutional UNets at these sizes fit one chip, so
the default is pure DP.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices: Optional[Sequence[jax.Device]] = None,
                data_axis: int = -1, model_axis: int = 1) -> Mesh:
    """Mesh over ``devices`` (default: all) as (data, model) = (N/model, model)."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if model_axis < 1 or n % model_axis:
        raise ValueError(f"model_axis={model_axis} must divide device count {n}")
    arr = np.array(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def create_mesh_for_batch(batch_size: int,
                          max_devices: Optional[int] = None,
                          model_axis: int = 1) -> Mesh:
    """(data, model) mesh sized so the 'data' axis divides ``batch_size``
    (a batch not divisible by the data-axis size cannot be sharded);
    ``model_axis`` > 1 reserves that many devices per data shard for
    tensor parallelism."""
    n_avail = len(jax.devices())
    if max_devices is not None:
        n_avail = min(n_avail, max_devices)
    n_data_max = n_avail // model_axis
    if n_data_max < 1:
        raise ValueError(
            f"model_parallel_size={model_axis} exceeds the "
            f"{n_avail} available devices")
    n_data = max(d for d in range(1, n_data_max + 1) if batch_size % d == 0)
    return create_mesh(jax.devices()[: n_data * model_axis],
                       model_axis=model_axis)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays on the mesh with batch-dim sharding."""
    sharding = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate_state(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params/TrainState) across the whole mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
