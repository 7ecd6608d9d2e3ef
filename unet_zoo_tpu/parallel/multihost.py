"""Multi-host (multi-process) SPMD support.

The reference tops out at single-process ``nn.DataParallel``
(ref: unet_zoo/utils/multi_gpu.py:28-31, DDP explicitly deferred at
:23-24,32-33). The TPU-native equivalent of "more than one host" is a
multi-process JAX program: one process per host, all chips in one global
``Mesh``, data sharded per-process on the batch axis, and checkpoint I/O
coordinated so every process participates (orbax requirement) while only
the primary logs.

Single-process use is zero-config: every helper degrades to the local
behavior, so the train scripts call these unconditionally.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime for multi-host execution.

    Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``); on TPU pods JAX can also auto-detect all three.
    Returns True if the distributed runtime was (already) initialized,
    False for plain single-process runs (no coordinator configured).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None:
        return False
    # NB: do not probe jax.process_count() here — it initializes the XLA
    # backend, after which jax.distributed.initialize() refuses to run.
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:  # already initialized
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_primary() -> bool:
    """True on the process that should write logs/plots/summaries."""
    return jax.process_index() == 0


def global_mesh(data_axis_name: str = "data",
                model_axis: int = 1) -> Mesh:
    """Mesh over ALL devices across every process (ICI+DCN)."""
    devices = jax.devices()
    n = len(devices)
    if model_axis < 1 or n % model_axis:
        raise ValueError(f"model_axis={model_axis} must divide {n}")
    arr = np.array(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, (data_axis_name, "model"))


def process_batch_slice(global_batch_size: int) -> Tuple[int, int]:
    """This process's ``[start, stop)`` slice of a globally-sharded batch.

    The global batch is laid out contiguously by process index — the same
    order ``make_global_batch`` assembles shards in.
    """
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes")
    per = global_batch_size // n
    start = jax.process_index() * per
    return start, start + per


def make_global_batch(mesh: Mesh, *host_shards: np.ndarray):
    """Assemble per-process host shards into global batch-sharded arrays.

    Each process passes ONLY its local shard (``process_batch_slice`` of
    the global batch). Returns jax.Arrays whose global shape includes all
    processes' data, sharded over the mesh's ``data`` axis. Single-process
    meshes take the plain ``device_put`` path.
    """
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        out = tuple(jax.device_put(a, sharding) for a in host_shards)
        return out[0] if len(out) == 1 else out
    out = tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in host_shards)
    return out[0] if len(out) == 1 else out


def sync_global_devices(name: str = "barrier") -> None:
    """Cross-process barrier (e.g. before reading a checkpoint another
    process just wrote)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def fully_replicate_to_host(tree: Any) -> Any:
    """Gather a (possibly sharded) pytree into host-local numpy arrays.

    Multi-host checkpoint save of non-orbax artifacts (plots, summaries)
    needs fully-addressable values on the primary; this is the multi-host
    analogue of the reference's unwrap-before-save
    (ref: unet_zoo/utils/multi_gpu.py:39-42).
    """
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: np.asarray(
            multihost_utils.process_allgather(x, tiled=True)
            if isinstance(x, jax.Array) and not x.is_fully_addressable
            else x),
        tree)
