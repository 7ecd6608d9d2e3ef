"""FSDP-style parameter sharding over the mesh (ZeRO-3 analogue).

Each parameter leaf is sharded along its largest mesh-divisible axis over
the ``data`` axis; XLA's GSPMD partitioner inserts the all-gathers before
use and reduce-scatters for the gradients — no manual collectives. For
the zoo's largest variants (u2net 44M, da_transformer 44M, mmunet 39M)
this drops per-chip parameter+optimizer memory by ~Nx on an N-chip mesh
while the batch stays data-parallel.

Usage::

    mesh = create_mesh()
    state = shard_state_fsdp(mesh, state)      # instead of replicate_state
    imgs, masks = shard_batch(mesh, imgs, masks)
    state, metrics = train_step(state, imgs, masks)   # same jitted step
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(shape, mesh_size: int) -> P:
    """Shard the largest axis divisible by the mesh size; replicate scalars
    and indivisible leaves."""
    best_axis = None
    best_dim = 0
    for i, d in enumerate(shape):
        if d % mesh_size == 0 and d > best_dim:
            best_axis, best_dim = i, d
    if best_axis is None:
        return P()
    spec = [None] * len(shape)
    spec[best_axis] = "data"
    return P(*spec)


def fsdp_sharding_for(mesh: Mesh, tree: Any) -> Any:
    """Pytree of NamedShardings mirroring ``tree``."""
    n = mesh.shape["data"]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, _leaf_spec(np.shape(x), n)), tree)


def shard_state_fsdp(mesh: Mesh, state: Any) -> Any:
    """Place a TrainState (or any pytree of arrays) with FSDP sharding."""
    shardings = fsdp_sharding_for(mesh, state)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)
