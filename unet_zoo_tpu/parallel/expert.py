"""Expert parallelism (ep) over the mesh's ``model`` axis.

Places the expert-stacked parameters of ``nn.moe.SwitchMoEMLP``
(``expert_fc1_kernel [E, D, H]``, ``expert_fc2_kernel [E, H, O]``, and
their biases) with the leading **expert axis sharded over ``model``**,
while the router and every non-MoE parameter stay replicated. GSPMD
then partitions the stacked expert matmuls (each device computes its
E/ep experts) and inserts the dispatch/combine collectives around the
``[Z, E, C, D]`` expert activations — the standard GShard placement
(arXiv:2006.16668 §3.2) expressed purely as ``NamedSharding``s, no
model-code changes.

Compose with data parallelism on the same 2-D mesh exactly like TP::

    mesh = create_mesh(jax.devices(), model_axis=4)   # (data, model)
    state = shard_state_ep(mesh, state)               # experts over 'model'
    imgs, masks = shard_batch(mesh, imgs, masks)      # batch over 'data'
    state, metrics = train_step(state, imgs, masks)   # same jitted step

The reference has no MoE (this is a superset capability); the MoE zoo
entry is ``unext_moe`` (models/__init__.py).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_EXPERT_MARK = "expert_"


def _ep_spec(path: str, shape, ep: int) -> P:
    """Leading expert axis of ``expert_*`` leaves shards over 'model'.

    Optimizer moments embed the same module/param names in their paths,
    so they shard identically to their parameters.
    """
    if _EXPERT_MARK in path and len(shape) >= 1 and shape[0] % ep == 0:
        return P("model", *([None] * (len(shape) - 1)))
    return P()


def ep_sharding_for(mesh: Mesh, tree: Any) -> Any:
    """Pytree of NamedShardings mirroring ``tree``."""
    ep = mesh.shape["model"]

    def spec_of(path, leaf):
        return NamedSharding(
            mesh, _ep_spec(jax.tree_util.keystr(path), np.shape(leaf), ep))

    return jax.tree_util.tree_map_with_path(spec_of, tree)


def shard_state_ep(mesh: Mesh, state: Any) -> Any:
    """Place a TrainState (or any pytree of arrays) with EP sharding."""
    shardings = ep_sharding_for(mesh, state)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)
