"""Tensor (channel) parallelism over the mesh's ``model`` axis.

Megatron-style column/row pairing applied to the zoo's ubiquitous
(conv → BN → act) × 2 blocks (``DoubleConv`` and friends — ref:
unet_zoo/models/common_layers.py:20-61): the first conv of each pair is
**column-parallel** (output channels sharded over ``model``; its bias and
BatchNorm parameters/statistics shard with it, and the activation between
the two convs stays channel-sharded on-device), the second is
**row-parallel** (input channels sharded; XLA inserts one ``psum`` to
reassemble the full output). The whole layout is expressed as
``NamedSharding``s on the parameter pytree — GSPMD propagates the
activation shardings and inserts the collectives; no model-code changes.

For the conv zoo every variant fits one chip, so TP is a capacity lever
(e.g. very large ``base_channels`` scaling or >1k-px activations), not
the default; combine with the ``data`` axis of the same 2-D mesh for
DP×TP::

    mesh = create_mesh(jax.devices(), model_axis=4)   # (data, model)
    state = shard_state_tp(mesh, state)               # params over 'model'
    imgs, masks = shard_batch(mesh, imgs, masks)      # batch over 'data'
    state, metrics = train_step(state, imgs, masks)   # same jitted step
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# flax auto-names the two ConvNormAct submodules of every DoubleConv /
# DoubleConvMid pair "_0" (column slot) and "_1" (row slot).
_COLUMN_MARK = "ConvNormAct_0"
_ROW_MARK = "ConvNormAct_1"


def _tp_spec(path: str, shape, tp: int) -> P:
    """PartitionSpec for one leaf under the column/row pairing rules.

    ``path`` is ``jax.tree_util.keystr`` output, e.g.
    ``"['params']['DownSample_1'][...]['Conv_0']['kernel']"`` (optimizer
    moments embed the same module names, so they shard like their
    parameters).
    """
    ndim = len(shape)
    is_kernel = path.endswith("'kernel']") or path.endswith(".kernel")
    if ndim == 4 and is_kernel:
        kh, kw, cin, cout = shape
        if _ROW_MARK in path and cin % tp == 0:
            return P(None, None, "model", None)
        if cout % tp == 0:
            # column slot, and the default for unpaired convs
            # (ConvTranspose, stems, OutConv when divisible)
            return P(None, None, None, "model")
        return P()
    if ndim == 2 and is_kernel:
        # Dense layers (transformer hybrids): column-shard the output dim.
        return P(None, "model") if shape[1] % tp == 0 else P()
    if ndim == 1 and _COLUMN_MARK in path and shape[0] % tp == 0:
        # bias / BN scale+bias / batch_stats mean+var of a column conv
        # live on the sharded channel dim.
        return P("model")
    return P()


def tp_sharding_for(mesh: Mesh, tree: Any) -> Any:
    """Pytree of NamedShardings mirroring ``tree`` (params, batch_stats,
    optimizer state — optimizer moments shard like their parameters
    because their paths embed the same module names)."""
    tp = mesh.shape["model"]

    def spec_of(path, leaf):
        return NamedSharding(
            mesh, _tp_spec(jax.tree_util.keystr(path), np.shape(leaf), tp))

    return jax.tree_util.tree_map_with_path(spec_of, tree)


def shard_state_tp(mesh: Mesh, state: Any) -> Any:
    """Place a TrainState (or any pytree of arrays) with TP sharding."""
    shardings = tp_sharding_for(mesh, state)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)
