"""Explicit-collective data-parallel train step via shard_map.

The default train step relies on jit/GSPMD to partition one global program
(BatchNorm statistics are computed over the *global* batch). This variant
instead runs the per-device program explicitly under ``shard_map`` with
`psum`/`pmean` collectives over the ``data`` axis — reproducing
torch ``nn.DataParallel``'s semantics where each replica computes BN
statistics over its local shard (ref: unet_zoo/utils/multi_gpu.py:28-31).
Updated running statistics are pmean'd across replicas before being
stored.

Use when exact per-shard-BN fidelity matters, or as the building block
for layouts GSPMD can't infer; otherwise the default jit step is simpler
and equivalent for BN-free models.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map

from unet_zoo_tpu.models import ZooModel
from unet_zoo_tpu.train.losses import bce_with_logits, multi_output_loss
from unet_zoo_tpu.train.metrics import dice_coefficient
from unet_zoo_tpu.train.steps import TrainState


def make_train_step_shard_map(model: ZooModel, mesh: Mesh,
                              criterion: Callable = bce_with_logits
                              ) -> Callable:
    """``step(state, images, masks) -> (state, metrics)`` with the batch
    sharded over 'data' and state replicated; gradients pmean'd explicitly."""

    def per_device(state: TrainState, images, masks
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        dropout_rng = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(0), state.step),
            jax.lax.axis_index("data"))

        def loss_fn(params, batch_stats):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            outputs, mutated = model.module.apply(
                variables, images, train=True,
                mutable=["batch_stats", "aux_loss"],
                rngs={"dropout": dropout_rng})
            loss = multi_output_loss(outputs, masks, model.loss_weight,
                                     criterion)
            for leaf in jax.tree_util.tree_leaves(
                    mutated.get("aux_loss", {})):
                loss = loss + jnp.sum(leaf)
            return loss, (outputs["main"], mutated.get("batch_stats", {}))

        (loss, (main_logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)

        grads = jax.lax.pmean(grads, "data")          # explicit all-reduce
        loss = jax.lax.pmean(loss, "data")
        dice = jax.lax.pmean(dice_coefficient(main_logits, masks), "data")
        if new_stats:
            new_stats = jax.lax.pmean(new_stats, "data")

        state = state.apply_gradients(grads=grads)
        if new_stats:
            state = state.replace(batch_stats=new_stats)
        return state, {"loss": loss, "dice": dice}

    mapped = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)
