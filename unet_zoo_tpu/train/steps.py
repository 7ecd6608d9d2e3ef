"""TrainState + jit'd train/eval steps.

The TPU-native replacement for the reference's per-batch Python loop body
(ref: unet_zoo/utils/training_loop.py:108-141): forward, weighted
multi-output BCE, grad, global-norm clip (1.0), AdamW update and the Dice
metric are all one compiled XLA program; metrics stay on device (no
``.item()`` per batch).

The learning rate is an optax injected hyperparameter so the Dice-plateau
scheduler can change it between epochs without retracing.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from unet_zoo_tpu.data.datasets import prepare_images, prepare_masks
from unet_zoo_tpu.models import ZooModel
from unet_zoo_tpu.train.losses import bce_with_logits, multi_output_loss
from unet_zoo_tpu.train.metrics import dice_coefficient


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def make_optimizer(learning_rate: float, weight_decay: float = 1e-5,
                   max_grad_norm: float = 1.0) -> optax.GradientTransformation:
    """clip_by_global_norm(1.0) → AdamW, with runtime-adjustable LR
    (ref defaults: scripts/train.py:156, utils/training_loop.py:101,120)."""

    @optax.inject_hyperparams
    def _make(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.adamw(learning_rate, weight_decay=weight_decay),
        )

    return _make(learning_rate=learning_rate)


def create_train_state(model: ZooModel, rng: jax.Array,
                       sample: Optional[jnp.ndarray] = None,
                       learning_rate: float = 1e-4,
                       weight_decay: float = 1e-5,
                       max_grad_norm: float = 1.0) -> TrainState:
    variables = model.init(rng, sample)
    return TrainState.create(
        apply_fn=model.module.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(learning_rate, weight_decay, max_grad_norm),
    )


def get_lr(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_lr(state: TrainState, lr: float) -> TrainState:
    hyper = dict(state.opt_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=state.opt_state._replace(hyperparams=hyper))


def make_train_step(model: ZooModel,
                    criterion: Callable = bce_with_logits,
                    remat: bool = False,
                    augment: bool = False,
                    accum_steps: int = 1) -> Callable:
    """Build the jitted train step for ``model``.

    Returns ``step(state, images, masks) -> (state, metrics)`` where metrics
    is ``{'loss': f32[], 'dice': f32[]}`` (device scalars).

    The incoming ``state`` buffers are donated (the old params/opt_state
    are dead after the update — halves peak HBM for the optimizer state).
    ``remat=True`` checkpoints the forward (recompute activations in the
    backward pass) to trade FLOPs for activation memory on big models.
    ``augment=True`` applies on-device random H/V flips to the batch inside
    the compiled step (see data/augment.py), keyed off ``state.step``.
    ``accum_steps=k>1`` splits the batch into k microbatches scanned
    sequentially with in-carry gradient accumulation — one optimizer
    update with the mean gradient, live activations of one microbatch
    only (the memory lever for the members whose backward does not fit
    the target batch; BN statistics update per microbatch, exactly as k
    sequential smaller batches would, and loss/Dice are microbatch
    means).
    """

    def forward(params, batch_stats, images, dropout_rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.module.apply(
            variables, images, train=True,
            mutable=["batch_stats", "aux_loss"],
            rngs={"dropout": dropout_rng},
        )

    if remat:
        forward = jax.checkpoint(forward)

    def loss_fn(params, batch_stats, images, masks, dropout_rng):
        outputs, mutated = forward(params, batch_stats, images, dropout_rng)
        loss = multi_output_loss(outputs, masks, model.loss_weight, criterion)
        # scalar regularizers sown by modules (e.g. the Switch-MoE
        # load-balancing loss, nn/moe.py) join the segmentation loss
        for leaf in jax.tree_util.tree_leaves(mutated.get("aux_loss", {})):
            loss = loss + jnp.sum(leaf)
        return loss, (outputs["main"], mutated.get("batch_stats", {}))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, images: jnp.ndarray, masks: jnp.ndarray
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # uint8-transferred batches normalize here, fused into the first
        # conv by XLA (jit specializes on dtype: zero cost for f32 input)
        images, masks = prepare_images(images), prepare_masks(masks)
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
        if augment:
            from unet_zoo_tpu.data.augment import random_flips

            aug_rng = jax.random.fold_in(jax.random.PRNGKey(1), state.step)
            images, masks = random_flips(aug_rng, images, masks)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum_steps > 1:
            k = accum_steps
            b = images.shape[0]
            if b % k:
                raise ValueError(
                    f"batch {b} not divisible by accum_steps {k}")
            im = images.reshape(k, b // k, *images.shape[1:])
            mk = masks.reshape(k, b // k, *masks.shape[1:])

            def micro(carry, xm):
                bs, gacc, lacc, dacc = carry
                xb, mb, i = xm
                rng_i = jax.random.fold_in(dropout_rng, i)
                (loss, (logits, new_bs)), grads = grad_fn(
                    state.params, bs, xb, mb, rng_i)
                gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
                dice = dice_coefficient(logits, mb)
                return ((new_bs if new_bs else bs), gacc,
                        lacc + loss, dacc + dice), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (new_stats, gsum, lsum, dsum), _ = jax.lax.scan(
                micro, (state.batch_stats, zeros,
                        jnp.float32(0.0), jnp.float32(0.0)),
                (im, mk, jnp.arange(k)))
            grads = jax.tree_util.tree_map(lambda g: g / k, gsum)
            loss, dice = lsum / k, dsum / k
            state = state.apply_gradients(grads=grads)
            if new_stats:
                state = state.replace(batch_stats=new_stats)
            return state, {"loss": loss, "dice": dice}

        (loss, (main_logits, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, images, masks, dropout_rng
        )
        state = state.apply_gradients(grads=grads)
        if new_stats:
            state = state.replace(batch_stats=new_stats)
        dice = dice_coefficient(main_logits, masks)
        return state, {"loss": loss, "dice": dice}

    return train_step


def make_eval_step(model: ZooModel,
                   criterion: Callable = bce_with_logits) -> Callable:
    """Build the jitted eval step: ``(variables, images, masks) -> metrics``
    with ``{'loss', 'dice'}`` plus the main logits for visualization."""

    @jax.jit
    def eval_step(variables, images, masks):
        images, masks = prepare_images(images), prepare_masks(masks)
        outputs = model.module.apply(variables, images, train=False)
        loss = multi_output_loss(outputs, masks, model.loss_weight, criterion)
        dice = dice_coefficient(outputs["main"], masks)
        return {"loss": loss, "dice": dice, "main": outputs["main"]}

    return eval_step


def variables_of(state: TrainState) -> Dict[str, Any]:
    v = {"params": state.params}
    if state.batch_stats:
        v["batch_stats"] = state.batch_stats
    return v
