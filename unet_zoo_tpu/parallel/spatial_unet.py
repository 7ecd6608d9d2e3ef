"""Full `unet` forward under spatial (H-dim) sharding.

SURVEY.md §5's "images beyond one chip" capability, applied to a real zoo
member: the classic UNet topology (ref: unet_zoo/models/unet.py:29-44)
runs with its input image sharded along H over the mesh's ``data`` axis.
Every 3x3 conv performs a 1-row halo exchange over ICI
(``parallel/spatial.py``); the 2x2 maxpools, ConvTranspose(2,2) ups,
concats and the 1x1 head are shard-local, so the only cross-chip traffic
is the halo rows — O(W * C) per conv versus O(H * W * C) activations.

Works from the *standard* flax `UNet` variables (eval mode, running-stats
BatchNorm applied in flax's exact `(x - mean) * (gamma * rsqrt(var+eps))
+ beta` order, so results match `UNet.apply(train=False)` to float
round-off). H_local must stay even through 4 pool levels: H must be
divisible by 16 * n_shards.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unet_zoo_tpu.parallel.spatial import (
    halo_exchange_h,
    spatial_conv2d,
    spatial_conv_transpose2x2,
    spatial_max_pool2,
    spatial_sharding,
)


# Topologies the halo-exchange fwd/train steps cover (YAML:
# gpu.multi_gpu_strategy = spatial): name -> H divisibility requirement
# per shard. unet's forward lives here (round-3 original);
# attention_unet/resunet in spatial_models.py share the same block
# vocabulary.
from unet_zoo_tpu.parallel.spatial_models import (  # noqa: E402
    SPATIAL_TOPOLOGIES,
    bn_eval,
    get_local_forward,
    make_bn_train,
)


def unet_local_unified(variables: Dict[str, Any], x: jnp.ndarray,
                       bn, axis_name: str = "data"):
    """unet forward in the unified (variables, x, bn, axis) ->
    (logits, new_stats) contract of spatial_models.get_local_forward."""
    from unet_zoo_tpu.parallel.spatial_models import (
        _conv1x1,
        double_conv,
        transposed_up,
    )

    p, s = variables["params"], variables["batch_stats"]
    new_stats: Dict[str, Any] = {}
    skips = []
    for i in range(4):
        x, ns = double_conv(x, p[f"DownSample_{i}"]["DoubleConv_0"],
                            s[f"DownSample_{i}"]["DoubleConv_0"], bn,
                            axis_name)
        new_stats[f"DownSample_{i}"] = {"DoubleConv_0": ns}
        skips.append(x)
        x = spatial_max_pool2(x)

    x, new_stats["DoubleConv_0"] = double_conv(
        x, p["DoubleConv_0"], s["DoubleConv_0"], bn, axis_name)

    for i in range(4):
        up = p[f"UpSampleUNet_{i}"]
        x = transposed_up(x, up["TransposedUp_0"])
        x = jnp.concatenate([x, skips[3 - i]], axis=-1)
        x, ns = double_conv(x, up["DoubleConv_0"],
                            s[f"UpSampleUNet_{i}"]["DoubleConv_0"], bn,
                            axis_name)
        new_stats[f"UpSampleUNet_{i}"] = {"DoubleConv_0": ns}

    return _conv1x1(x, p["OutConv_0"]["Conv_0"]), new_stats


def _bn_eval(x, bn_params, bn_stats):
    # flax BatchNorm eval-mode order, replicated exactly:
    # y = (x - mean) * (scale * rsqrt(var + eps)) + bias
    mul = bn_params["scale"] * jax.lax.rsqrt(bn_stats["var"] + 1e-5)
    return (x - bn_stats["mean"]) * mul + bn_params["bias"]


def _double_conv(x, params, stats, axis_name):
    for i in (0, 1):
        cna_p = params[f"ConvNormAct_{i}"]
        cna_s = stats[f"ConvNormAct_{i}"]
        x = spatial_conv2d(x, cna_p["Conv_0"]["kernel"], padding=1,
                           axis_name=axis_name)
        x = x + cna_p["Conv_0"]["bias"]
        x = _bn_eval(x, cna_p["BatchNorm_0"], cna_s["BatchNorm_0"])
        x = jax.nn.relu(x)
    return x


def unet_forward_local(variables: Dict[str, Any], x: jnp.ndarray,
                       axis_name: str = "data") -> jnp.ndarray:
    """Shard-local UNet forward on [B, H_local, W, C] blocks (call under
    shard_map; see `spatial_unet_apply`)."""
    p, s = variables["params"], variables["batch_stats"]

    skips = []
    for i in range(4):
        dp = p[f"DownSample_{i}"]["DoubleConv_0"]
        ds = s[f"DownSample_{i}"]["DoubleConv_0"]
        x = _double_conv(x, dp, ds, axis_name)
        skips.append(x)
        x = spatial_max_pool2(x)

    x = _double_conv(x, p["DoubleConv_0"], s["DoubleConv_0"], axis_name)

    for i in range(4):
        up = p[f"UpSampleUNet_{i}"]
        us = s[f"UpSampleUNet_{i}"]
        ct = up["TransposedUp_0"]["ConvTranspose_0"]
        x = spatial_conv_transpose2x2(x, ct["kernel"]) + ct["bias"]
        x = jnp.concatenate([x, skips[3 - i]], axis=-1)
        x = _double_conv(x, up["DoubleConv_0"], us["DoubleConv_0"],
                         axis_name)

    oc = p["OutConv_0"]["Conv_0"]
    w = oc["kernel"][0, 0]
    return jnp.einsum("bhwc,cf->bhwf", x, w) + oc["bias"]


def spatial_unet_apply(mesh: Mesh, variables: Dict[str, Any],
                       axis_name: str = "data"):
    """Build a jitted fn(x_global) -> logits running the full unet with
    H sharded over `axis_name`. x_global: [B, H, W, 3] with H divisible
    by 16 * mesh shard count."""
    from jax import shard_map

    spec = P(None, axis_name, None, None)

    def fn(x):
        return unet_forward_local(variables, x, axis_name)

    mapped = shard_map(fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
                       check_vma=False)

    def run(x_global):
        x_global = jax.device_put(
            x_global, NamedSharding(mesh, spec))
        return jax.jit(mapped)(x_global)

    return run


# ---------------------------------------------------------------------------
# Training under spatial sharding
#
# Train-mode BatchNorm must normalize with statistics over the GLOBAL
# (B, H, W) extent — each shard only sees an H slice, so local sums are
# psum'd over the spatial axis before normalizing. The running-average
# update replicates flax's exact semantics (biased batch variance for
# both the normalization and the running update, decay 0.9 == torch
# momentum 0.1), so one spatially-sharded step matches the standard
# single-device `make_train_step` bit-for-bit up to reduction order.
#
# Gradients: the forward crosses shards through `ppermute` halos, whose
# VJP is the inverse permute — differentiating the *local* mean loss
# inside shard_map therefore yields, on shard i, the partial of the
# summed per-shard losses through every use on shard i; `pmean` of those
# partials is exactly the gradient of the global mean loss.
# ---------------------------------------------------------------------------


def _bn_train(x, bn_params, bn_stats, axis_name):
    """Train-mode BatchNorm on an H-sharded block with GLOBAL batch
    statistics (psum over the spatial axis). Returns (y, new_stats)."""
    n = jax.lax.axis_size(axis_name)
    cnt = x.shape[0] * x.shape[1] * x.shape[2] * n
    s, ss = jax.lax.psum(
        (jnp.sum(x, axis=(0, 1, 2)), jnp.sum(x * x, axis=(0, 1, 2))),
        axis_name)
    mean = s / cnt
    var = ss / cnt - mean * mean
    y = (x - mean) * jax.lax.rsqrt(var + 1e-5) * bn_params["scale"] \
        + bn_params["bias"]
    new_stats = {"mean": 0.9 * bn_stats["mean"] + 0.1 * mean,
                 "var": 0.9 * bn_stats["var"] + 0.1 * var}
    return y, new_stats


def _double_conv_train(x, params, stats, axis_name):
    new_stats = {}
    for i in (0, 1):
        cna_p = params[f"ConvNormAct_{i}"]
        cna_s = stats[f"ConvNormAct_{i}"]
        x = spatial_conv2d(x, cna_p["Conv_0"]["kernel"], padding=1,
                           axis_name=axis_name)
        x = x + cna_p["Conv_0"]["bias"]
        x, ns = _bn_train(x, cna_p["BatchNorm_0"], cna_s["BatchNorm_0"],
                          axis_name)
        new_stats[f"ConvNormAct_{i}"] = {"BatchNorm_0": ns}
        x = jax.nn.relu(x)
    return x, new_stats


def unet_forward_local_train(variables: Dict[str, Any], x: jnp.ndarray,
                             axis_name: str = "data"):
    """Shard-local train-mode UNet forward on [B, H_local, W, C] blocks.

    Returns (logits, new_batch_stats) with the same tree structure as
    ``variables['batch_stats']``; the psum'd statistics are identical on
    every shard, so the returned stats are replicated."""
    p, s = variables["params"], variables["batch_stats"]
    new_stats: Dict[str, Any] = {}

    skips = []
    for i in range(4):
        dp = p[f"DownSample_{i}"]["DoubleConv_0"]
        ds = s[f"DownSample_{i}"]["DoubleConv_0"]
        x, ns = _double_conv_train(x, dp, ds, axis_name)
        new_stats[f"DownSample_{i}"] = {"DoubleConv_0": ns}
        skips.append(x)
        x = spatial_max_pool2(x)

    x, ns = _double_conv_train(x, p["DoubleConv_0"], s["DoubleConv_0"],
                               axis_name)
    new_stats["DoubleConv_0"] = ns

    for i in range(4):
        up = p[f"UpSampleUNet_{i}"]
        us = s[f"UpSampleUNet_{i}"]
        ct = up["TransposedUp_0"]["ConvTranspose_0"]
        x = spatial_conv_transpose2x2(x, ct["kernel"]) + ct["bias"]
        x = jnp.concatenate([x, skips[3 - i]], axis=-1)
        x, ns = _double_conv_train(x, up["DoubleConv_0"], us["DoubleConv_0"],
                                   axis_name)
        new_stats[f"UpSampleUNet_{i}"] = {"DoubleConv_0": ns}

    oc = p["OutConv_0"]["Conv_0"]
    w = oc["kernel"][0, 0]
    return jnp.einsum("bhwc,cf->bhwf", x, w) + oc["bias"], new_stats


def make_spatial_train_step(mesh: Mesh, axis_name: str = "data",
                            model_name: str = "unet"):
    """Full spatially-sharded TRAIN step for a supported topology
    (SPATIAL_TOPOLOGIES; default unet).

    ``step(state, images, masks) -> (state, metrics)`` with images/masks
    H-sharded over the mesh (``P(None, axis, None, None)``) and the
    TrainState replicated: halo-exchange forward, global-batch-stat BN,
    exact gradients through the `ppermute` halos, global-norm clip +
    AdamW via ``state.tx``, and globally-reduced loss/Dice — training
    "images beyond one chip" (SURVEY §5), not just inference.
    """
    from jax import shard_map

    from unet_zoo_tpu.data.datasets import prepare_images, prepare_masks
    from unet_zoo_tpu.train.losses import bce_with_logits

    spec = P(None, axis_name, None, None)

    fwd = get_local_forward(model_name)
    bn_train = make_bn_train(axis_name)

    def per_device(state, images, masks):
        images, masks = prepare_images(images), prepare_masks(masks)

        def loss_fn(params):
            logits, new_stats = fwd(
                {"params": params, "batch_stats": state.batch_stats},
                images, bn_train, axis_name)
            return bce_with_logits(logits, masks), (logits, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)

        # Dice with global sums (the shard-local ratio would be wrong)
        pred = (jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5
                ).astype(jnp.float32)
        tgt = masks.astype(jnp.float32)
        inter, psum_pred, psum_tgt = jax.lax.psum(
            (jnp.sum(pred * tgt), jnp.sum(pred), jnp.sum(tgt)), axis_name)
        union = psum_pred + psum_tgt
        dice = jnp.where(union == 0, jnp.float32(1.0),
                         (2.0 * inter + 1e-7) / (union + 1e-7))

        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        return state, {"loss": loss, "dice": dice}

    mapped = shard_map(per_device, mesh=mesh,
                       in_specs=(P(), spec, spec), out_specs=(P(), P()),
                       check_vma=False)
    return jax.jit(mapped)


def make_spatial_eval_step(mesh: Mesh, axis_name: str = "data",
                           model_name: str = "unet"):
    """Spatially-sharded unet EVAL step with the standard eval-step
    contract ``(variables, images, masks) -> {'loss','dice','main'}``
    (train/steps.py:make_eval_step), so `validate_one_epoch` and the
    evaluation scripts drive it unchanged. Images/masks H-sharded,
    variables replicated; loss/Dice reduced globally."""
    from jax import shard_map

    from unet_zoo_tpu.data.datasets import prepare_images, prepare_masks
    from unet_zoo_tpu.train.losses import bce_with_logits

    spec = P(None, axis_name, None, None)

    fwd = get_local_forward(model_name)

    def per_device(variables, images, masks):
        images, masks = prepare_images(images), prepare_masks(masks)
        logits, _ = fwd(variables, images, bn_eval, axis_name)
        loss = jax.lax.pmean(bce_with_logits(logits, masks), axis_name)
        pred = (jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5
                ).astype(jnp.float32)
        tgt = masks.astype(jnp.float32)
        inter, psum_pred, psum_tgt = jax.lax.psum(
            (jnp.sum(pred * tgt), jnp.sum(pred), jnp.sum(tgt)), axis_name)
        union = psum_pred + psum_tgt
        dice = jnp.where(union == 0, jnp.float32(1.0),
                         (2.0 * inter + 1e-7) / (union + 1e-7))
        return {"loss": loss, "dice": dice, "main": logits}

    mapped = shard_map(per_device, mesh=mesh,
                       in_specs=(P(), spec, spec),
                       out_specs={"loss": P(), "dice": P(), "main": spec},
                       check_vma=False)
    return jax.jit(mapped)
