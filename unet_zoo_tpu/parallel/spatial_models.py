"""Spatial (H-sharded) forwards for additional zoo topologies.

Round-3 verdict item 8: spatial sharding covered exactly one hand-built
topology (unet). This module drives ``parallel/spatial.py`` from the
*standard block vocabulary* (nn/blocks.py: DoubleConv/ConvBlock,
UpConvBlock, AttentionBlock, ResidualConv, TransposedUp, 1x1 head) —
each block gets one shard-local counterpart that walks the exact flax
parameter tree the standard model produces, so the same variables (and
checkpoints) run either placement. Eval/train share one forward per
topology; the BatchNorm behavior is injected (eval: running stats;
train: psum'd global-batch statistics, flax's exact update order — see
spatial_unet.py's derivation).

Topologies:
* ``attention_unet`` (models/attention_unet.py; ref attention_unet.py:42-110)
  — DoubleConv levels + maxpool encoder, nearest-up UpConvBlock decoder
  with additive attention gates (1x1 convs: shard-local), 1x1 head.
* ``resunet`` (models/resunet.py; ref resunet.py:9-78) — conv stem with
  conv skip, pre-act ResidualConv with stride-2 halo convs, k2s2
  TransposedUp decoder.

``unet`` stays in spatial_unet.py (round-3 original, exactness-tested);
the shared entry points there dispatch on model name.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from unet_zoo_tpu.parallel.spatial import (
    spatial_conv2d,
    spatial_conv2d_s2,
    spatial_conv_transpose2x2,
    spatial_max_pool2,
    spatial_upsample2,
    spatial_upsample4_bilinear,
)

# model name -> H divisibility requirement per shard count (2**levels of
# stride-2 downsampling each halving H_local, which must stay even;
# unet_tpu: s4 patchify stem x 3 stride-2 downs = total stride 32)
SPATIAL_TOPOLOGIES: Dict[str, int] = {
    "unet": 16,
    "attention_unet": 16,
    "resunet": 8,
    "unet_tpu": 32,
}


def bn_eval(x, p, s):
    """flax eval-mode BatchNorm; returns (y, unchanged stats)."""
    mul = p["scale"] * jax.lax.rsqrt(s["var"] + 1e-5)
    return (x - s["mean"]) * mul + p["bias"], s


def make_bn_train(axis_name: str):
    """Train-mode BN with GLOBAL batch statistics (psum over the spatial
    axis) and flax's running-average update (decay 0.9, biased var)."""

    def bn_train(x, p, s):
        n = jax.lax.axis_size(axis_name)
        cnt = x.shape[0] * x.shape[1] * x.shape[2] * n
        sm, ss = jax.lax.psum(
            (jnp.sum(x, axis=(0, 1, 2)), jnp.sum(x * x, axis=(0, 1, 2))),
            axis_name)
        mean = sm / cnt
        var = ss / cnt - mean * mean
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]
        return y, {"mean": 0.9 * s["mean"] + 0.1 * mean,
                   "var": 0.9 * s["var"] + 0.1 * var}

    return bn_train


# --------------------------------------------------------------------------
# Shard-local standard blocks. Each takes (x, params_subtree,
# stats_subtree, bn, axis) and returns (y, new_stats_subtree) with the
# same tree structure flax writes for that block.
# --------------------------------------------------------------------------


def conv_norm_act(x, p, s, bn, axis, *, act=jax.nn.relu, strides=1):
    """nn.blocks.ConvNormAct: conv(+bias) -> BN -> act."""
    cp = p["Conv_0"]
    conv = spatial_conv2d_s2 if strides == 2 else spatial_conv2d
    x = conv(x, cp["kernel"], axis_name=axis)
    if "bias" in cp:
        x = x + cp["bias"]
    x, ns = bn(x, p["BatchNorm_0"], s["BatchNorm_0"])
    if act is not None:
        x = act(x)
    return x, {"BatchNorm_0": ns}


def double_conv(x, p, s, bn, axis):
    """nn.blocks.DoubleConv (== ConvBlock): two ConvNormActs."""
    ns = {}
    for i in (0, 1):
        x, ns[f"ConvNormAct_{i}"] = conv_norm_act(
            x, p[f"ConvNormAct_{i}"], s[f"ConvNormAct_{i}"], bn, axis)
    return x, ns


def up_conv_block(x, p, s, bn, axis):
    """nn.blocks.UpConvBlock: nearest 2x upsample -> ConvNormAct."""
    x, ns = conv_norm_act(spatial_upsample2(x), p["ConvNormAct_0"],
                          s["ConvNormAct_0"], bn, axis)
    return x, {"ConvNormAct_0": ns}


def _conv1x1(x, cp):
    y = jnp.einsum("bhwc,cf->bhwf", x, cp["kernel"][0, 0])
    return y + cp["bias"] if "bias" in cp else y


def attention_gate(g, x, p, s, bn, axis):
    """models.attention_unet.AttentionBlock: psi = sigmoid(BN(conv1x1(
    relu(BN(W_g g) + BN(W_x x))))); returns (psi * x, new_stats).
    All convs are 1x1 — shard-local; only the BN stats are global."""
    g1, ns0 = bn(_conv1x1(g, p["Conv_0"]), p["BatchNorm_0"],
                 s["BatchNorm_0"])
    x1, ns1 = bn(_conv1x1(x, p["Conv_1"]), p["BatchNorm_1"],
                 s["BatchNorm_1"])
    psi = jax.nn.relu(g1 + x1)
    psi, ns2 = bn(_conv1x1(psi, p["Conv_2"]), p["BatchNorm_2"],
                  s["BatchNorm_2"])
    psi = jax.nn.sigmoid(psi)
    return psi * x, {"BatchNorm_0": ns0, "BatchNorm_1": ns1,
                     "BatchNorm_2": ns2}


def residual_conv(x, p, s, bn, axis, *, strides=1):
    """nn.blocks.ResidualConv: BN-relu-conv3x3(s)-BN-relu-conv3x3 +
    BN(conv1x1(s) skip). Convs are bias-free."""
    h, ns0 = bn(x, p["BatchNorm_0"], s["BatchNorm_0"])
    h = jax.nn.relu(h)
    conv = spatial_conv2d_s2 if strides == 2 else spatial_conv2d
    h = conv(h, p["Conv_0"]["kernel"], axis_name=axis)
    h, ns1 = bn(h, p["BatchNorm_1"], s["BatchNorm_1"])
    h = jax.nn.relu(h)
    h = spatial_conv2d(h, p["Conv_1"]["kernel"], axis_name=axis)
    skip = x[:, ::2, ::2] if strides == 2 else x
    skip = _conv1x1(skip, p["Conv_2"])
    skip, ns2 = bn(skip, p["BatchNorm_2"], s["BatchNorm_2"])
    return h + skip, {"BatchNorm_0": ns0, "BatchNorm_1": ns1,
                      "BatchNorm_2": ns2}


def transposed_up(x, p):
    """nn.blocks.TransposedUp: ConvTranspose(2,2) — shard-local."""
    ct = p["ConvTranspose_0"]
    return spatial_conv_transpose2x2(x, ct["kernel"]) + ct["bias"]


# --------------------------------------------------------------------------
# Topology forwards (mirror the flax __call__ structure exactly)
# --------------------------------------------------------------------------


def attention_unet_local(variables, x, bn, axis):
    """models/attention_unet.AttentionUNet.__call__, shard-local."""
    p, s = variables["params"], variables["batch_stats"]
    depth = sum(1 for k in p if k.startswith("conv") and k != "conv_1x1")
    new_stats: Dict[str, Any] = {}

    skips = []
    h = x
    for i in range(depth):
        if i > 0:
            h = spatial_max_pool2(h)
        h, new_stats[f"conv{i + 1}"] = double_conv(
            h, p[f"conv{i + 1}"], s[f"conv{i + 1}"], bn, axis)
        skips.append(h)

    d = skips[-1]
    for i in range(depth - 1, 0, -1):
        d, new_stats[f"up{i + 1}"] = up_conv_block(
            d, p[f"up{i + 1}"], s[f"up{i + 1}"], bn, axis)
        gated, new_stats[f"att{i + 1}"] = attention_gate(
            d, skips[i - 1], p[f"att{i + 1}"], s[f"att{i + 1}"], bn, axis)
        d = jnp.concatenate([gated, d], axis=-1)
        d, new_stats[f"upconv{i + 1}"] = double_conv(
            d, p[f"upconv{i + 1}"], s[f"upconv{i + 1}"], bn, axis)

    return _conv1x1(d, p["conv_1x1"]), new_stats


def resunet_local(variables, x, bn, axis):
    """models/resunet.ResUnet.__call__, shard-local."""
    p, s = variables["params"], variables["batch_stats"]
    new_stats: Dict[str, Any] = {}

    # stem: conv-BN-relu-conv + conv3x3 skip
    h = spatial_conv2d(x, p["Conv_0"]["kernel"], axis_name=axis)
    h = h + p["Conv_0"]["bias"]
    h, new_stats["BatchNorm_0"] = bn(h, p["BatchNorm_0"], s["BatchNorm_0"])
    h = jax.nn.relu(h)
    h = spatial_conv2d(h, p["Conv_1"]["kernel"], axis_name=axis)
    h = h + p["Conv_1"]["bias"]
    sk = spatial_conv2d(x, p["Conv_2"]["kernel"], axis_name=axis)
    x1 = h + sk + p["Conv_2"]["bias"]

    x2, new_stats["ResidualConv_0"] = residual_conv(
        x1, p["ResidualConv_0"], s["ResidualConv_0"], bn, axis, strides=2)
    x3, new_stats["ResidualConv_1"] = residual_conv(
        x2, p["ResidualConv_1"], s["ResidualConv_1"], bn, axis, strides=2)
    x4, new_stats["ResidualConv_2"] = residual_conv(
        x3, p["ResidualConv_2"], s["ResidualConv_2"], bn, axis, strides=2)

    u = transposed_up(x4, p["TransposedUp_0"])
    u, new_stats["ResidualConv_3"] = residual_conv(
        jnp.concatenate([u, x3], axis=-1), p["ResidualConv_3"],
        s["ResidualConv_3"], bn, axis)
    u = transposed_up(u, p["TransposedUp_1"])
    u, new_stats["ResidualConv_4"] = residual_conv(
        jnp.concatenate([u, x2], axis=-1), p["ResidualConv_4"],
        s["ResidualConv_4"], bn, axis)
    u = transposed_up(u, p["TransposedUp_2"])
    u, new_stats["ResidualConv_5"] = residual_conv(
        jnp.concatenate([u, x1], axis=-1), p["ResidualConv_5"],
        s["ResidualConv_5"], bn, axis)

    return _conv1x1(u, p["Conv_3"]), new_stats


def unet_tpu_local(variables, x, bn, axis):
    """models/unet_tpu.UNetTPU.__call__, shard-local (round-5 item 5).

    * s4 patchify stem: stride == kernel -> no halo (needs H_local % 4
      == 0, implied by the 32-divisibility requirement);
    * stride-2 ConvNormAct downs / DoubleConvs: halo convs;
    * nearest-up decoder: shard-local;
    * logit head: 1x1 conv ('head') or 3x3 conv + depth-to-space
      ('head_dts'), then the ONE-PASS x4 bilinear logit upsample
      (spatial_upsample4_bilinear — exact vs single-device resize).
    """
    p, s = variables["params"], variables["batch_stats"]
    n_stages = sum(1 for k in p if k.startswith("enc"))
    new_stats: Dict[str, Any] = {}

    st = p["stem"]
    h = jax.lax.conv_general_dilated(
        x, st["kernel"], window_strides=(4, 4), padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + st["bias"]
    h, new_stats["stem_bn"] = bn(h, p["stem_bn"], s["stem_bn"])
    h = jax.nn.gelu(h)

    skips = []
    for i in range(n_stages):
        h, new_stats[f"enc{i}"] = double_conv(
            h, p[f"enc{i}"], s[f"enc{i}"], bn, axis)
        skips.append(h)
        h, new_stats[f"down{i}"] = conv_norm_act(
            h, p[f"down{i}"], s[f"down{i}"], bn, axis, strides=2)

    h, new_stats["bottleneck"] = double_conv(
        h, p["bottleneck"], s["bottleneck"], bn, axis)

    for i in range(n_stages - 1, -1, -1):
        h = jnp.concatenate([spatial_upsample2(h), skips[i]], axis=-1)
        h, new_stats[f"dec{i}"] = double_conv(
            h, p[f"dec{i}"], s[f"dec{i}"], bn, axis)

    if "head_dts" in p:
        hd = spatial_conv2d(h, p["head_dts"]["kernel"], axis_name=axis)
        hd = hd + p["head_dts"]["bias"]
        b, hs, ws, chans = hd.shape
        nc = chans // 16
        hd = hd.reshape(b, hs, ws, 4, 4, nc)
        logits = hd.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, 4 * hs, 4 * ws, nc).astype(jnp.float32)
    else:
        logits = _conv1x1(h, p["head"]).astype(jnp.float32)
        logits = spatial_upsample4_bilinear(logits, axis_name=axis)
    return logits, new_stats


def get_local_forward(model_name: str) -> Callable:
    """(variables, x, bn, axis) -> (logits, new_batch_stats) for a
    supported topology (unet's lives in spatial_unet.py)."""
    if model_name == "attention_unet":
        return attention_unet_local
    if model_name == "resunet":
        return resunet_local
    if model_name == "unet_tpu":
        return unet_tpu_local
    if model_name == "unet":
        from unet_zoo_tpu.parallel.spatial_unet import unet_local_unified

        return unet_local_unified
    raise ValueError(
        f"no spatial forward for '{model_name}' "
        f"(supported: {sorted(SPATIAL_TOPOLOGIES)})")
