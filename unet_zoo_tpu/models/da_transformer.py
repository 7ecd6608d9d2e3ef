"""DA-Transformer (TPU-native rebuild of ref: unet_zoo/models/da_transformer.py).

ResNetV2 (pre-activation, weight-standardized conv + GroupNorm) encoder and
a decoder applying dual attention per stage: PAM position attention at a
pooled resolution (64x64 / 32x32) and CAM channel attention, with
zero-init gamma residuals.

Design notes vs the reference:
* The reference hard-codes the final upsample to (512, 512) (ref :333), so
  it only works at 512 input; here the final upsample targets the actual
  input resolution (identical behavior at 512).
* ``DANetHead`` (ref :216-267) is dead code in the reference ("provided in
  the snippet", never wired into DA_Transformer); reproduced here as
  :class:`DANetHead` for component completeness.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet_zoo_tpu.nn import DoubleConv
from unet_zoo_tpu.ops import (
    adaptive_avg_pool2d,
    max_pool2d,
    pad_to_match,
    resize_bilinear,
)


def get_da_transformer_config() -> Dict[str, Any]:
    """Default config (ref :11-39), as a plain dict."""
    return {
        "patches": {"size": (16, 16), "grid": (16, 16)},
        "hidden_size": 768,
        "transformer": {
            "mlp_dim": 3072,
            "num_heads": 12,
            "num_layers": 12,
            "attention_dropout_rate": 0.0,
            "dropout_rate": 0.1,
        },
        "classifier": "seg",
        "representation_size": None,
        "resnet_pretrained_path": None,
        "pretrained_path": None,
        "patch_size": 16,
        "resnet": {"num_layers": (3, 4, 9), "width_factor": 1},
        "decoder_channels": (256, 128, 64, 16),
        "skip_channels": [512, 256, 64, 16],
        "n_classes": 2,
        "n_skip": 3,
        "activation": "softmax",
    }


class StdConv(nn.Module):
    """Weight-standardized conv (ref StdConv2d :47-54): kernel normalized
    per output channel before the conv."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features), jnp.float32,
        )
        m = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        v = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - m) * jax.lax.rsqrt(v + 1e-5)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(self.strides, self.strides),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32).astype(self.dtype)
        return y


def _gn(groups, dt, name=None, eps=1e-6):
    return nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=dt, name=name)


class PreActBottleneck(nn.Module):
    """Pre-activation v2 bottleneck (ref :64-96)."""

    cout: int
    cmid: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = self.dtype
        residual = x
        if self.strides != 1 or x.shape[-1] != self.cout:
            residual = StdConv(self.cout, 1, self.strides, 0, dtype=dt,
                               name="downsample")(x)
            residual = _gn(self.cout, dt, "gn_proj", eps=1e-5)(residual)
        y = nn.relu(_gn(32, dt, "gn1")(StdConv(self.cmid, 1, 1, 0, dtype=dt,
                                               name="conv1")(x)))
        y = nn.relu(_gn(32, dt, "gn2")(StdConv(self.cmid, 3, self.strides, 1,
                                               dtype=dt, name="conv2")(y)))
        y = _gn(32, dt, "gn3")(StdConv(self.cout, 1, 1, 0, dtype=dt,
                                       name="conv3")(y))
        return nn.relu(residual + y)


class ResNetV2(nn.Module):
    """3-block ResNetV2 returning (deepest, [e3, e2, e1, stem_pooled])
    (ref :98-137). Root maxpool uses padding 0, so skips are 127-sized at
    512 input — reproduced exactly."""

    block_units: Sequence[int] = (3, 4, 9)
    width_factor: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, list]:
        dt = self.dtype
        width = int(64 * self.width_factor)
        h = StdConv(width, 7, 2, 3, dtype=dt, name="root_conv")(x)
        h = nn.relu(_gn(32, dt, "root_gn")(h))
        h = max_pool2d(h, 3, 2, padding=0)
        stem = h
        e = []
        for bi, (units, cout, cmid) in enumerate([
            (self.block_units[0], width * 4, width),
            (self.block_units[1], width * 8, width * 2),
            (self.block_units[2], width * 16, width * 4),
        ]):
            for ui in range(units):
                stride = 2 if (bi > 0 and ui == 0) else 1
                h = PreActBottleneck(cout, cmid, stride, dtype=dt,
                                     name=f"block{bi + 1}_unit{ui + 1}")(h)
            e.append(h)
        return e[2], [e[2], e[1], e[0], stem]


class DAPam(nn.Module):
    """Position attention at pooled resolution (ref :139-177)."""

    attn_res: Tuple[int, int] = (64, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = self.dtype
        b, h, w, c = x.shape
        ra, rb = self.attn_res
        q = adaptive_avg_pool2d(nn.Conv(c // 8, (1, 1), dtype=dt,
                                        name="query_conv")(x), self.attn_res)
        k = adaptive_avg_pool2d(nn.Conv(c // 8, (1, 1), dtype=dt,
                                        name="key_conv")(x), self.attn_res)
        v = adaptive_avg_pool2d(nn.Conv(c, (1, 1), dtype=dt,
                                        name="value_conv")(x), self.attn_res)
        qf = q.reshape(b, ra * rb, c // 8)
        kf = k.reshape(b, ra * rb, c // 8)
        vf = v.reshape(b, ra * rb, c)
        attn = nn.softmax(jnp.einsum("bqd,bkd->bqk", qf, kf), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, vf).reshape(b, ra, rb, c)
        out = resize_bilinear(out, (h, w), align_corners=True)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma.astype(x.dtype) * out + x


class DACam(nn.Module):
    """Channel attention with max-subtracted energy (ref :179-206)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        flat = x.reshape(b, h * w, c)
        energy = jnp.einsum("bnc,bnd->bcd", flat, flat)
        energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = nn.softmax(energy_new, axis=-1)
        out = jnp.einsum("bcd,bnd->bnc", attn, flat).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma.astype(x.dtype) * out + x


class DANetHead(nn.Module):
    """Classic DANet head: parallel PAM/CAM branches over 3x3-conv-reduced
    features, fused by addition (ref :216-267 — dead code there; kept for
    component completeness). The reference's ``norm(planes)`` is BatchNorm
    with momentum 0.95 / eps 1e-3 (ref :208-211).
    """

    out_channels: int
    attn_res: Tuple[int, int] = (64, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_aux: bool = False):
        dt = self.dtype
        inter = x.shape[-1] // 16

        def conv_bn_relu(z, feats, name):
            z = nn.Conv(feats, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=dt, name=f"{name}_conv")(z)
            z = nn.BatchNorm(use_running_average=not train, momentum=0.05,
                             epsilon=1e-3, dtype=dt, name=f"{name}_bn")(z)
            return nn.relu(z)

        def head(z, name):
            z = nn.Dropout(0.05, deterministic=not train)(z)
            z = nn.Conv(self.out_channels, (1, 1), dtype=dt, name=name)(z)
            return nn.relu(z)

        feat1 = conv_bn_relu(x, inter, "conv5a")
        sa_conv = conv_bn_relu(
            DAPam(self.attn_res, dtype=dt, name="sa")(feat1), inter, "conv51")

        feat2 = conv_bn_relu(x, inter, "conv5c")
        sc_conv = conv_bn_relu(
            DACam(dtype=dt, name="sc")(feat2), inter, "conv52")

        sasc_output = head(sa_conv + sc_conv, "conv8")
        # The ref constructs conv6/conv7 unconditionally (and computes but
        # discards the branch heads); declare them always so the parameter
        # surface does not depend on the call flag — variables from a
        # default init apply cleanly with return_aux=True.
        sa_output = head(sa_conv, "conv6")
        sc_output = head(sc_conv, "conv7")
        if return_aux:
            return sasc_output, sa_output, sc_output
        return sasc_output


class UpSampleDA(nn.Module):
    """ConvTranspose up + 1x1 skip proj + pad/crop-to-skip + DoubleConv
    (ref :269-297)."""

    out_channels: int
    up_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        x = nn.ConvTranspose(self.up_channels, (2, 2), strides=(2, 2),
                             padding="VALID", dtype=dt, name="up")(x)
        skip = nn.Conv(self.up_channels, (1, 1), dtype=dt, name="skip_conv")(skip)
        x = pad_to_match(x, (skip.shape[1], skip.shape[2]))
        return DoubleConv(self.out_channels, dtype=dt, name="conv")(
            jnp.concatenate([x, skip], axis=-1), train)


class DATransformer(nn.Module):
    in_channels: int = 3
    num_classes: int = 1
    block_units: Sequence[int] = (3, 4, 9)
    width_factor: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        in_h, in_w = x.shape[1], x.shape[2]

        deepest, skips = ResNetV2(self.block_units, self.width_factor,
                                  dtype=dt, name="resnet")(x)
        h = DoubleConv(1024, dtype=dt, name="bottleneck")(deepest, train)

        h = UpSampleDA(512, 512, dtype=dt, name="up_block1")(h, skips[0], train)
        h = DAPam((64, 64), dtype=dt, name="pam1")(h)
        h = DACam(dtype=dt, name="cam1")(h)
        h = UpSampleDA(256, 256, dtype=dt, name="up_block2")(h, skips[1], train)
        h = DAPam((64, 64), dtype=dt, name="pam2")(h)
        h = DACam(dtype=dt, name="cam2")(h)
        h = UpSampleDA(128, 128, dtype=dt, name="up_block3")(h, skips[2], train)
        h = DAPam((32, 32), dtype=dt, name="pam3")(h)
        h = DACam(dtype=dt, name="cam3")(h)
        h = UpSampleDA(64, 64, dtype=dt, name="up_block4")(h, skips[3], train)

        h = resize_bilinear(h, (h.shape[1] * 2, h.shape[2] * 2), align_corners=True)
        h = nn.relu(nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                            name="up_block5_conv")(h))
        h = resize_bilinear(h, (h.shape[1] * 2, h.shape[2] * 2), align_corners=True)
        h = nn.relu(nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                            name="up_block6_conv")(h))
        h = resize_bilinear(h, (in_h, in_w), align_corners=True)
        return {"main": nn.Conv(self.num_classes, (1, 1), dtype=dt,
                                name="outc")(h)}
