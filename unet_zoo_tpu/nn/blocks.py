"""Shared encoder/decoder blocks (NHWC, Flax linen).

TPU-native equivalents of the reference's `common_layers.py`
(ref: unet_zoo/models/common_layers.py). Differences by design:

* NHWC layout (TPU-native) instead of NCHW.
* Explicit ``train: bool`` + batch-stats collections instead of
  module-mode mutation.
* Strided/padded convs always use explicit numeric padding so sampling
  positions match PyTorch (XLA 'SAME' pads asymmetrically for stride>1).
* Conv→BN→ReLU chains are left as separate XLA ops: XLA fuses the BN
  scale/shift + ReLU into the conv epilogue on TPU; a Pallas path covers
  the cases XLA misses (see unet_zoo_tpu/ops/pallas/).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unet_zoo_tpu.ops import (
    max_pool2d,
    pad_to_match,
    resize_bilinear,
    upsample2x_nearest,
)

Dtype = Any


def BatchNorm(train: bool, dtype: Dtype = jnp.float32, name: Optional[str] = None,
              use_scale: bool = True, use_bias: bool = True) -> nn.BatchNorm:
    """BatchNorm with PyTorch-default semantics (momentum 0.1, eps 1e-5).

    Flax's ``momentum`` is the decay of the running average, i.e.
    ``1 - torch_momentum``.
    """
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
        use_scale=use_scale,
        use_bias=use_bias,
    )


class ConvNormAct(nn.Module):
    """conv(k,s,p) → BatchNorm → activation. The zoo's most common micro-block."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    use_bias: bool = True
    act: Optional[Callable] = nn.relu
    feature_group_count: int = 1
    kernel_dilation: int = 1
    bn_affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.padding
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=((p, p), (p, p)),
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_dilation=(self.kernel_dilation, self.kernel_dilation),
            dtype=self.dtype,
        )(x)
        x = BatchNorm(train, dtype=self.dtype,
                      use_scale=self.bn_affine, use_bias=self.bn_affine)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class DoubleConv(nn.Module):
    """(conv3x3 → BN → ReLU) × 2 (ref: unet_zoo/models/common_layers.py:20-37)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvNormAct(self.features, dtype=self.dtype)(x, train)
        x = ConvNormAct(self.features, dtype=self.dtype)(x, train)
        return x


# The reference's ConvBlock (common_layers.py:39-61) is topologically identical.
ConvBlock = DoubleConv


class DoubleConvMid(nn.Module):
    """(conv→BN→ReLU)×2 with a distinct mid-channel width
    (ref: unet_zoo/models/common_layers.py:130-146)."""

    features: int
    mid_features: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mid = self.mid_features if self.mid_features is not None else self.features
        x = ConvNormAct(mid, dtype=self.dtype)(x, train)
        x = ConvNormAct(self.features, dtype=self.dtype)(x, train)
        return x


class DownSample(nn.Module):
    """UNet encoder stage: DoubleConv then 2x2 maxpool; returns (skip, pooled)
    (ref: unet_zoo/models/common_layers.py:82-95)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        down = DoubleConv(self.features, dtype=self.dtype)(x, train)
        return down, max_pool2d(down, 2)


class Down(nn.Module):
    """maxpool → DoubleConvMid (ref: unet_zoo/models/common_layers.py:148-158)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return DoubleConvMid(self.features, dtype=self.dtype)(max_pool2d(x, 2), train)


class TransposedUp(nn.Module):
    """ConvTranspose2d(kernel, stride) upsampling
    (ref: unet_zoo/models/common_layers.py:201-207)."""

    features: int
    kernel_size: int = 2
    strides: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.ConvTranspose(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="VALID",
            dtype=self.dtype,
        )(x)


class UpSampleUNet(nn.Module):
    """ConvTranspose(2,2) → pad-to-skip → concat[x, skip] → DoubleConv
    (ref: unet_zoo/models/common_layers.py:97-116)."""

    features: int
    up_features: int  # = in_channels // 2 in the reference
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = TransposedUp(self.up_features, dtype=self.dtype)(x)
        x = pad_to_match(x, (skip.shape[1], skip.shape[2]))
        x = jnp.concatenate([x, skip], axis=-1)
        return DoubleConv(self.features, dtype=self.dtype)(x, train)


class UpBilinear(nn.Module):
    """bilinear(x2, align_corners) → pad → concat[skip, x] → DoubleConvMid(mid=in//2)
    (ref: unet_zoo/models/common_layers.py:160-180, bilinear branch)."""

    features: int
    mid_features: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=True)
        x = pad_to_match(x, (skip.shape[1], skip.shape[2]))
        x = jnp.concatenate([skip, x], axis=-1)
        return DoubleConvMid(self.features, self.mid_features, dtype=self.dtype)(x, train)


class UpConvBlock(nn.Module):
    """nearest 2x upsample → conv3x3 → BN → ReLU
    (ref: unet_zoo/models/common_layers.py:63-80)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return ConvNormAct(self.features, dtype=self.dtype)(upsample2x_nearest(x), train)


class OutConv(nn.Module):
    """1x1 output head (ref: unet_zoo/models/common_layers.py:118-128)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)


class ResidualConv(nn.Module):
    """Pre-act residual block of ResUnet
    (ref: unet_zoo/models/common_layers.py:182-199)."""

    features: int
    strides: int = 1
    padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p, s = self.padding, self.strides
        h = BatchNorm(train, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), strides=(s, s), padding=((p, p), (p, p)),
                    use_bias=False, dtype=self.dtype)(h)
        h = BatchNorm(train, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype)(h)
        skip = nn.Conv(self.features, (1, 1), strides=(s, s), use_bias=False,
                       dtype=self.dtype)(x)
        skip = BatchNorm(train, dtype=self.dtype)(skip)
        return h + skip
