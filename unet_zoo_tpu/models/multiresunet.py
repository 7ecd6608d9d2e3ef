"""MultiResUNet (TPU-native rebuild of ref: unet_zoo/models/multiresunet.py).

MultiRes blocks (3x3→5x5→7x7 conv chain via stacked 3x3s + 1x1 residual,
alpha=1.67 filter derivation) and ResPaths on the skip connections.

Fidelity notes: all BatchNorms are affine=False (ref :22,67,104,113), and
the reference applies the *same* BN instance twice inside
``Multiresblock.forward`` (ref :77-82) — reproduced here by invoking one
shared BatchNorm module twice (shared stats, double running-stat update in
train mode).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from unet_zoo_tpu.nn import BatchNorm, ConvNormAct, TransposedUp
from unet_zoo_tpu.ops import max_pool2d

ALPHA = 1.67


def _mrb_widths(unet_filters: int) -> tuple[int, int, int]:
    w = int(unet_filters * ALPHA)
    return int(w * 0.167), int(w * 0.333), int(w * 0.5)


def mrb_out_channels(unet_filters: int) -> int:
    return sum(_mrb_widths(unet_filters))


class MultiResBlock(nn.Module):
    unet_filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        f3, f5, f7 = _mrb_widths(self.unet_filters)
        total = f3 + f5 + f7

        shortcut = ConvNormAct(total, kernel_size=1, padding=0, act=None,
                               bn_affine=False, dtype=dt)(x, train)
        a = ConvNormAct(f3, bn_affine=False, dtype=dt)(x, train)
        b = ConvNormAct(f5, bn_affine=False, dtype=dt)(a, train)
        c = ConvNormAct(f7, bn_affine=False, dtype=dt)(b, train)

        h = jnp.concatenate([a, b, c], axis=-1)
        # one shared BN applied twice, as the reference does (ref :77-82)
        shared_bn = BatchNorm(train, dtype=dt, use_scale=False, use_bias=False,
                              name="shared_bn")
        h = shared_bn(h)
        h = nn.relu(h + shortcut)
        return shared_bn(h)


class ResPath(nn.Module):
    filters: int
    length: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        shortcut = ConvNormAct(self.filters, kernel_size=1, padding=0, act=None,
                               bn_affine=False, dtype=dt)(x, train)
        h = ConvNormAct(self.filters, bn_affine=False, dtype=dt)(x, train)
        h = nn.relu(h + shortcut)
        h = BatchNorm(train, dtype=dt, use_scale=False, use_bias=False)(h)
        for _ in range(self.length - 1):
            shortcut = ConvNormAct(self.filters, kernel_size=1, padding=0,
                                   act=None, bn_affine=False, dtype=dt)(h, train)
            g = ConvNormAct(self.filters, bn_affine=False, dtype=dt)(h, train)
            h = nn.relu(g + shortcut)
            h = BatchNorm(train, dtype=dt, use_scale=False, use_bias=False)(h)
        return h


class MultiResUnet(nn.Module):
    in_channels: int = 3
    num_classes: int = 1
    filters: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        f = self.filters

        skips = []
        h = x
        for i, (mult, path_len) in enumerate(zip((1, 2, 4, 8), (4, 3, 2, 1))):
            h = MultiResBlock(f * mult, dtype=dt, name=f"mrb{i + 1}")(h, train)
            skips.append(ResPath(f * mult, path_len, dtype=dt,
                                 name=f"respath{i + 1}")(h, train))
            h = max_pool2d(h, 2)

        h = MultiResBlock(f * 16, dtype=dt, name="mrb5")(h, train)

        for i, mult in enumerate((8, 4, 2, 1)):
            up = TransposedUp(f * mult, dtype=dt, name=f"up{6 + i}")(h)
            h = MultiResBlock(f * mult, dtype=dt, name=f"mrb{6 + i}")(
                jnp.concatenate([up, skips[3 - i]], axis=-1), train
            )

        out = ConvNormAct(self.num_classes, kernel_size=1, padding=0, act=None,
                          bn_affine=False, dtype=dt, name="conv_final")(h, train)
        return {"main": out}
