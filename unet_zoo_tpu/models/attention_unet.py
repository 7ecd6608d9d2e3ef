"""Attention UNet (TPU-native rebuild of ref: unet_zoo/models/attention_unet.py).

5-level UNet with additive attention gates on the skip connections:
psi = sigmoid(BN(conv1x1(relu(W_g g + W_x x)))) gates the skip feature.
The reference accepts a ``depth`` kwarg but its topology is fixed at 5
levels (ref: models/__init__.py:101-104, quirk Q7); here ``depth`` is real
and parameterizes the number of levels (5 reproduces the reference).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from unet_zoo_tpu.nn import BatchNorm, ConvBlock, UpConvBlock
from unet_zoo_tpu.ops import max_pool2d


class AttentionBlock(nn.Module):
    """Additive attention gate (ref: unet_zoo/models/attention_unet.py:6-40)."""

    f_int: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, g: jnp.ndarray, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        g1 = nn.Conv(self.f_int, (1, 1), dtype=self.dtype)(g)
        g1 = BatchNorm(train, dtype=self.dtype)(g1)
        x1 = nn.Conv(self.f_int, (1, 1), dtype=self.dtype)(x)
        x1 = BatchNorm(train, dtype=self.dtype)(x1)
        psi = nn.relu(g1 + x1)
        psi = nn.Conv(1, (1, 1), dtype=self.dtype)(psi)
        psi = BatchNorm(train, dtype=self.dtype)(psi)
        psi = nn.sigmoid(psi)
        return psi * x


class AttentionUNet(nn.Module):
    in_channels: int = 3
    num_classes: int = 1
    depth: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        chans = [64 * (2 ** i) for i in range(self.depth)]  # [64,...,1024] at depth 5

        skips = []
        h = x
        for i, ch in enumerate(chans):
            if i > 0:
                h = max_pool2d(h, 2)
            h = ConvBlock(ch, dtype=dt, name=f"conv{i + 1}")(h, train)
            skips.append(h)

        d = skips[-1]
        for i in range(self.depth - 1, 0, -1):
            ch = chans[i - 1]
            d = UpConvBlock(ch, dtype=dt, name=f"up{i + 1}")(d, train)
            gated = AttentionBlock(ch // 2, dtype=dt, name=f"att{i + 1}")(d, skips[i - 1], train)
            d = jnp.concatenate([gated, d], axis=-1)
            d = ConvBlock(ch, dtype=dt, name=f"upconv{i + 1}")(d, train)

        out = nn.Conv(self.num_classes, (1, 1), dtype=dt, name="conv_1x1")(d)
        return {"main": out}
