"""ResUnet (TPU-native rebuild of ref: unet_zoo/models/resunet.py:9-78).

3-down residual UNet built from pre-activation ResidualConv blocks and
transposed-conv upsampling.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from unet_zoo_tpu.nn import BatchNorm, ResidualConv, TransposedUp


class ResUnet(nn.Module):
    in_channels: int = 3
    num_classes: int = 1
    filters: Sequence[int] = (64, 128, 256, 512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        f = list(self.filters)

        # input stem: conv-BN-ReLU-conv + 3x3 conv skip (ref resunet.py:25-33,56)
        h = nn.Conv(f[0], (3, 3), padding=((1, 1), (1, 1)), dtype=dt)(x)
        h = BatchNorm(train, dtype=dt)(h)
        h = nn.relu(h)
        h = nn.Conv(f[0], (3, 3), padding=((1, 1), (1, 1)), dtype=dt)(h)
        x1 = h + nn.Conv(f[0], (3, 3), padding=((1, 1), (1, 1)), dtype=dt)(x)

        x2 = ResidualConv(f[1], strides=2, dtype=dt)(x1, train)
        x3 = ResidualConv(f[2], strides=2, dtype=dt)(x2, train)
        x4 = ResidualConv(f[3], strides=2, dtype=dt)(x3, train)  # bridge

        u = TransposedUp(f[2], dtype=dt)(x4)
        u = ResidualConv(f[2], dtype=dt)(jnp.concatenate([u, x3], axis=-1), train)
        u = TransposedUp(f[1], dtype=dt)(u)
        u = ResidualConv(f[1], dtype=dt)(jnp.concatenate([u, x2], axis=-1), train)
        u = TransposedUp(f[0], dtype=dt)(u)
        u = ResidualConv(f[0], dtype=dt)(jnp.concatenate([u, x1], axis=-1), train)

        out = nn.Conv(max(self.num_classes, 1), (1, 1), dtype=dt)(u)
        return {"main": out}
