"""ResNet-34 encoder (NHWC) for RAUNet.

In-framework implementation of the torchvision resnet34 topology the
reference borrows (ref: unet_zoo/models/raunet.py:84-93). ``pretrained``
ImageNet weights are not available in this zero-egress environment; the
registry warns and uses random init (documented deviation).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unet_zoo_tpu.nn.blocks import BatchNorm
from unet_zoo_tpu.ops import max_pool2d


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        s = self.strides
        h = nn.Conv(self.features, (3, 3), strides=(s, s),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype)(x)
        h = BatchNorm(train, self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype)(h)
        h = BatchNorm(train, self.dtype)(h)
        if s != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=(s, s), use_bias=False,
                        dtype=self.dtype, name="downsample_conv")(x)
            x = BatchNorm(train, self.dtype, name="downsample_bn")(x)
        return nn.relu(h + x)


class ResNet34Encoder(nn.Module):
    """Returns (stem_out, e1, e2, e3, e4) feature maps at /4,/4,/8,/16,/32."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        dt = self.dtype
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=dt, name="conv1")(x)
        h = BatchNorm(train, dt, name="bn1")(h)
        h = nn.relu(h)
        h = max_pool2d(h, 3, 2, padding=1)

        feats = []
        for li, (blocks, feat, stride) in enumerate(
            [(3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2)]
        ):
            for bi in range(blocks):
                h = BasicBlock(feat, stride if bi == 0 else 1, dtype=dt,
                               name=f"layer{li + 1}_{bi}")(h, train)
            feats.append(h)
        return tuple(feats)
