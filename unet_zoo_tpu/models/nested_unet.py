"""UNet++ / NestedUNet (TPU-native rebuild of ref: unet_zoo/models/nested_unet.py).

Dense nested skip pathways over VGG-style double-conv units, bilinear
(align_corners=True) upsampling, optional 4-head deep supervision.

Output protocol: ``{'main': x0_4 head}``; with deep supervision the three
shallower heads become ``side1..side3`` (the reference returns a raw list
and its trainer cannot consume it — quirk Q4 in SURVEY.md — here the
unified protocol makes deep supervision trainable).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from unet_zoo_tpu.nn import DoubleConvMid
from unet_zoo_tpu.ops import max_pool2d, resize_bilinear


def _up2(x: jnp.ndarray) -> jnp.ndarray:
    return resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=True)


class NestedUNet(nn.Module):
    in_channels: int = 3
    num_classes: int = 1
    deep_supervision: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        nb = [32, 64, 128, 256, 512]

        def block(mid: int, out: int, name: str):
            return DoubleConvMid(out, mid, dtype=dt, name=name)

        x0_0 = block(nb[0], nb[0], "conv0_0")(x, train)
        x1_0 = block(nb[1], nb[1], "conv1_0")(max_pool2d(x0_0, 2), train)
        x2_0 = block(nb[2], nb[2], "conv2_0")(max_pool2d(x1_0, 2), train)
        x3_0 = block(nb[3], nb[3], "conv3_0")(max_pool2d(x2_0, 2), train)
        x4_0 = block(nb[4], nb[4], "conv4_0")(max_pool2d(x3_0, 2), train)

        cat = lambda *xs: jnp.concatenate(xs, axis=-1)

        x0_1 = block(nb[0], nb[0], "conv0_1")(cat(x0_0, _up2(x1_0)), train)
        x1_1 = block(nb[1], nb[1], "conv1_1")(cat(x1_0, _up2(x2_0)), train)
        x2_1 = block(nb[2], nb[2], "conv2_1")(cat(x2_0, _up2(x3_0)), train)
        x3_1 = block(nb[3], nb[3], "conv3_1")(cat(x3_0, _up2(x4_0)), train)

        x0_2 = block(nb[0], nb[0], "conv0_2")(cat(x0_0, x0_1, _up2(x1_1)), train)
        x1_2 = block(nb[1], nb[1], "conv1_2")(cat(x1_0, x1_1, _up2(x2_1)), train)
        x2_2 = block(nb[2], nb[2], "conv2_2")(cat(x2_0, x2_1, _up2(x3_1)), train)

        x0_3 = block(nb[0], nb[0], "conv0_3")(cat(x0_0, x0_1, x0_2, _up2(x1_2)), train)
        x1_3 = block(nb[1], nb[1], "conv1_3")(cat(x1_0, x1_1, x1_2, _up2(x2_2)), train)

        x0_4 = block(nb[0], nb[0], "conv0_4")(cat(x0_0, x0_1, x0_2, x0_3, _up2(x1_3)), train)

        if self.deep_supervision:
            o1 = nn.Conv(self.num_classes, (1, 1), dtype=dt, name="final1")(x0_1)
            o2 = nn.Conv(self.num_classes, (1, 1), dtype=dt, name="final2")(x0_2)
            o3 = nn.Conv(self.num_classes, (1, 1), dtype=dt, name="final3")(x0_3)
            o4 = nn.Conv(self.num_classes, (1, 1), dtype=dt, name="final4")(x0_4)
            return {"main": o4, "side1": o1, "side2": o2, "side3": o3}
        return {"main": nn.Conv(self.num_classes, (1, 1), dtype=dt, name="final")(x0_4)}
