"""Classic UNet (TPU-native rebuild of ref: unet_zoo/models/unet.py:8-44).

4-down/4-up encoder-decoder, 64→1024 channels, DoubleConv units, maxpool
downsampling, transposed-conv upsampling with pad-to-match skip concat.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from unet_zoo_tpu.nn import DoubleConv, DownSample, OutConv, UpSampleUNet


class UNet(nn.Module):
    in_channels: int = 3
    num_classes: int = 1
    dtype: Any = jnp.float32
    # None = auto: eval-mode decoder stages use the fused Pallas kernel on
    # TPU (ops/pallas/fused_up.py); True/False force it (True on CPU runs
    # in interpret mode, for tests)
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        up = self.use_pallas
        d1, p1 = DownSample(64, dtype=dt)(x, train)
        d2, p2 = DownSample(128, dtype=dt)(p1, train)
        d3, p3 = DownSample(256, dtype=dt)(p2, train)
        d4, p4 = DownSample(512, dtype=dt)(p3, train)

        b = DoubleConv(1024, dtype=dt)(p4, train)

        u1 = UpSampleUNet(512, 512, dtype=dt, use_pallas=up)(b, d4, train)
        u2 = UpSampleUNet(256, 256, dtype=dt, use_pallas=up)(u1, d3, train)
        u3 = UpSampleUNet(128, 128, dtype=dt, use_pallas=up)(u2, d2, train)
        u4 = UpSampleUNet(64, 64, dtype=dt, use_pallas=up)(u3, d1, train)

        return {"main": OutConv(self.num_classes, dtype=dt)(u4)}
