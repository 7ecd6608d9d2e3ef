"""RAUNet (TPU-native rebuild of ref: unet_zoo/models/raunet.py).

ResNet-34 encoder (implemented in-framework, nn/resnet.py), LinkNet-style
decoder blocks, and AAM attention-aggregation fusion of decoder/skip pairs.
``num_classes > 1`` applies log_softmax as the reference does (ref :134-137).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet_zoo_tpu.nn import BatchNorm
from unet_zoo_tpu.nn.resnet import ResNet34Encoder
from unet_zoo_tpu.ops import global_avg_pool


class AAM(nn.Module):
    """Attention aggregation module (ref :7-45)."""

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_high: jnp.ndarray, input_low: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        dt = self.dtype

        def squeeze_branch(z, name):
            z = global_avg_pool(z)  # [B,1,1,C]
            z = nn.Conv(self.out_ch, (1, 1), dtype=dt, name=f"{name}_conv")(z)
            z = nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"{name}_ln")(z)
            return nn.relu(z)

        weight_high = squeeze_branch(input_high, "conv1")
        weight_low = squeeze_branch(input_low, "conv2")
        weight = nn.Conv(self.out_ch, (1, 1), dtype=dt,
                         name="conv3")(weight_low + weight_high)
        weight = nn.softmax(weight, axis=-1)  # Softmax(dim=1) on NCHW = channels

        low = nn.Conv(self.out_ch, (1, 1), dtype=dt, name="conv4")(input_low)
        # InstanceNorm on the 1x1-conv output (ref :32)
        low32 = low.astype(jnp.float32)
        mu = jnp.mean(low32, axis=(1, 2), keepdims=True)
        var = jnp.var(low32, axis=(1, 2), keepdims=True)
        low = nn.relu(((low32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(low.dtype))
        return input_high + low * weight


class DecoderBlockLinkNet(nn.Module):
    """1x1 squeeze → transposed-conv x2 → 1x1 expand, BN+ReLU each (ref :47-73)."""

    n_filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        mid = x.shape[-1] // 4
        h = nn.Conv(mid, (1, 1), dtype=dt, name="conv1")(x)
        h = nn.relu(BatchNorm(train, dt, "norm1")(h))
        h = nn.ConvTranspose(mid, (4, 4), strides=(2, 2), padding="SAME",
                             dtype=dt, name="deconv2")(h)
        h = nn.relu(BatchNorm(train, dt, "norm2")(h))
        h = nn.Conv(self.n_filters, (1, 1), dtype=dt, name="conv3")(h)
        return nn.relu(BatchNorm(train, dt, "norm3")(h))


class RAUNet(nn.Module):
    in_channels: int = 3
    num_classes: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        assert self.in_channels == 3, "RAUNet requires in_channels == 3 (ref :79)"
        dt = self.dtype
        f = [64, 128, 256, 512]

        e1, e2, e3, e4 = ResNet34Encoder(dtype=dt, name="encoder")(x, train)

        d4 = DecoderBlockLinkNet(f[2], dtype=dt, name="decoder4")(e4, train)
        b4 = AAM(f[2], dtype=dt, name="gau3")(d4, e3, train)
        d3 = DecoderBlockLinkNet(f[1], dtype=dt, name="decoder3")(b4, train)
        b3 = AAM(f[1], dtype=dt, name="gau2")(d3, e2, train)
        d2 = DecoderBlockLinkNet(f[0], dtype=dt, name="decoder2")(b3, train)
        b2 = AAM(f[0], dtype=dt, name="gau1")(d2, e1, train)
        d1 = DecoderBlockLinkNet(f[0], dtype=dt, name="decoder1")(b2, train)

        # final head (ref :103-107): deconv k3 s2 (VALID: 2n+1) → conv3
        # (VALID: -2) → conv2 pad 1 (+1) → exactly 2x input of d1
        h = nn.ConvTranspose(32, (3, 3), strides=(2, 2), padding="VALID",
                             dtype=dt, name="finaldeconv1")(d1)
        h = nn.relu(h)
        h = nn.Conv(32, (3, 3), padding="VALID", dtype=dt, name="finalconv2")(h)
        h = nn.relu(h)
        out = nn.Conv(self.num_classes, (2, 2), padding=((1, 1), (1, 1)),
                      dtype=dt, name="finalconv3")(h)
        if self.num_classes > 1:
            out = nn.log_softmax(out, axis=-1)
        return {"main": out}
