"""U-Transformer (TPU-native rebuild of ref: unet_zoo/models/unet_transformer.py).

UNet encoder + bottleneck multi-head self-attention with sinusoidal 2D
positional encoding, decoder of TransformerUp blocks: cross-attention
between the upsampled path (Y) and skip (S) computed at a pooled common
resolution (``common_attn_res_for_QK_V``, default 64x64) to bound the
attention matrix (ref :139-228).

Fidelity notes reproduced as written: softmax over the *query* axis
(``nn.Softmax(dim=1)``, ref :123,185), single dxd unbiased projection
matrices (MultiHeadDense, ref :10-32), adaptive-avg-pool Q/K from Y and V
from S (ref :202-204).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unet_zoo_tpu.nn import BatchNorm, Down, DoubleConv, OutConv
from unet_zoo_tpu.nn.posenc import sincos_posenc_2d
from unet_zoo_tpu.ops import adaptive_avg_pool2d, resize_bilinear


def _dense(d: int, dtype, name: str) -> nn.Dense:
    return nn.Dense(d, use_bias=False, dtype=dtype, name=name)


class BottleneckSelfAttention(nn.Module):
    """MHSA with sincos pos-enc; attention softmax over query axis
    (ref :117-137)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = x + sincos_posenc_2d(x)
        flat = x.reshape(b, h * w, c)
        q = _dense(c, self.dtype, "query")(flat)
        k = _dense(c, self.dtype, "key")(flat)
        v = _dense(c, self.dtype, "value")(flat)
        logits = jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(jnp.float32(c)).astype(x.dtype)
        attn = nn.softmax(logits, axis=1)  # dim=1 quirk, ref :123
        out = jnp.einsum("bqk,bkc->bqc", attn, v)
        return out.reshape(b, h, w, c)


class CrossAttentionUp(nn.Module):
    """TransformerUp = MHCA(Y, S) + double conv (ref :139-253)."""

    s_channels: int
    y_channels: int
    attn_res: Tuple[int, int] = (64, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray, s: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        cc = self.s_channels  # common attention channels
        yb, yh, yw, _ = y.shape

        s_pe = s + sincos_posenc_2d(s)
        y_pe = y + sincos_posenc_2d(y)

        # S path: maxpool2 → 1x1 conv → BN → ReLU (ref :153-158)
        from unet_zoo_tpu.ops import max_pool2d

        sp = max_pool2d(s_pe, 2)
        sp = nn.Conv(cc, (1, 1), dtype=dt, name="Sconv")(sp)
        sp = nn.relu(BatchNorm(train, dtype=dt, name="Sbn")(sp))

        # Y path: 1x1 conv → BN → ReLU (ref :159-163)
        yp = nn.Conv(cc, (1, 1), dtype=dt, name="Yconv")(y_pe)
        yp = nn.relu(BatchNorm(train, dtype=dt, name="Ybn")(yp))

        ha, wa = self.attn_res
        q_src = adaptive_avg_pool2d(yp, (ha, wa)).reshape(yb, ha * wa, cc)
        k_src = adaptive_avg_pool2d(yp, (ha, wa)).reshape(yb, ha * wa, cc)
        v_src = adaptive_avg_pool2d(sp, (ha, wa)).reshape(yb, ha * wa, cc)

        q = _dense(cc, dt, "query")(q_src)
        k = _dense(cc, dt, "key")(k_src)
        v = _dense(cc, dt, "value")(v_src)
        logits = jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(jnp.float32(cc)).astype(y.dtype)
        attn = nn.softmax(logits, axis=1)  # dim=1 quirk, ref :185
        z = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(yb, ha, wa, cc)

        # upsample attention output to the decoder's target (2*Yh, 2*Yw)
        z = resize_bilinear(z, (yh * 2, yw * 2), align_corners=True)
        z = nn.Conv(cc, (1, 1), dtype=dt, name="conv_after_attention")(z)
        z = nn.relu(BatchNorm(train, dtype=dt, name="attn_bn")(z))

        # Y2: bilinear x2 (align_corners=True) → conv3x3 → conv1x1 → BN → ReLU
        y2 = resize_bilinear(y_pe, (yh * 2, yw * 2), align_corners=True)
        y2 = nn.Conv(self.y_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                     name="Yconv2_3x3")(y2)
        y2 = nn.Conv(cc, (1, 1), dtype=dt, name="Yconv2_1x1")(y2)
        y2 = nn.relu(BatchNorm(train, dtype=dt, name="Ybn2")(y2))

        fused = jnp.concatenate([z, y2], axis=-1)
        return DoubleConv(self.s_channels, dtype=dt, name="conv")(fused, train)


class UTransformer(nn.Module):
    in_channels: int = 3
    num_classes: int = 1
    bilinear: bool = True
    attn_res: Tuple[int, int] = (64, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        x1 = DoubleConv(64, dtype=dt, name="inc")(x, train)
        x2 = Down(128, dtype=dt, name="down1")(x1, train)
        x3 = Down(256, dtype=dt, name="down2")(x2, train)
        x4 = Down(512, dtype=dt, name="down3")(x3, train)
        x4 = BottleneckSelfAttention(dtype=dt, name="MHSA")(x4, train)
        u = CrossAttentionUp(256, 512, self.attn_res, dtype=dt, name="up1")(x4, x3, train)
        u = CrossAttentionUp(128, 256, self.attn_res, dtype=dt, name="up2")(u, x2, train)
        u = CrossAttentionUp(64, 128, self.attn_res, dtype=dt, name="up3")(u, x1, train)
        return {"main": OutConv(self.num_classes, dtype=dt, name="outc")(u)}
