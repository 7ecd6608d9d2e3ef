"""TransAttUNet (TPU-native rebuild of ref: unet_zoo/models/transatt_unet.py).

UNet with a bottleneck attention trio: learned 2D position embedding
(row/col embedding tables, ref :56-82), spatial PAM self-attention
(ref :29-54) and a channel-wise scaled-dot-product attention (ref :84-107),
fused additively (ref :156). Decoder is bilinear Up blocks.

Fidelity note: the reference's SDPA computes a CxC channel-attention matrix
(q is [b,d,hw] unpermuted) — reproduced as written.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from unet_zoo_tpu.nn import Down, DoubleConvMid, OutConv, UpBilinear


class PAM(nn.Module):
    """Position attention module: full spatial (hw x hw) self-attention with
    a zero-init learnable residual scale gamma (ref :29-54)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        q = nn.Conv(c // 8, (1, 1), dtype=self.dtype, name="query_conv")(x)
        k = nn.Conv(c // 8, (1, 1), dtype=self.dtype, name="key_conv")(x)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="value_conv")(x)
        qf = q.reshape(b, h * w, c // 8)
        kf = k.reshape(b, h * w, c // 8)
        vf = v.reshape(b, h * w, c)
        energy = jnp.einsum("bqd,bkd->bqk", qf, kf)
        attn = nn.softmax(energy, axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, vf).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma.astype(x.dtype) * out + x


class ChannelSDPA(nn.Module):
    """The reference's ScaledDotProductAttention: a CxC channel-attention
    (q left unpermuted, ref :91-107), temperature sqrt(sqrt-temp) chain as
    written: attn = softmax((x @ x^T) / temperature**0.5)."""

    temperature: float
    attn_dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        flat = x.reshape(b, h * w, c)
        scale = self.temperature ** 0.5
        attn = nn.softmax(
            jnp.einsum("bnc,bnd->bcd", flat / scale, flat), axis=-1
        )
        attn = nn.Dropout(self.attn_dropout, deterministic=not train)(attn)
        out = jnp.einsum("bcd,bnd->bnc", attn, flat)
        return out.reshape(b, h, w, c)


class LearnedPosEmbedding2D(nn.Module):
    """Row/col embedding tables concatenated channel-wise (ref :56-82).
    Requires h, w <= len_embedding."""

    num_pos_feats: int = 256
    len_embedding: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        _, h, w, _ = x.shape
        row = self.param("row_embed", nn.initializers.uniform(1.0),
                         (self.len_embedding, self.num_pos_feats), jnp.float32)
        col = self.param("col_embed", nn.initializers.uniform(1.0),
                         (self.len_embedding, self.num_pos_feats), jnp.float32)
        x_emb = col[:w][None, :, :]                      # [1, w, f]
        y_emb = row[:h][:, None, :]                      # [h, 1, f]
        pos = jnp.concatenate(
            [jnp.broadcast_to(x_emb, (h, w, self.num_pos_feats)),
             jnp.broadcast_to(y_emb, (h, w, self.num_pos_feats))], axis=-1
        )
        return pos[None].astype(x.dtype)


class TransAttUNet(nn.Module):
    in_channels: int = 3
    num_classes: int = 1
    bilinear: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        factor = 2 if self.bilinear else 1

        x1 = DoubleConvMid(64, dtype=dt, name="inc")(x, train)
        x2 = Down(128, dtype=dt, name="down1")(x1, train)
        x3 = Down(256, dtype=dt, name="down2")(x2, train)
        x4 = Down(512, dtype=dt, name="down3")(x3, train)
        x5 = Down(1024 // factor, dtype=dt, name="down4")(x4, train)

        x5 = x5 + LearnedPosEmbedding2D(256, dtype=dt, name="pos")(x5)
        x5_pam = PAM(dtype=dt, name="pam")(x5, train)
        x5_sdpa = ChannelSDPA(512, dtype=dt, name="sdpa")(x5, train)
        x5 = x5_sdpa + x5_pam

        # Up(in, out) with mid=in//2 (bilinear branch, common_layers.py:160-180)
        u = UpBilinear(512 // factor, 1024 // 2, dtype=dt, name="up1")(x5, x4, train)
        u = UpBilinear(256 // factor, ((512 // factor) + 256) // 2, dtype=dt,
                       name="up2")(u, x3, train)
        u = UpBilinear(128 // factor, ((256 // factor) + 128) // 2, dtype=dt,
                       name="up3")(u, x2, train)
        u = UpBilinear(64, ((128 // factor) + 64) // 2, dtype=dt, name="up4")(u, x1, train)

        return {"main": OutConv(self.num_classes, dtype=dt, name="outc")(u)}
