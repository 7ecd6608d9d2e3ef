"""Shared transformer primitives (NHWC): overlap patch embedding,
spatial-reduction attention, depthwise-conv MLPs, stochastic depth.

Used by UNext (ref: unet_zoo/models/unext.py:27-191) and MISSFormer
(ref: unet_zoo/models/missformer.py:7-236). Features stay [B, H, W, C]
throughout — no NCHW<->token permutes; attention flattens internally.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class DropPath(nn.Module):
    """Per-sample stochastic depth (ref: unext.py:8-25)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep + jax.random.uniform(rng, shape, x.dtype))
        return x / keep * mask


class OverlapPatchEmbed(nn.Module):
    """Strided conv patch embedding + LayerNorm (ref: unext.py:171-191,
    missformer.py:238-250). Returns NHWC at reduced resolution."""

    embed_dim: int
    patch_size: int = 7
    stride: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size // 2
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), dtype=self.dtype, name="proj")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class SRAttention(nn.Module):
    """Multi-head self-attention with spatial-reduction K/V
    (ref: unext.py:81-135): K/V come from a k=s=sr_ratio strided conv +
    LayerNorm when sr_ratio > 1, bounding attention to N x (N/sr^2)."""

    num_heads: int = 8
    sr_ratio: int = 1
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        scale = self.qk_scale or hd ** -0.5

        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(x)
        q = q.reshape(b, h * w, nh, hd)

        if self.sr_ratio > 1:
            sr = self.sr_ratio
            kv_in = nn.Conv(c, (sr, sr), strides=(sr, sr), dtype=self.dtype,
                            name="sr")(x)
            kv_in = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="sr_norm")(kv_in)
        else:
            kv_in = x
        n_kv = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                      name="kv")(kv_in).reshape(b, n_kv, 2, nh, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class DWConv(nn.Module):
    """3x3 depthwise conv over NHWC features (ref: unext.py:27-34).

    ``use_pallas=True`` routes through the Pallas stencil kernel
    (ops/pallas/depthwise.py) with nn.Conv's parameter surface. Default
    off: although XLA's depthwise lowering profiles ~12x off bandwidth
    in isolation, swapping it in-model LOST ~20% (unext_s 3450 -> 2730
    img/s) — the pallas_call breaks XLA's surrounding elementwise
    fusions and pays an unfused pad copy. Kept as an op for contexts
    without those fusions."""

    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        if self.use_pallas:
            from unet_zoo_tpu.ops.pallas.depthwise import (
                depthwise_conv2d,
                use_pallas_dw,
            )

            if use_pallas_dw(x.shape, 3):
                kern, bias = _DWParams(c, name="dwconv")()
                return depthwise_conv2d(
                    x.astype(self.dtype), kern.astype(self.dtype),
                    bias.astype(self.dtype), k=3)
        return nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                       feature_group_count=c, dtype=self.dtype, name="dwconv")(x)


class _DWParams(nn.Module):
    """Parameter holder matching nn.Conv(feature_group_count=C):
    'kernel' [3,3,1,C], 'bias' [C]."""

    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 1, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel[:, :, 0, :], bias


class DWConvMLP(nn.Module):
    """fc1 → dwconv3x3 → GELU → fc2 (ref: unext.py:36-79). Note the
    reference routes the *dwconv output* into the activation (:71-75)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out_dim = self.out_dim or x.shape[-1]
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        h = DWConv(dtype=self.dtype)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.drop, deterministic=not train)(h)
        h = nn.Dense(out_dim, dtype=self.dtype, name="fc2")(h)
        return nn.Dropout(self.drop, deterministic=not train)(h)


class MiTBlock(nn.Module):
    """Pre-norm transformer block: x + attn(LN(x)); x + mlp(LN(x))
    (ref: unext.py:137-169)."""

    num_heads: int
    mlp_ratio: float = 4.0
    sr_ratio: int = 1
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    moe_experts: int = 0  # >0: Switch-MoE FFN instead of DWConvMLP (ep)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = SRAttention(self.num_heads, self.sr_ratio, self.qkv_bias,
                        self.qk_scale, self.attn_drop, self.drop,
                        dtype=self.dtype, name="attn")(h, train)
        x = x + DropPath(self.drop_path)(h, train)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        if self.moe_experts > 0:
            from unet_zoo_tpu.nn.moe import SwitchMoEMLP

            h = SwitchMoEMLP(self.moe_experts, int(c * self.mlp_ratio),
                             dtype=self.dtype, name="moe_mlp")(h, train)
        else:
            h = DWConvMLP(int(c * self.mlp_ratio), drop=self.drop,
                          dtype=self.dtype, name="mlp")(h, train)
        return x + DropPath(self.drop_path)(h, train)
