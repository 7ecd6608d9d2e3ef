"""Swin-UNet V2 (TPU-native rebuild of ref: unet_zoo/models/swin_unet_v2.py).

Swin-V2 features reproduced exactly:
* cosine attention with q pre-scaled then norm-normalized (ref :136-139)
* learnable per-head tau divisor clipped at 0.01 (ref :118-119,140)
* continuous log-CPB relative position bias via a 2→256→heads ReLU MLP on
  sign(d)*log(1+|d|) coordinates (ref :96-109,121-124)
* res-post-norm: shortcut + drop_path(norm1(attn_out)) (ref :274-276)
* shifted-window masks built from the static input resolution (ref :221-244)

Reference quirk reproduced (flag ``use_mlp`` restores the FFN): the
reference creates norm2 + MLP in every SwinTransformerBlock but never
applies them in forward (ref :217-219 vs :246-278) — its blocks are
attention-only. Default matches the reference.

Windows are partitioned with pure reshape/transpose (XLA-fusable, no
gathers); shifts are jnp.roll.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _log_relative_coords(n_h: int, n_w: int) -> np.ndarray:
    """sign(d) * log(1 + |d|) relative coordinates, [N, N, 2] (ref :96-104)."""
    coords = np.stack(np.meshgrid(np.arange(n_h), np.arange(n_w),
                                  indexing="ij"))  # [2, h, w]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.float32)
    return np.sign(rel) * np.log1p(np.abs(rel))


@functools.lru_cache(maxsize=None)
def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """(0/-100) mask [nW, N, N] for shifted windows (ref :221-240)."""
    img = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws_ in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws_] = cnt
            cnt += 1
    win = img.reshape(h // window, window, w // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[B, H, W, C] → [B*nW, window*window, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_reverse(windows: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    """[B*nW, window*window, C] → [B, H, W, C]."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // window) * (w // window))
    x = windows.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


class WindowAttentionV2(nn.Module):
    """Cosine window attention with tau + log-CPB (ref :74-159)."""

    window_size: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        b_, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        scale = self.qk_scale or hd ** -0.5

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=dt, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if self.use_pallas and not (train and self.attn_drop > 0):
            from unet_zoo_tpu.ops.pallas import swin_window_attention

            tau = self.param(
                "tau", nn.initializers.ones,
                (nh, self.window_size[0] * self.window_size[1],
                 self.window_size[0] * self.window_size[1]), jnp.float32)
            coords = jnp.asarray(_log_relative_coords(*self.window_size))[:n, :n]
            bias = nn.Dense(256, dtype=dt, name="cpb_fc1")(coords.astype(dt))
            bias = nn.relu(bias)
            bias = nn.Dense(nh, dtype=dt, name="cpb_fc2")(bias)
            bias = bias.transpose(2, 0, 1)  # [nh, N, N]
            m = (mask if mask is not None
                 else jnp.zeros((1, n, n), jnp.float32))
            # q pre-scaled like the XLA path (cancels inside the cosine)
            qp = (q * scale).transpose(0, 2, 1, 3)
            out = swin_window_attention(
                qp, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                tau[:, :n, :n], bias, m)
            out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
            out = nn.Dense(c, dtype=dt, name="proj")(out)
            return nn.Dropout(self.proj_drop, deterministic=not train)(out)

        q = (q * scale).astype(jnp.float32)
        k32 = k.astype(jnp.float32)
        dots = jnp.einsum("bqhd,bkhd->bhqk", q, k32)
        qn = jnp.linalg.norm(q, axis=-1)  # [b, n, h]
        kn = jnp.linalg.norm(k32, axis=-1)
        denom = jnp.maximum(
            qn.transpose(0, 2, 1)[:, :, :, None] * kn.transpose(0, 2, 1)[:, :, None, :],
            1e-6,
        )
        attn = dots / denom

        tau = self.param(
            "tau", nn.initializers.ones,
            (nh, self.window_size[0] * self.window_size[1],
             self.window_size[0] * self.window_size[1]), jnp.float32,
        )
        attn = attn / jnp.clip(tau[None, :, :n, :n], 0.01, None)

        # continuous relative position bias (log-CPB MLP)
        coords = jnp.asarray(_log_relative_coords(*self.window_size))[:n, :n]
        bias = nn.Dense(256, dtype=dt, name="cpb_fc1")(coords.astype(dt))
        bias = nn.relu(bias)
        bias = nn.Dense(nh, dtype=dt, name="cpb_fc2")(bias)  # [N, N, heads]
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + mask[None, :, None]
            attn = attn.reshape(-1, nh, n, n)
        attn = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)

        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v)
        out = out.reshape(b_, n, c)
        out = nn.Dense(c, dtype=dt, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class SwinBlockV2(nn.Module):
    """Shifted-window block with res-post-norm (ref :177-278)."""

    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    use_mlp: bool = False  # reference never applies its MLP (quirk)
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from unet_zoo_tpu.nn.transformer import DropPath

        dt = self.dtype
        h, w = self.input_resolution
        window = self.window_size
        shift = self.shift_size
        if min(h, w) <= window:
            window = min(h, w)
            shift = 0

        b, l, c = x.shape
        shortcut = x
        xs = x.reshape(b, h, w, c)
        if shift > 0:
            xs = jnp.roll(xs, (-shift, -shift), axis=(1, 2))
        windows = window_partition(xs, window)

        mask = None
        if shift > 0:
            mask = jnp.asarray(_shift_attn_mask(h, w, window, shift))
        attn_out = WindowAttentionV2(
            (window, window), self.num_heads, self.qkv_bias, self.qk_scale,
            self.attn_drop, self.drop, use_pallas=self.use_pallas,
            dtype=dt, name="attn",
        )(windows, mask, train)

        xs = window_reverse(attn_out, window, h, w)
        if shift > 0:
            xs = jnp.roll(xs, (shift, shift), axis=(1, 2))
        h_out = xs.reshape(b, l, c)
        h_out = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm1")(h_out)  # res-post-norm
        x = shortcut + DropPath(self.drop_path)(h_out, train)

        if self.use_mlp:
            m = nn.Dense(int(c * self.mlp_ratio), dtype=dt, name="mlp_fc1")(x)
            m = nn.gelu(m, approximate=False)
            m = nn.Dropout(self.drop, deterministic=not train)(m)
            m = nn.Dense(c, dtype=dt, name="mlp_fc2")(m)
            m = nn.Dropout(self.drop, deterministic=not train)(m)
            m = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm2")(m)
            x = x + DropPath(self.drop_path)(m, train)
        return x


class PatchMerging(nn.Module):
    """4-neighbor concat → LN → Linear(4C→2C) (ref :298-334)."""

    input_resolution: Tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.input_resolution
        b, l, c = x.shape
        xs = x.reshape(b, h, w, c)
        x0 = xs[:, 0::2, 0::2]
        x1 = xs[:, 1::2, 0::2]
        x2 = xs[:, 0::2, 1::2]
        x3 = xs[:, 1::2, 1::2]
        xs = jnp.concatenate([x0, x1, x2, x3], axis=-1).reshape(b, -1, 4 * c)
        xs = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(xs)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                        name="reduction")(xs)


class PatchExpand(nn.Module):
    """Linear(C→2C) → depth-to-space(2) → LN(C/2) (ref :345-370)."""

    input_resolution: Tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.input_resolution
        b, l, c_in = x.shape
        x = nn.Dense(2 * c_in, use_bias=False, dtype=self.dtype,
                     name="expand")(x)
        c = 2 * c_in
        # NOTE (round-4 measured negative, BENCH_NOTES): the train
        # attribution showed the post-shuffle LN backward as a top op in
        # a scrambled [b,h,p,w,p] layout, but BOTH pre-shuffle LN
        # formulations (grouped [B,L,4,C/4] and token-merged [B,4L,C/4]
        # — mathematically identical) measured SLOWER in-model
        # (swin train b32: 267.5 -> 231.5 / 240.5 img/s). XLA
        # co-optimizes the norm with the surrounding transpose; keep the
        # reference order.
        x = x.reshape(b, h, w, 2, 2, c // 4)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 2 * w * 2, c // 4)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class FinalPatchExpandX4(nn.Module):
    """Linear(C→16C) → depth-to-space(4) → LN(C) (ref :372-398).

    ``defer_rearrange=True`` returns the grouped [B, L, 16, C] view with
    the LN already applied per final pixel — exactly equivalent (the 4x4
    depth-to-space only reorders pixels; each pixel's C-vector is one
    contiguous slice of the 16C expansion), letting the caller commute
    the 1x1 head before the full-resolution rearrange. Same 'norm'
    scale/bias [C] params either way."""

    input_resolution: Tuple[int, int]
    dtype: Any = jnp.float32
    defer_rearrange: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.input_resolution
        b, l, c_in = x.shape
        x = nn.Dense(16 * c_in, use_bias=False, dtype=self.dtype,
                     name="expand")(x)
        # (pre-shuffle LN for the TRAIN path measured slower — see
        # PatchExpand note; the defer path keeps the grouped LN, the
        # round-3 eval head-commute, which measured faster at inference)
        if self.defer_rearrange:
            x = x.reshape(b, l, 16, c_in)
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                name="norm")(x)
        x = x.reshape(b, h, w, 4, 4, c_in)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 4 * w * 4, c_in)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class SwinUNetV2(nn.Module):
    """SwinTransformerSys (ref :569-761)."""

    img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    use_mlp: bool = False
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        nl = len(self.depths)
        pr = self.img_size // self.patch_size  # patches resolution
        dpr = np.linspace(0.0, self.drop_path_rate, sum(self.depths)).tolist()

        # patch embed (ref :523-560)
        p = self.patch_size
        h = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=dt, name="patch_embed")(x)
        b = h.shape[0]
        h = h.reshape(b, pr * pr, self.embed_dim)
        if self.patch_norm:
            h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="patch_norm")(h)
        if self.ape:
            ape = self.param("absolute_pos_embed",
                             nn.initializers.truncated_normal(0.02),
                             (1, pr * pr, self.embed_dim), jnp.float32)
            h = h + ape.astype(h.dtype)
        h = nn.Dropout(self.drop_rate, deterministic=not train)(h)

        def stage_blocks(h_, dim, res, depth, heads, dp_slice, prefix):
            for i in range(depth):
                h_ = SwinBlockV2(
                    (res, res), heads, self.window_size,
                    0 if i % 2 == 0 else self.window_size // 2,
                    self.mlp_ratio, self.qkv_bias, self.qk_scale,
                    self.drop_rate, self.attn_drop_rate, dp_slice[i],
                    self.use_mlp, self.use_pallas, dtype=dt,
                    name=f"{prefix}_blk{i}",
                )(h_, train)
            return h_

        # encoder
        skips = []
        cur = 0
        for li in range(nl):
            dim = self.embed_dim * (2 ** li)
            res = pr // (2 ** li)
            skips.append(h)
            h = stage_blocks(h, dim, res, self.depths[li], self.num_heads[li],
                             dpr[cur:cur + self.depths[li]], f"layer{li}")
            cur += self.depths[li]
            if li < nl - 1:
                h = PatchMerging((res, res), dtype=dt,
                                 name=f"layer{li}_downsample")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm")(h)

        # decoder (ref :649-740)
        for ui in range(nl):
            dim = self.embed_dim * (2 ** (nl - 1 - ui))
            res = pr // (2 ** (nl - 1 - ui))
            if ui == 0:
                h = PatchExpand((res, res), dtype=dt, name="layer_up0")(h)
            else:
                h = jnp.concatenate([h, skips[nl - 1 - ui]], axis=-1)
                h = nn.Dense(dim, dtype=dt, name=f"concat_back_dim{ui}")(h)
                d_enc = self.depths[nl - 1 - ui]
                start = sum(self.depths[: nl - 1 - ui])
                h = stage_blocks(h, dim, res, d_enc,
                                 self.num_heads[nl - 1 - ui],
                                 dpr[start:start + d_enc], f"layer_up{ui}")
                if ui < nl - 1:
                    h = PatchExpand((res, res), dtype=dt,
                                    name=f"layer_up{ui}_upsample")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm_up")(h)

        # final x4 expand + 1x1 head (ref :742-754). Eval-mode forwards
        # head-commute: LN and the 1x1 head act per final pixel, so both
        # run BEFORE the 4x4 depth-to-space and only the
        # num_classes-channel output pays the full-resolution rearrange
        # (exact reassociation — the unext head-commute trick; +1.7% b32
        # / +6% b128 fwd on v5e). Train keeps the plain form (the
        # commuted head's tall-skinny dW backward costs more than the
        # copy it saves; missformer measured it at -17%). Identical
        # param surface either way: 'up/norm' LN [C] + 'output' [1,1,C,K].
        if not train:
            h = FinalPatchExpandX4((pr, pr), dtype=dt, defer_rearrange=True,
                                   name="up")(h)              # [B, L, 16, C]
            h = h.reshape(b, pr * pr * 16, 1, self.embed_dim)
            out = nn.Conv(self.num_classes, (1, 1), use_bias=False, dtype=dt,
                          name="output")(h)
            out = out.reshape(b, pr, pr, 4, 4, self.num_classes)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, pr * 4, pr * 4, self.num_classes)
            return {"main": out}
        h = FinalPatchExpandX4((pr, pr), dtype=dt, name="up")(h)
        h = h.reshape(b, pr * 4, pr * 4, self.embed_dim)
        out = nn.Conv(self.num_classes, (1, 1), use_bias=False, dtype=dt,
                      name="output")(h)
        return {"main": out}
