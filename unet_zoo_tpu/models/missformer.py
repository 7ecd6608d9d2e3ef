"""MISSFormer (TPU-native rebuild of ref: unet_zoo/models/missformer.py).

SegFormer-B1 MiT encoder (overlap patch embeddings + efficient
spatial-reduction self-attention + MixFFN_skip), a 4-layer multi-scale
token bridge (BridgeBlock_4: all four stage outputs projected to a common
64-dim token space, concatenated, attended with per-scale K/V reduction,
then per-scale MixFFNs), and a transformer SegU decoder with PatchExpand /
FinalPatchExpand_X4 upsampling.

Grayscale inputs are repeated to 3 channels like the reference (:923-924).
Features stay NHWC; the bridge works on flattened multi-scale tokens.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unet_zoo_tpu.nn.transformer import DWConv, OverlapPatchEmbed, SRAttention

B1_DIMS = (64, 128, 320, 512)
B1_LAYERS = (2, 2, 2, 2)
HEADS = (1, 2, 5, 8)
REDUCTION_RATIOS = (8, 4, 2, 1)


class MixFFNSkip(nn.Module):
    """fc1 → dwconv → LN(dw + fc1) → GELU → fc2 (ref MixFFN_skip :192-208).
    Operates on NHWC."""

    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c1 = x.shape[-1]
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        dw = DWConv(dtype=self.dtype)(h)
        h = nn.gelu(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(dw + h),
                    approximate=False)
        return nn.Dense(c1, dtype=self.dtype, name="fc2")(h)


class MFBlock(nn.Module):
    """Pre-norm transformer block with efficient self-attn + MixFFN_skip
    (ref TransformerBlock :252-268)."""

    head: int
    reduction_ratio: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = SRAttention(self.head, self.reduction_ratio, qkv_bias=True,
                        dtype=self.dtype, name="attn")(h, train)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = MixFFNSkip(c * 4, dtype=self.dtype, name="mlp")(h)
        return x + h


class MiT(nn.Module):
    """4-stage SegFormer encoder returning NHWC features at /4,/8,/16,/32
    (ref :302-368)."""

    dims: Sequence[int] = B1_DIMS
    layers: Sequence[int] = B1_LAYERS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        dt = self.dtype
        outs = []
        h = x
        for s in range(4):
            h = OverlapPatchEmbed(
                self.dims[s], patch_size=7 if s == 0 else 3,
                stride=4 if s == 0 else 2, dtype=dt,
                name=f"patch_embed{s + 1}")(h)
            for i in range(self.layers[s]):
                h = MFBlock(HEADS[s], REDUCTION_RATIOS[s], dtype=dt,
                            name=f"block{s + 1}_{i}")(h, train)
            h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"norm{s + 1}")(h)
            outs.append(h)
        return outs


class MultiScaleReduceAttention(nn.Module):
    """M_EfficientSelfAtten (ref :102-128): queries over the concatenated
    multi-scale tokens; K/V from per-scale strided-conv reductions."""

    head: int
    reduction_ratios: Sequence[int]
    patch_resolutions: Sequence[Tuple[int, int]]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = self.dtype
        b, n, c = x.shape
        nh = self.head
        hd = c // nh
        scale = hd ** -0.5

        q = nn.Dense(c, dtype=dt, name="q")(x).reshape(b, n, nh, hd)

        # Scale_reduce (ref :65-100)
        sizes = [r[0] * r[1] for r in self.patch_resolutions]
        offsets = [0]
        for s in sizes:
            offsets.append(offsets[-1] + s)
        reduced = []
        for i, (hw, rr) in enumerate(zip(self.patch_resolutions, self.reduction_ratios)):
            sl = x[:, offsets[i]:offsets[i + 1], :].reshape(b, hw[0], hw[1], c)
            if rr > 1:
                sl = nn.Conv(c, (rr, rr), strides=(rr, rr), dtype=dt,
                             name=f"sr{i}")(sl)
            reduced.append(sl.reshape(b, -1, c))
        kv_in = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="sr_norm")(
            jnp.concatenate(reduced, axis=1))

        kv = nn.Dense(2 * c, dtype=dt, name="kv")(kv_in)
        kv = kv.reshape(b, -1, 2, nh, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, c)
        return nn.Dense(c, dtype=dt, name="proj")(out)


class BridgeLayer4(nn.Module):
    """One bridge layer over concatenated 4-scale tokens (ref :635-702)."""

    dims: Sequence[int]
    head: int
    patch_resolutions: Sequence[Tuple[int, int]]
    project_in: bool  # first layer projects NHWC stage outputs to common dim
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs) -> jnp.ndarray:
        dt = self.dtype
        cdim = self.dims[0]
        if self.project_in:
            flat = []
            for i, f in enumerate(inputs):
                b = f.shape[0]
                t = nn.Dense(cdim, dtype=dt, name=f"proj_c{i + 1}")(f)
                flat.append(t.reshape(b, -1, cdim))
            cat = jnp.concatenate(flat, axis=1)
        else:
            cat = inputs

        h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm1")(cat)
        h = MultiScaleReduceAttention(self.head, REDUCTION_RATIOS,
                                      self.patch_resolutions, dtype=dt,
                                      name="attn")(h)
        tx1 = cat + h
        tx = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm2")(tx1)

        sizes = [r[0] * r[1] for r in self.patch_resolutions]
        offsets = [0]
        for s in sizes:
            offsets.append(offsets[-1] + s)
        ffn_outs = []
        for i, hw in enumerate(self.patch_resolutions):
            b = tx.shape[0]
            t = tx[:, offsets[i]:offsets[i + 1], :].reshape(b, hw[0], hw[1], cdim)
            t = MixFFNSkip(cdim * 4, dtype=dt, name=f"mixffn{i + 1}")(t)
            ffn_outs.append(t.reshape(b, -1, cdim))
        return tx1 + jnp.concatenate(ffn_outs, axis=1)


class BridgeBlock4(nn.Module):
    """4 stacked bridge layers + projection back to per-stage dims
    (ref :765-813). Returns NHWC features."""

    dims: Sequence[int]
    image_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> List[jnp.ndarray]:
        dt = self.dtype
        res = [(f.shape[1], f.shape[2]) for f in feats]
        h = BridgeLayer4(self.dims, HEADS[0], res, True, dtype=dt,
                         name="bridge_layer1")(feats)
        for i in range(2, 5):
            h = BridgeLayer4(self.dims, HEADS[0], res, False, dtype=dt,
                             name=f"bridge_layer{i}")(h)

        sizes = [r[0] * r[1] for r in res]
        offsets = [0]
        for s in sizes:
            offsets.append(offsets[-1] + s)
        outs = []
        b = h.shape[0]
        for i, (hw, dim) in enumerate(zip(res, self.dims)):
            t = nn.Dense(dim, dtype=dt, name=f"proj_back_c{i + 1}")(
                h[:, offsets[i]:offsets[i + 1], :])
            outs.append(t.reshape(b, hw[0], hw[1], dim))
        return outs


def _patch_expand_rearrange(x: jnp.ndarray, p: int, c_out: int) -> jnp.ndarray:
    b, h, w, _ = x.shape
    x = x.reshape(b, h, w, p, p, c_out)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * p, w * p, c_out)


class PatchExpand(nn.Module):
    """x2 token upsampling: Linear(dim→4*dim) + depth-to-space + LN
    (ref :512-537)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.dim * 4, use_bias=False, dtype=self.dtype,
                     name="expand")(x)
        # LN on the grouped pre-shuffle view — identical math (each
        # output pixel's channels are one contiguous expansion slice),
        # but the post-shuffle LN backward runs in a scrambled
        # [b,h,p,w,p] layout that topped the swin train profile
        # (round-4 attribution).
        # round-4 measured negative: pre-shuffle LN formulations lose
        # in-model (missformer train b32: 287 -> 223/234.7 img/s) even
        # though the post-shuffle LN backward profiles as a top op —
        # XLA co-optimizes it with the transpose. Keep reference order.
        x = _patch_expand_rearrange(x, 2, self.dim)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class FinalPatchExpandX4(nn.Module):
    """x4 token upsampling (ref :539-564).

    ``defer_rearrange=True`` returns the grouped [B, H, W, 16, C] view
    with the LN already applied per final pixel — exact (the
    depth-to-space only reorders pixels; each pixel's C-vector is one
    contiguous slice of the 16C expansion), so the caller can commute
    the 1x1 head before the full-resolution rearrange. Same 'norm'
    params either way."""

    dim: int
    dtype: Any = jnp.float32
    defer_rearrange: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.dim * 16, use_bias=False, dtype=self.dtype,
                     name="expand")(x)
        # (pre-shuffle LN for the train path measured slower — see
        # PatchExpand; defer keeps the grouped LN eval head-commute)
        if self.defer_rearrange:
            b, h, w, _ = x.shape
            x = x.reshape(b, h, w, 16, self.dim)
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                name="norm")(x)
        x = _patch_expand_rearrange(x, 4, self.dim)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class SegUDecoder(nn.Module):
    """Decoder stage: concat skip → Linear → 2 transformer blocks →
    PatchExpand (or FinalPatchExpand_X4 + 1x1 head) (ref :566-633)."""

    out_dim: int
    head: int
    reduction_ratio: int
    num_classes: int = 1
    is_last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1: jnp.ndarray, skip: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        if skip is not None:
            h = nn.Dense(self.out_dim, dtype=dt, name="concat_linear")(
                jnp.concatenate([x1, skip], axis=-1))
        else:
            h = x1
        h = MFBlock(self.head, self.reduction_ratio, dtype=dt,
                    name="layer_former_1")(h, train)
        h = MFBlock(self.head, self.reduction_ratio, dtype=dt,
                    name="layer_former_2")(h, train)
        if self.is_last:
            if not train:
                # head-commuted final expand (eval only): LN + the 1x1
                # head act per final pixel, so both run BEFORE the 4x4
                # depth-to-space and only the num_classes-channel output
                # pays the full-res rearrange. Exact reassociation; same
                # 'layer_up/norm' + 'last_layer' param surface as the
                # plain branch. Train keeps the plain form: the commuted
                # head's tall-skinny dW backward measured -17% (v5e b32).
                h = FinalPatchExpandX4(self.out_dim, dtype=dt,
                                       defer_rearrange=True,
                                       name="layer_up")(h)  # [b,hh,ww,16,c]
                b, hh, ww, _, c = h.shape
                out = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                              name="last_layer")(
                    h.reshape(b, hh * ww * 16, 1, c))
                out = out.reshape(b, hh, ww, 4, 4, self.num_classes)
                return out.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, hh * 4, ww * 4, self.num_classes)
            h = FinalPatchExpandX4(self.out_dim, dtype=dt,
                                   name="layer_up")(h)
            return nn.Conv(self.num_classes, (1, 1), dtype=dt,
                           name="last_layer")(h)
        return PatchExpand(self.out_dim, dtype=dt, name="layer_up")(h)


class MISSFormer(nn.Module):
    in_channels: int = 3
    num_classes: int = 1
    image_size: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))

        dims = B1_DIMS
        feats = MiT(dims, B1_LAYERS, dtype=dt, name="backbone")(x, train)
        sk = BridgeBlock4(dims, self.image_size, dtype=dt,
                          name="bridge")(feats)

        h = SegUDecoder(dims[3], HEADS[3], REDUCTION_RATIOS[3], dtype=dt,
                        name="decoder_3")(sk[3], None, train)
        h = SegUDecoder(dims[2], HEADS[2], REDUCTION_RATIOS[2], dtype=dt,
                        name="decoder_2")(h, sk[2], train)
        h = SegUDecoder(dims[1], HEADS[1], REDUCTION_RATIOS[1], dtype=dt,
                        name="decoder_1")(h, sk[1], train)
        out = SegUDecoder(dims[0], HEADS[0], REDUCTION_RATIOS[0],
                          num_classes=self.num_classes, is_last=True,
                          dtype=dt, name="decoder_0")(h, sk[0], train)
        return {"main": out}
