"""MMUNet (TPU-native rebuild of ref: unet_zoo/models/mmunet.py).

ConvNeXt-style multi-kernel split blocks (3/5/7 depthwise cascade over
channel quarters), Block1 adds external attention (two k=64 memory units),
decoder Up blocks with softmax-maxpool erosion/dilation morphology gates,
and an edge feature module (EFM) fusing boundary cues at full resolution.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet_zoo_tpu.nn import BatchNorm
from unet_zoo_tpu.ops import max_pool2d, pad_to_match, resize_bilinear


def _gelu(x):
    return nn.gelu(x, approximate=False)


class GroupedConv2in(nn.Module):
    """3x3 grouped conv with 2 input channels per group (EFM's
    Conv(2C→C, groups=C), ref mmunet.py:275).

    XLA lowers in_per_group=2 grouped convs through a degenerate
    [.,.,.,C,2] layout (profiled at 26ms + 27ms of layout copies for one
    call at 256px); expressing it as two pure depthwise convs over the
    interleaved channel halves is exact and ~50x cheaper. The parameter
    keeps flax's grouped-conv kernel layout [kh, kw, 2, C] so checkpoints
    and the torch converter are unaffected.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.features
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 2, f), jnp.float32).astype(self.dtype)
        out = None
        for i in range(2):
            xi = x[..., i::2]  # i-th channel of each group (torch layout)
            ki = kernel[:, :, i:i + 1, :]  # [3,3,1,f] pure depthwise
            yi = jax.lax.conv_general_dilated(
                xi.astype(self.dtype), ki,
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                feature_group_count=f,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            out = yi if out is None else out + yi
        return out


def _dwconv(f, k, dt, name):
    p = k // 2
    return nn.Conv(f, (k, k), padding=((p, p), (p, p)), feature_group_count=f,
                   dtype=dt, name=name)


def _softmax_morph(z, repeat, train):
    """softmax over C then `repeat` rounds of 7x7 (dilate, erode).

    Eval-mode forwards on TPU at fused-eligible shapes run the
    VMEM-resident Pallas kernel (ops/pallas/morph.py) — one pass instead
    of 4-8 full-resolution reduce-windows + softmax chain. Gradients
    aren't defined for the kernel, so training keeps the XLA path."""
    from unet_zoo_tpu.ops.pallas.morph import (
        fused_softmax_morph,
        use_fused_morph,
    )

    if not train and use_fused_morph(z.shape):
        d, e = fused_softmax_morph(z.transpose(0, 1, 3, 2), k=7,
                                   repeat=repeat)
        return d.transpose(0, 1, 3, 2), e.transpose(0, 1, 3, 2)
    sm = nn.softmax(z, axis=-1)
    d, e = sm, sm
    for _ in range(repeat):
        d = max_pool2d(d, 7, 1, 3)
        e = -max_pool2d(-e, 7, 1, 3)
    return d, e


class MKBlock(nn.Module):
    """ConvNeXt-ish multi-kernel block (ref Block, :6-59): split channels
    into quarters; cascaded 3/5/7 depthwise convs with running additions;
    4th quarter passthrough; BN + pointwise MLP (4x) + residual.

    Eval-mode forwards on TPU route through the fused Pallas kernel
    (ops/pallas/mkblock.py) when the shape qualifies: the whole base
    block runs in one VMEM-resident pass in the W-lane layout XLA
    already prefers here, fixing the ~5%-SOL pointwise dots
    (BENCH_NOTES round 3). ``use_pallas`` forces it on/off."""

    dim: int
    external_attention: bool = False  # Block1 variant (ref :61-131)
    dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        q = self.dim // 4

        from unet_zoo_tpu.ops.pallas.mkblock import use_fused_mkblock
        fused = self.use_pallas
        if fused is None:
            fused = use_fused_mkblock(x.shape)
        if fused and not train and not self.is_initializing():
            x = self._fused(x)
        else:
            shortcut = x
            x1, x2, x3, x4 = jnp.split(x, 4, axis=-1)

            x1 = _gelu(BatchNorm(train, dt, "norm1")(_dwconv(q, 3, dt, "dwconv1")(x1)))
            x2 = _gelu(BatchNorm(train, dt, "norm2")(_dwconv(q, 5, dt, "dwconv2")(x1 + x2)))
            x3 = _gelu(BatchNorm(train, dt, "norm3")(_dwconv(q, 7, dt, "dwconv3")(x2 + x3)))

            h = jnp.concatenate([x1, x2, x3, x4], axis=-1)
            h = BatchNorm(train, dt, "norm4")(h)
            h = nn.Dense(4 * self.dim, dtype=dt, name="pwconv1")(h)
            h = _gelu(h)
            h = nn.Dense(self.dim, dtype=dt, name="pwconv2")(h)
            x = shortcut + h

        if not self.external_attention:
            return x


        # external attention (ref :115-131): softmax over N then
        # L1-normalize over the k memory axis
        shortcut1 = x
        b, hh, ww, c = x.shape
        h = BatchNorm(train, dt, "norm_ea")(x)
        h = nn.Conv(c, (1, 1), dtype=dt, name="conv1")(h)
        flat = h.reshape(b, hh * ww, c)
        attn = nn.Dense(64, use_bias=False, dtype=dt, name="linear_0")(flat)  # [b,n,k]
        attn = nn.softmax(attn, axis=1)  # softmax over n (torch dim=-1 on [b,k,n])
        attn = attn / (1e-9 + jnp.sum(attn, axis=2, keepdims=True))
        h = nn.Dense(c, use_bias=False, dtype=dt, name="linear_1")(attn)
        h = h.reshape(b, hh, ww, c)
        h = nn.Conv(c, (1, 1), use_bias=False, dtype=dt, name="conv2")(h)
        h = BatchNorm(train, dt, "conv2_bn")(h)
        return _gelu(shortcut1 + h)

    def _fused(self, x: jnp.ndarray) -> jnp.ndarray:
        """Eval-mode base block via the fused Pallas kernel. The
        [B,H,W,C] <-> [B,H,C,W] transposes at the boundary are layout
        bitcasts when the producer is W-minor (which XLA picks for
        mmunet's quarter-split channel counts)."""
        from unet_zoo_tpu.ops.pallas.mkblock import (
            fold_mkblock_params,
            fused_mkblock,
        )

        ops = fold_mkblock_params(
            self.variables["params"], self.variables["batch_stats"],
            self.dim)
        xt = x.transpose(0, 1, 3, 2)
        out = fused_mkblock(xt.astype(jnp.bfloat16), *ops)
        return out.transpose(0, 1, 3, 2).astype(self.dtype)


class UpFuse(nn.Module):
    """Decoder up block (ref Up :133-174 / Up1 :198-234): bilinear x2 +
    pad + morphology-gated skip fusion; ``with_mlp_shortcut`` adds the
    Mlp(x1+x2) residual path of the ref Up variant."""

    out_channels: int
    with_mlp_shortcut: bool = False
    use_block1: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        x1 = resize_bilinear(x1, (x1.shape[1] * 2, x1.shape[2] * 2),
                             align_corners=True)
        x1 = pad_to_match(x1, (x2.shape[1], x2.shape[2]))

        if self.with_mlp_shortcut:
            x3 = x1 + x2
            h = nn.Conv(x3.shape[-1], (1, 1), dtype=dt, name="mlp_fc1")(x3)
            h = _gelu(h)
            x3_short = nn.Conv(self.out_channels, (1, 1), dtype=dt, name="mlp_fc2")(h)

        dilate, erode = _softmax_morph(x2, repeat=2, train=train)
        gated = nn.sigmoid(
            nn.Conv(x2.shape[-1], (1, 1), dtype=dt, name="linear1")(erode + x2)
        ) * x2 + nn.sigmoid(erode) * jnp.tanh(dilate)

        h = jnp.concatenate([gated, x1], axis=-1)
        h = nn.Conv(self.out_channels, (1, 1), dtype=dt, name="fuse_conv")(h)
        h = BatchNorm(train, dt, "fuse_bn")(h)
        h = MKBlock(self.out_channels, self.use_block1, dtype=dt, name="blk1")(h, train)
        h = MKBlock(self.out_channels, self.use_block1, dtype=dt, name="blk2")(h, train)
        if self.with_mlp_shortcut:
            h = h + x3_short
        return h


class MMUNet(nn.Module):
    in_channels: int = 3
    num_classes: int = 1
    bilinear: bool = True
    base_channels: int = 96
    layer_scale_init_value: float = 1e-6
    se_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        bc = self.base_channels
        factor = 2 if self.bilinear else 1

        def stage(h, feats, k, stride, ext, name):
            p = 3 if k == 7 else 0
            h = nn.Conv(feats, (k, k), strides=(stride, stride),
                        padding=((p, p), (p, p)), dtype=dt, name=f"{name}_conv")(h)
            h = BatchNorm(train, dt, f"{name}_bn1")(h)
            h = MKBlock(feats, ext, dtype=dt, name=f"{name}_blk1")(h, train)
            h = BatchNorm(train, dt, f"{name}_bn2")(h)
            h = MKBlock(feats, ext, dtype=dt, name=f"{name}_blk2")(h, train)
            return _gelu(h)

        x1 = stage(x, bc, 7, 1, False, "first_down")
        x2 = stage(x1, 2 * bc, 2, 2, False, "down0")
        x3 = stage(x2, 2 * bc, 2, 2, False, "down0_1")
        x4 = stage(x3, 4 * bc, 2, 2, False, "down1")
        x5 = stage(x4, 8 * bc, 2, 2, True, "down2")
        x6 = stage(x5, 16 * bc // factor, 2, 2, True, "down3")

        u = UpFuse(8 * bc // factor, True, True, dtype=dt, name="up1")(x6, x5, train)
        u = UpFuse(4 * bc // factor, True, True, dtype=dt, name="up2")(u, x4, train)
        u = UpFuse(2 * bc, False, False, dtype=dt, name="up3")(u, x3, train)
        u = UpFuse(bc, False, False, dtype=dt, name="up4")(u, x2, train)

        # up5 (ref Up2 :236-256): upsample + 2 blocks, no skip
        u = resize_bilinear(u, (u.shape[1] * 2, u.shape[2] * 2), align_corners=True)
        u = MKBlock(bc, False, dtype=dt, name="up5_blk1")(u, train)
        u = MKBlock(bc, False, dtype=dt, name="up5_blk2")(u, train)

        # EFM (ref :267-294)
        x2u = resize_bilinear(x2, (x2.shape[1] * 2, x2.shape[2] * 2),
                              align_corners=True)
        x2u = GroupedConv2in(bc, dtype=dt, name="efm_conv")(x2u)
        x2u = _gelu(BatchNorm(train, dt, "efm_bn")(x2u))

        def edge(z):
            dil, ero = _softmax_morph(z, repeat=1, train=train)
            return dil - ero

        new_edge = nn.Conv(bc, (1, 1), dtype=dt, name="efm_linear1")(
            jnp.concatenate([edge(x2u), edge(x1)], axis=-1))
        fused = u + new_edge

        return {"main": nn.Conv(self.num_classes, (1, 1), dtype=dt,
                                name="out_conv")(fused)}
