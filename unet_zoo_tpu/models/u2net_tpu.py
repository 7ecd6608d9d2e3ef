"""u2net_tpu — the flagship recipe applied to the U²-Net class.

Superset entry (no reference counterpart; the member it answers to is
ref: unet_zoo/models/u2net.py:25-298). Classic u2net is the zoo's
quality champion (0.9994 shapes Dice) and its slowest major: its RSU
pyramids spend most of their FLOPs at C=16-64 across 64-256px maps —
the regime round-4 measured at 2.6-12% of MXU peak (isolated C=16 conv,
`_probe_smallc.py`), an *architectural* floor packing could not fix.

This member keeps the U²-Net ideas — nested mini-U blocks per stage
(RSU), multi-scale side supervision, fused output — and re-shapes every
compute op to the measured hardware rules (models/unet_tpu.py carries
the receipts):

* 4x4/s4 patchify stem: all conv work at <=64px with C>=128
  (the dense regime: 143-145 TF/s, 73% SOL);
* RSU-TPU blocks: in-conv + stride-2 ConvNormAct downs + nearest-up
  convs with ADDITIVE level skips (the 2C->C concat merges that
  dominate RSU cost are kept only across stages, like unet_tpu);
* dilated bottleneck (RSU4F's role, dilations 1/2/4 at stride 32 —
  pooling an 8px map is meaningless, dilation keeps RF growth);
* side outputs at s32/s16/s8/s4, 1x1-conv logits bilinearly upsampled
  (or a depth-to-space sub-pixel head for the finest side with
  ``head_mode='dts'``), fused by a 1x1 conv — U2NET's unit loss
  weights apply (ref: utils/training_loop.py:23-31).

~28.7 GF/img at 256px (vs classic u2net's ~150): the bf16 roofline is
~6850 img/s, so the 5000 img/s north star is reachable by physics.
Output protocol: ``{'main', 'side1'..'side4'}`` at input resolution.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from unet_zoo_tpu.nn import BatchNorm, ConvNormAct
from unet_zoo_tpu.ops import resize_bilinear, upsample2x_nearest


class RSUTPU(nn.Module):
    """Mini-U block at constant width: in-conv, ``levels`` stride-2
    descents, nearest-up ascents with additive skips, input residual.
    Decoder stages feed the cross-stage concat straight into the
    in-conv (its input width adapts)."""

    width: int
    levels: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        hin = ConvNormAct(self.width, dtype=dt, name="conv_in")(x, train)
        enc = [hin]
        h = hin
        for i in range(self.levels):
            h = ConvNormAct(self.width, strides=2, dtype=dt,
                            name=f"down{i}")(h, train)
            h = ConvNormAct(self.width, dtype=dt, name=f"enc{i}")(h, train)
            enc.append(h)
        for i in range(self.levels - 1, -1, -1):
            h = upsample2x_nearest(h) + enc[i]
            h = ConvNormAct(self.width, dtype=dt, name=f"dec{i}")(h, train)
        return h + hin


class DilatedBlock(nn.Module):
    """Bottleneck block: dilations 1/2/4 with an input residual —
    RSU4F's receptive-field role (ref u2net.py:191-213) at s32 where
    further pooling is meaningless."""

    width: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        hin = ConvNormAct(self.width, dtype=dt, name="conv_in")(x, train)
        h = hin
        for i, dil in enumerate((1, 2, 4)):
            h = ConvNormAct(self.width, padding=dil, kernel_dilation=dil,
                            dtype=dt, name=f"dil{i}")(h, train)
        return h + hin


class U2NetTPU(nn.Module):
    """See module docstring. ``head_mode``: 'dts' (default) | 'bilinear'
    for the finest (s4) side head, as in models/unet_tpu.py — the
    round-5 fine-structure A/B (FINE_AB.json) measured dts at 0.9610
    test Dice / 0.9792 boundary-F1 vs bilinear's 0.8860 / 0.8351."""

    in_channels: int = 3
    num_classes: int = 1
    # channels per stage at strides (4, 8, 16, 32)
    widths: Sequence[int] = (128, 256, 512, 512)
    # mini-U descents per encoder/decoder stage (same order as widths[:3])
    levels: Sequence[int] = (2, 2, 1)
    head_mode: str = "dts"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        w = list(self.widths)
        lv = list(self.levels)
        nc = self.num_classes
        h_in, w_in = x.shape[1], x.shape[2]

        h = nn.Conv(w[0], (4, 4), strides=(4, 4), padding="VALID",
                    dtype=dt, name="stem")(x)
        h = BatchNorm(train, dt, name="stem_bn")(h)
        h = nn.gelu(h)

        skips = []
        for i in range(3):
            h = RSUTPU(w[i], levels=lv[i], dtype=dt, name=f"enc{i}")(
                h, train)
            skips.append(h)
            h = ConvNormAct(w[i + 1], strides=2, dtype=dt,
                            name=f"down{i}")(h, train)

        h = DilatedBlock(w[3], dtype=dt, name="bottleneck")(h, train)
        bott = h

        decs = []
        for i in range(2, -1, -1):
            h = upsample2x_nearest(h)
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = RSUTPU(w[i], levels=lv[i], dtype=dt, name=f"dec{i}")(
                h, train)
            decs.append(h)  # s16, s8, s4

        def side_bilinear(feat, name):
            lg = nn.Conv(nc, (1, 1), dtype=dt, name=name)(feat)
            return resize_bilinear(lg.astype(jnp.float32), (h_in, w_in),
                                   align_corners=False)

        side4 = side_bilinear(bott, "side4")  # s32
        side3 = side_bilinear(decs[0], "side3")  # s16
        side2 = side_bilinear(decs[1], "side2")  # s8
        if self.head_mode == "dts":
            hd = nn.Conv(16 * nc, (3, 3), dtype=dt, name="side1_dts")(
                decs[2])
            b, hs, ws, _ = hd.shape
            hd = hd.reshape(b, hs, ws, 4, 4, nc)
            side1 = hd.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, 4 * hs, 4 * ws, nc).astype(jnp.float32)
            if (4 * hs, 4 * ws) != (h_in, w_in):
                side1 = resize_bilinear(side1, (h_in, w_in),
                                        align_corners=False)
        else:
            side1 = side_bilinear(decs[2], "side1")  # s4

        fused = nn.Conv(nc, (1, 1), dtype=jnp.float32, name="outconv")(
            jnp.concatenate([side1, side2, side3, side4], axis=-1))
        return {"main": fused, "side1": side1, "side2": side2,
                "side3": side3, "side4": side4}
