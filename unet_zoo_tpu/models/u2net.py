"""U²-Net / U²-Net-small (TPU-native rebuild of ref: unet_zoo/models/u2net.py).

6-stage encoder / 5-stage decoder of nested RSU blocks. RSU-L is expressed
parametrically (the reference unrolls RSU7/6/5/4 by hand); RSU-4F is the
fully-dilated variant. Pooling uses ceil_mode like the reference (:30),
inner upsampling is bilinear align_corners=False (:21), and the six side
heads are fused by a 1x1 conv (:244,288).

Output protocol: ``{'main', 'side1'..'side6'}`` with unit loss weights
(ref: utils/training_loop.py:23-31).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from unet_zoo_tpu.nn import ConvNormAct
from unet_zoo_tpu.ops import max_pool2d, resize_bilinear


def _rebnconv(out_ch: int, dirate: int, dtype, name=None) -> ConvNormAct:
    """conv3x3(dilation=dirate, padding=dirate) → BN → ReLU (ref :6-17)."""
    return ConvNormAct(out_ch, kernel_size=3, padding=dirate,
                       kernel_dilation=dirate, dtype=dtype, name=name)


def _up_like(src: jnp.ndarray, tar: jnp.ndarray) -> jnp.ndarray:
    return resize_bilinear(src, (tar.shape[1], tar.shape[2]), align_corners=False)


class RSU(nn.Module):
    """RSU-L block (ref RSU7/RSU6/RSU5/RSU4, :25-188) — a small UNet whose
    depth is ``levels``; returns input-residual added."""

    levels: int  # 7 for RSU7, ..., 4 for RSU4
    mid_ch: int
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        hxin = _rebnconv(self.out_ch, 1, dt, name="rebnconvin")(x, train)

        # encoder: convs 1..levels-1, pooling after all but the last
        enc = []
        h = hxin
        for i in range(1, self.levels):
            h = _rebnconv(self.mid_ch, 1, dt, name=f"rebnconv{i}")(h, train)
            enc.append(h)
            if i < self.levels - 1:
                h = max_pool2d(h, 2, ceil_mode=True)

        # top conv at dilation 2
        h = _rebnconv(self.mid_ch, 2, dt, name=f"rebnconv{self.levels}")(enc[-1], train)

        # decoder: (levels-1)d .. 1d
        for i in range(self.levels - 1, 0, -1):
            out_ch = self.out_ch if i == 1 else self.mid_ch
            h = _rebnconv(out_ch, 1, dt, name=f"rebnconv{i}d")(
                jnp.concatenate([h, enc[i - 1]], axis=-1), train
            )
            if i > 1:
                h = _up_like(h, enc[i - 2])
        return h + hxin


class RSU4F(nn.Module):
    """Fully-dilated RSU (no pooling), dilations 1/2/4/8 (ref :191-213)."""

    mid_ch: int
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        hxin = _rebnconv(self.out_ch, 1, dt, name="rebnconvin")(x, train)
        h1 = _rebnconv(self.mid_ch, 1, dt, name="rebnconv1")(hxin, train)
        h2 = _rebnconv(self.mid_ch, 2, dt, name="rebnconv2")(h1, train)
        h3 = _rebnconv(self.mid_ch, 4, dt, name="rebnconv3")(h2, train)
        h4 = _rebnconv(self.mid_ch, 8, dt, name="rebnconv4")(h3, train)
        h3d = _rebnconv(self.mid_ch, 4, dt, name="rebnconv3d")(
            jnp.concatenate([h4, h3], axis=-1), train)
        h2d = _rebnconv(self.mid_ch, 2, dt, name="rebnconv2d")(
            jnp.concatenate([h3d, h2], axis=-1), train)
        h1d = _rebnconv(self.out_ch, 1, dt, name="rebnconv1d")(
            jnp.concatenate([h2d, h1], axis=-1), train)
        return h1d + hxin


class U2Net(nn.Module):
    """U²-Net. ``small=True`` gives U2NETP (all mid=16, out=64, ref :301-382)."""

    in_channels: int = 3
    num_classes: int = 1
    small: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        oc = self.num_classes
        if self.small:
            stages = [  # (block levels or 'F', mid, out)
                (7, 16, 64), (6, 16, 64), (5, 16, 64), (4, 16, 64),
                ("F", 16, 64), ("F", 16, 64),
            ]
            dstages = [("F", 16, 64), (4, 16, 64), (5, 16, 64), (6, 16, 64), (7, 16, 64)]
        else:
            stages = [
                (7, 32, 64), (6, 32, 128), (5, 64, 256), (4, 128, 512),
                ("F", 256, 512), ("F", 256, 512),
            ]
            dstages = [("F", 256, 512), (4, 128, 256), (5, 64, 128), (6, 32, 64), (7, 16, 64)]

        def make(kind, mid, out, name):
            if kind == "F":
                return RSU4F(mid, out, dtype=dt, name=name)
            return RSU(kind, mid, out, dtype=dt, name=name)

        # encoder
        enc = []
        h = x
        for i, (kind, mid, out) in enumerate(stages):
            h = make(kind, mid, out, f"stage{i + 1}")(h, train)
            enc.append(h)
            if i < len(stages) - 1:
                h = max_pool2d(h, 2, ceil_mode=True)

        # decoder
        h = _up_like(enc[5], enc[4])
        dec = []  # hx5d, hx4d, hx3d, hx2d, hx1d
        for i, (kind, mid, out) in enumerate(dstages):
            h = make(kind, mid, out, f"stage{5 - i}d")(
                jnp.concatenate([h, enc[4 - i]], axis=-1), train)
            dec.append(h)
            if i < len(dstages) - 1:
                h = _up_like(h, enc[3 - i])

        def side(feat, idx):
            return nn.Conv(oc, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                           name=f"side{idx}")(feat)

        d1 = side(dec[4], 1)
        d2 = _up_like(side(dec[3], 2), d1)
        d3 = _up_like(side(dec[2], 3), d1)
        d4 = _up_like(side(dec[1], 4), d1)
        d5 = _up_like(side(dec[0], 5), d1)
        d6 = _up_like(side(enc[5], 6), d1)
        d0 = nn.Conv(oc, (1, 1), dtype=dt, name="outconv")(
            jnp.concatenate([d1, d2, d3, d4, d5, d6], axis=-1))

        return {"main": d0, "side1": d1, "side2": d2, "side3": d3,
                "side4": d4, "side5": d5, "side6": d6}
