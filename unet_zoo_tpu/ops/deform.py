"""Modulated deformable convolution (DCNv2) for TPU.

There is no library deform_conv on TPU (the reference calls
torchvision.ops.deform_conv2d, ref: unet_zoo/models/wranet.py:71-78), so
this implements it natively.

TPU gathers read at 4KB tile granularity, so gathering single [C]-wide
pixel rows is heavily read-amplified (profiled: ~8x). The kernel therefore
packs each pixel's 2x2 neighborhood into one [4C] row up front (two
rolled concats over a 1-pixel zero-padded input) — then each of the K
kernel taps needs ONE gather whose row contains all four bilinear
corners, instead of four narrow gathers. Sampling positions are clamped
to the padded frame, which reproduces torchvision's zero-padding
semantics exactly (out-of-range samples interpolate against zeros), so no
per-corner validity masks are needed. The per-tap samples accumulate into
an im2col buffer contracted against the weights with a single MXU matmul.
"""

from __future__ import annotations

import jax.numpy as jnp


def deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """Modulated deformable conv.

    x: [B, H, W, C]; offset: [B, Ho, Wo, 2K] with (dy, dx) pairs per tap in
    row-major kernel order (torchvision layout); mask: [B, Ho, Wo, K];
    weight: [kh, kw, C, O].
    """
    b, h, w, c = x.shape
    kh, kw, _, o = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    # 1-pixel zero frame: clamped out-of-range samples interpolate to 0.
    # quad rows stay in the input dtype (bf16 halves gather traffic).
    xf = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 2, w + 2

    # pack the 2x2 neighborhood of every padded pixel into one row:
    # quad[:, y*Wp+x] = [xp(y,x) | xp(y,x+1) | xp(y+1,x) | xp(y+1,x+1)]
    flat = xf.reshape(b, hp * wp, c)
    pair = jnp.concatenate([flat, jnp.roll(flat, -1, axis=1)], axis=-1)
    quad = jnp.concatenate([pair, jnp.roll(pair, -wp, axis=1)], axis=-1)

    base_y = (jnp.arange(ho) * stride - padding).astype(jnp.float32)
    base_x = (jnp.arange(wo) * stride - padding).astype(jnp.float32)

    off = offset.astype(jnp.float32)
    cols = []
    for ki in range(k):
        dy, dx = divmod(ki, kw)
        # sampling position in padded coordinates, clamped to the frame
        py = jnp.clip(base_y[None, :, None] + dy * dilation
                      + off[..., 2 * ki], -1.0, float(h)) + 1.0
        px = jnp.clip(base_x[None, None, :] + dx * dilation
                      + off[..., 2 * ki + 1], -1.0, float(w)) + 1.0
        y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, hp - 2)
        x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, wp - 2)
        wy1 = (py - y0.astype(jnp.float32))[..., None]
        wx1 = (px - x0.astype(jnp.float32))[..., None]

        idx = (y0 * wp + x0).reshape(b, ho * wo, 1)
        g = jnp.take_along_axis(quad, idx, axis=1).astype(jnp.float32)
        g = g.reshape(b, ho, wo, 4, c)

        # corner weights as one [.., 4] tensor -> single contraction (avoids
        # four strided slices of the 5-D gather output, which cost layout
        # copies on TPU)
        m = mask[..., ki].astype(jnp.float32)
        cw = jnp.stack([
            (1 - wy1[..., 0]) * (1 - wx1[..., 0]) * m,
            (1 - wy1[..., 0]) * wx1[..., 0] * m,
            wy1[..., 0] * (1 - wx1[..., 0]) * m,
            wy1[..., 0] * wx1[..., 0] * m,
        ], axis=-1)                                          # [B,Ho,Wo,4]
        cols.append(jnp.einsum("bhwqc,bhwq->bhwc", g, cw))

    col = jnp.concatenate(cols, axis=-1)                     # [B,Ho,Wo,K*C]
    wmat = weight.astype(jnp.float32).reshape(k * c, o)
    out = jnp.einsum("bhwi,io->bhwo", col, wmat)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)
