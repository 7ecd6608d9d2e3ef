"""Modulated deformable convolution (DCNv2) for TPU.

There is no library deform_conv on TPU (the reference calls
torchvision.ops.deform_conv2d, ref: unet_zoo/models/wranet.py:71-78), so
this implements it natively.

Performance shape (all measured on v5e, wranet decoder sizes):

* TPU gathers read at tile granularity, so gathering single [C]-wide
  pixel rows is heavily read-amplified. Each pixel's 2x2 neighborhood is
  packed into one [4C] row up front (two rolled concats over a 1-pixel
  zero-padded input), so each kernel tap needs ONE gather whose row holds
  all four bilinear corners. Clamping sample positions to the padded
  frame reproduces torchvision's zero-padding semantics exactly.
* Gather throughput collapses ~5x (650 -> 138 GB/s) when the gather
  source exceeds on-chip working-set size; the whole per-image pipeline
  therefore runs under ``lax.map`` over the batch, so every gather reads
  a single image's [Hp*Wp, 4C] table. This also caps the im2col
  intermediate at one image ([N, K*C] instead of [B, N, K*C]).
* Sampled values and bilinear weights contract in the INPUT dtype with
  f32 accumulation: converting the gather outputs to f32 cost more than
  the gathers themselves at bf16 (9x26ms converts + 9x19ms f32 spills vs
  9x64ms gathers at b16/256px). float32 inputs keep the exact f32 path
  (golden tests vs the numpy reference, tests/test_deform.py).
"""

from __future__ import annotations

import jax
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

    # pack the 2x2 neighborhood of every padded pixel into one row —
    # stacked on its OWN axis so the gather output is already
    # [N, 4, C] (profiled: the [N, 4C]→[Ho,Wo,4,C] reshape after the
    # gather was a 14ms relayout per tap):
    # quad[:, y*Wp+x] = [xp(y,x), xp(y,x+1), xp(y+1,x), xp(y+1,x+1)]
    flat = xf.reshape(b, hp * wp, c)
    quad = jnp.stack([
        flat,
        jnp.roll(flat, -1, axis=1),
        jnp.roll(flat, -wp, axis=1),
        jnp.roll(flat, -(wp + 1), axis=1),
    ], axis=2)                                               # [B, N, 4, C]

    base_y = (jnp.arange(ho) * stride - padding).astype(jnp.float32)
    base_x = (jnp.arange(wo) * stride - padding).astype(jnp.float32)

    cdt = x.dtype
    wmat = weight.astype(cdt).reshape(k * c, o)

    def one_image(args):
        quad_i, off_i, mask_i = args  # [Hp*Wp, 4C], [Ho, Wo, 2K], [Ho, Wo, K]
        off_i = off_i.astype(jnp.float32)
        cols = []
        for ki in range(k):
            dy, dx = divmod(ki, kw)
            # sampling position in padded coordinates, clamped to the frame
            py = jnp.clip(base_y[:, None] + dy * dilation
                          + off_i[..., 2 * ki], -1.0, float(h)) + 1.0
            px = jnp.clip(base_x[None, :] + dx * dilation
                          + off_i[..., 2 * ki + 1], -1.0, float(w)) + 1.0
            y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, hp - 2)
            x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, wp - 2)
            wy1 = (py - y0.astype(jnp.float32))
            wx1 = (px - x0.astype(jnp.float32))

            # y0 ∈ [0, hp-2], x0 ∈ [0, wp-2] ⇒ idx < hp*wp by construction;
            # mode="clip" clamps the (tiny) index vector instead of the
            # default fill mode's select pass over the gathered values
            # (profiled at 13ms/tap on the [N, 4C] rows)
            idx = (y0 * wp + x0).reshape(ho * wo)
            g = jnp.take(quad_i, idx, axis=0,
                         mode="clip").reshape(ho, wo, 4, c)

            # corner weights as one [.., 4] tensor -> single contraction
            # (avoids four strided slices of the gather output, which cost
            # layout copies on TPU)
            m = mask_i[..., ki].astype(jnp.float32)
            cw = jnp.stack([
                (1 - wy1) * (1 - wx1) * m,
                (1 - wy1) * wx1 * m,
                wy1 * (1 - wx1) * m,
                wy1 * wx1 * m,
            ], axis=-1).astype(cdt)                          # [Ho,Wo,4]
            cols.append(jnp.einsum("hwqc,hwq->hwc", g, cw,
                                   preferred_element_type=cdt))

        col = jnp.concatenate(cols, axis=-1)                 # [Ho,Wo,K*C]
        return jnp.einsum("hwi,io->hwo", col, wmat,
                          preferred_element_type=jnp.float32)

    out = jax.lax.map(one_image, (quad, offset, mask))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)
