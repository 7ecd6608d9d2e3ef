"""Modulated deformable convolution (DCNv2) for TPU.

There is no library deform_conv on TPU (the reference calls
torchvision.ops.deform_conv2d, ref: unet_zoo/models/wranet.py:71-78), so
this implements it natively: for each of the K=kh*kw kernel taps (static
Python loop → fully unrolled XLA), bilinearly sample the input at the
offset positions (4 gathers over a flattened spatial axis), modulate, and
contract the tap against its weight slice with an MXU dot.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear_sample(x: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray) -> jnp.ndarray:
    """Sample NHWC ``x`` at fractional positions (py, px) [B, Ho, Wo],
    zero outside bounds (torchvision deform_conv semantics)."""
    b, h, w, c = x.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy1 = (py - y0)[..., None]
    wx1 = (px - x0)[..., None]
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    x_flat = x.reshape(b, h * w, c)

    def gather(yi, xi):
        valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]
        idx = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
        bo, ho, wo = idx.shape
        got = jnp.take_along_axis(
            x_flat, idx.reshape(bo, ho * wo, 1), axis=1
        ).reshape(bo, ho, wo, c)
        return jnp.where(valid, got, 0.0)

    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)
    return (
        gather(y0i, x0i) * wy0 * wx0
        + gather(y0i, x0i + 1) * wy0 * wx1
        + gather(y0i + 1, x0i) * wy1 * wx0
        + gather(y0i + 1, x0i + 1) * wy1 * wx1
    )


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
    _, h, w, _ = x.shape
    kh, kw, _, o = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    base_y = (jnp.arange(ho) * stride - padding).astype(jnp.float32)
    base_x = (jnp.arange(wo) * stride - padding).astype(jnp.float32)

    xf = x.astype(jnp.float32)
    out = None
    for k in range(kh * kw):
        ki, kj = divmod(k, kw)
        py = base_y[None, :, None] + ki * dilation + offset[..., 2 * k].astype(jnp.float32)
        px = base_x[None, None, :] + kj * dilation + offset[..., 2 * k + 1].astype(jnp.float32)
        sampled = _bilinear_sample(xf, py, px) * mask[..., k : k + 1].astype(jnp.float32)
        contrib = jnp.einsum("bhwc,co->bhwo", sampled, weight[ki, kj].astype(jnp.float32))
        out = contrib if out is None else out + contrib
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)
