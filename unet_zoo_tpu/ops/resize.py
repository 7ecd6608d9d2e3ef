"""Image resizing as MXU-friendly matmuls (NHWC).

Instead of gather-based interpolation (scalar-ish, VPU-bound), bilinear
resize is expressed as two small dense matmuls with interpolation matrices
built at trace time — XLA tiles these straight onto the MXU and fuses the
surrounding elementwise work. Both PyTorch sampling conventions
(``align_corners`` True/False) are supported exactly, since the reference
harness relies on both (ref: unet_zoo/models/common_layers.py:166,
unet_zoo/utils/training_loop.py:62).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense [out_size, in_size] 1-D linear interpolation matrix (float32)."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        # half-pixel centers, clamped (PyTorch align_corners=False)
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * in_size / out_size - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    mat[rows, lo] += (1.0 - frac).astype(np.float32)
    mat[rows, hi] += frac.astype(np.float32)
    return mat


@functools.lru_cache(maxsize=None)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """PyTorch 'nearest' (legacy) index rule: floor(i * in / out)."""
    idx = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    return np.clip(idx.astype(np.int64), 0, in_size - 1)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int], align_corners: bool = False) -> jnp.ndarray:
    """Bilinear-resize NHWC ``x`` to spatial ``size`` = (H_out, W_out)."""
    h_out, w_out = size
    _, h_in, w_in, _ = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    wh = jnp.asarray(_interp_matrix(h_in, h_out, align_corners))
    ww = jnp.asarray(_interp_matrix(w_in, w_out, align_corners))
    orig_dtype = x.dtype
    y = jnp.einsum("Hh,bhwc->bHwc", wh, x.astype(jnp.float32))
    y = jnp.einsum("Ww,bhwc->bhWc", ww, y)
    return y.astype(orig_dtype)


def resize_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest-resize NHWC ``x`` to spatial ``size`` (PyTorch 'nearest' rule)."""
    h_out, w_out = size
    _, h_in, w_in, _ = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    hi = jnp.asarray(_nearest_indices(h_in, h_out))
    wi = jnp.asarray(_nearest_indices(w_in, w_out))
    return x[:, hi][:, :, wi]


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsample (the `nn.Upsample(scale_factor=2)` default) as a
    pure reshape/broadcast — free for XLA to fuse, no gathers."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
