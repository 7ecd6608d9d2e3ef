"""Pooling primitives (NHWC), implemented on lax.reduce_window.

Semantics match `torch.nn.MaxPool2d` / `AvgPool2d`: VALID padding with
floor division of spatial dims (ref: unet_zoo/models/common_layers.py:90).
"""

from __future__ import annotations

import functools as _functools

import jax
import jax.numpy as jnp


def _ceil_pad(size: int, window: int, stride: int) -> int:
    """Extra high-side padding so out = ceil((size - window)/stride) + 1
    (torch MaxPool2d ceil_mode=True, used throughout U2-Net)."""
    out = -(-(size - window) // stride) + 1
    return max(0, (out - 1) * stride + window - size)


def max_pool2d(x: jnp.ndarray, window: int = 2, stride: int | None = None,
               padding: int = 0, ceil_mode: bool = False) -> jnp.ndarray:
    stride = window if stride is None else stride
    init = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.iinfo(x.dtype).min)

    # large stride-1 max windows are separable: 2 1-D passes do 2k compares
    # instead of k^2 (exact for max; mmunet's 7x7 morphology gates)
    if stride == 1 and window > 3 and not ceil_mode:
        y = jax.lax.reduce_window(
            x, init, jax.lax.max,
            window_dimensions=(1, window, 1, 1), window_strides=(1, 1, 1, 1),
            padding=[(0, 0), (padding, padding), (0, 0), (0, 0)])
        return jax.lax.reduce_window(
            y, init, jax.lax.max,
            window_dimensions=(1, 1, window, 1), window_strides=(1, 1, 1, 1),
            padding=[(0, 0), (0, 0), (padding, padding), (0, 0)])

    pads = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    if ceil_mode:
        pads[1] = (padding, padding + _ceil_pad(x.shape[1] + 2 * padding, window, stride))
        pads[2] = (padding, padding + _ceil_pad(x.shape[2] + 2 * padding, window, stride))
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )


def avg_pool2d(x: jnp.ndarray, window: int = 2, stride: int | None = None,
               padding: int = 0) -> jnp.ndarray:
    stride = window if stride is None else stride
    pads = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )
    # torch AvgPool2d(count_include_pad=True default) divides by window area
    return (summed / float(window * window)).astype(x.dtype)


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


@_functools.lru_cache(maxsize=None)
def _adaptive_matrix(in_size: int, out_size: int) -> "np.ndarray":
    """Row-stochastic [out, in] matrix realizing torch adaptive_avg_pool1d
    bins: bin i averages input [floor(i*in/out), ceil((i+1)*in/out))."""
    import numpy as np

    mat = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -(-((i + 1) * in_size) // out_size)
        mat[i, lo:hi] = 1.0 / (hi - lo)
    return mat


def adaptive_avg_pool2d(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """torch.nn.functional.adaptive_avg_pool2d for NHWC, as two matmuls
    (MXU-friendly; handles both down- and up-sizing)."""
    h_out, w_out = output_size
    _, h_in, w_in, _ = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    orig_dtype = x.dtype
    y = x.astype(jnp.float32)
    if h_in != h_out:
        y = jnp.einsum("Hh,bhwc->bHwc", jnp.asarray(_adaptive_matrix(h_in, h_out)), y)
    if w_in != w_out:
        y = jnp.einsum("Ww,bhwc->bhWc", jnp.asarray(_adaptive_matrix(w_in, w_out)), y)
    return y.astype(orig_dtype)
