"""Pooling primitives (NHWC), implemented on lax.reduce_window.

Semantics match `torch.nn.MaxPool2d` / `AvgPool2d`: VALID padding with
floor division of spatial dims (ref: unet_zoo/models/common_layers.py:90).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_pool2d(x: jnp.ndarray, window: int = 2, stride: int | None = None,
               padding: int = 0) -> jnp.ndarray:
    stride = window if stride is None else stride
    pads = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
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
