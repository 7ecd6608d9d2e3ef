"""Spatial padding helpers (NHWC)."""

from __future__ import annotations

import jax.numpy as jnp


def pad_to_match(x: jnp.ndarray, target_hw: tuple[int, int]) -> jnp.ndarray:
    """Symmetrically zero-pad NHWC ``x`` up to ``target_hw``.

    Mirrors the decoder pad-to-skip-size in the reference
    (ref: unet_zoo/models/common_layers.py:110-113): pad ``diff//2`` low,
    ``diff - diff//2`` high on each spatial dim. Shapes are static so this
    resolves at trace time.
    """
    h, w = x.shape[1], x.shape[2]
    th, tw = target_hw
    dh, dw = th - h, tw - w
    if dh == 0 and dw == 0:
        return x
    return jnp.pad(
        x,
        ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
    )
