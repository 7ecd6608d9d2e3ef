"""Spatial padding helpers (NHWC)."""

from __future__ import annotations

import jax.numpy as jnp


def pad_to_match(x: jnp.ndarray, target_hw: tuple[int, int]) -> jnp.ndarray:
    """Symmetrically zero-pad NHWC ``x`` up to ``target_hw``.

    Mirrors the decoder pad-to-skip-size in the reference
    (ref: unet_zoo/models/common_layers.py:110-113): pad ``diff//2`` low,
    ``diff - diff//2`` high on each spatial dim. Negative diffs center-crop,
    matching torch F.pad with negative padding (relied on by DA_Transformer,
    ref: unet_zoo/models/da_transformer.py:289-294). Shapes are static so
    this resolves at trace time.
    """
    h, w = x.shape[1], x.shape[2]
    th, tw = target_hw
    dh, dw = th - h, tw - w
    if dh == 0 and dw == 0:
        return x
    # split like torch F.pad: low gets diff//2 (floor), high the rest
    hl, hh = dh // 2, dh - dh // 2
    wl, wh = dw // 2, dw - dw // 2
    if dh < 0 or dw < 0:
        x = x[:, max(0, -hl) : h + min(0, hh), max(0, -wl) : w + min(0, wh), :]
        hl, hh = max(0, hl), max(0, hh)
        wl, wh = max(0, wl), max(0, wh)
    return jnp.pad(x, ((0, 0), (hl, hh), (wl, wh), (0, 0)))
