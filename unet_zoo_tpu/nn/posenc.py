"""2D positional encodings (trace-time constants, NHWC)."""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _sincos_2d(h: int, w: int, orig_ch: int) -> np.ndarray:
    """Sinusoidal 2D positional encoding of `PositionalEncoding2D`
    (ref: unet_zoo/models/unet_transformer.py:69-102): first half of the
    channel dim encodes the H coordinate, second half the W coordinate,
    truncated to ``orig_ch``. Returns [h, w, orig_ch] float32."""
    channels = int(np.ceil(orig_ch / 2))
    inv_freq = 1.0 / (10000 ** (np.arange(0, channels, 2, dtype=np.float32) / channels))
    pos_h = np.arange(h, dtype=np.float32)
    pos_w = np.arange(w, dtype=np.float32)
    sin_h = np.einsum("i,j->ij", pos_h, inv_freq)
    sin_w = np.einsum("i,j->ij", pos_w, inv_freq)
    emb_h = np.concatenate([np.sin(sin_h), np.cos(sin_h)], axis=-1)  # [h, ~ch]
    emb_w = np.concatenate([np.sin(sin_w), np.cos(sin_w)], axis=-1)  # [w, ~ch]
    emb = np.zeros((h, w, channels * 2), dtype=np.float32)
    emb[:, :, :channels] = emb_h[:, None, :channels]
    emb[:, :, channels : 2 * channels] = emb_w[None, :, :channels]
    return emb[:, :, :orig_ch]


def sincos_posenc_2d(x: jnp.ndarray) -> jnp.ndarray:
    """Positional encoding matching ``x`` (NHWC), broadcastable over batch."""
    _, h, w, c = x.shape
    return jnp.asarray(_sincos_2d(h, w, c))[None].astype(x.dtype)
