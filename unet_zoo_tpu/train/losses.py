"""Segmentation losses.

Replaces the reference's isinstance-dispatched loss assembly
(ref: unet_zoo/utils/training_loop.py:43-83) with a single weighted
multi-output BCE driven by the registry's per-key loss weights.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping

import jax.numpy as jnp

from unet_zoo_tpu.ops import resize_bilinear


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable mean BCE-with-logits (torch.nn.BCEWithLogitsLoss)."""
    x = logits.astype(jnp.float32)
    z = targets.astype(jnp.float32)
    per_elem = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(per_elem)


def multi_output_loss(
    outputs: Dict[str, jnp.ndarray],
    mask: jnp.ndarray,
    weight_for: Callable[[str], float],
    criterion: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = bce_with_logits,
) -> jnp.ndarray:
    """Weighted sum of per-output losses under the unified output protocol.

    Deep-supervision outputs at reduced resolution get the *mask* resized to
    their size (bilinear, align_corners=False), matching the reference
    (ref: utils/training_loop.py:62,68). Dict iteration is trace-time only.

    Only the logit keys of the output protocol ('main' and 'side*')
    participate; other aux outputs (e.g. uctransnet's ``attn_weights``
    when ``vis=True``) are ignored.
    """
    total = jnp.float32(0.0)
    for key in sorted(outputs.keys()):
        if key != "main" and not key.startswith("side"):
            continue
        out = outputs[key]
        if out.shape[1:3] != mask.shape[1:3]:
            m = resize_bilinear(mask, (out.shape[1], out.shape[2]), align_corners=False)
        else:
            m = mask
        total = total + jnp.float32(weight_for(key)) * criterion(out, m)
    return total
