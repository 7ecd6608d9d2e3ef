"""Segmentation losses.

Replaces the reference's isinstance-dispatched loss assembly
(ref: unet_zoo/utils/training_loop.py:43-83) with a single weighted
multi-output criterion driven by the registry's per-key loss weights.

The reference hard-codes ``BCEWithLogitsLoss`` (ref: scripts/train.py:135)
and lists "more sophisticated loss functions" as roadmap work
(ref: README.md:180). This module supplies that roadmap item as a
superset: soft-Dice, BCE+Dice combo, focal, and Tversky criteria, all
selectable from YAML (``training: {loss: bce_dice, loss_kwargs: {...}}``)
via :func:`get_criterion`. Every criterion has the same
``(logits, targets) -> scalar`` signature, accumulates in float32, and is
shape-polymorphic over the channel axis (num_classes >= 1, multilabel
sigmoid semantics — matching the reference's per-channel BCE).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Mapping

import jax
import jax.numpy as jnp

from unet_zoo_tpu.ops import resize_bilinear


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable mean BCE-with-logits (torch.nn.BCEWithLogitsLoss)."""
    x = logits.astype(jnp.float32)
    z = targets.astype(jnp.float32)
    per_elem = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(per_elem)


def _flat_probs(logits: jnp.ndarray, targets: jnp.ndarray):
    """Sigmoid probabilities + targets flattened to [B, -1] in float32."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(logits.shape[0], -1)
    t = targets.astype(jnp.float32).reshape(targets.shape[0], -1)
    return p, t


def soft_dice_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                   smooth: float = 1.0) -> jnp.ndarray:
    """Per-sample soft Dice loss, ``1 - (2·Σpt + s) / (Σp + Σt + s)``.

    The soft (probability) analogue of the thresholded metric in
    train/metrics.py — the smooth term makes empty-mask samples score a
    loss of 0, mirroring the metric's ``union == 0 → 1.0`` convention.
    """
    p, t = _flat_probs(logits, targets)
    inter = jnp.sum(p * t, axis=1)
    denom = jnp.sum(p, axis=1) + jnp.sum(t, axis=1)
    return jnp.mean(1.0 - (2.0 * inter + smooth) / (denom + smooth))


def bce_dice_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                  bce_weight: float = 0.5, dice_weight: float = 0.5,
                  smooth: float = 1.0) -> jnp.ndarray:
    """The standard segmentation combo: weighted BCE + soft Dice."""
    return (bce_weight * bce_with_logits(logits, targets)
            + dice_weight * soft_dice_loss(logits, targets, smooth))


def focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
               gamma: float = 2.0, alpha: float = 0.25) -> jnp.ndarray:
    """Binary focal loss with logits (Lin et al., RetinaNet).

    ``mean( w · (1 - p_t)^γ · CE )`` with ``w = α·z + (1-α)·(1-z)``;
    the CE factor reuses the stable BCE-with-logits form so large |x|
    cannot overflow, and ``(1-p_t)`` is computed as σ(∓x) directly.
    ``alpha=None`` (or a negative value) disables class balancing.
    """
    x = logits.astype(jnp.float32)
    z = targets.astype(jnp.float32)
    ce = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    # 1 - p_t: sigma(-x) where z==1, sigma(x) where z==0
    one_minus_pt = jax.nn.sigmoid(jnp.where(z > 0.5, -x, x))
    mod = one_minus_pt ** gamma
    if alpha is not None and alpha >= 0:
        mod = mod * (alpha * z + (1.0 - alpha) * (1.0 - z))
    return jnp.mean(mod * ce)


def tversky_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                 alpha: float = 0.3, beta: float = 0.7,
                 smooth: float = 1.0) -> jnp.ndarray:
    """Tversky loss — Dice generalized with separate FP (α) / FN (β) costs.

    ``alpha=beta=0.5`` recovers soft Dice; β>α penalizes misses harder
    (the usual choice for small-lesion medical masks).
    """
    p, t = _flat_probs(logits, targets)
    inter = jnp.sum(p * t, axis=1)
    fp = jnp.sum(p * (1.0 - t), axis=1)
    fn = jnp.sum((1.0 - p) * t, axis=1)
    ti = (inter + smooth) / (inter + alpha * fp + beta * fn + smooth)
    return jnp.mean(1.0 - ti)


CRITERIA: Dict[str, Callable] = {
    "bce": bce_with_logits,
    "bce_with_logits": bce_with_logits,
    "dice": soft_dice_loss,
    "bce_dice": bce_dice_loss,
    "combo": bce_dice_loss,
    "focal": focal_loss,
    "tversky": tversky_loss,
}


def get_criterion(name: str = "bce", **kwargs) -> Callable:
    """Resolve a YAML loss name (+kwargs) to a ``(logits, targets)`` callable.

    ``training: {loss: tversky, loss_kwargs: {alpha: 0.3, beta: 0.7}}``.
    Unknown names raise with the valid choices; kwargs are bound with
    ``functools.partial`` (trace-time constants — no retrace per step).
    """
    try:
        fn = CRITERIA[name.lower()]
    except KeyError:
        raise ValueError(
            f"Unknown loss {name!r}: expected one of {sorted(CRITERIA)}")
    if kwargs:
        if fn is bce_with_logits:
            raise ValueError("loss 'bce' takes no loss_kwargs")
        return functools.partial(fn, **kwargs)
    return fn


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
