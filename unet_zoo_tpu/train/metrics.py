"""On-device segmentation metrics.

TPU-native rebuild of ref: unet_zoo/utils/metrics.py:7-24. Computed entirely
on device (no per-batch ``.item()`` host syncs — the reference's pattern at
utils/training_loop.py:123-124 is replaced by device-side accumulation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dice_coefficient(
    prediction_logits: jnp.ndarray,
    target: jnp.ndarray,
    epsilon: float = 1e-7,
    threshold: float = 0.5,
) -> jnp.ndarray:
    """Thresholded binary Dice over the whole batch.

    sigmoid → >threshold → flatten; ``union == 0`` yields 1.0 exactly as the
    reference does (ref: utils/metrics.py:20-21). jit-safe (lax.select, not
    Python branching).
    """
    pred = (jax.nn.sigmoid(prediction_logits.astype(jnp.float32)) > threshold).astype(
        jnp.float32
    )
    tgt = target.astype(jnp.float32)
    intersection = jnp.sum(pred * tgt)
    union = jnp.sum(pred) + jnp.sum(tgt)
    dice = (2.0 * intersection + epsilon) / (union + epsilon)
    return jnp.where(union == 0, jnp.float32(1.0), dice)


def check_dataset_integrity(dataset_path: str, logger) -> None:
    """Print unique mask values for a few files per split
    (ref: utils/metrics.py:26-40)."""
    import os

    import numpy as np

    logger.log_both("Checking dataset integrity...")
    for split in ["train", "test", "valid"]:
        masks_path = os.path.join(dataset_path, split, "masks")
        if os.path.exists(masks_path):
            from PIL import Image

            mask_files = [
                f for f in os.listdir(masks_path)
                if f.endswith((".png", ".jpg", ".jpeg"))
            ][:3]
            for mask_file in mask_files:
                mask = Image.open(os.path.join(masks_path, mask_file)).convert("L")
                arr = np.array(mask)
                logger.log_both(
                    f"{split}/{mask_file}: unique values = {np.unique(arr)}, "
                    f"shape = {arr.shape}")


def boundary_f1(pred_mask, target_mask, tolerance: int = 2) -> float:
    """Boundary F1 (BF score) between binary masks — host-side numpy
    metric for fine-structure evaluation (round-5 quality benchmark).

    Definition (Csurka et al. / BFScore as in common segmentation
    toolboxes): precision = fraction of predicted boundary pixels within
    ``tolerance`` (Euclidean) of a ground-truth boundary pixel, recall =
    the converse, F1 = their harmonic mean. Boundaries are 4-connected
    inner contours (mask minus its erosion). Dice under-weights thin
    structures — a 1px-dilated curve still scores high Dice but low
    boundary precision — which is exactly what this metric is for.

    Edge cases: both masks boundary-free -> 1.0; exactly one -> 0.0.
    Accepts bool/0-1 arrays of shape [H, W] (or anything squeezable).
    """
    import numpy as np
    from scipy import ndimage

    def contour(m):
        m = np.asarray(m).astype(bool)
        m = np.squeeze(m)
        er = ndimage.binary_erosion(
            m, structure=ndimage.generate_binary_structure(2, 1),
            border_value=0)
        return m & ~er

    bp, bt = contour(pred_mask), contour(target_mask)
    np_, nt = int(bp.sum()), int(bt.sum())
    if np_ == 0 and nt == 0:
        return 1.0
    if np_ == 0 or nt == 0:
        return 0.0
    dist_to_t = ndimage.distance_transform_edt(~bt)
    dist_to_p = ndimage.distance_transform_edt(~bp)
    precision = float((dist_to_t[bp] <= tolerance).mean())
    recall = float((dist_to_p[bt] <= tolerance).mean())
    if precision + recall == 0:
        return 0.0
    return 2.0 * precision * recall / (precision + recall)


def iou_score(
    prediction_logits: jnp.ndarray,
    target: jnp.ndarray,
    epsilon: float = 1e-7,
    threshold: float = 0.5,
) -> jnp.ndarray:
    """Thresholded binary IoU (bonus metric beyond the reference)."""
    pred = (jax.nn.sigmoid(prediction_logits.astype(jnp.float32)) > threshold).astype(
        jnp.float32
    )
    tgt = target.astype(jnp.float32)
    intersection = jnp.sum(pred * tgt)
    union = jnp.sum(pred) + jnp.sum(tgt) - intersection
    iou = (intersection + epsilon) / (union + epsilon)
    return jnp.where(union == 0, jnp.float32(1.0), iou)
