"""Training/eval harness: jit'd steps, losses, metrics, schedulers, loops."""

from unet_zoo_tpu.train.metrics import dice_coefficient
from unet_zoo_tpu.train.losses import (
    bce_dice_loss,
    bce_with_logits,
    focal_loss,
    get_criterion,
    multi_output_loss,
    soft_dice_loss,
    tversky_loss,
)

__all__ = [
    "dice_coefficient",
    "bce_with_logits",
    "soft_dice_loss",
    "bce_dice_loss",
    "focal_loss",
    "tversky_loss",
    "get_criterion",
    "multi_output_loss",
]
