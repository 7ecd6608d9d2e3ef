"""Training/eval harness: jit'd steps, losses, metrics, schedulers, loops."""

from unet_zoo_tpu.train.metrics import dice_coefficient
from unet_zoo_tpu.train.losses import bce_with_logits, multi_output_loss

__all__ = ["dice_coefficient", "bce_with_logits", "multi_output_loss"]
