"""Pallas TPU kernels for the zoo's hot ops, each with a lax fallback.

Kernels run on TPU; tests exercise them in interpreter mode on CPU and
compare against the pure-XLA reference paths.
"""

from unet_zoo_tpu.ops.pallas.window_attention import swin_window_attention
from unet_zoo_tpu.ops.pallas.axial_attention import fused_axial_attention

__all__ = ["swin_window_attention", "fused_axial_attention"]
