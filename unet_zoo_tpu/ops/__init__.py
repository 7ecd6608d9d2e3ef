"""TPU-native primitive ops: resize, pooling, padding, fused kernels.

Everything here is shape-static and XLA/Pallas friendly. Layout is NHWC.
"""

from unet_zoo_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    upsample2x_nearest,
)
from unet_zoo_tpu.ops.pooling import (
    max_pool2d,
    avg_pool2d,
    global_avg_pool,
    adaptive_avg_pool2d,
)
from unet_zoo_tpu.ops.padding import pad_to_match

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "upsample2x_nearest",
    "max_pool2d",
    "avg_pool2d",
    "global_avg_pool",
    "adaptive_avg_pool2d",
    "pad_to_match",
]
