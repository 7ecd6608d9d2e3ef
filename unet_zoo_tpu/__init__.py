"""unet_zoo_tpu — a TPU-native (JAX/XLA/Pallas) re-build of the UNet Zoo.

Brand-new framework with the capabilities of the reference `unet_zoo`
(PyTorch, /root/reference) re-designed TPU-first:

* NHWC layout everywhere (TPU-native), bfloat16 compute / float32 params.
* Pure-functional Flax models with an explicit ``train`` flag and
  batch-stats state threading instead of module-mode mutation.
* One output protocol — every model returns ``{'main': logits, ...aux}`` —
  replacing the reference's four ad-hoc conventions
  (ref: unet_zoo/utils/training_loop.py:43-83).
* Loss specs attached to registry entries instead of isinstance dispatch.
* Data parallelism via jax.sharding Mesh + jit (not nn.DataParallel).

Public API parity with the reference package root
(ref: unet_zoo/__init__.py:1-5).
"""

from unet_zoo_tpu.models import create_model, list_models, get_model_config
from unet_zoo_tpu import data
from unet_zoo_tpu import utils

__version__ = "0.1.0"

__all__ = [
    "create_model",
    "list_models",
    "get_model_config",
    "data",
    "utils",
    "__version__",
]
