"""Config object (TPU-native rebuild of ref: unet_zoo/config.py:5-55).

Same YAML schema (``general/data/training/gpu/models``) and the same flat
UPPERCASE attribute surface. The reference's ``gpu`` section maps to the
device mesh here: ``use_multi_gpu`` → shard the batch over all local
devices; ``gpu_ids`` bounds how many. A native ``tpu:`` section (optional)
overrides: ``num_devices``, ``compute_dtype`` ('float32' | 'bfloat16').
"""

from __future__ import annotations

import datetime
import os
from typing import Any, Dict, Optional


class Config:
    def __init__(self, overall_config_dict: Dict[str, Any], create_dirs: bool = True):
        d = overall_config_dict
        self.PROJECT_NAME = d["general"]["project_name"]
        self.WORKING_DIR = d["general"]["working_dir"]

        self.DATASET_DIR = d["data"]["dataset_dir"]
        self.NUM_WORKERS = d["data"]["num_workers"]
        self.IMAGE_SIZE = d["data"].get("image_size", 512)
        self.AUGMENT = d["data"].get("augment", False)
        # on-device flips compiled into the train step (data/augment.py);
        # when true, host-side augmentation is skipped in the scripts
        self.AUGMENT_ON_DEVICE = d["data"].get("augment_on_device", False)
        self.CACHE_DATA = d["data"].get("cache", False)
        # host input pipeline: 'native' (thread/process pools) or 'grain'
        self.LOADER = d["data"].get("loader", "native")
        # decode engine: 'auto' (C++ libpng/libjpeg pipeline when it
        # compiled on this host, PIL otherwise), 'cpp', or 'pil'
        self.DECODER = d["data"].get("decoder", "auto")
        # host->device transfer dtype: 'uint8' ships raw pixels and
        # normalizes inside the compiled step (4x fewer bytes, identical
        # f32 math — the standard TPU input-pipeline recipe); 'float32'
        # is the reference-faithful host-side normalize
        self.TRANSFER_DTYPE = d["data"].get("transfer_dtype", "uint8")

        t = d["training"]
        self.EPOCHS = t["epochs"]
        self.BATCH_SIZE = t["batch_size"]
        self.LEARNING_RATE = t["learning_rate"]
        self.EARLY_STOPPING_PATIENCE = t["early_stopping_patience"]
        self.LR_SCHEDULER_PATIENCE = t["lr_scheduler_patience"]
        self.LR_SCHEDULER_FACTOR = t["lr_scheduler_factor"]
        # k>1 scans k microbatches with in-carry gradient accumulation
        # before the single optimizer update (memory lever: live
        # activations of batch_size/k only)
        self.GRAD_ACCUM_STEPS = t.get("grad_accum_steps", 1)
        self.MIN_LR = float(t["min_lr"])
        self.NUM_CLASSES = t["num_classes"]
        self.WEIGHT_DECAY = float(t.get("weight_decay", 1e-5))
        self.MAX_GRAD_NORM = float(t.get("max_grad_norm", 1.0))
        # per-output criterion (train/losses.py get_criterion):
        # bce (reference-faithful default) | dice | bce_dice | focal | tversky
        self.LOSS: str = t.get("loss", "bce")
        self.LOSS_KWARGS: Dict[str, Any] = dict(t.get("loss_kwargs") or {})
        # parameter-init / shuffle seed (native extension; the reference
        # trainer has no seed control — quality-A/B seed studies need one)
        self.SEED: int = int(t.get("seed", 0))

        gpu = d.get("gpu", {})
        self.USE_MULTI_GPU = gpu.get("use_multi_gpu", False)
        self.GPU_IDS = gpu.get("gpu_ids", [])
        self.SINGLE_GPU_ID = gpu.get("single_gpu_id", 0)
        self.MULTI_GPU_STRATEGY = gpu.get("multi_gpu_strategy", "DataParallel")

        tpu = d.get("tpu", {})
        self.NUM_DEVICES: Optional[int] = tpu.get("num_devices")
        self.COMPUTE_DTYPE: str = tpu.get("compute_dtype", "float32")
        # size of the mesh's 'model' axis for multi_gpu_strategy:
        # tensor_parallel / expert / pipeline (the 'data' axis gets the
        # remaining devices)
        self.MODEL_PARALLEL_SIZE: int = int(tpu.get("model_parallel_size", 1))
        # multi_gpu_strategy: pipeline — microbatches streamed through the
        # GPipe rotation (bubble fraction (S-1)/(M+S-1)); batch_size must
        # divide by this
        self.PIPELINE_MICROBATCHES: int = int(
            tpu.get("pipeline_microbatches", 4))

        self.RUN_TIMESTAMP = d.get(
            "run_timestamp",
            datetime.datetime.now().strftime("%Y%m%d-%H%M%S_fallback"),
        )
        self.BASE_RUN_DIR = os.path.join(
            self.WORKING_DIR, f"overall_runs_{self.RUN_TIMESTAMP}")
        self.OVERALL_LOG_DIR = os.path.join(self.BASE_RUN_DIR, "overall_logs")
        self.TENSORBOARD_BASE_DIR = os.path.join(
            self.BASE_RUN_DIR, "tensorboard_logs")
        if create_dirs:
            os.makedirs(self.OVERALL_LOG_DIR, exist_ok=True)
            os.makedirs(self.TENSORBOARD_BASE_DIR, exist_ok=True)

    def device_count(self) -> int:
        import jax

        n = jax.local_device_count()
        if not self.USE_MULTI_GPU:
            return 1
        if self.NUM_DEVICES:
            return min(self.NUM_DEVICES, n)
        if self.GPU_IDS:
            return min(len(self.GPU_IDS), n)
        return n

    def get_device_info(self) -> str:
        import jax

        dev = jax.devices()[0]
        return f"{dev.platform.upper()} ({dev.device_kind}) x{self.device_count()}"
