#!/usr/bin/env python
"""Multi-model training script (TPU-native rebuild of ref: scripts/train.py).

Same CLI (``--config <yaml>``), same YAML schema, same run-directory layout
(``overall_runs_<ts>/<model>/{checkpoints,logs,results}``), same per-model
param merging semantics — but fixing reference quirk Q8: per-model params
are copied before defaults are merged, so YAML state is never mutated.
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys

import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# escape hatch: this image's sitecustomize pins jax to the TPU backend even
# over JAX_PLATFORMS; set UNET_ZOO_PLATFORM=cpu to force CPU for dry runs
if os.environ.get("UNET_ZOO_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["UNET_ZOO_PLATFORM"])

from unet_zoo_tpu.config import Config
from unet_zoo_tpu.data.datasets import BoneDataset
from unet_zoo_tpu.data.grain_loader import create_loader
from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.parallel import create_mesh_for_batch
from unet_zoo_tpu.train.loop import train_model
from unet_zoo_tpu.train.metrics import check_dataset_integrity
from unet_zoo_tpu.utils.logger import Logger
from unet_zoo_tpu.utils.visualize import plot_training_comparison


def parse_arguments():
    parser = argparse.ArgumentParser(
        description="Train UNet Zoo models (TPU-native).")
    parser.add_argument("--config", type=str, required=True,
                        help="Path to the YAML configuration file.")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from each model's last checkpoint "
                             "(requires run_timestamp pinned in the YAML).")
    return parser.parse_args()


def setup_paths(working_dir, model_name, timestamp, base_run_dir):
    """Per-model run dirs (ref: scripts/train.py:30-53)."""
    model_run_dir = os.path.join(base_run_dir, model_name)
    checkpoint_dir = os.path.join(model_run_dir, "checkpoints")
    log_dir = os.path.join(model_run_dir, "logs")
    results_dir = os.path.join(model_run_dir, "results")
    for d in (checkpoint_dir, log_dir, results_dir):
        os.makedirs(d, exist_ok=True)
    return {
        "run_dir": model_run_dir,
        "checkpoint_dir": checkpoint_dir,
        "log_dir": log_dir,
        "results_dir": results_dir,
        "training_log_path": os.path.join(log_dir, "training_log.txt"),
        "test_results_path": os.path.join(results_dir, "test_results.csv"),
        "model_checkpoint_paths": {
            "best": os.path.join(checkpoint_dir, f"{model_name}_best"),
            "last": os.path.join(checkpoint_dir, f"{model_name}_last"),
        },
    }


def merged_model_params(overall_config, model_name, num_classes, image_size,
                        compute_dtype="float32"):
    """Per-model YAML params + global defaults, copy-safe (fixes Q8)."""
    params = dict(
        overall_config.get("models", {}).get("params", {}).get(model_name) or {})
    params.setdefault("in_channels", 3)
    params.setdefault("num_classes", num_classes)
    params.setdefault("image_size", image_size)
    if compute_dtype == "bfloat16" and "dtype" not in params:
        import jax.numpy as jnp

        params["dtype"] = jnp.bfloat16
    return params


def main():
    args = parse_arguments()
    with open(args.config, "r") as f:
        overall_config = yaml.safe_load(f)
    overall_config.setdefault(
        "run_timestamp", datetime.datetime.now().strftime("%Y%m%d-%H%M%S"))

    config = Config(overall_config)
    logger = Logger(os.path.join(config.OVERALL_LOG_DIR, "overall_training_log.txt"))

    mesh = (create_mesh_for_batch(config.BATCH_SIZE, config.device_count(),
                                  model_axis=config.MODEL_PARALLEL_SIZE)
        if config.USE_MULTI_GPU else None)

    logger.log_both("=" * 80)
    logger.log_both(f"UNET ZOO (TPU) TRAINING RUN — {config.RUN_TIMESTAMP}")
    logger.log_both(f"  Device Configuration: {config.get_device_info()}")
    logger.log_both(f"  Multi-device enabled: {config.USE_MULTI_GPU}")
    logger.log_both(f"  Early Stopping Patience: {config.EARLY_STOPPING_PATIENCE} epochs")
    logger.log_both(f"  LR Scheduler Patience: {config.LR_SCHEDULER_PATIENCE} epochs")
    logger.log_both(f"  Input Image Size: {config.IMAGE_SIZE}x{config.IMAGE_SIZE}")
    logger.log_both(f"  Number of Classes: {config.NUM_CLASSES}")

    check_dataset_integrity(config.DATASET_DIR, logger)

    train_dataset = BoneDataset(config.DATASET_DIR, split="train",
                                image_size=config.IMAGE_SIZE,
                                augment=config.AUGMENT and not config.AUGMENT_ON_DEVICE,
                                cache=config.CACHE_DATA,
                                transfer_dtype=config.TRANSFER_DTYPE,
                                decoder=config.DECODER)
    val_dataset = BoneDataset(config.DATASET_DIR, split="valid",
                              image_size=config.IMAGE_SIZE,
                              cache=config.CACHE_DATA,
                              transfer_dtype=config.TRANSFER_DTYPE,
                              decoder=config.DECODER)
    logger.log_both(f"Train dataset size: {len(train_dataset)}")
    logger.log_both(f"Validation dataset size: {len(val_dataset)}")

    train_loader = create_loader(train_dataset, batch_size=config.BATCH_SIZE,
                                 shuffle=True, drop_last=True,
                                 num_workers=config.NUM_WORKERS,
                                 backend=config.LOADER, seed=config.SEED)
    val_loader = create_loader(val_dataset, batch_size=config.BATCH_SIZE,
                               shuffle=False, num_workers=config.NUM_WORKERS,
                               backend=config.LOADER)

    metrics_history = {}
    early_stopped_flags = {}

    logger.log_both("\n" + "=" * 80)
    logger.log_both("STARTING MULTI-MODEL COMPARISON TRAINING")
    logger.log_both("=" * 80)

    for model_name in overall_config["models"]["names"]:
        logger.log_both(f"\nTraining {model_name.upper()}...")
        paths = setup_paths(config.WORKING_DIR, model_name,
                            config.RUN_TIMESTAMP, config.BASE_RUN_DIR)
        params = merged_model_params(
            overall_config, model_name, config.NUM_CLASSES, config.IMAGE_SIZE,
            config.COMPUTE_DTYPE)
        model = create_model(model_name, **params)

        import jax

        n_params = sum(
            x.size for x in jax.tree_util.tree_leaves(
                model.init(jax.random.PRNGKey(0),
                           model.dummy_input(1, config.IMAGE_SIZE))["params"]))
        logger.log_both(f"{model_name.upper()} parameters: {n_params:,}")

        model_logger = Logger(paths["training_log_path"])
        try:
            result = train_model(
                model, train_loader, val_loader, config, model_name,
                paths["model_checkpoint_paths"]["best"],
                paths["model_checkpoint_paths"]["last"],
                model_logger, mesh=mesh, resume=args.resume)
            tl, td, vl, vd, stopped = result
            metrics_history[model_name] = (tl, td, vl, vd)
            early_stopped_flags[model_name] = stopped
        finally:
            model_logger.close()

    if metrics_history:
        plot_training_comparison(
            config.EPOCHS, metrics_history, early_stopped_flags, logger,
            os.path.join(config.BASE_RUN_DIR, "comparison_plots"))
    logger.close()


if __name__ == "__main__":
    main()
