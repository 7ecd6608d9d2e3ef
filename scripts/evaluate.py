#!/usr/bin/env python
"""Standalone checkpoint evaluation + visualization.

The reference's scripts/evaluate.py is broken as written (quirk Q5 —
wrong MultiGPUManager ctor, nonexistent get_device(), mismatched
visualize kwargs; ref: scripts/evaluate.py:44-146). This implements the
intended behavior on the working code paths.

YAML schema (``configs/default_valid_config.yaml`` style)::

    general: {project_name, working_dir}
    data: {dataset_dir, num_workers, image_size}
    evaluation: {batch_size, num_classes, visualization_samples}
    models:
      models_to_evaluate:
        - name: unet
          checkpoint: /path/to/unet_best
          params: {...}
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys

import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("UNET_ZOO_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["UNET_ZOO_PLATFORM"])

from unet_zoo_tpu.data.datasets import BoneDataset
from unet_zoo_tpu.data.grain_loader import create_loader
from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.train.loop import evaluate_model
from unet_zoo_tpu.train.losses import get_criterion
from unet_zoo_tpu.utils.checkpoint import checkpoint_exists, load_checkpoint
from unet_zoo_tpu.utils.logger import Logger
from unet_zoo_tpu.utils.visualize import (
    save_all_test_results,
    visualize_inference_comparison,
)


def parse_arguments():
    parser = argparse.ArgumentParser(
        description="Evaluate UNet Zoo checkpoints (TPU-native).")
    parser.add_argument("--config", type=str, required=True)
    return parser.parse_args()


def main():
    args = parse_arguments()
    with open(args.config, "r") as f:
        cfg = yaml.safe_load(f)
    ts = cfg.get("run_timestamp",
                 datetime.datetime.now().strftime("%Y%m%d-%H%M%S"))
    working_dir = cfg["general"]["working_dir"]
    eval_dir = os.path.join(working_dir, f"evaluation_{ts}")
    os.makedirs(eval_dir, exist_ok=True)
    logger = Logger(os.path.join(eval_dir, "evaluation_log.txt"))

    data = cfg["data"]
    image_size = data.get("image_size", 512)
    ev = cfg.get("evaluation", {})
    batch_size = ev.get("batch_size", 4)
    num_classes = ev.get("num_classes", 1)
    num_samples = ev.get("visualization_samples", 5)
    # optional criterion override (train/losses.py); default matches the
    # reference's hard-coded BCEWithLogitsLoss
    criterion = get_criterion(ev.get("loss", "bce"),
                              **(ev.get("loss_kwargs") or {}))

    test_ds = BoneDataset(data["dataset_dir"], "test", image_size=image_size,
                          transfer_dtype=data.get("transfer_dtype", "uint8"),
                          decoder=data.get("decoder", "auto"))
    test_loader = create_loader(test_ds, batch_size,
                                num_workers=data.get("num_workers", 4),
                                backend=data.get("loader", "native"))
    logger.log_both(f"Test dataset size: {len(test_ds)}")

    entries = cfg["models"]["models_to_evaluate"]
    results = {}
    vis_configs = []
    for entry in entries:
        name = entry["name"]
        ckpt = entry["checkpoint"]
        params = dict(entry.get("params") or {})
        params.setdefault("in_channels", 3)
        params.setdefault("num_classes", num_classes)
        params.setdefault("image_size", image_size)
        if not checkpoint_exists(ckpt):
            logger.log_both(f"Checkpoint not found for {name}: {ckpt}. Skipping.")
            continue
        try:
            model = create_model(name, **params)
            restored = load_checkpoint(ckpt)
            variables = restored.get("variables", restored)
            loss, dice = evaluate_model(model, variables, test_loader, name,
                                        logger, criterion=criterion)
            results[name] = (loss, dice)
            vis_configs.append({"name": name, "checkpoint": ckpt, "params": params})
        except Exception as e:
            logger.log_both(f"Error evaluating {name}: {e}")

    if results:
        save_all_test_results(
            results, os.path.join(eval_dir, "test_results_summary.txt"), logger)
    if vis_configs and num_samples > 0:
        visualize_inference_comparison(
            test_ds, vis_configs, num_samples, logger,
            os.path.join(eval_dir, "visualizations_test"),
            general_image_size=image_size, general_num_classes=num_classes)
    logger.close()


if __name__ == "__main__":
    main()
