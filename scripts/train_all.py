#!/usr/bin/env python
"""Full pipeline: train → evaluate (test) → visualize
(TPU-native rebuild of ref: scripts/train_all.py).

Same CLI: ``--config <yaml>`` plus ``--skip-training``,
``--skip-evaluation``, ``--visualization-samples N``.
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

from unet_zoo_tpu.config import Config
from unet_zoo_tpu.data.datasets import BoneDataset
from unet_zoo_tpu.data.grain_loader import create_loader
from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.parallel import create_mesh_for_batch
from unet_zoo_tpu.train.loop import evaluate_model, train_model
from unet_zoo_tpu.train.losses import get_criterion
from unet_zoo_tpu.train.metrics import check_dataset_integrity
from unet_zoo_tpu.utils.checkpoint import checkpoint_exists, load_checkpoint
from unet_zoo_tpu.utils.logger import Logger
from unet_zoo_tpu.utils.visualize import (
    plot_training_comparison,
    save_all_test_results,
    visualize_inference_comparison,
)

from train import merged_model_params, setup_paths  # shared helpers


def parse_arguments():
    parser = argparse.ArgumentParser(
        description="Train, evaluate and visualize UNet Zoo models (TPU-native).")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--resume", action="store_true",
                        help="Resume from each model's last checkpoint "
                             "(requires run_timestamp pinned in the YAML).")
    parser.add_argument("--skip-training", action="store_true",
                        help="Skip training (requires existing checkpoints).")
    parser.add_argument("--skip-evaluation", action="store_true",
                        help="Skip test-set evaluation.")
    parser.add_argument("--visualization-samples", type=int, default=5)
    return parser.parse_args()


def run_evaluation_phase(models_to_evaluate, overall_config, config,
                         test_loader, logger):
    """Per-model best-checkpoint evaluation (ref: train_all.py:110-167)."""
    logger.log_both("\n" + "=" * 80)
    logger.log_both("STARTING EVALUATION PHASE")
    logger.log_both("=" * 80)
    all_test_results = {}
    vis_configs = []
    for model_name in models_to_evaluate:
        logger.log_both(f"\nEvaluating {model_name.upper()}...")
        paths = setup_paths(config.WORKING_DIR, model_name,
                            config.RUN_TIMESTAMP, config.BASE_RUN_DIR)
        best = paths["model_checkpoint_paths"]["best"]
        if not checkpoint_exists(best):
            logger.log_both(
                f"Best checkpoint not found for {model_name}: {best}")
            continue
        params = merged_model_params(
            overall_config, model_name, config.NUM_CLASSES,
            config.IMAGE_SIZE, config.COMPUTE_DTYPE)
        try:
            model = create_model(model_name, **params)
            restored = load_checkpoint(best)
            variables = restored.get("variables", restored)
            test_loss, test_dice = evaluate_model(
                model, variables, test_loader, model_name, logger,
                criterion=get_criterion(config.LOSS, **config.LOSS_KWARGS))
            all_test_results[model_name] = (test_loss, test_dice)
            vis_configs.append({"name": model_name, "checkpoint": best,
                                "params": dict(params)})
            logger.log_both(f"{model_name.upper()} Test Results:")
            logger.log_both(f"   Test Loss: {test_loss:.6f}")
            logger.log_both(f"   Test DICE: {test_dice:.6f}")
        except Exception as e:  # per-model isolation (ref :163-165)
            logger.log_both(f"Error evaluating {model_name}: {e}")
            continue
    return all_test_results, vis_configs


def main():
    args = parse_arguments()
    with open(args.config, "r") as f:
        overall_config = yaml.safe_load(f)
    overall_config.setdefault(
        "run_timestamp", datetime.datetime.now().strftime("%Y%m%d-%H%M%S"))
    config = Config(overall_config)
    logger = Logger(os.path.join(config.OVERALL_LOG_DIR, "overall_pipeline_log.txt"))
    mesh = (create_mesh_for_batch(config.BATCH_SIZE, config.device_count(),
                                  model_axis=config.MODEL_PARALLEL_SIZE)
        if config.USE_MULTI_GPU else None)
    model_names = overall_config["models"]["names"]

    check_dataset_integrity(config.DATASET_DIR, logger)
    train_ds = BoneDataset(config.DATASET_DIR, "train",
                           image_size=config.IMAGE_SIZE,
                           augment=config.AUGMENT and not config.AUGMENT_ON_DEVICE, cache=config.CACHE_DATA,
                           transfer_dtype=config.TRANSFER_DTYPE,
                           decoder=config.DECODER)
    val_ds = BoneDataset(config.DATASET_DIR, "valid",
                         image_size=config.IMAGE_SIZE, cache=config.CACHE_DATA,
                         transfer_dtype=config.TRANSFER_DTYPE,
                         decoder=config.DECODER)
    test_ds = BoneDataset(config.DATASET_DIR, "test",
                          image_size=config.IMAGE_SIZE,
                          transfer_dtype=config.TRANSFER_DTYPE,
                          decoder=config.DECODER)
    train_loader = create_loader(train_ds, config.BATCH_SIZE, shuffle=True,
                                 drop_last=True,
                                 num_workers=config.NUM_WORKERS,
                                 backend=config.LOADER)
    val_loader = create_loader(val_ds, config.BATCH_SIZE,
                               num_workers=config.NUM_WORKERS,
                               backend=config.LOADER)
    test_loader = create_loader(test_ds, config.BATCH_SIZE,
                                num_workers=config.NUM_WORKERS,
                                backend=config.LOADER)

    # ---- training phase ----
    if not args.skip_training:
        metrics_history, stopped_flags = {}, {}
        for model_name in model_names:
            logger.log_both(f"\nTraining {model_name.upper()}...")
            paths = setup_paths(config.WORKING_DIR, model_name,
                                config.RUN_TIMESTAMP, config.BASE_RUN_DIR)
            params = merged_model_params(
                overall_config, model_name, config.NUM_CLASSES,
                config.IMAGE_SIZE, config.COMPUTE_DTYPE)
            model = create_model(model_name, **params)
            model_logger = Logger(paths["training_log_path"])
            try:
                tl, td, vl, vd, stopped = train_model(
                    model, train_loader, val_loader, config, model_name,
                    paths["model_checkpoint_paths"]["best"],
                    paths["model_checkpoint_paths"]["last"],
                    model_logger, mesh=mesh, resume=args.resume)
                metrics_history[model_name] = (tl, td, vl, vd)
                stopped_flags[model_name] = stopped
            finally:
                model_logger.close()
        if metrics_history:
            plot_training_comparison(
                config.EPOCHS, metrics_history, stopped_flags, logger,
                os.path.join(config.BASE_RUN_DIR, "comparison_plots"))

    # ---- evaluation phase ----
    vis_configs = []
    if not args.skip_evaluation:
        all_test_results, vis_configs = run_evaluation_phase(
            model_names, overall_config, config, test_loader, logger)
        if all_test_results:
            save_all_test_results(
                all_test_results,
                os.path.join(config.BASE_RUN_DIR, "test_results_summary.txt"),
                logger)
    else:
        for model_name in model_names:
            paths = setup_paths(config.WORKING_DIR, model_name,
                                config.RUN_TIMESTAMP, config.BASE_RUN_DIR)
            best = paths["model_checkpoint_paths"]["best"]
            if checkpoint_exists(best):
                vis_configs.append({
                    "name": model_name, "checkpoint": best,
                    "params": merged_model_params(
                        overall_config, model_name, config.NUM_CLASSES,
                        config.IMAGE_SIZE)})

    # ---- visualization phase (ref: train_all.py:169-209) ----
    if vis_configs and args.visualization_samples > 0:
        for ds in (test_ds, val_ds):
            visualize_inference_comparison(
                ds, vis_configs, args.visualization_samples, logger,
                os.path.join(config.BASE_RUN_DIR, f"visualizations_{ds.split}"),
                general_image_size=config.IMAGE_SIZE,
                general_num_classes=config.NUM_CLASSES)
    logger.close()


if __name__ == "__main__":
    main()
