"""Visualization artifacts (TPU-native rebuild of ref: unet_zoo/utils/visualize.py).

Per-sample multi-model prediction grids (PNG @150dpi), the 2x2 training-
curve comparison figure (@300dpi) with winner summary and improvement
percentages, and the test-results text summary. The reference's
``_get_main_prediction_logits`` type dispatch (ref :24-49) is unnecessary
here — every model returns the unified ``{'main': ...}`` protocol.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unet_zoo_tpu.data.datasets import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    prepare_images,
    prepare_masks,
)
from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.train.metrics import dice_coefficient
from unet_zoo_tpu.utils.checkpoint import checkpoint_exists, load_checkpoint


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.ioff()
    return plt


def visualize_inference_comparison(
    dataset,
    model_configs: List[Dict],
    num_samples: int,
    logger,
    save_dir: str,
    general_image_size: int = 512,
    general_in_channels: int = 3,
    general_num_classes: int = 1,
    seed: int = 0,
):
    """Compare checkpointed models on random samples (ref :51-197)."""
    plt = _plt()
    loaded = {}
    for entry in model_configs:
        name = entry["name"]
        path = entry["checkpoint"]
        params = entry.get("params", {})
        if not checkpoint_exists(path):
            logger.log_both(
                f"Warning: Checkpoint for {name} not found at {path}. "
                "Skipping visualization for this model.")
            continue
        try:
            params = dict(params)
            model = create_model(
                name,
                in_channels=params.pop("in_channels", general_in_channels),
                num_classes=params.pop("num_classes", general_num_classes),
                image_size=params.pop("image_size", general_image_size),
                **params)
            restored = load_checkpoint(path)
            variables = restored.get("variables", restored)
            apply_fn = jax.jit(
                lambda v, x, m=model: m.apply(v, x, train=False)["main"])
            loaded[name] = (apply_fn, variables)
            logger.log_both(f"{name.replace('_', ' ').title()} loaded for inference")
        except Exception as e:  # per-model isolation (ref :99-101)
            logger.log_both(
                f"Error loading or setting up {name} for visualization from "
                f"{path}: {e}. Skipping this model.")

    if not loaded:
        logger.log_both(
            "No models loaded for visualization. Skipping inference comparison plots.")
        return

    split = getattr(dataset, "split", "data")
    logger.log_both(f"\nComparing trained models on {split} set ({num_samples} samples):")
    os.makedirs(save_dir, exist_ok=True)
    rng = random.Random(seed)
    results_path = os.path.join(save_dir, f"visual_comparison_{split}.txt")
    with open(results_path, "w") as f:
        f.write(f"Visual Comparison Results - {split} Set\n" + "=" * 60 + "\n")
        for i in range(num_samples):
            idx = rng.randint(0, len(dataset) - 1)
            img, mask, path_str = dataset[idx]
            # uint8-transfer datasets normalize on device (prepare_images);
            # f32 datasets arrive pre-normalized — both paths feed the
            # model identical values
            img_batch = prepare_images(jnp.asarray(img)[None])
            mask_batch = prepare_masks(jnp.asarray(mask)[None])

            sample_dices, preds = {}, {}
            for name, (apply_fn, variables) in loaded.items():
                logits = apply_fn(variables, img_batch)
                if logits.shape[-1] > 1 and general_num_classes == 1:
                    logits = logits[..., :1]
                sample_dices[name] = float(dice_coefficient(logits, mask_batch))
                preds[name] = np.asarray(
                    (jax.nn.sigmoid(logits[0, :, :, 0]) > 0.5)).astype(np.float32)

            text = f"Image: {os.path.basename(path_str)}\n"
            for name, dc in sample_dices.items():
                text += f"  {name.replace('_', ' ').title()} DICE: {dc:.5f}\n"
            winner = max(sample_dices, key=sample_dices.get)
            text += (f"  Winner: {winner.replace('_', ' ').title()} "
                     f"(Dice: {sample_dices[winner]:.5f})\n\n")
            logger.log_both(text)
            f.write(text)

            if np.asarray(img).dtype == np.uint8:
                img_disp = np.asarray(img).astype(np.float32) / 255.0
            else:
                img_disp = np.clip(
                    np.asarray(img) * IMAGENET_STD + IMAGENET_MEAN, 0, 1)
            num_cols = 2 + len(loaded)
            plt.figure(figsize=(num_cols * 5, 5))
            plt.subplot(1, num_cols, 1)
            plt.imshow(img_disp)
            plt.title("Original Image")
            plt.axis("off")
            for col, (name, pred) in enumerate(preds.items(), start=2):
                plt.subplot(1, num_cols, col)
                plt.imshow(pred, cmap="gray", vmin=0, vmax=1)
                plt.title(f"{name.replace('_', ' ').title()}\n"
                          f"(Dice: {sample_dices[name]:.4f})")
                plt.axis("off")
            plt.subplot(1, num_cols, num_cols)
            plt.imshow(np.asarray(mask)[:, :, 0], cmap="gray", vmin=0, vmax=1)
            plt.title("Ground Truth")
            plt.axis("off")
            plt.suptitle(f"Model Comparison: {os.path.basename(path_str)}")
            plt.tight_layout()
            out_path = os.path.join(
                save_dir, f"comparison_{i + 1}_{os.path.basename(path_str)}.png")
            plt.savefig(out_path, dpi=150, bbox_inches="tight")
            logger.log_both(f"Comparison plot {i + 1} saved to: {out_path}")
            plt.close()


def plot_training_comparison(
    epochs: int,
    all_models_metrics: Dict[str, Tuple[List[float], List[float], List[float], List[float]]],
    all_early_stopping_info: Dict[str, bool],
    logger,
    save_dir: str,
):
    """2x2 train/val loss/Dice comparison + winner summary (ref :199-314)."""
    plt = _plt()
    os.makedirs(save_dir, exist_ok=True)
    model_names = list(all_models_metrics.keys())
    markers = ["o", "s", "^", "D", "x", "P", "*", "h", "v", "X", ">", "<",
               "p", "H", "+", "|", "_", ".", ","]
    colors = ["blue", "green", "red", "purple", "orange", "cyan", "brown",
              "magenta", "lime", "gold", "teal", "darkblue", "darkgreen",
              "darkred", "darkorange", "indigo", "maroon", "olive", "pink"]

    fig, axes = plt.subplots(2, 2, figsize=(18, 12))
    flat = axes.flatten()
    titles = ["Training Loss Comparison", "Validation Loss Comparison",
              "Training DICE Comparison", "Validation DICE Comparison"]
    ylabels = ["Loss", "Loss", "DICE Score", "DICE Score"]

    for i, name in enumerate(model_names):
        tl, td, vl, vd = all_models_metrics[name]
        stopped = all_early_stopping_info.get(name, False)
        xs = list(range(1, len(tl) + 1))
        label = f"{name.replace('_', ' ').title()}{'*' if stopped else ''}"
        style = dict(marker=markers[i % len(markers)],
                     color=colors[i % len(colors)], alpha=0.7, label=label)
        flat[0].plot(xs, tl, **style)
        flat[1].plot(xs, vl, **style)
        flat[2].plot(xs, td, **style)
        flat[3].plot(xs, vd, **style)

    for ax, title, ylabel in zip(flat, titles, ylabels):
        ax.set_title(title, fontsize=14)
        ax.set_xlabel("Epochs", fontsize=12)
        ax.set_ylabel(ylabel, fontsize=12)
        ax.grid(True, alpha=0.3)
        ax.legend(fontsize=10)

    plt.figtext(0.02, 0.02, "* indicates early stopping", fontsize=10,
                style="italic")
    plt.tight_layout(rect=[0, 0.03, 1, 0.95])
    plt.suptitle("Model Training Metrics Comparison", fontsize=16, y=0.98)
    plot_path = os.path.join(save_dir, "training_comparison_plots.png")
    plt.savefig(plot_path, dpi=300, bbox_inches="tight")
    logger.log_both(f"Training comparison plot saved to: {plot_path}")
    plt.close()

    summary = "\n" + "=" * 70
    summary += "\nFINAL MODEL COMPARISON SUMMARY"
    summary += "\n" + "=" * 70
    best_val, winner = -1.0, "N/A"
    for name in model_names:
        tl, td, vl, vd = all_models_metrics[name]
        stopped = all_early_stopping_info.get(name, False)
        if vd:
            if max(vd) > best_val:
                best_val, winner = max(vd), name.replace("_", " ").title()
            up = name.replace("_", " ").upper()
            summary += (f"\n\n{up} - Training Epochs: {len(tl)} "
                        f"{'(Early Stopped)' if stopped else ''}")
            summary += f"\n{up} - Best Training DICE: {max(td):.4f}"
            summary += f"\n{up} - Best Validation DICE: {max(vd):.4f}"
            summary += f"\n{up} - Final Training Loss: {tl[-1]:.4f}"
            summary += f"\n{up} - Final Validation Loss: {vl[-1]:.4f}"
        else:
            summary += f"\n\n{name.replace('_', ' ').upper()} - No training data available."
    summary += f"\n\nOVERALL WINNER (based on Validation DICE): {winner}"
    summary += f"\nBest Validation DICE achieved: {best_val:.4f}"
    summary += "\n\nEARLY STOPPING SUMMARY:"
    for name, stopped in all_early_stopping_info.items():
        summary += (f"\n  {name.replace('_', ' ').title()}: "
                    f"{'Triggered' if stopped else 'Not triggered'}")
    if len(model_names) > 1 and best_val > 0:
        summary += (f"\n{winner} improvements over other models "
                    "(based on best Validation DICE):")
        for name in model_names:
            if name == winner.lower().replace(" ", "_"):
                continue
            other = max(all_models_metrics[name][3]) if all_models_metrics[name][3] else 0
            if other > 0:
                summary += (f"\n  vs {name.replace('_', ' ').title()}: "
                            f"{((best_val - other) / other) * 100:.2f}%")
    summary += "\n" + "=" * 70
    logger.log_both(summary)
    with open(os.path.join(save_dir, "training_summary.txt"), "w") as f:
        f.write(summary)


def save_all_test_results(all_test_results: Dict[str, Tuple[float, float]],
                          test_results_path: str, logger):
    """Text summary of test metrics with winner (ref :316-347)."""
    text = "=" * 60 + "\nFINAL TEST SET EVALUATION RESULTS\n" + "=" * 60 + "\n\n"
    best, winner = -1.0, "N/A"
    for name, (loss, dc) in all_test_results.items():
        text += f"{name.replace('_', ' ').title()} Test Results:\n"
        text += f"  Test Loss: {loss:.6f}\n  Test DICE: {dc:.6f}\n\n"
        if dc > best:
            best, winner = dc, name.replace("_", " ").title()
    text += f"BEST TEST PERFORMANCE: {winner}\n"
    text += f"Best Test DICE: {best:.6f}\n" + "=" * 60 + "\n"
    with open(test_results_path, "w") as f:
        f.write(text)
    logger.log_both(text)
