"""Visualization artifact tests (Agg backend, no display)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.data import SyntheticDataset
from unet_zoo_tpu.models import create_model, get_model_config
from unet_zoo_tpu.train.steps import create_train_state, variables_of
from unet_zoo_tpu.utils.checkpoint import save_checkpoint
from unet_zoo_tpu.utils.logger import Logger
from unet_zoo_tpu.utils.visualize import (
    plot_training_comparison,
    save_all_test_results,
    visualize_inference_comparison,
)


def test_config_dict_attr_access():
    cfg = get_model_config("uctransnet")
    assert cfg.base_channel == 16
    assert cfg.transformer.num_layers == 4
    assert get_model_config("unet") == {}


def test_plot_training_comparison(tmp_path):
    logger = Logger(None)
    metrics = {
        "unet": ([0.5, 0.4], [0.6, 0.7], [0.55, 0.45], [0.58, 0.68]),
        "resunet": ([0.6, 0.5], [0.5, 0.6], [0.65, 0.55], [0.48, 0.58]),
    }
    plot_training_comparison(2, metrics, {"unet": True, "resunet": False},
                             logger, str(tmp_path))
    assert (tmp_path / "training_comparison_plots.png").exists()
    summary = (tmp_path / "training_summary.txt").read_text()
    assert "OVERALL WINNER" in summary and "Unet" in summary


def test_save_all_test_results(tmp_path):
    logger = Logger(None)
    out = tmp_path / "results.txt"
    save_all_test_results({"unet": (0.5, 0.8), "resunet": (0.6, 0.7)},
                          str(out), logger)
    text = out.read_text()
    assert "BEST TEST PERFORMANCE: Unet" in text


def test_visualize_inference_comparison(tmp_path):
    model = create_model("unet")
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    ckpt = str(tmp_path / "unet_best")
    save_checkpoint(ckpt, {"variables": variables_of(state)})

    ds = SyntheticDataset(4, 32)
    ds.split = "test"
    logger = Logger(None)
    visualize_inference_comparison(
        ds,
        [{"name": "unet", "checkpoint": ckpt, "params": {}},
         {"name": "missing", "checkpoint": str(tmp_path / "nope"),
          "params": {}}],
        num_samples=1, logger=logger, save_dir=str(tmp_path / "vis"),
        general_image_size=32)
    pngs = list((tmp_path / "vis").glob("*.png"))
    assert pngs, "comparison PNG not written"
    assert (tmp_path / "vis" / "visual_comparison_test.txt").exists()


def test_egeunet_flag_paths():
    x = jnp.zeros((1, 64, 64, 3))
    for kwargs, keys in [
        ({"gt_ds": False}, {"main"}),
        ({"bridge": False}, {"main", "side1", "side2", "side3", "side4",
                             "side5"}),
    ]:
        m = create_model("egeunet", image_size=64, **kwargs)
        out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
        assert set(out.keys()) == keys, (kwargs, set(out.keys()))