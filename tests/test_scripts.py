"""End-to-end script integration test: drive scripts/train_all.py as a
subprocess on the CPU backend against a tiny on-disk dataset."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_train_all_pipeline_end_to_end(tmp_path):
    from PIL import Image

    ds_dir = tmp_path / "ds"
    rng = np.random.default_rng(0)
    for split, n in [("train", 4), ("valid", 2), ("test", 2)]:
        (ds_dir / split / "images").mkdir(parents=True)
        (ds_dir / split / "masks").mkdir(parents=True)
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
            ).save(ds_dir / split / "images" / f"{i}.png")
            m = np.zeros((40, 40), np.uint8)
            m[10:30, 10:30] = 255
            Image.fromarray(m).save(ds_dir / split / "masks" / f"{i}.png")

    cfg = f"""
general:
  project_name: test
  working_dir: "{tmp_path}/runs"
data:
  dataset_dir: "{ds_dir}"
  num_workers: 1
  image_size: 32
training:
  epochs: 1
  batch_size: 2
  learning_rate: 0.001
  early_stopping_patience: 5
  lr_scheduler_patience: 3
  lr_scheduler_factor: 0.5
  min_lr: 1e-6
  num_classes: 1
gpu:
  use_multi_gpu: true
  gpu_ids: [0, 1, 2, 3, 4, 5, 6, 7]
  single_gpu_id: 0
models:
  names: [unet]
  params: {{}}
"""
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(cfg)

    env = dict(os.environ)
    env["UNET_ZOO_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8"
                        + " --xla_backend_optimization_level=0").strip()
    root = os.path.join(os.path.dirname(__file__), "..")
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "train_all.py"),
         "--config", str(cfg_path), "--visualization-samples", "1"],
        capture_output=True, text=True, timeout=900, env=env, cwd=root)
    assert proc.returncode == 0, proc.stderr[-3000:]

    run_dirs = list((tmp_path / "runs").glob("overall_runs_*"))
    assert len(run_dirs) == 1
    run = run_dirs[0]
    assert (run / "unet" / "checkpoints" / "unet_best" / "arrays").is_dir()
    assert (run / "unet" / "checkpoints" / "unet_last" / "arrays").is_dir()
    assert (run / "test_results_summary.txt").exists()
    assert list((run / "visualizations_test").glob("*.png"))
