"""Production reachability of the expert/pipeline/spatial parallelism axes.

Round-3 verdict: EP, PP and spatial existed as library + dryrun only —
`scripts/train.py` + YAML could not reach them. These tests drive each
axis end-to-end through the production path (`gpu.multi_gpu_strategy` in
the YAML → train/loop.py dispatch) on the forced 8-device CPU mesh, plus
in-process parity checks for the pipelined uctransnet bridge.
"""

import os
import subprocess
import sys

import numpy as np
import pytest


def _write_tiny_ds(tmp_path, n_train=8, n_valid=4, size=40):
    from PIL import Image

    ds_dir = tmp_path / "ds"
    rng = np.random.default_rng(0)
    for split, n in [("train", n_train), ("valid", n_valid)]:
        (ds_dir / split / "images").mkdir(parents=True)
        (ds_dir / split / "masks").mkdir(parents=True)
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            ).save(ds_dir / split / "images" / f"{i}.png")
            m = np.zeros((size, size), np.uint8)
            m[10:30, 10:30] = 255
            Image.fromarray(m).save(ds_dir / split / "masks" / f"{i}.png")
    return ds_dir


def _run_train(tmp_path, model, strategy, batch_size, tpu_extra="",
               image_size=32):
    ds_dir = _write_tiny_ds(tmp_path)
    cfg = f"""
general:
  project_name: test
  working_dir: "{tmp_path}/runs"
data:
  dataset_dir: "{ds_dir}"
  num_workers: 0
  image_size: {image_size}
training:
  epochs: 1
  batch_size: {batch_size}
  learning_rate: 0.001
  early_stopping_patience: 5
  lr_scheduler_patience: 3
  lr_scheduler_factor: 0.5
  min_lr: 1e-6
  num_classes: 1
gpu:
  use_multi_gpu: true
  multi_gpu_strategy: {strategy}
tpu:
{tpu_extra}
models:
  names: [{model}]
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
        [sys.executable, os.path.join(root, "scripts", "train.py"),
         "--config", str(cfg_path)],
        capture_output=True, text=True, timeout=1500, env=env, cwd=root)
    assert proc.returncode == 0, proc.stderr[-3000:] + proc.stdout[-2000:]
    run_dirs = list((tmp_path / "runs").glob("overall_runs_*"))
    assert len(run_dirs) == 1
    ckpt = run_dirs[0] / model / "checkpoints" / f"{model}_last" / "arrays"
    assert ckpt.is_dir(), f"missing last checkpoint for {model}"
    logs = "".join(
        p.read_text() for p in (run_dirs[0] / model / "logs").glob("*.txt"))
    assert f"Parallelism: {strategy}" in logs
    return logs


@pytest.mark.slow
def test_expert_strategy_yaml_end_to_end(tmp_path):
    """unext_moe trains expert-sharded from a YAML line (GShard EP)."""
    _run_train(tmp_path, "unext_moe", "expert", batch_size=4,
               tpu_extra="  model_parallel_size: 2\n")


@pytest.mark.slow
def test_pipeline_strategy_yaml_end_to_end(tmp_path):
    """uctransnet trains with its bridge GPipe-pipelined from YAML."""
    _run_train(tmp_path, "uctransnet", "pipeline", batch_size=4,
               tpu_extra=("  model_parallel_size: 4\n"
                          "  pipeline_microbatches: 2\n"))


@pytest.mark.slow
def test_spatial_strategy_yaml_end_to_end(tmp_path):
    """unet trains H-sharded (halo exchange) from a YAML line."""
    _run_train(tmp_path, "unet", "spatial", batch_size=2,
               tpu_extra="  num_devices: 2\n")


def test_with_bridge_pipeline_rejects_models_without_bridge():
    import jax

    from unet_zoo_tpu.models import create_model
    from unet_zoo_tpu.parallel import create_mesh

    mesh = create_mesh(jax.devices()[:8], model_axis=4)
    with pytest.raises(ValueError, match="no pipelinable stage stack"):
        create_model("unet").with_bridge_pipeline(mesh)


def test_strategy_validation_errors(tmp_path):
    """Clear errors for invalid strategy configs (no silent fallbacks)."""
    import jax

    from unet_zoo_tpu.config import Config
    from unet_zoo_tpu.models import create_model
    from unet_zoo_tpu.parallel import create_mesh
    from unet_zoo_tpu.train.loop import train_model
    from unet_zoo_tpu.utils.logger import Logger

    def cfg_for(strategy, image_size=32, batch=4, model_par=1):
        return Config({
            "general": {"project_name": "t", "working_dir": str(tmp_path)},
            "data": {"dataset_dir": str(tmp_path), "num_workers": 0,
                     "image_size": image_size},
            "training": {"epochs": 1, "batch_size": batch,
                         "learning_rate": 1e-3,
                         "early_stopping_patience": 5,
                         "lr_scheduler_patience": 3,
                         "lr_scheduler_factor": 0.5, "min_lr": 1e-6,
                         "num_classes": 1},
            "gpu": {"use_multi_gpu": True, "multi_gpu_strategy": strategy},
            "tpu": {"model_parallel_size": model_par},
        }, create_dirs=True)

    logger = Logger(str(tmp_path / "t.log"))
    mesh1d = create_mesh(jax.devices()[:8])  # model axis size 1

    # expert/pipeline need a model axis >= 2
    for strat in ("expert", "pipeline"):
        with pytest.raises(ValueError, match="model_parallel_size"):
            train_model(create_model("unext_moe", image_size=32), [], [],
                        cfg_for(strat), "m", str(tmp_path / "b"),
                        str(tmp_path / "l"), logger, mesh=mesh1d)

    # spatial: image_size must divide divisor * shards; topology known
    mesh8 = create_mesh(jax.devices()[:8])
    with pytest.raises(ValueError, match="divisible by 128"):
        train_model(create_model("unet"), [], [], cfg_for("spatial", 32),
                    "m", str(tmp_path / "b"), str(tmp_path / "l"),
                    logger, mesh=mesh8)
    mesh2 = create_mesh(jax.devices()[:2])
    with pytest.raises(ValueError, match="spatial supports"):
        train_model(create_model("vnet"), [], [], cfg_for("spatial", 32),
                    "m", str(tmp_path / "b"), str(tmp_path / "l"),
                    logger, mesh=mesh2)

    # spatial divisor follows the CONFIGURED depth (advisor r4: a YAML
    # depth 6 attention_unet needs 32/shard, not the default-depth 16)
    # (96 inits cleanly but is not divisible by 32*2 shards = 64)
    with pytest.raises(ValueError, match="divisible by 64"):
        train_model(create_model("attention_unet", depth=6), [], [],
                    cfg_for("spatial", 96), "m", str(tmp_path / "b"),
                    str(tmp_path / "l"), logger, mesh=mesh2)
    # flagship topology: s4 stem x 3 downs -> 32/shard
    with pytest.raises(ValueError, match="divisible by 64"):
        train_model(create_model("unet_tpu"), [], [],
                    cfg_for("spatial", 96), "m", str(tmp_path / "b"),
                    str(tmp_path / "l"), logger, mesh=mesh2)

    # spatial ignores neither grad accumulation nor loss kwargs
    # (advisor r4: they were silently dropped before)
    cfg_ga = cfg_for("spatial", 64)
    cfg_ga.GRAD_ACCUM_STEPS = 2
    with pytest.raises(ValueError, match="grad_accum_steps"):
        train_model(create_model("unet"), [], [], cfg_ga, "m",
                    str(tmp_path / "b"), str(tmp_path / "l"), logger,
                    mesh=mesh2)
    cfg_lk = cfg_for("spatial", 64)
    cfg_lk.LOSS_KWARGS = {"pos_weight": 2.0}
    with pytest.raises(ValueError, match="loss_kwargs"):
        train_model(create_model("unet"), [], [], cfg_lk, "m",
                    str(tmp_path / "b"), str(tmp_path / "l"), logger,
                    mesh=mesh2)

    # pipeline: microbatch/batch divisibility
    with pytest.raises(ValueError, match="microbatches"):
        train_model(create_model("uctransnet", image_size=32), [], [],
                    cfg_for("pipeline", batch=3, model_par=4), "m",
                    str(tmp_path / "b"), str(tmp_path / "l"), logger,
                    mesh=create_mesh(jax.devices()[:8], model_axis=4))
    logger.close()
