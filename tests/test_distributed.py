"""Multi-device tests on the forced 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.parallel import (
    batch_sharding,
    create_mesh,
    replicate_state,
    shard_batch,
)
from unet_zoo_tpu.train.steps import create_train_state, make_train_step, make_eval_step, variables_of


def test_mesh_creation():
    mesh = create_mesh()
    assert mesh.devices.size == jax.device_count()
    assert mesh.axis_names == ("data", "model")


@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    model = create_model("unet")
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    masks = (rng.uniform(size=(8, 32, 32, 1)) > 0.5).astype(np.float32)

    def run(mesh):
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((8, 32, 32, 3)),
                                   learning_rate=1e-3)
        step = make_train_step(model)
        if mesh is not None:
            state = replicate_state(mesh, state)
            im, mk = shard_batch(mesh, imgs, masks)
        else:
            im, mk = jnp.asarray(imgs), jnp.asarray(masks)
        state, metrics = step(state, im, mk)
        return float(metrics["loss"]), float(metrics["dice"]), state

    loss_1, dice_1, state_1 = run(None)
    mesh = create_mesh()
    loss_8, dice_8, state_8 = run(mesh)
    # pre-update forward metrics must agree across shardings (XLA computes
    # BN stats and the loss over the full logical batch either way)
    assert abs(loss_1 - loss_8) < 1e-4, (loss_1, loss_8)
    assert abs(dice_1 - dice_8) < 1e-4
    # note: post-update params are NOT compared — Adam's first step is
    # ±lr*sign(grad), and near-zero grads flip sign under the different
    # reduction orders of different partitionings
    assert int(state_8.step) == 1


def test_fsdp_state_sharding_trains():
    from unet_zoo_tpu.parallel import shard_state_fsdp

    model = create_model("unet")
    mesh = create_mesh()
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((8, 32, 32, 3)), learning_rate=1e-3)
    state = shard_state_fsdp(mesh, state)

    # params actually sharded: at least one big leaf is distributed
    leaf = state.params["DownSample_3"]["DoubleConv_0"]["ConvNormAct_0"][
        "Conv_0"]["kernel"]
    assert not leaf.sharding.is_fully_replicated

    rng = np.random.default_rng(2)
    imgs, masks = shard_batch(
        mesh,
        rng.standard_normal((8, 32, 32, 3)).astype(np.float32),
        (rng.uniform(size=(8, 32, 32, 1)) > 0.5).astype(np.float32),
    )
    step = make_train_step(model)
    state, metrics = step(state, imgs, masks)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    # updated params keep the FSDP sharding (no silent re-replication)
    leaf2 = state.params["DownSample_3"]["DoubleConv_0"]["ConvNormAct_0"][
        "Conv_0"]["kernel"]
    assert not leaf2.sharding.is_fully_replicated


@pytest.mark.slow
def test_shard_map_train_step():
    """Explicit-collective step runs and agrees with the jit-SPMD step on
    forward metrics for a BN-free config... unet has BN, so compare the
    loss loosely (per-shard vs global BN stats differ by design)."""
    from unet_zoo_tpu.parallel.shard_map_step import make_train_step_shard_map

    model = create_model("unet")
    mesh = create_mesh()
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((8, 32, 32, 3)), learning_rate=1e-3)
    state = replicate_state(mesh, state)
    rng = np.random.default_rng(3)
    imgs, masks = shard_batch(
        mesh,
        rng.standard_normal((8, 32, 32, 3)).astype(np.float32),
        (rng.uniform(size=(8, 32, 32, 1)) > 0.5).astype(np.float32),
    )
    step = make_train_step_shard_map(model, mesh)
    new_state, metrics = step(state, imgs, masks)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["dice"]) <= 1.0
    assert int(new_state.step) == 1

    # jit-SPMD comparison: same order of magnitude (BN semantics differ)
    jit_step = make_train_step(model)
    state2 = create_train_state(model, jax.random.PRNGKey(0),
                                jnp.zeros((8, 32, 32, 3)), learning_rate=1e-3)
    state2 = replicate_state(mesh, state2)
    _, m2 = jit_step(state2, imgs, masks)
    assert abs(float(metrics["loss"]) - float(m2["loss"])) < 0.1


def test_sharded_eval_step():
    model = create_model("unet")
    mesh = create_mesh()
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((8, 32, 32, 3)))
    state = replicate_state(mesh, state)
    rng = np.random.default_rng(1)
    imgs, masks = shard_batch(
        mesh,
        rng.standard_normal((8, 32, 32, 3)).astype(np.float32),
        (rng.uniform(size=(8, 32, 32, 1)) > 0.5).astype(np.float32),
    )
    eval_step = make_eval_step(model)
    metrics = eval_step(variables_of(state), imgs, masks)
    assert np.isfinite(float(metrics["loss"]))
    assert metrics["main"].shape == (8, 32, 32, 1)


@pytest.mark.parametrize("strategy,model_axis", [
    ("DataParallel", 1), ("fsdp", 1), ("tensor_parallel", 2),
])
def test_train_model_strategy_dispatch(tmp_path, strategy, model_axis):
    """gpu.multi_gpu_strategy selects the parameter placement end-to-end
    through train_model (ref parses the key at config.py:30 but only ever
    does DataParallel; here fsdp/tensor_parallel are first-class)."""
    from unet_zoo_tpu.config import Config
    from unet_zoo_tpu.data import SyntheticDataset
    from unet_zoo_tpu.data.loader import DataLoader
    from unet_zoo_tpu.parallel import create_mesh_for_batch
    from unet_zoo_tpu.train.loop import train_model
    from unet_zoo_tpu.utils.checkpoint import checkpoint_exists
    from unet_zoo_tpu.utils.logger import Logger

    cfg = Config({
        "general": {"project_name": "t", "working_dir": str(tmp_path)},
        "data": {"dataset_dir": "unused", "num_workers": 1, "image_size": 32},
        "training": {
            "epochs": 1, "batch_size": 4, "learning_rate": 1e-3,
            "early_stopping_patience": 20, "lr_scheduler_patience": 8,
            "lr_scheduler_factor": 0.2, "min_lr": 1e-7, "num_classes": 1,
        },
        "gpu": {"use_multi_gpu": True, "gpu_ids": [],
                "single_gpu_id": 0, "multi_gpu_strategy": strategy},
        "tpu": {"model_parallel_size": model_axis},
    })
    mesh = create_mesh_for_batch(cfg.BATCH_SIZE, max_devices=None,
                                 model_axis=cfg.MODEL_PARALLEL_SIZE)
    assert mesh.devices.shape[1] == model_axis
    model = create_model("unet")
    train_loader = DataLoader(SyntheticDataset(8, 32), batch_size=4,
                              shuffle=True, drop_last=True)
    val_loader = DataLoader(SyntheticDataset(4, 32, seed=1), batch_size=4)
    logger = Logger(str(tmp_path / "log.txt"))
    best = str(tmp_path / "b")
    last = str(tmp_path / "l")
    tl, td, vl, vd, _ = train_model(
        model, train_loader, val_loader, cfg, "unet", best, last, logger,
        mesh=mesh)
    assert np.isfinite(tl[0]) and np.isfinite(vd[0])
    assert checkpoint_exists(best) and checkpoint_exists(last)
    logger.close()


def test_train_model_unknown_strategy_raises(tmp_path):
    from unet_zoo_tpu.config import Config
    from unet_zoo_tpu.data import SyntheticDataset
    from unet_zoo_tpu.data.loader import DataLoader
    from unet_zoo_tpu.parallel import create_mesh_for_batch
    from unet_zoo_tpu.train.loop import train_model
    from unet_zoo_tpu.utils.logger import Logger

    cfg = Config({
        "general": {"project_name": "t", "working_dir": str(tmp_path)},
        "data": {"dataset_dir": "unused", "num_workers": 1, "image_size": 32},
        "training": {
            "epochs": 1, "batch_size": 4, "learning_rate": 1e-3,
            "early_stopping_patience": 20, "lr_scheduler_patience": 8,
            "lr_scheduler_factor": 0.2, "min_lr": 1e-7, "num_classes": 1,
        },
        "gpu": {"use_multi_gpu": True, "gpu_ids": [], "single_gpu_id": 0,
                "multi_gpu_strategy": "hogwild"},
    })
    mesh = create_mesh_for_batch(cfg.BATCH_SIZE)
    model = create_model("unet")
    loader = DataLoader(SyntheticDataset(4, 32), batch_size=4)
    logger = Logger(str(tmp_path / "log.txt"))
    with pytest.raises(ValueError, match="multi_gpu_strategy"):
        train_model(model, loader, loader, cfg, "unet",
                    str(tmp_path / "b"), str(tmp_path / "l"), logger,
                    mesh=mesh)
    logger.close()
