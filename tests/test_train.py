"""Harness tests: train step, loop behavior, schedulers, losses, metrics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.config import Config
from unet_zoo_tpu.data import SyntheticDataset
from unet_zoo_tpu.data.loader import DataLoader
from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.train import bce_with_logits, dice_coefficient, multi_output_loss
from unet_zoo_tpu.train.early_stopping import EarlyStopping
from unet_zoo_tpu.train.lr_scheduler import DiceScheduler
from unet_zoo_tpu.train.steps import (
    create_train_state,
    get_lr,
    make_eval_step,
    make_train_step,
    set_lr,
    variables_of,
)
from unet_zoo_tpu.utils.checkpoint import checkpoint_exists, load_checkpoint
from unet_zoo_tpu.utils.logger import Logger


def _tiny_config(tmp_path, epochs=2):
    return Config({
        "general": {"project_name": "t", "working_dir": str(tmp_path)},
        "data": {"dataset_dir": "unused", "num_workers": 1, "image_size": 32},
        "training": {
            "epochs": epochs, "batch_size": 4, "learning_rate": 1e-3,
            "early_stopping_patience": 20, "lr_scheduler_patience": 8,
            "lr_scheduler_factor": 0.2, "min_lr": 1e-7, "num_classes": 1,
        },
        "gpu": {"use_multi_gpu": False, "gpu_ids": [], "single_gpu_id": 0},
    })


def test_dice_edge_cases():
    # union == 0 → 1.0 (ref: utils/metrics.py:20-21)
    logits = jnp.full((1, 4, 4, 1), -10.0)
    target = jnp.zeros((1, 4, 4, 1))
    assert float(dice_coefficient(logits, target)) == 1.0
    # perfect prediction → ~1
    logits = jnp.where(jnp.arange(16).reshape(1, 4, 4, 1) < 8, 10.0, -10.0)
    target = (jnp.arange(16).reshape(1, 4, 4, 1) < 8).astype(jnp.float32)
    assert float(dice_coefficient(logits, target)) > 0.999


def test_bce_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 1)).astype(np.float32)
    z = (rng.uniform(size=(2, 8, 8, 1)) > 0.5).astype(np.float32)
    got = float(bce_with_logits(jnp.asarray(x), jnp.asarray(z)))
    ref = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(x), torch.from_numpy(z))
    assert abs(got - float(ref)) < 1e-6


def test_multi_output_loss_weights():
    outputs = {
        "main": jnp.zeros((1, 8, 8, 1)),
        "side1": jnp.zeros((1, 4, 4, 1)),  # triggers mask resize
    }
    mask = jnp.zeros((1, 8, 8, 1))
    weights = {"main": 1.0, "side1": 0.5}
    loss = multi_output_loss(outputs, mask, lambda k: weights[k])
    # BCE(0 logits, 0 targets) = log(2) per output
    assert abs(float(loss) - 1.5 * np.log(2.0)) < 1e-5


def test_early_stopping_state_machine():
    es = EarlyStopping(patience=2, min_delta=0.0, verbose=False, mode="max")
    es(0.5, {"w": 1}, 1)
    assert es.best_score == 0.5
    es(0.6, {"w": 2}, 2)
    assert es.best_score == 0.6 and es.counter == 0
    es(0.55, {"w": 3}, 3)
    assert es.counter == 1 and not es.early_stop
    stopped = es(0.55, {"w": 4}, 4)
    assert stopped and es.early_stop and es.stopped_epoch == 4
    assert es.best_weights == {"w": 2}


def test_dice_scheduler_reduces_and_resets():
    sch = DiceScheduler(lr=1.0, patience=2, factor=0.5, min_lr=0.1,
                        min_delta=0.0, verbose=False, mode="max")
    sch.step(0.5, 1)
    for e in range(2, 4):
        sch.step(0.4, e)
    assert sch.lr == 0.5 and sch.counter == 0  # reduced then reset
    for e in range(4, 6):
        sch.step(0.4, e)
    assert sch.lr == 0.25
    for _ in range(20):
        sch.step(0.4)
    assert sch.lr >= 0.1  # floor


def test_train_step_improves_on_synthetic():
    model = create_model("unet")
    ds = SyntheticDataset(8, 32)
    loader = DataLoader(ds, batch_size=4, shuffle=False)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((4, 32, 32, 3)), learning_rate=1e-3)
    train_step = make_train_step(model)
    first = None
    for _ in range(3):
        for imgs, masks, _ in loader:
            state, m = train_step(state, jnp.asarray(imgs), jnp.asarray(masks))
            if first is None:
                first = float(m["loss"])
    assert float(m["loss"]) < first, (first, float(m["loss"]))


def test_lr_set_get_roundtrip():
    model = create_model("unet")
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), learning_rate=1e-3)
    assert abs(get_lr(state) - 1e-3) < 1e-9
    state = set_lr(state, 5e-4)
    assert abs(get_lr(state) - 5e-4) < 1e-9


def test_train_model_loop_writes_checkpoints(tmp_path):
    from unet_zoo_tpu.train.loop import evaluate_model, train_model

    cfg = _tiny_config(tmp_path)
    model = create_model("unet")
    train_loader = DataLoader(SyntheticDataset(8, 32), batch_size=4,
                              shuffle=True, drop_last=True)
    val_loader = DataLoader(SyntheticDataset(4, 32, seed=1), batch_size=4)
    logger = Logger(str(tmp_path / "log.txt"))
    best = str(tmp_path / "unet_best")
    last = str(tmp_path / "unet_last")
    tl, td, vl, vd, stopped = train_model(
        model, train_loader, val_loader, cfg, "unet", best, last, logger)
    assert len(tl) == 2 and len(vd) == 2
    assert checkpoint_exists(best) and checkpoint_exists(last)

    restored = load_checkpoint(best)
    assert "variables" in restored and "params" in restored["variables"]
    loss, dice = evaluate_model(model, restored["variables"], val_loader,
                                "unet", logger)
    assert np.isfinite(loss) and 0.0 <= dice <= 1.0
    logger.close()


@pytest.mark.slow
def test_train_model_resume(tmp_path):
    from unet_zoo_tpu.train.loop import train_model

    model = create_model("unet")
    train_loader = DataLoader(SyntheticDataset(8, 32), batch_size=4,
                              shuffle=True, drop_last=True)
    val_loader = DataLoader(SyntheticDataset(4, 32, seed=1), batch_size=4)
    logger = Logger(str(tmp_path / "log.txt"))
    best = str(tmp_path / "unet_best")
    last = str(tmp_path / "unet_last")

    cfg2 = _tiny_config(tmp_path, epochs=2)
    train_model(model, train_loader, val_loader, cfg2, "unet", best, last,
                logger)
    meta2 = load_checkpoint(last)["meta"]
    assert meta2["epoch"] == 2

    # resume with a 4-epoch budget: only 2 more epochs should run
    cfg4 = _tiny_config(tmp_path, epochs=4)
    tl, td, vl, vd, _ = train_model(
        model, train_loader, val_loader, cfg4, "unet", best, last, logger,
        resume=True)
    assert len(tl) == 2, "resume should run only the remaining epochs"
    meta4 = load_checkpoint(last)["meta"]
    assert meta4["epoch"] == 4
    # optimizer step count carried across the resume (2 epochs x 2 steps each)
    restored = load_checkpoint(last)
    assert int(np.asarray(restored["step"])) == 8
    logger.close()


def test_remat_train_step_matches_plain():
    """jax.checkpoint is a pure scheduling change: the remat train step must
    produce numerically identical updates to the plain one (the
    ModelSpec.train_remat lever only trades FLOPs for activation memory)."""
    model = create_model("unet")
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, 32, 32, 3), jnp.float32)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    masks = (jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 1)) > 0.5
             ).astype(jnp.float32)

    outs = []
    for remat in (False, True):
        state = create_train_state(model, rng, sample, learning_rate=1e-3)
        step = make_train_step(model, remat=remat)
        state, metrics = step(state, imgs, masks)
        outs.append((metrics, state.params))
    (m0, p0), (m1, p1) = outs
    assert np.allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-6)
    leaves0 = jax.tree_util.tree_leaves(p0)
    leaves1 = jax.tree_util.tree_leaves(p1)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_train_remat_spec_plumbing():
    """ModelSpec.train_remat defaults False and is exposed on ZooModel; the
    loop passes it through to make_train_step (bench.py honors it too)."""
    from unet_zoo_tpu.models import _REGISTRY, list_models

    model = create_model("unet")
    assert model.train_remat in (False, True)
    for name in list_models():
        assert isinstance(_REGISTRY[name].train_remat, bool)


def test_grad_accum_matches_plain_for_stateless_model():
    """For a batch-stats-free model (egeunet: GroupNorm only), k-microbatch
    gradient accumulation is exactly the full-batch step: BCE's mean
    reduction is linear in the batch, so mean-of-microbatch-grads equals
    the full-batch grad (up to f32 reassociation)."""
    model = create_model("egeunet", image_size=32)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 32, 32, 3), jnp.float32)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    masks = (jax.random.uniform(jax.random.PRNGKey(2), (4, 32, 32, 1)) > 0.5
             ).astype(jnp.float32)

    outs = []
    for k in (1, 2):
        state = create_train_state(model, rng, sample, learning_rate=1e-3)
        step = make_train_step(model, accum_steps=k)
        state, metrics = step(state, imgs, masks)
        outs.append((metrics, state.params))
    (m0, p0), (m1, p1) = outs
    assert np.allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-5)
    # atol 1e-4 = 10% of one AdamW step (lr 1e-3): Adam's first-step
    # update is sign-like (m/sqrt(v)), so f32 reassociation noise in
    # near-zero grads moves a handful of params by O(1e-5) — observed
    # max 2e-5 on 1/3456 elements
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_grad_accum_bn_model_runs():
    """BN models accumulate too (stats update per microbatch, like k
    sequential smaller batches); the step runs, counts once, stays finite."""
    model = create_model("unet")
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3), jnp.float32))
    step = make_train_step(model, accum_steps=2)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    masks = jnp.zeros((4, 32, 32, 1), jnp.float32).at[:, 8:24, 8:24].set(1.0)
    state, metrics = step(state, imgs, masks)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["dice"]))
    # running stats actually moved off their init
    mean_leaf = jax.tree_util.tree_leaves(state.batch_stats)[0]
    assert float(jnp.max(jnp.abs(mean_leaf))) > 0.0
