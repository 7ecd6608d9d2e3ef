"""Configurable loss library (train/losses.py get_criterion).

The reference hard-codes BCEWithLogitsLoss (ref: scripts/train.py:135) and
lists "more sophisticated loss functions" as roadmap work (ref:
README.md:180); these tests pin the superset criteria against independent
numpy references and check the YAML wiring end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.config import Config
from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.train import (
    bce_dice_loss,
    bce_with_logits,
    focal_loss,
    get_criterion,
    soft_dice_loss,
    tversky_loss,
)
from unet_zoo_tpu.train.steps import create_train_state, make_train_step


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(shape).astype(np.float32) * 2.0
    z = (rng.uniform(size=shape) > 0.5).astype(np.float32)
    return x, z


def _np_dice(x, z, smooth=1.0):
    p = 1.0 / (1.0 + np.exp(-x.astype(np.float64)))
    p = p.reshape(p.shape[0], -1)
    t = z.astype(np.float64).reshape(z.shape[0], -1)
    inter = (p * t).sum(1)
    dice = (2 * inter + smooth) / (p.sum(1) + t.sum(1) + smooth)
    return float(np.mean(1 - dice))


def test_soft_dice_matches_numpy():
    x, z = _rand((3, 8, 8, 1))
    got = float(soft_dice_loss(jnp.asarray(x), jnp.asarray(z)))
    assert got == pytest.approx(_np_dice(x, z), rel=1e-5)


def test_soft_dice_empty_mask_is_zero_loss():
    # all-background sample with confident-background logits: the smooth
    # term drives the loss to ~0 (analogue of the metric's union==0 -> 1.0)
    x = np.full((1, 8, 8, 1), -12.0, np.float32)
    z = np.zeros((1, 8, 8, 1), np.float32)
    assert float(soft_dice_loss(jnp.asarray(x), jnp.asarray(z))) < 1e-3


def test_bce_dice_is_weighted_sum():
    x, z = _rand((2, 8, 8, 1), seed=1)
    xs, zs = jnp.asarray(x), jnp.asarray(z)
    got = float(bce_dice_loss(xs, zs, bce_weight=0.3, dice_weight=0.7))
    want = 0.3 * float(bce_with_logits(xs, zs)) + \
        0.7 * float(soft_dice_loss(xs, zs))
    assert got == pytest.approx(want, rel=1e-6)


def test_focal_matches_numpy():
    x, z = _rand((2, 8, 8, 1), seed=2)
    gamma, alpha = 2.0, 0.25
    p = 1.0 / (1.0 + np.exp(-x.astype(np.float64)))
    pt = p * z + (1 - p) * (1 - z)
    w = alpha * z + (1 - alpha) * (1 - z)
    ce = -(z * np.log(p) + (1 - z) * np.log(1 - p))
    want = float(np.mean(w * (1 - pt) ** gamma * ce))
    got = float(focal_loss(jnp.asarray(x), jnp.asarray(z),
                           gamma=gamma, alpha=alpha))
    assert got == pytest.approx(want, rel=1e-5)


def test_focal_gamma_zero_no_alpha_is_bce():
    x, z = _rand((2, 8, 8, 1), seed=3)
    got = float(focal_loss(jnp.asarray(x), jnp.asarray(z),
                           gamma=0.0, alpha=None))
    assert got == pytest.approx(
        float(bce_with_logits(jnp.asarray(x), jnp.asarray(z))), rel=1e-6)


def test_focal_stable_at_extreme_logits():
    x = jnp.asarray([[1000.0, -1000.0]], jnp.float32)
    z = jnp.asarray([[0.0, 1.0]], jnp.float32)
    val = focal_loss(x, z)
    grad = jax.grad(lambda a: focal_loss(a, z))(x)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_tversky_half_half_is_dice():
    # alpha=beta=0.5 recovers soft Dice exactly when the smooth terms
    # align: (I+s)/(I+.5FP+.5FN+s) == (2I+2s)/(2I+FP+FN+2s)
    x, z = _rand((2, 8, 8, 1), seed=4)
    xs, zs = jnp.asarray(x), jnp.asarray(z)
    got = float(tversky_loss(xs, zs, alpha=0.5, beta=0.5, smooth=0.5))
    assert got == pytest.approx(
        float(soft_dice_loss(xs, zs, smooth=1.0)), rel=1e-5)


def test_tversky_beta_penalizes_misses():
    # under-segmentation (confident-background where mask is 1): higher
    # beta must cost more than higher alpha
    x = np.full((1, 8, 8, 1), -4.0, np.float32)
    z = np.ones((1, 8, 8, 1), np.float32)
    xs, zs = jnp.asarray(x), jnp.asarray(z)
    fn_heavy = float(tversky_loss(xs, zs, alpha=0.3, beta=0.7))
    fp_heavy = float(tversky_loss(xs, zs, alpha=0.7, beta=0.3))
    assert fn_heavy > fp_heavy


def test_get_criterion_factory():
    x, z = _rand((2, 4, 4, 1), seed=5)
    xs, zs = jnp.asarray(x), jnp.asarray(z)
    assert get_criterion("bce") is bce_with_logits
    assert get_criterion("BCE") is bce_with_logits
    tv = get_criterion("tversky", alpha=0.4, beta=0.6)
    assert float(tv(xs, zs)) == pytest.approx(
        float(tversky_loss(xs, zs, alpha=0.4, beta=0.6)), rel=1e-6)
    with pytest.raises(ValueError, match="Unknown loss"):
        get_criterion("hinge")
    with pytest.raises(ValueError, match="no loss_kwargs"):
        get_criterion("bce", smooth=2.0)


def test_config_parses_loss_fields(tmp_path):
    cfg = Config({
        "general": {"project_name": "t", "working_dir": str(tmp_path)},
        "data": {"dataset_dir": "unused", "num_workers": 0},
        "training": {
            "epochs": 1, "batch_size": 2, "learning_rate": 1e-3,
            "early_stopping_patience": 5, "lr_scheduler_patience": 3,
            "lr_scheduler_factor": 0.2, "min_lr": 1e-7, "num_classes": 1,
            "loss": "bce_dice", "loss_kwargs": {"dice_weight": 0.7},
        },
    }, create_dirs=False)
    assert cfg.LOSS == "bce_dice"
    assert cfg.LOSS_KWARGS == {"dice_weight": 0.7}
    # default stays reference-faithful
    cfg2 = Config({
        "general": {"project_name": "t", "working_dir": str(tmp_path)},
        "data": {"dataset_dir": "unused", "num_workers": 0},
        "training": {
            "epochs": 1, "batch_size": 2, "learning_rate": 1e-3,
            "early_stopping_patience": 5, "lr_scheduler_patience": 3,
            "lr_scheduler_factor": 0.2, "min_lr": 1e-7, "num_classes": 1,
        },
    }, create_dirs=False)
    assert cfg2.LOSS == "bce" and cfg2.LOSS_KWARGS == {}


@pytest.mark.parametrize("loss_name", ["dice", "bce_dice", "focal", "tversky"])
def test_train_step_with_criterion_learns(loss_name):
    # the criterion plumbs through the jitted train step and optimizes:
    # a tiny unet on a fixed batch must reduce the loss in a few steps
    model = create_model("egeunet", image_size=32, num_classes=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    m = (jnp.arange(32)[None, :, None, None] < 16).astype(
        jnp.float32) * jnp.ones((2, 32, 32, 1))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), learning_rate=1e-2)
    step = make_train_step(model, criterion=get_criterion(loss_name))
    losses = []
    for _ in range(6):
        state, metrics = step(state, x, m)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
