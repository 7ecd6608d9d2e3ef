"""Tensor-parallel (channel-sharded) layout on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.parallel import (
    create_mesh,
    shard_batch,
    shard_state_tp,
    tp_sharding_for,
)
from unet_zoo_tpu.train.steps import create_train_state, make_train_step


def _data(seed=0, n=8):
    rng = np.random.default_rng(seed)
    imgs = rng.standard_normal((n, 32, 32, 3)).astype(np.float32)
    masks = (rng.uniform(size=(n, 32, 32, 1)) > 0.5).astype(np.float32)
    return imgs, masks


def test_tp_specs_follow_column_row_pairing():
    mesh = create_mesh(model_axis=4)  # (data=2, model=4)
    model = create_model("unet")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    shardings = tp_sharding_for(mesh, variables)

    blk = shardings["params"]["DownSample_1"]["DoubleConv_0"]
    # column conv: output channels over 'model'; its bias/BN shard with it
    col = blk["ConvNormAct_0"]
    assert col["Conv_0"]["kernel"].spec[-1] == "model"
    assert col["Conv_0"]["bias"].spec == ("model",)
    assert col["BatchNorm_0"]["scale"].spec == ("model",)
    # row conv: input channels over 'model'; full (psum'd) output -> bias
    # and the following BN replicated
    row = blk["ConvNormAct_1"]
    assert row["Conv_0"]["kernel"].spec[2] == "model"
    assert row["Conv_0"]["kernel"].spec[3] is None
    assert row["Conv_0"]["bias"].spec == ()
    assert row["BatchNorm_0"]["scale"].spec == ()
    # 3-channel stem and 1-class head can't split their small axis
    stem = shardings["params"]["DownSample_0"]["DoubleConv_0"][
        "ConvNormAct_0"]["Conv_0"]["kernel"]
    assert stem.spec[2] is None  # cin=3 stays whole (cout=64 is sharded)
    head = shardings["params"]["OutConv_0"]["Conv_0"]["kernel"]
    assert head.spec == ()


@pytest.mark.slow
def test_tp_train_step_matches_single_device():
    model = create_model("unet")
    imgs, masks = _data()

    def run(mesh):
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((8, 32, 32, 3)),
                                   learning_rate=1e-3)
        step = make_train_step(model)
        if mesh is not None:
            state = shard_state_tp(mesh, state)
            im, mk = shard_batch(mesh, imgs, masks)
        else:
            im, mk = jnp.asarray(imgs), jnp.asarray(masks)
        state, metrics = step(state, im, mk)
        return float(metrics["loss"]), float(metrics["dice"]), state

    loss_1, dice_1, _ = run(None)
    loss_tp, dice_tp, state_tp = run(create_mesh(model_axis=4))
    # same logical program: BN stats / loss over the full batch either way
    assert abs(loss_1 - loss_tp) < 1e-4, (loss_1, loss_tp)
    assert abs(dice_1 - dice_tp) < 1e-4
    assert int(state_tp.step) == 1
    # the layout survived the update: column kernels still 'model'-sharded
    leaf = state_tp.params["DownSample_3"]["DoubleConv_0"]["ConvNormAct_0"][
        "Conv_0"]["kernel"]
    assert not leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_tp_specs_place_for_every_zoo_member():
    """The pairing rules must yield placeable (divisible) shardings for
    every registry entry's parameter tree — guards against a rule that
    picks an axis the mesh size doesn't divide."""
    from unet_zoo_tpu.models import list_models

    mesh = create_mesh(model_axis=4)
    for name in list_models():
        model = create_model(name, in_channels=3, num_classes=1,
                             image_size=64,
                             **({"window_size": 8}
                                if name == "swin_unet_v2" else {}))
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))
        placed = jax.tree_util.tree_map(
            jax.device_put, dict(variables), tp_sharding_for(mesh,
                                                             dict(variables)))
        jax.block_until_ready(placed)


def test_tp_eval_forward_finite():
    from unet_zoo_tpu.train.steps import make_eval_step, variables_of

    model = create_model("unet")
    mesh = create_mesh(model_axis=4)
    state = create_train_state(model, jax.random.PRNGKey(1),
                               jnp.zeros((4, 32, 32, 3)), learning_rate=1e-3)
    state = shard_state_tp(mesh, state)
    imgs, masks = _data(seed=3, n=4)
    imgs, masks = shard_batch(mesh, imgs, masks)
    eval_step = make_eval_step(model)
    metrics = eval_step(variables_of(state), imgs, masks)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["dice"]))
