"""Elastic checkpoint restore across device topologies.

A production failure-recovery property the reference cannot express at
all (its checkpoints are single-GPU state_dicts, ref:
utils/multi_gpu.py:39-42): a checkpoint written from an FSDP-sharded
train state on an 8-device mesh must restore — bit-exact — onto a
different topology (single device, or a 4-device mesh with a different
shard layout) and keep training. Orbax saves fully-gathered host
arrays in the single-process regime (utils/checkpoint._to_host), so
restore is topology-free; these tests pin that contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.parallel import (
    create_mesh,
    shard_batch,
    shard_state_fsdp,
)
from unet_zoo_tpu.train.steps import (
    create_train_state,
    make_train_step,
    variables_of,
)
from unet_zoo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _tree_allclose(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0,
                                   atol=0)


@pytest.mark.slow
def test_fsdp_checkpoint_restores_on_other_topologies(tmp_path):
    model = create_model("unet", image_size=32)
    mesh8 = create_mesh()
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((8, 32, 32, 3)), learning_rate=1e-3)
    state = shard_state_fsdp(mesh8, state)

    # advance one real step so opt_state is non-trivial (Adam moments)
    rng = np.random.default_rng(0)
    imgs, masks = shard_batch(
        mesh8,
        rng.standard_normal((8, 32, 32, 3)).astype(np.float32),
        (rng.uniform(size=(8, 32, 32, 1)) > 0.5).astype(np.float32),
    )
    state, _ = make_train_step(model)(state, imgs, masks)

    ckpt = str(tmp_path / "unet_last")
    save_checkpoint(ckpt, {
        "variables": variables_of(state),
        "opt_state": state.opt_state,
        "step": int(state.step),
    })

    # (a) restore single-device, typed via a fresh target state
    fresh = create_train_state(model, jax.random.PRNGKey(1),
                               jnp.zeros((8, 32, 32, 3)), learning_rate=1e-3)
    restored = load_checkpoint(ckpt, {
        "variables": variables_of(fresh),
        "opt_state": fresh.opt_state,
        "step": 0,
    })
    _tree_allclose(restored["variables"]["params"], state.params)
    _tree_allclose(restored["opt_state"], state.opt_state)
    assert int(np.asarray(restored["step"])) == 1

    single = fresh.replace(
        params=restored["variables"]["params"],
        batch_stats=restored["variables"].get("batch_stats", {}),
        opt_state=restored["opt_state"],
        step=jnp.asarray(restored["step"]))
    single2, metrics = make_train_step(model)(
        single, jnp.asarray(rng.standard_normal((4, 32, 32, 3)),
                            jnp.float32),
        jnp.asarray((rng.uniform(size=(4, 32, 32, 1)) > 0.5), jnp.float32))
    assert np.isfinite(float(metrics["loss"]))
    assert int(single2.step) == 2

    # (b) restore onto a DIFFERENT mesh (4 devices => different FSDP
    # shard sizes) and keep training there
    mesh4 = create_mesh(jax.devices()[:4])
    fresh4 = create_train_state(model, jax.random.PRNGKey(2),
                                jnp.zeros((8, 32, 32, 3)),
                                learning_rate=1e-3)
    r4 = load_checkpoint(ckpt, {
        "variables": variables_of(fresh4),
        "opt_state": fresh4.opt_state,
        "step": 0,
    })
    state4 = shard_state_fsdp(mesh4, fresh4.replace(
        params=r4["variables"]["params"],
        batch_stats=r4["variables"].get("batch_stats", {}),
        opt_state=r4["opt_state"],
        step=jnp.asarray(r4["step"])))
    leaf = state4.params["DownSample_3"]["DoubleConv_0"]["ConvNormAct_0"][
        "Conv_0"]["kernel"]
    assert not leaf.sharding.is_fully_replicated
    _tree_allclose(state4.params, state.params)

    im4, mk4 = shard_batch(
        mesh4,
        rng.standard_normal((8, 32, 32, 3)).astype(np.float32),
        (rng.uniform(size=(8, 32, 32, 1)) > 0.5).astype(np.float32),
    )
    state4, metrics4 = make_train_step(model)(state4, im4, mk4)
    assert np.isfinite(float(metrics4["loss"]))
    assert int(state4.step) == 2
