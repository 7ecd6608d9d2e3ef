"""E2E: the full `unet` forward under spatial H-sharding matches the
standard (unsharded) flax forward (VERDICT r2 item 5 — the SURVEY §5
'images beyond one chip' capability on a real zoo member)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.parallel.spatial_unet import spatial_unet_apply


def _run(size, n_shards):
    devs = np.array(jax.devices()[:n_shards])
    mesh = Mesh(devs, ("data",))
    m = create_model("unet")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x[:, :32, :32])
    ref = m.module.apply(v, x, train=False)["main"]
    got = spatial_unet_apply(mesh, v)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_spatial_unet_small():
    """64px over 2 shards — fast correctness check (halo exchange at
    every conv, 4 pool levels, ConvT ups, concat, head)."""
    _run(64, 2)


@pytest.mark.slow
def test_spatial_unet_1024px_8shards():
    """1024px image H-sharded over the full 8-device CPU mesh — the
    'image beyond one chip' configuration."""
    _run(1024, 8)


def test_spatial_unet_train_step_matches_single_device():
    """The spatially-sharded TRAIN step (halo-exchange forward, psum'd
    global-batch BN statistics, gradients through the ppermute halos,
    clip+AdamW) produces the same loss/Dice/running-stats/params as the
    standard single-device `make_train_step` — training, not just
    inference, under spatial sharding."""
    from unet_zoo_tpu.parallel.spatial_unet import make_spatial_train_step
    from unet_zoo_tpu.parallel.spatial import spatial_sharding
    from unet_zoo_tpu.train.steps import create_train_state, make_train_step

    n = 4
    devs = np.array(jax.devices()[:n])
    mesh = Mesh(devs, ("data",))
    m = create_model("unet")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    y = jnp.asarray(
        (rng.standard_normal((2, 64, 64, 1)) > 0.5), jnp.float32)

    # two independent states from the same seed (identical values; the
    # reference step DONATES its input buffers, so they must not alias)
    state_ref = create_train_state(m, jax.random.PRNGKey(0), x[:1, :16, :16],
                                   learning_rate=1e-3)
    state_sp = create_train_state(m, jax.random.PRNGKey(0), x[:1, :16, :16],
                                  learning_rate=1e-3)

    ref_step = make_train_step(m)
    state_ref, met_ref = ref_step(state_ref, x, y)

    sp = spatial_sharding(mesh)
    sp_step = make_spatial_train_step(mesh)
    state_sp, met_sp = sp_step(state_sp, jax.device_put(x, sp),
                               jax.device_put(y, sp))

    assert abs(float(met_ref["loss"]) - float(met_sp["loss"])) < 1e-5
    assert abs(float(met_ref["dice"]) - float(met_sp["dice"])) < 1e-5
    # running BN statistics: pure forward quantities, tight tolerance
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5),
        state_ref.batch_stats, state_sp.batch_stats)
    # post-update params: AdamW's g/sqrt(g^2) normalization amplifies
    # reduction-order noise where g ~ eps, so compare with a loose atol
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3),
        state_ref.params, state_sp.params)

    # a second step keeps training (finite, loss tracks the reference)
    state_ref, met_ref2 = ref_step(state_ref, x, y)
    state_sp, met_sp2 = sp_step(state_sp, jax.device_put(x, sp),
                                jax.device_put(y, sp))
    assert np.isfinite(float(met_sp2["loss"]))
    assert abs(float(met_ref2["loss"]) - float(met_sp2["loss"])) < 1e-3


def test_spatial_stride2_conv_and_bilinear():
    """New halo primitives: stride-2 conv and 2x bilinear (half-pixel
    centers, edge clamp) match their unsharded references."""
    from unet_zoo_tpu.parallel import create_mesh
    from unet_zoo_tpu.parallel.spatial import (
        make_spatial_fn,
        spatial_conv2d_s2,
        spatial_sharding,
        spatial_upsample2_bilinear,
    )

    mesh = create_mesh(np.array(jax.devices()[:4]).reshape(4))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)), jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    fn = make_spatial_fn(mesh, lambda xl, kk: spatial_conv2d_s2(xl, kk))
    got = fn(jax.device_put(x, spatial_sharding(mesh)), k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    ref2 = jax.image.resize(x, (2, 64, 32, 8), "bilinear")
    fn2 = make_spatial_fn(mesh, lambda xl, _:
                          spatial_upsample2_bilinear(xl))
    got2 = fn2(jax.device_put(x, spatial_sharding(mesh)), jnp.zeros(()))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               atol=1e-5, rtol=1e-5)
