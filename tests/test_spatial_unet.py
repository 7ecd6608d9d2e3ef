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
