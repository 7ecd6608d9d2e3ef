"""Spatial (H-dim) sharding with halo exchange == unsharded reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from unet_zoo_tpu.parallel import create_mesh
from unet_zoo_tpu.parallel.spatial import (
    halo_exchange_h,
    make_spatial_fn,
    spatial_conv2d,
    spatial_conv_stack,
    spatial_max_pool2,
    spatial_sharding,
    spatial_upsample2,
)


def _mesh():
    return create_mesh(jax.devices()[:8])


def test_halo_exchange_rows():
    mesh = _mesh()
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 16, 1, 1)
    x = jnp.broadcast_to(x, (1, 16, 4, 1))

    def local(xl, _):
        return halo_exchange_h(xl, 1, 1)[:, :, :, :]

    fn = make_spatial_fn(mesh, local)
    out = fn(jax.device_put(x, spatial_sharding(mesh)), jnp.zeros(()))
    out = np.asarray(out)  # [1, 8 shards * 4 rows, 4, 1]
    # shard 0 rows: [zero-halo, 0, 1, halo(2)] (H_local=2 → halo'd 4 rows)
    rows = out[0, :, 0, 0]
    # shard 0 (global rows 0..1) halo'd to 4 rows: [border-zero, 0, 1, 2]
    np.testing.assert_array_equal(rows[:4], [0.0, 0.0, 1.0, 2.0])
    # shard 1 (global rows 2..3) halo'd: [1, 2, 3, 4]
    np.testing.assert_array_equal(rows[4:8], [1.0, 2.0, 3.0, 4.0])
    # last shard (rows 14..15): [13, 14, 15, border-zero]
    np.testing.assert_array_equal(rows[-4:], [13.0, 14.0, 15.0, 0.0])


@pytest.mark.parametrize("kh", [3, 5])
def test_spatial_conv_matches_unsharded(kh):
    mesh = _mesh()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kh, kh, 8, 4)), jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((kh // 2, kh // 2), (kh // 2, kh // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    fn = make_spatial_fn(mesh, lambda xl, kk: spatial_conv2d(xl, kk, 1))
    got = fn(jax.device_put(x, spatial_sharding(mesh)), k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_spatial_conv_stack_and_pool_roundtrip():
    mesh = _mesh()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 64, 16, 4)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 4, 8)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, 8, 4)) * 0.1, jnp.float32)

    # reference: conv-relu-conv, pool, upsample — unsharded
    def ref_fn(x):
        h = jax.lax.conv_general_dilated(
            x, k1, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h)
        h = jax.lax.conv_general_dilated(
            h, k2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        b, hh, ww, c = h.shape
        h = jnp.broadcast_to(h[:, :, None, :, None, :], (b, hh, 2, ww, 2, c))
        return h.reshape(b, hh * 2, ww * 2, c)

    def local(xl, ks):
        ka, kb = ks
        h = spatial_conv2d(xl, ka, 1)
        h = jax.nn.relu(h)
        h = spatial_conv2d(h, kb, 1)
        h = spatial_max_pool2(h)
        return spatial_upsample2(h)

    from jax import shard_map

    spec = P(None, "data", None, None)
    fn = jax.jit(shard_map(local, mesh=mesh, in_specs=(spec, P()),
                           out_specs=spec, check_vma=False))
    got = fn(jax.device_put(x, spatial_sharding(mesh)), (k1, k2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_fn(x)),
                               atol=1e-5, rtol=1e-5)


def test_spatial_conv_stack_helper():
    mesh = _mesh()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 32, 8, 4)), jnp.float32)
    ks = tuple(jnp.asarray(rng.standard_normal((3, 3, 4, 4)) * 0.2,
                           jnp.float32) for _ in range(3))
    fn = spatial_conv_stack(mesh, ks)
    got = fn(jax.device_put(x, spatial_sharding(mesh)), ks)

    ref = x
    for i, k in enumerate(ks):
        ref = jax.lax.conv_general_dilated(
            ref, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if i + 1 < len(ks):
            ref = jax.nn.relu(ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
