"""Pallas depthwise conv == XLA grouped conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.ops.pallas.depthwise import _pick_cb, depthwise_conv2d


@pytest.mark.parametrize("shape,k", [
    ((2, 16, 16, 8), 3),
    ((1, 17, 13, 6), 3),   # odd spatial, non-128 channels
    ((2, 12, 12, 4), 5),
    ((1, 15, 15, 2), 7),
])
def test_depthwise_matches_xla(shape, k):
    rng = np.random.default_rng(0)
    b, h, w, c = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((k, k, c)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)

    pad = (k - 1) // 2
    ref = jax.lax.conv_general_dilated(
        x, kern[:, :, None, :], (1, 1), ((pad, pad), (pad, pad)),
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias

    got = depthwise_conv2d(x, kern, bias, k=k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_depthwise_no_bias():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((3, 3, 4)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, kern[:, :, None, :], (1, 1), ((1, 1), (1, 1)),
        feature_group_count=4, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = depthwise_conv2d(x, kern, None, k=3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pick_cb_divides_channels():
    for hp, wp, c in [(66, 66, 256), (258, 258, 128), (130, 130, 160),
                      (34, 34, 96)]:
        cb = _pick_cb(hp, wp, c)
        assert c % cb == 0
        assert hp * wp * cb * 2 <= 6 * 2**20 or cb == 1
