"""Ops golden tests: resize/pool semantics vs PyTorch (CPU torch baked in)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from unet_zoo_tpu.ops import (
    avg_pool2d,
    max_pool2d,
    pad_to_match,
    resize_bilinear,
    resize_nearest,
    upsample2x_nearest,
)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("in_hw,out_hw", [((8, 8), (16, 16)), ((16, 12), (7, 9)), ((5, 5), (10, 10))])
def test_resize_bilinear_matches_torch(align_corners, in_hw, out_hw):
    x = _rand((2, *in_hw, 3))
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align_corners))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
        mode="bilinear", align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((8, 8), (16, 16)), ((9, 7), (18, 14)), ((16, 16), (5, 5))])
def test_resize_nearest_matches_torch(in_hw, out_hw):
    x = _rand((2, *in_hw, 3), seed=1)
    got = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="nearest"
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, atol=0)


def test_upsample2x_nearest_equals_resize():
    x = jnp.asarray(_rand((1, 6, 5, 4), seed=2))
    np.testing.assert_allclose(
        np.asarray(upsample2x_nearest(x)),
        np.asarray(resize_nearest(x, (12, 10))),
        atol=0,
    )


@pytest.mark.parametrize("hw", [(8, 8), (9, 9), (7, 10)])
def test_max_pool_matches_torch(hw):
    x = _rand((2, *hw, 3), seed=3)
    got = np.asarray(max_pool2d(jnp.asarray(x), 2))
    ref = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2, 2)
    np.testing.assert_allclose(got, ref.permute(0, 2, 3, 1).numpy(), atol=0)


def test_avg_pool_matches_torch():
    x = _rand((2, 8, 8, 3), seed=4)
    got = np.asarray(avg_pool2d(jnp.asarray(x), 2))
    ref = F.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2, 2)
    np.testing.assert_allclose(got, ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_pad_to_match():
    x = jnp.ones((1, 5, 6, 2))
    y = pad_to_match(x, (8, 9))
    assert y.shape == (1, 8, 9, 2)
    # pad low = diff//2: rows 0 (dh=3 -> 1 low), cols (dw=3 -> 1 low)
    assert float(y[0, 0, 3, 0]) == 0.0 and float(y[0, 1, 1, 0]) == 1.0


def test_transposed_up_dts_env_parity(monkeypatch):
    """UNET_ZOO_CONVT_DTS=1 (matmul + depth-to-space ConvTranspose
    formulation, nn/blocks.py TransposedUp) must be numerically exact vs
    the default nn.ConvTranspose path on the same stored params."""
    import jax

    from unet_zoo_tpu.nn.blocks import TransposedUp

    mod = TransposedUp(features=6)
    x = jnp.asarray(_rand((2, 5, 7, 4), seed=3))
    monkeypatch.delenv("UNET_ZOO_CONVT_DTS", raising=False)
    variables = mod.init(jax.random.PRNGKey(0), x)
    base = mod.apply(variables, x)
    assert base.shape == (2, 10, 14, 6)
    monkeypatch.setenv("UNET_ZOO_CONVT_DTS", "1")
    dts = mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(dts), np.asarray(base),
                               rtol=1e-5, atol=1e-5)
