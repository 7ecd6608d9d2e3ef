"""Goldens for the Pallas deform-conv kernel vs the XLA path and the
numpy torchvision-semantics reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from unet_zoo_tpu.ops.deform import deform_conv2d
from unet_zoo_tpu.ops.pallas.deform import deform_conv2d_pallas

from tests.test_deform import _numpy_deform


def test_pallas_deform_matches_numpy_reference():
    rng = np.random.default_rng(0)
    b, h, w, c, o = 1, 6, 7, 3, 4
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    offset = (rng.standard_normal((b, h, w, 18)) * 1.5).astype(np.float32)
    mask = rng.uniform(0.2, 1.0, (b, h, w, 9)).astype(np.float32)
    weight = rng.standard_normal((3, 3, c, o)).astype(np.float32)
    bias = rng.standard_normal((o,)).astype(np.float32)

    got = np.asarray(deform_conv2d_pallas(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias), interpret=True))
    ref = _numpy_deform(x, offset, mask, weight, bias)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_pallas_deform_matches_xla_path_multiblock():
    """Shapes that exercise the real grid (several N and C blocks)."""
    rng = np.random.default_rng(1)
    b, h, w, c, o = 2, 16, 32, 64, 48
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    offset = (rng.standard_normal((b, h, w, 18)) * 2.5).astype(np.float32)
    mask = rng.uniform(0.0, 1.0, (b, h, w, 9)).astype(np.float32)
    weight = rng.standard_normal((3, 3, c, o)).astype(np.float32)

    got = np.asarray(deform_conv2d_pallas(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), None, interpret=True))
    ref = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), None))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_pallas_deform_large_offsets_clamp():
    """Out-of-frame samples must interpolate to zero exactly like the
    XLA path's clamped 1-pixel zero frame."""
    rng = np.random.default_rng(2)
    b, h, w, c, o = 1, 8, 8, 4, 4
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    offset = (rng.standard_normal((b, h, w, 18)) * 20.0).astype(np.float32)
    mask = np.ones((b, h, w, 9), np.float32)
    weight = rng.standard_normal((3, 3, c, o)).astype(np.float32)

    got = np.asarray(deform_conv2d_pallas(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), None, interpret=True))
    ref = _numpy_deform(x, offset, mask, weight, None)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_pallas_deform_bf16_close():
    rng = np.random.default_rng(3)
    b, h, w, c, o = 1, 16, 16, 32, 32
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    offset = (rng.standard_normal((b, h, w, 18)) * 1.5).astype(np.float32)
    mask = rng.uniform(0.2, 1.0, (b, h, w, 9)).astype(np.float32)
    weight = rng.standard_normal((3, 3, c, o)).astype(np.float32)

    got = np.asarray(deform_conv2d_pallas(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(offset),
        jnp.asarray(mask), jnp.asarray(weight, jnp.bfloat16), None,
        interpret=True)).astype(np.float32)
    ref = _numpy_deform(x, offset, mask, weight, None)
    assert np.mean(np.abs(got - ref)) / np.mean(np.abs(ref)) < 0.05


def test_wranet_use_pallas_wiring_interpret():
    """In-model wiring: explicit use_pallas=True routes the deform conv
    through the kernel (interpret on CPU) and matches the XLA path."""
    from unet_zoo_tpu.models import create_model

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    m_ref = create_model("wranet", feature_channels=32, use_pallas=False)
    v = m_ref.init(jax.random.PRNGKey(0), x)
    ref = m_ref.module.apply(v, x, train=False)["main"]
    m_pal = create_model("wranet", feature_channels=32, use_pallas=True)
    got = m_pal.module.apply(v, x, train=False)["main"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
