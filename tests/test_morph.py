"""Goldens for the fused softmax+morphology kernel (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.ops import max_pool2d
from unet_zoo_tpu.ops.pallas.morph import fused_softmax_morph


def _xla_ref(x_nhwc, k, repeat):
    sm = jax.nn.softmax(x_nhwc, axis=-1)
    d, e = sm, sm
    for _ in range(repeat):
        d = max_pool2d(d, k, 1, k // 2)
        e = -max_pool2d(-e, k, 1, k // 2)
    return d, e


@pytest.mark.parametrize("repeat", [1, 2])
@pytest.mark.parametrize("shape", [(2, 32, 128, 16), (1, 24, 256, 8)])
def test_fused_morph_matches_xla(shape, repeat):
    b, h, w, c = shape
    x = jax.random.normal(jax.random.PRNGKey(repeat), (b, h, w, c),
                          jnp.float32) * 2.0
    d_ref, e_ref = _xla_ref(x, 7, repeat)
    d, e = fused_softmax_morph(x.transpose(0, 1, 3, 2), k=7, repeat=repeat,
                               interpret=True)
    np.testing.assert_allclose(d.transpose(0, 1, 3, 2), d_ref, atol=1e-6)
    np.testing.assert_allclose(e.transpose(0, 1, 3, 2), e_ref, atol=1e-6)


def test_fused_morph_small_rows_and_k3():
    """Non-default k and a height that forces row_block reduction."""
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 12, 128, 8), jnp.float32)
    d_ref, e_ref = _xla_ref(x, 3, 1)
    d, e = fused_softmax_morph(x.transpose(0, 1, 3, 2), k=3, repeat=1,
                               row_block=8, interpret=True)
    np.testing.assert_allclose(d.transpose(0, 1, 3, 2), d_ref, atol=1e-6)
    np.testing.assert_allclose(e.transpose(0, 1, 3, 2), e_ref, atol=1e-6)
