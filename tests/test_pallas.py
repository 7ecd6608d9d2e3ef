"""Pallas kernel tests (interpreter mode on CPU) vs the pure-XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.ops.pallas.window_attention import (
    swin_window_attention,
    swin_window_attention_reference,
)


@pytest.mark.parametrize("nw", [1, 4])
def test_swin_window_attention_matches_reference(nw):
    rng = np.random.default_rng(0)
    b_, nh, n, hd = 8, 3, 16, 8
    q = jnp.asarray(rng.standard_normal((b_, nh, n, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b_, nh, n, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b_, nh, n, hd)), jnp.float32)
    tau = jnp.asarray(rng.uniform(0.5, 2.0, (nh, n, n)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((nh, n, n)), jnp.float32)
    if nw > 1:
        mask = jnp.asarray(
            rng.choice([0.0, -100.0], (nw, n, n)), jnp.float32)
    else:
        mask = jnp.zeros((1, n, n), jnp.float32)

    got = swin_window_attention(q, k, v, tau, bias, mask, interpret=True)
    ref = swin_window_attention_reference(q, k, v, tau, bias, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_swin_model_pallas_path_matches_xla():
    """The full model with use_pallas=True must match the XLA path."""
    from unet_zoo_tpu.models import create_model

    size = 32
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, size, size, 3)),
        jnp.float32)
    m_ref = create_model("swin_unet_v2", image_size=size, window_size=8,
                         drop_path_rate=0.0)
    variables = m_ref.init(jax.random.PRNGKey(0), x)
    out_ref = m_ref.apply(variables, x)["main"]

    m_pal = create_model("swin_unet_v2", image_size=size, window_size=8,
                         drop_path_rate=0.0, use_pallas=True)
    out_pal = m_pal.apply(variables, x)["main"]
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               atol=1e-4, rtol=1e-4)
