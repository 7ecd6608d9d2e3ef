"""num_classes > 1 output shapes (incl. raunet's log_softmax head)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.models import create_model


@pytest.mark.parametrize("name", ["unet", "raunet", "nested_unet", "resunet"])
def test_multiclass_output(name):
    m = create_model(name, num_classes=3, image_size=64)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 64, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)["main"]
    assert out.shape == (1, 64, 64, 3)
    if name == "raunet":
        # log_softmax head when num_classes > 1 (ref raunet.py:134-137)
        probs = np.exp(np.asarray(out, np.float64))
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
