"""Fused Pallas axial attention == XLA path (eval), interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.models import create_model


def _randomize(variables, seed=0):
    """Perturb params/batch_stats so BN folding is non-trivial."""
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    rng = np.random.default_rng(seed)
    out = []
    for leaf in leaves:
        arr = np.asarray(leaf)
        noise = rng.normal(0.0, 0.5, arr.shape).astype(arr.dtype)
        scale = np.abs(1.0 + rng.normal(0, 0.2, arr.shape)).astype(arr.dtype)
        out.append(jnp.asarray(arr * scale + noise))
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.mark.parametrize("name", ["axialunet", "gated", "medt"])
def test_fused_axial_matches_xla(name):
    size = 32
    ref_model = create_model(name, image_size=size)
    pal_model = create_model(name, image_size=size, use_pallas=True)

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, size, size, 3)),
        jnp.float32)
    variables = ref_model.init(jax.random.PRNGKey(0), x)
    variables = _randomize(variables)
    # keep BN variances positive after randomization
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    bs = jax.tree_util.tree_map(jnp.abs, variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}

    ref = ref_model.apply(variables, x, train=False)["main"]
    got = pal_model.apply(variables, x, train=False)["main"]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_fused_param_surface_identical():
    size = 32
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    a = create_model("gated", image_size=size).init(jax.random.PRNGKey(0), x)
    b = create_model("gated", image_size=size, use_pallas=True).init(
        jax.random.PRNGKey(0), x)
    pa = jax.tree_util.tree_structure(a)
    pb = jax.tree_util.tree_structure(b)
    assert pa == pb
    sa = jax.tree_util.tree_map(lambda t: t.shape, a)
    sb = jax.tree_util.tree_map(lambda t: t.shape, b)
    assert sa == sb
