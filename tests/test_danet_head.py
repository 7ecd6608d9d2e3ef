"""DANetHead (ref da_transformer.py:216-267, dead code there) sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from unet_zoo_tpu.models.da_transformer import DANetHead


def test_danet_head_shapes_and_train():
    head = DANetHead(out_channels=4, attn_res=(8, 8))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 16, 256)), jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(variables, x)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out) >= 0).all()  # final ReLU

    out2, mutated = head.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    assert out2.shape == (2, 16, 16, 4)
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))

    main, sa, sc = head.apply(
        head.init(jax.random.PRNGKey(2), x, return_aux=True),
        x, return_aux=True)
    assert sa.shape == sc.shape == main.shape
