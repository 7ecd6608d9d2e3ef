"""Per-model golden shape/dtype tests: every registry name × {fwd, train-mutation}."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.models import create_model, list_models

# models needing an image_size hint at small test resolution
_SIZE_HINTS = {}
# per-model kwargs at test resolution (swin window 7 requires 224-divisible
# sizes — same constraint as the reference; the default YAML uses window 8)
_KWARG_HINTS = {"swin_unet_v2": {"window_size": 8}}
_TEST_SIZE = 64


def _make(name):
    kwargs = {"in_channels": 3, "num_classes": 1}
    kwargs["image_size"] = _SIZE_HINTS.get(name, _TEST_SIZE)
    kwargs.update(_KWARG_HINTS.get(name, {}))
    return create_model(name, **kwargs)


@pytest.mark.parametrize("name", list_models())
def test_forward_shapes(name):
    model = _make(name)
    size = _SIZE_HINTS.get(name, _TEST_SIZE)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, size, size, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert isinstance(out, dict) and "main" in out
    assert out["main"].shape == (2, size, size, 1), out["main"].shape
    assert out["main"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out["main"])).all()


@pytest.mark.parametrize("name", list_models())
def test_train_mode_updates_batch_stats(name):
    model = _make(name)
    size = _SIZE_HINTS.get(name, _TEST_SIZE)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, size, size, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    out, mutated = model.apply(variables, x, train=True)
    assert "main" in out
    if "batch_stats" in variables:
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
        ), "batch_stats did not update in train mode"


def test_unet_tpu_size_contract_and_full_res_logits():
    """The TPU-native flagship predicts at stride 4 and upsamples the
    logits — output must be full input resolution for any H,W divisible
    by 32 (4 stride-2 stages after the s4 stem), including non-pow2."""
    model = create_model("unet_tpu")
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 96, 160, 3)),
        jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["main"].shape == (1, 96, 160, 1)
    assert np.isfinite(np.asarray(out["main"])).all()
