"""Registry contract tests (ref semantics: unet_zoo/models/__init__.py)."""

import jax
import jax.numpy as jnp
import pytest

from unet_zoo_tpu.models import create_model, get_model_config, list_models


def test_list_models_sorted_nonempty():
    names = list_models()
    assert names == sorted(names)
    assert "unet" in names


def test_unknown_model_raises_with_listing():
    with pytest.raises(ValueError, match="Available models"):
        create_model("not_a_model")


def test_case_insensitive_lookup():
    m = create_model("UNet")
    assert m.name == "unet"


def test_default_ctor_args():
    m = create_model("unet")
    assert m.in_channels == 3 and m.num_classes == 1


def test_kwarg_override_precedence():
    # user kwargs win over defaults (ref: models/__init__.py:228)
    m = create_model("resunet", filters=[16, 32, 64, 128])
    assert tuple(m.module.filters) == (16, 32, 64, 128)


def test_get_model_config_empty_for_plain_models():
    assert get_model_config("unet") == {}


def test_unified_output_protocol():
    m = create_model("nested_unet", deep_supervision=True)
    x = jnp.zeros((1, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert set(out.keys()) == {"main", "side1", "side2", "side3"}
    assert m.loss_weight("main") == 1.0
    assert m.loss_weight("side1") == 0.5
