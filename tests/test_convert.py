"""torch→flax checkpoint conversion round-trips: random-init the reference
torch model, convert its state_dict, and require logit agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parity_utils import load_ref_module, run_torch
from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.utils.convert import convert_state_dict


def _roundtrip(model_name, ref_module, ref_cls_kwargs, size=32, tol=1e-3):
    ref_mod = load_ref_module(ref_module)
    cls_name, kwargs = ref_cls_kwargs
    tmodel = getattr(ref_mod, cls_name)(**kwargs)
    tmodel.eval()

    variables = convert_state_dict(model_name, tmodel.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    model = create_model(model_name)
    x = np.random.default_rng(0).standard_normal(
        (2, size, size, 3)).astype(np.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x))["main"],
                     np.float32)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=tol, rtol=tol)


def test_convert_unet():
    _roundtrip("unet", "unet",
               ("UNet", {"in_channels": 3, "num_classes": 1}))


def test_convert_attention_unet():
    _roundtrip("attention_unet", "attention_unet",
               ("AttentionUNet", {"in_channels": 3, "num_classes": 1}))


def test_convert_nested_unet():
    _roundtrip("nested_unet", "nested_unet",
               ("NestedUNet", {"num_classes": 1, "in_channels": 3}))


def test_convert_u2netp():
    _roundtrip("u2netp", "u2net", ("U2NETP", {"in_ch": 3, "out_ch": 1}),
               size=64)


def test_convert_resunet():
    _roundtrip("resunet", "resunet",
               ("ResUnet", {"in_channels": 3, "num_classes": 1}))


def test_convert_multiresunet():
    _roundtrip("multiresunet", "multiresunet",
               ("MultiResUnet", {"in_channels": 3, "num_classes": 1}))


def test_convert_strips_module_prefix_cli_logic():
    sd = {"module.out.conv.weight": np.zeros((1, 64, 1, 1), np.float32)}
    stripped = {k[7:] if k.startswith("module.") else k: v
                for k, v in sd.items()}
    assert "out.conv.weight" in stripped


def test_convert_unknown_model():
    with pytest.raises(ValueError, match="No converter"):
        convert_state_dict("swin_unet_v2", {})
