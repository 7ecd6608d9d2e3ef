"""int8 PTQ serving path (ConvNormAct -> _QuantConv + calibrate_int8).

CPU-runnable: XLA's CPU backend lowers s8xs8->s32 convolutions exactly
(verified in test_int8_conv_exact), so the same program that hits the
MXU int8 path on TPU validates here bit-for-bit on the integer part.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.nn.blocks import ConvNormAct
from unet_zoo_tpu.utils.serving import calibrate_int8, make_predictor


def test_int8_conv_exact():
    """s8xs8->s32 conv on this backend matches the integer reference."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (2, 8, 8, 16)), jnp.int8)
    k = jnp.asarray(rng.integers(-127, 128, (3, 3, 16, 32)), jnp.int8)
    y = jax.jit(lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32))(x, k)
    ref = jax.lax.conv_general_dilated(
        np.asarray(x, np.float64), np.asarray(k, np.float64),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert np.array_equal(np.asarray(ref), np.asarray(y))


def test_convnormact_quant_close():
    m = ConvNormAct(32)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 16, 16, 8)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y, st = m.apply(v, x, train=False, mutable=["quant_stats"])
    vq = dict(v)
    vq["quant"] = st["quant_stats"]
    yq = m.apply(vq, x, train=False)
    rel = float(jnp.linalg.norm(yq - y) / jnp.linalg.norm(y))
    assert rel < 0.03, rel


def test_unet_int8_forward_close_and_masks_agree():
    m = create_model("unet")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 64, 3)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x[:1])
    y = m.apply(v, x)["main"]
    vq = calibrate_int8(m, v, [x])
    assert "quant" in vq
    yq = m.module.apply(vq, x, train=False)["main"]
    rel = float(jnp.linalg.norm(yq - y) / jnp.linalg.norm(y))
    assert rel < 0.10, rel  # measured 0.034 on random init
    agree = float(jnp.mean((jax.nn.sigmoid(y) > 0.5)
                           == (jax.nn.sigmoid(yq) > 0.5)))
    assert agree > 0.95, agree


def test_quant_ignored_in_train_mode():
    """Training with a quant collection present is the float path exactly."""
    m = create_model("unet")
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x[:1])
    vq = calibrate_int8(m, v, [x])
    y_plain, _ = m.module.apply(v, x, train=True, mutable=["batch_stats"])
    y_quant, _ = m.module.apply(vq, x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y_plain["main"]),
                                  np.asarray(y_quant["main"]))


def test_predictor_with_int8_variables():
    m = create_model("unet")
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 32, 32, 3)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    vq = calibrate_int8(m, v, [x])
    predict = make_predictor(m, vq, output="mask", cast_bf16=False)
    mask = predict(x)
    assert mask.dtype == jnp.uint8 and mask.shape == (1, 32, 32, 1)


@pytest.mark.parametrize("name", ["resunet", "attention_unet"])
def test_other_convnormact_models_quantize(name):
    m = create_model(name)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 64, 64, 3)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)["main"]
    vq = calibrate_int8(m, v, [x])
    yq = m.module.apply(vq, x, train=False)["main"]
    rel = float(jnp.linalg.norm(yq - y) / jnp.linalg.norm(y))
    assert rel < 0.15, rel
