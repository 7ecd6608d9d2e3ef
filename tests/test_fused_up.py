"""Golden tests for the fused decoder-stage Pallas kernel
(ops/pallas/fused_up.py) and its UpSampleUNet integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.nn.blocks import UpSampleUNet
from unet_zoo_tpu.ops.pallas.fused_up import (
    auto_co_block,
    fold_conv_bn,
    fused_up_concat_conv,
    pack_convt_kernel,
)


def _xla_chain(y, skip, wt, bt, wc, scale, bias):
    up = jax.lax.conv_transpose(
        y, wt, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    up = up + bt
    z = jnp.concatenate([up, skip], -1)
    out = jax.lax.conv_general_dilated(
        z, wc, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(out * scale + bias)


def _rand_case(rng, B, Hc, Wc, Cin, Cu, Cs, Co):
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    return (f(B, Hc, Wc, Cin), f(B, 2 * Hc, 2 * Wc, Cs),
            f(2, 2, Cin, Cu) * 0.1, f(Cu) * 0.1,
            f(3, 3, Cu + Cs, Co) * 0.05, f(Co) * 0.2 + 1.0, f(Co) * 0.1)


@pytest.mark.parametrize(
    "B,Hc,Wc,Cin,Cu,Cs,Co,rb,cob",
    [
        (2, 8, 8, 64, 32, 32, 32, 8, None),     # generic
        (1, 16, 16, 128, 64, 64, 64, 16, None),  # unet stage-4-like
        (2, 4, 8, 32, 16, 16, 32, 16, 16),       # non-square + Co blocking
        (1, 2, 8, 16, 16, 16, 16, 16, None),     # tiny H (single tile)
    ],
)
def test_fused_matches_xla_chain(B, Hc, Wc, Cin, Cu, Cs, Co, rb, cob):
    rng = np.random.default_rng(0)
    y, skip, wt, bt, wc, scale, bias = _rand_case(rng, B, Hc, Wc, Cin, Cu, Cs, Co)
    ref = _xla_chain(y, skip, wt, bt, wc, scale, bias)
    got = fused_up_concat_conv(y, skip, wt, bt, wc, scale, bias,
                               row_block=rb, co_block=cob)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pack_convt_matches_conv_transpose():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((2, 5, 7, 16)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((2, 2, 16, 8)), jnp.float32)
    ref = jax.lax.conv_transpose(
        y, wt, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    m = pack_convt_kernel(wt)
    up = (y.reshape(-1, 16) @ m).reshape(2, 5, 7, 2, 2, 8)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(2, 10, 14, 8)
    np.testing.assert_allclose(np.asarray(up), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_fold_conv_bn():
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal(32), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(32) + 1, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(32), jnp.float32)
    mean = jnp.asarray(rng.standard_normal(32), jnp.float32)
    var = jnp.asarray(rng.random(32) + 0.5, jnp.float32)
    ref = (z + cb - mean) / jnp.sqrt(var + 1e-5) * gamma + beta
    scale, bias = fold_conv_bn(cb, gamma, beta, mean, var)
    np.testing.assert_allclose(np.asarray(z * scale + bias), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_auto_co_block():
    # stage-1 weights (Cin 1024, Cu=Cs=512) exceed the budget at full Co
    assert auto_co_block(1024, 512, 512, 512) < 512
    assert auto_co_block(128, 64, 64, 64) == 64


def test_upsample_unet_module_fused_path():
    """UpSampleUNet with use_pallas=True (interpret on CPU) matches the
    default XLA module path, including BN folding of both convs."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((1, 16, 16, 32)), jnp.float32)

    mod = UpSampleUNet(32, 32)
    v = mod.init(jax.random.PRNGKey(0), x, skip)
    # perturb batch stats away from init (mean 0 / var 1) so the BN fold
    # is actually exercised
    import flax

    v = flax.core.unfreeze(v)
    for cna in ("ConvNormAct_0", "ConvNormAct_1"):
        bnst = v["batch_stats"]["DoubleConv_0"][cna]["BatchNorm_0"]
        bnst["mean"] = jnp.asarray(
            rng.standard_normal(bnst["mean"].shape) * 0.1, jnp.float32)
        bnst["var"] = jnp.asarray(
            rng.random(bnst["var"].shape) + 0.5, jnp.float32)

    out_xla = UpSampleUNet(32, 32, use_pallas=False).apply(v, x, skip)
    out_fused = UpSampleUNet(32, 32, use_pallas=True).apply(v, x, skip)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-4)


def test_unet_model_fused_matches_xla():
    """Full unet forward: fused decoder vs XLA decoder, eval mode."""
    from unet_zoo_tpu.models import create_model

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    m = create_model("unet")
    v = m.init(jax.random.PRNGKey(0), x)
    ref = m.module.apply(v, x, train=False)["main"]
    fused = m.module.clone(use_pallas=True).apply(v, x, train=False)["main"]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
