"""Numerical parity vs the PyTorch reference: inject our flax weights into
the reference torch models, compare eval-mode logits (target < 1e-3, per
BASELINE.json)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parity_utils import (
    load_ref_module,
    put_bn,
    put_conv,
    put_conv_transpose,
    run_torch,
)
from unet_zoo_tpu.models import create_model


def _flax_forward(model, variables, x):
    out = model.apply(variables, jnp.asarray(x), train=False)
    return np.asarray(out["main"], np.float32)


def _init(model, size=32, batch=2, seed=0):
    x = np.random.default_rng(seed).standard_normal(
        (batch, size, size, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    return x, variables


def _double_conv(sd, tprefix, fp, fs, idxs=(0, 3)):
    """DoubleConv: torch Sequential conv/bn at idxs and idxs+1."""
    for i, name in enumerate(["ConvNormAct_0", "ConvNormAct_1"]):
        put_conv(sd, f"{tprefix}.{idxs[i]}", fp[name]["Conv_0"])
        put_bn(sd, f"{tprefix}.{idxs[i] + 1}", fp[name]["BatchNorm_0"],
               fs[name]["BatchNorm_0"])


def test_unet_parity():
    ref_mod = load_ref_module("unet")
    model = create_model("unet")
    x, variables = _init(model)
    fp, fs = variables["params"], variables["batch_stats"]

    tmodel = ref_mod.UNet(in_channels=3, num_classes=1)
    sd = {}
    for i in range(4):
        _double_conv(sd, f"down_convolution_{i + 1}.conv.conv_op",
                     fp[f"DownSample_{i}"]["DoubleConv_0"],
                     fs[f"DownSample_{i}"]["DoubleConv_0"])
    _double_conv(sd, "bottle_neck.conv_op", fp["DoubleConv_0"],
                 fs["DoubleConv_0"])
    for i in range(4):
        put_conv_transpose(sd, f"up_convolution_{i + 1}.up",
                           fp[f"UpSampleUNet_{i}"]["TransposedUp_0"]["ConvTranspose_0"])
        _double_conv(sd, f"up_convolution_{i + 1}.conv.conv_op",
                     fp[f"UpSampleUNet_{i}"]["DoubleConv_0"],
                     fs[f"UpSampleUNet_{i}"]["DoubleConv_0"])
    put_conv(sd, "out.conv", fp["OutConv_0"]["Conv_0"])
    tmodel.load_state_dict(sd, strict=True)

    got = _flax_forward(model, variables, x)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_attention_unet_parity():
    ref_mod = load_ref_module("attention_unet")
    model = create_model("attention_unet", depth=5)
    x, variables = _init(model)
    fp, fs = variables["params"], variables["batch_stats"]

    tmodel = ref_mod.AttentionUNet(in_channels=3, num_classes=1)
    sd = {}
    for i in range(1, 6):  # encoder convs
        _double_conv(sd, f"conv{i}.conv", fp[f"conv{i}"], fs[f"conv{i}"])
    for i in range(5, 1, -1):
        # UpConvBlock: up.1 conv, up.2 bn
        put_conv(sd, f"up{i}.up.1", fp[f"up{i}"]["ConvNormAct_0"]["Conv_0"])
        put_bn(sd, f"up{i}.up.2", fp[f"up{i}"]["ConvNormAct_0"]["BatchNorm_0"],
               fs[f"up{i}"]["ConvNormAct_0"]["BatchNorm_0"])
        # attention gates
        att_p, att_s = fp[f"att{i}"], fs[f"att{i}"]
        put_conv(sd, f"att{i}.w_g.0", att_p["Conv_0"])
        put_bn(sd, f"att{i}.w_g.1", att_p["BatchNorm_0"], att_s["BatchNorm_0"])
        put_conv(sd, f"att{i}.w_x.0", att_p["Conv_1"])
        put_bn(sd, f"att{i}.w_x.1", att_p["BatchNorm_1"], att_s["BatchNorm_1"])
        put_conv(sd, f"att{i}.psi.0", att_p["Conv_2"])
        put_bn(sd, f"att{i}.psi.1", att_p["BatchNorm_2"], att_s["BatchNorm_2"])
        _double_conv(sd, f"upconv{i}.conv", fp[f"upconv{i}"], fs[f"upconv{i}"])
    put_conv(sd, "conv_1x1", fp["conv_1x1"])
    tmodel.load_state_dict(sd, strict=True)

    got = _flax_forward(model, variables, x)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_nested_unet_parity():
    ref_mod = load_ref_module("nested_unet")
    model = create_model("nested_unet")
    x, variables = _init(model)
    fp, fs = variables["params"], variables["batch_stats"]

    tmodel = ref_mod.NestedUNet(num_classes=1, in_channels=3,
                                deep_supervision=False)
    sd = {}
    cells = ["0_0", "1_0", "2_0", "3_0", "4_0", "0_1", "1_1", "2_1", "3_1",
             "0_2", "1_2", "2_2", "0_3", "1_3", "0_4"]
    for cell in cells:
        f = fp[f"conv{cell}"]
        s = fs[f"conv{cell}"]
        put_conv(sd, f"conv{cell}.conv1", f["ConvNormAct_0"]["Conv_0"])
        put_bn(sd, f"conv{cell}.bn1", f["ConvNormAct_0"]["BatchNorm_0"],
               s["ConvNormAct_0"]["BatchNorm_0"])
        put_conv(sd, f"conv{cell}.conv2", f["ConvNormAct_1"]["Conv_0"])
        put_bn(sd, f"conv{cell}.bn2", f["ConvNormAct_1"]["BatchNorm_0"],
               s["ConvNormAct_1"]["BatchNorm_0"])
    put_conv(sd, "final", fp["final"])
    tmodel.load_state_dict(sd, strict=True)

    got = _flax_forward(model, variables, x)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("variant", ["u2netp", "u2net"])
def test_u2net_parity(variant):
    ref_mod = load_ref_module("u2net")
    model = create_model(variant)
    x, variables = _init(model, size=64)
    fp, fs = variables["params"], variables["batch_stats"]

    tmodel = (ref_mod.U2NETP if variant == "u2netp" else ref_mod.U2NET)(
        in_ch=3, out_ch=1)
    sd = {}

    def put_rebnconv(tkey, f, s):
        put_conv(sd, f"{tkey}.conv_s1", f["Conv_0"])
        put_bn(sd, f"{tkey}.bn_s1", f["BatchNorm_0"], s["BatchNorm_0"])

    def put_rsu(tkey, fname, levels):
        f, s = fp[fname], fs[fname]
        put_rebnconv(f"{tkey}.rebnconvin", f["rebnconvin"], s["rebnconvin"])
        for i in range(1, levels):
            put_rebnconv(f"{tkey}.rebnconv{i}", f[f"rebnconv{i}"], s[f"rebnconv{i}"])
        put_rebnconv(f"{tkey}.rebnconv{levels}", f[f"rebnconv{levels}"],
                     s[f"rebnconv{levels}"])
        for i in range(levels - 1, 0, -1):
            put_rebnconv(f"{tkey}.rebnconv{i}d", f[f"rebnconv{i}d"],
                         s[f"rebnconv{i}d"])

    def put_rsu4f(tkey, fname):
        f, s = fp[fname], fs[fname]
        put_rebnconv(f"{tkey}.rebnconvin", f["rebnconvin"], s["rebnconvin"])
        for i in range(1, 5):
            put_rebnconv(f"{tkey}.rebnconv{i}", f[f"rebnconv{i}"], s[f"rebnconv{i}"])
        for i in range(3, 0, -1):
            put_rebnconv(f"{tkey}.rebnconv{i}d", f[f"rebnconv{i}d"],
                         s[f"rebnconv{i}d"])

    put_rsu("stage1", "stage1", 7)
    put_rsu("stage2", "stage2", 6)
    put_rsu("stage3", "stage3", 5)
    put_rsu("stage4", "stage4", 4)
    put_rsu4f("stage5", "stage5")
    put_rsu4f("stage6", "stage6")
    put_rsu4f("stage5d", "stage5d")
    put_rsu("stage4d", "stage4d", 4)
    put_rsu("stage3d", "stage3d", 5)
    put_rsu("stage2d", "stage2d", 6)
    put_rsu("stage1d", "stage1d", 7)
    for i in range(1, 7):
        put_conv(sd, f"side{i}", fp[f"side{i}"])
    put_conv(sd, "outconv", fp["outconv"])
    tmodel.load_state_dict(sd, strict=True)

    got = _flax_forward(model, variables, x)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)
