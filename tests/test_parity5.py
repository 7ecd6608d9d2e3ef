"""Parity: vnet, transatt_unet, unet_transformer, and the remaining medt
variants (axialunet, medt)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from parity_utils import (
    load_ref_module,
    put_bn,
    put_conv,
    put_dense,
    put_ln,
    run_torch,
)
from unet_zoo_tpu.models import create_model


def _flax_forward(model, variables, x):
    out = model.apply(variables, jnp.asarray(x), train=False)
    return np.asarray(out["main"], np.float32)


def _init(model, size, batch=2, seed=0, channels=3):
    x = np.random.default_rng(seed).standard_normal(
        (batch, size, size, channels)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    return x, variables


def test_vnet_parity():
    ref_mod = load_ref_module("vnet")
    # in_channels=1: the reference's 3-channel path creates a fresh random
    # conv inside forward (ref vnet.py:60) and cannot be reproduced
    model = create_model("vnet", in_channels=1)
    x, variables = _init(model, 32, channels=1)
    fp = variables["params"]

    tmodel = ref_mod.VNet(in_channels=1, num_classes=1, elu=True)
    sd = {k: v.clone() for k, v in tmodel.state_dict().items()}

    def put_cont_bn(tkey, f):
        sd[f"{tkey}.weight"] = torch.from_numpy(np.asarray(f["scale"]).copy())
        sd[f"{tkey}.bias"] = torch.from_numpy(np.asarray(f["bias"]).copy())

    def put_trans_conv(tkey, f):
        k = np.asarray(f["kernel"])[::-1, ::-1]
        sd[f"{tkey}.weight"] = torch.from_numpy(
            np.transpose(k, (2, 3, 0, 1)).copy())
        sd[f"{tkey}.bias"] = torch.from_numpy(np.asarray(f["bias"]).copy())

    put_conv(sd, "in_tr.conv1", fp["in_conv"])
    put_cont_bn("in_tr.bn1", fp["in_bn"])
    for tname, fname, n in [("down_tr32", "down32", 1), ("down_tr64", "down64", 2),
                            ("down_tr128", "down128", 3), ("down_tr256", "down256", 2)]:
        put_conv(sd, f"{tname}.down_conv", fp[f"{fname}_conv"])
        put_cont_bn(f"{tname}.bn1", fp[f"{fname}_bn"])
        for i in range(n):
            put_conv(sd, f"{tname}.ops.{i}.conv1", fp[f"{fname}_lu{i}"]["Conv_0"])
            put_cont_bn(f"{tname}.ops.{i}.bn1",
                        fp[f"{fname}_lu{i}"]["ContBatchNorm_0"])
    for tname, fname, n in [("up_tr256", "up256", 2), ("up_tr128", "up128", 2),
                            ("up_tr64", "up64", 1), ("up_tr32", "up32", 1)]:
        put_trans_conv(f"{tname}.up_conv", fp[f"{fname}_up"]["ConvTranspose_0"])
        put_cont_bn(f"{tname}.bn1", fp[f"{fname}_bn"])
        for i in range(n):
            put_conv(sd, f"{tname}.ops.{i}.conv1", fp[f"{fname}_lu{i}"]["Conv_0"])
            put_cont_bn(f"{tname}.ops.{i}.bn1",
                        fp[f"{fname}_lu{i}"]["ContBatchNorm_0"])
    put_conv(sd, "out_tr.conv1", fp["out_conv"])
    put_cont_bn("out_tr.bn1", fp["out_bn"])
    tmodel.load_state_dict(sd, strict=True)

    got = _flax_forward(model, variables, x)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def _put_double_convo(sd, tprefix, f, s):
    """DoubleConvo / DoubleConvMid: Sequential conv/bn at 0,1 and 3,4."""
    for i, name in enumerate(["ConvNormAct_0", "ConvNormAct_1"]):
        put_conv(sd, f"{tprefix}.{3 * i}", f[name]["Conv_0"])
        put_bn(sd, f"{tprefix}.{3 * i + 1}", f[name]["BatchNorm_0"],
               s[name]["BatchNorm_0"])


def test_transatt_unet_parity():
    ref_mod = load_ref_module("transatt_unet")
    model = create_model("transatt_unet")
    x, variables = _init(model, 32)
    fp, fs = variables["params"], variables["batch_stats"]

    tmodel = ref_mod.TransAttUNet(in_channels=3, num_classes=1)
    sd = {k: v.clone() for k, v in tmodel.state_dict().items()}

    _put_double_convo(sd, "inc.double_conv", fp["inc"], fs["inc"])
    for d in range(1, 5):
        _put_double_convo(sd, f"down{d}.maxpool_conv.1.double_conv",
                          fp[f"down{d}"]["DoubleConvMid_0"],
                          fs[f"down{d}"]["DoubleConvMid_0"])
    sd["pos.row_embed.weight"] = torch.from_numpy(
        np.asarray(fp["pos"]["row_embed"]).copy())
    sd["pos.col_embed.weight"] = torch.from_numpy(
        np.asarray(fp["pos"]["col_embed"]).copy())
    for c in ("query_conv", "key_conv", "value_conv"):
        put_conv(sd, f"pam.{c}", fp["pam"][c])
    sd["pam.gamma"] = torch.from_numpy(np.asarray(fp["pam"]["gamma"]).copy())
    for u in range(1, 5):
        _put_double_convo(sd, f"up{u}.conv.double_conv",
                          fp[f"up{u}"]["DoubleConvMid_0"],
                          fs[f"up{u}"]["DoubleConvMid_0"])
    put_conv(sd, "outc.conv", fp["outc"]["Conv_0"])
    tmodel.load_state_dict(sd, strict=True)

    got = _flax_forward(model, variables, x)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_unet_transformer_parity():
    ref_mod = load_ref_module("unet_transformer")
    model = create_model("unet_transformer")
    x, variables = _init(model, 32)
    fp, fs = variables["params"], variables["batch_stats"]

    tmodel = ref_mod.U_Transformer(in_channels=3, num_classes=1)
    sd = {k: v.clone() for k, v in tmodel.state_dict().items()}

    def put_mhd(tkey, f):
        # MultiHeadDense computes x @ W (not W^T): kernel maps directly
        sd[f"{tkey}.weight"] = torch.from_numpy(
            np.asarray(f["kernel"]).copy())

    _put_double_convo(sd, "inc.conv_op", fp["inc"], fs["inc"])
    for d in range(1, 4):
        _put_double_convo(sd, f"down{d}.maxpool_conv.1.double_conv",
                          fp[f"down{d}"]["DoubleConvMid_0"],
                          fs[f"down{d}"]["DoubleConvMid_0"])
    for n in ("query", "key", "value"):
        put_mhd(f"MHSA.{n}", fp["MHSA"][n])
    for u in range(1, 4):
        f, s = fp[f"up{u}"], fs[f"up{u}"]
        t = f"up{u}.MHCA"
        put_conv(sd, f"{t}.Sconv_process.1", f["Sconv"])
        put_bn(sd, f"{t}.Sconv_process.2", f["Sbn"], s["Sbn"])
        put_conv(sd, f"{t}.Yconv_process.0", f["Yconv"])
        put_bn(sd, f"{t}.Yconv_process.1", f["Ybn"], s["Ybn"])
        for n in ("query", "key", "value"):
            put_mhd(f"{t}.{n}", f[n])
        put_conv(sd, f"{t}.conv_after_attention.0", f["conv_after_attention"])
        put_bn(sd, f"{t}.conv_after_attention.1", f["attn_bn"], s["attn_bn"])
        put_conv(sd, f"{t}.Yconv2_process.1", f["Yconv2_3x3"])
        put_conv(sd, f"{t}.Yconv2_process.2", f["Yconv2_1x1"])
        put_bn(sd, f"{t}.Yconv2_process.3", f["Ybn2"], s["Ybn2"])
        conv_f, conv_s = f["conv"], s["conv"]
        put_conv(sd, f"up{u}.conv.0", conv_f["ConvNormAct_0"]["Conv_0"])
        put_bn(sd, f"up{u}.conv.1", conv_f["ConvNormAct_0"]["BatchNorm_0"],
               conv_s["ConvNormAct_0"]["BatchNorm_0"])
        put_conv(sd, f"up{u}.conv.3", conv_f["ConvNormAct_1"]["Conv_0"])
        put_bn(sd, f"up{u}.conv.4", conv_f["ConvNormAct_1"]["BatchNorm_0"],
               conv_s["ConvNormAct_1"]["BatchNorm_0"])
    put_conv(sd, "outc.conv", fp["outc"]["Conv_0"])
    tmodel.load_state_dict(sd, strict=True)

    got = _flax_forward(model, variables, x)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("variant,mode", [("axialunet", "base"),
                                          ("MedT", "wopos")])
def test_other_axial_variants_parity(variant, mode):
    ref_mod = load_ref_module("medt_net")
    size = 64
    model = create_model("medt" if variant == "MedT" else variant,
                         image_size=size)
    x, variables = _init(model, size)
    fp, fs = variables["params"], variables["batch_stats"]

    tmodel = getattr(ref_mod, variant)(img_size=size, num_classes=1,
                                       in_channels=3)
    sd = {k: v.clone() for k, v in tmodel.state_dict().items()}

    def put_axial(tprefix, f, s):
        k = np.asarray(f["qkv"]["kernel"])
        sd[f"{tprefix}.qkv_transform.conv.weight"] = torch.from_numpy(
            k.T[:, :, None].copy())
        put_bn(sd, f"{tprefix}.bn_qkv", f["bn_qkv"], s["bn_qkv"])
        put_bn(sd, f"{tprefix}.bn_similarity", f["bn_similarity"],
               s["bn_similarity"])
        put_bn(sd, f"{tprefix}.bn_output", f["bn_output"], s["bn_output"])
        if mode == "base":
            sd[f"{tprefix}.relative"] = torch.from_numpy(
                np.asarray(f["relative"]).copy())

    for c in (1, 2, 3):
        put_conv(sd, f"conv{c}", fp[f"conv{c}"], bias=False)
        put_bn(sd, f"bn{c}", fp[f"bn{c}"], fs[f"bn{c}"])
    for li, blocks in enumerate((1, 2, 4, 1)):
        for bi in range(blocks):
            f, s = fp[f"layer{li + 1}_{bi}"], fs[f"layer{li + 1}_{bi}"]
            t = f"layer{li + 1}.{bi}"
            put_conv(sd, f"{t}.conv_down", f["conv_down"], bias=False)
            put_bn(sd, f"{t}.bn1", f["bn1"], s["bn1"])
            put_axial(f"{t}.hight_block", f["hight_block"], s["hight_block"])
            put_axial(f"{t}.width_block", f["width_block"], s["width_block"])
            put_conv(sd, f"{t}.conv_up", f["conv_up"], bias=False)
            put_bn(sd, f"{t}.bn2", f["bn2"], s["bn2"])
            if "downsample_conv" in f:
                put_conv(sd, f"{t}.downsample.0", f["downsample_conv"],
                         bias=False)
                put_bn(sd, f"{t}.downsample.1", f["downsample_bn"],
                       s["downsample_bn"])
    for d in (1, 2, 3, 4):
        put_conv(sd, f"decoder{d}", fp[f"decoder{d}"])
    put_conv(sd, "final_conv", fp["final_conv"])
    tmodel.load_state_dict(sd, strict=True)

    got = _flax_forward(model, variables, x)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)
