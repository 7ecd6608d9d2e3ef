"""Parity: egeunet (GHPA/GAB), mmunet (multi-kernel blocks + EA + morphology
gates), da_transformer (ResNetV2 + dual attention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from parity_utils import (
    load_ref_module,
    put_bn,
    put_conv,
    put_conv_transpose,
    put_dense,
    put_ln,
    run_torch,
)
from unet_zoo_tpu.models import create_model


def _flax_forward(model, variables, x):
    out = model.apply(variables, jnp.asarray(x), train=False)
    return np.asarray(out["main"], np.float32)


def _init(model, size, batch=2, seed=0):
    x = np.random.default_rng(seed).standard_normal(
        (batch, size, size, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    return x, variables


def _put_conv1d(sd, tkey, f):
    """flax (1,k) conv kernel [1,k,ing,out] → torch Conv1d weight [out,ing,k]."""
    k = np.transpose(np.asarray(f["kernel"]), (3, 2, 0, 1))[:, :, 0, :]
    sd[f"{tkey}.weight"] = torch.from_numpy(k.copy())
    if "bias" in f:
        sd[f"{tkey}.bias"] = torch.from_numpy(np.asarray(f["bias"]).copy())


def test_egeunet_reference_is_broken():
    """Parity for egeunet is impossible: the reference GHPA lacks
    super().__init__() and crashes on instantiation (quirk Q2,
    ref: unet_zoo/models/egeunet.py:100-104). Assert that, so the
    deviation is documented by a test."""
    ref_mod = load_ref_module("egeunet")
    with pytest.raises(AttributeError, match="cannot assign"):
        ref_mod.EGEUNet(in_channels=3, num_classes=1, image_size=64)


@pytest.mark.slow
def test_egeunet_parity_repaired_reference():
    """Direct parity against the reference repaired with the ONE missing
    line (GHPA's super().__init__(), quirk Q2) — the in-memory repair
    leaves the read-only reference untouched and changes no math."""
    from parity_utils import load_ref_module_repaired

    ref_mod = load_ref_module_repaired(
        "egeunet",
        [("def __init__(self, dim_in, dim_out, x_res=8, y_res=8):",
          "        super().__init__()")])
    size = 64
    model = create_model("egeunet", image_size=size)
    x, variables = _init(model, size)
    fp = variables["params"]  # egeunet has no BN -> no batch_stats

    tmodel = ref_mod.EGEUNet(in_channels=3, num_classes=1, image_size=size)
    sd = {k: v.clone() for k, v in tmodel.state_dict().items()}

    def put_param_grid(tkey, f, name):
        # flax [1, a, b, c] → torch [1, c, a, b]
        p = np.transpose(np.asarray(f[name]), (0, 3, 1, 2))
        sd[tkey] = torch.from_numpy(p.copy())

    def put_ghpa(tprefix, f):
        put_ln(sd, f"{tprefix}.norm1", f["norm1"])
        put_ln(sd, f"{tprefix}.norm2", f["norm2"])
        put_param_grid(f"{tprefix}.params_xy", f, "params_xy")
        put_conv(sd, f"{tprefix}.conv_xy.0", f["conv_xy_dw"])
        put_conv(sd, f"{tprefix}.conv_xy.2", f["conv_xy_pw"])
        put_param_grid(f"{tprefix}.params_zx", f, "params_zx")
        _put_conv1d(sd, f"{tprefix}.conv_zx.0", f["conv_zx_dw"])
        _put_conv1d(sd, f"{tprefix}.conv_zx.2", f["conv_zx_pw"])
        put_param_grid(f"{tprefix}.params_zy", f, "params_zy")
        _put_conv1d(sd, f"{tprefix}.conv_zy.0", f["conv_zy_dw"])
        _put_conv1d(sd, f"{tprefix}.conv_zy.2", f["conv_zy_pw"])
        put_conv(sd, f"{tprefix}.dw.0", f["dw_pw"])
        put_conv(sd, f"{tprefix}.dw.2", f["dw_dw"])
        put_conv(sd, f"{tprefix}.ldw.0", f["ldw_dw"])
        put_conv(sd, f"{tprefix}.ldw.2", f["ldw_pw"])

    for i in (1, 2, 3):
        put_conv(sd, f"encoder{i}.0", fp[f"encoder{i}"])
        put_ln(sd, f"ebn{i}", fp[f"ebn{i}"])
    for i in (4, 5, 6):
        put_ghpa(f"encoder{i}.0", fp[f"encoder{i}"])
        if i < 6:
            put_ln(sd, f"ebn{i}", fp[f"ebn{i}"])
    for i in (1, 2, 3):
        put_ghpa(f"decoder{i}.0", fp[f"decoder{i}"])
    put_conv(sd, "decoder4.0", fp["decoder4"])
    put_conv(sd, "decoder5.0", fp["decoder5"])
    for i in range(1, 6):
        put_ln(sd, f"dbn{i}", fp[f"dbn{i}"])
        put_conv(sd, f"gt_conv{i}.0", fp[f"gt_conv{i}"])
    for g in range(1, 6):
        f = fp[f"GAB{g}"]
        put_conv(sd, f"GAB{g}.pre_project", f["pre_project"])
        for k in range(4):
            put_ln(sd, f"GAB{g}.g{k}.0", f[f"g{k}_norm"])
            put_conv(sd, f"GAB{g}.g{k}.1", f[f"g{k}_conv"])
        put_ln(sd, f"GAB{g}.tail_conv.0", f["tail_norm"])
        put_conv(sd, f"GAB{g}.tail_conv.1", f["tail_conv"])
    put_conv(sd, "final", fp["final"])
    tmodel.load_state_dict(sd, strict=True)

    got = _flax_forward(model, variables, x)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_mmunet_parity():
    ref_mod = load_ref_module("mmunet")
    size = 64
    model = create_model("mmunet", base_channels=16)
    x, variables = _init(model, size)
    fp, fs = variables["params"], variables["batch_stats"]

    tmodel = ref_mod.MMUNet(in_channels=3, num_classes=1, base_channels=16)
    sd = {k: v.clone() for k, v in tmodel.state_dict().items()}

    def put_block(tprefix, f, s, ext):
        for i in (1, 2, 3):
            put_conv(sd, f"{tprefix}.dwconv{i}", f[f"dwconv{i}"])
            put_bn(sd, f"{tprefix}.norm{i}", f[f"norm{i}"], s[f"norm{i}"])
        put_bn(sd, f"{tprefix}.norm4", f["norm4"], s["norm4"])
        put_dense(sd, f"{tprefix}.pwconv1", f["pwconv1"])
        put_dense(sd, f"{tprefix}.pwconv2", f["pwconv2"])
        if ext:
            put_bn(sd, f"{tprefix}.norm_ea", f["norm_ea"], s["norm_ea"])
            put_conv(sd, f"{tprefix}.conv1", f["conv1"])
            k0 = np.asarray(f["linear_0"]["kernel"])  # [dim, 64]
            sd[f"{tprefix}.linear_0.weight"] = torch.from_numpy(
                k0.T[:, :, None].copy())
            k1 = np.asarray(f["linear_1"]["kernel"])  # [64, dim]
            sd[f"{tprefix}.linear_1.weight"] = torch.from_numpy(
                k1.T[:, :, None].copy())
            put_conv(sd, f"{tprefix}.conv2.0", f["conv2"], bias=False)
            put_bn(sd, f"{tprefix}.conv2.1", f["conv2_bn"], s["conv2_bn"])

    stage_specs = [("first_down", "first_down", False),
                   ("down0", "down0", False), ("down0_1", "down0_1", False),
                   ("down1", "down1", False), ("down2", "down2", True),
                   ("down3", "down3", True)]
    for tname, fname, ext in stage_specs:
        put_conv(sd, f"{tname}.0", fp[f"{fname}_conv"])
        put_bn(sd, f"{tname}.1", fp[f"{fname}_bn1"], fs[f"{fname}_bn1"])
        put_block(f"{tname}.2", fp[f"{fname}_blk1"], fs[f"{fname}_blk1"], ext)
        put_bn(sd, f"{tname}.3", fp[f"{fname}_bn2"], fs[f"{fname}_bn2"])
        put_block(f"{tname}.4", fp[f"{fname}_blk2"], fs[f"{fname}_blk2"], ext)

    for u, (ext, has_mlp) in zip((1, 2, 3, 4),
                                 [(True, True), (True, True),
                                  (False, False), (False, False)]):
        f, s = fp[f"up{u}"], fs[f"up{u}"]
        if has_mlp:
            put_conv(sd, f"up{u}.mlp.fc1", f["mlp_fc1"])
            put_conv(sd, f"up{u}.mlp.fc2", f["mlp_fc2"])
        put_conv(sd, f"up{u}.linear1", f["linear1"])
        put_conv(sd, f"up{u}.conv.0", f["fuse_conv"])
        put_bn(sd, f"up{u}.conv.1", f["fuse_bn"], s["fuse_bn"])
        put_block(f"up{u}.conv.2", f["blk1"], s["blk1"], ext)
        put_block(f"up{u}.conv.3", f["blk2"], s["blk2"], ext)
    put_block("up5.conv.0", fp["up5_blk1"], fs["up5_blk1"], False)
    put_block("up5.conv.1", fp["up5_blk2"], fs["up5_blk2"], False)

    put_conv(sd, "eam.up_x2.1", fp["efm_conv"], bias=False)
    put_bn(sd, "eam.up_x2.2", fp["efm_bn"], fs["efm_bn"])
    put_conv(sd, "eam.linear1", fp["efm_linear1"])
    put_conv(sd, "out_conv.0", fp["out_conv"])
    tmodel.load_state_dict(sd, strict=True)

    got = _flax_forward(model, variables, x)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def _build_da_ref(ref_mod, variables):
    """Construct the reference DA_Transformer with our weights injected."""
    fp, fs = variables["params"], variables["batch_stats"]

    config = ref_mod.get_da_transformer_config()
    tmodel = ref_mod.DA_Transformer(3, 1, config)
    sd = {k: v.clone() for k, v in tmodel.state_dict().items()}

    def put_std(tkey, f):
        put_conv(sd, tkey, f, bias=False)

    def put_gn(tkey, f):
        put_ln(sd, tkey, f)  # GroupNorm scale/bias maps like LN

    rn = fp["resnet"]
    rs = fs.get("resnet", {})
    put_std("resnet.root.conv", rn["root_conv"])
    put_gn("resnet.root.gn", rn["root_gn"])
    for b, units in ((1, 3), (2, 4), (3, 9)):
        for u in range(1, units + 1):
            f = rn[f"block{b}_unit{u}"]
            t = f"resnet.body.block{b}.unit{u}"
            for c in (1, 2, 3):
                put_std(f"{t}.conv{c}", f[f"conv{c}"])
                put_gn(f"{t}.gn{c}", f[f"gn{c}"])
            if "downsample" in f:
                put_std(f"{t}.downsample", f["downsample"])
                put_gn(f"{t}.gn_proj", f["gn_proj"])

    def put_double_conv(tprefix, f, s):
        for i, name in enumerate(["ConvNormAct_0", "ConvNormAct_1"]):
            put_conv(sd, f"{tprefix}.{3 * i}", f[name]["Conv_0"])
            put_bn(sd, f"{tprefix}.{3 * i + 1}", f[name]["BatchNorm_0"],
                   s[name]["BatchNorm_0"])

    put_double_conv("bottleneck.conv_op", fp["bottleneck"], fs["bottleneck"])
    for u in range(1, 5):
        f, s = fp[f"up_block{u}"], fs[f"up_block{u}"]
        put_conv_transpose(sd, f"up_block{u}.up", f["up"])
        put_conv(sd, f"up_block{u}.skip_conv", f["skip_conv"])
        put_double_conv(f"up_block{u}.conv.conv_op", f["conv"], s["conv"])
    for p in (1, 2, 3):
        f = fp[f"pam{p}"]
        for c in ("query_conv", "key_conv", "value_conv"):
            put_conv(sd, f"pam{p}.{c}", f[c])
        sd[f"pam{p}.gamma"] = torch.from_numpy(np.asarray(f["gamma"]).copy())
        sd[f"cam{p}.gamma"] = torch.from_numpy(
            np.asarray(fp[f"cam{p}"]["gamma"]).copy())
    put_conv(sd, "up_block5.1", fp["up_block5_conv"])
    put_conv(sd, "up_block6.1", fp["up_block6_conv"])
    put_conv(sd, "outc", fp["outc"])
    tmodel.load_state_dict(sd, strict=True)
    return tmodel


def test_da_transformer_parity():
    ref_mod = load_ref_module("da_transformer")
    size = 64
    model = create_model("da_transformer")
    x, variables = _init(model, size)
    tmodel = _build_da_ref(ref_mod, variables)

    # reference upsamples to hard-coded 512 (quirk); ours targets input size.
    # Compare at the reference's output by resizing ours is wrong — instead
    # run the torch model and downsample its 512 output back? No: compare
    # only when sizes match. The torch model outputs 512x512 for any input;
    # bilinear-resize it to our size for comparison of the pre-head signal
    # is lossy, so instead verify parity of the features by comparing our
    # output against torch's output downsampled — both come from the same
    # 32->64->128 upsample chain; the final resize differs only in target.
    ref512 = run_torch(tmodel, x)
    import torch.nn.functional as F

    ref = F.interpolate(
        torch.from_numpy(np.transpose(ref512, (0, 3, 1, 2))),
        size=(size, size), mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    got = _flax_forward(model, variables, x)
    # looser tolerance: different final-resize targets (512->64 vs 128->64)
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)


@pytest.mark.slow
def test_da_transformer_parity_512_exact():
    """At 512px input the reference's hard-coded 512-resize coincides with
    our input-size resize, so full 1e-3 parity is expected (ref
    da_transformer.py:333)."""
    ref_mod = load_ref_module("da_transformer")
    model = create_model("da_transformer")
    x, variables = _init(model, 512, batch=1)
    tmodel = _build_da_ref(ref_mod, variables)

    ref = run_torch(tmodel, x)
    got = _flax_forward(model, variables, x)
    assert got.shape == ref.shape == (1, 512, 512, 1)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)
