"""More parity tests vs the PyTorch reference: resunet, multiresunet, unext."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def _init(model, size=32, batch=2, seed=0):
    x = np.random.default_rng(seed).standard_normal(
        (batch, size, size, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    return x, variables


def test_resunet_parity():
    ref_mod = load_ref_module("resunet")
    model = create_model("resunet")
    x, variables = _init(model)
    fp, fs = variables["params"], variables["batch_stats"]

    tmodel = ref_mod.ResUnet(in_channels=3, num_classes=1)
    sd = {}
    # stem (ref resunet.py:25-33)
    put_conv(sd, "input_layer.0", fp["Conv_0"])
    put_bn(sd, "input_layer.1", fp["BatchNorm_0"], fs["BatchNorm_0"])
    put_conv(sd, "input_layer.3", fp["Conv_1"])
    put_conv(sd, "input_skip.0", fp["Conv_2"])

    def put_residual(tkey, f, s):
        put_bn(sd, f"{tkey}.conv_block.0", f["BatchNorm_0"], s["BatchNorm_0"])
        put_conv(sd, f"{tkey}.conv_block.2", f["Conv_0"], bias=False)
        put_bn(sd, f"{tkey}.conv_block.3", f["BatchNorm_1"], s["BatchNorm_1"])
        put_conv(sd, f"{tkey}.conv_block.5", f["Conv_1"], bias=False)
        put_conv(sd, f"{tkey}.conv_skip.0", f["Conv_2"], bias=False)
        put_bn(sd, f"{tkey}.conv_skip.1", f["BatchNorm_2"], s["BatchNorm_2"])

    torch_names = ["residual_conv_1", "residual_conv_2", "bridge",
                   "up_residual_conv1", "up_residual_conv2", "up_residual_conv3"]
    for i, tname in enumerate(torch_names):
        put_residual(tname, fp[f"ResidualConv_{i}"], fs[f"ResidualConv_{i}"])
    for i, tname in enumerate(["upsample_1", "upsample_2", "upsample_3"]):
        put_conv_transpose(sd, f"{tname}.upsample",
                           fp[f"TransposedUp_{i}"]["ConvTranspose_0"])
    put_conv(sd, "output_layer.0", fp["Conv_3"])
    tmodel.load_state_dict(sd, strict=True)

    got = _flax_forward(model, variables, x)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_multiresunet_parity():
    ref_mod = load_ref_module("multiresunet")
    model = create_model("multiresunet")
    x, variables = _init(model)
    fp, fs = variables["params"], variables["batch_stats"]

    tmodel = ref_mod.MultiResUnet(in_channels=3, num_classes=1)
    sd = {}

    def put_cbn(tkey, f, s):
        # Conv2d_batchnorm: conv1 + affine-less BN (ref multiresunet.py:7-30)
        put_conv(sd, f"{tkey}.conv1", f["Conv_0"])
        put_bn(sd, f"{tkey}.batchnorm", {}, s["BatchNorm_0"], affine=False)

    def put_mrb(tkey, f, s):
        put_cbn(f"{tkey}.conv2d_bn_1x1", f["ConvNormAct_0"], s["ConvNormAct_0"])
        put_cbn(f"{tkey}.conv2d_bn_3x3", f["ConvNormAct_1"], s["ConvNormAct_1"])
        put_cbn(f"{tkey}.conv2d_bn_5x5", f["ConvNormAct_2"], s["ConvNormAct_2"])
        put_cbn(f"{tkey}.conv2d_bn_7x7", f["ConvNormAct_3"], s["ConvNormAct_3"])
        put_bn(sd, f"{tkey}.batch_norm1", {}, s["shared_bn"], affine=False)

    for i in range(1, 10):
        put_mrb(f"multiresblock{i}", fp[f"mrb{i}"], fs[f"mrb{i}"])
    for i, length in zip(range(1, 5), (4, 3, 2, 1)):
        f, s = fp[f"respath{i}"], fs[f"respath{i}"]
        put_cbn(f"respath{i}.conv2d_bn_1x1_initial", f["ConvNormAct_0"],
                s["ConvNormAct_0"])
        put_cbn(f"respath{i}.conv2d_bn_3x3_initial", f["ConvNormAct_1"],
                s["ConvNormAct_1"])
        put_bn(sd, f"respath{i}.batch_norm_initial", {}, s["BatchNorm_0"],
               affine=False)
        for k in range(length - 1):
            put_cbn(f"respath{i}.blocks.{k}.0", f[f"ConvNormAct_{2 + 2 * k}"],
                    s[f"ConvNormAct_{2 + 2 * k}"])
            put_cbn(f"respath{i}.blocks.{k}.1", f[f"ConvNormAct_{3 + 2 * k}"],
                    s[f"ConvNormAct_{3 + 2 * k}"])
            put_bn(sd, f"respath{i}.blocks.{k}.2", {}, s[f"BatchNorm_{1 + k}"],
                   affine=False)
    for i in range(6, 10):
        put_conv_transpose(sd, f"upsample{i}",
                           fp[f"up{i}"]["ConvTranspose_0"])
    put_cbn("conv_final", fp["conv_final"], fs["conv_final"])
    tmodel.load_state_dict(sd, strict=True)

    got = _flax_forward(model, variables, x)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("variant,depths", [
    ("unext_s", (2, 2, 2)),
    pytest.param("unext", (3, 4, 6), marks=pytest.mark.slow),
])
def test_unext_parity(variant, depths):
    ref_mod = load_ref_module("unext")
    model = create_model(variant, image_size=64)
    x, variables = _init(model, size=64)
    fp = variables["params"]

    tcls = ref_mod.UNext_S if variant == "unext_s" else ref_mod.UNext
    tmodel = tcls(input_channels=3, num_classes=1, img_size=64)
    sd = {}
    sr_ratios = (8, 4, 2)
    for s in range(3):
        pe = fp[f"patch_embed{s + 1}"]
        put_conv(sd, f"patch_embed{s + 1}.proj", pe["proj"])
        put_ln(sd, f"patch_embed{s + 1}.norm", pe["norm"])
        for i in range(depths[s]):
            blk = fp[f"block{s + 1}_{i}"]
            t = f"block{s + 1}.{i}"
            put_ln(sd, f"{t}.norm1", blk["norm1"])
            put_ln(sd, f"{t}.norm2", blk["norm2"])
            attn = blk["attn"]
            put_dense(sd, f"{t}.attn.q", attn["q"])
            put_dense(sd, f"{t}.attn.kv", attn["kv"])
            put_dense(sd, f"{t}.attn.proj", attn["proj"])
            if sr_ratios[s] > 1:
                put_conv(sd, f"{t}.attn.sr", attn["sr"])
                put_ln(sd, f"{t}.attn.norm", attn["sr_norm"])
            mlp = blk["mlp"]
            put_dense(sd, f"{t}.mlp.fc1", mlp["fc1"])
            put_conv(sd, f"{t}.mlp.dwconv.dwconv", mlp["DWConv_0"]["dwconv"])
            put_dense(sd, f"{t}.mlp.fc2", mlp["fc2"])
        put_ln(sd, f"norm{s + 1}", fp[f"norm{s + 1}"])
    put_conv(sd, "decoder_level1", fp["decoder_level1"])
    put_conv(sd, "decoder_level2", fp["decoder_level2"])
    put_conv(sd, "decoder_level3", fp["decoder_level3"])
    put_conv(sd, "final_conv", fp["final_conv"])
    tmodel.load_state_dict(sd, strict=True)

    got = _flax_forward(model, variables, x)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)
