"""Direct parity for the two previously environment-blocked members.

raunet/wranet could not run against the reference before because the
reference imports torchvision (absent here). parity_utils now installs a
faithful pure-torch stub (standard resnet34 + exact deform_conv2d), so
the real reference modules construct; their own randomly-initialized
``state_dict`` is converted with ``utils/convert.CONVERTERS`` and both
frameworks are compared on the same input (BASELINE: logits within 1e-3).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from parity_utils import _install_torchvision_stub, load_ref_module, run_torch
from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.utils.convert import CONVERTERS


def _np_sd(sd):
    return {k: np.asarray(v) for k, v in sd.items()}


def test_torchvision_stub_deform_matches_numpy_reference():
    """The stub's deform_conv2d (NCHW) against test_deform's independent
    NHWC numpy reference."""
    from test_deform import _numpy_deform

    rng = np.random.default_rng(0)
    b, h, w, c, o, k = 2, 6, 6, 3, 4, 3
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    offset = (rng.standard_normal((b, h, w, 2 * k * k)) * 1.5).astype(
        np.float32)
    mask = rng.uniform(0.2, 1.0, (b, h, w, k * k)).astype(np.float32)
    weight = rng.standard_normal((k, k, c, o)).astype(np.float32) * 0.2
    bias = rng.standard_normal(o).astype(np.float32)

    want = _numpy_deform(x, offset, mask, weight, bias, stride=1, padding=1)

    _install_torchvision_stub()
    import torchvision

    got = torchvision.ops.deform_conv2d(
        input=torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()),
        offset=torch.from_numpy(np.transpose(offset, (0, 3, 1, 2)).copy()),
        weight=torch.from_numpy(np.transpose(weight, (3, 2, 0, 1)).copy()),
        bias=torch.from_numpy(bias),
        stride=(1, 1), padding=(1, 1), dilation=(1, 1),
        mask=torch.from_numpy(np.transpose(mask, (0, 3, 1, 2)).copy()))
    got = np.transpose(got.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_raunet_parity():
    ref_mod = load_ref_module("raunet")
    torch.manual_seed(0)
    ref = ref_mod.RAUNet(num_classes=1, in_channels=3, pretrained=False)
    ref.eval()

    variables = CONVERTERS["raunet"](_np_sd(ref.state_dict()))
    model = create_model("raunet", image_size=64)

    x = np.random.default_rng(1).standard_normal((1, 64, 64, 3)).astype(
        np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x))["main"])
    theirs = run_torch(ref, x)
    assert ours.shape == theirs.shape
    assert np.max(np.abs(ours - theirs)) < 1e-3, np.max(np.abs(ours - theirs))


@pytest.mark.slow
def test_wranet_parity():
    ref_mod = load_ref_module("wranet")
    torch.manual_seed(0)
    ref = ref_mod.WRANet(in_channels=3, num_classes=1, feature_channels=32)
    ref.eval()

    variables = CONVERTERS["wranet"](_np_sd(ref.state_dict()))
    model = create_model("wranet", feature_channels=32)

    x = np.random.default_rng(2).standard_normal((1, 64, 64, 3)).astype(
        np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x))["main"])
    theirs = run_torch(ref, x)
    assert ours.shape == theirs.shape
    assert np.max(np.abs(ours - theirs)) < 1e-3, np.max(np.abs(ours - theirs))


@pytest.mark.slow
def test_medt_logo_parity():
    """Direct parity for the superset entry: the reference's dead-code
    LoGo dual-branch class (ref medt_net.py:510-664, never instantiated
    by the reference registry) vs our MedTLoGo, at the one image size its
    img_size_p computation is consistent for (128)."""
    from parity_utils import load_ref_module, put_bn, put_conv

    ref_mod = load_ref_module("medt_net")
    size = 128
    model = create_model("medt_logo", image_size=size)
    x = np.random.default_rng(3).standard_normal((1, size, size, 3)).astype(
        np.float32)
    variables = model.init(__import__("jax").random.PRNGKey(0),
                           jnp.asarray(x))
    fp, fs = variables["params"], variables["batch_stats"]

    tmodel = ref_mod.medt_net(ref_mod.AxialBlock_dynamic,
                              ref_mod.AxialBlock_wopos, [1, 2, 4, 1],
                              s=0.125, img_size=size, in_channels=3,
                              num_classes=1)
    sd = {k: v.clone() for k, v in tmodel.state_dict().items()}

    def put_axial(tprefix, f, s, gated):
        k = np.asarray(f["qkv"]["kernel"])
        sd[f"{tprefix}.qkv_transform.conv.weight"] = torch.from_numpy(
            k.T[:, :, None].copy())
        put_bn(sd, f"{tprefix}.bn_qkv", f["bn_qkv"], s["bn_qkv"])
        put_bn(sd, f"{tprefix}.bn_similarity", f["bn_similarity"],
               s["bn_similarity"])
        put_bn(sd, f"{tprefix}.bn_output", f["bn_output"], s["bn_output"])
        if gated:
            sd[f"{tprefix}.relative"] = torch.from_numpy(
                np.asarray(f["relative"]).copy())
            for g in ("f_qr", "f_kr", "f_sv", "f_sve"):
                sd[f"{tprefix}.{g}"] = torch.tensor(float(np.asarray(f[g])))

    def put_block(tprefix, f, s, gated):
        put_conv(sd, f"{tprefix}.conv_down", f["conv_down"], bias=False)
        put_bn(sd, f"{tprefix}.bn1", f["bn1"], s["bn1"])
        put_axial(f"{tprefix}.hight_block", f["hight_block"],
                  s["hight_block"], gated)
        put_axial(f"{tprefix}.width_block", f["width_block"],
                  s["width_block"], gated)
        put_conv(sd, f"{tprefix}.conv_up", f["conv_up"], bias=False)
        put_bn(sd, f"{tprefix}.bn2", f["bn2"], s["bn2"])
        if "downsample_conv" in f:
            put_conv(sd, f"{tprefix}.downsample.0", f["downsample_conv"],
                     bias=False)
            put_bn(sd, f"{tprefix}.downsample.1", f["downsample_bn"],
                   s["downsample_bn"])

    def put_stem(tsuffix, fname):
        for c in (1, 2, 3):
            put_conv(sd, f"conv{c}{tsuffix}", fp[fname][f"conv{c}"],
                     bias=False)
            put_bn(sd, f"bn{c}{tsuffix}", fp[fname][f"bn{c}"],
                   fs[fname][f"bn{c}"])

    put_stem("", "stem")
    put_stem("_p", "stem_p")
    for lname, blocks, gated in (("layer1", 1, True), ("layer2", 2, True),
                                 ("layer1_p", 1, False),
                                 ("layer2_p", 2, False),
                                 ("layer3_p", 4, False),
                                 ("layer4_p", 1, False)):
        for bi in range(blocks):
            put_block(f"{lname}.{bi}", fp[f"{lname}_{bi}"],
                      fs[f"{lname}_{bi}"], gated)
    for d in ("decoder4", "decoder5", "decoder1_p", "decoder2_p",
              "decoder3_p", "decoder4_p", "decoder5_p", "decoderf",
              "adjust"):
        put_conv(sd, d, fp[d])
    tmodel.load_state_dict(sd, strict=True)

    ours = np.asarray(model.apply(variables, jnp.asarray(x))["main"])
    theirs = run_torch(tmodel, x)
    assert ours.shape == theirs.shape
    assert np.max(np.abs(ours - theirs)) < 1e-3, np.max(np.abs(ours - theirs))


@pytest.mark.slow
def test_egeunet_converter_parity():
    """torch->flax converter path for egeunet: the Q2-repaired reference's
    own state_dict converted and compared at 1e-3."""
    from parity_utils import load_ref_module_repaired

    ref_mod = load_ref_module_repaired(
        "egeunet",
        [("def __init__(self, dim_in, dim_out, x_res=8, y_res=8):",
          "        super().__init__()")])
    torch.manual_seed(1)
    ref = ref_mod.EGEUNet(in_channels=3, num_classes=1, image_size=64)
    ref.eval()

    variables = CONVERTERS["egeunet"](_np_sd(ref.state_dict()))
    model = create_model("egeunet", image_size=64)
    x = np.random.default_rng(4).standard_normal((1, 64, 64, 3)).astype(
        np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x))["main"])
    theirs = run_torch(ref, x)
    assert np.max(np.abs(ours - theirs)) < 1e-3, np.max(np.abs(ours - theirs))


@pytest.mark.slow
def test_medt_logo_converter_parity():
    """torch->flax converter path for medt_logo: the reference dead-code
    class's own state_dict converted and compared at 1e-3."""
    from parity_utils import load_ref_module

    ref_mod = load_ref_module("medt_net")
    torch.manual_seed(2)
    ref = ref_mod.medt_net(ref_mod.AxialBlock_dynamic,
                           ref_mod.AxialBlock_wopos, [1, 2, 4, 1],
                           s=0.125, img_size=128, in_channels=3,
                           num_classes=1)
    ref.eval()

    variables = CONVERTERS["medt_logo"](_np_sd(ref.state_dict()))
    model = create_model("medt_logo", image_size=128)
    x = np.random.default_rng(5).standard_normal((1, 128, 128, 3)).astype(
        np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x))["main"])
    theirs = run_torch(ref, x)
    assert np.max(np.abs(ours - theirs)) < 1e-3, np.max(np.abs(ours - theirs))
