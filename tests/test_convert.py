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


def test_convert_transatt_unet():
    _roundtrip("transatt_unet", "transatt_unet",
               ("TransAttUNet", {"in_channels": 3, "num_classes": 1}))


def test_convert_unet_transformer():
    _roundtrip("unet_transformer", "unet_transformer",
               ("U_Transformer", {"in_channels": 3, "num_classes": 1}))


def test_convert_vnet():
    ref_mod = load_ref_module("vnet")
    tmodel = ref_mod.VNet(in_channels=1, num_classes=1, elu=True)
    tmodel.eval()
    variables = convert_state_dict("vnet", tmodel.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    model = create_model("vnet", in_channels=1)
    x = np.random.default_rng(0).standard_normal(
        (2, 32, 32, 1)).astype(np.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x))["main"],
                     np.float32)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("name,factory", [("gated", "gated"),
                                          ("axialunet", "axialunet"),
                                          ("medt", "MedT")])
def test_convert_medt_family(name, factory):
    ref_mod = load_ref_module("medt_net")
    tmodel = getattr(ref_mod, factory)(img_size=64, num_classes=1,
                                       in_channels=3)
    tmodel.eval()
    variables = convert_state_dict(name, tmodel.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    model = create_model(name, image_size=64)
    x = np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x))["main"],
                     np.float32)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_convert_uctransnet():
    ref_mod = load_ref_module("uctransnet")
    config = ref_mod.get_uctransnet_config()
    tmodel = ref_mod.UCTransNet(config, in_channels=3, num_classes=1,
                                img_size=64)
    tmodel.eval()
    variables = convert_state_dict("uctransnet", tmodel.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    model = create_model("uctransnet", image_size=64)
    x = np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x))["main"],
                     np.float32)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_convert_swin_unet_v2():
    ref_mod = load_ref_module("swin_unet_v2")
    tmodel = ref_mod.SwinTransformerSys(img_size=64, in_chans=3,
                                        num_classes=1, window_size=8,
                                        drop_path_rate=0.0)
    tmodel.eval()
    variables = convert_state_dict("swin_unet_v2", tmodel.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    model = create_model("swin_unet_v2", image_size=64, window_size=8,
                         drop_path_rate=0.0)
    x = np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x))["main"],
                     np.float32)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_convert_missformer():
    ref_mod = load_ref_module("missformer")
    tmodel = ref_mod.MISSFormer(num_classes=1, in_channels=3, image_size=64)
    tmodel.eval()
    variables = convert_state_dict("missformer", tmodel.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    model = create_model("missformer", image_size=64)
    x = np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x))["main"],
                     np.float32)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_convert_unext_s():
    ref_mod = load_ref_module("unext")
    tmodel = ref_mod.UNext_S(input_channels=3, num_classes=1, img_size=64)
    tmodel.eval()
    variables = convert_state_dict("unext_s", tmodel.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    model = create_model("unext_s", image_size=64)
    x = np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x))["main"],
                     np.float32)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_convert_mmunet():
    ref_mod = load_ref_module("mmunet")
    tmodel = ref_mod.MMUNet(in_channels=3, num_classes=1, base_channels=16)
    tmodel.eval()
    variables = convert_state_dict("mmunet", tmodel.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    model = create_model("mmunet", base_channels=16)
    x = np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x))["main"],
                     np.float32)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_convert_da_transformer():
    ref_mod = load_ref_module("da_transformer")
    config = ref_mod.get_da_transformer_config()
    tmodel = ref_mod.DA_Transformer(3, 1, config)
    tmodel.eval()
    variables = convert_state_dict("da_transformer", tmodel.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    model = create_model("da_transformer")
    x = np.random.default_rng(0).standard_normal(
        (2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x))["main"],
                     np.float32)
    import torch
    import torch.nn.functional as F

    ref512 = run_torch(tmodel, x)
    ref = F.interpolate(
        torch.from_numpy(np.transpose(ref512, (0, 3, 1, 2))),
        size=(64, 64), mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)


def test_convert_strips_module_prefix_cli_logic():
    sd = {"module.out.conv.weight": np.zeros((1, 64, 1, 1), np.float32)}
    stripped = {k[7:] if k.startswith("module.") else k: v
                for k, v in sd.items()}
    assert "out.conv.weight" in stripped


def test_convert_unknown_model():
    with pytest.raises(ValueError, match="No converter"):
        convert_state_dict("not_a_model", {})


def _flax_tree_paths(tree):
    from jax.tree_util import tree_flatten_with_path

    return {
        "/".join(str(k.key) for k in pth): np.asarray(leaf).shape
        for pth, leaf in tree_flatten_with_path(tree)[0]
    }


@pytest.mark.parametrize("name,kwargs", [("raunet", {}),
                                         ("wranet", {"feature_channels": 32})])
def test_convert_raunet_wranet_structural(name, kwargs):
    """The reference raunet/wranet cannot run here (torchvision), but their
    state_dict key layout is fixed by the reference source. Verify the
    converter inverse-structurally: synthesize a torch-layout state_dict
    from the flax tree via the known forward mapping, convert it back, and
    require the exact flax tree (paths, shapes, values)."""
    import torch

    from unet_zoo_tpu.utils.convert import CONVERTERS

    model = create_model(name, image_size=64, **kwargs)
    x = jnp.zeros((1, 64, 64, 3))
    v0 = model.init(jax.random.PRNGKey(0), x)

    # build the torch-layout sd by trial: run the converter, add each
    # missing key it requests (4-D for weights so transposes are legal).
    # Optional keys the converter probes with `in` (never raising) must be
    # pre-seeded:
    sd = {}
    if name == "raunet":  # resnet34: stride-2 first blocks of layers 2-4
        for li in (2, 3, 4):
            for k in ("downsample.0.weight", "downsample.1.weight",
                      "downsample.1.bias", "downsample.1.running_mean",
                      "downsample.1.running_var",
                      "downsample.1.num_batches_tracked"):
                sd[f"encoder{li}.0.{k}"] = (
                    np.zeros((1, 1, 1, 1), np.float32)
                    if k.endswith("0.weight") else np.zeros((1,), np.float32))
    if name == "wranet":  # deform conv bias exists (Deformable_Resblock bias=True)
        for lv in (1, 2):
            sd[f"decoder_lv{lv}.rdb.convs.0.conv.bias"] = np.zeros(
                (1,), np.float32)
    for _ in range(20000):
        try:
            v1 = CONVERTERS[name](sd)
            break
        except KeyError as e:
            k = e.args[0]
            sd[k] = (np.zeros((1, 1, 1, 1), np.float32)
                     if k.endswith(".weight") or k.endswith("alpha")
                     else np.zeros((1,), np.float32))
    else:
        raise AssertionError("converter did not converge")

    # all keys the converter consumes exist in the reference layout source;
    # here we check the produced tree covers the full flax tree (no missing
    # or extra parameter paths)
    got_p = set(_flax_tree_paths(v1["params"]))
    want_p = set(_flax_tree_paths(v0["params"]))
    assert got_p == want_p, (sorted(want_p - got_p)[:5],
                             sorted(got_p - want_p)[:5])
    if "batch_stats" in v0:
        got_s = set(_flax_tree_paths(v1.get("batch_stats", {})))
        want_s = set(_flax_tree_paths(v0["batch_stats"]))
        assert got_s == want_s, (sorted(want_s - got_s)[:5],
                                 sorted(got_s - want_s)[:5])


def _synthetic_resnet34_sd():
    """torchvision resnet34 key layout with correctly-shaped random values
    (torchvision itself is absent from this image)."""
    import torch

    rng = np.random.default_rng(7)
    sd = {}

    def conv(key, cout, cin, k):
        sd[f"{key}.weight"] = torch.from_numpy(
            rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.05)

    def bn(key, c):
        sd[f"{key}.weight"] = torch.from_numpy(
            rng.uniform(0.5, 1.5, c).astype(np.float32))
        sd[f"{key}.bias"] = torch.from_numpy(
            rng.standard_normal(c).astype(np.float32) * 0.1)
        sd[f"{key}.running_mean"] = torch.from_numpy(
            rng.standard_normal(c).astype(np.float32) * 0.1)
        sd[f"{key}.running_var"] = torch.from_numpy(
            rng.uniform(0.5, 1.5, c).astype(np.float32))
        sd[f"{key}.num_batches_tracked"] = torch.tensor(100)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for li, (blocks, c) in enumerate([(3, 64), (4, 128), (6, 256), (3, 512)]):
        for bi in range(blocks):
            t = f"layer{li + 1}.{bi}"
            conv(f"{t}.conv1", c, cin if bi == 0 else c, 3)
            bn(f"{t}.bn1", c)
            conv(f"{t}.conv2", c, c, 3)
            bn(f"{t}.bn2", c)
            if bi == 0 and (cin != c):
                conv(f"{t}.downsample.0", c, cin, 1)
                bn(f"{t}.downsample.1", c)
        cin = c
    sd["fc.weight"] = torch.from_numpy(
        rng.standard_normal((1000, 512)).astype(np.float32) * 0.01)
    sd["fc.bias"] = torch.zeros(1000)
    return sd


def test_raunet_pretrained_from_file(tmp_path):
    """raunet(pretrained=True, weights_path=...) loads a torchvision
    resnet34 .pth into the encoder subtree (ref raunet.py:77,84-93)."""
    import torch

    sd = _synthetic_resnet34_sd()
    pth = tmp_path / "resnet34.pth"
    torch.save(sd, pth)

    model = create_model("raunet", pretrained=True, weights_path=str(pth))
    variables = model.init(jax.random.PRNGKey(0))
    enc_p = variables["params"]["encoder"]
    enc_s = variables["batch_stats"]["encoder"]

    np.testing.assert_allclose(
        np.asarray(enc_p["conv1"]["kernel"]),
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(enc_p["layer2_0"]["downsample_conv"]["kernel"]),
        sd["layer2.0.downsample.0.weight"].numpy().transpose(2, 3, 1, 0),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(enc_s["layer4_2"]["BatchNorm_1"]["var"]),
        sd["layer4.2.bn2.running_var"].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(enc_p["layer3_4"]["BatchNorm_0"]["scale"]),
        sd["layer3.4.bn1.weight"].numpy(), rtol=1e-6)

    # decoder stays random-init, and the model still runs
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert out["main"].shape == (1, 64, 64, 1)
    assert np.all(np.isfinite(np.asarray(out["main"], np.float32)))


def test_raunet_pretrained_without_path_warns(capsys):
    """No weights_path → vendored encoder. The overlay is LAZY (advisor
    r4: the 41 MB msgpack must not load on create_model alone), so the
    provenance message appears only once the overlay is applied at
    init."""
    model = create_model("raunet", pretrained=True)
    assert capsys.readouterr().out == ""  # creation is free
    model.init(jax.random.PRNGKey(0))
    assert "weights_path" in capsys.readouterr().out
