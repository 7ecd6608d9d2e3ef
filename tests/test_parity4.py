"""Parity: MedT axial attention family ('gated' = AxialBlock_dynamic) and
UCTransNet channel transformer — SURVEY hard parts #3 and #6."""

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


def _init(model, size, batch=2, seed=0):
    x = np.random.default_rng(seed).standard_normal(
        (batch, size, size, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    return x, variables


@pytest.mark.parametrize("variant", [
    "gated",
    # ref `logo` builds the identical AxialBlock_dynamic net
    # (ref: unet_zoo/models/medt_net.py:691-709 vs :731-749); this is the
    # direct (non-proxy) parity check for the registry's 'logo' entry.
    pytest.param("logo", marks=pytest.mark.slow),
])
def test_gated_axial_parity(variant):
    ref_mod = load_ref_module("medt_net")
    size = 64
    model = create_model(variant, image_size=size)
    x, variables = _init(model, size)
    fp, fs = variables["params"], variables["batch_stats"]

    tmodel = getattr(ref_mod, variant)(img_size=size, num_classes=1,
                                       in_channels=3)
    sd = {k: v.clone() for k, v in tmodel.state_dict().items()}

    def put_axial(tprefix, f, s):
        # qkv: flax Dense [in,out] → torch Conv1d k=1 weight [out,in,1]
        k = np.asarray(f["qkv"]["kernel"])
        sd[f"{tprefix}.qkv_transform.conv.weight"] = torch.from_numpy(
            k.T[:, :, None].copy())
        put_bn(sd, f"{tprefix}.bn_qkv", f["bn_qkv"], s["bn_qkv"])
        put_bn(sd, f"{tprefix}.bn_similarity", f["bn_similarity"],
               s["bn_similarity"])
        put_bn(sd, f"{tprefix}.bn_output", f["bn_output"], s["bn_output"])
        sd[f"{tprefix}.relative"] = torch.from_numpy(
            np.asarray(f["relative"]).copy())
        for g in ("f_qr", "f_kr", "f_sv", "f_sve"):
            sd[f"{tprefix}.{g}"] = torch.tensor(float(np.asarray(f[g])))

    def put_block(tprefix, f, s, has_down):
        put_conv(sd, f"{tprefix}.conv_down", f["conv_down"], bias=False)
        put_bn(sd, f"{tprefix}.bn1", f["bn1"], s["bn1"])
        put_axial(f"{tprefix}.hight_block", f["hight_block"], s["hight_block"])
        put_axial(f"{tprefix}.width_block", f["width_block"], s["width_block"])
        put_conv(sd, f"{tprefix}.conv_up", f["conv_up"], bias=False)
        put_bn(sd, f"{tprefix}.bn2", f["bn2"], s["bn2"])
        if has_down:
            put_conv(sd, f"{tprefix}.downsample.0", f["downsample_conv"],
                     bias=False)
            put_bn(sd, f"{tprefix}.downsample.1", f["downsample_bn"],
                   s["downsample_bn"])

    for c in (1, 2, 3):
        put_conv(sd, f"conv{c}", fp[f"conv{c}"], bias=False)
        put_bn(sd, f"bn{c}", fp[f"bn{c}"], fs[f"bn{c}"])

    layers = (1, 2, 4, 1)
    for li, blocks in enumerate(layers):
        for bi in range(blocks):
            f = fp[f"layer{li + 1}_{bi}"]
            s = fs[f"layer{li + 1}_{bi}"]
            put_block(f"layer{li + 1}.{bi}", f, s,
                      has_down="downsample_conv" in f)
    for d in (1, 2, 3, 4):
        put_conv(sd, f"decoder{d}", fp[f"decoder{d}"])
    put_conv(sd, "final_conv", fp["final_conv"])
    tmodel.load_state_dict(sd, strict=True)

    got = _flax_forward(model, variables, x)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_uctransnet_parity():
    ref_mod = load_ref_module("uctransnet")
    size = 64
    model = create_model("uctransnet", image_size=size)
    x, variables = _init(model, size)
    fp, fs = variables["params"], variables["batch_stats"]

    config = ref_mod.get_uctransnet_config()
    tmodel = ref_mod.UCTransNet(config, in_channels=3, num_classes=1,
                                img_size=size)
    sd = {k: v.clone() for k, v in tmodel.state_dict().items()}

    def put_cbn(tprefix, f, s):
        put_conv(sd, f"{tprefix}.conv", f["Conv_0"])
        put_bn(sd, f"{tprefix}.norm", f["BatchNorm_0"], s["BatchNorm_0"])

    put_cbn("inc", fp["inc"], fs["inc"])
    for d in range(1, 5):
        for c in range(2):
            put_cbn(f"down{d}.nConvs.{c}", fp[f"down{d}_conv{c}"],
                    fs[f"down{d}_conv{c}"])

    # channel transformer
    mtc = fp["mtc"]
    mtc_s = fs["mtc"]
    for e in range(1, 5):
        emb = mtc[f"embeddings_{e}"]
        put_conv(sd, f"mtc.embeddings_{e}.patch_embeddings",
                 emb["patch_embeddings"])
        sd[f"mtc.embeddings_{e}.position_embeddings"] = torch.from_numpy(
            np.asarray(emb["position_embeddings"]).copy())

    num_heads = 4
    for li in range(4):
        fl = mtc[f"layer_{li}"]
        t = f"mtc.encoder.layer.{li}"
        for i in range(1, 5):
            put_ln(sd, f"{t}.attn_norm{i}", fl[f"attn_norm{i}"])
            put_ln(sd, f"{t}.ffn_norm{i}", fl[f"ffn_norm{i}"])
            put_dense(sd, f"{t}.ffn{i}.fc1", fl[f"ffn{i}_fc1"])
            put_dense(sd, f"{t}.ffn{i}.fc2", fl[f"ffn{i}_fc2"])
        put_ln(sd, f"{t}.attn_norm", fl["attn_norm"])
        ca = fl["channel_attn"]
        # per-head stacked [h, C, C] → h separate torch Linears (weight = W.T)
        for qi in range(1, 5):
            w = np.asarray(ca[f"query{qi}"])
            for h in range(num_heads):
                sd[f"{t}.channel_attn.query{qi}.{h}.weight"] = torch.from_numpy(
                    w[h].T.copy())
            put_dense(sd, f"{t}.channel_attn.out{qi}", ca[f"out{qi}"])
        for name in ("key", "value"):
            w = np.asarray(ca[name])
            for h in range(num_heads):
                sd[f"{t}.channel_attn.{name}.{h}.weight"] = torch.from_numpy(
                    w[h].T.copy())
    for e in range(1, 5):
        put_ln(sd, f"mtc.encoder.encoder_norm{e}", mtc[f"encoder_norm{e}"])
        put_conv(sd, f"mtc.reconstruct_{e}.conv",
                 mtc[f"reconstruct_{e}_conv"])
        put_bn(sd, f"mtc.reconstruct_{e}.norm", mtc[f"reconstruct_{e}_bn"],
               mtc_s[f"reconstruct_{e}_bn"])

    for u in range(1, 5):
        put_dense(sd, f"up{u}.coatt.mlp_x.1", fp[f"up{u}_coatt"]["mlp_x"])
        put_dense(sd, f"up{u}.coatt.mlp_g.1", fp[f"up{u}_coatt"]["mlp_g"])
        for c in range(2):
            put_cbn(f"up{u}.nConvs.{c}", fp[f"up{u}_conv{c}"],
                    fs[f"up{u}_conv{c}"])
    put_conv(sd, "outc", fp["outc"])
    tmodel.load_state_dict(sd, strict=True)

    got = _flax_forward(model, variables, x)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)

    # vis=True: attention-weight return parity (ref uctransnet.py:494-497).
    # Same weights (vis adds no params), so the variables are reused.
    tmodel_vis = ref_mod.UCTransNet(config, in_channels=3, num_classes=1,
                                    img_size=size, vis=True)
    tmodel_vis.load_state_dict(sd, strict=True)
    tmodel_vis.eval()
    with torch.no_grad():
        t_logits, t_weights = tmodel_vis(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    model_vis = create_model("uctransnet", image_size=size, vis=True)
    out = model_vis.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out["main"], np.float32),
                               t_logits.numpy().transpose(0, 2, 3, 1),
                               atol=1e-3, rtol=1e-3)
    attn = out["attn_weights"]
    assert len(attn) == 4 and all(len(layer) == 4 for layer in attn)
    for li in range(4):
        for si in range(4):
            np.testing.assert_allclose(
                np.asarray(attn[li][si], np.float32),
                t_weights[li][si].numpy(), atol=1e-3, rtol=1e-3)
