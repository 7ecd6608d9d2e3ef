"""Parity for the hardest numerics: swin_unet_v2 (cosine attention, tau,
log-CPB, shifted-window masks) and missformer (multi-scale token bridge).

Torch models have registered-but-unused parameters (Swin's norm2/MLP are
never applied in the reference forward; MISSFormer bridge layers 2-4 have
unused projections), so the injected state_dict starts from the torch
template and overwrites the functional keys.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from parity_utils import (
    load_ref_module,
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


def test_swin_unet_v2_parity():
    ref_mod = load_ref_module("swin_unet_v2")
    size = 64
    model = create_model("swin_unet_v2", image_size=size, window_size=8,
                         drop_path_rate=0.0)
    x, variables = _init(model, size)
    fp = variables["params"]

    tmodel = ref_mod.SwinTransformerSys(
        img_size=size, in_chans=3, num_classes=1, window_size=8,
        drop_path_rate=0.0)
    sd = {k: v.clone() for k, v in tmodel.state_dict().items()}

    def put_tau(tkey, fblk):
        sd[tkey] = torch.from_numpy(np.asarray(fblk["attn"]["tau"]).copy())

    def put_block(tprefix, fblk):
        put_dense(sd, f"{tprefix}.attn.qkv", fblk["attn"]["qkv"])
        put_dense(sd, f"{tprefix}.attn.proj", fblk["attn"]["proj"])
        put_dense(sd, f"{tprefix}.attn.cpb.fc1", fblk["attn"]["cpb_fc1"])
        put_dense(sd, f"{tprefix}.attn.cpb.fc2", fblk["attn"]["cpb_fc2"])
        put_tau(f"{tprefix}.attn.tau", fblk)
        put_ln(sd, f"{tprefix}.norm1", fblk["norm1"])

    put_conv(sd, "patch_embed.proj", fp["patch_embed"])
    put_ln(sd, "patch_embed.norm", fp["patch_norm"])

    depths = (2, 2, 2, 2)
    for l in range(4):
        for i in range(depths[l]):
            put_block(f"layers.{l}.blocks.{i}", fp[f"layer{l}_blk{i}"])
        if l < 3:
            dn = fp[f"layer{l}_downsample"]
            put_ln(sd, f"layers.{l}.downsample.norm", dn["norm"])
            put_dense(sd, f"layers.{l}.downsample.reduction", dn["reduction"])

    put_dense(sd, "layers_up.0.expand", fp["layer_up0"]["expand"])
    put_ln(sd, "layers_up.0.norm", fp["layer_up0"]["norm"])
    for u in range(1, 4):
        for i in range(depths[3 - u]):
            put_block(f"layers_up.{u}.blocks.{i}", fp[f"layer_up{u}_blk{i}"])
        if u < 3:
            up = fp[f"layer_up{u}_upsample"]
            put_dense(sd, f"layers_up.{u}.upsample.expand", up["expand"])
            put_ln(sd, f"layers_up.{u}.upsample.norm", up["norm"])
        put_dense(sd, f"concat_back_dim.{u}", fp[f"concat_back_dim{u}"])

    put_ln(sd, "norm", fp["norm"])
    put_ln(sd, "norm_up", fp["norm_up"])
    put_dense(sd, "up.expand", fp["up"]["expand"])
    put_ln(sd, "up.norm", fp["up"]["norm"])
    put_conv(sd, "output", fp["output"], bias=False)
    tmodel.load_state_dict(sd, strict=True)

    got = _flax_forward(model, variables, x)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_missformer_parity():
    ref_mod = load_ref_module("missformer")
    size = 64
    model = create_model("missformer", image_size=size)
    x, variables = _init(model, size)
    fp = variables["params"]

    tmodel = ref_mod.MISSFormer(num_classes=1, in_channels=3, image_size=size)
    sd = {k: v.clone() for k, v in tmodel.state_dict().items()}

    def put_mixffn_skip(tprefix, f):
        put_dense(sd, f"{tprefix}.fc1", f["fc1"])
        put_conv(sd, f"{tprefix}.dwconv.dwconv", f["DWConv_0"]["dwconv"])
        put_dense(sd, f"{tprefix}.fc2", f["fc2"])
        put_ln(sd, f"{tprefix}.norm1", f["norm1"])

    def put_sr_attn(tprefix, f, has_sr):
        put_dense(sd, f"{tprefix}.q", f["q"])
        put_dense(sd, f"{tprefix}.kv", f["kv"])
        put_dense(sd, f"{tprefix}.proj", f["proj"])
        if has_sr:
            put_conv(sd, f"{tprefix}.sr", f["sr"])
            put_ln(sd, f"{tprefix}.norm", f["sr_norm"])

    def put_tblock(tprefix, f, has_sr):
        put_ln(sd, f"{tprefix}.norm1", f["norm1"])
        put_sr_attn(f"{tprefix}.attn", f["attn"], has_sr)
        put_ln(sd, f"{tprefix}.norm2", f["norm2"])
        put_mixffn_skip(f"{tprefix}.mlp", f["mlp"])

    # backbone MiT (B1: depths 2,2,2,2; sr ratios 8,4,2,1)
    bb = fp["backbone"]
    sr_ratios = (8, 4, 2, 1)
    for s in range(4):
        pe = bb[f"patch_embed{s + 1}"]
        put_conv(sd, f"backbone.patch_embed{s + 1}.proj", pe["proj"])
        put_ln(sd, f"backbone.patch_embed{s + 1}.norm", pe["norm"])
        for i in range(2):
            put_tblock(f"backbone.block{s + 1}.{i}", bb[f"block{s + 1}_{i}"],
                       sr_ratios[s] > 1)
        put_ln(sd, f"backbone.norm{s + 1}", bb[f"norm{s + 1}"])

    # bridge: 4 layers; projections only on layer 1
    br = fp["bridge"]
    for li in range(1, 5):
        fl = br[f"bridge_layer{li}"]
        t = f"bridge.bridge_layer{li}"
        if li == 1:
            for c in range(1, 5):
                put_dense(sd, f"{t}.proj_c{c}", fl[f"proj_c{c}"])
        put_ln(sd, f"{t}.norm1", fl["norm1"])
        put_ln(sd, f"{t}.norm2", fl["norm2"])
        attn = fl["attn"]
        put_dense(sd, f"{t}.attn.q", attn["q"])
        put_dense(sd, f"{t}.attn.kv", attn["kv"])
        put_dense(sd, f"{t}.attn.proj", attn["proj"])
        put_ln(sd, f"{t}.attn.scale_reduce.norm", attn["sr_norm"])
        for i, rr in enumerate(sr_ratios):
            if rr > 1:
                put_conv(sd, f"{t}.attn.scale_reduce.sr_convs.{i}",
                         attn[f"sr{i}"])
        for m in range(1, 5):
            put_mixffn_skip(f"{t}.mixffn{m}", fl[f"mixffn{m}"])
    for c in range(1, 5):
        put_dense(sd, f"bridge.proj_back_c{c}", br[f"proj_back_c{c}"])

    # decoders (decoder_3 has no skip → concat_linear unused; template keeps it)
    dec_specs = [("decoder_3", 1, False), ("decoder_2", 2, True),
                 ("decoder_1", 4, True), ("decoder_0", 8, True)]
    for name, rr, has_concat in dec_specs:
        f = fp[name]
        if has_concat:
            put_dense(sd, f"{name}.concat_linear", f["concat_linear"])
        put_tblock(f"{name}.layer_former_1", f["layer_former_1"], rr > 1)
        put_tblock(f"{name}.layer_former_2", f["layer_former_2"], rr > 1)
        put_dense(sd, f"{name}.layer_up.expand", f["layer_up"]["expand"])
        put_ln(sd, f"{name}.layer_up.norm", f["layer_up"]["norm"])
        if name == "decoder_0":
            put_conv(sd, f"{name}.last_layer", f["last_layer"])
    tmodel.load_state_dict(sd, strict=True)

    got = _flax_forward(model, variables, x)
    ref = run_torch(tmodel, x)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)
