"""Convert reference PyTorch checkpoints (.pth state_dicts) to this
framework's variables, so users migrating from `unet_zoo` keep their
trained weights.

Supported models: unet, attention_unet, nested_unet, u2net, u2netp,
resunet, multiresunet. (The flax→torch direction of the same mappings is
exercised by tests/test_parity*.py; conversion here is the inverse, and
tests/test_convert.py round-trips logits through both frameworks.)

CLI::

    python -m unet_zoo_tpu.utils.convert --model unet \
        --pth unet_best.pth --out unet_best_orbax [--image-size 512]
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


class TorchReader:
    """Pulls flax-layout arrays out of a torch state_dict (numpy values)."""

    def __init__(self, state_dict: Dict[str, Any]):
        self.sd = {
            k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
            for k, v in state_dict.items()
        }
        self.used = set()

    def _get(self, key):
        self.used.add(key)
        return self.sd[key]

    def conv(self, key, bias=True):
        out = {"kernel": np.transpose(self._get(f"{key}.weight"), (2, 3, 1, 0))}
        if bias:
            out["bias"] = self._get(f"{key}.bias")
        return out

    def conv_transpose(self, key, bias=True):
        w = np.transpose(self._get(f"{key}.weight"), (2, 3, 0, 1))
        out = {"kernel": w[::-1, ::-1].copy()}
        if bias:
            out["bias"] = self._get(f"{key}.bias")
        return out

    def dense(self, key, bias=True):
        out = {"kernel": self._get(f"{key}.weight").T.copy()}
        if bias and f"{key}.bias" in self.sd:
            out["bias"] = self._get(f"{key}.bias")
        return out

    def bn(self, key, affine=True):
        params = {}
        if affine:
            params = {"scale": self._get(f"{key}.weight"),
                      "bias": self._get(f"{key}.bias")}
        stats = {"mean": self._get(f"{key}.running_mean"),
                 "var": self._get(f"{key}.running_var")}
        self.used.add(f"{key}.num_batches_tracked")
        return params, stats

    def unused(self):
        return sorted(set(self.sd) - self.used)


def _double_conv(r: TorchReader, tprefix: str, idxs=(0, 3)):
    """DoubleConv params+stats (torch Sequential conv/bn at idxs, idxs+1)."""
    p, s = {}, {}
    for i, name in enumerate(["ConvNormAct_0", "ConvNormAct_1"]):
        bn_p, bn_s = r.bn(f"{tprefix}.{idxs[i] + 1}")
        p[name] = {"Conv_0": r.conv(f"{tprefix}.{idxs[i]}"),
                   "BatchNorm_0": bn_p}
        s[name] = {"BatchNorm_0": bn_s}
    return p, s


def convert_unet(sd) -> Dict[str, Any]:
    r = TorchReader(sd)
    p, s = {}, {}
    for i in range(4):
        dp, ds = _double_conv(r, f"down_convolution_{i + 1}.conv.conv_op")
        p[f"DownSample_{i}"] = {"DoubleConv_0": dp}
        s[f"DownSample_{i}"] = {"DoubleConv_0": ds}
    p["DoubleConv_0"], s["DoubleConv_0"] = _double_conv(r, "bottle_neck.conv_op")
    for i in range(4):
        dp, ds = _double_conv(r, f"up_convolution_{i + 1}.conv.conv_op")
        p[f"UpSampleUNet_{i}"] = {
            "TransposedUp_0": {"ConvTranspose_0":
                               r.conv_transpose(f"up_convolution_{i + 1}.up")},
            "DoubleConv_0": dp,
        }
        s[f"UpSampleUNet_{i}"] = {"DoubleConv_0": ds}
    p["OutConv_0"] = {"Conv_0": r.conv("out.conv")}
    return {"params": p, "batch_stats": s}


def convert_attention_unet(sd) -> Dict[str, Any]:
    r = TorchReader(sd)
    p, s = {}, {}
    for i in range(1, 6):
        p[f"conv{i}"], s[f"conv{i}"] = _double_conv(r, f"conv{i}.conv")
    for i in range(5, 1, -1):
        bn_p, bn_s = r.bn(f"up{i}.up.2")
        p[f"up{i}"] = {"ConvNormAct_0": {"Conv_0": r.conv(f"up{i}.up.1"),
                                         "BatchNorm_0": bn_p}}
        s[f"up{i}"] = {"ConvNormAct_0": {"BatchNorm_0": bn_s}}
        g_p, g_s = r.bn(f"att{i}.w_g.1")
        x_p, x_s = r.bn(f"att{i}.w_x.1")
        psi_p, psi_s = r.bn(f"att{i}.psi.1")
        p[f"att{i}"] = {"Conv_0": r.conv(f"att{i}.w_g.0"), "BatchNorm_0": g_p,
                        "Conv_1": r.conv(f"att{i}.w_x.0"), "BatchNorm_1": x_p,
                        "Conv_2": r.conv(f"att{i}.psi.0"), "BatchNorm_2": psi_p}
        s[f"att{i}"] = {"BatchNorm_0": g_s, "BatchNorm_1": x_s,
                        "BatchNorm_2": psi_s}
        p[f"upconv{i}"], s[f"upconv{i}"] = _double_conv(r, f"upconv{i}.conv")
    p["conv_1x1"] = r.conv("conv_1x1")
    return {"params": p, "batch_stats": s}


def convert_nested_unet(sd) -> Dict[str, Any]:
    r = TorchReader(sd)
    p, s = {}, {}
    cells = ["0_0", "1_0", "2_0", "3_0", "4_0", "0_1", "1_1", "2_1", "3_1",
             "0_2", "1_2", "2_2", "0_3", "1_3", "0_4"]
    for cell in cells:
        bn1_p, bn1_s = r.bn(f"conv{cell}.bn1")
        bn2_p, bn2_s = r.bn(f"conv{cell}.bn2")
        p[f"conv{cell}"] = {
            "ConvNormAct_0": {"Conv_0": r.conv(f"conv{cell}.conv1"),
                              "BatchNorm_0": bn1_p},
            "ConvNormAct_1": {"Conv_0": r.conv(f"conv{cell}.conv2"),
                              "BatchNorm_0": bn2_p},
        }
        s[f"conv{cell}"] = {"ConvNormAct_0": {"BatchNorm_0": bn1_s},
                            "ConvNormAct_1": {"BatchNorm_0": bn2_s}}
    if "final.weight" in r.sd:
        p["final"] = r.conv("final")
    else:  # deep supervision heads
        for i in range(1, 5):
            p[f"final{i}"] = r.conv(f"final{i}")
    return {"params": p, "batch_stats": s}


def _rebnconv(r: TorchReader, tkey: str):
    bn_p, bn_s = r.bn(f"{tkey}.bn_s1")
    return ({"Conv_0": r.conv(f"{tkey}.conv_s1"), "BatchNorm_0": bn_p},
            {"BatchNorm_0": bn_s})


def _rsu(r: TorchReader, tkey: str, levels) -> tuple:
    p, s = {}, {}
    p["rebnconvin"], s["rebnconvin"] = _rebnconv(r, f"{tkey}.rebnconvin")
    if levels == "F":
        names = [f"rebnconv{i}" for i in range(1, 5)] + \
                [f"rebnconv{i}d" for i in (3, 2, 1)]
    else:
        names = [f"rebnconv{i}" for i in range(1, levels + 1)] + \
                [f"rebnconv{i}d" for i in range(levels - 1, 0, -1)]
    for n in names:
        p[n], s[n] = _rebnconv(r, f"{tkey}.{n}")
    return p, s


def convert_u2net(sd) -> Dict[str, Any]:
    r = TorchReader(sd)
    p, s = {}, {}
    stage_levels = {"stage1": 7, "stage2": 6, "stage3": 5, "stage4": 4,
                    "stage5": "F", "stage6": "F", "stage5d": "F",
                    "stage4d": 4, "stage3d": 5, "stage2d": 6, "stage1d": 7}
    for name, lv in stage_levels.items():
        p[name], s[name] = _rsu(r, name, lv)
    for i in range(1, 7):
        p[f"side{i}"] = r.conv(f"side{i}")
    p["outconv"] = r.conv("outconv")
    return {"params": p, "batch_stats": s}


def convert_resunet(sd) -> Dict[str, Any]:
    r = TorchReader(sd)
    p, s = {}, {}
    bn_p, bn_s = r.bn("input_layer.1")
    p["Conv_0"] = r.conv("input_layer.0")
    p["BatchNorm_0"], s["BatchNorm_0"] = bn_p, bn_s
    p["Conv_1"] = r.conv("input_layer.3")
    p["Conv_2"] = r.conv("input_skip.0")
    torch_names = ["residual_conv_1", "residual_conv_2", "bridge",
                   "up_residual_conv1", "up_residual_conv2", "up_residual_conv3"]
    for i, tname in enumerate(torch_names):
        b0_p, b0_s = r.bn(f"{tname}.conv_block.0")
        b1_p, b1_s = r.bn(f"{tname}.conv_block.3")
        b2_p, b2_s = r.bn(f"{tname}.conv_skip.1")
        p[f"ResidualConv_{i}"] = {
            "BatchNorm_0": b0_p,
            "Conv_0": r.conv(f"{tname}.conv_block.2", bias=False),
            "BatchNorm_1": b1_p,
            "Conv_1": r.conv(f"{tname}.conv_block.5", bias=False),
            "Conv_2": r.conv(f"{tname}.conv_skip.0", bias=False),
            "BatchNorm_2": b2_p,
        }
        s[f"ResidualConv_{i}"] = {"BatchNorm_0": b0_s, "BatchNorm_1": b1_s,
                                  "BatchNorm_2": b2_s}
    for i, tname in enumerate(["upsample_1", "upsample_2", "upsample_3"]):
        p[f"TransposedUp_{i}"] = {
            "ConvTranspose_0": r.conv_transpose(f"{tname}.upsample")}
    p["Conv_3"] = r.conv("output_layer.0")
    return {"params": p, "batch_stats": s}


def convert_multiresunet(sd) -> Dict[str, Any]:
    r = TorchReader(sd)
    p, s = {}, {}

    def cbn(tkey):
        # affine-less BN: flax creates no params for it, only batch stats
        _, bn_s = r.bn(f"{tkey}.batchnorm", affine=False)
        return {"Conv_0": r.conv(f"{tkey}.conv1")}, {"BatchNorm_0": bn_s}

    for i in range(1, 10):
        t = f"multiresblock{i}"
        bp, bs = {}, {}
        for cn, suffix in zip(
            ["ConvNormAct_0", "ConvNormAct_1", "ConvNormAct_2", "ConvNormAct_3"],
            ["conv2d_bn_1x1", "conv2d_bn_3x3", "conv2d_bn_5x5", "conv2d_bn_7x7"],
        ):
            bp[cn], bs[cn] = cbn(f"{t}.{suffix}")
        _, bs["shared_bn"] = r.bn(f"{t}.batch_norm1", affine=False)
        p[f"mrb{i}"], s[f"mrb{i}"] = bp, bs
    for i, length in zip(range(1, 5), (4, 3, 2, 1)):
        t = f"respath{i}"
        bp, bs = {}, {}
        bp["ConvNormAct_0"], bs["ConvNormAct_0"] = cbn(f"{t}.conv2d_bn_1x1_initial")
        bp["ConvNormAct_1"], bs["ConvNormAct_1"] = cbn(f"{t}.conv2d_bn_3x3_initial")
        _, bs["BatchNorm_0"] = r.bn(f"{t}.batch_norm_initial", affine=False)
        for k in range(length - 1):
            bp[f"ConvNormAct_{2 + 2 * k}"], bs[f"ConvNormAct_{2 + 2 * k}"] = cbn(
                f"{t}.blocks.{k}.0")
            bp[f"ConvNormAct_{3 + 2 * k}"], bs[f"ConvNormAct_{3 + 2 * k}"] = cbn(
                f"{t}.blocks.{k}.1")
            _, bs[f"BatchNorm_{1 + k}"] = r.bn(f"{t}.blocks.{k}.2", affine=False)
        p[f"respath{i}"], s[f"respath{i}"] = bp, bs
    for i in range(6, 10):
        p[f"up{i}"] = {"ConvTranspose_0": r.conv_transpose(f"upsample{i}")}
    p["conv_final"], s["conv_final"] = cbn("conv_final")
    return {"params": p, "batch_stats": s}


CONVERTERS = {
    "unet": convert_unet,
    "attention_unet": convert_attention_unet,
    "nested_unet": convert_nested_unet,
    "u2net": convert_u2net,
    "u2netp": convert_u2net,
    "resunet": convert_resunet,
    "multiresunet": convert_multiresunet,
}


def convert_state_dict(model_name: str, state_dict) -> Dict[str, Any]:
    """torch state_dict → flax variables {'params', 'batch_stats'}."""
    name = model_name.lower()
    if name not in CONVERTERS:
        raise ValueError(
            f"No converter for '{model_name}'. Available: {sorted(CONVERTERS)}")
    return CONVERTERS[name](state_dict)


def main():
    import argparse

    import torch

    from unet_zoo_tpu.utils.checkpoint import save_checkpoint

    parser = argparse.ArgumentParser(
        description="Convert a reference .pth checkpoint to orbax.")
    parser.add_argument("--model", required=True)
    parser.add_argument("--pth", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    sd = torch.load(args.pth, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # strip DataParallel 'module.' prefixes (ref: utils/multi_gpu.py:44-53)
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    variables = convert_state_dict(args.model, sd)
    save_checkpoint(args.out, {"variables": variables,
                               "meta": {"converted_from": args.pth,
                                        "model_name": args.model}})
    print(f"Converted {args.pth} -> {args.out}")


if __name__ == "__main__":
    main()
