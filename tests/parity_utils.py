"""Parity-test utilities: load reference PyTorch models and inject our
flax weights into them so logits can be compared (BASELINE.json: logits
within 1e-3 of PyTorch).

The reference package can't be imported wholesale (its __init__ pulls in
torchvision/timm which aren't in this image), so individual model files
are loaded as a synthetic ``refzoo`` package with a minimal timm stub.
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import torch

REF_MODELS_PATH = "/root/reference/unet_zoo/models"


def _install_timm_stub():
    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if not self.training or not self.drop_prob:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x / keep * mask.floor_()

    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def load_ref_module(module_name: str):
    """Import ``/root/reference/unet_zoo/models/<module_name>.py`` under the
    synthetic package ``refzoo`` (resolves the files' relative imports)."""
    _install_timm_stub()
    if "refzoo" not in sys.modules:
        pkg = types.ModuleType("refzoo")
        pkg.__path__ = [REF_MODELS_PATH]
        sys.modules["refzoo"] = pkg
    return importlib.import_module(f"refzoo.{module_name}")


# ---- weight injection helpers (flax → torch) --------------------------------


def put_conv(sd, tkey, fparams, bias=True):
    """flax Conv {kernel [kh,kw,I,O], bias} → torch Conv2d weight/bias."""
    sd[f"{tkey}.weight"] = torch.from_numpy(
        np.transpose(np.asarray(fparams["kernel"]), (3, 2, 0, 1)).copy())
    if bias:
        sd[f"{tkey}.bias"] = torch.from_numpy(np.asarray(fparams["bias"]).copy())


def put_conv_transpose(sd, tkey, fparams, bias=True):
    """flax ConvTranspose kernel [kh,kw,I,O] → torch [I,O,kh,kw] flipped."""
    k = np.asarray(fparams["kernel"])[::-1, ::-1]  # un-flip spatial
    sd[f"{tkey}.weight"] = torch.from_numpy(
        np.transpose(k, (2, 3, 0, 1)).copy())
    if bias:
        sd[f"{tkey}.bias"] = torch.from_numpy(np.asarray(fparams["bias"]).copy())


def put_dense(sd, tkey, fparams, bias=True):
    """flax Dense kernel [I,O] → torch Linear weight [O,I]."""
    sd[f"{tkey}.weight"] = torch.from_numpy(
        np.asarray(fparams["kernel"]).T.copy())
    if bias and "bias" in fparams:
        sd[f"{tkey}.bias"] = torch.from_numpy(np.asarray(fparams["bias"]).copy())


def put_bn(sd, tkey, fparams, fstats, affine=True):
    """flax BatchNorm {scale,bias} + batch_stats {mean,var} → torch BN."""
    if affine:
        sd[f"{tkey}.weight"] = torch.from_numpy(np.asarray(fparams["scale"]).copy())
        sd[f"{tkey}.bias"] = torch.from_numpy(np.asarray(fparams["bias"]).copy())
    sd[f"{tkey}.running_mean"] = torch.from_numpy(np.asarray(fstats["mean"]).copy())
    sd[f"{tkey}.running_var"] = torch.from_numpy(np.asarray(fstats["var"]).copy())
    sd[f"{tkey}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)


def put_ln(sd, tkey, fparams):
    sd[f"{tkey}.weight"] = torch.from_numpy(np.asarray(fparams["scale"]).copy())
    sd[f"{tkey}.bias"] = torch.from_numpy(np.asarray(fparams["bias"]).copy())


def run_torch(model, x_nhwc: np.ndarray):
    """Run a torch reference model (eval mode) on NHWC numpy input;
    returns the main logits as NHWC numpy."""
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy()))
    if isinstance(out, dict):
        out = out.get("main", out.get("out"))
    if isinstance(out, (list, tuple)):
        out = out[-1]
    return np.transpose(out.numpy(), (0, 2, 3, 1))
