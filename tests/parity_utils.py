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


def _install_torchvision_stub():
    """Faithful pure-torch stand-ins for the two torchvision pieces the
    reference uses (torchvision is absent from this image): a standard
    resnet34 (raunet's encoder, ref raunet.py:84-93 — weights are random;
    parity tests copy the constructed model's own state_dict) and an
    exact ``ops.deform_conv2d`` (wranet, ref wranet.py:71-78; validated
    against the numpy reference in test_deform.py)."""
    if "torchvision" in sys.modules:
        return
    import torch.nn as nn

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet34(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            cin = 64
            for li, (blocks, c, stride) in enumerate(
                    [(3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2)]):
                layers = []
                for bi in range(blocks):
                    down = None
                    if bi == 0 and (stride != 1 or cin != c):
                        down = nn.Sequential(
                            nn.Conv2d(cin, c, 1, stride, bias=False),
                            nn.BatchNorm2d(c))
                    layers.append(BasicBlock(cin, c, stride if bi == 0 else 1,
                                             down))
                    cin = c
                setattr(self, f"layer{li + 1}", nn.Sequential(*layers))
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512, 1000)

        def forward(self, x):  # pragma: no cover - raunet uses the pieces
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for li in range(1, 5):
                x = getattr(self, f"layer{li}")(x)
            return self.fc(torch.flatten(self.avgpool(x), 1))

    def resnet34(pretrained=False, **_kw):
        assert not pretrained, "torchvision stub has no pretrained weights"
        return ResNet34()

    def _pair(v):
        return v if isinstance(v, (tuple, list)) else (v, v)

    def deform_conv2d(input, offset, weight, bias=None, stride=(1, 1),
                      padding=(0, 0), dilation=(1, 1), mask=None):
        """torchvision.ops.deform_conv2d semantics, NCHW, offset_groups=1:
        offset[:, 2k]/[:, 2k+1] = (dy, dx) for tap k row-major; bilinear
        sampling, zeros out of bounds, modulation mask per tap."""
        b, cin, h, w = input.shape
        cout, cin_g, kh, kw = weight.shape
        assert cin_g == cin, "stub supports groups=1 only"
        sh, sw = _pair(stride)
        ph, pw = _pair(padding)
        dh, dw = _pair(dilation)
        ho = (h + 2 * ph - dh * (kh - 1) - 1) // sh + 1
        wo = (w + 2 * pw - dw * (kw - 1) - 1) // sw + 1
        oy = torch.arange(ho, dtype=input.dtype).view(1, ho, 1) * sh - ph
        ox = torch.arange(wo, dtype=input.dtype).view(1, 1, wo) * sw - pw
        out = torch.zeros(b, cout, ho, wo, dtype=input.dtype)
        for k in range(kh * kw):
            dy, dx = divmod(k, kw)
            py = oy + dy * dh + offset[:, 2 * k]        # [B,Ho,Wo]
            px = ox + dx * dw + offset[:, 2 * k + 1]
            y0 = torch.floor(py)
            x0 = torch.floor(px)
            sampled = torch.zeros(b, cin, ho, wo, dtype=input.dtype)
            for cy, wy in ((y0, 1 - (py - y0)), (y0 + 1, py - y0)):
                for cx, wx in ((x0, 1 - (px - x0)), (x0 + 1, px - x0)):
                    valid = ((cy >= 0) & (cy < h) & (cx >= 0)
                             & (cx < w)).to(input.dtype)
                    iy = cy.clamp(0, h - 1).long()
                    ix = cx.clamp(0, w - 1).long()
                    flat = (iy * w + ix).view(b, 1, -1).expand(b, cin, -1)
                    g = torch.gather(input.reshape(b, cin, -1), 2, flat)
                    sampled += (g.view(b, cin, ho, wo)
                                * (wy * wx * valid).unsqueeze(1))
            if mask is not None:
                sampled = sampled * mask[:, k].unsqueeze(1)
            out += torch.einsum("bchw,oc->bohw", sampled, weight[:, :, dy, dx])
        if bias is not None:
            out = out + bias.view(1, -1, 1, 1)
        return out

    tv = types.ModuleType("torchvision")
    models_mod = types.ModuleType("torchvision.models")
    ops_mod = types.ModuleType("torchvision.ops")
    models_mod.resnet34 = resnet34
    ops_mod.deform_conv2d = deform_conv2d
    tv.models = models_mod
    tv.ops = ops_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models_mod
    sys.modules["torchvision.ops"] = ops_mod


def load_ref_module(module_name: str):
    """Import ``/root/reference/unet_zoo/models/<module_name>.py`` under the
    synthetic package ``refzoo`` (resolves the files' relative imports)."""
    _install_timm_stub()
    _install_torchvision_stub()
    if "refzoo" not in sys.modules:
        pkg = types.ModuleType("refzoo")
        pkg.__path__ = [REF_MODELS_PATH]
        sys.modules["refzoo"] = pkg
    return importlib.import_module(f"refzoo.{module_name}")


def load_ref_module_repaired(module_name: str, repairs):
    """Load a reference model file with minimal in-memory textual repairs
    (the read-only file is untouched): for each (anchor, insertion) pair,
    ``insertion`` is inserted as a new line right after the first source
    line containing ``anchor``. Used to parity-test models whose reference
    has a construction-breaking bug (egeunet quirk Q2: GHPA lacks
    ``super().__init__()``, ref egeunet.py:100-104)."""
    _install_timm_stub()
    _install_torchvision_stub()
    path = f"{REF_MODELS_PATH}/{module_name}.py"
    lines = open(path).read().splitlines()
    for anchor, insertion in repairs:
        for i, line in enumerate(lines):
            if anchor in line:
                lines.insert(i + 1, insertion)
                break
        else:
            raise AssertionError(f"repair anchor not found: {anchor!r}")
    mod = types.ModuleType(f"refzoo.{module_name}_repaired")
    mod.__package__ = "refzoo"
    mod.__file__ = path
    sys.modules[mod.__name__] = mod
    exec(compile("\n".join(lines), path, "exec"), mod.__dict__)
    return mod


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
