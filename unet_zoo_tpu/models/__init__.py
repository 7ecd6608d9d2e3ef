"""Model registry: ``create_model`` / ``list_models`` / ``get_model_config``.

TPU-native rebuild of the reference registry (ref: unet_zoo/models/__init__.py:27-238)
with the same names, defaults, kwarg-override precedence and ``image_size``
requirements — but instead of an isinstance-dispatched loss in the trainer,
each registry entry carries a declarative ``ModelSpec`` (output-key loss
weights, image-size requirement), and every model returns the unified
output protocol ``{'main': logits, 'side*': aux_logits...}``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, List, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConfigDict(dict):
    """Attribute-access dict, like the reference's ml_collections mock
    (ref: models/common_layers.py:6-18). ``get_model_config`` returns
    these so ``cfg.base_channel``-style access keeps working."""

    def __getattr__(self, key):
        try:
            v = self[key]
        except KeyError as e:
            raise AttributeError(key) from e
        return ConfigDict(v) if isinstance(v, dict) and not isinstance(v, ConfigDict) else v

    def __setattr__(self, key, value):
        self[key] = value


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Declarative per-model metadata attached to a registry entry."""

    name: str
    build: Callable[..., nn.Module]
    requires_image_size: bool = False
    default_image_size: Optional[int] = None
    # Per-output-key loss weights. Keys absent here get 1.0 for 'main' and
    # `default_aux_weight` otherwise (matches the reference's
    # `WEIGHTS.get(key, 0.5)` fallback, ref: utils/training_loop.py:63,69).
    loss_weights: Mapping[str, float] = dataclasses.field(default_factory=dict)
    default_aux_weight: float = 0.5
    config_fn: Optional[Callable[..., Any]] = None
    # pretrained_loader(weights_path) -> overlay(variables) -> variables:
    # file-based pretrained-weight initialization (zero-egress replacement
    # for the reference's torchvision downloads, ref raunet.py:84-93).
    pretrained_loader: Optional[Callable[[str], Callable[[Any], Any]]] = None
    # The reference's RAUNet ctor defaults pretrained=True and downloads
    # its encoder regardless of create_model's flag (ref raunet.py:77,
    # models/__init__.py:111-114,230-233) — entries with this set load
    # their pretrained encoder when create_model's `pretrained` is left
    # unspecified. (Deviation from the quirk: an explicit
    # pretrained=False here actually disables it; the reference cannot.)
    pretrained_by_default: bool = False
    # Default jax.checkpoint (remat) for this model's train step: set for
    # members whose backward is activation-traffic-bound (measured wins
    # only — see BENCH_NOTES). Callers can still override per run.
    train_remat: bool = False

    def loss_weight(self, key: str) -> float:
        if key in self.loss_weights:
            return self.loss_weights[key]
        return 1.0 if key == "main" else self.default_aux_weight


_REGISTRY: Dict[str, ModelSpec] = {}


def register_model(name: str, **spec_kwargs):
    """Decorator registering a build function under ``name``."""

    def deco(build_fn: Callable[..., nn.Module]) -> Callable[..., nn.Module]:
        _REGISTRY[name] = ModelSpec(name=name, build=build_fn, **spec_kwargs)
        return build_fn

    return deco


def list_models() -> List[str]:
    """All available model names, sorted (ref: models/__init__.py:59-61)."""
    return sorted(_REGISTRY.keys())


def get_model_config(model_name: str, **kwargs) -> Dict[str, Any]:
    """Default config for models that carry one (da_transformer, uctransnet);
    empty dict otherwise (ref: models/__init__.py:63-76)."""
    spec = _REGISTRY.get(model_name.lower())
    if spec is not None and spec.config_fn is not None:
        return ConfigDict(spec.config_fn(**kwargs))
    return ConfigDict()


@dataclasses.dataclass
class ZooModel:
    """Thin functional handle around a Flax module.

    ``init`` produces the variables pytree; ``apply`` runs the forward pass,
    returning ``(outputs, updated_state)`` when ``train=True`` (batch-stats
    update) and plain ``outputs`` otherwise. ``module`` is the raw Flax
    module for power users.
    """

    name: str
    module: nn.Module
    spec: ModelSpec
    in_channels: int
    num_classes: int
    image_size: Optional[int]
    # applied to freshly-initialized variables (pretrained-weight merge)
    init_overlay: Optional[Callable[[Any], Any]] = None

    def dummy_input(self, batch: int = 1, image_size: Optional[int] = None) -> jnp.ndarray:
        size = image_size or self.image_size or 256
        return jnp.zeros((batch, size, size, self.in_channels), jnp.float32)

    def init(self, rng, sample: Optional[jnp.ndarray] = None):
        if sample is None:
            sample = self.dummy_input()
        # jit the whole init: one compile instead of per-op eager dispatch
        # (matters on remote-compile TPU backends)
        init_fn = jax.jit(lambda r, s: self.module.init(r, s, train=False))
        variables = init_fn(rng, sample)
        if self.init_overlay is not None:
            variables = self.init_overlay(variables)
        return variables

    def apply(self, variables, x, train: bool = False, rngs=None, **kwargs):
        if train:
            if rngs is None:
                rngs = {"dropout": jax.random.PRNGKey(0)}
            return self.module.apply(
                variables, x, train=True, mutable=["batch_stats"], rngs=rngs, **kwargs
            )
        return self.module.apply(variables, x, train=False, rngs=rngs, **kwargs)

    def loss_weight(self, key: str) -> float:
        return self.spec.loss_weight(key)

    @property
    def train_remat(self) -> bool:
        return self.spec.train_remat

    def with_bridge_pipeline(self, mesh, num_microbatches: int = 4,
                             batch_axis: Optional[str] = None) -> "ZooModel":
        """Clone with the model's homogeneous layer stack GPipe-pipelined
        over ``mesh``'s 'model' axis (currently: uctransnet's 4-layer
        channel-transformer bridge). The returned model uses the same
        variables/checkpoints; only execution placement changes
        (YAML: gpu.multi_gpu_strategy = pipeline)."""
        if not hasattr(self.module, "bridge_pipeline"):
            raise ValueError(
                f"model '{self.name}' has no pipelinable stage stack — "
                "pipeline parallelism applies to uctransnet (its 4 "
                "shape-identical CTransBlock bridge layers; DESIGN.md "
                "records why encoder/decoder cuts don't pipeline in a "
                "skip-connected UNet)")
        module = self.module.clone(
            bridge_pipeline=(mesh, num_microbatches, batch_axis))
        return dataclasses.replace(self, module=module)


def create_model(model_name: str, pretrained: Optional[bool] = None,
                 **kwargs) -> ZooModel:
    """Instantiate a zoo model by name (ref: models/__init__.py:78-238).

    Same call contract as the reference: ``in_channels`` (3), ``num_classes``
    (1), ``image_size`` (required by uctransnet/swin_unet_v2), ``depth`` (5),
    remaining kwargs forwarded to the model with user values winning over
    defaults. Adds ``dtype`` for bf16 compute.

    ``pretrained=None`` (unspecified) resolves to the entry's default —
    False everywhere except raunet, whose reference ctor loads its
    ImageNet encoder by default (ref raunet.py:77); see
    ``ModelSpec.pretrained_by_default`` for the offline resolution chain.
    """
    key = model_name.lower()
    if key not in _REGISTRY:
        raise ValueError(
            f"Unknown model: '{model_name}'. Available models: {list_models()}"
        )
    spec = _REGISTRY[key]
    if pretrained is None:
        pretrained = spec.pretrained_by_default

    in_channels = kwargs.pop("in_channels", 3)
    num_classes = kwargs.pop("num_classes", 1)
    image_size = kwargs.pop("image_size", None)
    depth = kwargs.pop("depth", 5)
    dtype = kwargs.pop("dtype", jnp.float32)
    weights_path = kwargs.pop("weights_path", None)

    if spec.requires_image_size and image_size is None:
        raise ValueError(
            f"Model '{model_name}' requires 'image_size' parameter in config."
        )
    if image_size is None:
        image_size = spec.default_image_size

    module = spec.build(
        in_channels=in_channels,
        num_classes=num_classes,
        image_size=image_size,
        depth=depth,
        dtype=dtype,
        **kwargs,
    )

    init_overlay = None
    if pretrained:
        if spec.pretrained_loader is not None:
            # loader resolves its own fallback chain (explicit path →
            # $UNET_ZOO_RESNET34 → vendored pretrained encoder → None
            # with a warning) — see _raunet_pretrained_loader
            init_overlay = spec.pretrained_loader(weights_path)
        else:
            print(f"Warning: Pre-trained weights for {model_name} are not "
                  "yet implemented.")

    return ZooModel(
        name=key,
        module=module,
        spec=spec,
        in_channels=in_channels,
        num_classes=num_classes,
        image_size=image_size,
        init_overlay=init_overlay,
    )


# --- registrations -----------------------------------------------------------

from unet_zoo_tpu.models.unet import UNet
from unet_zoo_tpu.models.attention_unet import AttentionUNet
from unet_zoo_tpu.models.resunet import ResUnet
from unet_zoo_tpu.models.nested_unet import NestedUNet
from unet_zoo_tpu.models.multiresunet import MultiResUnet
from unet_zoo_tpu.models.u2net import U2Net
from unet_zoo_tpu.models.transatt_unet import TransAttUNet
from unet_zoo_tpu.models.unet_transformer import UTransformer
from unet_zoo_tpu.models.unext import UNext
from unet_zoo_tpu.models.egeunet import EGEUNet
from unet_zoo_tpu.models.mmunet import MMUNet
from unet_zoo_tpu.models.wranet import WRANet
from unet_zoo_tpu.models.vnet import VNet
from unet_zoo_tpu.models.raunet import RAUNet
from unet_zoo_tpu.models.da_transformer import DATransformer, get_da_transformer_config
from unet_zoo_tpu.models.missformer import MISSFormer
from unet_zoo_tpu.models.uctransnet import UCTransNet, get_uctransnet_config
from unet_zoo_tpu.models.swin_unet_v2 import SwinUNetV2
from unet_zoo_tpu.models.medt_net import ResAxialAttentionUNet

_U2NET_LOSS_WEIGHTS = {  # ref: utils/training_loop.py:23-31
    "main": 1.0, "side1": 1.0, "side2": 1.0, "side3": 1.0,
    "side4": 1.0, "side5": 1.0, "side6": 1.0,
}


@register_model("unet")
def _build_unet(in_channels, num_classes, image_size, depth, dtype, **kw):
    return UNet(in_channels=in_channels, num_classes=num_classes, dtype=dtype, **kw)


@register_model("attention_unet")
def _build_attention_unet(in_channels, num_classes, image_size, depth, dtype, **kw):
    return AttentionUNet(
        in_channels=in_channels, num_classes=num_classes, depth=depth, dtype=dtype, **kw
    )


@register_model("resunet")
def _build_resunet(in_channels, num_classes, image_size, depth, dtype, **kw):
    filters = tuple(kw.pop("filters", (64, 128, 256, 512)))
    return ResUnet(
        in_channels=in_channels, num_classes=num_classes, filters=filters,
        dtype=dtype, **kw,
    )


@register_model("transatt_unet")
def _build_transatt_unet(in_channels, num_classes, image_size, depth, dtype, **kw):
    return TransAttUNet(in_channels=in_channels, num_classes=num_classes,
                        bilinear=kw.pop("bilinear", True), dtype=dtype, **kw)


@register_model("unet_transformer")
def _build_unet_transformer(in_channels, num_classes, image_size, depth, dtype, **kw):
    attn_res = tuple(kw.pop("common_attn_res_for_QK_V", (64, 64)))
    return UTransformer(in_channels=in_channels, num_classes=num_classes,
                        bilinear=kw.pop("bilinear", True), attn_res=attn_res,
                        dtype=dtype, **kw)


@register_model("multiresunet")
def _build_multiresunet(in_channels, num_classes, image_size, depth, dtype, **kw):
    return MultiResUnet(
        in_channels=in_channels, num_classes=num_classes,
        filters=kw.pop("filters", 32), dtype=dtype, **kw,
    )


@register_model("u2net", loss_weights=_U2NET_LOSS_WEIGHTS)
def _build_u2net(in_channels, num_classes, image_size, depth, dtype, **kw):
    return U2Net(in_channels=in_channels, num_classes=num_classes,
                 small=False, dtype=dtype, **kw)


@register_model("u2netp", loss_weights=_U2NET_LOSS_WEIGHTS)
def _build_u2netp(in_channels, num_classes, image_size, depth, dtype, **kw):
    return U2Net(in_channels=in_channels, num_classes=num_classes,
                 small=True, dtype=dtype, **kw)


def _build_unext_family(small, in_channels, num_classes, image_size, dtype, kw):
    # defaults per ref: models/__init__.py:185-199, unext.py:201-210,330-344
    if small:
        defaults = dict(embed_dims=(64, 128, 160), num_heads=(1, 2, 4),
                        mlp_ratios=(4, 4, 4), depths=(2, 2, 2), sr_ratios=(8, 4, 2))
        for k in defaults:
            kw.pop(k, None)
    else:
        defaults = dict(
            embed_dims=kw.pop("embed_dims", None) or (128, 160, 256),
            num_heads=kw.pop("num_heads", None) or (1, 2, 4, 8),
            mlp_ratios=kw.pop("mlp_ratios", None) or (4, 4, 4, 4),
            depths=kw.pop("depths", None) or (3, 4, 6, 3),
            sr_ratios=kw.pop("sr_ratios", None) or (8, 4, 2, 1),
        )
    kw.pop("norm_layer", None)  # accepted for API parity; LayerNorm is fixed
    return UNext(
        in_channels=in_channels, num_classes=num_classes,
        qkv_bias=kw.pop("qkv_bias", False), qk_scale=kw.pop("qk_scale", None),
        drop_rate=kw.pop("drop_rate", 0.0),
        attn_drop_rate=kw.pop("attn_drop_rate", 0.0),
        drop_path_rate=kw.pop("drop_path_rate", 0.0),
        dtype=dtype,
        **{k: tuple(v) for k, v in defaults.items()},
        **kw,
    )


@register_model("unext")
def _build_unext(in_channels, num_classes, image_size, depth, dtype, **kw):
    return _build_unext_family(False, in_channels, num_classes, image_size, dtype, kw)


@register_model("unext_s")
def _build_unext_s(in_channels, num_classes, image_size, depth, dtype, **kw):
    return _build_unext_family(True, in_channels, num_classes, image_size, dtype, kw)


@register_model("unet_tpu")
def _build_unet_tpu(in_channels, num_classes, image_size, depth, dtype,
                    **kw):
    """Superset entry (no reference counterpart): the TPU-native
    flagship — every compute op shaped for the MXU by the round-4
    measured rules (models/unet_tpu.py docstring). ~23.5 GF/img at
    256px vs classic unet's 94.2, so the BASELINE.json 5000 img/s north
    star is reachable by physics."""
    from unet_zoo_tpu.models.unet_tpu import UNetTPU

    return UNetTPU(in_channels=in_channels, num_classes=num_classes,
                   widths=tuple(kw.pop("widths", (128, 256, 512, 512))),
                   dtype=dtype, **kw)


_U2NET_TPU_LOSS_WEIGHTS = {  # U2NET convention: unit weight per side
    "main": 1.0, "side1": 1.0, "side2": 1.0, "side3": 1.0, "side4": 1.0,
}


@register_model("u2net_tpu", loss_weights=_U2NET_TPU_LOSS_WEIGHTS)
def _build_u2net_tpu(in_channels, num_classes, image_size, depth, dtype,
                     **kw):
    """Superset entry (no reference counterpart): the flagship recipe
    (models/unet_tpu.py) applied to the U²-Net class — nested mini-U
    stages with C>=128 at <=64px, dilated bottleneck, four supervised
    side outputs (models/u2net_tpu.py docstring carries the measured
    rules; the member it answers to is ref u2net.py:25-298)."""
    from unet_zoo_tpu.models.u2net_tpu import U2NetTPU

    return U2NetTPU(in_channels=in_channels, num_classes=num_classes,
                    widths=tuple(kw.pop("widths", (128, 256, 512, 512))),
                    levels=tuple(kw.pop("levels", (2, 2, 1))),
                    dtype=dtype, **kw)


@register_model("unext_moe")
def _build_unext_moe(in_channels, num_classes, image_size, depth, dtype, **kw):
    """Superset entry (no reference counterpart, like ``medt_logo``):
    UNext-S with every other MiT block's FFN replaced by a top-1-routed
    Switch-MoE (nn/moe.py) — the expert-parallelism (ep) member of the
    zoo. Shard it with ``parallel.expert.shard_state_ep``."""
    kw.setdefault("moe_experts", 4)
    return _build_unext_family(True, in_channels, num_classes, image_size, dtype, kw)


@register_model("egeunet", default_image_size=512)
def _build_egeunet(in_channels, num_classes, image_size, depth, dtype, **kw):
    return EGEUNet(
        in_channels=in_channels, num_classes=num_classes,
        c_list=kw.pop("c_list", None), bridge=kw.pop("bridge", True),
        gt_ds=kw.pop("gt_ds", True),
        image_size=image_size if image_size is not None else 512,
        dtype=dtype, **kw,
    )


@register_model("mmunet")
def _build_mmunet(in_channels, num_classes, image_size, depth, dtype, **kw):
    return MMUNet(
        in_channels=in_channels, num_classes=num_classes,
        base_channels=kw.pop("base_channels", 96),
        bilinear=kw.pop("bilinear", True),
        layer_scale_init_value=kw.pop("layer_scale_init_value", 1e-6),
        se_ratio=kw.pop("se_ratio", 0.25), dtype=dtype, **kw,
    )


@register_model("wranet")
def _build_wranet(in_channels, num_classes, image_size, depth, dtype, **kw):
    return WRANet(
        in_channels=in_channels, num_classes=num_classes,
        feature_channels=kw.pop("feature_channels", 128), dtype=dtype, **kw,
    )


VENDORED_RAUNET_ENCODER = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "pretrained",
    "raunet_encoder_synthetic.msgpack")


def _raunet_pretrained_loader(weights_path: Optional[str] = None):
    """Init overlay for RAUNet's pretrained encoder (the reference
    defaults to ``pretrained=True`` and downloads torchvision resnet34,
    ref raunet.py:77,84-93). Offline resolution order:

    1. ``weights_path`` (a torchvision resnet34 ``.pth`` — exact
       reference behavior via utils/convert.convert_resnet34_torchvision)
    2. ``$UNET_ZOO_RESNET34`` pointing at such a ``.pth``
    3. the vendored synthetic-pretrained encoder
       (scripts/pretrain_encoder.py) — a trained-from-scratch stand-in
       so the default config never silently trains from random init

    Returns None (random init, with a warning) only if none exist.
    """
    if weights_path is None:
        weights_path = os.environ.get("UNET_ZOO_RESNET34") or None
        if weights_path and not os.path.exists(weights_path):
            print(f"Warning: $UNET_ZOO_RESNET34={weights_path} does not "
                  "exist; ignoring.")
            weights_path = None
    if weights_path is None:
        if os.path.exists(VENDORED_RAUNET_ENCODER):
            return _raunet_vendored_loader(VENDORED_RAUNET_ENCODER)
        print("Warning: 'raunet' pretrained=True found no weights — pass "
              "weights_path=<torchvision resnet34 .pth>, set "
              "$UNET_ZOO_RESNET34, or generate the vendored encoder "
              "(python scripts/pretrain_encoder.py). Using random init.")
        return None

    # lazy: the .pth is read and converted only when the overlay is
    # actually applied to freshly-initialized variables (checkpoint-
    # restore/eval flows immediately overwrite the init and never pay it)
    def overlay(variables):
        import torch

        from unet_zoo_tpu.utils.convert import convert_resnet34_torchvision

        sd = torch.load(weights_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k[7:] if k.startswith("module.") else k: v
              for k, v in sd.items()}
        enc_p, enc_s = convert_resnet34_torchvision(sd)
        return _encoder_overlay(enc_p, enc_s)(variables)

    return overlay


_VENDORED_CACHE: Dict[str, Any] = {}


def _raunet_vendored_loader(msgpack_path: str):
    """Overlay from the vendored flax-serialized encoder
    (scripts/pretrain_encoder.py's output: f16 params + f32 stats).

    Lazy: the ~41 MB msgpack is deserialized only when the overlay is
    applied to fresh variables — ``create_model('raunet')`` alone (and
    every checkpoint-restore/eval flow, which overwrites the init) never
    pays the load."""

    def overlay(variables):
        from flax import serialization

        enc = _VENDORED_CACHE.get(msgpack_path)
        if enc is None:
            with open(msgpack_path, "rb") as f:
                enc = serialization.msgpack_restore(f.read())
            _VENDORED_CACHE[msgpack_path] = enc
        print("raunet: using the vendored synthetic-pretrained encoder "
              f"({os.path.basename(msgpack_path)}; task="
              f"{enc.get('meta', {}).get('task', '?')}). For the "
              "reference's exact ImageNet init, pass weights_path="
              "<torchvision resnet34 .pth> or set $UNET_ZOO_RESNET34.")
        return _encoder_overlay(enc["params"], enc["batch_stats"])(variables)

    return overlay


def _encoder_overlay(enc_p, enc_s):
    def overlay(variables):
        def merge(new, old):
            new = jnp.asarray(new)
            if new.shape != old.shape:
                raise ValueError(
                    f"pretrained encoder weight shape {new.shape} does not "
                    f"match model {old.shape}")
            return new.astype(old.dtype)

        variables = dict(variables)
        params = dict(variables["params"])
        params["encoder"] = jax.tree_util.tree_map(
            merge, enc_p, dict(params["encoder"]))
        variables["params"] = params
        stats = dict(variables["batch_stats"])
        stats["encoder"] = jax.tree_util.tree_map(
            merge, enc_s, dict(stats["encoder"]))
        variables["batch_stats"] = stats
        return variables

    return overlay


@register_model("raunet", pretrained_loader=_raunet_pretrained_loader,
                pretrained_by_default=True)
def _build_raunet(in_channels, num_classes, image_size, depth, dtype, **kw):
    return RAUNet(in_channels=in_channels, num_classes=num_classes,
                  dtype=dtype, **kw)


@register_model("da_transformer", config_fn=get_da_transformer_config)
def _build_da_transformer(in_channels, num_classes, image_size, depth, dtype, **kw):
    config = kw.pop("config", None) or get_da_transformer_config()
    return DATransformer(
        in_channels=in_channels, num_classes=num_classes,
        block_units=tuple(config["resnet"]["num_layers"]),
        width_factor=config["resnet"]["width_factor"], dtype=dtype, **kw,
    )


@register_model("missformer", default_image_size=512)
def _build_missformer(in_channels, num_classes, image_size, depth, dtype, **kw):
    kw.pop("token_mlp_mode", None)
    kw.pop("encoder_pretrained", None)
    return MISSFormer(
        in_channels=in_channels, num_classes=num_classes,
        image_size=image_size if image_size is not None else 512,
        dtype=dtype, **kw,
    )


@register_model("uctransnet", requires_image_size=True,
                config_fn=get_uctransnet_config)
def _build_uctransnet(in_channels, num_classes, image_size, depth, dtype, **kw):
    config = kw.pop("config", None) or get_uctransnet_config()
    vis = kw.pop("vis", config.get("vis", False))
    return UCTransNet(
        in_channels=in_channels, num_classes=num_classes, vis=vis,
        base_channel=config["base_channel"],
        patch_sizes=tuple(config["patch_sizes"]),
        num_layers=config["transformer"]["num_layers"],
        num_heads=config["transformer"]["num_heads"],
        expand_ratio=config["expand_ratio"], dtype=dtype, **kw,
    )


@register_model("swin_unet_v2", requires_image_size=True)
def _build_swin_unet_v2(in_channels, num_classes, image_size, depth, dtype, **kw):
    return SwinUNetV2(
        img_size=image_size,
        patch_size=kw.pop("patch_size", 4),
        in_chans=in_channels,
        num_classes=num_classes,
        embed_dim=kw.pop("embed_dim", 96),
        depths=tuple(kw.pop("depths", (2, 2, 2, 2))),
        num_heads=tuple(kw.pop("num_heads", (3, 6, 12, 24))),
        window_size=kw.pop("window_size", 7),
        mlp_ratio=kw.pop("mlp_ratio", 4.0),
        qkv_bias=kw.pop("qkv_bias", True),
        qk_scale=kw.pop("qk_scale", None),
        drop_rate=kw.pop("drop_rate", 0.0),
        attn_drop_rate=kw.pop("attn_drop_rate", 0.0),
        drop_path_rate=kw.pop("drop_path_rate", 0.1),
        ape=kw.pop("ape", False),
        patch_norm=kw.pop("patch_norm", True),
        use_mlp=kw.pop("use_mlp", False),
        dtype=dtype,
        **{k: v for k, v in kw.items()
           if k not in ("depths_decoder", "use_checkpoint", "final_upsample",
                        "norm_layer")},
    )


def _build_medt_family(mode, in_channels, num_classes, image_size, dtype, kw):
    # factory defaults per ref: models/__init__.py:209-219, medt_net.py:666-749
    for dead in ("norm_layer", "zero_init_residual", "replace_stride_with_dilation",
                 "layers", "s"):
        kw.pop(dead, None)
    return ResAxialAttentionUNet(
        mode=mode,
        num_classes=num_classes,
        in_channels=in_channels,
        img_size=image_size if image_size is not None else 128,
        groups=kw.pop("groups", 8),
        width_per_group=kw.pop("width_per_group", 64),
        dtype=dtype,
        **kw,
    )


@register_model("axialunet", default_image_size=128)
def _build_axialunet(in_channels, num_classes, image_size, depth, dtype,
                     pretrained=False, **kw):
    return _build_medt_family("base", in_channels, num_classes, image_size, dtype, kw)


@register_model("gated", default_image_size=128)
def _build_gated(in_channels, num_classes, image_size, depth, dtype,
                 pretrained=False, **kw):
    return _build_medt_family("gated", in_channels, num_classes, image_size, dtype, kw)


@register_model("medt", default_image_size=128)
def _build_medt(in_channels, num_classes, image_size, depth, dtype,
                pretrained=False, **kw):
    return _build_medt_family("wopos", in_channels, num_classes, image_size, dtype, kw)


@register_model("logo", default_image_size=128)
def _build_logo(in_channels, num_classes, image_size, depth, dtype,
                pretrained=False, **kw):
    # wired identically to 'gated', as in the reference (ref medt_net.py:731-749)
    return _build_medt_family("gated", in_channels, num_classes, image_size, dtype, kw)


@register_model("medt_logo", default_image_size=128)
def _build_medt_logo(in_channels, num_classes, image_size, depth, dtype,
                     pretrained=False, **kw):
    """Superset entry: the true LoGo dual-branch net. The reference defines
    it (ref medt_net.py:510-664) but never exposes it through any factory;
    here it is a first-class registry member."""
    from unet_zoo_tpu.models.medt_net import MedTLoGo

    for dead in ("norm_layer", "zero_init_residual",
                 "replace_stride_with_dilation", "layers", "s"):
        kw.pop(dead, None)
    return MedTLoGo(
        num_classes=num_classes,
        in_channels=in_channels,
        img_size=image_size if image_size is not None else 128,
        groups=kw.pop("groups", 8),
        width_per_group=kw.pop("width_per_group", 64),
        dtype=dtype,
        **kw,
    )


@register_model("vnet")
def _build_vnet(in_channels, num_classes, image_size, depth, dtype, **kw):
    return VNet(
        in_channels=in_channels, num_classes=num_classes,
        elu=kw.pop("elu", True), nll=kw.pop("nll", False), dtype=dtype, **kw,
    )


@register_model("nested_unet")
def _build_nested_unet(in_channels, num_classes, image_size, depth, dtype, **kw):
    return NestedUNet(
        in_channels=in_channels,
        num_classes=num_classes,
        deep_supervision=kw.pop("deep_supervision", False),
        dtype=dtype,
        **kw,
    )


__all__ = [
    "ModelSpec",
    "ZooModel",
    "create_model",
    "list_models",
    "get_model_config",
    "register_model",
]
