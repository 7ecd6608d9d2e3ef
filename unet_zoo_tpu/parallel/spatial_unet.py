"""Full `unet` forward under spatial (H-dim) sharding.

SURVEY.md §5's "images beyond one chip" capability, applied to a real zoo
member: the classic UNet topology (ref: unet_zoo/models/unet.py:29-44)
runs with its input image sharded along H over the mesh's ``data`` axis.
Every 3x3 conv performs a 1-row halo exchange over ICI
(``parallel/spatial.py``); the 2x2 maxpools, ConvTranspose(2,2) ups,
concats and the 1x1 head are shard-local, so the only cross-chip traffic
is the halo rows — O(W * C) per conv versus O(H * W * C) activations.

Works from the *standard* flax `UNet` variables (eval mode, running-stats
BatchNorm applied in flax's exact `(x - mean) * (gamma * rsqrt(var+eps))
+ beta` order, so results match `UNet.apply(train=False)` to float
round-off). H_local must stay even through 4 pool levels: H must be
divisible by 16 * n_shards.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unet_zoo_tpu.parallel.spatial import (
    halo_exchange_h,
    spatial_conv2d,
    spatial_conv_transpose2x2,
    spatial_max_pool2,
    spatial_sharding,
)


def _bn_eval(x, bn_params, bn_stats):
    # flax BatchNorm eval-mode order, replicated exactly:
    # y = (x - mean) * (scale * rsqrt(var + eps)) + bias
    mul = bn_params["scale"] * jax.lax.rsqrt(bn_stats["var"] + 1e-5)
    return (x - bn_stats["mean"]) * mul + bn_params["bias"]


def _double_conv(x, params, stats, axis_name):
    for i in (0, 1):
        cna_p = params[f"ConvNormAct_{i}"]
        cna_s = stats[f"ConvNormAct_{i}"]
        x = spatial_conv2d(x, cna_p["Conv_0"]["kernel"], padding=1,
                           axis_name=axis_name)
        x = x + cna_p["Conv_0"]["bias"]
        x = _bn_eval(x, cna_p["BatchNorm_0"], cna_s["BatchNorm_0"])
        x = jax.nn.relu(x)
    return x


def unet_forward_local(variables: Dict[str, Any], x: jnp.ndarray,
                       axis_name: str = "data") -> jnp.ndarray:
    """Shard-local UNet forward on [B, H_local, W, C] blocks (call under
    shard_map; see `spatial_unet_apply`)."""
    p, s = variables["params"], variables["batch_stats"]

    skips = []
    for i in range(4):
        dp = p[f"DownSample_{i}"]["DoubleConv_0"]
        ds = s[f"DownSample_{i}"]["DoubleConv_0"]
        x = _double_conv(x, dp, ds, axis_name)
        skips.append(x)
        x = spatial_max_pool2(x)

    x = _double_conv(x, p["DoubleConv_0"], s["DoubleConv_0"], axis_name)

    for i in range(4):
        up = p[f"UpSampleUNet_{i}"]
        us = s[f"UpSampleUNet_{i}"]
        ct = up["TransposedUp_0"]["ConvTranspose_0"]
        x = spatial_conv_transpose2x2(x, ct["kernel"]) + ct["bias"]
        x = jnp.concatenate([x, skips[3 - i]], axis=-1)
        x = _double_conv(x, up["DoubleConv_0"], us["DoubleConv_0"],
                         axis_name)

    oc = p["OutConv_0"]["Conv_0"]
    w = oc["kernel"][0, 0]
    return jnp.einsum("bhwc,cf->bhwf", x, w) + oc["bias"]


def spatial_unet_apply(mesh: Mesh, variables: Dict[str, Any],
                       axis_name: str = "data"):
    """Build a jitted fn(x_global) -> logits running the full unet with
    H sharded over `axis_name`. x_global: [B, H, W, 3] with H divisible
    by 16 * mesh shard count."""
    from jax import shard_map

    spec = P(None, axis_name, None, None)

    def fn(x):
        return unet_forward_local(variables, x, axis_name)

    mapped = shard_map(fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
                       check_vma=False)

    def run(x_global):
        x_global = jax.device_put(
            x_global, NamedSharding(mesh, spec))
        return jax.jit(mapped)(x_global)

    return run
