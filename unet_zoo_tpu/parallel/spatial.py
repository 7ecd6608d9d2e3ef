"""Spatial (height-dim) sharding with halo exchange.

SURVEY.md §5: when one image exceeds a chip, "the natural TPU analogue is
spatial sharding of the H/W dims under shard_map with halo exchange".
This module provides that toolkit: convolutions and pools whose inputs
are sharded over the mesh's ``data`` axis along H, exchanging boundary
rows over ICI with ``jax.lax.ppermute`` before each local stencil op.

Semantics are exact: ``ppermute`` fills absent sources with zeros, which
is precisely the zero-padding a SAME conv expects at the image border,
so shard 0's top halo and shard N-1's bottom halo need no special case.

Used via ``shard_map`` (see ``spatial_conv_stack`` and
tests/test_spatial.py for the composition pattern): arrays flow as
[B, H_local, W, C] shards, collectives ride the ``data`` axis.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] arrays sharded along H over the 'data' axis."""
    return NamedSharding(mesh, P(None, "data", None, None))


def halo_exchange_h(x: jnp.ndarray, up: int, down: int,
                    axis_name: str = "data") -> jnp.ndarray:
    """Concatenate ``up`` rows from the previous shard and ``down`` rows
    from the next shard onto a [B, H_local, W, C] block.

    Missing neighbors (global image border) contribute zeros — identical
    to SAME zero padding.
    """
    n = jax.lax.axis_size(axis_name)
    parts = []
    if up:
        # receive the LAST `up` rows of shard i-1 (send i -> i+1)
        send = x[:, -up:]
        recv = jax.lax.ppermute(send, axis_name,
                                perm=[(i, i + 1) for i in range(n - 1)])
        parts.append(recv)
    parts.append(x)
    if down:
        # receive the FIRST `down` rows of shard i+1 (send i -> i-1)
        send = x[:, :down]
        recv = jax.lax.ppermute(send, axis_name,
                                perm=[(i + 1, i) for i in range(n - 1)])
        parts.append(recv)
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def spatial_conv2d(x: jnp.ndarray, kernel: jnp.ndarray,
                   padding: int = 1, axis_name: str = "data") -> jnp.ndarray:
    """Stride-1 conv over an H-sharded [B, H_local, W, C] block.

    The H padding comes from the halo exchange (neighbor rows / border
    zeros); W keeps plain zero padding. Output H_local == input H_local.
    """
    kh = kernel.shape[0]
    ph = (kh - 1) // 2 if padding else 0
    if ph:
        x = halo_exchange_h(x, ph, ph, axis_name)
    pw = (kernel.shape[1] - 1) // 2 if padding else 0
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=((0, 0), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def spatial_max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 max pool on an H-sharded block. Requires even
    H_local (window never straddles a shard boundary — pick shard counts
    dividing H at every pooled level)."""
    if x.shape[1] % 2:
        raise ValueError(f"H_local={x.shape[1]} must be even")
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def spatial_upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsample (shard-local; no halo needed)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def spatial_conv2d_s2(x: jnp.ndarray, kernel: jnp.ndarray,
                      axis_name: str = "data") -> jnp.ndarray:
    """Stride-2 SAME(torch p=1) conv over an H-sharded block.

    Requires even H_local. Output row o (global 2o) reads global rows
    [2o-1, 2o+1]; with a (1,1) halo the local window offsets become
    uniform, so one strided lax conv covers every shard.
    """
    if x.shape[1] % 2:
        raise ValueError(f"H_local={x.shape[1]} must be even")
    kh, kw = kernel.shape[0], kernel.shape[1]
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    x = halo_exchange_h(x, ph, ph, axis_name)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(2, 2),
        padding=((0, 0), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def spatial_conv_transpose2x2(x: jnp.ndarray,
                              kernel: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose(k=2, s=2) on an H-sharded block — k == s means no
    tap overlap, so the op is purely shard-local: out rows [2i, 2i+1] of
    shard-local row i land on the same shard. Kernel is the flax
    ConvTranspose [2, 2, Cin, Cu] layout."""
    return jax.lax.conv_transpose(
        x, kernel, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def spatial_upsample2_bilinear(x: jnp.ndarray,
                               axis_name: str = "data") -> jnp.ndarray:
    """2x bilinear upsample (align_corners=False, i.e. half-pixel
    centers) over an H-sharded block.

    out[2i]   = 0.75*x[i] + 0.25*x[i-1]
    out[2i+1] = 0.75*x[i] + 0.25*x[i+1]
    with edge clamping at the global borders. The halo exchange zero-fills
    missing neighbors, so the first/last shard substitute their own edge
    row (clamp semantics) before interpolating. W is shard-local.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    xh = halo_exchange_h(x, 1, 1, axis_name)  # [B, 1+H+1, W, C]
    up_row = jnp.where(idx == 0, x[:, :1], xh[:, :1])
    down_row = jnp.where(idx == n - 1, x[:, -1:], xh[:, -1:])
    prev = jnp.concatenate([up_row, x[:, :-1]], axis=1)
    nxt = jnp.concatenate([x[:, 1:], down_row], axis=1)
    even = 0.75 * x + 0.25 * prev
    odd = 0.75 * x + 0.25 * nxt
    b, h, w, c = x.shape
    rows = jnp.concatenate([even[:, :, None], odd[:, :, None]], axis=2)
    rows = rows.reshape(b, 2 * h, w, c)
    # W direction is local: same stencil along axis 2
    left = jnp.concatenate([rows[:, :, :1], rows[:, :, :-1]], axis=2)
    right = jnp.concatenate([rows[:, :, 1:], rows[:, :, -1:]], axis=2)
    evenw = 0.75 * rows + 0.25 * left
    oddw = 0.75 * rows + 0.25 * right
    cols = jnp.concatenate([evenw[:, :, :, None], oddw[:, :, :, None]],
                           axis=3)
    return cols.reshape(b, 2 * h, 2 * w, c)


def spatial_upsample4_bilinear(x: jnp.ndarray,
                               axis_name: str = "data") -> jnp.ndarray:
    """ONE-PASS 4x bilinear upsample (align_corners=False) over an
    H-sharded block — numerically identical to a single-device
    ``resize_bilinear(x, (4H, 4W))``.

    Two chained 2x passes are NOT: x4 half-pixel sampling positions
    ``src = (o + 0.5)/4 - 0.5`` are not reachable by composing two
    half-pixel x2 grids (the round-4 handoff's caveat — this op is what
    unet_tpu's stride-4 logit head needs under spatial sharding).

    For output row ``4i + a``: src = i + (2a - 3)/8, so
      a=0: 0.375*x[i-1] + 0.625*x[i]     a=1: 0.125*x[i-1] + 0.875*x[i]
      a=2: 0.875*x[i] + 0.125*x[i+1]     a=3: 0.625*x[i] + 0.375*x[i+1]
    with edge clamping at the GLOBAL borders only (interior shards take
    real neighbor rows via the halo exchange). W is shard-local.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    xh = halo_exchange_h(x, 1, 1, axis_name)  # [B, 1+H+1, W, C]
    up_row = jnp.where(idx == 0, x[:, :1], xh[:, :1])
    down_row = jnp.where(idx == n - 1, x[:, -1:], xh[:, -1:])
    prev = jnp.concatenate([up_row, x[:, :-1]], axis=1)
    nxt = jnp.concatenate([x[:, 1:], down_row], axis=1)

    def phases(cur, prv, nx, axis):
        a0 = 0.375 * prv + 0.625 * cur
        a1 = 0.125 * prv + 0.875 * cur
        a2 = 0.875 * cur + 0.125 * nx
        a3 = 0.625 * cur + 0.375 * nx
        return jnp.stack([a0, a1, a2, a3], axis=axis)

    b, h, w, c = x.shape
    rows = phases(x, prev, nxt, 2).reshape(b, 4 * h, w, c)
    left = jnp.concatenate([rows[:, :, :1], rows[:, :, :-1]], axis=2)
    right = jnp.concatenate([rows[:, :, 1:], rows[:, :, -1:]], axis=2)
    return phases(rows, left, right, 3).reshape(b, 4 * h, 4 * w, c)


def make_spatial_fn(mesh: Mesh, fn: Callable, axis_name: str = "data"):
    """Wrap a shard-local function (built from the ops above) into a
    jitted global-array program: inputs/outputs H-sharded over the mesh."""
    from jax import shard_map

    spec = P(None, axis_name, None, None)
    mapped = shard_map(fn, mesh=mesh, in_specs=(spec, P()),
                       out_specs=spec, check_vma=False)
    return jax.jit(mapped)


def spatial_conv_stack(mesh: Mesh, kernels: Sequence[jnp.ndarray],
                       axis_name: str = "data"):
    """Demo composition: a ReLU conv stack over an H-sharded image.

    Returns a jitted fn(x_global, kernels_tuple) running every conv with
    halo exchange; numerically identical to the unsharded stack.
    """

    def local(x, ks):
        for i, k in enumerate(ks):
            x = spatial_conv2d(x, k, padding=1, axis_name=axis_name)
            if i + 1 < len(ks):
                x = jax.nn.relu(x)
        return x

    return make_spatial_fn(mesh, local, axis_name)
