"""Fused channel-softmax + 7x7 morphology (dilate/erode) Pallas kernel.

mmunet's edge-feature module and Up-block gating both compute
``sm = softmax_C(x)`` followed by 7x7 max-pool dilation and erosion
(erosion = -maxpool(-sm)), one or two rounds (ref:
unet_zoo/models/mmunet.py:140-171, 267-294). In XLA this is 4-8
full-resolution reduce-windows plus a softmax chain — each a separate
HBM round-trip over [B, 256, 256, C] (attribution: ~2.4 ms per
reduce-window at b16, ~20 ms total per fwd). Here the whole gate runs
in one VMEM-resident pass per tile:

  * same [B, H, C, W] W-lane layout as ops/pallas/mkblock.py (a layout
    bitcast when the producer is W-minor, which XLA picks at these
    channel counts);
  * softmax over C = sublane-axis reductions (max/sum over axis 1);
  * the 7x7 pools are separable: a lane-direction pass (masked 32-bit
    rotates, SAME borders filled with +-inf like torch's MaxPool2d
    padding) then a row-direction pass (free row slices);
  * halo rows arrive via async DMA; out-of-image rows are re-masked to
    the fill value between repeated pools (each pool call pads anew).

Returns (dilate, erode) so the callers' differing epilogues
(edge = d - e; gating sigmoids/tanh) stay in XLA where they fuse.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_POS = 1e30


def _wpool(v, k, fill, op):
    """Lane-direction k-window pool with SAME borders filled by `fill`."""
    w = v.shape[-1]
    half = k // 2
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    acc = v
    for dx in range(1, half + 1):
        # col j <- j + dx (shift left)
        r1 = jnp.where(w_ids < w - dx, pltpu.roll(v, w - dx, 2), fill)
        # col j <- j - dx (shift right)
        r2 = jnp.where(w_ids >= dx, pltpu.roll(v, dx, 2), fill)
        acc = op(op(acc, r1), r2)
    return acc


def _pool2d(v, k, fill, op):
    """Separable k x k pool; consumes k//2 rows per side."""
    half = k // 2
    vw = _wpool(v, k, fill, op)
    out_rows = v.shape[0] - 2 * half
    acc = vw[0:out_rows]
    for dy in range(1, k):
        acc = op(acc, vw[dy: dy + out_rows])
    return acc


def _kernel(x_ref, x_any, d_ref, e_ref, th, bh, sems, *, rows: int, h: int,
            k: int, repeat: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    halo = repeat * (k // 2)

    t0 = jnp.maximum(t * rows - halo, 0)
    b0 = jnp.minimum(t * rows + rows, h - halo)
    cp_t = pltpu.make_async_copy(x_any.at[b, pl.ds(t0, halo)], th, sems.at[0])
    cp_b = pltpu.make_async_copy(x_any.at[b, pl.ds(b0, halo)], bh, sems.at[1])
    cp_t.start()
    cp_b.start()
    cp_t.wait()
    cp_b.wait()

    xt = jnp.concatenate([th[:], x_ref[:], bh[:]], axis=0).astype(jnp.float32)

    # channel softmax (sublane-axis reductions)
    m = jnp.max(xt, axis=1, keepdims=True)
    ex = jnp.exp(xt - m)
    sm = ex / jnp.sum(ex, axis=1, keepdims=True)

    def rowmask(v, lo, fill):
        ri = jax.lax.broadcasted_iota(jnp.int32, (v.shape[0], 1, 1), 0)
        gr = t * rows - halo + lo + ri
        return jnp.where((gr >= 0) & (gr < h), v, fill)

    d = rowmask(sm, 0, _NEG)
    e = rowmask(sm, 0, _POS)
    lo = 0
    for rep in range(repeat):
        d = _pool2d(d, k, _NEG, jnp.maximum)
        e = _pool2d(e, k, _POS, jnp.minimum)
        lo += k // 2
        if rep + 1 < repeat:
            # each pool call pads anew: re-fill out-of-image rows
            d = rowmask(d, lo, _NEG)
            e = rowmask(e, lo, _POS)

    d_ref[:] = d.astype(d_ref.dtype)
    e_ref[:] = e.astype(e_ref.dtype)


def fused_softmax_morph(
    x: jnp.ndarray,
    *,
    k: int = 7,
    repeat: int = 1,
    row_block: int = 16,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """softmax over C, then `repeat` rounds of k x k (dilate, erode).

    x: [B, H, C, W]; returns (dilate, erode), each [B, H, C, W] in
    x.dtype. Matches ``sm = softmax(x, C); maxpool_k^repeat(sm),
    -maxpool_k^repeat(-sm)`` with SAME padding.
    """
    bsz, hh, c, w = x.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    halo = repeat * (k // 2)
    # Mosaic stacks the unrolled pools' live f32 temporaries (~7 tiles of
    # (rows + 2*halo, c, w)) on the 16MB VMEM stack; size rows to fit
    # (measured: 28 live rows at c*w=24.5k hit 18.8M and OOM'd).
    budget_rows = int(15e6 / (4 * c * w * 7)) - 2 * halo
    rows = max(4, min(row_block, budget_rows, hh))
    rows = 1 << (rows.bit_length() - 1)  # power of two divides 2^k heights
    while hh % rows:
        rows //= 2
    if rows < 1:
        raise ValueError(f"height {hh} not tileable")

    grid = (bsz, hh // rows)
    kernel = functools.partial(_kernel, rows=rows, h=hh, k=k, repeat=repeat)
    tile = pl.BlockSpec(
        (pl.Squeezed(), pl.Blocked(rows), pl.Blocked(c), pl.Blocked(w)),
        lambda bi, t: (bi, t, 0, 0))
    out_sd = jax.ShapeDtypeStruct((bsz, hh, c, w), x.dtype)
    scratch = [
        pltpu.VMEM((halo, c, w), x.dtype),
        pltpu.VMEM((halo, c, w), x.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(tile, tile),
        out_shape=(out_sd, out_sd),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, x)


def use_fused_morph(x_shape) -> bool:
    """Gate (NHWC shape at the call site): TPU, lane-dim W a 128
    multiple, H tileable. Mirrors ops/pallas/mkblock.use_fused_mkblock."""
    if jax.default_backend() != "tpu":
        return False
    _, hh, ww, c = x_shape
    return ww % 128 == 0 and hh % 8 == 0 and c % 8 == 0
