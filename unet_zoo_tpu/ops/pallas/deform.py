"""Pallas deformable-conv kernel: VMEM-resident bilinear gather + MXU taps.

The XLA path (ops/deform.py) is gather-bound: HBM gathers of [4C]-wide
rows pay the TPU's 4KB-tile read granularity (~4-8x amplification), and
collapse further when the gather source exceeds the on-chip working set
(650 -> 138 GB/s measured, BENCH_NOTES r1/r2). This kernel instead keeps
a channel slice of the whole padded image resident in VMEM and gathers
the four bilinear corners per tap *inside* the kernel, so the only HBM
traffic is the pipelined table/operand blocks plus the output.

Semantics are identical to ops/deform.deform_conv2d (torchvision
deform_conv2d, ref: unet_zoo/models/wranet.py:71-78): sample positions
are clamped to a 1-pixel zero frame, corner weights fold the modulation
mask, and the tap contraction accumulates in f32.

Decomposition per grid step (b, nb, cb; cb innermost so the f32
accumulator block stays put while channel slices stream):
  table  [1, Hp*Wp, CB]   padded flat image, channel slice (VMEM)
  idx    [1, K, NB]       top-left corner row index per tap/pixel
  cw     [1, K, 4, NB]    bilinear corner weights x modulation mask
  weight [K, CB, O]       per-tap kernel slices
  out    [1, NB, O] f32   += sum_k (gather+blend)[NB, CB] @ W_k[CB, O]

The in-kernel gather is ``jnp.take(table, rows, axis=0)`` — Mosaic's
dynamic-gather lowering. Anything it can't express (or any shape that
doesn't tile) falls back to the XLA path via ``use_pallas_deform``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(tab_ref, idx_ref, cw_ref, w_ref, out_ref, *, k: int, wp: int,
            cdt):
    cb = pl.program_id(2)

    @pl.when(cb == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc = out_ref[0]
    for ki in range(k):
        rows = idx_ref[0, ki]                              # [NB] int32
        tab = tab_ref[0]
        # four bilinear corners: static row offsets off the top-left index
        g = (jnp.take(tab, rows, axis=0).astype(jnp.float32)
             * cw_ref[0, ki, 0][:, None])
        g += (jnp.take(tab, rows + 1, axis=0).astype(jnp.float32)
              * cw_ref[0, ki, 1][:, None])
        g += (jnp.take(tab, rows + wp, axis=0).astype(jnp.float32)
              * cw_ref[0, ki, 2][:, None])
        g += (jnp.take(tab, rows + wp + 1, axis=0).astype(jnp.float32)
              * cw_ref[0, ki, 3][:, None])
        acc = acc + jax.lax.dot_general(
            g.astype(cdt), w_ref[ki],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [NB, O]
    out_ref[0] = acc


def _pick_nb(n: int, c: int, cb: int, hpwp: int) -> int:
    """Largest pixel-block that tiles n and keeps the step's VMEM use
    (table + acc + gathers + operands, double-buffered) under budget."""
    for nb in (4096, 2048, 1024, 512, 256, 128):
        if n % nb == 0:
            return nb
    return n  # tiny/odd sizes: single block (interpret/test regime)


def use_pallas_deform(x_shape, k: int, stride: int, dilation: int) -> bool:
    """Auto-enable gate: always False — definitive on-chip no-go (round 3).

    Measured on v5e (see BENCH_NOTES "deform kernel no-go"): the kernel's
    in-kernel row gather cannot lower on real Mosaic. Two structural
    constraints, confirmed by `_probe_gather.py` on-chip:

    * ``tpu.dynamic_gather`` only shuffles within ONE vreg along the
      gather dimension ("Not implemented: Multiple source vregs along
      gather dimension") — 8 sublanes for f32 — so a [Hp*Wp, C] table
      with tens of thousands of rows is unreachable at vector rate; and
    * channel-sliced table blocks need a last-dim of 128 (or the full
      array dim), so the [*, *, 32] channel slicing the VMEM budget
      needs is rejected by the BlockSpec checker on real hardware.

    Interpret mode (CPU tests) validates semantics only. The XLA
    quad-pack gather path (ops/deform.py, 89.8 img/s wranet b16) stands
    as the production path.
    """
    del x_shape, k, stride, dilation
    return False


def deform_conv2d_pallas(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Drop-in replacement for ops.deform.deform_conv2d (same layout:
    x [B,H,W,C], offset [B,Ho,Wo,2K] (dy,dx) pairs, mask [B,Ho,Wo,K],
    weight [kh,kw,C,O])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    kh, kw, _, o = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    n = ho * wo
    hp, wp = h + 2, w + 2

    # ---- XLA precompute: padded flat table + per-tap indices/weights ----
    # (identical math to ops/deform.py so the two paths agree bit-for-bit
    # in f32; the kernel only moves the gather+contraction on chip)
    xf = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    table = xf.reshape(b, hp * wp, c)

    base_y = (jnp.arange(ho) * stride - padding).astype(jnp.float32)
    base_x = (jnp.arange(wo) * stride - padding).astype(jnp.float32)
    off = offset.astype(jnp.float32).reshape(b, n, k, 2)
    msk = mask.astype(jnp.float32).reshape(b, n, k)
    grid_y = jnp.broadcast_to(base_y[:, None], (ho, wo)).reshape(n)
    grid_x = jnp.broadcast_to(base_x[None, :], (ho, wo)).reshape(n)

    ks_dy = jnp.asarray([dilation * (ki // kw) for ki in range(k)],
                        jnp.float32)
    ks_dx = jnp.asarray([dilation * (ki % kw) for ki in range(k)],
                        jnp.float32)
    py = jnp.clip(grid_y[None, :, None] + ks_dy + off[..., 0],
                  -1.0, float(h)) + 1.0                     # [B, N, K]
    px = jnp.clip(grid_x[None, :, None] + ks_dx + off[..., 1],
                  -1.0, float(w)) + 1.0
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, hp - 2)
    x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, wp - 2)
    wy1 = py - y0.astype(jnp.float32)
    wx1 = px - x0.astype(jnp.float32)
    idx = (y0 * wp + x0).transpose(0, 2, 1)                 # [B, K, N]
    cw = jnp.stack([
        (1 - wy1) * (1 - wx1) * msk,
        (1 - wy1) * wx1 * msk,
        wy1 * (1 - wx1) * msk,
        wy1 * wx1 * msk,
    ], axis=2).transpose(0, 3, 2, 1)                        # [B, K, 4, N]

    cdt = x.dtype
    wk = weight.reshape(k, c, o).astype(cdt)                # [K, C, O]

    cb_ = 32 if (c % 32 == 0 and c > 32) else c
    nb = _pick_nb(n, c, cb_, hp * wp)
    grid = (b, n // nb, c // cb_)

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, wp=wp, cdt=cdt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hp * wp, cb_), lambda bi, ni, ci: (bi, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, nb), lambda bi, ni, ci: (bi, 0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 4, nb), lambda bi, ni, ci: (bi, 0, 0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, cb_, o), lambda bi, ni, ci: (0, ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nb, o), lambda bi, ni, ci: (bi, ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, o), jnp.float32),
        interpret=interpret,
    )(table, idx, cw, wk)

    out = out.reshape(b, ho, wo, o)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)
