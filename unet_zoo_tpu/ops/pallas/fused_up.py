"""Fused UNet decoder stage: ConvT(2,2) + bias + skip-concat + conv3x3 +
folded-BN + ReLU in ONE Pallas kernel.

Why (BENCH_NOTES round 2): XLA's conv-transpose lowering for the zoo's
k=2 s=2 decoder shapes (ref: unet_zoo/models/common_layers.py:97-116)
runs at ~25% of bf16 SOL on v5e, and both XLA-level matmul rewrites lost
because the depth-to-space interleave + bias add materialize in HBM
between ops. This kernel keeps the whole chain in VMEM:

  1. the transposed conv is ONE [Cin, 4*Cu] matmul at coarse resolution
     (k == s means zero tap overlap: out[2m+a, 2n+b] = y[m,n] @ W[a,b]);
  2. the 2x2-phase interleave is done with *contiguous* reshapes on the
     matmul result — columns are packed (a, b, cu)-major so both the W
     interleave ([m, (n b cu)] -> [m, 2n+b, cu]) and the H interleave
     (concat over a then [m, a, ...] -> [2m+a, ...]) are free views;
  3. the skip concat AND the three dy row-taps fold into the contraction
     dimension (row slices are free, the lane concat sees uniform
     offsets): the conv becomes 3 fat MXU dots (K = 3*(Cu+Cs)), one per
     COLUMN tap, whose f32 outputs are realigned by rotate — the concat
     never exists in HBM and nothing ever sublane-shifts an input;
  4. conv bias + BatchNorm (eval, running stats) fold into a per-channel
     scale/bias epilogue, then ReLU.

Grid: (batch, fine-row tiles, Co blocks). Halo rows come from explicit
row-range DMAs; the W taps never shift inputs (see _tap_dots — Mosaic
cannot concat sublane-shifted values, has no bf16 rotate, requires
8-aligned DMA column slices, and pl.Element halo blocks drove the
compiler into a >25-min compile; every shifted-input formulation is a
dead end on this toolchain). Edge tiles mask row validity in-kernel
(which also zeroes the ConvT bias outside the image — SAME-conv zero
padding semantics).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_convt_kernel(wt: jnp.ndarray) -> jnp.ndarray:
    """Flax ConvTranspose kernel [2,2,Cin,Cu] -> [Cin, 4*Cu] matmul form.

    nn.ConvTranspose applies the kernel spatially flipped
    (out[2m+a] += y[m] * K[1-a]); columns are packed (a, b, cu)-major so
    the kernel's interleave reshapes are contiguous.
    """
    k = wt.shape[0]
    cin, cu = wt.shape[2], wt.shape[3]
    return wt[::-1, ::-1].transpose(2, 0, 1, 3).reshape(cin, k * k * cu)


def fold_conv_bn(conv_bias, gamma, beta, mean, var, eps: float = 1e-5):
    """Fold conv-bias + eval-mode BatchNorm into (scale, bias):
    BN(conv + b) == conv * scale + bias."""
    scale = gamma / jnp.sqrt(var + eps)
    bias = (conv_bias - mean) * scale + beta
    return scale, bias


def _compute_fine(y, wt_ref, bt_ref, t, rows, h_fine, cu, cdt):
    """ConvT(2,2) at coarse resolution + VMEM phase interleave + bias +
    edge-validity masking. y: [Rc+2, Wc, Cin] (garbage allowed in
    out-of-image halo rows — masked here). Returns [R+2, Wf, Cu]."""
    rc2, wc_, cin = y.shape
    up = jnp.dot(y.reshape(rc2 * wc_, cin), wt_ref[:],
                 preferred_element_type=jnp.float32)
    # columns are (a, b, cu): lane-slice the two row-phases (offset 2*cu
    # is a multiple of 128 for every zoo stage), then contiguous-reshape
    # the (n, b, cu) trailing order into the fine W axis.
    a0 = up[:, : 2 * cu].reshape(rc2, 2 * wc_, cu)
    a1 = up[:, 2 * cu:].reshape(rc2, 2 * wc_, cu)
    # H interleave: [m, a, 2n+b, cu] -> [2m+a, 2n+b, cu] (contiguous)
    fine = jnp.concatenate([a0[:, None], a1[:, None]], axis=1)
    fine = fine.reshape(2 * rc2, 2 * wc_, cu)
    # coarse halo rows cover fine rows [t*R-2, t*R+R+2); we need
    # [t*R-1, t*R+R+1) -> drop the outermost fine row on each side
    fine = fine[1: rows + 3]
    fine = fine + bt_ref[:].reshape(1, 1, cu)

    # halo rows outside the image must be zero (SAME-conv zero padding;
    # also kills the ConvT bias outside the image)
    i = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
    g = t * rows - 1 + i
    valid = (g >= 0) & (g < h_fine)
    return jnp.where(valid, fine, 0.0).astype(cdt)


def _tap_dots(fine, skip, wc_ref, sc_ref, bi_ref, out_ref, rows, wf, c2):
    """The 3x3 conv as 3 fat matmuls + 2 output rotates.

    Sublane (W-dim) shifts of the *inputs* are a dead end on this Mosaic:
    shifted-value concats ("result/input offset mismatch"), bf16 rotates
    ("non-32-bit data") and DMA column ranges (8-aligned slice sizes) are
    all unimplemented for shift-by-1. So the W taps are computed on
    UNSHIFTED operands: for each dx, one fat dot over the (dy, up|skip, c)
    channel stack — row slices are free (major dim) and the lane concat
    sees uniform offsets — giving P_dx[r, w] = the dx-tap contribution at
    input column w, which belongs at output column w + 1 - dx. The two
    off-center partials are then realigned with pltpu.roll on the small
    f32 output tile (32-bit rotates ARE supported) and their wrapped
    border column zeroed (the conv's W zero padding)."""
    co = out_ref.shape[-1]
    pieces = []
    for dy in range(3):
        pieces.append(fine[dy: dy + rows])
        pieces.append(skip[dy: dy + rows])
    z3 = jnp.concatenate(pieces, axis=-1).reshape(rows * wf, 3 * c2)

    p = [jnp.dot(z3, wc_ref[k], preferred_element_type=jnp.float32)
         .reshape(rows, wf, co) for k in range(3)]

    w_ids = jax.lax.broadcasted_iota(jnp.int32, (1, wf, 1), 1)
    left = jnp.where(w_ids > 0, pltpu.roll(p[0], 1, 1), 0.0)
    right = jnp.where(w_ids < wf - 1, pltpu.roll(p[2], wf - 1, 1), 0.0)
    acc = p[1] + left + right

    out = acc * sc_ref[:].reshape(1, 1, co) + bi_ref[:].reshape(1, 1, co)
    out_ref[:] = jnp.maximum(out, 0.0).astype(out_ref.dtype)


def _kernel_dma(y_hbm, skip_hbm, wt_ref, bt_ref, wc_ref, sc_ref, bi_ref,
                out_ref, y_buf, s_buf, sems, *,
                n_tiles: int, rows: int, h_fine: int, cu: int):
    """Fused decoder-stage kernel. Halo rows come from explicit row-range
    DMAs (rows are the ref's major dim — unconstrained); the conv's W
    taps never shift inputs at all (see _tap_dots).

    Per (batch, row-tile, co-block) grid step:
      1. DMA the halo'd y/skip row ranges HBM->VMEM (edge tiles copy only
         in-image rows; out-of-image halo rows are masked to zero — they
         are the conv's zero padding).
      2. Compute the up-tile (matmul + VMEM interleave + bias + mask).
      3. 3 fat MXU dots over the (dy, up|skip, c) channel stack + output
         realign rotates + scale/bias/ReLU epilogue.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    rc = rows // 2
    hc = h_fine // 2
    cdt = s_buf.dtype
    _, wf, cs = s_buf.shape
    c2 = cu + cs

    def hbm_loads(op):
        if n_tiles == 1:
            op(y_hbm, y_buf, 0, 1, hc, sems.at[0])
            op(skip_hbm, s_buf, 0, 1, h_fine, sems.at[1])
        else:
            @pl.when(t == 0)
            def _():
                op(y_hbm, y_buf, 0, 1, rc + 1, sems.at[0])
                op(skip_hbm, s_buf, 0, 1, rows + 1, sems.at[1])

            @pl.when(jnp.logical_and(t > 0, t < n_tiles - 1))
            def _():
                op(y_hbm, y_buf, t * rc - 1, 0, rc + 2, sems.at[0])
                op(skip_hbm, s_buf, t * rows - 1, 0, rows + 2, sems.at[1])

            @pl.when(t == n_tiles - 1)
            def _():
                op(y_hbm, y_buf, t * rc - 1, 0, rc + 1, sems.at[0])
                op(skip_hbm, s_buf, t * rows - 1, 0, rows + 1, sems.at[1])

    def start(src, dst, src_lo, dst_lo, n, sem):
        pltpu.make_async_copy(
            src.at[b, pl.ds(src_lo, n)], dst.at[pl.ds(dst_lo, n)],
            sem).start()

    def wait(src, dst, src_lo, dst_lo, n, sem):
        pltpu.make_async_copy(
            src.at[b, pl.ds(src_lo, n)], dst.at[pl.ds(dst_lo, n)],
            sem).wait()

    hbm_loads(start)
    hbm_loads(wait)

    fine = _compute_fine(y_buf[:], wt_ref, bt_ref, t, rows, h_fine,
                         cu, cdt)
    # out-of-image skip halo rows are the conv's zero padding
    i = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
    g = t * rows - 1 + i
    valid = (g >= 0) & (g < h_fine)
    skip = jnp.where(valid, s_buf[:], jnp.zeros((), cdt))

    _tap_dots(fine, skip, wc_ref, sc_ref, bi_ref, out_ref, rows, wf, c2)


def fused_up_concat_conv(
    y: jnp.ndarray,
    skip: jnp.ndarray,
    wt: jnp.ndarray,
    bt: jnp.ndarray,
    wc: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    row_block: int = 16,
    co_block: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """relu(scale * conv3x3(concat(convT2x2s2(y) + bt, skip)) + bias).

    y: [B, Hc, Wc, Cin], skip: [B, 2Hc, 2Wc, Cs] (NHWC)
    wt: [2, 2, Cin, Cu] flax ConvTranspose kernel; bt: [Cu]
    wc: [3, 3, Cu+Cs, Co] flax Conv kernel (up channels first, matching
        concat([up, skip]) order); scale/bias: [Co] folded BN epilogue.
    Returns [B, 2Hc, 2Wc, Co] in skip.dtype.
    """
    b, hc, wcs, cin = y.shape
    _, hf, wf, cs = skip.shape
    cu = wt.shape[-1]
    co = wc.shape[-1]
    if hf != 2 * hc or wf != 2 * wcs:
        raise ValueError(f"skip {skip.shape} is not 2x y {y.shape}")

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    rows = min(row_block, hf)
    while hf % rows:
        rows //= 2
    if rows < 2 or rows % 2:
        raise ValueError(f"fine height {hf} not tileable (rows={rows})")
    rc = rows // 2

    cob = co_block or co
    if co % cob:
        raise ValueError(f"co_block {cob} must divide Co {co}")

    wt_pack = pack_convt_kernel(wt).astype(y.dtype)
    # [3(dx), 3(dy)*(Cu+Cs), Co]: per-dx fat contraction matrices whose
    # K order (dy, up|skip, c) matches the kernel's z3 channel stacking
    wc3 = wc.transpose(1, 0, 2, 3).reshape(3, 3 * (cu + cs), co).astype(y.dtype)
    bt2 = bt.reshape(1, cu).astype(jnp.float32)
    sc2 = scale.reshape(1, co).astype(jnp.float32)
    bi2 = bias.reshape(1, co).astype(jnp.float32)

    grid = (b, hf // rows, co // cob)
    n_tiles = hf // rows

    weight_specs = [
        pl.BlockSpec((cin, 4 * cu), lambda bi_, t, j: (0, 0)),
        pl.BlockSpec((1, cu), lambda bi_, t, j: (0, 0)),
        pl.BlockSpec((3, 3 * (cu + cs), cob), lambda bi_, t, j: (0, 0, j)),
        pl.BlockSpec((1, cob), lambda bi_, t, j: (0, j)),
        pl.BlockSpec((1, cob), lambda bi_, t, j: (0, j)),
    ]
    out_spec = pl.BlockSpec(
        (pl.Squeezed(), pl.Blocked(rows), pl.Blocked(wf), pl.Blocked(cob)),
        lambda bi_, t, j: (bi_, t, 0, j))
    out_shape = jax.ShapeDtypeStruct((b, hf, wf, co), skip.dtype)

    kernel = functools.partial(_kernel_dma, rows=rows, h_fine=hf,
                               cu=cu, n_tiles=n_tiles)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ] + weight_specs
    scratch = [
        pltpu.VMEM((rc + 2, wcs, cin), y.dtype),
        pltpu.VMEM((rows + 2, wf, cs), skip.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(y, skip, wt_pack, bt2, wc3, sc2, bi2)


def auto_co_block(cin: int, cu: int, cs: int, co: int,
                  budget_bytes: int = 6 * 2**20) -> int:
    """Largest Co block keeping resident kernel weights under ``budget``
    (ConvT pack [Cin, 4Cu] + tap weights [9, Cu+Cs, CoB], bf16)."""
    cob = co
    while cob > 128 and (cin * 4 * cu + 9 * (cu + cs) * cob) * 2 > budget_bytes:
        cob //= 2
    return cob


_AUTO_ENABLED = False  # flips to True once the kernel beats XLA on-chip


def use_fused_up(y_shape, skip_shape) -> bool:
    """Gate: TPU backend and evenly-matched power-of-two-ish shapes the
    kernel tiles cleanly (fallback path handles everything else).

    Auto-enable is OFF while the kernel is under development (Mosaic
    compile pathologies under investigation — see module docstring);
    force with UpSampleUNet(use_pallas=True)."""
    if not _AUTO_ENABLED:
        return False
    if jax.default_backend() != "tpu":
        return False
    _, hc, wcs, _ = y_shape
    _, hf, wf, _ = skip_shape
    if hf != 2 * hc or wf != 2 * wcs:
        return False
    if hf < 4 or hf % 4 or wf % 16:
        return False
    return True
