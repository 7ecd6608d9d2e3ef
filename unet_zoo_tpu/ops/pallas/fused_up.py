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


def _conv_dots(z3, wc_ref, sc_ref, bi_ref, out_ref, rows, wf):
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
    p = [jnp.dot(z3, wc_ref[k], preferred_element_type=jnp.float32)
         .reshape(rows, wf, co) for k in range(3)]

    w_ids = jax.lax.broadcasted_iota(jnp.int32, (1, wf, 1), 1)
    left = jnp.where(w_ids > 0, pltpu.roll(p[0], 1, 1), 0.0)
    right = jnp.where(w_ids < wf - 1, pltpu.roll(p[2], wf - 1, 1), 0.0)
    acc = p[1] + left + right

    out = acc * sc_ref[:].reshape(1, 1, co) + bi_ref[:].reshape(1, 1, co)
    out_ref[:] = jnp.maximum(out, 0.0).astype(out_ref.dtype)


def _kernel_pipe(y_ref, s_ref, y_any, s_any, wt_ref, bt_ref, wc_ref,
                 sc_ref, bi_ref, out_ref, z3_buf, yh, sh, sems, *,
                 n_tiles: int, rows: int, h_fine: int, cu: int):
    """Fused decoder-stage kernel, pipelined form.

    The bulk y/skip row tiles arrive as ordinary BlockSpec operands —
    Pallas double-buffers them across grid steps, so HBM traffic overlaps
    compute (the round-3 redesign: the manual whole-tile DMA version had
    zero overlap and lost 2x at b128). Only the single halo row above and
    below each tile is fetched by explicit row DMAs (rows are the ref's
    major dim — unconstrained), with out-of-image rows masked to zero
    (the conv's zero padding). The ConvT + interleave result is computed
    once per (batch, tile) at co-block j==0 and cached in VMEM scratch
    for the remaining co blocks.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    rc = rows // 2
    hc = h_fine // 2
    cdt = s_ref.dtype
    rows_, wf, cs = s_ref.shape
    c2 = cu + cs

    @pl.when(pl.program_id(2) == 0)
    def _():
        tc0 = jnp.maximum(t * rc - 1, 0)
        tc1 = jnp.minimum(t * rc + rc, hc - 1)
        tf0 = jnp.maximum(t * rows - 1, 0)
        tf1 = jnp.minimum(t * rows + rows, h_fine - 1)
        cps = [
            pltpu.make_async_copy(y_any.at[b, pl.ds(tc0, 1)],
                                  yh.at[pl.ds(0, 1)], sems.at[0]),
            pltpu.make_async_copy(y_any.at[b, pl.ds(tc1, 1)],
                                  yh.at[pl.ds(1, 1)], sems.at[1]),
            pltpu.make_async_copy(s_any.at[b, pl.ds(tf0, 1)],
                                  sh.at[pl.ds(0, 1)], sems.at[2]),
            pltpu.make_async_copy(s_any.at[b, pl.ds(tf1, 1)],
                                  sh.at[pl.ds(1, 1)], sems.at[3]),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()
        # major-dim (row) concats are cheap; _compute_fine masks the fine
        # halo rows that fall outside the image (incl. the ConvT bias)
        y_full = jnp.concatenate([yh[0:1], y_ref[:], yh[1:2]], axis=0)
        fine = _compute_fine(y_full, wt_ref, bt_ref, t, rows,
                             h_fine, cu, cdt)

        # out-of-image skip halo rows are the conv's zero padding
        sh_top = jnp.where(t == 0, jnp.zeros((), cdt), sh[0:1])
        sh_bot = jnp.where(t == n_tiles - 1, jnp.zeros((), cdt), sh[1:2])

        # build the (dy, up|skip, c) contraction stack ONCE per tile —
        # it is identical for every co block
        pieces = []
        for dy in range(3):
            pieces.append(fine[dy: dy + rows])
            if dy == 0:
                pieces.append(jnp.concatenate(
                    [sh_top, s_ref[0: rows - 1]], axis=0))
            elif dy == 1:
                pieces.append(s_ref[:])
            else:
                pieces.append(jnp.concatenate(
                    [s_ref[1: rows], sh_bot], axis=0))
        z3_buf[:] = jnp.concatenate(pieces, axis=-1).reshape(
            rows * wf, 3 * c2)

    _conv_dots(z3_buf[:], wc_ref, sc_ref, bi_ref, out_ref, rows, wf)


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

    cob = co_block or co
    if co % cob:
        raise ValueError(f"co_block {cob} must divide Co {co}")

    rows = min(row_block, hf)
    while hf % rows:
        rows //= 2
    # shrink the row tile until the resident VMEM set (weights + z3 stack
    # + double-buffered in/out blocks + interleave temporaries) fits the
    # 16MB scoped limit with headroom
    def vmem_bytes(r):
        c2 = cu + cs
        z3 = r * wf * 3 * c2 * 2
        blocks = 2 * ((r // 2) * wcs * cin + r * wf * cs + r * wf * cob) * 2
        wts = (cin * 4 * cu + 3 * 3 * c2 * cob) * 2
        temps = (r // 2 + 2) * wcs * 4 * cu * 4 + (r + 2) * wf * cu * 2
        return z3 + blocks + wts + temps
    while rows > 2 and vmem_bytes(rows) > 11 * 2**20:
        rows //= 2
    if rows < 2 or rows % 2:
        raise ValueError(f"fine height {hf} not tileable (rows={rows})")
    rc = rows // 2

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

    kernel = functools.partial(_kernel_pipe, rows=rows, h_fine=hf,
                               cu=cu, n_tiles=n_tiles)
    in_specs = [
        # bulk tiles: auto-pipelined (double-buffered) BlockSpec operands
        pl.BlockSpec(
            (pl.Squeezed(), pl.Blocked(rc), pl.Blocked(wcs),
             pl.Blocked(cin)),
            lambda bi_, t, j: (bi_, t, 0, 0)),
        pl.BlockSpec(
            (pl.Squeezed(), pl.Blocked(rows), pl.Blocked(wf),
             pl.Blocked(cs)),
            lambda bi_, t, j: (bi_, t, 0, 0)),
        # the same arrays again, unblocked, for the halo-row DMAs
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ] + weight_specs
    scratch = [
        # cached contraction stack (identical across co blocks)
        pltpu.VMEM((rows * wf, 3 * (cu + cs)), skip.dtype),
        pltpu.VMEM((2, wcs, cin), y.dtype),           # y halo rows
        pltpu.VMEM((2, wf, cs), skip.dtype),          # skip halo rows
        pltpu.SemaphoreType.DMA((4,)),
    ]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(y, skip, y, skip, wt_pack, bt2, wc3, sc2, bi2)


def auto_co_block(cin: int, cu: int, cs: int, co: int,
                  budget_bytes: int = 6 * 2**20) -> int:
    """Largest Co block keeping resident kernel weights under ``budget``
    (ConvT pack [Cin, 4Cu] + tap weights [9, Cu+Cs, CoB], bf16)."""
    cob = co
    while cob > 128 and (cin * 4 * cu + 9 * (cu + cs) * cob) * 2 > budget_bytes:
        cob //= 2
    return cob


_AUTO_ENABLED = False
# Measured on v5e (round 3). STANDALONE at b32 the kernel wins big
# (stage1 1.60x, stage2 2.49x, stage3 2.15x vs an XLA convT+concat+conv
# chain) — but that is a latency artifact: at b128 every stage LOSES
# (0.75x/0.88x/0.84x), and in-model bench.py went 1614 -> 1313 img/s.
# Root cause (per-layer trace attribution, BENCH_NOTES round 3): XLA
# fuses the skip-concat directly into the consumer conv's operands and
# runs the 32-128px decoder conv1 stages at 99% of the bf16 roofline;
# this kernel's fat dots reach only ~60-70% (VMEM interleave + z3-stack
# copies + realign rotates on the critical path). Beating 99%-SOL XLA
# convs is not possible from this formulation, so auto-enable stays OFF.
# The round-3 in-model latency A/B killed the last claimed regime too:
# at b1/4/8/16 the kernel is 0.87-0.95x vs in-model XLA (the standalone
# 1.6-2.5x wins only beat the microbenchmark's own concat
# materialization, which in-model XLA never pays). Kept opt-in purely
# as a study artifact; no configuration is recommended to enable it.


def shape_supported(y_shape, skip_shape,
                    up_features: Optional[int] = None) -> bool:
    """Shapes the kernel tiles cleanly on real Mosaic.

    Channel alignment: the VMEM W-interleave lane-slices the ConvT matmul
    result at offsets of 2*Cu and the tap stack lane-concats Cu/Cs-sized
    pieces — Mosaic requires 128-lane-aligned offsets for both (observed:
    'unsupported shape cast' vector<...x128> -> <...x64> when Cu=64), so
    Cu and Cs must be multiples of 128."""
    _, hc, wcs, _ = y_shape
    _, hf, wf, cs = skip_shape
    if hf != 2 * hc or wf != 2 * wcs:
        return False
    if hf < 4 or hf % 4 or wf % 16:
        return False
    if cs % 128:
        return False
    if up_features is not None and up_features % 128:
        return False
    return True


def use_fused_up(y_shape, skip_shape, up_features: Optional[int] = None,
                 forced: bool = False) -> bool:
    """Gate. ``forced`` (``use_pallas=True``) means "use the kernel
    wherever it can compile": on TPU the Mosaic shape constraints still
    apply (the Cu=64 stage falls back to XLA instead of crashing the
    whole forward); off-TPU the interpret-mode kernel handles any shape
    (tests). Auto mode additionally requires ``_AUTO_ENABLED``."""
    if jax.default_backend() != "tpu":
        return forced
    if not forced and not _AUTO_ENABLED:
        return False
    return shape_supported(y_shape, skip_shape, up_features)
