"""Fused MMUNet MKBlock: the whole ConvNeXt-style multi-kernel block
(quarter split -> cascaded dw3/5/7 + BN + GELU -> concat -> BN ->
Dense 4C -> GELU -> Dense C -> +residual) in ONE Pallas kernel.

Why (BENCH_NOTES round 3): mmunet is the zoo's worst normalized number
(99 img/s, 6.5% SOL) and is op-soup-bound. The 24/48-channel quarter
splits push XLA into W-minor layouts ({2,3,1,0}) for the whole 256px
neighborhood, which drives the pointwise-MLP dots to ~5% of bf16 SOL
(profiled; a lane-padded-dot rewrite was folded away by XLA and changed
nothing). This kernel embraces that layout instead of fighting it:

  * operands are passed as [B, H, C, W] — physically the SAME bytes as
    XLA's W-minor NHWC, so the boundary transposes are layout bitcasts;
  * in-tile, H is the (unconstrained) major dim, C sits in sublanes and
    W in lanes: quarter splits become 8-aligned sublane slices, the dy
    taps become free row slices, and the dx taps become 32-bit lane
    rotates — every operation Mosaic supports (cf. the sublane-shift /
    bf16-rotate dead ends documented in fused_up.py);
  * the pointwise MLP runs as two fat MXU dots over the row-concatenated
    tile ([4C, C] x [C, R*W]), with the pre-MLP BatchNorm folded into
    the first dot's weights and all dw/BN affines folded host-side;
  * GELU is the reference-exact erf form (ref mmunet.py uses
    nn.GELU() default), with erf evaluated by the Abramowitz-Stegun
    7.1.26 polynomial (|eps| < 1.5e-7, far below bf16 resolution).

Ref: unet_zoo/models/mmunet.py:6-59 (Block).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 6  # dw3 (+1) -> dw5 (+2) -> dw7 (+3) cascaded receptive field


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|error| < 1.5e-7)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _dw(x, w_ref, kbase, k, wlim):
    """Depthwise k x k conv on x: [Rv, q, W] f32 (valid rows Rv; caller
    aligns). dy taps are row slices; dx taps are f32 lane rotates with
    the wrapped border columns zeroed (SAME zero padding). w_ref rows are
    [q, 1] per-tap channel vectors at kbase + dy*k + dx."""
    rv, q, w = x.shape
    half = k // 2
    out_rows = rv - 2 * half
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    acc = jnp.zeros((out_rows, q, w), jnp.float32)
    for dx in range(k):
        p = jnp.zeros((out_rows, q, w), jnp.float32)
        for dy in range(k):
            tap = w_ref[kbase + dy * k + dx]  # [q, 1]
            p = p + x[dy: dy + out_rows] * tap[None]
        sh = half - dx  # contribution at output col w comes from w + dx - half
        if sh == 0:
            acc = acc + p
        elif sh > 0:
            acc = acc + jnp.where(w_ids >= sh, pltpu.roll(p, sh, 2), 0.0)
        else:
            acc = acc + jnp.where(w_ids < wlim + sh,
                                  pltpu.roll(p, w + sh, 2), 0.0)
    return acc


def _kernel(x_ref, x_any, dw_ref, s_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            out_ref, th, bh, sems, *, n_tiles: int, rows: int, h: int,
            q: int, cpad: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    c = 4 * q
    _, _, w = x_ref.shape

    t0 = jnp.maximum(t * rows - _HALO, 0)
    b0 = jnp.minimum(t * rows + rows, h - _HALO)
    cp_t = pltpu.make_async_copy(x_any.at[b, pl.ds(t0, _HALO)], th,
                                 sems.at[0])
    cp_b = pltpu.make_async_copy(x_any.at[b, pl.ds(b0, _HALO)], bh,
                                 sems.at[1])
    cp_t.start()
    cp_b.start()
    cp_t.wait()
    cp_b.wait()

    xt = jnp.concatenate([th[:], x_ref[:], bh[:]], axis=0)
    i = jax.lax.broadcasted_iota(jnp.int32, (rows + 2 * _HALO, 1, 1), 0)
    g = t * rows - _HALO + i
    xt = jnp.where((g >= 0) & (g < h), xt, 0).astype(jnp.float32)

    def rowmask(v, lo):
        # zero out-of-image rows: the affine bias makes gelu(bn(dw(0)))
        # nonzero on halo rows, but the XLA path's SAME padding feeds the
        # next dw ZEROS beyond the image — mask to match.
        ri = jax.lax.broadcasted_iota(jnp.int32, (v.shape[0], 1, 1), 0)
        gr = t * rows - _HALO + lo + ri
        return jnp.where((gr >= 0) & (gr < h), v, 0.0)

    # cascaded quarters; row validity shrinks 6 -> 5 -> 3 -> 0
    x1 = _dw(xt[:, 0:q], dw_ref, 0, 3, w)                     # rows [1, R+11)
    x1 = rowmask(_gelu(x1 * s_ref[0][None] + s_ref[1][None]), 1)
    x2 = _dw(x1 + xt[1: rows + 11, q: 2 * q], dw_ref, 9, 5, w)  # [3, R+9)
    x2 = rowmask(_gelu(x2 * s_ref[2][None] + s_ref[3][None]), 3)
    x3 = _dw(x2 + xt[3: rows + 9, 2 * q: 3 * q], dw_ref, 34, 7, w)  # [6, R+6)
    x3 = _gelu(x3 * s_ref[4][None] + s_ref[5][None])

    center = xt[_HALO: rows + _HALO]
    h0 = jnp.concatenate(
        [x1[5: rows + 5], x2[3: rows + 3], x3, center[:, 3 * q:]],
        axis=1).astype(jnp.bfloat16)                          # [R, C, W]

    # pointwise MLP as fat dots over row-concatenated chunks. Chunking
    # (8 rows = 2048 lanes at W=256) bounds the [4C, chunk*W] f32
    # intermediate so large row blocks stay within VMEM. (row_block=16
    # was measured: 12.5 vs 10.8 ms at 96ch/256px/b16 — VMEM pressure
    # stalls the pipeline; 8 stands.)
    chunk = min(rows, max(1, 2048 // w))
    outs = []
    for r0 in range(0, rows, chunk):
        z = jnp.concatenate([h0[r] for r in range(r0, r0 + chunk)],
                            axis=-1)                          # [C, chunk*W]
        h1 = jnp.dot(w1_ref[:], z, preferred_element_type=jnp.float32)
        h1 = _gelu(h1 + b1_ref[:])
        h2 = jnp.dot(w2_ref[:], h1.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)      # [Cpad, chunk*W]
        for r in range(chunk):
            hr = h2[:c, r * w: (r + 1) * w] + b2_ref[:]
            outs.append((center[r0 + r] + hr).astype(out_ref.dtype)[None])
    out_ref[:] = jnp.concatenate(outs, axis=0)


def fused_mkblock(
    x: jnp.ndarray,
    dw_taps: jnp.ndarray,
    dw_affine: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    row_block: int = 8,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused MKBlock on W-lane-layout input.

    x: [B, H, C, W] (NHWC.transpose(0,1,3,2) — a layout bitcast when the
       producer is W-minor). C % 4 == 0, W % 128 == 0.
    dw_taps: [83, q, 1] f32 — the 9 dw3 taps, 25 dw5 taps, 49 dw7 taps
       (row-major per kernel), each a per-channel vector with the BN
       scale folded in? No — taps are raw; the BN affine is applied after
       each dw via ``dw_affine`` rows [s1,b1,s2,b2,s3,b3] (6, q, 1).
    w1: [4C, C] bf16 — pwconv1 weights (pre-transposed) with the norm4
       scale folded in; b1: [4C, 1] f32 with norm4 shift folded.
    w2: [Cpad, 4C] bf16 — pwconv2 weights (pre-transposed, zero-padded
       rows to a 128 multiple); b2: [C, 1] f32.
    Returns [B, H, C, W] in x.dtype.
    """
    bsz, hh, c, w = x.shape
    q = c // 4
    cpad = w2.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    rows = min(row_block, hh)
    while hh % rows:
        rows //= 2
    if rows < 1:
        raise ValueError(f"height {hh} not tileable")
    n_tiles = hh // rows

    grid = (bsz, n_tiles)
    kernel = functools.partial(_kernel, n_tiles=n_tiles, rows=rows, h=hh,
                               q=q, cpad=cpad)
    in_specs = [
        pl.BlockSpec(
            (pl.Squeezed(), pl.Blocked(rows), pl.Blocked(c), pl.Blocked(w)),
            lambda bi, t: (bi, t, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((83, q, 1), lambda bi, t: (0, 0, 0)),
        pl.BlockSpec((6, q, 1), lambda bi, t: (0, 0, 0)),
        pl.BlockSpec((4 * c, c), lambda bi, t: (0, 0)),
        pl.BlockSpec((4 * c, 1), lambda bi, t: (0, 0)),
        pl.BlockSpec((cpad, 4 * c), lambda bi, t: (0, 0)),
        pl.BlockSpec((c, 1), lambda bi, t: (0, 0)),
    ]
    out_spec = pl.BlockSpec(
        (pl.Squeezed(), pl.Blocked(rows), pl.Blocked(c), pl.Blocked(w)),
        lambda bi, t: (bi, t, 0, 0))
    scratch = [
        pltpu.VMEM((_HALO, c, w), x.dtype),
        pltpu.VMEM((_HALO, c, w), x.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, hh, c, w), x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, x, dw_taps, dw_affine, w1, b1, w2, b2)


def fold_mkblock_params(params, stats, dim: int, eps: float = 1e-5):
    """Host-side fold of an eval-mode MKBlock's parameters into the
    kernel operand set. ``params``/``stats`` are the MKBlock's flax
    param / batch_stats subtrees."""
    q = dim // 4

    def bn(name):
        p, s = params[name], stats[name]
        sc = p["scale"] / jnp.sqrt(s["var"] + eps)
        return sc, p["bias"] - s["mean"] * sc

    taps = []
    for name, k in (("dwconv1", 3), ("dwconv2", 5), ("dwconv3", 7)):
        kern = params[name]["kernel"]          # [k, k, 1, q]
        taps.append(kern.reshape(k * k, q))
    dw_taps = jnp.concatenate(taps, axis=0).reshape(83, q, 1).astype(jnp.float32)

    affs = []
    for i, name in enumerate(("norm1", "norm2", "norm3")):
        sc, bi = bn(name)
        dwb = params[f"dwconv{i+1}"]["bias"]
        affs.append(sc)
        affs.append(dwb * sc + bi)
    dw_affine = jnp.stack(affs).reshape(6, q, 1).astype(jnp.float32)

    s4, b4 = bn("norm4")
    w1 = params["pwconv1"]["kernel"]           # [C, 4C]
    b1 = params["pwconv1"]["bias"]             # [4C]
    w1t = (w1 * s4[:, None]).T                 # [4C, C]
    b1f = b4 @ w1 + b1
    w2 = params["pwconv2"]["kernel"]           # [4C, C]
    b2 = params["pwconv2"]["bias"]             # [C]
    cpad = ((dim + 127) // 128) * 128
    w2t = jnp.pad(w2.T, ((0, cpad - dim), (0, 0)))  # [Cpad, 4C]

    return (dw_taps, dw_affine, w1t.astype(jnp.bfloat16),
            b1f.reshape(-1, 1).astype(jnp.float32),
            w2t.astype(jnp.bfloat16),
            b2.reshape(-1, 1).astype(jnp.float32))


def use_fused_mkblock(x_shape) -> bool:
    """Gate: TPU, W a 128 multiple (lane dim), C % 4 == 0, H tileable.
    The kernel targets the 256px/128px levels where mmunet spends its
    time; low-res stages stay on XLA."""
    if jax.default_backend() != "tpu":
        return False
    _, hh, ww, c = x_shape  # NHWC at the call site
    return ww % 128 == 0 and c % 4 == 0 and hh % 8 == 0 and c % 8 == 0
