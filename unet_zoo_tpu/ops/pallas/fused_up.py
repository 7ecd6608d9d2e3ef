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
  3. the skip concat is folded into the conv contraction: the 3x3 conv
     over concat(up, skip) is computed as 9 tap-matmuls over the
     channel-concatenated VMEM tile — the concat never exists in HBM;
  4. conv bias + BatchNorm (eval, running stats) fold into a per-channel
     scale/bias epilogue, then ReLU.

Grid: (batch, fine-row tiles, Co blocks). Halo rows come from
`pl.Element` block dims (index_map in padded coordinates); pad cells are
undefined, so edge tiles mask row validity in-kernel (which also zeroes
the ConvT bias outside the image — SAME-conv zero padding semantics).
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


def _kernel(y_ref, skip_ref, wt_ref, bt_ref, wc_ref, sc_ref, bi_ref,
            out_ref, *, rows: int, h_fine: int, cu: int, rank3: bool):
    t = pl.program_id(1)
    rc = rows // 2
    rc2, wc_, cin = y_ref.shape
    _, wf, cs = skip_ref.shape
    cdt = skip_ref.dtype

    # ---- transposed conv at coarse resolution: one matmul ----
    y = y_ref[:].reshape(rc2 * wc_, cin)
    up = jnp.dot(y, wt_ref[:], preferred_element_type=jnp.float32)
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

    # ---- validity mask: halo rows outside the image are undefined pad
    # cells AND must be zero (SAME-conv zero padding; also kills the
    # ConvT bias outside the image) ----
    i = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
    g = t * rows - 1 + i
    valid = (g >= 0) & (g < h_fine)
    fine = jnp.where(valid, fine, 0.0).astype(cdt)
    skip = jnp.where(valid, skip_ref[:], jnp.zeros((), cdt))

    # ---- 3x3 conv over concat(up, skip), concat folded into the
    # contraction; W zero-pad by 1 is the conv's SAME padding ----
    z = jnp.concatenate([fine, skip], axis=-1)
    z = jnp.pad(z, ((0, 0), (1, 1), (0, 0)))
    c2 = cu + cs
    co = out_ref.shape[-1]
    acc = jnp.zeros((rows, wf, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = z[dy: dy + rows, dx: dx + wf, :]
            w = wc_ref[dy * 3 + dx]
            if rank3:
                acc = acc + jax.lax.dot_general(
                    xs, w, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                part = jnp.dot(xs.reshape(rows * wf, c2), w,
                               preferred_element_type=jnp.float32)
                acc = acc + part.reshape(rows, wf, co)

    out = acc * sc_ref[:].reshape(1, 1, co) + bi_ref[:].reshape(1, 1, co)
    out_ref[:] = jnp.maximum(out, 0.0).astype(out_ref.dtype)


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
    rank3: bool = True,
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
    wc9 = wc.reshape(9, cu + cs, co).astype(y.dtype)
    bt2 = bt.reshape(1, cu).astype(jnp.float32)
    sc2 = scale.reshape(1, co).astype(jnp.float32)
    bi2 = bias.reshape(1, co).astype(jnp.float32)

    grid = (b, hf // rows, co // cob)

    kernel = functools.partial(_kernel, rows=rows, h_fine=hf, cu=cu,
                               rank3=rank3)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pl.Squeezed(), pl.Element(rc + 2, (1, 1)),
                 pl.Blocked(wcs), pl.Blocked(cin)),
                lambda bi_, t, j: (bi_, t * rc, 0, 0)),
            pl.BlockSpec(
                (pl.Squeezed(), pl.Element(rows + 2, (1, 1)),
                 pl.Blocked(wf), pl.Blocked(cs)),
                lambda bi_, t, j: (bi_, t * rows, 0, 0)),
            pl.BlockSpec((cin, 4 * cu), lambda bi_, t, j: (0, 0)),
            pl.BlockSpec((1, cu), lambda bi_, t, j: (0, 0)),
            pl.BlockSpec((9, cu + cs, cob), lambda bi_, t, j: (0, 0, j)),
            pl.BlockSpec((1, cob), lambda bi_, t, j: (0, j)),
            pl.BlockSpec((1, cob), lambda bi_, t, j: (0, j)),
        ],
        out_specs=pl.BlockSpec(
            (pl.Squeezed(), pl.Blocked(rows), pl.Blocked(wf),
             pl.Blocked(cob)),
            lambda bi_, t, j: (bi_, t, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, hf, wf, co), skip.dtype),
        interpret=interpret,
    )(y, skip, wt_pack, bt2, wc9, sc2, bi2)


def auto_co_block(cin: int, cu: int, cs: int, co: int,
                  budget_bytes: int = 6 * 2**20) -> int:
    """Largest Co block keeping resident kernel weights under ``budget``
    (ConvT pack [Cin, 4Cu] + tap weights [9, Cu+Cs, CoB], bf16)."""
    cob = co
    while cob > 128 and (cin * 4 * cu + 9 * (cu + cs) * cob) * 2 > budget_bytes:
        cob //= 2
    return cob


def use_fused_up(y_shape, skip_shape) -> bool:
    """Gate: TPU backend and evenly-matched power-of-two-ish shapes the
    kernel tiles cleanly (fallback path handles everything else)."""
    if jax.default_backend() != "tpu":
        return False
    _, hc, wcs, _ = y_shape
    _, hf, wf, _ = skip_shape
    if hf != 2 * hc or wf != 2 * wcs:
        return False
    if hf < 4 or hf % 4 or wf % 16:
        return False
    return True
