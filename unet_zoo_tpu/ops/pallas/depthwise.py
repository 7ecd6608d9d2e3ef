"""Depthwise 2D convolution as a Pallas TPU kernel.

XLA's depthwise-conv lowering on v5e ran ~12x off HBM bandwidth for the
zoo's MixFFN/ConvNeXt shapes (profiled: 4.95ms for a 3x3 dw conv over
[64, 64, 64, 256] bf16 whose pure traffic is ~0.4ms — 21% of unext_s's
whole forward). This kernel keeps one (image, channel-block) in VMEM and
computes the k*k-tap stencil as unrolled shifted fused multiply-adds on
the VPU: one HBM read + one write.

The host wrapper pads H/W by the kernel radius once (cheap, fused by
XLA), so in-kernel taps are static slices. Channels are blocked to fit
VMEM; batch and channel-blocks form the grid.

Exactness: taps accumulate in f32 regardless of input dtype, matching
XLA's conv accumulation; golden tests compare against nn.Conv
(feature_group_count=C) in interpret mode on CPU and on-device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, out_ref, *, k: int, h: int, w: int,
            has_bias: bool):
    # Row taps via a sequential fori_loop (full unrolling stacks every
    # tap's [h, w, cb] f32 temporary on the VMEM stack — measured 16.1MB
    # at cb=256); the dy offset is dynamic (H is an untiled dim), while
    # dx offsets stay STATIC per tap — W is the sublane dim, and Mosaic
    # requires dynamic sublane offsets to be provably 8-aligned.
    f32 = jnp.float32
    cb = out_ref.shape[-1]

    def row(dy, acc):
        for dx in range(k):
            xs = x_ref[0, pl.ds(dy, h), dx:dx + w, :].astype(f32)
            acc = acc + xs * w_ref[dy, dx].astype(f32)
        return acc

    acc = jax.lax.fori_loop(0, k, row, jnp.zeros((h, w, cb), f32))
    if has_bias:
        acc = acc + b_ref[0].astype(f32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _pick_cb(hp: int, wp: int, c: int, budget: int = 2 * 2**20) -> int:
    """Largest channel block (multiple of 128 when possible) whose padded
    input tile fits the VMEM budget at 2 bytes/element."""
    per_ch = hp * wp * 2
    cb = max(1, budget // per_ch)
    if cb >= c:
        return c
    if cb >= 128:
        cb = (cb // 128) * 128
    while c % cb:
        cb -= 1
    return max(cb, 1)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def depthwise_conv2d(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray | None = None, k: int = 3,
                     interpret: bool = False) -> jnp.ndarray:
    """SAME stride-1 depthwise conv. x [B,H,W,C]; kernel [k,k,C];
    bias [C] or None."""
    b, h, w, c = x.shape
    pad = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hp, wp = h + 2 * pad, w + 2 * pad
    cb = _pick_cb(hp, wp, c)
    has_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((c,), jnp.float32)
    bias2d = bias.reshape(1, c)

    kern = functools.partial(_kernel, k=k, h=h, w=w, has_bias=has_bias)
    grid = (b, c // cb)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hp, wp, cb), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, cb), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cb), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(xp, kernel, bias2d)
    return out


def use_pallas_dw(x_shape, k: int) -> bool:
    """Heuristic gate: TPU backend, stride-1 SAME shapes the kernel
    supports, and a per-channel tile that fits VMEM."""
    if jax.default_backend() != "tpu":
        # only TPU lowers the Mosaic kernel (pltpu.VMEM); cpu/gpu/other
        # backends must take the XLA path
        return False
    b, h, w, c = x_shape
    pad = (k - 1) // 2
    return (h + 2 * pad) * (w + 2 * pad) * 2 <= 2 * 2**20
