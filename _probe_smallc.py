"""On-chip experiment for the small-channel lane-starvation class
(round-3 verdict item 3 — u2net RSU mid=16, nested_unet C=32).

The paper analyses (round 3: s2d, W-packing) concluded that NHWC lane
utilization C/128 survives any repacking XLA can reach, because the MXU
needs BOTH the contraction dim (K) and the output dim (N) >= 128: a
3x3 conv on C=16 offers (K=144, N=16) — N-starved — and every
reformulation just moves the starvation (tap-batched: K=16, N=144 —
K-starved; block-diagonal channel concat: dense G^2 FLOPs at G x
utilization — a wash). This probe converts that arithmetic into
measured on-chip numbers for the actual u2net stage-1 shape:

  A. XLA conv as-is               [B,128,128,16] . 3x3 . 16
  B. tap-batched GEMM             Y[m, 9*16] = X[m,16] @ W[16,144],
                                  then 9 shifted adds (VPU) - K=16
  C. block-diag channel concat    G=8 siblings as one dense
                                  [B,H,W,128] . 3x3 . 128 conv
                                  (8x FLOPs, full lanes)
  D. the same conv at C=128       (the well-fed reference point)

Usage: python _probe_smallc.py [--b 32] [--h 128] [--c 16] [--steps 100]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
from jax import lax


def timed(name, fn, gen, steps, flops):
    """gen(seed) -> args tuple, generated ON DEVICE. The timed call uses
    a FRESH seed (the relay caches (program, args) -> result — reusing
    the warm-up args returns instantly and times only the HTTP
    roundtrip; the first version of this probe reported 494 "TF/s",
    2.5x physics, exactly that way). The scan carry feeds the previous
    output back into the input so the steps are serially dependent and
    data-distinct (bf16-visible perturbation, not * 1e-30 which rounds
    away and invites CSE)."""

    gen = jax.jit(gen)

    @jax.jit
    def scan_fn(*a):
        def body(c, _):
            # NONLINEAR perturbation: a scalar multiply/add distributes
            # out of the conv (conv is linear), letting XLA hoist the
            # conv as loop-invariant — the first fixed version measured
            # 578 "TF/s" (3x physics) exactly that way. relu breaks
            # distributivity; the full-output sum prevents slice
            # narrowing of the result.
            x0 = jax.nn.relu(a[0] + (c * 1e-6).astype(a[0].dtype))
            y = fn(*((x0,) + a[1:]))
            return jnp.sum(y.astype(jnp.float32)) * 1e-12, None

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=steps)
        return s + jnp.sum(fn(*a).astype(jnp.float32))

    a = gen(1)
    float(jnp.sum(a[0].astype(jnp.float32)))
    float(scan_fn(*a))  # compile + warm
    a = gen(101)
    float(jnp.sum(a[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    float(scan_fn(*a))
    dt = time.perf_counter() - t0
    per = dt / (steps + 1)
    print(f"{name}: {per * 1e3:.3f} ms/op -> {flops / per / 1e12:.2f} "
          f"TF/s effective  ({dt * 1e3:.1f} ms total)")
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--c", type=int, default=16)
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()
    B, H, C, S = args.b, args.h, args.c, args.steps

    def gen_xw(c_dim):
        def gen(seed):
            kx, kw = jax.random.split(jax.random.PRNGKey(seed))
            return (jax.random.normal(kx, (B, H, H, c_dim), jnp.bfloat16),
                    jax.random.normal(kw, (3, 3, c_dim, c_dim),
                                      jnp.bfloat16) * 0.1)
        return gen

    conv_flops = 2 * B * H * H * 9 * C * C

    # --- A: XLA conv as-is
    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ta = timed("A xla conv C=%d    " % C, conv, gen_xw(C), S, conv_flops)

    # --- B: tap-batched GEMM + shifted adds. One GEMM [B*H*H, C] @
    # [C, 9C] producing all 9 tap products, then the spatial realign as
    # padded adds (VPU, memory-speed). Exact same math as A.
    def gen_tap(seed):
        x, w = gen_xw(C)(seed)
        return x, jnp.transpose(w, (2, 0, 1, 3)).reshape(C, 9 * C)

    def tapbatch(x, wt):
        m = x.reshape(B * H * H, C)
        y = jnp.dot(m, wt, preferred_element_type=jnp.float32)
        y = y.reshape(B, H, H, 3, 3, C)
        out = jnp.zeros((B, H, H, C), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                t = y[:, :, :, dy, dx, :]
                # contribution of input pixel (i,j) to output
                # (i + 1 - dy, j + 1 - dx): shift via pad+slice
                t = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))
                out = out + t[:, dy: dy + H, dx: dx + H, :]
        return out.astype(jnp.bfloat16)

    tb = timed("B tap-batched GEMM ", tapbatch, gen_tap, S, conv_flops)

    # sanity: B == A (on one shared sample)
    x, w = jax.jit(gen_xw(C))(7)
    ya = conv(x, w)
    yb = tapbatch(x, jnp.transpose(w, (2, 0, 1, 3)).reshape(C, 9 * C))
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                - yb.astype(jnp.float32))))
    print(f"  tap-batched exactness vs conv: max |diff| = {err:.2e}")

    # --- C: 8 independent C-channel convs fused as ONE dense 8C conv
    # (the channel-concat batching idea): full lanes, 8x the FLOPs.
    G = 128 // C if C < 128 else 1
    tc = timed(f"C dense G={G} concat ", conv, gen_xw(G * C), S,
               2 * B * H * H * 9 * (G * C) ** 2)
    print(f"  per-sibling cost: {tc / G * 1e3:.3f} ms vs A "
          f"{ta * 1e3:.3f} ms -> {'WIN' if tc / G < ta else 'LOSS'} "
          f"({ta / (tc / G):.2f}x)  [D: the same dense conv IS the "
          f"well-fed C=128 reference point]")


if __name__ == "__main__":
    main()
