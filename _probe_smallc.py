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


def timed(name, fn, args, steps, flops):
    @jax.jit
    def scan_fn(*a):
        def body(c, _):
            y = fn(*((a[0] + c.astype(a[0].dtype) * 1e-30,) + a[1:]))
            return y.ravel()[0].astype(jnp.float32), None

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=steps)
        return s + jnp.sum(fn(*a).astype(jnp.float32))

    float(scan_fn(*args))  # compile + warm
    t0 = time.perf_counter()
    float(scan_fn(*args))
    dt = time.perf_counter() - t0
    per = dt / (steps + 1)
    print(f"{name}: {per * 1e3:.3f} ms/op -> {flops / per / 1e12:.2f} "
          f"TF/s effective")
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--c", type=int, default=16)
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()
    B, H, C, S = args.b, args.h, args.c, args.steps
    key = jax.random.PRNGKey(0)

    x = jax.jit(lambda: jax.random.normal(key, (B, H, H, C),
                                          jnp.bfloat16))()
    w = jax.jit(lambda: jax.random.normal(key, (3, 3, C, C),
                                          jnp.bfloat16) * 0.1)()
    conv_flops = 2 * B * H * H * 9 * C * C

    # --- A: XLA conv as-is
    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ta = timed("A xla conv C=%d    " % C, conv, (x, w), S, conv_flops)

    # --- B: tap-batched GEMM + shifted adds. One GEMM [B*H*H, C] @
    # [C, 9C] producing all 9 tap products, then the spatial realign as
    # padded adds (VPU, memory-speed). Exact same math as A.
    w_tap = jnp.transpose(w, (2, 0, 1, 3)).reshape(C, 9 * C)

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

    tb = timed("B tap-batched GEMM ", tapbatch, (x, w_tap), S, conv_flops)

    # sanity: B == A
    ya = conv(x, w)
    yb = tapbatch(x, w_tap)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                - yb.astype(jnp.float32))))
    print(f"  tap-batched exactness vs conv: max |diff| = {err:.2e}")

    # --- C: 8 independent C-channel convs fused as ONE dense 8C conv
    # (the channel-concat batching idea): full lanes, 8x the FLOPs.
    G = 128 // C if C < 128 else 1
    xg = jax.jit(lambda: jax.random.normal(key, (B, H, H, G * C),
                                           jnp.bfloat16))()
    wg = jax.jit(lambda: jax.random.normal(key, (3, 3, G * C, G * C),
                                           jnp.bfloat16) * 0.1)()
    tc = timed(f"C dense G={G} concat ", conv, (xg, wg), S,
               2 * B * H * H * 9 * (G * C) ** 2)
    print(f"  per-sibling cost: {tc / G * 1e3:.3f} ms vs A "
          f"{ta * 1e3:.3f} ms -> {'WIN' if tc / G < ta else 'LOSS'} "
          f"({ta / (tc / G):.2f}x)  [D: the same dense conv IS the "
          f"well-fed C=128 reference point]")


if __name__ == "__main__":
    main()
