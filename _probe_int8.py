"""Probe: does XLA on this TPU lower s8xs8->s32 convolutions at the
int8 MXU rate (v5e: 394 TOPS, 2x bf16)?

Times a representative unet decoder conv shape (3x3, C=128) as bf16 vs
int8, scanned-batch methodology (fresh on-device data, completion forced
through a data-dependent scalar). If int8 runs ~2x the bf16 rate, a PTQ
serving path is worth building; if it falls back to a slow emulation,
record the negative and stop.

Usage: python _probe_int8.py [--size 64] [--cin 128] [--cout 128]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, *args, n=3):
    fn(*args).block_until_ready()  # compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--cin", type=int, default=128)
    ap.add_argument("--cout", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    B, H, C, F, S = args.batch, args.size, args.cin, args.cout, args.steps
    flops = 2 * B * H * H * 9 * C * F * S

    key = jax.random.PRNGKey(0)

    def conv(x, k, dims=None):
        return lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dims)

    # --- bf16 reference
    x16 = jax.jit(lambda: jax.random.normal(key, (B, H, H, C), jnp.bfloat16))()
    k16 = jax.jit(lambda: jax.random.normal(key, (3, 3, C, F), jnp.bfloat16))()

    @jax.jit
    def scan_bf16(x, k):
        def body(c, _):
            y = conv(x + c.astype(jnp.bfloat16), k)
            return jnp.sum(y.astype(jnp.float32)), None
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=S)
        return s

    t16 = timeit(scan_bf16, x16, k16)
    print(f"bf16: {t16*1e3:.2f} ms for {S} convs -> "
          f"{flops/t16/1e12:.1f} TF/s")

    # --- int8
    xi8 = jax.jit(lambda: jax.random.randint(
        key, (B, H, H, C), -127, 127, jnp.int8))()
    ki8 = jax.jit(lambda: jax.random.randint(
        key, (3, 3, C, F), -127, 127, jnp.int8))()

    @jax.jit
    def scan_i8(x, k):
        def body(c, _):
            xq = (x.astype(jnp.int32) + c).astype(jnp.int8)
            y = conv(xq, k, jnp.int32)
            return jnp.sum(y), None
        s, _ = lax.scan(body, jnp.int32(0), None, length=S)
        return s

    try:
        t8 = timeit(scan_i8, xi8, ki8)
        print(f"int8: {t8*1e3:.2f} ms for {S} convs -> "
              f"{flops/t8/1e12:.1f} TOP/s  (vs bf16 ratio {t16/t8:.2f}x)")
    except Exception as e:  # noqa: BLE001
        print(f"int8 conv failed to lower: {type(e).__name__}: {e}")

    # --- int8 dot_general sanity (known-good MXU path) for comparison
    a8 = jax.jit(lambda: jax.random.randint(
        key, (4096, 2048), -127, 127, jnp.int8))()
    b8 = jax.jit(lambda: jax.random.randint(
        key, (2048, 4096), -127, 127, jnp.int8))()
    a16, b16 = a8.astype(jnp.bfloat16), b8.astype(jnp.bfloat16)
    dflops = 2 * 4096 * 2048 * 4096 * S

    @jax.jit
    def scan_dot8(a, b):
        def body(c, _):
            y = lax.dot_general((a.astype(jnp.int32) + c).astype(jnp.int8), b,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            return jnp.sum(y), None
        s, _ = lax.scan(body, jnp.int32(0), None, length=S)
        return s

    @jax.jit
    def scan_dot16(a, b):
        def body(c, _):
            y = lax.dot_general(a + c.astype(jnp.bfloat16), b,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            return jnp.sum(y), None
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=S)
        return s

    td16 = timeit(scan_dot16, a16, b16)
    print(f"bf16 dot: {dflops/td16/1e12:.1f} TF/s")
    try:
        td8 = timeit(scan_dot8, a8, b8)
        print(f"int8 dot: {dflops/td8/1e12:.1f} TOP/s "
              f"(ratio {td16/td8:.2f}x)")
    except Exception as e:  # noqa: BLE001
        print(f"int8 dot failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
