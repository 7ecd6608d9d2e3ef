"""Probe: can Mosaic (Pallas) reach the v5e int8 MXU rate (394 TOPS,
2x bf16) where XLA would not?

Round-3 receipt (`_probe_int8.py`, BENCH_NOTES "int8 PTQ"): XLA lowers
s8xs8->s32 convs AND dots at exactly the bf16 rate on this backend — the
2x path is never emitted. This probe asks the same question one level
down: a hand-written Pallas matmul kernel, identical tiling for bf16 and
int8 operands, timed on-chip. If the int8 kernel runs ~2x the bf16
kernel, the validated PTQ serving path (utils/serving.calibrate_int8)
gets wired through a Pallas conv-as-GEMM; if it runs at parity, the int8
lever is dead on this hardware generation at every level we can reach,
and the negative is recorded.

Methodology (tunnel rules): fresh on-device data per timed call (seeded
jit generation defeats the relay result cache), completion forced by
fetching a scalar that data-depends on every output, S matmuls scanned
inside one program.

Usage: python _probe_int8_mosaic.py [--m 4096 --n 4096 --k 4096]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_matmul(M, N, K, in_dtype, acc_dtype, bm=512, bn=512, bk=0):
    """Pallas matmul. ``bk=0``: full-K contraction per (i,j) tile.
    ``bk>0``: K-tiled with accumulation into the output block (grid
    (i, j, k), k innermost so the out tile stays resident) — larger
    bm*bn tiles fit VMEM, halving HBM traffic per FLOP."""

    if bk <= 0:

        def kernel(a_ref, b_ref, o_ref):
            o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                               preferred_element_type=acc_dtype)

        grid = (M // bm, N // bn)
        in_specs = [
            pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
    else:

        def kernel(a_ref, b_ref, o_ref):
            @pl.when(pl.program_id(2) == 0)
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)

            o_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                                preferred_element_type=acc_dtype)

        grid = (M // bm, N // bn, K // bk)
        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                                memory_space=pltpu.VMEM)

    sem = (("parallel", "parallel", "arbitrary") if bk > 0
           else ("parallel", "parallel"))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        compiler_params=pltpu.CompilerParams(dimension_semantics=sem),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(M * K + K * N) * jnp.dtype(in_dtype).itemsize
            + M * N * jnp.dtype(acc_dtype).itemsize,
            transcendentals=0,
        ),
    )


def bench_case(name, M, N, K, in_dtype, acc_dtype, steps, bm, bn,
               reduce_dtype=jnp.float32, bk=0):
    mm = make_matmul(M, N, K, in_dtype, acc_dtype, bm, bn, bk)

    def gen(seed):
        if jnp.issubdtype(in_dtype, jnp.integer):
            a = jax.random.randint(jax.random.PRNGKey(seed), (M, K),
                                   -127, 127, jnp.int32).astype(in_dtype)
            b = jax.random.randint(jax.random.PRNGKey(seed + 1), (K, N),
                                   -127, 127, jnp.int32).astype(in_dtype)
        else:
            a = jax.random.normal(jax.random.PRNGKey(seed), (M, K),
                                  in_dtype)
            b = jax.random.normal(jax.random.PRNGKey(seed + 1), (K, N),
                                  in_dtype)
        return a, b

    gen = jax.jit(gen, static_argnums=())

    @jax.jit
    def scan_mm(a, b):
        # perturb A each step from the carry so the S matmuls are
        # data-distinct and serially dependent on the previous result.
        # CRITICAL: the carry must be a REAL function of y — an earlier
        # version used y[0,0]*0, which integer arithmetic lets XLA fold
        # to 0 and dead-code-eliminate the entire int8 scan (989 "TOPS",
        # 2.5x above the physical peak — the tell).
        def body(c, _):
            if jnp.issubdtype(in_dtype, jnp.integer):
                a2 = (a.astype(jnp.int32) + (c % 3).astype(jnp.int32)
                      ).astype(in_dtype)
            else:
                a2 = a + (c * 1e-30).astype(in_dtype)
            y = mm(a2, b)
            return y[0, 0].astype(reduce_dtype), None

        s, _ = lax.scan(body, jnp.zeros((), reduce_dtype), None,
                        length=steps)
        return s + jnp.sum(mm(a, b).astype(reduce_dtype))

    a, b = gen(1)
    float(jnp.sum(a.astype(jnp.float32)))  # materialize
    float(scan_mm(a, b))                   # compile + warm
    a, b = gen(101)
    float(jnp.sum(a.astype(jnp.float32)))
    t0 = time.perf_counter()
    float(scan_mm(a, b))
    dt = time.perf_counter() - t0
    flops = 2 * M * N * K * (steps + 1)
    print(f"{name}: {dt*1e3:.1f} ms for {steps+1} matmuls -> "
          f"{flops/dt/1e12:.1f} T{'OP' if jnp.issubdtype(in_dtype, jnp.integer) else 'F'}/s")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--bm", type=int, default=512)
    ap.add_argument("--bn", type=int, default=512)
    ap.add_argument("--bk", type=int, default=0)
    ap.add_argument("--case", default="all",
                    choices=["all", "bf16", "int8", "int8_bf16w",
                             "int4"])
    args = ap.parse_args()
    M, N, K, S = args.m, args.n, args.k, args.steps

    t16 = t8 = None
    if args.case in ("all", "bf16"):
        t16 = bench_case("pallas bf16xbf16->f32", M, N, K, jnp.bfloat16,
                         jnp.float32, S, args.bm, args.bn, bk=args.bk)
    if args.case in ("all", "int8"):
        try:
            t8 = bench_case("pallas s8xs8->s32   ", M, N, K, jnp.int8,
                            jnp.int32, S, args.bm, args.bn,
                            reduce_dtype=jnp.int32, bk=args.bk)
        except Exception as e:  # noqa: BLE001
            print(f"int8 pallas matmul failed: {type(e).__name__}: "
                  f"{str(e)[:2000]}")
    if t16 and t8:
        print(f"int8 vs bf16 ratio: {t16/t8:.2f}x "
              f"({'2x path REACHED' if t16/t8 > 1.5 else 'parity — 2x path not emitted'})")


if __name__ == "__main__":
    main()
