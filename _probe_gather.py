#!/usr/bin/env python
"""Feasibility probe: dynamic row gather inside a Pallas TPU kernel.

The wranet deform-conv needs, per output pixel, a dynamically indexed
[4C] row from a per-image table (ops/deform.py gathers via jnp.take in
XLA). A Pallas kernel only helps if Mosaic can gather rows from a
VMEM-resident table at vector rate. This probes the candidate lowerings
on the real chip; run variants individually so one Mosaic abort doesn't
kill the rest:  python _probe_gather.py take|tala|loop|xla [N]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 4096          # table rows (one 64x64 image's padded pixels)
C = 128              # row width
N = 4096             # gathered rows per grid step


def k_take(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[0], axis=0)


def k_tala(tab_ref, idx_ref, out_ref):
    idx2 = idx_ref[0][:, None]                      # [N, 1]
    out_ref[:] = jnp.take_along_axis(
        tab_ref[:], jnp.broadcast_to(idx2, (N, C)), axis=0)


def k_loop(tab_ref, idx_ref, out_ref):
    def body(i, _):
        out_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(idx_ref[0, i], 1), :]
        return 0
    jax.lax.fori_loop(0, N, body, 0)


def run(variant: str):
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((ROWS, C)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, ROWS, size=(1, N)), jnp.int32)

    if variant == "xla":
        f = jax.jit(lambda t, i: jnp.take(t, i[0], axis=0))
    else:
        kern = {"take": k_take, "tala": k_tala, "loop": k_loop}[variant]
        f = jax.jit(functools.partial(
            pl.pallas_call,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((ROWS, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((N, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        )(kern))
    out = f(tab, idx)
    ref = np.asarray(tab)[np.asarray(idx)[0]]
    err = float(jnp.max(jnp.abs(out - ref)))
    # timing: scan many gathers inside one program, fresh data
    @jax.jit
    def many(t, I):
        def body(c, i):
            return c + jnp.sum(f(t, i)), None
        s, _ = jax.lax.scan(body, jnp.float32(0.0), I)
        return s

    reps = 200
    I = jnp.asarray(rng.integers(0, ROWS, size=(reps, 1, N)), jnp.int32)
    float(many(tab, I))
    I2 = jnp.asarray(rng.integers(0, ROWS, size=(reps, 1, N)), jnp.int32)
    t0 = time.perf_counter()
    float(many(tab, I2))
    dt = (time.perf_counter() - t0) / reps
    gbs = N * C * 4 / dt / 1e9
    print(f"{variant}: max_err={err:.2e}  {dt*1e6:.1f} us/gather "
          f"({gbs:.0f} GB/s effective)")


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "xla")
