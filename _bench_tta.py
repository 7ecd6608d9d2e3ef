"""Flip-TTA serving cost: 4-variant probability ensemble vs plain
predictor, bench.py methodology (scan fresh batches in ONE program,
fetch a dependent scalar).

  M=unet B=128 RES=256 NSCAN=8 python _bench_tta.py
"""
import os, time

import jax, jax.numpy as jnp
from jax import lax

from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.utils.serving import (
    cast_params_for_inference, make_predictor)

name = os.environ.get("M", "unet")
b = int(os.environ.get("B", "128"))
res = int(os.environ.get("RES", "256"))
nscan = int(os.environ.get("NSCAN", "8"))

model = create_model(name, in_channels=3, num_classes=1,
                     dtype=jnp.bfloat16, image_size=res)
variables = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, res, res, 3), jnp.float32))
variables = cast_params_for_inference(variables)

plain = make_predictor(model, variables, output="mask")
tta = make_predictor(model, variables, output="mask", tta=True)


def bench(fn, tag, seed0):
    @jax.jit
    def scan(seed):
        X = jax.random.normal(jax.random.PRNGKey(seed),
                              (nscan, b, res, res, 3), jnp.float32)

        def body(acc, xb):
            m = fn(xb)
            return acc + jnp.sum(m.astype(jnp.float32)), None

        acc, _ = lax.scan(body, jnp.zeros(()), X)
        return acc

    float(scan(seed0))  # compile + warm
    t0 = time.time()
    float(scan(seed0 + 1))
    dt = time.time() - t0
    print(f"{tag}: {nscan * b / dt:.0f} img/s ({dt*1000:.1f} ms "
          f"for {nscan}xb{b})", flush=True)


bench(plain, f"{name} plain predictor b{b}", 11)
bench(tta, f"{name} flip-TTA x4 ensemble b{b}", 31)
