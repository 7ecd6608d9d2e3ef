"""Serving-path throughput: the StableHLO deployment artifact vs the
in-process predictor, bench.py methodology (scan fresh batches in ONE
program, fetch a dependent scalar — the relay caches repeats and its
block_until_ready doesn't wait).

  M=unet B=128 RES=256 NSCAN=8 python _bench_serving.py
"""
import os, time

import jax, jax.numpy as jnp
from jax import lax

from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.utils.serving import (
    cast_params_for_inference, export_predictor, load_predictor,
    make_predictor)

name = os.environ.get("M", "unet")
b = int(os.environ.get("B", "128"))
res = int(os.environ.get("RES", "256"))
nscan = int(os.environ.get("NSCAN", "8"))

model = create_model(name, in_channels=3, num_classes=1,
                     dtype=jnp.bfloat16, image_size=res)
variables = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, res, res, 3), jnp.float32))
variables = cast_params_for_inference(variables)

blob = export_predictor(model, variables, batch=b, image_size=res,
                        output="mask")
print(f"artifact: {len(blob)/1e6:.1f} MB serialized", flush=True)
loaded = load_predictor(blob)
inproc = make_predictor(model, variables, output="mask")


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


bench(loaded, f"{name} stablehlo-artifact b{b}", 11)
bench(inproc, f"{name} in-process predictor b{b}", 31)
