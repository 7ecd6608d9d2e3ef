#!/usr/bin/env python
"""Tiled sliding-window inference receipt on the real TPU.

Measures make_tiled_predictor throughput on large images (images the
reference can only handle by resizing to 512 — ref: data/datasets.py:41)
with bench.py's anti-relay-cache methodology: data generated on device,
N fresh images scanned inside one jitted program, completion forced by
fetching a scalar that data-depends on every output.

Also cross-checks the stitched output against the plain full-image
predictor on one batch (median |probs diff|) so the receipt carries a
numerics check, not just a rate.

Usage: python _bench_tiled.py [--size 1024] [--tile 256] [--overlap 0.25]
                              [--batch 4] [--nbatches 4] [--tile-batch 8]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="unet")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--overlap", type=float, default=0.25)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--nbatches", type=int, default=4)
    ap.add_argument("--tile-batch", type=int, default=8)
    ap.add_argument("--skip-check", action="store_true",
                    help="skip the full-image numerics cross-check "
                         "(full-size fwd may OOM at very large --size)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from unet_zoo_tpu.models import create_model
    from unet_zoo_tpu.utils.serving import make_predictor, make_tiled_predictor

    model = create_model(args.model, dtype=jnp.bfloat16,
                         image_size=args.tile)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, args.tile, args.tile, 3),
                                     jnp.float32))
    tiled = make_tiled_predictor(model, variables, tile=args.tile,
                                 overlap=args.overlap, output="probs",
                                 tile_batch=args.tile_batch)

    @jax.jit
    def _gen(seed):
        return jax.random.normal(
            jax.random.PRNGKey(seed),
            (args.nbatches, args.batch, args.size, args.size, 3),
            jnp.float32)

    def upload(seed):
        x = _gen(seed)
        float(jnp.sum(x))
        return x

    @jax.jit
    def scan_tiled(X):
        def body(carry, xb):
            probs = tiled(xb)
            return carry + jnp.sum(probs.astype(jnp.float32)), None

        s, _ = lax.scan(body, jnp.float32(0.0), X)
        return s

    x_warm = upload(1)
    float(scan_tiled(x_warm))  # compile + warm
    x_timed = upload(2)
    t0 = time.perf_counter()
    float(scan_tiled(x_timed))
    dt = time.perf_counter() - t0
    ips = args.nbatches * args.batch / dt

    med_err = None
    if not args.skip_check:
        # numerics: tiled vs full-image forward on one batch (the model is
        # resolution-agnostic; halo error should be small at this overlap)
        model_full = create_model(args.model, dtype=jnp.bfloat16,
                                  image_size=args.size)
        full = make_predictor(model_full, variables, output="probs")
        xb = x_timed[0]
        med_err = float(jnp.median(jnp.abs(
            tiled(xb).astype(jnp.float32) - full(xb).astype(jnp.float32))))

    print(json.dumps({
        "metric": (f"{args.model}_tiled_images_per_sec_{args.size}px"
                   f"_t{args.tile}_o{args.overlap}"),
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "median_abs_probs_diff_vs_full": med_err,
        "megapixels_per_sec": round(ips * args.size * args.size / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
