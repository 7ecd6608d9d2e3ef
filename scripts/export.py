#!/usr/bin/env python
"""Export a trained checkpoint to a portable StableHLO serving artifact.

Usage:
  python scripts/export.py --model unet --checkpoint <orbax_dir> \
      --batch 8 --image-size 256 --output mask --out unet_serve.shlo

The artifact embeds the (bf16-cast) weights and the full inference
program; a serving process rehydrates it with
``unet_zoo_tpu.utils.serving.load_predictor`` — no model code needed.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("UNET_ZOO_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["UNET_ZOO_PLATFORM"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--checkpoint", required=True,
                    help="orbax checkpoint dir (as written by training: "
                         "{'variables': ...})")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--in-channels", type=int, default=3)
    ap.add_argument("--num-classes", type=int, default=1)
    ap.add_argument("--output", default="logits",
                    choices=["logits", "probs", "mask"])
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--no-bf16", action="store_true",
                    help="keep weights f32 in the artifact")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from unet_zoo_tpu.models import create_model
    from unet_zoo_tpu.utils.checkpoint import load_checkpoint
    from unet_zoo_tpu.utils.serving import export_predictor

    model = create_model(args.model, in_channels=args.in_channels,
                         num_classes=args.num_classes,
                         image_size=args.image_size)
    sample = jnp.zeros((1, args.image_size, args.image_size,
                        args.in_channels), jnp.float32)
    target = {"variables": model.init(jax.random.PRNGKey(0), sample)}
    variables = load_checkpoint(args.checkpoint, target)["variables"]

    blob = export_predictor(
        model, variables, batch=args.batch, image_size=args.image_size,
        in_channels=args.in_channels, output=args.output,
        threshold=args.threshold, cast_bf16=not args.no_bf16, path=args.out)
    print(f"wrote {args.out}: {len(blob) / 1e6:.2f} MB "
          f"({args.model}, b{args.batch}@{args.image_size}px, "
          f"{args.output})")


if __name__ == "__main__":
    main()
