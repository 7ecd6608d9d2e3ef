#!/usr/bin/env python
"""Standalone inference CLI: checkpoint -> predicted masks for a folder.

The reference has no inference entry point at all — prediction only
happens inside evaluation/visualization (ref: scripts/train_all.py:67-108,
utils/visualize.py:51-197), and every image is forced through a 512px
resize (ref: data/datasets.py:41). This script is the missing serving
surface on top of ``unet_zoo_tpu.utils.serving``:

* fixed-size path — resize to ``--image-size``, batched jitted predictor
  (bf16 weights, sigmoid/threshold fused), masks resized back to each
  input's original resolution;
* ``--tiled`` path — native-resolution sliding-window inference with
  Hann-blended overlap stitching for images larger than the model size
  (one jitted program per input shape);
* ``--int8`` — post-training int8 calibration on the first batch;
* ``--export`` — also serialize the predictor as a portable StableHLO
  artifact (``jax.export``), runnable without model code.

Usage::

    python scripts/predict.py --model unet --checkpoint runs/ckpt/unet_best \
        --input data/test/images --output preds/ [--image-size 256]
        [--output-kind mask|probs|logits] [--tiled --tile 512 --overlap 0.25]
        [--batch 8] [--int8] [--export unet.stablehlo] [--params '{...}']
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("UNET_ZOO_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["UNET_ZOO_PLATFORM"])

_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def parse_arguments():
    p = argparse.ArgumentParser(
        description="Run a trained UNet Zoo checkpoint on images (TPU-native).")
    p.add_argument("--model", required=True)
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint dir written by the training loop "
                        "(orbax; contains arrays/)")
    p.add_argument("--input", required=True,
                   help="an image file or a directory of images")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--in-channels", type=int, default=3)
    p.add_argument("--num-classes", type=int, default=1)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--output-kind", default="mask",
                   choices=["mask", "probs", "logits"])
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--tiled", action="store_true",
                   help="native-resolution sliding-window inference "
                        "(no resize; images larger than --image-size)")
    p.add_argument("--tile", type=int, default=None,
                   help="tile size for --tiled (default: --image-size)")
    p.add_argument("--overlap", type=float, default=0.25)
    p.add_argument("--tta", action="store_true",
                   help="flip test-time augmentation: average probabilities "
                        "over the 4 H/V-flip variants (one XLA program; "
                        "fixed-size path, mask/probs outputs)")
    p.add_argument("--int8", action="store_true",
                   help="post-training int8 calibration on the first batch")
    p.add_argument("--export", default=None, metavar="PATH",
                   help="also write the predictor as a StableHLO artifact")
    p.add_argument("--params", default=None,
                   help="JSON dict of extra create_model kwargs")
    return p.parse_args()


def list_images(path: str):
    if os.path.isfile(path):
        return [path]
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.lower().endswith(_EXTS))
    if not files:
        raise SystemExit(f"No images found under {path}")
    return files


def load_image(path: str, size: int | None, in_channels: int):
    """-> (normalized float32 HWC array, original (W, H))."""
    from PIL import Image

    from unet_zoo_tpu.data.datasets import IMAGENET_MEAN, IMAGENET_STD

    img = Image.open(path).convert("RGB" if in_channels == 3 else "L")
    orig = img.size
    if size is not None:
        img = img.resize((size, size), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    if in_channels == 3:
        arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    else:
        arr = (arr - 0.5) / 0.5
    return arr, orig


def save_output(arr: np.ndarray, kind: str, path: str, orig_size=None):
    """Write one HWK prediction. Masks go out as PNG at the original
    resolution (nearest); probs/logits as .npy at model resolution."""
    if kind == "mask":
        from PIL import Image

        m = (np.asarray(arr)[..., 0] * 255).astype(np.uint8)
        img = Image.fromarray(m, mode="L")
        if orig_size is not None and img.size != orig_size:
            img = img.resize(orig_size, Image.NEAREST)
        img.save(path + ".png")
    else:
        np.save(path + ".npy", np.asarray(arr, np.float32))


def main():
    args = parse_arguments()
    import jax.numpy as jnp

    from unet_zoo_tpu.models import create_model
    from unet_zoo_tpu.utils.checkpoint import checkpoint_exists, load_checkpoint
    from unet_zoo_tpu.utils import serving

    if not checkpoint_exists(args.checkpoint):
        raise SystemExit(f"Checkpoint not found: {args.checkpoint}")

    params = json.loads(args.params) if args.params else {}
    params.setdefault("in_channels", args.in_channels)
    params.setdefault("num_classes", args.num_classes)
    params.setdefault("image_size", args.image_size)
    model = create_model(args.model, **params)
    variables = load_checkpoint(args.checkpoint).get("variables")
    if variables is None:
        raise SystemExit(
            f"{args.checkpoint} has no 'variables' payload — is this a "
            "training checkpoint from scripts/train.py?")

    files = list_images(args.input)
    os.makedirs(args.output, exist_ok=True)
    print(f"{args.model}: {len(files)} image(s) -> {args.output} "
          f"({'tiled ' if args.tiled else ''}{args.output_kind})")

    cast_bf16 = True
    if args.int8:
        x0, _ = load_image(files[0], args.image_size, args.in_channels)
        variables = serving.calibrate_int8(
            model, variables, [jnp.asarray(x0[None])])
        cast_bf16 = False  # quantize from f32 weights (README int8 recipe)
        print("int8: calibrated on 1 batch")

    if args.export:
        serving.export_predictor(
            model, variables, batch=args.batch, image_size=args.image_size,
            in_channels=args.in_channels, output=args.output_kind,
            threshold=args.threshold, cast_bf16=cast_bf16, path=args.export)
        print(f"export: StableHLO artifact -> {args.export} "
              f"(batch {args.batch}, {args.image_size}px)")

    if args.tta and (args.tiled or args.output_kind == "logits"):
        raise SystemExit("--tta averages probabilities on the fixed-size "
                         "path: use without --tiled and with "
                         "--output-kind mask|probs")
    stem = lambda f: os.path.splitext(os.path.basename(f))[0]
    if args.tiled:
        predict = serving.make_tiled_predictor(
            model, variables, tile=args.tile or args.image_size,
            overlap=args.overlap, output=args.output_kind,
            threshold=args.threshold, cast_bf16=cast_bf16)
        for f in files:
            arr, orig = load_image(f, None, args.in_channels)
            out = predict(jnp.asarray(arr[None]))[0]
            save_output(out, args.output_kind,
                        os.path.join(args.output, stem(f)))
            print(f"  {stem(f)}: {arr.shape[0]}x{arr.shape[1]} done")
        return

    predict = serving.make_predictor(
        model, variables, output=args.output_kind, threshold=args.threshold,
        cast_bf16=cast_bf16, tta=args.tta)
    B = args.batch
    for i in range(0, len(files), B):
        chunk = files[i:i + B]
        imgs, origs = zip(*(load_image(f, args.image_size, args.in_channels)
                            for f in chunk))
        x = np.stack(imgs)
        if len(chunk) < B:  # pad to the compiled batch; drop the pad rows
            x = np.concatenate([x, np.repeat(x[:1], B - len(chunk), 0)])
        out = predict(jnp.asarray(x))[:len(chunk)]
        for j, f in enumerate(chunk):
            save_output(out[j], args.output_kind,
                        os.path.join(args.output, stem(f)), origs[j])
        print(f"  [{min(i + B, len(files))}/{len(files)}]")


if __name__ == "__main__":
    main()
