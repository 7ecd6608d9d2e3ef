#!/usr/bin/env python
"""Input-pipeline throughput benchmark: on-disk PNGs → normalized device
batches (BASELINE.json names the host pipeline as part of the north star;
VERDICT r1 flagged it as unmeasured).

Writes a synthetic PNG dataset once (default 512 images), then measures
sustained DataLoader throughput (decode → resize → normalize → batch) for
one epoch at each size, with and without device transfer.

Usage: python scripts/bench_loader.py [--sizes 256,512] [--n 512]
       [--batch 32] [--workers 8] [--out /tmp/loaderbench]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root: str, n: int, size: int) -> None:
    from PIL import Image

    img_dir = os.path.join(root, "train", "images")
    mask_dir = os.path.join(root, "train", "masks")
    if os.path.isdir(img_dir) and len(os.listdir(img_dir)) >= n:
        return
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        mask = np.zeros((size, size), np.uint8)
        cy, cx = rng.integers(size // 4, 3 * size // 4, size=2)
        r = int(size * 0.15)
        yy, xx = np.mgrid[:size, :size]
        mask[((yy - cy) ** 2 + (xx - cx) ** 2) < r * r] = 255
        Image.fromarray(img).save(os.path.join(img_dir, f"{i:05d}.png"))
        Image.fromarray(mask).save(os.path.join(mask_dir, f"{i:05d}.png"))


def bench(root: str, image_size: int, batch: int, workers: int,
          to_device: bool, backend: str = "native",
          decoder: str = "auto") -> float:
    from unet_zoo_tpu.data.datasets import BoneDataset
    from unet_zoo_tpu.data.grain_loader import create_loader
    from unet_zoo_tpu.data.loader import prefetch_to_device

    ds = BoneDataset(root, "train", image_size=image_size, decoder=decoder)
    loader = create_loader(ds, batch_size=batch, shuffle=True,
                           num_workers=workers, drop_last=True,
                           backend=backend)
    # warm one epoch (page cache, pools)
    for _ in loader:
        pass
    n_img = 0
    t0 = time.perf_counter()
    it = prefetch_to_device(loader, size=2) if to_device else iter(loader)
    for imgs, masks, _ in it:
        n_img += imgs.shape[0]
        if to_device:
            _ = imgs.shape  # device arrays; transfer already issued
    if to_device:
        import jax

        jax.block_until_ready(imgs)
    dt = time.perf_counter() - t0
    loader.close()
    return n_img / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="256,512")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--out", default="/tmp/loaderbench")
    ap.add_argument("--device", action="store_true",
                    help="include host->device transfer")
    ap.add_argument("--backend", default="native",
                    choices=["native", "grain"])
    ap.add_argument("--decoder", default="auto",
                    choices=["auto", "pil", "cpp"],
                    help="decode engine: cpp = the native C++ pipeline "
                         "(libpng/libjpeg, GIL-free threads)")
    args = ap.parse_args()

    sizes = [int(s) for s in args.sizes.split(",")]
    make_dataset(args.out, args.n, max(sizes))
    for size in sizes:
        ips = bench(args.out, size, args.batch, args.workers, args.device,
                    args.backend, args.decoder)
        print(json.dumps({
            "metric": f"loader_images_per_sec_{size}px"
                      + ("_to_device" if args.device else ""),
            "value": round(ips, 1),
            "unit": "images/sec",
            "workers": args.workers,
            "backend": args.backend,
            "decoder": args.decoder,
        }))


if __name__ == "__main__":
    main()
