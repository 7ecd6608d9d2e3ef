#!/usr/bin/env python
"""Write a learnable synthetic segmentation dataset to disk as PNGs.

Layout matches BoneDataset's contract (`{split}/{images,masks}`, paired
sorted filenames — ref: unet_zoo/data/datasets.py:10-39). Each image is a
noisy background with 1-3 brighter rotated ellipses; the mask is the
ellipse union. The task is learnable but not trivial (noise sigma ~25
against a +55 foreground shift), so a real model reaching val Dice >=
0.95 on it is evidence the training stack works end-to-end (VERDICT r2
items 3 and 8).

Usage: python scripts/make_shapes_dataset.py [--out /tmp/shapes_ds]
       [--size 256] [--train 400 --valid 64 --test 64] [--seed 0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _ellipse_mask(size: int, rng: np.random.Generator) -> np.ndarray:
    """One random rotated ellipse as a boolean [size, size] mask."""
    cy, cx = rng.uniform(0.25 * size, 0.75 * size, size=2)
    a = rng.uniform(0.08 * size, 0.22 * size)
    b = rng.uniform(0.08 * size, 0.22 * size)
    theta = rng.uniform(0.0, np.pi)
    yy, xx = np.mgrid[:size, :size].astype(np.float32)
    y, x = yy - cy, xx - cx
    ct, st = np.cos(theta), np.sin(theta)
    u = (x * ct + y * st) / a
    v = (-x * st + y * ct) / b
    return (u * u + v * v) <= 1.0


def make_sample(size: int, rng: np.random.Generator):
    mask = np.zeros((size, size), dtype=bool)
    for _ in range(int(rng.integers(1, 4))):
        mask |= _ellipse_mask(size, rng)
    base = rng.uniform(70.0, 110.0)
    img = rng.normal(base, 25.0, (size, size, 3)).astype(np.float32)
    img += 55.0 * mask[..., None]
    img = np.clip(img, 0, 255).astype(np.uint8)
    return img, (mask.astype(np.uint8) * 255)


def write_split(root: str, split: str, n: int, size: int, seed: int) -> None:
    from PIL import Image

    img_dir = os.path.join(root, split, "images")
    mask_dir = os.path.join(root, split, "masks")
    if os.path.isdir(img_dir) and len(os.listdir(img_dir)) >= n:
        print(f"[skip] {split}: {n} images already present")
        return
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        img, mask = make_sample(size, rng)
        Image.fromarray(img).save(os.path.join(img_dir, f"{i:05d}.png"))
        Image.fromarray(mask).save(os.path.join(mask_dir, f"{i:05d}.png"))
    print(f"[done] {split}: {n} x {size}px -> {img_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/shapes_ds")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--train", type=int, default=400)
    ap.add_argument("--valid", type=int, default=64)
    ap.add_argument("--test", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    for split, n, off in (("train", args.train, 0), ("valid", args.valid, 1),
                          ("test", args.test, 2)):
        write_split(args.out, split, n, args.size, args.seed * 7919 + off)


if __name__ == "__main__":
    main()
