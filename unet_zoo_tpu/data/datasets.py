"""Paired image/mask datasets (NHWC, numpy host-side).

TPU-native rebuild of ref: unet_zoo/data/datasets.py:10-64. Differences by
design: NHWC output, configurable ``image_size`` wired through the pipeline
(fixing reference quirk Q6 where 512 was hard-coded), no torch dependency,
and a SyntheticDataset so tests/benchmarks run without data on disk.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

_VALID_EXTENSIONS = (".png", ".jpg", ".jpeg", ".tiff", ".bmp")


def _normalize(img: np.ndarray) -> np.ndarray:
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def prepare_images(images):
    """Normalize a uint8-transferred image batch on device (no-op for f32).

    The TPU input-pipeline recipe: the host ships raw uint8 pixels (4x
    fewer bytes over PCIe/tunnel than pre-normalized f32) and the
    ImageNet normalization runs inside the compiled step, where XLA
    fuses it into the first conv's input. Bit-identical math to the
    host path: both compute (x/255 - mean)/std in f32.
    """
    import jax.numpy as jnp

    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
        return (images - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return images


def prepare_masks(masks):
    """uint8 {0,1} masks -> f32 on device (no-op for f32)."""
    import jax.numpy as jnp

    if masks.dtype == jnp.uint8:
        return masks.astype(jnp.float32)
    return masks


class BoneDataset:
    """Paired ``{split}/{images,masks}`` dataset.

    Returns ``(image NHWC float32 normalized, mask NHW1 float32 binary, path)``
    per item — or raw ``uint8`` image / ``{0,1} uint8`` mask with
    ``transfer_dtype="uint8"`` (normalization then runs on device, see
    ``prepare_images``). Listing is sorted and extension-filtered exactly
    like the reference (ref: data/datasets.py:27-34); masks are binarized
    at 0.5 (ref: data/datasets.py:59).
    """

    def __init__(self, root_path: str, split: str = "train",
                 limit: Optional[int] = None, image_size: int = 512,
                 cache: bool = False, augment: bool = False, seed: int = 0,
                 transfer_dtype: str = "float32", decoder: str = "auto"):
        self.root_path = root_path
        self.split = split
        self.limit = limit
        self.image_size = image_size
        self.cache = cache
        self._cache: dict = {}
        # "uint8": items stay raw uint8 (image pixels; mask {0,1}) and the
        # normalization runs on device (see prepare_images) — 4x fewer
        # host->device bytes and 4x smaller decode cache. "float32":
        # reference-faithful host-side normalize (ref data/datasets.py:40-49).
        if transfer_dtype not in ("float32", "uint8"):
            raise ValueError(f"transfer_dtype must be float32|uint8, "
                             f"got {transfer_dtype!r}")
        self.transfer_dtype = transfer_dtype
        # train-time augmentation (reference lists this as future work,
        # ref README.md roadmap): random horizontal/vertical flips applied
        # jointly to image+mask
        self.augment = augment
        self._aug_rng = np.random.default_rng(seed)
        # decode engine: "cpp" = the native C++ pipeline (libpng/libjpeg +
        # PIL-equivalent resample, GIL released — see unet_zoo_tpu/native/),
        # "pil" = reference-faithful PIL, "auto" = cpp when it compiled on
        # this host, per-file PIL fallback for formats it doesn't cover
        # (tiff/bmp) or on decode errors. Numerics agree within +-1 LSB
        # (tests/test_native_io.py).
        if decoder not in ("auto", "pil", "cpp"):
            raise ValueError(f"decoder must be auto|pil|cpp, got {decoder!r}")
        self.decoder = decoder

        images_path = os.path.join(root_path, split, "images")
        masks_path = os.path.join(root_path, split, "masks")
        if not os.path.exists(images_path):
            raise FileNotFoundError(f"Image directory not found: {images_path}")
        if not os.path.exists(masks_path):
            raise FileNotFoundError(f"Mask directory not found: {masks_path}")

        image_files = sorted(
            f for f in os.listdir(images_path)
            if not f.startswith(".") and f.lower().endswith(_VALID_EXTENSIONS)
        )
        mask_files = sorted(
            f for f in os.listdir(masks_path)
            if not f.startswith(".") and f.lower().endswith(_VALID_EXTENSIONS)
        )
        self.images = [os.path.join(images_path, f) for f in image_files][: self.limit]
        self.masks = [os.path.join(masks_path, f) for f in mask_files][: self.limit]
        if len(self.images) != len(self.masks):
            print(
                f"Warning: Number of images ({len(self.images)}) doesn't match "
                f"number of masks ({len(self.masks)}) for split '{split}'."
            )

    def __len__(self) -> int:
        return len(self.images)

    def _augment(self, img: np.ndarray, mask: np.ndarray):
        if self._aug_rng.random() < 0.5:
            img, mask = img[:, ::-1].copy(), mask[:, ::-1].copy()
        if self._aug_rng.random() < 0.5:
            img, mask = img[::-1].copy(), mask[::-1].copy()
        return img, mask

    def _decode_pair(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        """(image uint8 [S,S,3], mask uint8 [S,S]) via cpp or PIL."""
        s = self.image_size
        ip, mp = self.images[index], self.masks[index]
        if self.decoder in ("auto", "cpp"):
            from unet_zoo_tpu import native

            if native.supports(ip) and native.supports(mp) and \
                    native.available():
                try:
                    return (native.load_image(ip, s, 3),
                            native.load_image(mp, s, 1))
                except RuntimeError:
                    if self.decoder == "cpp":
                        raise
                    # auto: corrupt/unusual file — PIL gets a try below
            elif self.decoder == "cpp":
                raise RuntimeError(
                    f"decoder='cpp' but native decode unavailable for "
                    f"{ip!r} (lib error: {native.build_error()})")

        from PIL import Image  # lazy: PIL only needed for on-disk data

        size = (s, s)
        img = Image.open(ip).convert("RGB").resize(size, Image.BILINEAR)
        mask = Image.open(mp).convert("L").resize(size, Image.BILINEAR)
        return np.asarray(img, np.uint8), np.asarray(mask, np.uint8)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray, str]:
        if self.cache and index in self._cache:
            img_np, mask_np = self._cache[index]
            if self.augment:
                img_np, mask_np = self._augment(img_np, mask_np)
            return img_np, mask_np, self.images[index]

        img_u8, mask_u8 = self._decode_pair(index)
        if self.transfer_dtype == "uint8":
            img_np = img_u8
            # integer threshold: v/255 > 0.5 <=> v > 127 (identical split
            # to the f32 path for 8-bit sources)
            mask_np = (mask_u8 > 127).astype(np.uint8)
        else:
            img_np = _normalize(img_u8.astype(np.float32) / 255.0)
            mask_np = (mask_u8.astype(np.float32) / 255.0 > 0.5
                       ).astype(np.float32)
        mask_np = mask_np[..., None]
        if self.cache:
            self._cache[index] = (img_np, mask_np)
        if self.augment:
            img_np, mask_np = self._augment(img_np, mask_np)
        return img_np, mask_np, self.images[index]


class SyntheticDataset:
    """Deterministic synthetic blobs + masks — for tests and benchmarks."""

    def __init__(self, length: int = 64, image_size: int = 256,
                 in_channels: int = 3, seed: int = 0):
        self.length = length
        self.image_size = image_size
        self.in_channels = in_channels
        self.seed = seed

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray, str]:
        rng = np.random.default_rng(self.seed * 100003 + index)
        s = self.image_size
        img = rng.standard_normal((s, s, self.in_channels)).astype(np.float32)
        # circular blob mask at a random center
        cy, cx = rng.integers(s // 4, 3 * s // 4, size=2)
        r = rng.integers(s // 8, s // 4)
        yy, xx = np.mgrid[:s, :s]
        mask = (((yy - cy) ** 2 + (xx - cx) ** 2) < r * r).astype(np.float32)
        img = img + 2.0 * mask[..., None]  # signal correlated with the mask
        return img, mask[..., None], f"synthetic://{index}"
