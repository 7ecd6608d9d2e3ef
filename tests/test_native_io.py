"""Native C++ decode pipeline vs the PIL reference path.

The native library re-implements PIL's exact algorithms (triangle-filter
BILINEAR resampling, the L24 integer luma for convert("L")) in float
arithmetic, so results agree within +-1 LSB of PIL's fixed-point math.
These tests pin that contract and the loader integration; they skip
cleanly when the host can't compile the library (no g++ / headers).
"""

import os

import numpy as np
import pytest

from PIL import Image

from unet_zoo_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native decoder unavailable: {native.build_error()}")


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_io")
    rng = np.random.default_rng(0)
    paths = {}
    # odd sizes on purpose: resampling tap bounds differ per output pixel
    for name, (w, h) in [("big", (517, 333)), ("small", (48, 80)),
                         ("square", (256, 256))]:
        a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = str(root / f"{name}.png")
        Image.fromarray(a).save(p)
        paths[f"{name}.png"] = p
        pj = str(root / f"{name}.jpg")
        Image.fromarray(a).save(pj, quality=90)
        paths[f"{name}.jpg"] = pj
    gray = rng.integers(0, 256, (200, 150), dtype=np.uint8)
    p = str(root / "gray.png")
    Image.fromarray(gray).save(p)
    paths["gray.png"] = p
    pal = Image.fromarray(
        rng.integers(0, 256, (90, 120, 3), dtype=np.uint8)).convert(
            "P", palette=Image.ADAPTIVE)
    p = str(root / "palette.png")
    pal.save(p)
    paths["palette.png"] = p
    return paths


@pytest.mark.parametrize("key", ["big.png", "big.jpg", "small.png",
                                 "small.jpg", "square.png", "gray.png",
                                 "palette.png"])
@pytest.mark.parametrize("channels,mode", [(3, "RGB"), (1, "L")])
def test_matches_pil_within_1lsb(image_dir, key, channels, mode):
    size = 64
    ref = np.asarray(
        Image.open(image_dir[key]).convert(mode).resize(
            (size, size), Image.BILINEAR), dtype=np.int16)
    got = native.load_image(image_dir[key], size, channels).astype(np.int16)
    assert got.shape == ref.shape
    diff = np.abs(ref - got)
    assert diff.max() <= 1
    assert diff.mean() <= 0.05 or mode == "L"  # L pays the luma LSB too


def test_upscale_matches_pil(image_dir):
    ref = np.asarray(
        Image.open(image_dir["small.png"]).convert("RGB").resize(
            (128, 128), Image.BILINEAR), dtype=np.int16)
    got = native.load_image(image_dir["small.png"], 128, 3).astype(np.int16)
    assert np.abs(ref - got).max() <= 1


def test_batch_matches_per_item_and_threads(image_dir):
    paths = [image_dir["big.png"], image_dir["big.jpg"],
             image_dir["square.png"], image_dir["gray.png"]] * 3
    per_item = np.stack([native.load_image(p, 96, 3) for p in paths])
    for threads in (1, 4):
        batch = native.load_batch(paths, 96, 3, threads=threads)
        np.testing.assert_array_equal(batch, per_item)


def test_decode_failure_raises(image_dir, tmp_path):
    bad = str(tmp_path / "corrupt.png")
    with open(bad, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot actually a png")
    with pytest.raises(RuntimeError):
        native.load_image(bad, 64, 3)
    with pytest.raises(RuntimeError, match="decode failures"):
        native.load_batch([image_dir["big.png"], bad], 64, 3)


def _make_pair_dataset(tmp_path, n=4, src=96):
    rng = np.random.default_rng(7)
    for split in ("train",):
        for kind in ("images", "masks"):
            os.makedirs(tmp_path / split / kind, exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 256, (src, src, 3), dtype=np.uint8)
            mask = (rng.random((src, src)) > 0.5).astype(np.uint8) * 255
            Image.fromarray(img).save(tmp_path / split / "images" / f"{i}.png")
            Image.fromarray(mask).save(tmp_path / split / "masks" / f"{i}.png")
    return str(tmp_path)


@pytest.mark.parametrize("transfer_dtype", ["uint8", "float32"])
def test_dataset_cpp_vs_pil(tmp_path, transfer_dtype):
    from unet_zoo_tpu.data.datasets import BoneDataset

    root = _make_pair_dataset(tmp_path)
    ds_pil = BoneDataset(root, "train", image_size=64, decoder="pil",
                         transfer_dtype=transfer_dtype)
    ds_cpp = BoneDataset(root, "train", image_size=64, decoder="cpp",
                         transfer_dtype=transfer_dtype)
    for i in range(len(ds_pil)):
        img_p, mask_p, path_p = ds_pil[i]
        img_c, mask_c, path_c = ds_cpp[i]
        assert path_p == path_c
        assert img_c.shape == img_p.shape and mask_c.shape == mask_p.shape
        if transfer_dtype == "uint8":
            assert np.abs(img_p.astype(np.int16)
                          - img_c.astype(np.int16)).max() <= 1
        else:
            # +-1 uint8 LSB through (x/255 - mean)/std
            assert np.abs(img_p - img_c).max() <= (1 / 255.0) / 0.224 + 1e-6
        # binarized masks may flip only where PIL landed exactly at the
        # 127/128 threshold boundary (the +-1 LSB band)
        flipped = (mask_p != mask_c).mean()
        assert flipped <= 0.02


def test_dataset_auto_falls_back_for_unsupported_format(tmp_path):
    from unet_zoo_tpu.data.datasets import BoneDataset

    root = _make_pair_dataset(tmp_path, n=2)
    # convert one pair to bmp (PIL-only format)
    for kind in ("images", "masks"):
        d = os.path.join(root, "train", kind)
        src = os.path.join(d, "0.png")
        Image.open(src).save(os.path.join(d, "0.bmp"))
        os.remove(src)
    ds = BoneDataset(root, "train", image_size=32, decoder="auto")
    img, mask, _ = ds[0]  # bmp pair -> PIL fallback
    assert img.shape == (32, 32, 3)
    img2, _, _ = ds[1]  # png pair -> native
    assert img2.shape == (32, 32, 3)
    with pytest.raises(RuntimeError, match="native decode unavailable"):
        BoneDataset(root, "train", image_size=32, decoder="cpp")[0]


def test_loader_auto_prefers_threads_with_native_decoder(tmp_path):
    from unet_zoo_tpu.data.datasets import BoneDataset
    from unet_zoo_tpu.data.loader import DataLoader

    root = _make_pair_dataset(tmp_path)
    ds = BoneDataset(root, "train", image_size=32, decoder="auto")
    loader = DataLoader(ds, batch_size=2, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    import concurrent.futures

    assert isinstance(loader._io_pool,
                      concurrent.futures.ThreadPoolExecutor)
    loader.close()
