"""Fine-structure benchmark pieces: boundary_f1 metric semantics and the
make_fine_dataset generator (round-5 quality benchmark — the shapes set
saturates at >=0.99 Dice and cannot resolve sub-4px effects)."""

import os
import subprocess
import sys

import numpy as np

from unet_zoo_tpu.train.metrics import boundary_f1

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import make_fine_dataset  # noqa: E402


def _square(size=64, lo=20, hi=44):
    m = np.zeros((size, size), bool)
    m[lo:hi, lo:hi] = True
    return m


def test_boundary_f1_identity_and_empty():
    m = _square()
    assert boundary_f1(m, m) == 1.0
    z = np.zeros_like(m)
    assert boundary_f1(z, z) == 1.0
    assert boundary_f1(m, z) == 0.0
    assert boundary_f1(z, m) == 0.0


def test_boundary_f1_tolerates_small_shift_only():
    m = _square()
    near = np.roll(m, 1, axis=0)  # 1px shift: within tolerance 2
    far = np.roll(m, 6, axis=0)
    assert boundary_f1(near, m, tolerance=2) == 1.0
    assert boundary_f1(far, m, tolerance=2) < 0.6


def test_boundary_f1_punishes_missed_thin_structure_where_dice_does_not():
    """The metric's reason to exist: dropping a thin curve next to a
    large object barely moves image Dice (area-dominated) but tanks
    boundary recall."""
    gt = np.zeros((128, 128), bool)
    gt[20:100, 20:100] = True  # large object: 6400 px
    gt[110:112, 4:124] = True  # thin 2px bar: 240 px
    pred = np.zeros_like(gt)
    pred[20:100, 20:100] = True  # perfect square, missed the bar

    inter = (gt & pred).sum()
    dice = 2 * inter / (gt.sum() + pred.sum())
    bf1 = boundary_f1(pred, gt, tolerance=2)
    assert dice > 0.95  # Dice barely notices the missing curve
    assert bf1 < 0.85  # boundary F1 does (recall hit)


def test_make_sample_has_thin_structures():
    from scipy import ndimage

    rng = np.random.default_rng(0)
    img, mask = make_fine_dataset.make_sample(256, rng)
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8
    assert mask.shape == (256, 256) and set(np.unique(mask)) <= {0, 255}
    m = mask > 0
    assert 0.005 < m.mean() < 0.25  # sparse foreground
    # thin structures: a 1px erosion removes a large share of the mask
    er = ndimage.binary_erosion(m)
    thin_frac = 1.0 - er.sum() / max(m.sum(), 1)
    assert thin_frac > 0.3, f"mask not thin-dominated ({thin_frac:.2f})"


def test_write_split_loadable_by_bone_dataset(tmp_path):
    out = str(tmp_path / "fine")
    subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "scripts", "make_fine_dataset.py"),
         "--out", out, "--size", "64", "--train", "2", "--valid", "1",
         "--test", "1"],
        check=True)
    from unet_zoo_tpu.data.datasets import BoneDataset

    ds = BoneDataset(out, split="train", image_size=64)
    img, msk, path = ds[0]
    assert img.shape[:2] == (64, 64)
    assert set(np.unique(np.asarray(msk))) <= {0.0, 1.0}
