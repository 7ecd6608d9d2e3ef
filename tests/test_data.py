"""Data pipeline tests: loader semantics, dataset parity with reference."""

import numpy as np
import pytest

from unet_zoo_tpu.data import BoneDataset, SyntheticDataset
from unet_zoo_tpu.data.loader import DataLoader


def test_loader_single_worker_no_deadlock():
    loader = DataLoader(SyntheticDataset(6, 16), batch_size=2, num_workers=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0][0].shape == (2, 16, 16, 3)


def test_loader_drop_last_and_shuffle_determinism():
    ds = SyntheticDataset(7, 16)
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=3)
    a = [b[2] for b in loader]  # paths of epoch 0
    assert len(a) == 3  # 7 // 2
    loader2 = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=3)
    b = [bb[2] for bb in loader2]
    assert a == b  # same seed+epoch → same order
    c = [bb[2] for bb in loader2]  # epoch advanced → different order
    assert b != c


@pytest.mark.parametrize("size", [32, 48])
def test_bone_dataset_loading(tmp_path, size):
    from PIL import Image

    rng = np.random.default_rng(0)
    for split in ("train",):
        (tmp_path / split / "images").mkdir(parents=True)
        (tmp_path / split / "masks").mkdir(parents=True)
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
            ).save(tmp_path / split / "images" / f"{i}.png")
            m = np.zeros((40, 40), np.uint8)
            m[10:30, 10:30] = 255
            Image.fromarray(m).save(tmp_path / split / "masks" / f"{i}.png")

    ds = BoneDataset(str(tmp_path), "train", image_size=size)
    assert len(ds) == 3
    img, mask, path = ds[0]
    assert img.shape == (size, size, 3) and img.dtype == np.float32
    assert mask.shape == (size, size, 1)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    # ImageNet normalization applied: values not in [0,1]
    assert img.min() < 0

    with pytest.raises(FileNotFoundError):
        BoneDataset(str(tmp_path), "valid")

    # cache: second read identical, no re-decode
    ds_c = BoneDataset(str(tmp_path), "train", image_size=size, cache=True)
    a = ds_c[0]
    b = ds_c[0]
    np.testing.assert_array_equal(a[0], b[0])

    # augmentation flips image and mask jointly
    ds_a = BoneDataset(str(tmp_path), "train", image_size=size,
                       augment=True, seed=1)
    img_a, mask_a, _ = ds_a[0]
    assert img_a.shape == (size, size, 3) and mask_a.shape == (size, size, 1)
    assert set(np.unique(mask_a)) <= {0.0, 1.0}


def test_loader_process_pool_matches_threads():
    """Explicit process-pool decode returns identical batches to threads."""
    from unet_zoo_tpu.data.datasets import SyntheticDataset
    from unet_zoo_tpu.data.loader import DataLoader

    import numpy as np

    ds = SyntheticDataset(12, 16)
    lt = DataLoader(ds, batch_size=4, num_workers=2, use_processes=False)
    lp = DataLoader(ds, batch_size=4, num_workers=2, use_processes=True)
    try:
        for (ia, ma, pa), (ib, mb, pb) in zip(lt, lp):
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_array_equal(ma, mb)
            assert pa == pb
    finally:
        lt.close()
        lp.close()
