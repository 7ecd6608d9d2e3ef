"""Run-to-run determinism of the full training driver.

Two `train_model` runs with the same config and seeds must produce
bit-identical metric trajectories — pins the RNG threading through
loader shuffling, on-device augmentation keys, and the jitted step
(XLA on a fixed topology is deterministic). The reference offers no
such guarantee (CUDA nondeterminism + unseeded DataLoader workers).
"""

import jax
import numpy as np
import pytest

from unet_zoo_tpu.config import Config
from unet_zoo_tpu.data import SyntheticDataset
from unet_zoo_tpu.data.loader import DataLoader
from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.utils.logger import Logger


def _cfg(tmp_path):
    return Config({
        "general": {"project_name": "t", "working_dir": str(tmp_path)},
        "data": {"dataset_dir": "unused", "num_workers": 1, "image_size": 32,
                 "augment": True, "augment_on_device": True},
        "training": {
            "epochs": 2, "batch_size": 4, "learning_rate": 1e-3,
            "early_stopping_patience": 20, "lr_scheduler_patience": 8,
            "lr_scheduler_factor": 0.2, "min_lr": 1e-7, "num_classes": 1,
        },
        "gpu": {"use_multi_gpu": False, "gpu_ids": [], "single_gpu_id": 0},
    })


@pytest.mark.slow
def test_train_model_is_deterministic(tmp_path):
    from unet_zoo_tpu.train.loop import train_model

    def one(run_dir):
        run_dir.mkdir()
        model = create_model("unet")
        train_loader = DataLoader(SyntheticDataset(8, 32), batch_size=4,
                                  shuffle=True, drop_last=True, seed=0)
        val_loader = DataLoader(SyntheticDataset(4, 32, seed=1), batch_size=4)
        logger = Logger(str(run_dir / "log.txt"))
        out = train_model(
            model, train_loader, val_loader, _cfg(run_dir), "unet",
            str(run_dir / "best"), str(run_dir / "last"), logger,
            rng=jax.random.PRNGKey(42))
        logger.close()
        return out

    tl_a, td_a, vl_a, vd_a, _ = one(tmp_path / "a")
    tl_b, td_b, vl_b, vd_b, _ = one(tmp_path / "b")
    assert tl_a == tl_b, (tl_a, tl_b)
    assert td_a == td_b
    assert vl_a == vl_b
    assert vd_a == vd_b
    assert np.isfinite(tl_a).all()
