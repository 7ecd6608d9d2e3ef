"""Data pipeline: paired image/mask datasets and device feeding."""

from unet_zoo_tpu.data.datasets import BoneDataset, SyntheticDataset

__all__ = ["BoneDataset", "SyntheticDataset"]
