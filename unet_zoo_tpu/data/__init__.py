"""Data pipeline: paired image/mask datasets and device feeding."""

from unet_zoo_tpu.data.datasets import BoneDataset, SyntheticDataset
from unet_zoo_tpu.data.grain_loader import GrainLoader, create_loader

__all__ = ["BoneDataset", "SyntheticDataset", "GrainLoader", "create_loader"]
