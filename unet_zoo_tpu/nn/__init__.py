"""Reusable NHWC Flax blocks shared across the model zoo."""

from unet_zoo_tpu.nn.blocks import (
    BatchNorm,
    ConvNormAct,
    DoubleConv,
    ConvBlock,
    DoubleConvMid,
    Down,
    DownSample,
    UpConvBlock,
    UpBilinear,
    UpSampleUNet,
    OutConv,
    ResidualConv,
    TransposedUp,
)

__all__ = [
    "BatchNorm",
    "ConvNormAct",
    "DoubleConv",
    "ConvBlock",
    "DoubleConvMid",
    "Down",
    "DownSample",
    "UpConvBlock",
    "UpBilinear",
    "UpSampleUNet",
    "OutConv",
    "ResidualConv",
    "TransposedUp",
]
