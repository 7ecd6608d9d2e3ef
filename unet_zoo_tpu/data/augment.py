"""On-device data augmentation (compiled into the train step).

The reference lists augmentation as roadmap-only (ref: README.md:175-183);
the host-side version lives in ``BoneDataset(augment=True)``. This module
is the TPU-first variant: per-sample random horizontal/vertical flips as
pure jnp ops, executed inside the jitted train step so they fuse into the
compiled program and cost no host CPU or extra HBM round-trips
(BASELINE.json names on-device augmentation as part of the north-star
input pipeline).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def random_flips(rng: jax.Array, images: jnp.ndarray, masks: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Joint per-sample random H/V flips of NHWC images + NHW1 masks.

    Matches the host-side ``BoneDataset._augment`` semantics (independent
    50% horizontal and vertical flips, identical for image and mask).
    """
    rh, rv = jax.random.split(rng)
    b = images.shape[0]
    flip_h = jax.random.bernoulli(rh, 0.5, (b, 1, 1, 1))
    flip_v = jax.random.bernoulli(rv, 0.5, (b, 1, 1, 1))
    images = jnp.where(flip_h, images[:, :, ::-1], images)
    masks = jnp.where(flip_h, masks[:, :, ::-1], masks)
    images = jnp.where(flip_v, images[:, ::-1], images)
    masks = jnp.where(flip_v, masks[:, ::-1], masks)
    return images, masks
