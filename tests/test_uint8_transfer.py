"""uint8 host->device transfer path: raw pixels over the wire, normalize
on device (data/datasets.py prepare_images/prepare_masks, wired into the
jitted steps). Must be value-identical to the reference-faithful
host-side f32 normalize (ref: unet_zoo/data/datasets.py:40-59)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.data.datasets import (
    BoneDataset,
    prepare_images,
    prepare_masks,
)


def _write_pairs(tmp_path, split="train", n=3, size=40):
    from PIL import Image

    rng = np.random.default_rng(7)
    (tmp_path / split / "images").mkdir(parents=True)
    (tmp_path / split / "masks").mkdir(parents=True)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        ).save(tmp_path / split / "images" / f"{i}.png")
        m = (rng.integers(0, 255, (size, size), dtype=np.uint8))
        Image.fromarray(m).save(tmp_path / split / "masks" / f"{i}.png")


def test_uint8_dataset_matches_f32_after_prepare(tmp_path):
    _write_pairs(tmp_path)
    ds8 = BoneDataset(str(tmp_path), "train", image_size=32,
                      transfer_dtype="uint8")
    ds32 = BoneDataset(str(tmp_path), "train", image_size=32)
    for i in range(len(ds8)):
        img8, mask8, p8 = ds8[i]
        img32, mask32, p32 = ds32[i]
        assert p8 == p32
        assert img8.dtype == np.uint8 and mask8.dtype == np.uint8
        assert set(np.unique(mask8)) <= {0, 1}
        np.testing.assert_allclose(
            np.asarray(prepare_images(jnp.asarray(img8))), img32,
            rtol=0, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(prepare_masks(jnp.asarray(mask8))), mask32)


def test_prepare_is_noop_for_f32():
    x = jnp.ones((2, 8, 8, 3), jnp.float32) * 0.3
    assert prepare_images(x) is x
    m = jnp.zeros((2, 8, 8, 1), jnp.float32)
    assert prepare_masks(m) is m


def test_steps_identical_under_uint8_transfer():
    """train_step/eval_step on a uint8 batch == the same batch shipped as
    host-normalized f32 (loss, dice, updated params)."""
    from unet_zoo_tpu.models import create_model
    from unet_zoo_tpu.train.steps import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )

    model = create_model("unet", in_channels=3, num_classes=1)
    rng = np.random.default_rng(0)
    img8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    mask8 = (rng.random((2, 32, 32, 1)) > 0.5).astype(np.uint8)
    img32 = np.asarray(prepare_images(jnp.asarray(img8)))
    mask32 = mask8.astype(np.float32)

    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3), jnp.float32))
    eval_step = make_eval_step(model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    m8 = eval_step(variables, jnp.asarray(img8), jnp.asarray(mask8))
    m32 = eval_step(variables, jnp.asarray(img32), jnp.asarray(mask32))
    np.testing.assert_allclose(float(m8["loss"]), float(m32["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m8["dice"]), float(m32["dice"]),
                               rtol=1e-6)

    train_step = make_train_step(model)
    s8, t8 = train_step(state, jnp.asarray(img8), jnp.asarray(mask8))
    # state buffers are donated: rebuild for the f32 run
    state2 = create_train_state(model, jax.random.PRNGKey(0),
                                jnp.zeros((1, 32, 32, 3), jnp.float32))
    s32, t32 = train_step(state2, jnp.asarray(img32), jnp.asarray(mask32))
    np.testing.assert_allclose(float(t8["loss"]), float(t32["loss"]),
                               rtol=1e-6)
    leaves8 = jax.tree_util.tree_leaves(s8.params)
    leaves32 = jax.tree_util.tree_leaves(s32.params)
    for a, b in zip(leaves8, leaves32):
        # the two normalize orderings differ by f32 ulps; AdamW's
        # m/sqrt(v) normalization can swing a near-zero-gradient element
        # by O(lr)=1e-4 from that, so one step bounds the drift at ~lr
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_transfer_dtype_validation(tmp_path):
    _write_pairs(tmp_path, n=1)
    with pytest.raises(ValueError):
        BoneDataset(str(tmp_path), "train", transfer_dtype="bf16")
