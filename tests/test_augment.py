"""On-device augmentation: joint flip semantics + train-step integration."""

import jax
import jax.numpy as jnp
import numpy as np

from unet_zoo_tpu.data.augment import random_flips


def test_flips_are_joint_and_exhaustive():
    """Image and mask always flip together; both flip kinds occur."""
    b, s = 32, 8
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((b, s, s, 3)), jnp.float32)
    masks = jnp.asarray(rng.standard_normal((b, s, s, 1)), jnp.float32)

    out_i, out_m = jax.jit(random_flips)(jax.random.PRNGKey(3), imgs, masks)
    out_i, out_m = np.asarray(out_i), np.asarray(out_m)

    kinds = set()
    for n in range(b):
        matched = False
        for fh in (False, True):
            for fv in (False, True):
                want_i = np.asarray(imgs[n])
                want_m = np.asarray(masks[n])
                if fh:
                    want_i, want_m = want_i[:, ::-1], want_m[:, ::-1]
                if fv:
                    want_i, want_m = want_i[::-1], want_m[::-1]
                if np.array_equal(out_i[n], want_i):
                    # the mask must have received the SAME flip
                    assert np.array_equal(out_m[n], want_m)
                    kinds.add((fh, fv))
                    matched = True
        assert matched, f"sample {n} is not any flip of the input"
    assert len(kinds) == 4, f"expected all 4 flip combos in 32 samples: {kinds}"


def test_train_step_with_augment_runs_and_learns():
    from unet_zoo_tpu.models import create_model
    from unet_zoo_tpu.train.steps import create_train_state, make_train_step

    model = create_model("unet")
    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 32, 32, 3)), jnp.float32)
    masks = jnp.zeros((4, 32, 32, 1)).at[:, 8:24, 8:24].set(1.0)
    state = create_train_state(model, jax.random.PRNGKey(0), imgs[:1],
                               learning_rate=1e-3)
    step = make_train_step(model, augment=True)
    losses = []
    for _ in range(5):
        state, metrics = step(state, imgs, masks)
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
