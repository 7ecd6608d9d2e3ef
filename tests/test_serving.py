"""Serving helper tests."""

import jax
import jax.numpy as jnp
import numpy as np

from unet_zoo_tpu.models import create_model
from unet_zoo_tpu.parallel import create_mesh
from unet_zoo_tpu.utils.serving import cast_params_for_inference, make_predictor


def _setup():
    model = create_model("unet")
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


def test_cast_params():
    model, variables, _ = _setup()
    cast = cast_params_for_inference(variables)
    leaf = cast["params"]["OutConv_0"]["Conv_0"]["kernel"]
    assert leaf.dtype == jnp.bfloat16
    # batch stats untouched
    bs_leaf = jax.tree_util.tree_leaves(cast["batch_stats"])[0]
    assert bs_leaf.dtype == jnp.float32


def test_predictor_outputs():
    model, variables, x = _setup()
    logits = make_predictor(model, variables, "logits", cast_bf16=False)(x)
    probs = make_predictor(model, variables, "probs", cast_bf16=False)(x)
    mask = make_predictor(model, variables, "mask", cast_bf16=False)(x)
    assert logits.shape == (2, 32, 32, 1)
    np.testing.assert_allclose(np.asarray(probs),
                               1 / (1 + np.exp(-np.asarray(logits, np.float64))),
                               atol=1e-5)
    assert mask.dtype == jnp.uint8 and set(np.unique(mask)) <= {0, 1}
    np.testing.assert_array_equal(np.asarray(mask),
                                  (np.asarray(probs) > 0.5).astype(np.uint8))


def test_predictor_bf16_close_to_f32():
    model, variables, x = _setup()
    p32 = np.asarray(make_predictor(model, variables, "probs",
                                    cast_bf16=False)(x))
    p16 = np.asarray(make_predictor(model, variables, "probs",
                                    cast_bf16=True)(x))
    assert np.abs(p32 - p16).mean() < 0.02


def test_predictor_on_mesh():
    model, variables, x8 = _setup()
    mesh = create_mesh()
    x = jnp.tile(x8, (4, 1, 1, 1))  # batch 8 over 8 devices
    pred = make_predictor(model, variables, "mask", cast_bf16=False, mesh=mesh)
    out = pred(np.asarray(x))
    assert out.shape == (8, 32, 32, 1)


def test_export_predictor_roundtrip(tmp_path):
    """StableHLO export embeds weights + postprocessing; the rehydrated
    predictor matches the live one without model code."""
    from unet_zoo_tpu.utils.serving import export_predictor, load_predictor

    model, variables, x = _setup()
    live = make_predictor(model, variables, output="probs")
    p = str(tmp_path / "unet.shlo")
    export_predictor(model, variables, batch=2, image_size=32,
                     output="probs", path=p)
    restored = load_predictor(p)
    np.testing.assert_allclose(np.asarray(restored(x)),
                               np.asarray(live(x)), atol=1e-5, rtol=1e-5)


def test_export_predictor_mask_output():
    from unet_zoo_tpu.utils.serving import export_predictor, load_predictor

    model, variables, x = _setup()
    blob = export_predictor(model, variables, batch=2, image_size=32,
                            output="mask")
    restored = load_predictor(blob)
    out = np.asarray(restored(x))
    assert out.dtype == np.uint8 and set(np.unique(out)) <= {0, 1}
