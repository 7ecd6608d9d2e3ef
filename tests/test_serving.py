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


# ---- tiled sliding-window inference -------------------------------------

class _PointwiseStub:
    """ZooModel stand-in whose 'main' output is a pointwise map of the
    input — overlap blending must be EXACT for it (the Hann weights
    cancel in the weighted average), which pins the tile grid, padding,
    scatter-add stitching, and crop geometry bit-tight."""

    class module:  # noqa: N801 - mimics ZooModel.module
        @staticmethod
        def apply(variables, x, train=False):
            k = variables["params"]["k"]
            main = (x * 2.0 + 1.0) @ k  # [*, C] @ [C, K]
            return {"main": main}


def _stub():
    k = jnp.asarray(np.random.default_rng(1).standard_normal((3, 2)),
                    jnp.float32)
    return _PointwiseStub(), {"params": {"k": k}}


def test_tiled_pointwise_exact():
    from unet_zoo_tpu.utils.serving import make_tiled_predictor

    model, variables = _stub()
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 50, 70, 3)),
                    jnp.float32)
    full = model.module.apply(variables, x)["main"]
    for tile, overlap, tb in [(16, 0.25, 4), (16, 0.5, 3), (32, 0.0, 8),
                              (128, 0.25, 2)]:  # 128 > image: single tile
        tiled = make_tiled_predictor(model, variables, tile=tile,
                                     overlap=overlap, tile_batch=tb,
                                     cast_bf16=False)(x)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                                   rtol=2e-5, atol=2e-5)


def test_tiled_matches_plain_predictor_when_tile_covers():
    from unet_zoo_tpu.utils.serving import make_tiled_predictor

    model, variables, x = _setup()
    plain = make_predictor(model, variables, "logits", cast_bf16=False)(x)
    tiled = make_tiled_predictor(model, variables, tile=32, overlap=0.25,
                                 cast_bf16=False)(x)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(plain),
                               rtol=1e-4, atol=1e-4)


def test_tiled_real_model_large_image_close_to_full():
    from unet_zoo_tpu.utils.serving import make_tiled_predictor

    model, variables, _ = _setup()
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 64, 96, 3)),
                    jnp.float32)
    full = make_predictor(model, variables, "probs", cast_bf16=False)(x)
    tiled = make_tiled_predictor(model, variables, tile=32, overlap=0.5,
                                 output="probs", cast_bf16=False)(x)
    # receptive-field halo error only; interior agreement should be tight
    err = np.abs(np.asarray(tiled) - np.asarray(full))
    assert np.median(err) < 0.05
    assert np.mean(err) < 0.1


def test_tiled_mask_output_dtype_and_shape():
    from unet_zoo_tpu.utils.serving import make_tiled_predictor

    model, variables = _stub()
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 33, 47, 3)),
                    jnp.float32)
    mask = make_tiled_predictor(model, variables, tile=16, overlap=0.25,
                                output="mask", cast_bf16=False)(x)
    assert mask.shape == (1, 33, 47, 2)
    assert mask.dtype == jnp.uint8
    assert set(np.unique(np.asarray(mask))) <= {0, 1}


def test_tta_is_mean_of_flip_variants():
    import pytest

    model, variables, x = _setup()
    plain = make_predictor(model, variables, "probs", cast_bf16=False)
    tta = make_predictor(model, variables, "probs", cast_bf16=False, tta=True)
    want = (np.asarray(plain(x))
            + np.asarray(plain(x[:, ::-1]))[:, ::-1]
            + np.asarray(plain(x[:, :, ::-1]))[:, :, ::-1]
            + np.asarray(plain(x[:, ::-1, ::-1]))[:, ::-1, ::-1]) / 4.0
    np.testing.assert_allclose(np.asarray(tta(x)), want, atol=1e-5)
    # averaging over the flip group makes the ensemble flip-equivariant
    np.testing.assert_allclose(np.asarray(tta(x[:, ::-1]))[:, ::-1],
                               np.asarray(tta(x)), atol=1e-5)
    with pytest.raises(ValueError, match="tta averages probabilities"):
        make_predictor(model, variables, "logits", tta=True)


def test_tta_mask_output():
    model, variables, x = _setup()
    mask = make_predictor(model, variables, "mask", cast_bf16=False,
                          tta=True)(x)
    assert mask.dtype == jnp.uint8 and mask.shape == (2, 32, 32, 1)
