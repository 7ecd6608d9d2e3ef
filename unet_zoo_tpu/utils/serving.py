"""Inference/serving helpers.

``make_predictor`` builds a fixed-shape jitted predictor for a trained
model: params cast to bfloat16 (halves weight HBM traffic; logits are
computed in bf16 and thresholded in f32), optional sigmoid/threshold
post-processing fused into the same XLA program, and optional mesh
sharding for multi-chip serving.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from unet_zoo_tpu.models import ZooModel


def cast_params_for_inference(variables: Any, dtype=jnp.bfloat16) -> Any:
    """Cast floating-point params to ``dtype`` (batch stats stay f32)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    out = dict(variables)
    out["params"] = jax.tree_util.tree_map(cast, variables["params"])
    return out


def calibrate_int8(model: ZooModel, variables: Any, batches) -> Any:
    """Post-training-quantization calibration for int8 serving.

    Runs eval-mode forwards over ``batches`` (an iterable of NHWC image
    arrays) recording each ``ConvNormAct`` conv input's absmax (sown into
    the ``quant_stats`` collection), reduces with max across batches, and
    returns ``variables`` extended with a ``quant`` collection. Passing
    the returned variables to eval-mode ``apply`` (or ``make_predictor``)
    routes those convs through the s8×s8→s32 MXU path (2× bf16 peak on
    v5e): weights symmetric per-output-channel, activations symmetric
    per-tensor with the calibrated scale. Training and un-calibrated
    variables are unaffected.
    """
    @jax.jit
    def one(x):
        _, st = model.module.apply(variables, x, train=False,
                                   mutable=["quant_stats"])
        return st

    agg = None
    for x in batches:
        st = one(jnp.asarray(x)).get("quant_stats")
        if st is None:
            raise ValueError(
                f"model '{model.name}' has no quantizable convs (none of "
                "its compute routes through the int8-gated conv blocks)")
        agg = st if agg is None else jax.tree_util.tree_map(
            jnp.maximum, agg, st)
    if agg is None:
        raise ValueError("calibrate_int8 needs at least one batch")
    out = dict(variables)
    out["quant"] = agg
    return out


def make_predictor(
    model: ZooModel,
    variables: Any,
    output: str = "logits",   # 'logits' | 'probs' | 'mask'
    threshold: float = 0.5,
    cast_bf16: bool = True,
    mesh=None,
    tta: bool = False,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Jitted ``predict(images NHWC) -> main output`` closure.

    ``output='mask'`` returns the thresholded binary mask (uint8),
    ``'probs'`` the sigmoid probabilities (f32), ``'logits'`` raw logits.

    ``tta=True`` enables flip test-time augmentation: probabilities are
    averaged over the four H/V-flip variants (each un-flipped before the
    average) — the same invariance group as the training-time
    augmentation (data/augment.py), so the ensemble is exactly
    flip-equivariant: ``tta(flip(x)) == flip(tta(x))``. All four
    forwards run inside ONE XLA program (a 4x-batch stack — the MXU sees
    one larger batch, not four launches). Probability-space averaging
    only: ``output='logits'`` with TTA is rejected.
    """
    if tta and output == "logits":
        raise ValueError("tta averages probabilities; use output='probs' "
                         "or 'mask' (mean-of-logits is not the ensemble)")
    if cast_bf16:
        variables = cast_params_for_inference(variables)
    if mesh is not None:
        from unet_zoo_tpu.parallel import replicate_state

        variables = replicate_state(mesh, variables)

    @jax.jit
    def predict(images: jnp.ndarray) -> jnp.ndarray:
        if tta:
            b = images.shape[0]
            variants = jnp.concatenate([
                images,
                images[:, ::-1, :, :],
                images[:, :, ::-1, :],
                images[:, ::-1, ::-1, :],
            ], axis=0)
            logits = model.module.apply(
                variables, variants, train=False)["main"]
            p = jax.nn.sigmoid(logits.astype(jnp.float32))
            probs = (p[:b]
                     + p[b:2 * b, ::-1, :, :]
                     + p[2 * b:3 * b, :, ::-1, :]
                     + p[3 * b:, ::-1, ::-1, :]) * 0.25
        else:
            logits = model.module.apply(
                variables, images, train=False)["main"]
            if output == "logits":
                return logits
            probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        if output == "probs":
            return probs
        return (probs > threshold).astype(jnp.uint8)

    if mesh is not None:
        from unet_zoo_tpu.parallel import batch_sharding

        sharding = batch_sharding(mesh)
        inner = predict

        def predict_sharded(images):
            return inner(jax.device_put(images, sharding))

        return predict_sharded
    return predict


def make_tiled_predictor(
    model: ZooModel,
    variables: Any,
    tile: int = 512,
    overlap: float = 0.25,
    output: str = "logits",   # 'logits' | 'probs' | 'mask'
    threshold: float = 0.5,
    tile_batch: int = 8,
    cast_bf16: bool = True,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Sliding-window predictor for images larger than the model's size.

    Serves arbitrarily large images on ONE chip by running the model on
    overlapping ``tile``×``tile`` windows and blending the per-tile
    logits with a separable Hann window (the standard medical-seg
    stitching scheme) — the single-device complement to
    ``parallel/spatial.py``'s multi-device halo sharding. The reference
    has no large-image path at all (it resizes everything to 512,
    ref: data/datasets.py:41).

    TPU-first shape discipline: the tile grid, padding, and blend
    window are trace-time constants; tiles run through the model
    ``tile_batch`` at a time inside one ``lax.scan`` (static shapes, no
    per-tile dispatch), and stitching is dynamic-slice add/update on a
    carried canvas. The whole thing is ONE jitted program per input
    shape. Overlap-region blending is exact for pointwise models (the
    Hann weights cancel in the weighted average — tested), and for real
    models the overlap margin hides the halo error of cropped receptive
    fields.
    """
    if not 0.0 <= overlap < 1.0:
        raise ValueError(f"overlap must be in [0, 1), got {overlap}")
    stride = max(1, int(round(tile * (1.0 - overlap))))
    if cast_bf16:
        variables = cast_params_for_inference(variables)

    # separable Hann blend window, strictly positive (half-sample offset)
    import numpy as np

    w1 = 0.5 - 0.5 * np.cos(2.0 * np.pi * (np.arange(tile) + 0.5) / tile)
    win = jnp.asarray(np.outer(w1, w1) + 1e-6, jnp.float32)[..., None]

    @jax.jit
    def predict(images: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = images.shape
        n_h = max(1, -(-(max(H, tile) - tile) // stride) + 1)
        n_w = max(1, -(-(max(W, tile) - tile) // stride) + 1)
        Hp = (n_h - 1) * stride + tile
        Wp = (n_w - 1) * stride + tile
        # reflect needs pad < dim; tiny inputs fall back to edge padding
        pad_mode = "reflect" if (Hp - H < H and Wp - W < W) else "edge"
        padded = jnp.pad(images, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)),
                         mode=pad_mode)

        # static flat (b, y, x) tile-origin table, padded to a whole
        # number of tile_batch chunks with duplicates of entry 0 —
        # duplicates add the same (weighted tile, weight) twice, which
        # the final divide cancels exactly
        ys = np.arange(n_h) * stride
        xs = np.arange(n_w) * stride
        pos = np.array([(b, y, x) for b in range(B) for y in ys for x in xs],
                       np.int32)
        tb = max(1, min(tile_batch, len(pos)))
        n_pad = (-len(pos)) % tb
        if n_pad:
            pos = np.concatenate([pos, np.repeat(pos[:1], n_pad, 0)])
        pos = jnp.asarray(pos.reshape(-1, tb, 3))

        K = jax.eval_shape(
            lambda v, x: model.module.apply(v, x, train=False)["main"],
            variables, jax.ShapeDtypeStruct((tb, tile, tile, C),
                                            images.dtype)).shape[-1]

        def body(carry, pos_chunk):
            out, wsum = carry
            tiles = jax.vmap(lambda p: jax.lax.dynamic_slice(
                padded, (p[0], p[1], p[2], 0), (1, tile, tile, C))[0]
            )(pos_chunk)
            logits = model.module.apply(
                variables, tiles, train=False)["main"].astype(jnp.float32)
            for i in range(tb):  # static unroll; tb is small
                b, y, x = pos_chunk[i, 0], pos_chunk[i, 1], pos_chunk[i, 2]
                cur = jax.lax.dynamic_slice(out, (b, y, x, 0),
                                            (1, tile, tile, K))
                out = jax.lax.dynamic_update_slice(
                    out, cur + (logits[i] * win)[None], (b, y, x, 0))
                curw = jax.lax.dynamic_slice(wsum, (b, y, x, 0),
                                             (1, tile, tile, 1))
                wsum = jax.lax.dynamic_update_slice(
                    wsum, curw + win[None], (b, y, x, 0))
            return (out, wsum), None

        init = (jnp.zeros((B, Hp, Wp, K), jnp.float32),
                jnp.zeros((B, Hp, Wp, 1), jnp.float32))
        (out, wsum), _ = jax.lax.scan(body, init, pos)
        logits = (out / wsum)[:, :H, :W, :]
        if output == "logits":
            return logits
        probs = jax.nn.sigmoid(logits)
        if output == "probs":
            return probs
        return (probs > threshold).astype(jnp.uint8)

    return predict


def export_predictor(
    model: ZooModel,
    variables: Any,
    batch: int,
    image_size: int,
    in_channels: int = 3,
    output: str = "logits",
    threshold: float = 0.5,
    cast_bf16: bool = True,
    path: Optional[str] = None,
) -> bytes:
    """Serialize a predictor to a portable StableHLO artifact (jax.export).

    The artifact embeds the weights as constants and the whole inference
    program (fwd + optional sigmoid/threshold), so a serving process can
    run it with ``load_predictor`` without the model code, and it is
    stable across framework versions (StableHLO serialization
    guarantees). Shapes are fixed at export time — the standard
    trade-off for compiled serving on TPU.
    """
    from jax import export as jax_export

    predict = make_predictor(model, variables, output=output,
                             threshold=threshold, cast_bf16=cast_bf16)
    spec = jax.ShapeDtypeStruct((batch, image_size, image_size, in_channels),
                                jnp.float32)
    blob = jax_export.export(jax.jit(predict))(spec).serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_predictor(blob_or_path) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Rehydrate an exported predictor: returns a jitted callable."""
    from jax import export as jax_export

    if isinstance(blob_or_path, (str, bytes)) and not isinstance(
            blob_or_path, bytes):
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    else:
        blob = blob_or_path
    exported = jax_export.deserialize(blob)
    return jax.jit(exported.call)
