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
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Jitted ``predict(images NHWC) -> main output`` closure.

    ``output='mask'`` returns the thresholded binary mask (uint8),
    ``'probs'`` the sigmoid probabilities (f32), ``'logits'`` raw logits.
    """
    if cast_bf16:
        variables = cast_params_for_inference(variables)
    if mesh is not None:
        from unet_zoo_tpu.parallel import replicate_state

        variables = replicate_state(mesh, variables)

    @jax.jit
    def predict(images: jnp.ndarray) -> jnp.ndarray:
        logits = model.module.apply(variables, images, train=False)["main"]
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
