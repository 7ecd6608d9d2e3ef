"""Pipeline parallelism (pp): GPipe over a homogeneous layer stack.

The idiomatic TPU pipeline is a *rotation*: stage-``i``'s weights live on
device ``i`` of the mesh's ``model`` axis (stage-stacked params, leading
dim sharded ``P('model')``), and one ``lax.scan`` ticks the schedule —
every tick each device runs its stage's block on its current microbatch,
then ``ppermute``\\ s the activation one hop down the ring while stage 0
injects the next microbatch (GPipe, arXiv:1811.06965; the scan+ppermute
formulation is the standard JAX/praxis pattern). With ``M`` microbatches
over ``S`` stages the schedule runs ``M + S - 1`` ticks, i.e. a bubble
fraction of ``(S-1)/(M+S-1)``; gradients flow through the same schedule
automatically (``ppermute``'s transpose is the reverse permutation, the
scan transposes to reverse-time).

Where this applies in a UNet zoo: NOT at encoder/decoder cuts — the skip
pyramid crosses any such cut, so a stage payload would carry every skip
and the bubble only subtracts from what pure DP already achieves on the
same mesh (DESIGN.md records that analysis). The profitable shape is an
in-model **homogeneous stack**, and the zoo has a real one: uctransnet's
channel-transformer bridge — 4 shape-identical ``CTransBlock`` layers
(models/uctransnet.py:186-189; ref unet_zoo/models/uctransnet.py:304-330,
``Encoder.layer`` ModuleList of ``Block_ViT``). :func:`pipeline_bridge`
runs exactly that stack pipelined, bit-compatible with the in-model loop.

The primitive is generic: :func:`pipeline_spmd` pipelines any
``block_fn(params_i, x) -> y`` whose input/output pytrees match, over any
mesh axis, with any number of layers per stage.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(layer_params: Sequence[Any], n_stages: int) -> Any:
    """Stack ``L`` per-layer pytrees into stage-major ``[S, L/S, ...]`` leaves.

    Consecutive layers group onto one stage (layer ``j`` → stage
    ``j // (L/S)``), so a stage applies its ``L/S`` layers in order.
    """
    n_layers = len(layer_params)
    if n_layers % n_stages:
        raise ValueError(
            f"{n_layers} layers do not divide over {n_stages} stages")
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *layer_params)
    return jax.tree_util.tree_map(
        lambda a: a.reshape(n_stages, n_layers // n_stages, *a.shape[1:]),
        stacked)


def pipeline_spmd(mesh: Mesh, block_fn: Callable[[Any, Any], Any],
                  stage_params: Any, microbatches: Any,
                  axis: str = "model",
                  batch_axis: str | None = None) -> Any:
    """Run ``microbatches`` through ``S`` pipeline stages on ``axis``.

    ``stage_params``: pytree with leading dim ``S`` (stage-major; see
    :func:`stack_stage_params`) — sharded so device ``i`` holds stage
    ``i``'s slice. ``block_fn(params_i, x)`` applies one stage (where
    ``params_i`` is a ``stage_params`` element with the stage dim
    squeezed) and must return a pytree shaped like ``x``.

    ``microbatches``: pytree with leading dim ``M`` (microbatch-major,
    replicated). Returns the same pytree with microbatch ``m`` holding
    ``stage_{S-1}(... stage_0(x_m))``, replicated over ``axis``.

    ``batch_axis``: when the mesh also has a data-parallel axis and the
    microbatches arrive with their *batch* dim (leaf dim 1, ``[M, b,
    ...]``) sharded over it, name it here — the pipeline then runs
    per-DP-row (each 'data' row streams its own batch slice through the
    same stage weights) instead of all-gathering the batch.
    """
    S = mesh.shape[axis]
    mb_leaves = jax.tree_util.tree_leaves(microbatches)
    M = mb_leaves[0].shape[0]
    for leaf in jax.tree_util.tree_leaves(stage_params):
        if leaf.shape[0] != S:
            raise ValueError(
                f"stage_params leading dim {leaf.shape[0]} != {S} stages "
                f"(mesh axis {axis!r})")

    def shard_fn(params_local, mbs):
        # local param shard is [1, ...]: squeeze to this device's stage
        params_i = jax.tree_util.tree_map(lambda a: a[0], params_local)
        stage = jax.lax.axis_index(axis)
        is_first = stage == 0
        is_last = stage == S - 1

        # the carry/outbuf become stage-varying after one tick (and
        # batch-axis-varying when the batch dim is DP-sharded): mark the
        # (replicated-zeros) initial values as varying over those axes
        var_axes = (axis,) + ((batch_axis,) if batch_axis else ())
        varying = lambda a: jax.lax.pcast(a, var_axes, to="varying")
        # fresh jnp.zeros (not zeros_like) so the values start invariant
        # and the pcast over BOTH axes is valid
        carry0 = jax.tree_util.tree_map(
            lambda a: varying(jnp.zeros(a.shape[1:], a.dtype)), mbs)
        outbuf0 = jax.tree_util.tree_map(
            lambda a: varying(jnp.zeros(a.shape, a.dtype)), mbs)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(state, t):
            carry, outbuf = state
            # stage 0 injects microbatch t (clamped once the stream ends,
            # those ticks only drain the tail); others consume the ring
            inject = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, jnp.minimum(t, M - 1), 0, keepdims=False), mbs)
            x_in = jax.tree_util.tree_map(
                lambda i, c: jnp.where(is_first, i, c), inject, carry)
            y = block_fn(params_i, x_in)
            # the last stage lands microbatch t-(S-1) from tick S-1 on
            take = jnp.logical_and(is_last, t >= S - 1)
            idx = jnp.clip(t - (S - 1), 0, M - 1)

            def land(buf, v):
                cur = jax.lax.dynamic_index_in_dim(buf, idx, 0,
                                                   keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(
                    buf, jnp.where(take, v, cur), idx, 0)

            outbuf = jax.tree_util.tree_map(land, outbuf, y)
            carry = jax.tree_util.tree_map(
                lambda v: jax.lax.ppermute(v, axis, perm), y)
            return (carry, outbuf), None

        (_, outbuf), _ = jax.lax.scan(tick, (carry0, outbuf0),
                                      jnp.arange(M + S - 1))
        # only the last stage's buffer is real: zero the rest and psum to
        # hand back a replicated result
        outbuf = jax.tree_util.tree_map(
            lambda b: jnp.where(is_last, b, jnp.zeros_like(b)), outbuf)
        return jax.tree_util.tree_map(
            lambda b: jax.lax.psum(b, axis), outbuf)

    stage_spec = jax.tree_util.tree_map(
        lambda a: P(axis, *([None] * (a.ndim - 1))), stage_params)
    if batch_axis is None:
        mb_spec = jax.tree_util.tree_map(lambda a: P(), microbatches)
    else:
        mb_spec = jax.tree_util.tree_map(
            lambda a: P(None, batch_axis, *([None] * (a.ndim - 2))),
            microbatches)
    return shard_map(shard_fn, mesh=mesh,
                     in_specs=(stage_spec, mb_spec),
                     out_specs=mb_spec)(stage_params, microbatches)


def split_microbatches(tree: Any, num_microbatches: int) -> Any:
    """[B, ...] leaves → [M, B/M, ...] (microbatch-major)."""

    def split(a):
        if a.shape[0] % num_microbatches:
            raise ValueError(
                f"batch {a.shape[0]} not divisible by "
                f"{num_microbatches} microbatches")
        return a.reshape(num_microbatches, a.shape[0] // num_microbatches,
                         *a.shape[1:])

    return jax.tree_util.tree_map(split, tree)


def merge_microbatches(tree: Any) -> Any:
    """[M, b, ...] leaves → [M*b, ...]."""
    return jax.tree_util.tree_map(
        lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:]), tree)


def bridge_stage_params(variables: Any, n_stages: int,
                        num_layers: int = 4) -> Any:
    """Stage-stack uctransnet's ``mtc/layer_{i}`` CTransBlock params."""
    mtc = variables["params"]["mtc"]
    return stack_stage_params(
        [mtc[f"layer_{i}"] for i in range(num_layers)], n_stages)


def pipeline_bridge(mesh: Mesh, variables: Any, embs: Sequence[jnp.ndarray],
                    *, channel_num: Sequence[int], num_heads: int = 4,
                    expand_ratio: int = 4, num_layers: int = 4,
                    num_microbatches: int = 8, dtype: Any = jnp.float32,
                    axis: str = "model") -> Any:
    """uctransnet's 4-layer channel-transformer bridge, pipelined.

    ``embs`` are the post-embedding multi-scale token lists ``[B, N, C_i]``
    (the in-model state between models/uctransnet.py:184 and :186).
    Equals the in-model sequential ``layer_0..layer_{L-1}`` loop exactly —
    same ``CTransBlock`` module, same params, train=False numerics.
    """
    from ..models.uctransnet import CTransBlock

    block = CTransBlock(tuple(channel_num), num_heads, expand_ratio,
                        dtype=dtype)
    stage_params = bridge_stage_params(variables, mesh.shape[axis],
                                       num_layers)

    def block_fn(params_i, xs):
        # params_i: [L/S, ...] — apply this stage's layers in order
        n_local = jax.tree_util.tree_leaves(params_i)[0].shape[0]
        for j in range(n_local):
            layer_p = jax.tree_util.tree_map(lambda a: a[j], params_i)
            outs, _ = block.apply({"params": layer_p}, list(xs), False)
            xs = tuple(outs)
        return xs

    mbs = split_microbatches(tuple(embs), num_microbatches)
    return merge_microbatches(pipeline_spmd(mesh, block_fn, stage_params,
                                            mbs, axis=axis))
