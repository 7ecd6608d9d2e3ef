"""Switch-style mixture-of-experts MLP with expert parallelism.

A **superset capability** (like the ``medt_logo`` registry entry): the
reference has no MoE anywhere, so this has no parity target — it exists
to give the framework a real expert-parallel (``ep``) scaling axis next
to dp/fsdp/tp/spatial (``parallel/expert.py`` holds the placement
rules).

TPU-idiomatic GShard/Switch dense-dispatch formulation
(GShard: arXiv:2006.16668; Switch: arXiv:2101.03961): routing, dispatch
and combine are *static-shape einsums* — no ragged or data-dependent
shapes anywhere under ``jit`` — so the MXU executes the expert FFNs as
one stacked ``[E, C, D] x [E, D, H]`` batched matmul and GSPMD can shard
the expert-stacked parameters and the ``[E, C, *]`` activations over a
mesh axis, inserting the dispatch/combine collectives itself.

Mechanics: tokens are routed within fixed groups of ``group_size`` with
per-group per-expert capacity ``ceil(capacity_factor * G / E)``. Each
token goes to its top-1 expert; tokens beyond an expert's capacity are
dropped (their FFN contribution is zero — the transformer's residual
connection carries them unchanged, the standard Switch behavior). The
Switch load-balancing auxiliary loss ``E * sum_e f_e * P_e`` is sown
into the ``aux_loss`` collection, which the train step adds to the
segmentation loss.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class SwitchMoEMLP(nn.Module):
    """Top-1-routed mixture-of-experts FFN over the trailing feature dim.

    Accepts any ``[..., D]`` input (NHWC feature maps or ``[B, N, D]``
    tokens); leading dims are flattened into tokens, grouped, routed,
    and restored. Parameter surface: ``router_kernel [D, E]`` plus
    expert-stacked ``expert_fc1_kernel [E, D, H]``, ``expert_fc1_bias
    [E, H]``, ``expert_fc2_kernel [E, H, O]``, ``expert_fc2_bias
    [E, O]`` — the leading ``E`` axis is what expert parallelism shards
    (see ``parallel/expert.py``).
    """

    num_experts: int
    hidden_dim: int
    out_dim: Optional[int] = None
    capacity_factor: float = 1.25
    group_size: int = 256
    aux_loss_weight: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = x.shape[-1]
        out_dim = self.out_dim or d
        e, hid = self.num_experts, self.hidden_dim
        lead_shape = x.shape[:-1]

        tokens = x.reshape(-1, d)
        t = tokens.shape[0]
        g = min(self.group_size, t)
        pad = (-t) % g
        if pad:
            tokens = jnp.concatenate(
                [tokens, jnp.zeros((pad, d), tokens.dtype)], axis=0)
        xs = tokens.reshape(-1, g, d)  # [Z, G, D] groups
        cap = max(1, math.ceil(self.capacity_factor * g / e))

        # --- routing (f32 for a stable softmax/argmax) ---------------
        router = self.param("router_kernel", nn.initializers.lecun_normal(),
                            (d, e), jnp.float32)
        logits = jnp.einsum("zgd,de->zge", xs.astype(jnp.float32), router)
        probs = jax.nn.softmax(logits, axis=-1)
        gate = jnp.max(probs, axis=-1)                       # [Z, G]
        choice = jnp.argmax(probs, axis=-1)                  # [Z, G]
        onehot = jax.nn.one_hot(choice, e, dtype=jnp.float32)  # [Z, G, E]

        # position of each token within its expert's queue (1-based)
        pos = jnp.cumsum(onehot, axis=1) * onehot
        kept = onehot * (pos <= cap)                          # [Z, G, E]
        # slot one-hot over capacity; one_hot(-1) == 0 handles non-picks
        slot = jax.nn.one_hot((pos - 1.0).astype(jnp.int32), cap,
                              dtype=jnp.float32) * kept[..., None]
        # [Z, G, E, C] dispatch tensor; combine adds the gate probability
        combine = slot * gate[..., None, None]

        # Switch load-balancing loss: fraction routed x mean router prob
        if train and self.aux_loss_weight:
            f_e = jnp.mean(onehot, axis=1)                    # [Z, E]
            p_e = jnp.mean(probs, axis=1)                     # [Z, E]
            aux = e * jnp.mean(jnp.sum(f_e * p_e, axis=-1))
            self.sow("aux_loss", "switch_load_balance",
                     self.aux_loss_weight * aux)

        # --- expert FFNs: one stacked batched matmul on the MXU -------
        dt = self.dtype
        w1 = self.param("expert_fc1_kernel", nn.initializers.lecun_normal(),
                        (e, d, hid), jnp.float32)
        b1 = self.param("expert_fc1_bias", nn.initializers.zeros,
                        (e, hid), jnp.float32)
        w2 = self.param("expert_fc2_kernel", nn.initializers.lecun_normal(),
                        (e, hid, out_dim), jnp.float32)
        b2 = self.param("expert_fc2_bias", nn.initializers.zeros,
                        (e, out_dim), jnp.float32)

        expert_in = jnp.einsum("zgec,zgd->zecd", slot.astype(dt),
                               xs.astype(dt))                 # [Z, E, C, D]
        h = jnp.einsum("zecd,edh->zech", expert_in, w1.astype(dt))
        h = h + b1.astype(dt)[None, :, None, :]
        h = nn.gelu(h, approximate=False)
        out = jnp.einsum("zech,eho->zeco", h, w2.astype(dt))
        out = out + b2.astype(dt)[None, :, None, :]           # [Z, E, C, O]

        y = jnp.einsum("zgec,zeco->zgo", combine.astype(dt), out)
        y = y.reshape(-1, out_dim)
        if pad:
            y = y[:t]
        return y.reshape(*lead_shape, out_dim)
