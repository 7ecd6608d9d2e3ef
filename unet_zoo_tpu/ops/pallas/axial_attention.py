"""Fused axial attention (MedT family) as a Pallas TPU kernel.

The reference's axial attention (ref: unet_zoo/models/medt_net.py:50-123)
expands into seven+ HBM-round-trip tensors of shape [B*W, L, L, g]
(qk/qr/kr outer products, BN'd concat, softmax, sv/sve) whose contraction
dims are tiny (1-8), so XLA executes it bandwidth-bound. This kernel keeps
every [L, L] intermediate in VMEM: HBM traffic drops to the q/k/v loads
and the output store.

Eval-mode only: BatchNorm with running statistics is an affine transform,
so the caller folds BN (and the 'gated' variant's learnable scalar gates)
into per-channel scale/shift vectors. Training keeps the XLA path (batch
statistics need cross-block reductions).

Semantics match models/medt_net.py::AxialAttention exactly:
    qk[i,j,g] = sum_c q[i,g,c] k[j,g,c]
    qr[i,j,g] = sum_c q[i,g,c] q_emb[c,i,j]
    kr[i,j,g] = sum_c k[j,g,c] k_emb[c,j,i]
    sim = softmax_j(affine(qk) + affine(qr) + affine(kr))
    sv[i,g,p]  = sum_j sim[i,j,g] v[j,g,p]
    sve[i,g,p] = sum_j sim[i,j,g] v_emb[p,i,j]
    out = affine(sv) + affine(sve)        # [N, L, g*p]
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, qe_ref, ke_ref, ve_ref, ssc_ref, ssh_ref,
            osc_ref, osh_ref, out_ref, *, nb: int, length: int, groups: int,
            cdim: int, gp: int, wopos: bool):
    f32 = jnp.float32

    def one_n(n, _):
        for gi in range(groups):
            q = q_ref[n, :, gi, :].astype(f32)          # [L, c]
            k = k_ref[n, :, gi, :].astype(f32)          # [L, c]
            v = v_ref[n, :, gi, :].astype(f32)          # [L, gp]

            qk = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)             # [L(i), L(j)]
            sim = qk * ssc_ref[0, gi] + ssh_ref[0, gi]
            if not wopos:
                qe = qe_ref[:].astype(f32)              # [c, L, L]
                ke = ke_ref[:].astype(f32)
                # qr[i,j] = sum_c q[i,c] * q_emb[c,i,j]
                qr = jnp.sum(q.T[:, :, None] * qe, axis=0)
                # kr[i,j] = sum_c k[j,c] * k_emb[c,j,i]
                krT = jnp.sum(k.T[:, :, None] * ke, axis=0)  # [j, i]
                sim = (sim + qr * ssc_ref[1, gi] + ssh_ref[1, gi]
                       + krT.T * ssc_ref[2, gi] + ssh_ref[2, gi])

            sim = sim - jnp.max(sim, axis=1, keepdims=True)
            sim = jnp.exp(sim)
            sim = sim / jnp.sum(sim, axis=1, keepdims=True)

            sv = jax.lax.dot_general(
                sim, v, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)             # [L, gp]
            out = sv * osc_ref[0, gi, :] + osh_ref[0, gi, :]
            if not wopos:
                ve = ve_ref[:].astype(f32)              # [gp, L, L]
                # sve[i,p] = sum_j sim[i,j] * v_emb[p,i,j]
                sve = jnp.sum(ve * sim[None, :, :], axis=2).T
                out = out + sve * osc_ref[1, gi, :] + osh_ref[1, gi, :]

            out_ref[n, :, gi, :] = out.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nb, one_n, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("wopos", "interpret", "nb"))
def fused_axial_attention(
    q: jnp.ndarray,               # [N, L, g, c]
    k: jnp.ndarray,               # [N, L, g, c]
    v: jnp.ndarray,               # [N, L, g, gp]
    q_emb: Optional[jnp.ndarray],  # [c, L, L]
    k_emb: Optional[jnp.ndarray],  # [c, L, L]
    v_emb: Optional[jnp.ndarray],  # [gp, L, L]
    sim_scale: jnp.ndarray,       # [3, g] (rows: qk, qr, kr)
    sim_shift: jnp.ndarray,       # [3, g]
    out_scale: jnp.ndarray,       # [2, g, gp] (rows: sv, sve)
    out_shift: jnp.ndarray,       # [2, g, gp]
    wopos: bool = False,
    nb: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    n, length, groups, cdim = q.shape
    gp = v.shape[-1]
    while n % nb:
        nb //= 2
    nb = max(nb, 1)

    f32 = jnp.float32
    if wopos:
        # placeholder refs (never read) keep one kernel signature
        q_emb = jnp.zeros((1, 1, 1), f32)
        k_emb = jnp.zeros((1, 1, 1), f32)
        v_emb = jnp.zeros((1, 1, 1), f32)

    kernel = functools.partial(
        _kernel, nb=nb, length=length, groups=groups, cdim=cdim, gp=gp,
        wopos=wopos)

    grid = (n // nb,)
    bspec = lambda shape: pl.BlockSpec(
        (nb,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    const = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            bspec(q.shape[1:]),
            bspec(k.shape[1:]),
            bspec(v.shape[1:]),
            const(q_emb), const(k_emb), const(v_emb),
            const(sim_scale), const(sim_shift),
            const(out_scale), const(out_shift),
        ],
        out_specs=bspec((length, groups, gp)),
        out_shape=jax.ShapeDtypeStruct((n, length, groups, gp), q.dtype),
        interpret=interpret,
    )(q, k, v, q_emb.astype(f32), k_emb.astype(f32), v_emb.astype(f32),
      sim_scale.astype(f32), sim_shift.astype(f32),
      out_scale.astype(f32), out_shift.astype(f32))
    return out.reshape(n, length, groups * gp)


def fold_bn_eval(scale, bias, mean, var, eps: float = 1e-5
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BN with running stats → (a, b) such that BN(x) = x*a + b."""
    a = scale * jax.lax.rsqrt(var + eps)
    return a, bias - mean * a
