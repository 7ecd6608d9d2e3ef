"""Train-mode fused axial attention: batch-stat BatchNorm, exact gradients.

The eval kernel (ops/pallas/axial_attention.py) folds BatchNorm into
host-side affine prescales because running statistics are constants.
Training BatchNorm's statistics are functions of the batch, so the fold
is re-staged as a two-pass forward plus a two-pass custom-VJP backward,
all VMEM-resident per grid step (ref train semantics:
unet_zoo/models/medt_net.py:88-109):

forward
  1. stats kernel: raw qk/qr/kr similarity moments (sum, sum-of-squares
     over (i, j)) per (term, group) -> XLA reduces over N into batch
     mean/var (biased, flax convention);
  2. fwd kernel: rebuild the similarity with the batch scale
     a = gamma * rsqrt(var + eps) folded in (BN *shifts* are constant
     over keys j, so softmax drops them: zero forward contribution AND
     zero gradient, because softmax-backward rows sum to zero), then
     softmax, then separate sv / sve outputs (output BN stays in XLA —
     it runs on length-sized tensors, not L x L maps).

backward (custom_vjp; mu/var outputs carry no gradient — they only
feed the running-stats update, which flax never differentiates)
  The BN input gradient is a*(dpre - xhat * S/M) with S = sum(dpre*xhat)
  over the whole channel (the mean term vanishes: softmax-backward rows
  sum to zero), so S is a global reduction that must complete before
  input gradients exist:
  B1: recompute sim/softmax/dpre per n; emit per-n S partials and the
      v-path gradients (d_v, accumulated d_v_emb) which need no BN
      correction;
  B2: with e = -a*S/M as a folded constant, dtot_c = a_c*dpre + e_c*xhat_c
      is the exact dL/d(raw term), contracted against the counterpart
      operand for d_q, d_k, d_qg, d_kg and the (grid-accumulated)
      d_q_emb, d_k_emb.

d_gamma = S; d_beta = 0 (exactly — see above). Layout contract follows
the eval kernel: per-n operands [N, cdim|gp, g, L]; embeddings
[cdim|gp, L, L]; per-channel constants ride a packed [4, 3, g, L]
f32 operand (rows: a, mu, rsqrt(var+eps), e) broadcast along L so
in-kernel use is a plain elementwise multiply.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_A, _MU, _INV, _E = 0, 1, 2, 3  # rows of the packed constants operand


def _sim_terms(q_ref, qg_ref, k_ref, kg_ref, qe_ref, keT_ref, cdim):
    """Raw (un-normalized) qk/qr/kr similarity maps, each [g, L, L] f32."""
    f32 = jnp.float32
    qk = (q_ref[0, 0].astype(f32)[:, :, None]
          * k_ref[0, 0].astype(f32)[:, None, :])
    for ci in range(1, cdim):
        qk += (q_ref[0, ci].astype(f32)[:, :, None]
               * k_ref[0, ci].astype(f32)[:, None, :])
    qr = (qg_ref[0, 0].astype(f32)[:, :, None]
          * qe_ref[0].astype(f32)[None, :, :])
    kr = (kg_ref[0, 0].astype(f32)[:, None, :]
          * keT_ref[0].astype(f32)[None, :, :])
    for ci in range(1, cdim):
        qr += (qg_ref[0, ci].astype(f32)[:, :, None]
               * qe_ref[ci].astype(f32)[None, :, :])
        kr += (kg_ref[0, ci].astype(f32)[:, None, :]
               * keT_ref[ci].astype(f32)[None, :, :])
    return qk, qr, kr


def _stats_kernel(q_ref, qg_ref, k_ref, kg_ref, qe_ref, keT_ref, out_ref,
                  *, cdim: int):
    # reduce over i only (axis 1) — the [g] full reduction is a rank-1
    # value Mosaic's layout inference rejects on real TPUs (layout.h
    # "arr.size() >= layout_rank" check); XLA reduces the remaining
    # (n, j) axes outside the kernel
    qk, qr, kr = _sim_terms(q_ref, qg_ref, k_ref, kg_ref, qe_ref, keT_ref,
                            cdim)
    for t, term in enumerate((qk, qr, kr)):
        out_ref[0, t] = jnp.sum(term, axis=1)                 # [g, L]
        out_ref[0, 3 + t] = jnp.sum(term * term, axis=1)


def _softmax_sim(qk, qr, kr, c_ref):
    """Batch-normalized (scale-only) sim + softmax over keys j."""
    a0 = c_ref[_A, 0][:, :, None]
    a1 = c_ref[_A, 1][:, :, None]
    # kr is BN'd per (term, g) — constant over i AND j, so indexing the
    # L-broadcast row on i is equally valid for the j-indexed kr term.
    a2 = c_ref[_A, 2][:, :, None]
    sim = qk * a0 + qr * a1 + kr * a2
    sim = sim - jnp.max(sim, axis=2, keepdims=True)
    sim = jnp.exp(sim)
    return sim / jnp.sum(sim, axis=2, keepdims=True)


def _fwd_kernel(q_ref, qg_ref, k_ref, kg_ref, v_ref, qe_ref, keT_ref,
                ve_ref, c_ref, out_ref, *, cdim: int, gp: int):
    qk, qr, kr = _sim_terms(q_ref, qg_ref, k_ref, kg_ref, qe_ref, keT_ref,
                            cdim)
    sim = _softmax_sim(qk, qr, kr, c_ref)
    f32 = jnp.float32
    for p in range(gp):
        sv = jnp.sum(sim * v_ref[0, p].astype(f32)[:, None, :], axis=2)
        sve = jnp.sum(sim * ve_ref[p].astype(f32)[None, :, :], axis=2)
        out_ref[0, p] = sv.astype(out_ref.dtype)
        out_ref[0, gp + p] = sve.astype(out_ref.dtype)


def _dpre(sim, v_ref, ve_ref, dsv_ref, dsve_ref, gp):
    """Softmax-backward: d(pre-softmax logits) [g, L, L] f32."""
    f32 = jnp.float32
    dsim = (v_ref[0, 0].astype(f32)[:, None, :]
            * dsv_ref[0, 0].astype(f32)[:, :, None])
    dsim += (ve_ref[0].astype(f32)[None, :, :]
             * dsve_ref[0, 0].astype(f32)[:, :, None])
    for p in range(1, gp):
        dsim += (v_ref[0, p].astype(f32)[:, None, :]
                 * dsv_ref[0, p].astype(f32)[:, :, None])
        dsim += (ve_ref[p].astype(f32)[None, :, :]
                 * dsve_ref[0, p].astype(f32)[:, :, None])
    return sim * (dsim - jnp.sum(dsim * sim, axis=2, keepdims=True))


def _xhat(term, t, c_ref):
    return (term - c_ref[_MU, t][:, :, None]) * c_ref[_INV, t][:, :, None]


def _bwd1_kernel(q_ref, qg_ref, k_ref, kg_ref, v_ref, qe_ref, keT_ref,
                 ve_ref, dsv_ref, dsve_ref, c_ref,
                 s_ref, dv_ref, dve_ref, *, cdim: int, gp: int):
    n = pl.program_id(0)
    qk, qr, kr = _sim_terms(q_ref, qg_ref, k_ref, kg_ref, qe_ref, keT_ref,
                            cdim)
    sim = _softmax_sim(qk, qr, kr, c_ref)
    dpre = _dpre(sim, v_ref, ve_ref, dsv_ref, dsve_ref, gp)

    for t, term in enumerate((qk, qr, kr)):
        # rank-2 partial (see _stats_kernel); XLA finishes the (n, j) sum
        s_ref[0, t] = jnp.sum(dpre * _xhat(term, t, c_ref), axis=1)

    f32 = jnp.float32
    @pl.when(n == 0)
    def _init():
        dve_ref[:] = jnp.zeros_like(dve_ref)

    for p in range(gp):
        dv = jnp.sum(sim * dsv_ref[0, p].astype(f32)[:, :, None], axis=1)
        dv_ref[0, p] = dv.astype(dv_ref.dtype)
        dve = jnp.sum(sim * dsve_ref[0, p].astype(f32)[:, :, None], axis=0)
        dve_ref[p] = dve_ref[p] + dve


def _bwd2_kernel(q_ref, qg_ref, k_ref, kg_ref, v_ref, qe_ref, keT_ref,
                 ve_ref, dsv_ref, dsve_ref, c_ref,
                 dq_ref, dk_ref, dqg_ref, dkg_ref, dqe_ref, dke_ref,
                 *, cdim: int, gp: int):
    n = pl.program_id(0)
    qk, qr, kr = _sim_terms(q_ref, qg_ref, k_ref, kg_ref, qe_ref, keT_ref,
                            cdim)
    sim = _softmax_sim(qk, qr, kr, c_ref)
    dpre = _dpre(sim, v_ref, ve_ref, dsv_ref, dsve_ref, gp)

    def dtot(term, t):
        return (dpre * c_ref[_A, t][:, :, None]
                + _xhat(term, t, c_ref) * c_ref[_E, t][:, :, None])

    d_qk = dtot(qk, 0)
    d_qr = dtot(qr, 1)
    d_kr = dtot(kr, 2)

    @pl.when(n == 0)
    def _init():
        dqe_ref[:] = jnp.zeros_like(dqe_ref)
        dke_ref[:] = jnp.zeros_like(dke_ref)

    f32 = jnp.float32
    for ci in range(cdim):
        kc = k_ref[0, ci].astype(f32)
        qc = q_ref[0, ci].astype(f32)
        qgc = qg_ref[0, ci].astype(f32)
        kgc = kg_ref[0, ci].astype(f32)
        dq_ref[0, ci] = jnp.sum(d_qk * kc[:, None, :],
                                axis=2).astype(dq_ref.dtype)
        dk_ref[0, ci] = jnp.sum(d_qk * qc[:, :, None],
                                axis=1).astype(dk_ref.dtype)
        dqg_ref[0, ci] = jnp.sum(d_qr * qe_ref[ci].astype(f32)[None],
                                 axis=2).astype(dqg_ref.dtype)
        dkg_ref[0, ci] = jnp.sum(d_kr * keT_ref[ci].astype(f32)[None],
                                 axis=1).astype(dkg_ref.dtype)
        dqe_ref[ci] = dqe_ref[ci] + jnp.sum(d_qr * qgc[:, :, None], axis=0)
        dke_ref[ci] = dke_ref[ci] + jnp.sum(d_kr * kgc[:, None, :], axis=0)


def _specs(n, cdim, gp, groups, length):
    pn = lambda mid: pl.BlockSpec((1, mid, groups, length),
                                  lambda i: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pn, const


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_axial_train(q, k, qg, kg, v, qe, keT, ve, gamma,
                      eps: float = 1e-5, interpret: bool = False):
    """Batch-stat axial attention core: (sv, sve, mu, var).

    q, k, qg, kg: [N, L, g, cdim] (qg/kg carry the gated-mode f_qr/f_kr
    prescales; pass q/k for base mode). v: [N, L, g, gp].
    qe: [cdim, L, L]; keT: [cdim, L, L] (k_emb pre-transposed to (i, j));
    ve: [gp, L, L]. gamma: [3, g] bn_similarity scale. Returns sv, sve
    [N, L, g, gp] and the biased batch moments mu, var [3, g] for the
    caller's running-stats update. BN shifts never enter (softmax
    shift-invariance; their gradient is exactly zero).
    """
    out, _ = _fwd(q, k, qg, kg, v, qe, keT, ve, gamma, eps, interpret)
    return out


def _moments(q, k, qg, kg, qe, keT, eps, interpret):
    n, length, groups, cdim = q.shape
    tcl = lambda a: a.transpose(0, 3, 2, 1).astype(jnp.float32)
    pn, const = _specs(n, cdim, None, groups, length)
    sums = pl.pallas_call(
        functools.partial(_stats_kernel, cdim=cdim),
        grid=(n,),
        in_specs=[pn(cdim)] * 4 + [const(qe.shape), const(keT.shape)],
        out_specs=pl.BlockSpec((1, 6, groups, length),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 6, groups, length), jnp.float32),
        interpret=interpret,
    )(tcl(q), tcl(qg), tcl(k), tcl(kg), qe.astype(jnp.float32),
      keT.astype(jnp.float32))
    m = float(n * length * length)
    tot = jnp.sum(sums, axis=(0, 3))                # [6, g]
    mu = tot[:3] / m
    var = tot[3:] / m - mu * mu
    return mu, var, m


def _pack_consts(gamma, mu, var, e, eps, groups, length):
    a = gamma * jax.lax.rsqrt(var + eps)            # [3, g]
    inv = jax.lax.rsqrt(var + eps)
    packed = jnp.stack([a, mu, inv, e])             # [4, 3, g]
    return jnp.broadcast_to(packed[..., None],
                            (4, 3, groups, length)).astype(jnp.float32), a


def _fwd(q, k, qg, kg, v, qe, keT, ve, gamma, eps, interpret):
    n, length, groups, cdim = q.shape
    gp = v.shape[-1]
    mu, var, _ = _moments(q, k, qg, kg, qe, keT, eps, interpret)
    consts, _ = _pack_consts(gamma, mu, var, jnp.zeros_like(mu), eps,
                             groups, length)
    tcl = lambda a: a.transpose(0, 3, 2, 1).astype(jnp.float32)
    pn, const = _specs(n, cdim, gp, groups, length)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cdim=cdim, gp=gp),
        grid=(n,),
        in_specs=[pn(cdim)] * 4 + [pn(gp)]
        + [const(qe.shape), const(keT.shape), const(ve.shape),
           const(consts.shape)],
        out_specs=pn(2 * gp),
        out_shape=jax.ShapeDtypeStruct((n, 2 * gp, groups, length),
                                       jnp.float32),
        interpret=interpret,
    )(tcl(q), tcl(qg), tcl(k), tcl(kg), tcl(v), qe.astype(jnp.float32),
      keT.astype(jnp.float32), ve.astype(jnp.float32), consts)
    # [N, 2gp, g, L] -> two [N, L, g, gp]
    sv = out[:, :gp].transpose(0, 3, 2, 1).astype(q.dtype)
    sve = out[:, gp:].transpose(0, 3, 2, 1).astype(q.dtype)
    res = (q, k, qg, kg, v, qe, keT, ve, gamma, mu, var)
    return (sv, sve, mu, var), res


def _bwd(eps, interpret, res, cts):
    q, k, qg, kg, v, qe, keT, ve, gamma, mu, var = res
    d_sv, d_sve, _d_mu, _d_var = cts  # moments feed running stats: no grad
    n, length, groups, cdim = q.shape
    gp = v.shape[-1]
    m = float(n * length * length)

    tcl = lambda a: a.transpose(0, 3, 2, 1).astype(jnp.float32)
    pn, const = _specs(n, cdim, gp, groups, length)
    qef = qe.astype(jnp.float32)
    keTf = keT.astype(jnp.float32)
    vef = ve.astype(jnp.float32)
    ops = (tcl(q), tcl(qg), tcl(k), tcl(kg), tcl(v), qef, keTf, vef,
           tcl(d_sv), tcl(d_sve))
    in_specs = ([pn(cdim)] * 4 + [pn(gp)]
                + [const(qe.shape), const(keT.shape), const(ve.shape)]
                + [pn(gp), pn(gp)])

    consts0, a = _pack_consts(gamma, mu, var, jnp.zeros_like(mu), eps,
                              groups, length)
    s_part, d_v, d_ve = pl.pallas_call(
        functools.partial(_bwd1_kernel, cdim=cdim, gp=gp),
        grid=(n,),
        in_specs=in_specs + [const(consts0.shape)],
        out_specs=(
            pl.BlockSpec((1, 3, groups, length), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pn(gp),
            const(ve.shape),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 3, groups, length), jnp.float32),
            jax.ShapeDtypeStruct((n, gp, groups, length), jnp.float32),
            jax.ShapeDtypeStruct(ve.shape, jnp.float32),
        ),
        interpret=interpret,
    )(*ops, consts0)

    s = jnp.sum(s_part, axis=(0, 3))                # [3, g]
    e = -(a * s) / m
    consts, _ = _pack_consts(gamma, mu, var, e, eps, groups, length)

    grads = pl.pallas_call(
        functools.partial(_bwd2_kernel, cdim=cdim, gp=gp),
        grid=(n,),
        in_specs=in_specs + [const(consts.shape)],
        out_specs=(pn(cdim), pn(cdim), pn(cdim), pn(cdim),
                   const(qe.shape), const(keT.shape)),
        out_shape=(
            jax.ShapeDtypeStruct((n, cdim, groups, length), jnp.float32),
            jax.ShapeDtypeStruct((n, cdim, groups, length), jnp.float32),
            jax.ShapeDtypeStruct((n, cdim, groups, length), jnp.float32),
            jax.ShapeDtypeStruct((n, cdim, groups, length), jnp.float32),
            jax.ShapeDtypeStruct(qe.shape, jnp.float32),
            jax.ShapeDtypeStruct(keT.shape, jnp.float32),
        ),
        interpret=interpret,
    )(*ops, consts)
    d_qn, d_kn, d_qgn, d_kgn, d_qe, d_keT = grads

    ucl = lambda a_, ref: a_.transpose(0, 3, 2, 1).astype(ref.dtype)
    d_gamma = s.astype(gamma.dtype)
    return (ucl(d_qn, q), ucl(d_kn, k), ucl(d_qgn, qg), ucl(d_kgn, kg),
            ucl(d_v.astype(jnp.float32), v),
            d_qe.astype(qe.dtype), d_keT.astype(keT.dtype),
            d_ve.astype(ve.dtype), d_gamma)


def _fwd_rule(q, k, qg, kg, v, qe, keT, ve, gamma, eps, interpret):
    return _fwd(q, k, qg, kg, v, qe, keT, ve, gamma, eps, interpret)


fused_axial_train.defvjp(_fwd_rule, _bwd)
