"""Fused SwinV2 window attention (Pallas TPU kernel).

Fuses the whole V2 attention chain — cosine similarity
(q·k / max(|q||k|, 1e-6)), learnable tau divisor (clipped at 0.01),
log-CPB relative position bias, optional shift mask, softmax, and the
PV contraction — into a single VMEM-resident kernel. The XLA path
materializes several [B*nW, heads, N, N] intermediates in HBM; here they
never leave VMEM.

Each grid program processes a block of ``wb`` windows x all heads (one
window per program starves the MXU/VPU: window tensors are [heads, 64, 32]
-ish). ``wb`` is chosen so nW % wb == 0 (mask slices stay contiguous) and
the working set fits VMEM.

Used by SwinUNetV2 when ``use_pallas=True`` (eval path / attn_drop=0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _make_kernel(wb: int, broadcast_mask: bool):
    def kernel(q_ref, k_ref, v_ref, tau_ref, bias_ref, mask_ref, o_ref):
        wb_, nh, n, hd = q_ref.shape
        # collapse (window, head) into the single batch dim Mosaic supports;
        # leading-dim reshapes are free (no lane/sublane movement)
        q = q_ref[:].astype(jnp.float32).reshape(wb_ * nh, n, hd)
        k = k_ref[:].astype(jnp.float32).reshape(wb_ * nh, n, hd)
        v = v_ref[:].astype(jnp.float32).reshape(wb_ * nh, n, hd)

        dots = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # [wb*nh, N, N]
        qn = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
        kn = jnp.sqrt(jnp.sum(k * k, axis=-1, keepdims=True))
        denom = jnp.maximum(qn * jnp.swapaxes(kn, 1, 2), 1e-6)
        attn = dots / denom

        tau = jnp.clip(tau_ref[:].astype(jnp.float32), 0.01, None)
        bias = bias_ref[:].astype(jnp.float32)
        attn = attn.reshape(wb_, nh, n, n)
        attn = attn / tau[None] + bias[None]
        if broadcast_mask:
            attn = attn + mask_ref[0].astype(jnp.float32)[None, None]
        else:
            attn = attn + mask_ref[:].astype(jnp.float32)[:, None]
        attn = attn.reshape(wb_ * nh, n, n)

        attn = attn - jnp.max(attn, axis=-1, keepdims=True)
        attn = jnp.exp(attn)
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)

        o = jax.lax.dot_general(
            attn, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # [wb*nh, N, hd]
        o_ref[:] = o.reshape(wb_, nh, n, hd).astype(o_ref.dtype)

    return kernel


def _pick_window_block(b_: int, nw: int, nh: int, n: int, hd: int) -> int:
    """Largest wb with nw % wb == 0 (or nw == 1), b_ % wb == 0 and a
    bounded VMEM working set (scoped-vmem is hard-capped at 16MB; leave
    generous headroom for compiler temporaries and double buffering)."""
    budget = 4 * 1024 * 1024
    per_window = (4 * nh * n * hd + 2 * nh * n * n) * 4
    cap = max(1, budget // max(per_window, 1))
    for wb in (32, 16, 8, 4, 2, 1):
        if wb <= cap and b_ % wb == 0 and (nw == 1 or nw % wb == 0):
            return wb
    return 1


def swin_window_attention(q, k, v, tau, bias, mask, *, interpret=None):
    """Fused SwinV2 window attention.

    q, k, v: [B_, nh, N, hd] (B_ = batch * num_windows, N = window tokens)
    tau:     [nh, N, N] learnable temperature (clipped at 0.01)
    bias:    [nh, N, N] continuous relative position bias
    mask:    [nW, N, N] shift mask (zeros for unshifted), nW divides B_
    returns  [B_, nh, N, hd]

    ``interpret=None`` auto-selects: compiled on TPU, interpreter elsewhere
    (so CPU tests exercise the same kernel).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b_, nh, n, hd = q.shape
    nw = mask.shape[0]
    wb = _pick_window_block(b_, nw, nh, n, hd)
    broadcast_mask = nw == 1

    spec_qkv = pl.BlockSpec((wb, nh, n, hd), lambda i: (i, 0, 0, 0))
    spec_hnn = pl.BlockSpec((nh, n, n), lambda i: (0, 0, 0))
    if broadcast_mask:
        spec_mask = pl.BlockSpec((1, n, n), lambda i: (0, 0, 0))
    else:
        nblk = nw // wb
        spec_mask = pl.BlockSpec((wb, n, n), lambda i: (i % nblk, 0, 0))

    return pl.pallas_call(
        _make_kernel(wb, broadcast_mask),
        grid=(b_ // wb,),
        in_specs=[spec_qkv, spec_qkv, spec_qkv, spec_hnn, spec_hnn, spec_mask],
        out_specs=spec_qkv,
        out_shape=jax.ShapeDtypeStruct((b_, nh, n, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, tau, bias, mask)


def swin_window_attention_reference(q, k, v, tau, bias, mask):
    """Pure-XLA reference of the same computation (for tests/fallback)."""
    nw = mask.shape[0]
    b_, nh, n, hd = q.shape
    q32, k32, v32 = (t.astype(jnp.float32) for t in (q, k, v))
    dots = jnp.einsum("bhqd,bhkd->bhqk", q32, k32)
    qn = jnp.linalg.norm(q32, axis=-1)[..., :, None]
    kn = jnp.linalg.norm(k32, axis=-1)[..., None, :]
    attn = dots / jnp.maximum(qn * kn, 1e-6)
    attn = attn / jnp.clip(tau[None].astype(jnp.float32), 0.01, None)
    attn = attn + bias[None].astype(jnp.float32)
    attn = attn.reshape(b_ // nw, nw, nh, n, n) + mask.astype(jnp.float32)[None, :, None]
    attn = attn.reshape(b_, nh, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v32).astype(q.dtype)
