"""MedT axial-attention family (TPU-native rebuild of ref: unet_zoo/models/medt_net.py).

Axial attention factorizes 2D attention into 1D row/col passes with
relative position embeddings entering through a 5-way interaction: qk, qr,
kr similarity terms BatchNorm'd jointly (BN over the similarity logits is
the family's unusual signature, ref :101-103), and sv/sve output terms
BatchNorm'd pairwise (ref :108-109). Variants:

* ``base``  — AxialAttention (ref :50-123), used by ``axialunet``
* ``gated`` — AxialAttention_dynamic with learnable scalar gates
  f_qr/f_kr/f_sv/f_sve (ref :125-209), used by ``gated`` and ``logo``
* ``wopos`` — position-free (ref :211-267), used by ``medt``

Registry quirk reproduced: the reference wires ``logo`` identically to
``gated`` (ref :731-749). The true LoGo dual-branch class ``medt_net``
(ref :510-664) — dead code in the reference (no factory instantiates it)
— is reproduced here as :class:`MedTLoGo` and exposed as the superset
registry entry ``medt_logo``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from unet_zoo_tpu.nn import BatchNorm
from unet_zoo_tpu.ops import avg_pool2d, resize_bilinear


@functools.lru_cache(maxsize=None)
def _relative_index(kernel_size: int) -> np.ndarray:
    q = np.arange(kernel_size)[None, :]
    k = np.arange(kernel_size)[:, None]
    return (k - q + kernel_size - 1).reshape(-1)


class _FoldedBN(nn.Module):
    """Declares the exact variable tree of nn.BatchNorm (params scale/bias,
    batch_stats mean/var) and returns them for host-side folding — used by
    the fused Pallas eval path so checkpoints/converters see an identical
    parameter surface to the XLA path."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean.value, var.value


class _TrainBN(nn.Module):
    """nn.BatchNorm's exact variable tree with split read/update methods,
    for the fused *train* path: the batch moments only exist after the
    Pallas stats pass runs, so the running-stats update must happen in a
    second method call (flax BatchNorm fuses both into one __call__).
    Update matches flax: momentum 0.9, biased batch variance, f32."""

    features: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.features,), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
        self.mean = self.variable("batch_stats", "mean",
                                  lambda: jnp.zeros((self.features,),
                                                    jnp.float32))
        self.var = self.variable("batch_stats", "var",
                                 lambda: jnp.ones((self.features,),
                                                  jnp.float32))

    def read_scale(self):
        return self.scale

    def update(self, batch_mean, batch_var):
        if not self.is_initializing():
            self.mean.value = (0.9 * self.mean.value
                               + 0.1 * batch_mean.astype(jnp.float32))
            self.var.value = (0.9 * self.var.value
                              + 0.1 * batch_var.astype(jnp.float32))


class AxialAttention(nn.Module):
    """One-axis attention (ref :50-123 / :125-209 / :211-267).

    ``use_pallas`` routes eval-mode forwards through the fused VMEM
    kernel (ops/pallas/axial_attention.py) — BN running stats and the
    gated variant's scalar gates fold into affine scale/shift (measured
    1.66x on `gated` at b32/256px v5e). Default (None) = auto: on for
    TPU backends, off on CPU (tests/parity take the XLA path). Training
    auto-uses the XLA path: the fused train kernel (exact custom-VJP,
    ops/pallas/axial_train.py) measured 0.78x vs XLA in-model (gated
    train b16 256px v5e) — explicit ``use_pallas=True`` still routes
    training through it (parity tests, future hardware)."""

    out_planes: int
    groups: int = 8
    kernel_size: int = 56
    stride: int = 1
    width_axis: bool = False
    mode: str = "base"  # 'base' | 'gated' | 'wopos'
    use_pallas: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        b, h, w, c_in = x.shape
        g = self.groups
        gp = self.out_planes // g
        ks = self.kernel_size

        if self.width_axis:
            tokens = x.reshape(b * h, w, c_in)
            length = w
        else:
            tokens = x.transpose(0, 2, 1, 3).reshape(b * w, h, c_in)
            length = h

        # qkv 1x1 conv + BN over channels (ref :64-66)
        qkv_init = nn.initializers.normal(np.sqrt(1.0 / c_in))
        qkv = nn.Dense(self.out_planes * 2, use_bias=False, kernel_init=qkv_init,
                       dtype=dt, name="qkv")(tokens)
        qkv = BatchNorm(train, dt, name="bn_qkv")(qkv)
        qkv = qkv.reshape(-1, length, g, gp * 2)
        q = qkv[..., : gp // 2]
        k = qkv[..., gp // 2 : gp]
        v = qkv[..., gp:]

        use_pallas = self.use_pallas
        if use_pallas is None:
            # auto: fused kernel on TPU for the positional variants
            # (measured 1.54-1.66x); wopos has too little work per step
            # to beat XLA (0.83x). Only TPU lowers the Mosaic kernel —
            # every other backend (cpu, gpu, ...) takes the XLA path.
            import jax

            use_pallas = (jax.default_backend() == "tpu"
                          and self.mode != "wopos")
        if use_pallas and not train:
            out = self._fused_path(q, k, v, length, g, gp, ks)
            out = out.astype(dt)
            if self.width_axis:
                out = out.reshape(b, h, w, self.out_planes)
            else:
                out = out.reshape(b, w, h, self.out_planes).transpose(0, 2, 1, 3)
            if self.stride > 1:
                out = avg_pool2d(out, self.stride, self.stride)
            return out

        if (self.use_pallas is True and train and self.mode != "wopos"
                and length <= 128 and not self.is_initializing()):
            # fused train path: batch-stat BN with exact custom-VJP
            # gradients (ops/pallas/axial_train.py); output BN + gates
            # run in XLA below on length-sized tensors. Explicit opt-in
            # only — measured SLOWER than XLA in-model (gated train b16
            # 256px v5e: 29.8 img/s fused vs 38.4 XLA): the two-pass
            # stats + two-pass VJP recompute the L x L sim maps 4x on
            # the VPU (cdim 1-2 outer products, no MXU work to win),
            # while XLA materializes them once. BENCH_NOTES round 3.
            out = self._fused_train_path(q, k, v, length, g, gp, ks)
        elif self.mode == "wopos":
            sim = jnp.einsum("bigc,bjgc->bijg", q, k)
            sim = BatchNorm(train, dt, name="bn_similarity")(sim)
            sim = nn.softmax(sim, axis=2)  # over keys j
            sv = jnp.einsum("bijg,bjgc->bigc", sim, v)
            sv = sv.reshape(-1, length, self.out_planes)
            out = BatchNorm(train, dt, name="bn_output")(sv)
        else:
            rel_init = nn.initializers.normal(np.sqrt(1.0 / gp))
            relative = self.param("relative", rel_init,
                                  (gp * 2, 2 * ks - 1), jnp.float32)
            emb = relative[:, jnp.asarray(_relative_index(ks))]
            emb = emb.reshape(gp * 2, ks, ks).astype(dt)
            q_emb = emb[: gp // 2]
            k_emb = emb[gp // 2 : gp]
            v_emb = emb[gp:]

            qr = jnp.einsum("bigc,cij->bijg", q, q_emb[:, :length, :length])
            kr = jnp.einsum("bjgc,cji->bijg", k, k_emb[:, :length, :length])
            qk = jnp.einsum("bigc,bjgc->bijg", q, k)

            if self.mode == "gated":
                f_qr = self.param("f_qr", nn.initializers.constant(0.1), ())
                f_kr = self.param("f_kr", nn.initializers.constant(0.1), ())
                qr = qr * f_qr.astype(dt)
                kr = kr * f_kr.astype(dt)

            # BN over the 3*g similarity channels, then sum the 3 terms
            stacked = jnp.concatenate([qk, qr, kr], axis=-1)  # [b,i,j,3g]
            stacked = BatchNorm(train, dt, name="bn_similarity")(stacked)
            sim = stacked.reshape(-1, length, length, 3, g).sum(axis=3)
            sim = nn.softmax(sim, axis=2)

            sv = jnp.einsum("bijg,bjgc->bigc", sim, v)
            sve = jnp.einsum("bijg,cij->bigc", sim, v_emb[:, :length, :length])
            if self.mode == "gated":
                f_sv = self.param("f_sv", nn.initializers.constant(1.0), ())
                f_sve = self.param("f_sve", nn.initializers.constant(0.1), ())
                sv = sv * f_sv.astype(dt)
                sve = sve * f_sve.astype(dt)

            # pairwise (sv, sve) channel interleave then BN then sum (ref :108-109)
            paired = jnp.stack([sv, sve], axis=-1)  # [b,i,g,gp,2]
            paired = paired.reshape(-1, length, self.out_planes * 2)
            paired = BatchNorm(train, dt, name="bn_output")(paired)
            out = paired.reshape(-1, length, g, gp, 2).sum(axis=-1)
            out = out.reshape(-1, length, self.out_planes)

        if self.width_axis:
            out = out.reshape(b, h, w, self.out_planes)
        else:
            out = out.reshape(b, w, h, self.out_planes).transpose(0, 2, 1, 3)
        if self.stride > 1:
            out = avg_pool2d(out, self.stride, self.stride)
        return out

    def _fused_path(self, q, k, v, length, g, gp, ks):
        """Eval-only fused kernel path: declare the same parameter surface
        as the XLA branch, fold BN/gates into affines, call the kernel."""
        import jax

        from unet_zoo_tpu.ops.pallas.axial_attention import (
            fold_bn_eval,
            fused_axial_attention,
        )

        interpret = jax.default_backend() != "tpu"
        wopos = self.mode == "wopos"
        if wopos:
            s_sc, s_bi, s_mu, s_va = _FoldedBN(g, name="bn_similarity")()
            a_s, b_s = fold_bn_eval(s_sc, s_bi, s_mu, s_va)
            zeros = jnp.zeros_like(a_s)
            sim_scale = jnp.stack([a_s, zeros, zeros])
            sim_shift = jnp.stack([b_s, zeros, zeros])
            o_sc, o_bi, o_mu, o_va = _FoldedBN(self.out_planes,
                                               name="bn_output")()
            a_o, b_o = fold_bn_eval(o_sc, o_bi, o_mu, o_va)
            zeros2 = jnp.zeros((g, gp), jnp.float32)
            out_scale = jnp.stack([a_o.reshape(g, gp), zeros2])
            out_shift = jnp.stack([b_o.reshape(g, gp), zeros2])
            q_emb = k_emb = v_emb = None
        else:
            rel_init = nn.initializers.normal(np.sqrt(1.0 / gp))
            relative = self.param("relative", rel_init,
                                  (gp * 2, 2 * ks - 1), jnp.float32)
            emb = relative[:, jnp.asarray(_relative_index(ks))]
            emb = emb.reshape(gp * 2, ks, ks)
            q_emb = emb[: gp // 2, :length, :length]
            k_emb = emb[gp // 2 : gp, :length, :length]
            v_emb = emb[gp:, :length, :length]
            s_sc, s_bi, s_mu, s_va = _FoldedBN(3 * g, name="bn_similarity")()
            a_s, b_s = fold_bn_eval(s_sc, s_bi, s_mu, s_va)
            sim_scale = a_s.reshape(3, g)
            sim_shift = b_s.reshape(3, g)
            o_sc, o_bi, o_mu, o_va = _FoldedBN(self.out_planes * 2,
                                               name="bn_output")()
            a_o, b_o = fold_bn_eval(o_sc, o_bi, o_mu, o_va)
            # paired channel layout is (g, gp, 2) — rows: (sv, sve)
            out_scale = jnp.moveaxis(a_o.reshape(g, gp, 2), -1, 0)
            out_shift = jnp.moveaxis(b_o.reshape(g, gp, 2), -1, 0)
            if self.mode == "gated":
                f_qr = self.param("f_qr", nn.initializers.constant(0.1), ())
                f_kr = self.param("f_kr", nn.initializers.constant(0.1), ())
                f_sv = self.param("f_sv", nn.initializers.constant(1.0), ())
                f_sve = self.param("f_sve", nn.initializers.constant(0.1), ())
                sim_scale = sim_scale.at[1].mul(f_qr).at[2].mul(f_kr)
                out_scale = out_scale.at[0].mul(f_sv).at[1].mul(f_sve)
        return fused_axial_attention(
            q, k, v, q_emb, k_emb, v_emb, sim_scale, sim_shift,
            out_scale, out_shift, wopos=wopos, interpret=interpret)


    def _fused_train_path(self, q, k, v, length, g, gp, ks):
        """Train-mode fused kernel path (positional modes). Declares the
        same parameter surface as the XLA branch; bn_similarity's batch
        moments come back from the stats pass and update the running
        stats with flax semantics. Output BN stays in XLA."""
        import jax

        from unet_zoo_tpu.ops.pallas.axial_train import fused_axial_train

        dt = self.dtype
        interpret = jax.default_backend() != "tpu"
        rel_init = nn.initializers.normal(np.sqrt(1.0 / gp))
        relative = self.param("relative", rel_init,
                              (gp * 2, 2 * ks - 1), jnp.float32)
        emb = relative[:, jnp.asarray(_relative_index(ks))]
        emb = emb.reshape(gp * 2, ks, ks).astype(dt)
        q_emb = emb[: gp // 2, :length, :length]
        k_emb = emb[gp // 2 : gp, :length, :length]
        v_emb = emb[gp:, :length, :length]
        keT = k_emb.transpose(0, 2, 1)

        if self.mode == "gated":
            f_qr = self.param("f_qr", nn.initializers.constant(0.1), ())
            f_kr = self.param("f_kr", nn.initializers.constant(0.1), ())
            qg = q * f_qr.astype(dt)
            kg = k * f_kr.astype(dt)
        else:
            qg, kg = q, k

        bn_sim = _TrainBN(3 * g, name="bn_similarity")
        gamma = bn_sim.read_scale().reshape(3, g)
        sv, sve, mu, var = fused_axial_train(
            q, k, qg, kg, v, q_emb, keT, v_emb, gamma, 1e-5, interpret)
        bn_sim.update(mu.reshape(-1), var.reshape(-1))

        if self.mode == "gated":
            f_sv = self.param("f_sv", nn.initializers.constant(1.0), ())
            f_sve = self.param("f_sve", nn.initializers.constant(0.1), ())
            sv = sv * f_sv.astype(dt)
            sve = sve * f_sve.astype(dt)

        paired = jnp.stack([sv, sve], axis=-1)
        paired = paired.reshape(-1, length, self.out_planes * 2)
        paired = BatchNorm(True, dt, name="bn_output")(paired)
        out = paired.reshape(-1, length, g, gp, 2).sum(axis=-1)
        return out.reshape(-1, length, self.out_planes)


class AxialBlock(nn.Module):
    """conv1x1 down → height attn → width attn(stride) → conv1x1 up +
    residual (ref :269-394)."""

    planes: int
    kernel_size: int
    stride: int = 1
    groups: int = 8
    base_width: int = 64
    mode: str = "base"
    expansion: int = 2
    use_pallas: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        width = int(self.planes * (self.base_width / 64.0))
        out_ch = self.planes * self.expansion

        identity = x
        h = nn.Conv(width, (1, 1), use_bias=False, dtype=dt, name="conv_down")(x)
        h = nn.relu(BatchNorm(train, dt, name="bn1")(h))
        h = AxialAttention(width, self.groups, self.kernel_size, mode=self.mode,
                           use_pallas=self.use_pallas, dtype=dt,
                           name="hight_block")(h, train)
        h = AxialAttention(width, self.groups, self.kernel_size,
                           stride=self.stride, width_axis=True, mode=self.mode,
                           use_pallas=self.use_pallas, dtype=dt,
                           name="width_block")(h, train)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=dt, name="conv_up")(h)
        h = BatchNorm(train, dt, name="bn2")(h)

        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=dt, name="downsample_conv")(x)
            identity = BatchNorm(train, dt, name="downsample_bn")(identity)
        return nn.relu(h + identity)


class ResAxialAttentionUNet(nn.Module):
    """Axial-attention UNet (ref :396-508): 3-conv stem (stride-2 first),
    4 axial stages scaled by ``s``, plain conv+bilinear-upsample decoder
    with additive skips."""

    mode: str = "base"
    layers: Sequence[int] = (1, 2, 4, 1)
    num_classes: int = 1
    in_channels: int = 3
    img_size: int = 128
    s: float = 0.125
    groups: int = 8
    width_per_group: int = 64
    use_pallas: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        s = self.s
        expansion = 2
        inplanes = int(64 * s)

        # stem (ref :418-424,470-478)
        h = nn.Conv(inplanes, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=dt, name="conv1")(x)
        h = nn.relu(BatchNorm(train, dt, name="bn1")(h))
        h = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=dt, name="conv2")(h)
        h = nn.relu(BatchNorm(train, dt, name="bn2")(h))
        h = nn.Conv(inplanes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=dt, name="conv3")(h)
        h = nn.relu(BatchNorm(train, dt, name="bn3")(h))

        img = self.img_size
        stage_specs = [
            (int(128 * s), self.layers[0], 1, img // 2),
            (int(256 * s), self.layers[1], 2, img // 2),
            (int(512 * s), self.layers[2], 2, img // 4),
            (int(1024 * s), self.layers[3], 2, img // 8),
        ]
        skips = []
        for li, (planes, blocks, stride, ks) in enumerate(stage_specs):
            for bi in range(blocks):
                h = AxialBlock(
                    planes, ks if bi == 0 else (ks // 2 if stride != 1 else ks),
                    stride if bi == 0 else 1, self.groups, self.width_per_group,
                    self.mode, expansion, use_pallas=self.use_pallas, dtype=dt,
                    name=f"layer{li + 1}_{bi}",
                )(h, train)
            skips.append(h)
        x1, x2, x3, x4 = skips

        def dec(z, feats, name):
            z = resize_bilinear(z, (z.shape[1] * 2, z.shape[2] * 2),
                                align_corners=True)
            return nn.Conv(feats, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                           name=name)(z)

        u = nn.relu(dec(x4, int(512 * expansion * s), "decoder1") + x3)
        u = nn.relu(dec(u, int(256 * expansion * s), "decoder2") + x2)
        u = nn.relu(dec(u, int(128 * expansion * s), "decoder3") + x1)
        u = nn.relu(dec(u, int(64 * expansion * s), "decoder4"))
        out = nn.Conv(self.num_classes, (1, 1), dtype=dt, name="final_conv")(u)
        return {"main": out}


class _LoGoStem(nn.Module):
    """conv7x7(s2) → BN → ReLU → conv3x3 → BN → ReLU → conv3x3 → BN → ReLU
    (ref :533-540 / :548-555; shared shape for both branches)."""

    inplanes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        h = nn.Conv(self.inplanes, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False, dtype=dt,
                    name="conv1")(x)
        h = nn.relu(BatchNorm(train, dt, name="bn1")(h))
        h = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=dt, name="conv2")(h)
        h = nn.relu(BatchNorm(train, dt, name="bn2")(h))
        h = nn.Conv(self.inplanes, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=dt, name="conv3")(h)
        return nn.relu(BatchNorm(train, dt, name="bn3")(h))


class MedTLoGo(nn.Module):
    """LoGo dual-branch MedT (ref medt_net :510-664 — dead code there).

    Global branch: stem + 2 axial stages on the full image + 2-step
    decoder. Local branch: every 32x32 patch of the input through a
    4-stage axial net with a 5-step decoder; outputs are summed and fused.

    TPU-native design decisions vs. the reference:

    * the reference's Python double loop over patches (ref :626-655,
      64 sequential iterations at 256px) is replaced by folding patches
      into the batch dimension — one vectorized pass, identical math in
      eval mode (BatchNorm running-stat aggregation differs benignly in
      train mode: one update over all patches instead of the reference's
      sequential per-patch updates).
    * local-branch axial kernel sizes are derived from the actual 32x32
      patch resolution (16, 16, 8, 4 — exactly the reference's values at
      img_size=128, the only size its ``img_size_p``-based computation is
      consistent for; other sizes would crash the reference).
    """

    mode: str = "gated"        # global-branch blocks (AxialBlock_dynamic)
    mode_local: str = "wopos"  # local-branch blocks (AxialBlock_wopos)
    layers: Sequence[int] = (1, 2, 4, 1)
    num_classes: int = 1
    in_channels: int = 3
    img_size: int = 128
    s: float = 0.125
    groups: int = 8
    width_per_group: int = 64
    patch_size: int = 32
    use_pallas: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        s = self.s
        expansion = 2
        inplanes = int(64 * s)
        b, img_h, img_w, _ = x.shape
        p = self.patch_size
        if img_h % p or img_w % p:
            raise ValueError(f"LoGo needs image size divisible by {p}")

        def axial_stage(h, planes, blocks, stride, ks, mode, prefix):
            for bi in range(blocks):
                h = AxialBlock(
                    planes, ks if bi == 0 else (ks // 2 if stride != 1 else ks),
                    stride if bi == 0 else 1, self.groups,
                    self.width_per_group, mode, expansion,
                    use_pallas=self.use_pallas, dtype=dt,
                    name=f"{prefix}_{bi}")(h, train)
            return h

        def dec(z, feats, name, stride=1):
            z = nn.Conv(feats, (3, 3), strides=(stride, stride),
                        padding=((1, 1), (1, 1)), dtype=dt, name=name)(z)
            return nn.relu(resize_bilinear(
                z, (z.shape[1] * 2, z.shape[2] * 2), align_corners=True))

        # ---- global branch (ref :601-617): stem + layer1/2 + dec4/dec5
        g = _LoGoStem(inplanes, dtype=dt, name="stem")(x, train)
        x1_full = axial_stage(g, int(128 * s), self.layers[0], 1,
                              img_h // 2, self.mode, "layer1")
        x2_full = axial_stage(x1_full, int(256 * s), self.layers[1], 2,
                              img_h // 2, self.mode, "layer2")
        gdec = dec(x2_full, int(128 * expansion * s), "decoder4") + x1_full
        gdec = dec(gdec, int(64 * expansion * s), "decoder5")

        # ---- local branch (ref :619-655): fold 32x32 patches into batch
        nh, nw = img_h // p, img_w // p
        xp = x.reshape(b, nh, p, nw, p, self.in_channels)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(
            b * nh * nw, p, p, self.in_channels)

        # Reference quirk reproduced: the local stem is constructed AFTER
        # the global _make_layer calls mutated self.inplanes (ref :548,
        # following :542-543), so conv1_p..conv3_p output int(256*s)*exp
        # (=64 at s=0.125) channels, not the global stem's int(64*s) (=8)
        # — the local branch is 8x wider than a symmetric design, and
        # layer1_p starts with a 64->32 downsample. Verified by direct
        # parity (tests/test_parity7.py::test_medt_logo_parity).
        inplanes_p = int(256 * s) * expansion
        lp = _LoGoStem(inplanes_p, dtype=dt, name="stem_p")(xp, train)
        ks0 = p // 2  # 16: actual post-stem patch axis length
        x1p = axial_stage(lp, int(128 * s), self.layers[0], 1, ks0,
                          self.mode_local, "layer1_p")
        x2p = axial_stage(x1p, int(256 * s), self.layers[1], 2, ks0,
                          self.mode_local, "layer2_p")
        x3p = axial_stage(x2p, int(512 * s), self.layers[2], 2, ks0 // 2,
                          self.mode_local, "layer3_p")
        x4p = axial_stage(x3p, int(1024 * s), self.layers[3], 2, ks0 // 4,
                          self.mode_local, "layer4_p")

        u = dec(x4p, int(1024 * expansion * s), "decoder1_p", stride=2) + x4p
        u = dec(u, int(512 * expansion * s), "decoder2_p") + x3p
        u = dec(u, int(256 * expansion * s), "decoder3_p") + x2p
        u = dec(u, int(128 * expansion * s), "decoder4_p") + x1p
        u = dec(u, int(64 * expansion * s), "decoder5_p")

        # unfold patches back to the full image (ref writes into x_loc)
        c_out = u.shape[-1]
        x_loc = u.reshape(b, nh, nw, p, p, c_out)
        x_loc = x_loc.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, img_h, img_w, c_out)

        # ---- fuse (ref :657-661)
        fused = gdec + x_loc
        fused = nn.relu(nn.Conv(c_out, (3, 3), padding=((1, 1), (1, 1)),
                                dtype=dt, name="decoderf")(fused))
        out = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                      name="adjust")(nn.relu(fused))
        return {"main": out}
