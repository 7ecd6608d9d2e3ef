"""UCTransNet (TPU-native rebuild of ref: unet_zoo/models/uctransnet.py).

UNet (base_channel=16) whose skip connections pass through a Channel
Transformer (CTrans) bridge: per-scale patch embeddings with learned
position embeddings, 4 layers of cross-channel attention over the
concatenated multi-scale token channels (KV_size = sum of channels), a
Reconstruct head back to spatial maps, and CCA-gated decoder fusion.

Fidelity notes: the reference's per-head ModuleList of Linear projections
(ref :94-113) is expressed as a single [heads, C, C] einsum parameter; the
psi InstanceNorm over the (C_q, KV) score map per head (ref :114,175-178)
and the head-mean context reduction (ref :203-206) are reproduced exactly.
``vis=True`` returns the per-layer, per-scale head-mean attention probs
(pre-dropout, ref :180-186,321-322) under the aux output key
``attn_weights`` — the analogue of the reference's ``(logits, weights)``
tuple return (ref :494-497).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet_zoo_tpu.nn import BatchNorm
from unet_zoo_tpu.ops import global_avg_pool, max_pool2d, upsample2x_nearest


def get_uctransnet_config() -> Dict[str, Any]:
    """Default config (ref :12-31), as a plain dict."""
    base = 16
    channel_nums = [base * (2 ** i) for i in range(4)]
    return {
        "base_channel": base,
        "transformer": {
            "embeddings_dropout_rate": 0.1,
            "attention_dropout_rate": 0.0,
            "dropout_rate": 0.1,
            "num_heads": 4,
            "num_layers": 4,
        },
        "KV_size": sum(channel_nums),
        "patch_sizes": (32, 16, 8, 4),
        "expand_ratio": 4,
        "vis": False,
    }


class ChannelEmbedding(nn.Module):
    """Patch embedding (conv k=s=patch, same channels) + learned position
    embedding + dropout (ref :33-57). Returns tokens [B, N, C]."""

    patch_size: int
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.patch_size
        c = x.shape[-1]
        h = nn.Conv(c, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="patch_embeddings")(x)
        b, hh, ww, _ = h.shape
        tokens = h.reshape(b, hh * ww, c)
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, hh * ww, c), jnp.float32)
        tokens = tokens + pos.astype(tokens.dtype)
        return nn.Dropout(self.dropout_rate, deterministic=not train)(tokens)


def _multihead_linear(self_mod, name, heads, c_in, c_out, x):
    """Per-head CxC projections as one einsum (ref ModuleList :94-113)."""
    w = self_mod.param(name, nn.initializers.lecun_normal(),
                       (heads, c_in, c_out), jnp.float32)
    return jnp.einsum("bnc,hcd->bhnd", x, w.astype(x.dtype))


class ChannelCrossAttention(nn.Module):
    """Attention_org (ref :86-216): per-scale queries attend channel-wise
    over the concatenated KV channels; InstanceNorm(psi) on score maps,
    softmax over KV axis, head-mean context."""

    channel_num: Sequence[int]
    num_heads: int = 4
    attn_dropout: float = 0.0
    vis: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embs: List[jnp.ndarray], emb_all: jnp.ndarray,
                 train: bool = False):
        dt = self.dtype
        kv_size = sum(self.channel_num)
        nh = self.num_heads

        k = _multihead_linear(self, "key", nh, kv_size, kv_size, emb_all)
        v = _multihead_linear(self, "value", nh, kv_size, kv_size, emb_all)

        outs = []
        weights = []
        for i, emb in enumerate(embs):
            ci = self.channel_num[i]
            q = _multihead_linear(self, f"query{i + 1}", nh, ci, ci, emb)
            # q: [b,h,n,ci] → transpose to [b,h,ci,n]; scores [b,h,ci,KV]
            scores = jnp.einsum("bhnc,bhnk->bhck", q, k) / jnp.sqrt(
                jnp.float32(kv_size)).astype(q.dtype)
            # psi: InstanceNorm2d(heads) over the (ci, KV) map per head
            mu = jnp.mean(scores, axis=(2, 3), keepdims=True)
            var = jnp.var(scores.astype(jnp.float32), axis=(2, 3), keepdims=True)
            scores = ((scores - mu) * jax.lax.rsqrt(var + 1e-5)).astype(q.dtype)
            probs = nn.softmax(scores, axis=-1)
            if self.vis:
                # head-mean probs, captured pre-dropout (ref :180-186)
                weights.append(jnp.mean(probs, axis=1))
            probs = nn.Dropout(self.attn_dropout, deterministic=not train)(probs)
            # context: probs [b,h,ci,KV] @ V^T [b,h,KV,n] → [b,h,ci,n];
            # mean over heads → [b,n,ci]
            ctx = jnp.einsum("bhck,bhnk->bhcn", probs, v)
            ctx = jnp.mean(ctx, axis=1).transpose(0, 2, 1)
            out = nn.Dense(ci, use_bias=False, dtype=dt, name=f"out{i + 1}")(ctx)
            out = nn.Dropout(self.attn_dropout, deterministic=not train)(out)
            outs.append(out)
        return outs, (tuple(weights) if self.vis else None)


class CTransBlock(nn.Module):
    """Block_ViT (ref :241-302): pre-norm channel attention + per-scale FFN."""

    channel_num: Sequence[int]
    num_heads: int = 4
    expand_ratio: int = 4
    dropout_rate: float = 0.1
    attn_dropout: float = 0.0
    vis: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embs: List[jnp.ndarray], train: bool = False):
        dt = self.dtype
        emb_all = jnp.concatenate(embs, axis=2)
        cx = [nn.LayerNorm(epsilon=1e-6, dtype=dt, name=f"attn_norm{i + 1}")(e)
              for i, e in enumerate(embs)]
        emb_all = nn.LayerNorm(epsilon=1e-6, dtype=dt, name="attn_norm")(emb_all)
        attended, weights = ChannelCrossAttention(
            self.channel_num, self.num_heads, self.attn_dropout, vis=self.vis,
            dtype=dt, name="channel_attn")(cx, emb_all, train)
        cx = [o + a for o, a in zip(embs, attended)]

        outs = []
        for i, e in enumerate(cx):
            ci = self.channel_num[i]
            h = nn.LayerNorm(epsilon=1e-6, dtype=dt, name=f"ffn_norm{i + 1}")(e)
            h = nn.Dense(ci * self.expand_ratio, dtype=dt,
                         name=f"ffn{i + 1}_fc1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
            h = nn.Dense(ci, dtype=dt, name=f"ffn{i + 1}_fc2")(h)
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
            outs.append(e + h)
        return outs, weights


class ChannelTransformer(nn.Module):
    """Embeddings → N CTrans blocks → final LN → Reconstruct + residual
    (ref :329-366).

    ``bridge_pipeline=(mesh, num_microbatches, batch_axis)`` routes the
    ``num_layers`` CTrans blocks through the GPipe scan+ppermute rotation
    over the mesh's ``model`` axis (``parallel/pipeline.py``) instead of
    the sequential in-model loop — stage ``i``'s layer weights live on
    'model'-row ``i`` and microbatches stream through the ring, fwd AND
    bwd. Numerically identical to the sequential loop except that bridge
    dropout masks are shared across microbatches (one mask per
    stage/layer). ``batch_axis`` names the DP axis the token batch dim is
    sharded over (None = replicated batch).
    """

    channel_num: Sequence[int]
    patch_sizes: Sequence[int] = (32, 16, 8, 4)
    num_layers: int = 4
    num_heads: int = 4
    expand_ratio: int = 4
    vis: bool = False
    dtype: Any = jnp.float32
    bridge_pipeline: Optional[Any] = None

    def _pipelined_layers(self, embs: List[jnp.ndarray], train: bool):
        """The layer_0..layer_{L-1} stack via pipeline_spmd (GPipe)."""
        from unet_zoo_tpu.parallel.pipeline import (
            merge_microbatches,
            pipeline_spmd,
            split_microbatches,
            stack_stage_params,
        )

        mesh, n_mb, batch_axis = self.bridge_pipeline
        n_stages = mesh.shape["model"]
        layer_params = [self.variables["params"][f"layer_{li}"]
                        for li in range(self.num_layers)]
        stage = {"params": stack_stage_params(layer_params, n_stages)}
        use_dropout = train and self.has_rng("dropout")
        if use_dropout:
            stage["rng"] = jax.random.split(self.make_rng("dropout"),
                                            n_stages)
        # same ctor args as the sequential path (dropout rates are the
        # CTransBlock defaults there too)
        block = CTransBlock(tuple(self.channel_num), self.num_heads,
                            self.expand_ratio, dtype=self.dtype)
        n_local = self.num_layers // n_stages

        def block_fn(stage_i, xs):
            for j in range(n_local):
                layer_p = jax.tree_util.tree_map(lambda a: a[j],
                                                 stage_i["params"])
                rngs = ({"dropout": jax.random.fold_in(stage_i["rng"], j)}
                        if use_dropout else None)
                outs, _ = block.apply({"params": layer_p}, list(xs),
                                      train and use_dropout, rngs=rngs)
                xs = tuple(outs)
            return xs

        mbs = split_microbatches(tuple(embs), n_mb)
        out = pipeline_spmd(mesh, block_fn, stage, mbs,
                            batch_axis=batch_axis)
        return list(merge_microbatches(out))

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        dt = self.dtype
        embs = [
            ChannelEmbedding(self.patch_sizes[i], dtype=dt,
                             name=f"embeddings_{i + 1}")(f, train)
            for i, f in enumerate(feats)
        ]
        attn_weights = []
        if self.bridge_pipeline is not None and not self.is_initializing():
            if self.vis:
                raise ValueError(
                    "vis=True (attention-weight capture) is not supported "
                    "with the pipelined bridge")
            embs = self._pipelined_layers(embs, train)
        else:
            for li in range(self.num_layers):
                embs, w = CTransBlock(self.channel_num, self.num_heads,
                                      self.expand_ratio, vis=self.vis,
                                      dtype=dt,
                                      name=f"layer_{li}")(embs, train)
                if self.vis:
                    attn_weights.append(w)
        embs = [nn.LayerNorm(epsilon=1e-6, dtype=dt,
                             name=f"encoder_norm{i + 1}")(e)
                for i, e in enumerate(embs)]

        outs = []
        for i, (e, f) in enumerate(zip(embs, feats)):
            b, n, c = e.shape
            hh = int(n ** 0.5)
            sp = e.reshape(b, hh, hh, c)
            # nearest upsample by patch size (ref Reconstruct :59-84)
            p = self.patch_sizes[i]
            for _ in range(p.bit_length() - 1):
                sp = upsample2x_nearest(sp)
            sp = nn.Conv(c, (1, 1), dtype=dt, name=f"reconstruct_{i + 1}_conv")(sp)
            sp = BatchNorm(train, dt, name=f"reconstruct_{i + 1}_bn")(sp)
            outs.append(nn.relu(sp) + f)
        return outs, (tuple(attn_weights) if self.vis else None)


class ConvBN(nn.Module):
    """conv3x3 → BN → ReLU (ref ConvBatchNorm :383-396)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype)(x)
        return nn.relu(BatchNorm(train, self.dtype)(h))


class CCA(nn.Module):
    """Cross channel attention gate on the skip (ref :413-437)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, g: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        dt = self.dtype
        fx = x.shape[-1]
        att_x = nn.Dense(fx, dtype=dt, name="mlp_x")(
            global_avg_pool(x, keepdims=False))
        att_g = nn.Dense(fx, dtype=dt, name="mlp_g")(
            global_avg_pool(g, keepdims=False))
        scale = nn.sigmoid((att_x + att_g) / 2.0)[:, None, None, :]
        return nn.relu(x * scale)


class UCTransNet(nn.Module):
    in_channels: int = 3
    num_classes: int = 1
    base_channel: int = 16
    patch_sizes: Sequence[int] = (32, 16, 8, 4)
    num_layers: int = 4
    num_heads: int = 4
    expand_ratio: int = 4
    vis: bool = False
    dtype: Any = jnp.float32
    # (mesh, num_microbatches, batch_axis|None): run the 4-layer channel-
    # transformer bridge GPipe-pipelined over the mesh's 'model' axis
    # (see ChannelTransformer.bridge_pipeline; YAML: gpu.multi_gpu_strategy
    # = pipeline)
    bridge_pipeline: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        c = self.base_channel

        def n_convs(h, feats, n, name):
            for i in range(n):
                h = ConvBN(feats, dtype=dt, name=f"{name}_conv{i}")(h, train)
            return h

        x1 = ConvBN(c, dtype=dt, name="inc")(x, train)
        x2 = n_convs(max_pool2d(x1, 2), c * 2, 2, "down1")
        x3 = n_convs(max_pool2d(x2, 2), c * 4, 2, "down2")
        x4 = n_convs(max_pool2d(x3, 2), c * 8, 2, "down3")
        x5 = n_convs(max_pool2d(x4, 2), c * 8, 2, "down4")

        (x1r, x2r, x3r, x4r), attn_weights = ChannelTransformer(
            (c, c * 2, c * 4, c * 8), self.patch_sizes, self.num_layers,
            self.num_heads, self.expand_ratio, vis=self.vis, dtype=dt,
            bridge_pipeline=self.bridge_pipeline, name="mtc",
        )([x1, x2, x3, x4], train)

        def up_block(h, skip, out_feats, name):
            up = upsample2x_nearest(h)
            gated = CCA(dtype=dt, name=f"{name}_coatt")(up, skip)
            h = jnp.concatenate([gated, up], axis=-1)
            return n_convs(h, out_feats, 2, name)

        h = up_block(x5, x4r, c * 4, "up4")
        h = up_block(h, x3r, c * 2, "up3")
        h = up_block(h, x2r, c, "up2")
        h = up_block(h, x1r, c, "up1")

        out = {"main": nn.Conv(self.num_classes, (1, 1), dtype=dt,
                               name="outc")(h)}
        if self.vis:
            # per-layer tuples of per-scale head-mean probs [B, C_i, KV]
            # (the reference's second return value, ref :494-497)
            out["attn_weights"] = attn_weights
        return out
