"""UNext / UNext-S (TPU-native rebuild of ref: unet_zoo/models/unext.py:193-355).

3-stage MiT-ish tokenized encoder (overlap patch embed + spatial-reduction
attention + DWConv-MLP) with a simplified conv decoder: bilinear
(align_corners=True) upsampling, 3x3 convs, additive skips, final x4
upsample + 1x1 head.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from unet_zoo_tpu.nn.transformer import MiTBlock, OverlapPatchEmbed
from unet_zoo_tpu.ops import resize_bilinear


class UNext(nn.Module):
    in_channels: int = 3
    num_classes: int = 1
    embed_dims: Sequence[int] = (128, 160, 256)
    num_heads: Sequence[int] = (1, 2, 4, 8)
    mlp_ratios: Sequence[float] = (4, 4, 4, 4)
    depths: Sequence[int] = (3, 4, 6, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    # >0: every `moe_every`-th MiT block swaps its DWConv-MLP for a
    # Switch-MoE FFN (nn/moe.py) — the expert-parallel superset entry
    # `unext_moe` (no reference counterpart).
    moe_experts: int = 0
    moe_every: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        dims = list(self.embed_dims)
        depths = list(self.depths)[:3]
        dpr = np.linspace(0.0, self.drop_path_rate, sum(depths)).tolist()

        feats = []
        h = x
        cur = 0
        for s in range(3):
            h = OverlapPatchEmbed(
                dims[s],
                patch_size=7 if s == 0 else 3,
                stride=4 if s == 0 else 2,
                dtype=dt,
                name=f"patch_embed{s + 1}",
            )(h)
            for i in range(depths[s]):
                h = MiTBlock(
                    num_heads=self.num_heads[s],
                    mlp_ratio=self.mlp_ratios[s],
                    sr_ratio=self.sr_ratios[s],
                    qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale,
                    drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate,
                    drop_path=dpr[cur + i],
                    moe_experts=(self.moe_experts if self.moe_experts and
                                 (i % self.moe_every == self.moe_every - 1)
                                 else 0),
                    dtype=dt,
                    name=f"block{s + 1}_{i}",
                )(h, train)
            cur += depths[s]
            h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"norm{s + 1}")(h)
            feats.append(h)

        x1, x2, x3 = feats
        conv3 = lambda f, name: nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)),
                                        dtype=dt, name=name)

        u = resize_bilinear(x3, (x2.shape[1], x2.shape[2]), align_corners=True)
        u = conv3(dims[1], "decoder_level1")(u) + x2
        u = resize_bilinear(u, (x1.shape[1], x1.shape[2]), align_corners=True)
        u = conv3(dims[0], "decoder_level2")(u) + x1
        u = conv3(dims[0], "decoder_level3")(u)

        # Head-commute: the 1x1 head and the bilinear x4 upsample are both
        # linear and act on disjoint axes (channels vs. space), and bilinear
        # interpolation weights sum to 1 per output pixel so the bias
        # commutes exactly too. Applying the head first upsamples
        # num_classes channels instead of embed_dims[0] — this removes a
        # [B,4H,4W,C] layout copy that dominated the profile (21.9ms of a
        # 110ms step at b128/256px on v5e).
        # Reference order (upsample then conv): unet_zoo/models/unext.py:253,320.
        out = nn.Conv(self.num_classes, (1, 1), dtype=dt, name="final_conv")(u)
        out = resize_bilinear(out, (out.shape[1] * 4, out.shape[2] * 4),
                              align_corners=True)
        return {"main": out}
