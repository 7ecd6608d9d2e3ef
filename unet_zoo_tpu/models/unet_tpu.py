"""unet_tpu — a TPU-native flagship designed to this hardware's rules.

Superset entry (no reference counterpart; motivation:
/root/repo/BASELINE.json's >=5000 img/s/chip north star, which round-3/4
receipts prove is 2.4x above the classic unet's own bf16 physics).
Where the classic unet spends its FLOPs in configurations the MXU
cannot use — 3-channel stem, C=64 at 256px (62-84% SOL), ConvT at 25%
SOL, lane-starved decoders — every compute-carrying op here is shaped
for the 128x128 systolic array, applying the round-4 measured rules:

* a 4x4/s4 patchify stem (one dense matmul) so ALL conv work happens at
  <=64px with channels >=128 — the dense C>=128 regime measured at
  ~143-145 TF/s (73% SOL) in `_probe_smallc.py`;
* stride-2 ConvNormActs for downsampling (no maxpool: its backward is a
  select-and-scatter and its forward is pure memory traffic);
* nearest-2x upsample + conv for the decoder (no ConvTranspose: 25% SOL
  and all three rewrite attempts measured worse — BENCH_NOTES round 4);
* the head predicts at stride 4 and reconstructs full-resolution
  LOGITS with a depth-to-space sub-pixel head (default since round 5;
  ``head_mode='bilinear'`` gives the round-4 bilinear logit upsample,
  the zoo's own unext precedent, ref: unet_zoo/models/unext.py:253,320)
  — either way the two full-resolution convs that dominate the classic
  unet's tail are gone.

~23.5 GF/img at 256px (vs unet's 94.2): the bf16 roofline is ~8400
img/s, so the north star is reachable by physics rather than forbidden
by it. Output protocol: {'main'} logits at input resolution.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from unet_zoo_tpu.nn import BatchNorm, ConvNormAct, DoubleConv
from unet_zoo_tpu.ops import resize_bilinear, upsample2x_nearest


class UNetTPU(nn.Module):
    """head_mode selects the logit head (both predict from the stride-4
    decoder feature; neither adds full-resolution conv FLOPs):

    * ``"dts"`` (default) — 3x3 conv to 16*num_classes at s4,
      depth-to-space to FULL-resolution logits (one MXU matmul, ~0.15
      GF/img at 256px: sub-cell geometry becomes learnable instead of
      interpolated; the same move as wranet's PixelShuffle decoder,
      ref wranet.py:160-174, applied to the logit head). Round-5 fine
      -structure A/B (FINE_AB.json): 0.9698 test Dice / 0.9890
      boundary-F1 vs bilinear's 0.8907 / 0.8168, at ~1.5% throughput
      cost (7119 vs 7227 img/s fwd b128) — hence the default.
    * ``"bilinear"`` — 1x1 conv to num_classes at s4, bilinear x4 logit
      upsample (the unext precedent). Marginally faster; measured to
      cost heavily on sub-4px structures (the numbers above).
    """

    in_channels: int = 3
    num_classes: int = 1
    # channels per stage at strides (4, 8, 16, 32)
    widths: Sequence[int] = (128, 256, 512, 512)
    head_mode: str = "dts"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        w = list(self.widths)
        h_in, w_in = x.shape[1], x.shape[2]

        # patchify stem: 4x4/s4 conv (one dense matmul over 48-ch
        # patches) -> BN -> GELU, straight to stride 4 at full width
        h = nn.Conv(w[0], (4, 4), strides=(4, 4), padding="VALID",
                    dtype=dt, name="stem")(x)
        h = BatchNorm(train, dt, name="stem_bn")(h)
        h = nn.gelu(h)

        skips = []
        for i in range(len(w) - 1):
            h = DoubleConv(w[i], dtype=dt, name=f"enc{i}")(h, train)
            skips.append(h)
            h = ConvNormAct(w[i + 1], strides=2, dtype=dt,
                            name=f"down{i}")(h, train)

        h = DoubleConv(w[-1], dtype=dt, name="bottleneck")(h, train)

        for i in range(len(w) - 2, -1, -1):
            h = upsample2x_nearest(h)
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = DoubleConv(w[i], dtype=dt, name=f"dec{i}")(h, train)

        if self.head_mode == "dts":
            # sub-pixel head: 16 logits per s4 cell, depth-to-space to
            # full resolution — out[4i+a, 4j+b] = head[i, j, a, b]
            nc = self.num_classes
            hd = nn.Conv(16 * nc, (3, 3), dtype=dt, name="head_dts")(h)
            b, hs, ws, _ = hd.shape
            hd = hd.reshape(b, hs, ws, 4, 4, nc)
            logits = hd.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, 4 * hs, 4 * ws, nc).astype(jnp.float32)
            if (4 * hs, 4 * ws) != (h_in, w_in):
                # odd input sizes: patchify floor-divides; restore the
                # input resolution contract exactly as the bilinear head
                logits = resize_bilinear(logits, (h_in, w_in),
                                         align_corners=False)
            return {"main": logits}
        logits = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                         name="head")(h)
        # predict at stride 4, upsample the LOGITS (unext precedent):
        # bilinear, align_corners=False
        logits = resize_bilinear(logits.astype(jnp.float32),
                                 (h_in, w_in), align_corners=False)
        return {"main": logits}
