"""WRANet (TPU-native rebuild of ref: unet_zoo/models/wranet.py).

Wide-receptive-field attention net (deblurring origin, adapted for
segmentation): LiteWRARB multi-stream depthwise blocks with an SE-style
aggregation gate and a zero-init learnable per-channel alpha residual,
PixelShuffle decoder, and a deformable-conv residual block (implemented
natively for TPU in unet_zoo_tpu/ops/deform.py — there is no library
deform_conv here; ref delegates to torchvision, :71-78).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet_zoo_tpu.ops.deform import deform_conv2d


class InstanceNorm(nn.Module):
    """torch nn.InstanceNorm2d default: no affine, no running stats."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        return ((x32 - mu) * jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)


class BasicConv(nn.Module):
    """conv → norm → act (ref :7-19)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 0
    use_bias: bool = True
    norm: str = "instance"
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.padding
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides),
                    padding=((p, p), (p, p)), use_bias=self.use_bias,
                    dtype=self.dtype)(x)
        if self.norm == "instance":
            x = InstanceNorm(dtype=self.dtype)(x)
        elif self.norm == "batch":
            from unet_zoo_tpu.nn import BatchNorm

            x = BatchNorm(train, dtype=self.dtype)(x)
        if self.act:
            x = nn.relu(x)
        return x


class ModifiedDSCB(nn.Module):
    """depthwise 3x3 → 1x1 → InstanceNorm → ReLU (ref :94-110)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    feature_group_count=c, dtype=self.dtype, name="dw")(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pw")(x)
        return nn.relu(InstanceNorm(dtype=self.dtype)(x))


class LiteWRARB(nn.Module):
    """Multi-stream depthwise blocks + SE gate + alpha residual (ref :112-147)."""

    num_blocks_list: Sequence[int] = (1, 2, 3, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        c = x.shape[-1]
        streams = []
        for si, nb in enumerate(self.num_blocks_list):
            h = x
            for bi in range(nb):
                h = ModifiedDSCB(c, dtype=dt, name=f"stream{si}_b{bi}")(h)
            streams.append(h)
        h = jnp.concatenate(streams, axis=-1)
        proj = BasicConv(c, kernel_size=1, use_bias=False, dtype=dt,
                         name="project")(h, train)
        g = nn.Conv(c // 16, (1, 1), dtype=dt, name="ag0")(proj)
        g = nn.relu(g)
        g = nn.sigmoid(nn.Conv(c, (1, 1), dtype=dt, name="ag1")(g))
        alpha = self.param("alpha", nn.initializers.zeros, (1, 1, 1, c), jnp.float32)
        return alpha.astype(dt) * x + proj * g


class DeformableConv(nn.Module):
    """Modulated deformable conv: zero-init offset/modulator convs
    (ref :38-79)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    use_bias: bool = False
    use_pallas: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        p = (k - 1) // 2
        offset = nn.Conv(2 * k * k, (k, k), strides=(self.strides, self.strides),
                         padding=((p, p), (p, p)), dtype=self.dtype,
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros, name="offset_conv")(x)
        modulator = nn.sigmoid(
            nn.Conv(k * k, (k, k), strides=(self.strides, self.strides),
                    padding=((p, p), (p, p)), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="modulator_conv")(x)
        )
        weight = self.param(
            "weight", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features), jnp.float32,
        )
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        # auto mode is eval-only: the kernel has no VJP (training keeps
        # the differentiable XLA path, like the other fwd-only kernels)
        use_pallas = self.use_pallas
        if use_pallas is None and not train and not self.is_initializing():
            from unet_zoo_tpu.ops.pallas.deform import use_pallas_deform

            use_pallas = use_pallas_deform(x.shape, k, self.strides, 1)
        if use_pallas:
            from unet_zoo_tpu.ops.pallas.deform import deform_conv2d_pallas

            impl = deform_conv2d_pallas
        else:
            impl = deform_conv2d
        return impl(x, offset, modulator, weight.astype(self.dtype),
                    None if bias is None else bias.astype(self.dtype),
                    self.strides, self.padding)


class DeformableResblock(nn.Module):
    """x + conv3x3(relu(deform_conv(x))) (ref :81-91)."""

    mid_features: int
    use_pallas: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.relu(DeformableConv(self.mid_features, use_bias=True,
                                   use_pallas=self.use_pallas,
                                   dtype=self.dtype, name="deform")(x, train))
        h = nn.Conv(x.shape[-1], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="last_conv")(h)
        return x + h


def _pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """NHWC pixel shuffle (torch NCHW channel order preserved)."""
    b, h, w, c = x.shape
    co = c // (r * r)
    # torch PixelShuffle reads channels as [co, r, r]
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, co)


class WRADecoder(nn.Module):
    """PixelShuffle up + concat + conv + deformable resblock (ref :160-174)."""

    features: int
    use_pallas: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_small: jnp.ndarray, x_large: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        up = nn.Conv(self.features * 4, (3, 3), padding=((1, 1), (1, 1)),
                     use_bias=False, dtype=dt, name="ps_conv")(x_small)
        up = _pixel_shuffle(up, 2)
        h = jnp.concatenate([up, x_large], axis=-1)
        h = BasicConv(self.features, kernel_size=3, padding=1, norm="batch",
                      dtype=dt, name="conv_3x3_last")(h, train)
        return DeformableResblock(self.features // 4,
                                  use_pallas=self.use_pallas,
                                  dtype=dt, name="rdb")(h, train)


class WRANet(nn.Module):
    in_channels: int = 3
    num_classes: int = 1
    feature_channels: int = 128
    use_pallas: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        fc = self.feature_channels

        h = nn.Conv(fc // 2, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                    name="stem1")(x)
        h = nn.Conv(fc, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                    name="stem2")(h)

        def encoder(z, name):
            z = LiteWRARB(dtype=dt, name=f"{name}_wrarb")(z, train)
            return BasicConv(fc, kernel_size=3, padding=1, dtype=dt,
                             name=f"{name}_conv")(z, train)

        lv1 = encoder(h, "enc1")
        lv2 = nn.Conv(fc, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=dt, name="down1")(lv1)
        lv2 = encoder(lv2, "enc2")
        lv3 = nn.Conv(fc, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=dt, name="down2")(lv2)
        lv3 = encoder(lv3, "enc3")

        d2 = WRADecoder(fc, use_pallas=self.use_pallas, dtype=dt,
                        name="decoder_lv2")(lv3, lv2, train)
        d1 = WRADecoder(fc, use_pallas=self.use_pallas, dtype=dt,
                        name="decoder_lv1")(d2, lv1, train)

        h = nn.Conv(fc // 2, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                    name="last1")(d1)
        h = nn.Conv(fc // 4, (3, 3), padding=((1, 1), (1, 1)), dtype=dt,
                    name="last2")(h)
        out = nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
                      dtype=dt, name="last3")(h)
        return {"main": out}
