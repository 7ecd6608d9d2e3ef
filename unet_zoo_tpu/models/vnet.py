"""VNet 2D adaptation (TPU-native rebuild of ref: unet_zoo/models/vnet.py).

Input-repeat residual stem, Down/Up transitions with residual adds, and
"continuous" BatchNorm that always normalizes by batch statistics
(ref ContBatchNorm2d :14-25).

Fidelity fixes vs the reference:
* The reference creates a fresh (untrained) 1x1 Conv inside ``forward``
  when input channels mismatch (ref :60) — here the adapter conv is a
  proper parameterized submodule.
* The reference trainer hard-rejects VNet with a spurious "3D" error
  (ref: utils/training_loop.py:195-200, quirk Q3) even though the model is
  2D; this framework trains it like any other model.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet_zoo_tpu.nn import TransposedUp
from unet_zoo_tpu.ops import pad_to_match


class ContBatchNorm(nn.Module):
    """BatchNorm that always uses batch statistics (torch ``training=True``
    hard-coded, ref :21-25); running stats are tracked but never consumed."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=(0, 1, 2))
        var = jnp.var(x32, axis=(0, 1, 2))
        y = (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return y.astype(x.dtype)


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(nchan))."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = self.param("alpha", nn.initializers.constant(0.25),
                       (x.shape[-1],), jnp.float32).astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class _Act(nn.Module):
    elu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.elu:
            return nn.elu(x)
        return PReLU(dtype=self.dtype)(x)


class LUConv(nn.Module):
    """act(BN(conv5x5)) (ref :27-36)."""

    elu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        h = nn.Conv(c, (5, 5), padding=((2, 2), (2, 2)), dtype=self.dtype)(x)
        h = ContBatchNorm(dtype=self.dtype)(h)
        return _Act(self.elu, self.dtype)(h)


class VNet(nn.Module):
    in_channels: int = 1
    num_classes: int = 1
    elu: bool = True
    nll: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype

        # input transition (ref :44-66)
        h = nn.Conv(16, (5, 5), padding=((2, 2), (2, 2)), dtype=dt,
                    name="in_conv")(x)
        h = ContBatchNorm(dtype=dt, name="in_bn")(h)
        cin = x.shape[-1]
        if cin == 1:
            rep = jnp.tile(x, (1, 1, 1, 16))
        elif cin != 16:
            rep = nn.Conv(16, (1, 1), dtype=dt, name="in_adapt")(x)
        else:
            rep = x
        out16 = _Act(self.elu, dt)(h + rep)

        def down(z, out_ch, n_convs, dropout, name):
            d = nn.Conv(out_ch, (2, 2), strides=(2, 2), padding="VALID",
                        dtype=dt, name=f"{name}_conv")(z)
            d = ContBatchNorm(dtype=dt, name=f"{name}_bn")(d)
            d = _Act(self.elu, dt)(d)
            o = d
            if dropout:
                o = nn.Dropout(0.5, broadcast_dims=(1, 2),
                               deterministic=not train)(o)
            for i in range(n_convs):
                o = LUConv(self.elu, dt, name=f"{name}_lu{i}")(o)
            return _Act(self.elu, dt)(o + d)

        out32 = down(out16, 32, 1, False, "down32")
        out64 = down(out32, 64, 2, False, "down64")
        out128 = down(out64, 128, 3, True, "down128")
        out256 = down(out128, 256, 2, True, "down256")

        def up(z, skip, out_ch, n_convs, dropout, name):
            o = z
            if dropout:
                o = nn.Dropout(0.5, broadcast_dims=(1, 2),
                               deterministic=not train)(o)
            sk = nn.Dropout(0.5, broadcast_dims=(1, 2),
                            deterministic=not train)(skip)
            o = TransposedUp(out_ch // 2, dtype=dt, name=f"{name}_up")(o)
            o = ContBatchNorm(dtype=dt, name=f"{name}_bn")(o)
            o = _Act(self.elu, dt)(o)
            o = pad_to_match(o, (sk.shape[1], sk.shape[2]))
            xcat = jnp.concatenate([o, sk], axis=-1)
            o = xcat
            for i in range(n_convs):
                o = LUConv(self.elu, dt, name=f"{name}_lu{i}")(o)
            return _Act(self.elu, dt)(o + xcat)

        u = up(out256, out128, 256, 2, True, "up256")
        u = up(u, out64, 128, 2, True, "up128")
        u = up(u, out32, 64, 1, False, "up64")
        u = up(u, out16, 32, 1, False, "up32")

        # output transition (ref :117-126)
        o = nn.Conv(self.num_classes, (5, 5), padding=((2, 2), (2, 2)),
                    dtype=dt, name="out_conv")(u)
        o = ContBatchNorm(dtype=dt, name="out_bn")(o)
        o = _Act(self.elu, dt)(o)
        return {"main": o}
