"""Shared encoder/decoder blocks (NHWC, Flax linen).

TPU-native equivalents of the reference's `common_layers.py`
(ref: unet_zoo/models/common_layers.py). Differences by design:

* NHWC layout (TPU-native) instead of NCHW.
* Explicit ``train: bool`` + batch-stats collections instead of
  module-mode mutation.
* Strided/padded convs always use explicit numeric padding so sampling
  positions match PyTorch (XLA 'SAME' pads asymmetrically for stride>1).
* Conv→BN→ReLU chains are left as separate XLA ops: XLA fuses the BN
  scale/shift + ReLU into the conv epilogue on TPU; a Pallas path covers
  the cases XLA misses (see unet_zoo_tpu/ops/pallas/).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet_zoo_tpu.ops import (
    max_pool2d,
    pad_to_match,
    resize_bilinear,
    upsample2x_nearest,
)

Dtype = Any


def BatchNorm(train: bool, dtype: Dtype = jnp.float32, name: Optional[str] = None,
              use_scale: bool = True, use_bias: bool = True) -> nn.BatchNorm:
    """BatchNorm with PyTorch-default semantics (momentum 0.1, eps 1e-5).

    Flax's ``momentum`` is the decay of the running average, i.e.
    ``1 - torch_momentum``.
    """
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
        use_scale=use_scale,
        use_bias=use_bias,
    )


class _QuantConv(nn.Module):
    """int8 drop-in for an ``nn.Conv`` (serving/PTQ path).

    Declares params under the SAME names/shapes as ``nn.Conv`` ('kernel'
    [kh, kw, cin/groups, cout], 'bias' [cout]) so it can be constructed
    with ``name="Conv_0"`` and read the float checkpoint unchanged.
    Weights are quantized symmetric per-output-channel at trace time
    (folded into the compiled program as constants); the activation is
    quantized per-tensor with a calibrated absmax. The s8×s8→s32 conv
    hits the MXU's int8 path (2× bf16 peak on v5e); the dequant
    scale+bias epilogue stays float and fuses into the following BN/act.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    use_bias: bool = True
    feature_group_count: int = 1
    kernel_dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, in_absmax: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        cin = x.shape[-1] // self.feature_group_count
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, cin, self.features), jnp.float32)
        kf = kernel.astype(jnp.float32)
        s_w = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-12) / 127.0
        wq = jnp.clip(jnp.round(kf / s_w), -127, 127).astype(jnp.int8)

        s_x = jnp.maximum(in_absmax.astype(jnp.float32), 1e-12) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                      -127, 127).astype(jnp.int8)
        p, d = self.padding, self.kernel_dilation
        y = jax.lax.conv_general_dilated(
            xq, wq, (self.strides, self.strides), ((p, p), (p, p)),
            rhs_dilation=(d, d),
            feature_group_count=self.feature_group_count,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (s_x * s_w)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype)


def conv_maybe_int8(mod: nn.Module, x: jnp.ndarray, *, features: int,
                    kernel_size: int = 3, strides: int = 1, padding: int = 1,
                    use_bias: bool = True, feature_group_count: int = 1,
                    kernel_dilation: int = 1, dtype: Dtype = jnp.float32,
                    train: bool = False, name: str,
                    stat_name: str = "in_absmax") -> jnp.ndarray:
    """An ``nn.Conv`` call with the PTQ int8 serving gate.

    Calibration forwards (``mutable=["quant_stats"]``) sow the conv
    input's absmax under ``stat_name`` at ``mod``'s path; eval forwards
    whose variables carry the matching ``quant`` collection (see
    ``unet_zoo_tpu.utils.serving.calibrate_int8``) run :class:`_QuantConv`
    under the SAME param path ``name``, so float checkpoints serve int8
    unchanged. Everything else — init, training, un-calibrated eval — is
    a plain ``nn.Conv``.
    """
    if mod.is_mutable_collection("quant_stats") and not mod.is_initializing():
        mod.sow("quant_stats", stat_name,
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                init_fn=lambda: jnp.float32(0.0), reduce_fn=jnp.maximum)
    if (not train and not mod.is_initializing()
            and mod.has_variable("quant", stat_name)):
        return _QuantConv(
            features, kernel_size, strides, padding, use_bias,
            feature_group_count, kernel_dilation, dtype, name=name,
        )(x, mod.get_variable("quant", stat_name))
    p = padding
    return nn.Conv(
        features,
        (kernel_size, kernel_size),
        strides=(strides, strides),
        padding=((p, p), (p, p)),
        use_bias=use_bias,
        feature_group_count=feature_group_count,
        kernel_dilation=(kernel_dilation, kernel_dilation),
        dtype=dtype,
        name=name,
    )(x)


class ConvNormAct(nn.Module):
    """conv(k,s,p) → BatchNorm → activation. The zoo's most common micro-block.

    When the variables passed to ``apply`` carry a ``quant`` collection
    (built by ``unet_zoo_tpu.utils.serving.calibrate_int8``) and ``train``
    is False, the conv runs int8 (see :class:`_QuantConv`); calibration
    forwards (``mutable=["quant_stats"]``) record the conv input's absmax.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    use_bias: bool = True
    act: Optional[Callable] = nn.relu
    feature_group_count: int = 1
    kernel_dilation: int = 1
    bn_affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = conv_maybe_int8(
            self, x, features=self.features, kernel_size=self.kernel_size,
            strides=self.strides, padding=self.padding,
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_dilation=self.kernel_dilation, dtype=self.dtype,
            train=train, name="Conv_0")
        x = BatchNorm(train, dtype=self.dtype,
                      use_scale=self.bn_affine, use_bias=self.bn_affine)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class DoubleConv(nn.Module):
    """(conv3x3 → BN → ReLU) × 2 (ref: unet_zoo/models/common_layers.py:20-37)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvNormAct(self.features, dtype=self.dtype)(x, train)
        x = ConvNormAct(self.features, dtype=self.dtype)(x, train)
        return x


# The reference's ConvBlock (common_layers.py:39-61) is topologically identical.
ConvBlock = DoubleConv


class DoubleConvMid(nn.Module):
    """(conv→BN→ReLU)×2 with a distinct mid-channel width
    (ref: unet_zoo/models/common_layers.py:130-146)."""

    features: int
    mid_features: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mid = self.mid_features if self.mid_features is not None else self.features
        x = ConvNormAct(mid, dtype=self.dtype)(x, train)
        x = ConvNormAct(self.features, dtype=self.dtype)(x, train)
        return x


class DownSample(nn.Module):
    """UNet encoder stage: DoubleConv then 2x2 maxpool; returns (skip, pooled)
    (ref: unet_zoo/models/common_layers.py:82-95)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        down = DoubleConv(self.features, dtype=self.dtype)(x, train)
        return down, max_pool2d(down, 2)


class Down(nn.Module):
    """maxpool → DoubleConvMid (ref: unet_zoo/models/common_layers.py:148-158)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return DoubleConvMid(self.features, dtype=self.dtype)(max_pool2d(x, 2), train)


class _ConvT2x2Shuffle(nn.Module):
    """ConvTranspose(k=s) lowered as one 1x1-matmul + depth-to-space.

    For kernel_size == stride the transposed conv has no tap overlap:
    out[si+di, sj+dj, o] = sum_c x[i, j, c] * W[di, dj, c, o] — exactly a
    single [C_in, k*k*C_out] matmul followed by a reshape. Parameter
    name/shape match nn.ConvTranspose ('kernel' [kh,kw,in,out], 'bias'),
    so converters and parity weight-injection are unaffected.

    Measured on v5e (unet decoder, b128/256px): the standalone matmul form
    edges out XLA's conv-transpose lowering, but IN-MODEL the
    depth-to-space transpose and bias add stay unfused (3x the cost of the
    conv_transpose fusion XLA builds). Kept for shapes where a consumer
    can absorb the layout, but NOT used by TransposedUp by default.
    """

    features: int
    kernel_size: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        b, h, w, cin = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        # nn.ConvTranspose (transpose_kernel=False) applies the kernel
        # spatially FLIPPED relative to torch ConvTranspose2d:
        # out[s*i + d] += x[i] * kernel[k-1-d]. Flip here so this module is
        # a drop-in for nn.ConvTranspose under the same stored weights.
        wmat = kernel[::-1, ::-1].astype(self.dtype).transpose(
            2, 0, 1, 3).reshape(cin, k * k * self.features)
        y = jnp.einsum("bhwc,cf->bhwf", x.astype(self.dtype), wmat)
        y = y.reshape(b, h, w, k, k, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h * k, w * k, self.features)
        return y + bias.astype(self.dtype)


class TransposedUp(nn.Module):
    """ConvTranspose2d(kernel, stride) upsampling
    (ref: unet_zoo/models/common_layers.py:201-207).

    ``UNET_ZOO_CONVT_DTS=1`` routes the k==s==2 case through an exact
    matmul + depth-to-space formulation instead of XLA's conv-transpose
    lowering (which runs at ~25% SOL for the zoo's 256px/C=64 decoder
    stage — round-3 attribution). k==s means zero tap overlap, so
    ``out[2m+a, 2n+b] = x[m,n] @ K[1-a,1-b]`` — one [Cin, 4*Co] dot
    whose phase interleave is two reshapes and a transpose XLA can fuse
    into the consumer. Same 'ConvTranspose_0' param tree either way.
    """

    features: int
    kernel_size: int = 2
    strides: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ct = nn.ConvTranspose(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="VALID",
            dtype=self.dtype,
            name="ConvTranspose_0",
        )
        use_dts = (os.environ.get("UNET_ZOO_CONVT_DTS") == "1"
                   and self.kernel_size == 2 and self.strides == 2
                   and not self.is_initializing())
        if not use_dts:
            return ct(x)
        p = self.variables["params"]["ConvTranspose_0"]
        w, bias = p["kernel"], p.get("bias")
        cin, co = w.shape[2], w.shape[3]
        # spatial flip + (a, b, co)-major column packing (the transposed
        # conv applies the kernel flipped; see ops/pallas/fused_up.py's
        # pack_convt_kernel derivation)
        wp = w[::-1, ::-1].transpose(2, 0, 1, 3).reshape(cin, 4 * co)
        b_, h, wd, _ = x.shape
        up = jnp.dot(x.reshape(b_ * h * wd, cin).astype(self.dtype),
                     wp.astype(self.dtype))
        up = up.reshape(b_, h, wd, 2, 2, co)
        up = up.transpose(0, 1, 3, 2, 4, 5).reshape(b_, 2 * h, 2 * wd, co)
        if bias is not None:
            up = up + bias.astype(up.dtype)
        return up


class UpSampleUNet(nn.Module):
    """ConvTranspose(2,2) → pad-to-skip → concat[x, skip] → DoubleConv
    (ref: unet_zoo/models/common_layers.py:97-116).

    Eval-mode forwards on TPU (auto, or forced via ``use_pallas``) run the
    fused Pallas decoder kernel: ConvT + bias + concat + first conv + BN +
    ReLU in one VMEM-resident pass (XLA's conv-transpose lowering is ~25%
    SOL for these k2s2 shapes and the concat copies are pure overhead —
    see ops/pallas/fused_up.py). The second ConvNormAct runs as a plain
    XLA conv with the BN folded to a scale/bias epilogue. The parameter
    tree is identical on both paths (init always takes the module path).
    """

    features: int
    up_features: int  # = in_channels // 2 in the reference
    dtype: Dtype = jnp.float32
    use_pallas: Optional[bool] = None  # None = auto (TPU + clean shapes)

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from unet_zoo_tpu.ops.pallas.fused_up import use_fused_up

        if self.use_pallas is False:
            fused = False
        else:
            # forced=True (use_pallas=True) still honors the Mosaic shape
            # constraints on real TPU: the Cu=64 stage falls back to XLA
            fused = use_fused_up(x.shape, skip.shape, self.up_features,
                                 forced=self.use_pallas is True)
        fused = fused and not train and not self.is_initializing()
        if fused:
            return self._fused(x, skip)
        x = TransposedUp(self.up_features, dtype=self.dtype)(x)
        x = pad_to_match(x, (skip.shape[1], skip.shape[2]))
        x = jnp.concatenate([x, skip], axis=-1)
        return DoubleConv(self.features, dtype=self.dtype)(x, train)

    def _fused(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        from unet_zoo_tpu.ops.pallas.fused_up import (
            auto_co_block,
            fold_conv_bn,
            fused_up_concat_conv,
        )

        dt = self.dtype
        v = self.variables
        wt = v["params"]["TransposedUp_0"]["ConvTranspose_0"]
        dc = v["params"]["DoubleConv_0"]
        st = v["batch_stats"]["DoubleConv_0"]

        def folded(i):
            cna, s = dc[f"ConvNormAct_{i}"], st[f"ConvNormAct_{i}"]
            scale, bias = fold_conv_bn(
                cna["Conv_0"]["bias"], cna["BatchNorm_0"]["scale"],
                cna["BatchNorm_0"]["bias"], s["BatchNorm_0"]["mean"],
                s["BatchNorm_0"]["var"])
            return cna["Conv_0"]["kernel"].astype(dt), scale, bias

        w1, sc1, bi1 = folded(0)
        cu = wt["kernel"].shape[-1]
        cob = auto_co_block(x.shape[-1], cu, skip.shape[-1], self.features)
        out = fused_up_concat_conv(
            x, skip, wt["kernel"].astype(dt), wt["bias"], w1, sc1, bi1,
            co_block=cob)

        w2, sc2, bi2 = folded(1)
        z = jax.lax.conv_general_dilated(
            out, w2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return nn.relu(z.astype(jnp.float32) * sc2 + bi2).astype(dt)


class UpBilinear(nn.Module):
    """bilinear(x2, align_corners) → pad → concat[skip, x] → DoubleConvMid(mid=in//2)
    (ref: unet_zoo/models/common_layers.py:160-180, bilinear branch)."""

    features: int
    mid_features: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=True)
        x = pad_to_match(x, (skip.shape[1], skip.shape[2]))
        x = jnp.concatenate([skip, x], axis=-1)
        return DoubleConvMid(self.features, self.mid_features, dtype=self.dtype)(x, train)


class UpConvBlock(nn.Module):
    """nearest 2x upsample → conv3x3 → BN → ReLU
    (ref: unet_zoo/models/common_layers.py:63-80)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return ConvNormAct(self.features, dtype=self.dtype)(upsample2x_nearest(x), train)


class _Conv1x1Reduce(nn.Module):
    """1x1 conv to very few channels as multiply+lane-reduce.

    XLA lowers a C_out=1 convolution onto the MXU with 1/128 lane
    utilization (~190 GB/s effective on v5e); the same contraction as an
    elementwise product + reduction runs on the VPU at memory speed
    (measured 1.7x faster at [B,256,256,64]->1). Parameter names/shapes
    match nn.Conv ('kernel' [1,1,in,out], 'bias')."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        w = kernel[0, 0].astype(jnp.float32)            # [cin, out]
        y = jnp.sum(x.astype(jnp.float32)[..., None] * w, axis=-2)
        return (y + bias.astype(jnp.float32)).astype(x.dtype)


class OutConv(nn.Module):
    """1x1 output head (ref: unet_zoo/models/common_layers.py:118-128).
    Heads to <=2 channels take the VPU reduce lowering."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.features <= 2:
            return _Conv1x1Reduce(self.features, dtype=self.dtype,
                                  name="Conv_0")(x)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)


class ResidualConv(nn.Module):
    """Pre-act residual block of ResUnet
    (ref: unet_zoo/models/common_layers.py:182-199)."""

    features: int
    strides: int = 1
    padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p, s = self.padding, self.strides
        h = BatchNorm(train, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = conv_maybe_int8(self, h, features=self.features, strides=s,
                            padding=p, use_bias=False, dtype=self.dtype,
                            train=train, name="Conv_0",
                            stat_name="in_absmax0")
        h = BatchNorm(train, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = conv_maybe_int8(self, h, features=self.features, padding=1,
                            use_bias=False, dtype=self.dtype, train=train,
                            name="Conv_1", stat_name="in_absmax1")
        skip = conv_maybe_int8(self, x, features=self.features, kernel_size=1,
                               strides=s, padding=0, use_bias=False,
                               dtype=self.dtype, train=train, name="Conv_2",
                               stat_name="in_absmax_skip")
        skip = BatchNorm(train, dtype=self.dtype)(skip)
        return h + skip
