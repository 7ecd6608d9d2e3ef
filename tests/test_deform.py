"""Golden test for the native deformable conv vs a straightforward numpy
reference of torchvision's deform_conv2d semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.ops.deform import deform_conv2d


def _numpy_deform(x, offset, mask, weight, bias, stride=1, padding=1,
                  dilation=1):
    b, h, w, c = x.shape
    kh, kw, _, o = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    out = np.zeros((b, ho, wo, o), np.float64)

    def sample(bi, py, px, ci):
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        val = 0.0
        for dy, wy in ((0, 1 - (py - y0)), (1, py - y0)):
            for dx, wx in ((0, 1 - (px - x0)), (1, px - x0)):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < h and 0 <= xx < w:
                    val += wy * wx * x[bi, yy, xx, ci]
        return val

    for bi in range(b):
        for oy in range(ho):
            for ox in range(wo):
                for ki in range(kh * kw):
                    dy, dx = divmod(ki, kw)
                    py = oy * stride - padding + dy * dilation + offset[
                        bi, oy, ox, 2 * ki]
                    px = ox * stride - padding + dx * dilation + offset[
                        bi, oy, ox, 2 * ki + 1]
                    m = mask[bi, oy, ox, ki]
                    for ci in range(c):
                        s = sample(bi, py, px, ci) * m
                        out[bi, oy, ox] += s * weight[dy, dx, ci]
    if bias is not None:
        out += bias
    return out.astype(np.float32)


def test_deform_conv_matches_numpy_reference():
    rng = np.random.default_rng(0)
    b, h, w, c, o = 1, 6, 7, 3, 4
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    offset = (rng.standard_normal((b, h, w, 18)) * 1.5).astype(np.float32)
    mask = rng.uniform(0.2, 1.0, (b, h, w, 9)).astype(np.float32)
    weight = rng.standard_normal((3, 3, c, o)).astype(np.float32)
    bias = rng.standard_normal((o,)).astype(np.float32)

    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias)))
    ref = _numpy_deform(x, offset, mask, weight, bias)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_deform_conv_zero_offsets_is_plain_conv():
    import jax

    rng = np.random.default_rng(1)
    b, h, w, c, o = 2, 8, 8, 4, 5
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    weight = rng.standard_normal((3, 3, c, o)).astype(np.float32)
    offset = np.zeros((b, h, w, 18), np.float32)
    mask = np.ones((b, h, w, 9), np.float32)

    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), None))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-4, rtol=1e-4)
