"""Golden tests: fused Pallas MKBlock (interpret mode) vs the XLA path.

Ref: unet_zoo/models/mmunet.py:6-59 (Block).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.models.mmunet import MKBlock
from unet_zoo_tpu.ops.pallas.mkblock import (
    fold_mkblock_params,
    fused_mkblock,
    use_fused_mkblock,
)


def _run(dim, b, h, w, rows, seed=0):
    key = jax.random.PRNGKey(seed)
    blk = MKBlock(dim, use_pallas=False)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, h, w, dim),
                          jnp.float32)
    v = blk.init(jax.random.fold_in(key, 2), x, train=False)
    # non-trivial batch stats / affines
    v = jax.tree_util.tree_map(
        lambda a: a + 0.05 * np.random.default_rng(3).standard_normal(a.shape)
        if a.ndim >= 1 else a, v)
    ref = blk.apply(v, x, train=False)

    ops = fold_mkblock_params(v["params"], v["batch_stats"], dim)
    xt = x.transpose(0, 1, 3, 2).astype(jnp.bfloat16)
    out = fused_mkblock(xt, *ops, row_block=rows, interpret=True)
    got = out.transpose(0, 1, 3, 2).astype(jnp.float32)
    return np.asarray(ref), np.asarray(got)


@pytest.mark.parametrize("dim,h,w,rows", [
    (8, 16, 128, 8),     # multi-tile
    (8, 8, 128, 8),      # single tile
    (16, 24, 256, 8),    # wider lanes, 3 tiles
])
def test_fused_mkblock_matches_xla(dim, h, w, rows):
    ref, got = _run(dim, 2, h, w, rows)
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() < 0.03 * max(scale, 1.0), (
        np.abs(ref - got).max(), scale)


def test_gate():
    assert not use_fused_mkblock((2, 16, 100, 8))   # W not 128-multiple
    assert not use_fused_mkblock((2, 16, 128, 6))   # C not /4
    # TPU-only: on CPU the gate must be off even for clean shapes
    if jax.default_backend() != "tpu":
        assert not use_fused_mkblock((2, 16, 128, 8))


def test_fused_path_in_model_interpret():
    """MKBlock(use_pallas=True) on CPU uses interpret mode and matches."""
    dim, b, h, w = 8, 1, 16, 128
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (b, h, w, dim), jnp.float32)
    blk_ref = MKBlock(dim, use_pallas=False)
    v = blk_ref.init(jax.random.fold_in(key, 1), x, train=False)
    ref = blk_ref.apply(v, x, train=False)
    got = MKBlock(dim, use_pallas=True).apply(v, x, train=False)
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 0.05
