"""Value + gradient parity for the fused train-mode axial attention core
(interpret mode) against a functional restatement of the XLA train path
(ref semantics: unet_zoo/models/medt_net.py:88-109)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.ops.pallas.axial_train import fused_axial_train

EPS = 1e-5


def _xla_core(q, k, qg, kg, v, qe, keT, ve, gamma, beta):
    """The module's train-mode math (full BN incl. beta) as a function."""
    n, L, g, _ = q.shape
    qk = jnp.einsum("bigc,bjgc->bijg", q, k)
    qr = jnp.einsum("bigc,cij->bijg", qg, qe)
    kr = jnp.einsum("bjgc,cij->bijg", kg, keT)
    stacked = jnp.concatenate([qk, qr, kr], axis=-1)      # [N, L, L, 3g]
    mu = jnp.mean(stacked, axis=(0, 1, 2))
    var = jnp.mean(stacked * stacked, axis=(0, 1, 2)) - mu * mu
    y = ((stacked - mu) * jax.lax.rsqrt(var + EPS)
         * gamma.reshape(-1) + beta.reshape(-1))
    sim = y.reshape(n, L, L, 3, g).sum(axis=3)
    sim = jax.nn.softmax(sim, axis=2)
    sv = jnp.einsum("bijg,bjgc->bigc", sim, v)
    sve = jnp.einsum("bijg,pij->bigp", sim, ve)
    return sv, sve, mu.reshape(3, g), var.reshape(3, g)


def _inputs(seed=0, n=6, L=16, g=2, cdim=2, gp=4):
    ks = jax.random.split(jax.random.PRNGKey(seed), 9)
    q = jax.random.normal(ks[0], (n, L, g, cdim))
    k = jax.random.normal(ks[1], (n, L, g, cdim))
    qg = q * 0.3
    kg = k * 0.7
    v = jax.random.normal(ks[2], (n, L, g, gp))
    qe = jax.random.normal(ks[3], (cdim, L, L))
    keT = jax.random.normal(ks[4], (cdim, L, L))
    ve = jax.random.normal(ks[5], (gp, L, L))
    gamma = jax.random.normal(ks[6], (3, g)) * 0.2 + 1.0
    beta = jax.random.normal(ks[7], (3, g))
    return q, k, qg, kg, v, qe, keT, ve, gamma, beta


def test_forward_values_and_moments():
    q, k, qg, kg, v, qe, keT, ve, gamma, beta = _inputs()
    sv_r, sve_r, mu_r, var_r = _xla_core(q, k, qg, kg, v, qe, keT, ve,
                                         gamma, beta)
    sv, sve, mu, var = fused_axial_train(q, k, qg, kg, v, qe, keT, ve,
                                         gamma, EPS, True)
    np.testing.assert_allclose(mu, mu_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(var, var_r, rtol=1e-5, atol=1e-5)
    # BN shifts are softmax-invariant: fused output (no beta) must equal
    # the full-BN reference
    np.testing.assert_allclose(sv, sv_r, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(sve, sve_r, rtol=2e-4, atol=2e-4)


def test_gradients_match_autodiff_of_xla_path():
    q, k, qg, kg, v, qe, keT, ve, gamma, beta = _inputs(1)
    w1 = jax.random.normal(jax.random.PRNGKey(42), (6, 16, 2, 4))
    w2 = jax.random.normal(jax.random.PRNGKey(43), (6, 16, 2, 4))

    def loss_ref(args):
        q, k, qg, kg, v, qe, keT, ve, gamma, beta = args
        sv, sve, _, _ = _xla_core(q, k, qg, kg, v, qe, keT, ve, gamma, beta)
        return jnp.sum(sv * w1) + jnp.sum(sve * w2)

    def loss_fused(args):
        q, k, qg, kg, v, qe, keT, ve, gamma = args
        sv, sve, _, _ = fused_axial_train(q, k, qg, kg, v, qe, keT, ve,
                                          gamma, EPS, True)
        return jnp.sum(sv * w1) + jnp.sum(sve * w2)

    g_ref = jax.grad(loss_ref)((q, k, qg, kg, v, qe, keT, ve, gamma, beta))
    g_fus = jax.grad(loss_fused)((q, k, qg, kg, v, qe, keT, ve, gamma))

    names = ["q", "k", "qg", "kg", "v", "qe", "keT", "ve", "gamma"]
    for name, a, b in zip(names, g_fus, g_ref[:9]):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4,
                                   err_msg=f"grad({name})")
    # beta gradient is exactly zero (softmax-backward rows sum to zero)
    np.testing.assert_allclose(g_ref[9], 0.0, atol=1e-5)


def test_gradcheck_finite_difference():
    """Spot finite-difference check on gamma (covers the e*xhat term)."""
    q, k, qg, kg, v, qe, keT, ve, gamma, _ = _inputs(2, n=3, L=8)

    def f(gm):
        sv, sve, _, _ = fused_axial_train(q, k, qg, kg, v, qe, keT, ve,
                                          gm, EPS, True)
        return jnp.sum(jnp.sin(sv)) + jnp.sum(sve * sve)

    g = jax.grad(f)(gamma)
    h = 1e-3
    for idx in [(0, 0), (1, 1), (2, 0)]:
        gp_ = gamma.at[idx].add(h)
        gm_ = gamma.at[idx].add(-h)
        fd = (f(gp_) - f(gm_)) / (2 * h)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("mode", ["base", "gated"])
def test_module_train_parity_xla_vs_fused(mode):
    """AxialAttention train step: fused path == XLA path (outputs, grads,
    updated running stats)."""
    from unet_zoo_tpu.models.medt_net import AxialAttention

    b, h, w, cin, planes = 2, 8, 8, 16, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin))

    def run(use_pallas):
        m = AxialAttention(out_planes=planes, groups=4,
                           kernel_size=8, mode=mode, use_pallas=use_pallas)
        v = m.init(jax.random.PRNGKey(1), x, train=False)

        def loss(params):
            out, mut = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(out * out), (out, mut["batch_stats"])

        (l, (out, bs)), grads = jax.value_and_grad(
            loss, has_aux=True)(v["params"])
        return l, out, bs, grads

    l_x, out_x, bs_x, g_x = run(False)
    l_f, out_f, bs_f, g_f = run(True)
    # the loss sums ~2k squared outputs: f32 reordering noise accumulates
    np.testing.assert_allclose(l_f, l_x, rtol=5e-3)
    np.testing.assert_allclose(out_f, out_x, rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a_, b_: np.testing.assert_allclose(a_, b_, rtol=1e-4,
                                                  atol=1e-4),
        bs_f, bs_x)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_f))
    assert set(flat_f) == {p for p, _ in flat_x}
    for path, gx in flat_x:
        np.testing.assert_allclose(flat_f[path], gx, rtol=1e-3, atol=1e-3,
                                   err_msg=str(path))
