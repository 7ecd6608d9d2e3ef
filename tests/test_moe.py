"""Switch-MoE (nn/moe.py) + expert parallelism (parallel/expert.py).

Superset capability — the reference has no MoE; these tests pin the
routing semantics against an independent per-token reference and prove
the EP sharding trains on a (data, model) mesh.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_zoo_tpu.models import create_model, list_models
from unet_zoo_tpu.nn.moe import SwitchMoEMLP


def _reference_moe(x_tokens, params, num_experts, cap, gelu):
    """Independent numpy per-token implementation of top-1 routing with
    capacity: token order queueing, over-capacity drop, gate scaling."""
    router = np.asarray(params["router_kernel"], np.float32)
    w1 = np.asarray(params["expert_fc1_kernel"], np.float32)
    b1 = np.asarray(params["expert_fc1_bias"], np.float32)
    w2 = np.asarray(params["expert_fc2_kernel"], np.float32)
    b2 = np.asarray(params["expert_fc2_bias"], np.float32)

    logits = x_tokens @ router
    e_logits = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e_logits / e_logits.sum(-1, keepdims=True)
    choice = probs.argmax(-1)
    gate = probs.max(-1)

    counts = np.zeros(num_experts, np.int64)
    y = np.zeros((x_tokens.shape[0], w2.shape[-1]), np.float32)
    for t in range(x_tokens.shape[0]):
        e = int(choice[t])
        counts[e] += 1
        if counts[e] > cap:
            continue  # dropped: residual carries the token
        h = gelu(x_tokens[t] @ w1[e] + b1[e])
        y[t] = gate[t] * (h @ w2[e] + b2[e])
    return y


def test_moe_matches_per_token_reference():
    d, e, hid = 8, 2, 16
    m = SwitchMoEMLP(num_experts=e, hidden_dim=hid, capacity_factor=1.25,
                     group_size=16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 4, d)),
                    jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(variables, x)

    cap = math.ceil(1.25 * 16 / e)
    gelu = lambda v: np.asarray(
        jax.nn.gelu(jnp.asarray(v), approximate=False))
    ref = _reference_moe(np.asarray(x.reshape(-1, d)), variables["params"],
                         e, cap, gelu)
    np.testing.assert_allclose(np.asarray(got).reshape(-1, d), ref,
                               atol=1e-5, rtol=1e-5)


def test_moe_capacity_drop_zeroes_overflow_tokens():
    """capacity 1: only the first token routed to each expert produces
    output; the rest must be exactly zero (residual-carried)."""
    d, e = 4, 2
    m = SwitchMoEMLP(num_experts=e, hidden_dim=8, capacity_factor=1e-9,
                     group_size=8)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, d)),
                    jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    y = np.asarray(m.apply(variables, x))

    router = np.asarray(variables["params"]["router_kernel"])
    choice = np.asarray(x) @ router
    choice = choice.argmax(-1)
    seen = set()
    for t in range(8):
        if choice[t] in seen:
            np.testing.assert_array_equal(y[t], 0.0)
        else:
            assert np.abs(y[t]).max() > 0
            seen.add(choice[t])


def test_moe_groups_pad_and_restore_shape():
    m = SwitchMoEMLP(num_experts=2, hidden_dim=8, group_size=16)
    x = jnp.ones((3, 5, 4))  # 15 tokens: pads to 16, restores to 15
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (3, 5, 4)


def test_unext_moe_registry_and_aux_loss():
    assert "unext_moe" in list_models()
    model = create_model("unext_moe", image_size=32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    # expert-stacked params exist with the leading E axis
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    expert_leaves = [(jax.tree_util.keystr(p), l.shape) for p, l in flat
                     if "expert_" in jax.tree_util.keystr(p)]
    assert expert_leaves and all(s[0] == 4 for _, s in expert_leaves)

    # train-mode apply sows the load-balancing loss; eval does not
    out, mutated = model.module.apply(
        variables, x, train=True, mutable=["batch_stats", "aux_loss"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    aux = jax.tree_util.tree_leaves(mutated.get("aux_loss", {}))
    assert aux and all(float(a) > 0 for a in aux)
    assert out["main"].shape == (1, 32, 32, 1)


def test_unext_moe_ep_train_step_matches_single_device():
    """EP placement on a (data=2, model=4) mesh: expert leaves shard over
    'model', the jitted train step runs under GSPMD, and loss/Dice match
    the single-device step."""
    from unet_zoo_tpu.parallel import (
        create_mesh,
        shard_batch,
        shard_state_ep,
    )
    from unet_zoo_tpu.train.steps import create_train_state, make_train_step

    model = create_model("unext_moe", image_size=32)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    y = jnp.asarray((rng.standard_normal((4, 32, 32, 1)) > 0.0), jnp.float32)

    state_1 = create_train_state(model, jax.random.PRNGKey(0), x[:1],
                                 learning_rate=1e-3)
    state_ep = create_train_state(model, jax.random.PRNGKey(0), x[:1],
                                  learning_rate=1e-3)

    step = make_train_step(model)
    state_1, met_1 = step(state_1, x, y)

    mesh = create_mesh(jax.devices()[:8], model_axis=4)
    state_ep = shard_state_ep(mesh, state_ep)
    # at least one expert leaf is actually sharded
    leaf = state_ep.params["block1_1"]["moe_mlp"]["expert_fc1_kernel"]
    assert not leaf.sharding.is_fully_replicated
    x_ep, y_ep = shard_batch(mesh, x, y)
    state_ep, met_ep = step(state_ep, x_ep, y_ep)

    assert abs(float(met_1["loss"]) - float(met_ep["loss"])) < 1e-4
    assert abs(float(met_1["dice"]) - float(met_ep["dice"])) < 1e-4
    assert int(state_ep.step) == 1
