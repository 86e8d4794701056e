"""Fused-MLP (TCNN-analog) tests: Pallas kernel equality vs the plain jnp
chain (the Triton-kernel test discipline of SURVEY.md §4 — reference
tests/test_triton_gae.py), exact gradients through the custom VJP,
parameter-tree interchangeability with the plain MLP module, and an
end-to-end training smoke via ``network.mlp.fused: true`` (the analog of
the reference's tcnn net, rl_games/networks/tcnn_mlp.py:6-43)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rl_games_tpu.ops.fused_mlp import fused_mlp, fused_mlp_pallas, plain_mlp


def _random_net(key, dims):
    ws, bs = [], []
    for i in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (dims[i], dims[i + 1])) * 0.3)
        bs.append(jax.random.normal(k2, (dims[i + 1],)) * 0.1)
    return tuple(ws), tuple(bs)


@pytest.mark.parametrize("activation", ["relu", "elu", "tanh", "sigmoid"])
@pytest.mark.parametrize("dims,batch", [
    ((37, 50, 33, 7), 19),      # everything unaligned
    ((26, 256, 128, 64), 512),  # the bench workload's torso
    ((4, 8), 1),                # single row, single layer
    ((130, 257), 1030),         # just past lane/sublane boundaries
])
def test_fused_kernel_matches_plain(activation, dims, batch):
    """Pallas kernel (interpret mode) == plain jnp chain, incl. activations
    whose f(0) != 0 (sigmoid) which exercise the padded-lane annihilation
    argument."""
    key = jax.random.PRNGKey(0)
    ws, bs = _random_net(key, dims)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, dims[0]))
    expected = plain_mlp(x, ws, bs, activation)
    got = fused_mlp_pallas(x, ws, bs, activation, interpret=True, block_b=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_fused_mlp_grads_exact():
    """custom_vjp grads == autodiff through the plain chain."""
    ws, bs = _random_net(jax.random.PRNGKey(2), (9, 24, 5))
    x = jax.random.normal(jax.random.PRNGKey(3), (17, 9))

    def loss_fused(x, ws, bs):
        return jnp.sum(fused_mlp(x, ws, bs, "elu") ** 2)

    def loss_plain(x, ws, bs):
        return jnp.sum(plain_mlp(x, ws, bs, "elu") ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, ws, bs)
    g2 = jax.grad(loss_plain, argnums=(0, 1, 2))(x, ws, bs)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fused_module_param_tree_matches_mlp():
    """FusedMLP and MLP produce byte-identical parameter trees from the
    same rng (same Dense_{i}/Dense_0 scopes, same init), and the same
    outputs — fused and plain checkpoints are interchangeable."""
    from rl_games_tpu.models import layers as L

    units = (32, 16)
    x = jax.random.normal(jax.random.PRNGKey(4), (6, 11))
    plain = L.build_mlp(units, "elu", initializer={"name": "default"})
    fused = L.build_mlp(units, "elu", initializer={"name": "default"},
                        fused=True)
    p_plain = plain.init(jax.random.PRNGKey(5), x)
    p_fused = fused.init(jax.random.PRNGKey(5), x)
    flat_p = jax.tree_util.tree_flatten_with_path(p_plain)
    flat_f = jax.tree_util.tree_flatten_with_path(p_fused)
    assert [k for k, _ in flat_p[0]] == [k for k, _ in flat_f[0]]
    for (_, a), (_, b) in zip(flat_p[0], flat_f[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # cross-application: plain params drive the fused module and vice versa
    y_plain = plain.apply(p_plain, x)
    y_fused = fused.apply(p_plain, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               rtol=1e-6, atol=1e-6)


def test_fused_rejects_d2rl_and_norm():
    from rl_games_tpu.models import layers as L

    with pytest.raises(ValueError):
        L.build_mlp((8,), "relu", d2rl=True, fused=True)
    with pytest.raises(ValueError):
        L.build_mlp((8,), "relu", norm_func_name="layer_norm", fused=True)


def test_fused_mlp_trains_cartpole():
    """network.mlp.fused: true end-to-end — the tcnn-style config surface
    trains CartPole through the standard PPO path."""
    from rl_games_tpu.algos.ppo import PPOAgent
    from test_ppo import cartpole_params, run_epochs

    params = cartpole_params()
    params["network"]["mlp"]["fused"] = True
    agent = PPOAgent("t", params)
    state, m = run_epochs(agent, 60)
    assert float(m["mean_rewards"][0]) > 60.0
