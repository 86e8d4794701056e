"""PPO end-to-end tests: tiny real training runs (SURVEY.md §4 technique 1)
plus jit-under-mesh data-parallel checks that the reference has no analog for."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rl_games_tpu.algos.ppo import PPOAgent, meters_init, meters_update, meters_mean


def cartpole_params(**config_overrides):
    cfg = {
        "env_name": "CartPole-v1", "num_actors": 16, "horizon_length": 32,
        "minibatch_size": 256, "mini_epochs": 4, "learning_rate": 3e-4,
        "lr_schedule": "adaptive", "kl_threshold": 0.008,
        "e_clip": 0.2, "clip_value": True, "gamma": 0.99, "tau": 0.95,
        "critic_coef": 1.0, "entropy_coef": 0.01, "grad_norm": 1.0,
        "truncate_grads": True, "normalize_advantage": True,
        "normalize_input": True, "normalize_value": True,
        "value_bootstrap": True, "seed": 7,
    }
    cfg.update(config_overrides)
    return {
        "algo": {"name": "a2c_discrete"},
        "model": {"name": "discrete_a2c"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [32, 32], "activation": "elu",
                    "initializer": {"name": "default"}},
            "space": {"discrete": {}},
        },
        "config": cfg,
    }


def pendulum_params(**config_overrides):
    cfg = {
        "env_name": "Pendulum-v1", "num_actors": 16, "horizon_length": 32,
        "minibatch_size": 256, "mini_epochs": 4, "learning_rate": 3e-4,
        "lr_schedule": "adaptive", "kl_threshold": 0.008, "schedule_type": "legacy",
        "e_clip": 0.2, "clip_value": True, "gamma": 0.99, "tau": 0.95,
        "critic_coef": 2.0, "entropy_coef": 0.0, "grad_norm": 1.0,
        "truncate_grads": True, "normalize_advantage": True,
        "normalize_input": True, "normalize_value": True,
        "bounds_loss_coef": 0.0001, "value_bootstrap": True, "seed": 7,
    }
    cfg.update(config_overrides)
    return {
        "algo": {"name": "a2c_continuous"},
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [64, 32], "activation": "elu",
                    "initializer": {"name": "default"}},
            "space": {
                "continuous": {
                    "mu_activation": "None", "sigma_activation": "None",
                    "mu_init": {"name": "default"},
                    "sigma_init": {"name": "const_initializer", "val": 0.0},
                    "fixed_sigma": True,
                }
            },
        },
        "config": cfg,
    }


def run_epochs(agent, n, mesh=None):
    state = agent.init_state()
    fn = agent.make_train_fn(mesh=mesh)
    m = None
    for _ in range(n):
        state, m = fn(state)
    return state, m


def test_meters_ring():
    m = meters_init(4, 1)
    vals = jnp.asarray([[1.0], [2.0], [3.0]])
    m = meters_update(m, vals, jnp.asarray([True, False, True]))
    assert int(m.count) == 2
    np.testing.assert_allclose(float(meters_mean(m)[0]), 2.0)  # (1+3)/2
    # wraps around
    m = meters_update(m, 10.0 * jnp.ones((3, 1)), jnp.ones(3, bool))
    assert int(m.count) == 4
    assert float(meters_mean(m)[0]) > 5.0


def test_cartpole_learns():
    agent = PPOAgent("t", cartpole_params())
    state, m = run_epochs(agent, 120)
    assert float(m["mean_rewards"][0]) > 150.0  # random policy is ~20
    assert np.isfinite(float(m["kl"]))


def test_pendulum_continuous_trains():
    agent = PPOAgent("t", pendulum_params())
    state, m = run_epochs(agent, 40)
    # pendulum rewards are negative; just confirm improvement over random
    # (random ~ -1200 mean episode reward) and finite diagnostics
    assert float(m["mean_rewards"][0]) > -1500.0
    for k in ("a_loss", "c_loss", "entropy", "b_loss", "kl"):
        assert np.isfinite(float(m[k])), k
    # adaptive scheduler stayed in bounds
    assert 1e-6 <= float(m["lr"]) <= 1e-2


def test_set_param_mutates_gamma_mid_run():
    """BaseAlgorithm get/set_param (interfaces/base_algorithm.py:5-49,
    a2c_common.py:725-772): config-level params mutate mid-run; the
    compiled epoch is re-derived and actually uses the new value."""
    agent = PPOAgent("t", cartpole_params(gamma=0.99))
    state = agent.init_state()
    fn = agent.make_train_fn(donate=False)
    state, m1 = fn(state)
    assert agent.get_param("gamma") == 0.99

    state = agent.set_param("gamma", 0.0, state)
    assert agent._program_stale
    agent._rebuild_stale_program()
    fn2 = agent.make_train_fn(donate=False)
    state_a, m_a = fn2(state)

    # same state through the OLD program (gamma 0.99 baked in) diverges —
    # proving the new program picked the new constant up
    state_b, m_b = fn(state)
    assert float(m_a["c_loss"]) != float(m_b["c_loss"])
    assert agent.get_param("gamma") == 0.0

    # state-resident params mutate without recompile
    state = agent.set_param("entropy_coef", 0.05, state_a)
    assert abs(agent.get_param("entropy_coef", state) - 0.05) < 1e-7
    assert not agent._program_stale


def test_full_state_weights_roundtrip():
    """get/set_full_state_weights (a2c_common.py:650-688)."""
    agent = PPOAgent("t", cartpole_params())
    state = agent.init_state()
    fn = agent.make_train_fn(donate=False)
    state, _ = fn(state)
    full = agent.get_full_state_weights(state, last_mean_rewards=12.5)
    assert full["epoch"] == 1 and full["last_mean_rewards"] == 12.5

    fresh = agent.init_state()
    restored = agent.set_full_state_weights(fresh, full)
    assert int(restored.epoch) == 1
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )
    # set_epoch=False keeps the target's counters (PBT warm-start)
    kept = agent.set_full_state_weights(fresh, full, set_epoch=False)
    assert int(kept.epoch) == 0


def test_pbt_adoption_resets_optimizer():
    agent = PPOAgent("t", cartpole_params())
    state = agent.init_state()
    fn = agent.make_train_fn(donate=False)
    state, _ = fn(state)
    # Adam moments are nonzero after a step; reset zeroes them
    mu_leaf = jax.tree.leaves(state.opt_state)[0]
    assert float(jnp.abs(np.asarray(mu_leaf)).max()) > 0.0
    reset = agent.reset_optimizer(state)
    mu_leaf2 = jax.tree.leaves(reset.opt_state)[0]
    assert float(jnp.abs(np.asarray(mu_leaf2)).max()) == 0.0


def test_use_diagnostics_per_miniepoch_family():
    """PpoDiagnostics analog (diagnostics.py:18-60): per-miniepoch kl and
    clip-frac arrays plus normalizer-state scalars in the metrics."""
    agent = PPOAgent("t", cartpole_params(use_diagnostics=True))
    state, m = run_epochs(agent, 3)
    diag = m["_diag"]
    assert diag["kl"].shape == (4,)
    assert diag["clip_frac"].shape == (4,)
    assert np.isfinite(np.asarray(diag["kl"])).all()
    assert "obs_rms_mean" in diag and "value_rms_mean" in diag
    assert abs(float(m["e_clip"]) - 0.2) < 1e-6


def test_value_normalizer_updates_from_values_and_returns():
    """Parity with the reference's two sequential train-mode forwards
    (a2c_common.py:1325-1332): the value-normalizer count advances by
    2 x batch per epoch (values batch + returns batch)."""
    agent = PPOAgent("t", cartpole_params())
    state = agent.init_state()
    fn = agent.make_train_fn(donate=False)
    c0 = int(state.norm.value.count)
    state, _ = fn(state)
    c1 = int(state.norm.value.count)
    assert c1 - c0 == 2 * agent.batch_size


def test_schedule_types_run():
    for schedule in ("legacy", "standard"):
        agent = PPOAgent("t", pendulum_params(schedule_type=schedule))
        _, m = run_epochs(agent, 2)
        assert np.isfinite(float(m["kl"]))


def test_determinism_same_seed():
    a1 = PPOAgent("t", cartpole_params())
    a2 = PPOAgent("t", cartpole_params())
    _, m1 = run_epochs(a1, 3)
    _, m2 = run_epochs(a2, 3)
    np.testing.assert_allclose(
        float(m1["a_loss"]), float(m2["a_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m1["kl"]), float(m2["kl"]), rtol=1e-4, atol=1e-7
    )


def test_multichip_data_parallel():
    """The same epoch program over an 8-device ('data',) mesh."""
    from rl_games_tpu.parallel.mesh import create_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(jax.devices()[:8])
    agent = PPOAgent("t", cartpole_params(num_actors=32))
    state, m = run_epochs(agent, 3, mesh=mesh)
    assert np.isfinite(float(m["a_loss"]))
    assert int(m["frame"]) == 3 * 32 * 32


def test_multichip_matches_single_chip():
    """1-chip == N-chip math at fixed global batch (SURVEY.md §7 step 7)."""
    from rl_games_tpu.parallel.mesh import create_mesh

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    agent1 = PPOAgent("t", cartpole_params(num_actors=16))
    agentN = PPOAgent("t", cartpole_params(num_actors=16))
    _, m1 = run_epochs(agent1, 2)
    mesh = create_mesh(jax.devices()[:4])
    _, mN = run_epochs(agentN, 2, mesh=mesh)
    np.testing.assert_allclose(
        float(m1["a_loss"]), float(mN["a_loss"]), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        float(m1["c_loss"]), float(mN["c_loss"]), rtol=1e-3, atol=1e-5
    )


def test_mixed_precision_trains():
    """bf16 compute with fp32 master params still learns CartPole."""
    agent = PPOAgent("t", cartpole_params(mixed_precision=True))
    state, m = run_epochs(agent, 60)
    assert float(m["mean_rewards"][0]) > 60.0
    # master params stayed f32
    import jax

    dtypes = {x.dtype for x in jax.tree.leaves(state.params)}
    assert all(str(d) == "float32" for d in dtypes)


def test_twohot_value_head_trains_cartpole():
    """'value_head: twohot' (network_builder.py:200-208 +
    common/layers/value.py:26-45): 255-bin two-hot value head, decoded via
    symexp, trains CartPole."""
    params = cartpole_params()
    params["network"]["value_head"] = "twohot"
    agent = PPOAgent("t", params)
    state, m = run_epochs(agent, 100)
    assert float(m["mean_rewards"][0]) > 100.0
    assert np.isfinite(float(m["c_loss"]))


def test_onehot_dist_straight_through():
    from rl_games_tpu.models.distributions import OneHotDist

    logits = jnp.asarray([[2.0, 0.5, -1.0]])

    def f(lg):
        return (OneHotDist(lg).mode() * jnp.asarray([1.0, 2.0, 3.0])).sum()

    val = f(logits)
    assert float(val) == 1.0  # argmax bin 0
    g = jax.grad(f)(logits)
    # mode() straight-through is IDENTITY w.r.t. the raw logits
    # (reference distributions.py:56-58: _mode.detach() + logits -
    # logits.detach()), not the softmax Jacobian
    np.testing.assert_allclose(np.asarray(g), [[1.0, 2.0, 3.0]], rtol=1e-6)
    s = OneHotDist(logits).sample(jax.random.PRNGKey(0))
    assert s.shape == logits.shape and float(s.sum()) == 1.0
    # sample() straight-through flows through the softmax probs
    gs = jax.grad(
        lambda lg: (OneHotDist(lg).sample(jax.random.PRNGKey(0))
                    * jnp.asarray([1.0, 2.0, 3.0])).sum()
    )(logits)
    assert float(jnp.abs(gs).sum()) > 0.0


def test_soft_augmentation_consistency_loss():
    """features.soft_augmentation (common/transforms/soft_augmentation.py):
    KL-consistency between the policy on original and augmented obs enters
    the total loss; training still works."""
    params = cartpole_params()
    params["config"]["features"] = {
        "soft_augmentation": {
            "transform": {"name": "gaussian_noise", "std": 0.05},
            "aug_coef": 0.01,
        }
    }
    agent = PPOAgent("t", params)
    assert agent.soft_aug is not None
    state, m = run_epochs(agent, 40)
    assert np.isfinite(float(m["a_loss"]))
    assert float(m["mean_rewards"][0]) > 40.0


def test_normalize_rms_advantage_uses_generalized_stats():
    """normalize_rms_advantage uses the reference's GeneralizedMovingStats
    'mean_std' math (EMA of mean and E[x²] from zero, ±5 clamp —
    a2c_common.py:342-344, moving_mean_std.py:50-126), not a plain EMA of
    batch variance; CartPole still trains under it."""
    from rl_games_tpu.ops.running_stats import GeneralizedMovingStatsState

    params = cartpole_params(normalize_rms_advantage=True)
    agent = PPOAgent("t", params)
    state = agent.init_state()
    assert isinstance(state.adv_rms, GeneralizedMovingStatsState)
    state, m = run_epochs(agent, 60)
    assert float(m["mean_rewards"][0]) > 60.0
    # stats actually advanced (E[x²] EMA moved off zero)
    assert float(jnp.abs(state.adv_rms.high)) > 0.0
