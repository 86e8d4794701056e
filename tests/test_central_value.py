"""Asymmetric actor-critic (central value) tests — the TestAsymmetricCritic
path (reference envs/test/test_asymmetric_env.py + central_value.py)."""

import numpy as np
import jax

from rl_games_tpu.algos.ppo import PPOAgent


def asym_params(**config_over):
    cfg = {
        "env_name": "test_asymmetric_env", "num_actors": 16,
        "horizon_length": 32, "minibatch_size": 256, "mini_epochs": 4,
        "learning_rate": 3e-4, "lr_schedule": "adaptive",
        "kl_threshold": 0.008, "e_clip": 0.2, "clip_value": True,
        "gamma": 0.99, "tau": 0.95, "critic_coef": 1.0,
        "entropy_coef": 0.01, "grad_norm": 1.0, "truncate_grads": True,
        "normalize_advantage": True, "normalize_input": True,
        "normalize_value": True, "value_bootstrap": True, "seed": 7,
        "central_value_config": {
            "learning_rate": 5e-4,
            "mini_epochs": 4,
            "minibatch_size": 256,
            "clip_value": True,
            "normalize_input": True,
            "truncate_grads": True,
            "grad_norm": 1.0,
            "network": {
                "name": "actor_critic",
                "central_value": True,
                "mlp": {"units": [32, 16], "activation": "elu",
                        "initializer": {"name": "default"}},
            },
        },
    }
    cfg.update(config_over)
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


def test_central_value_trains():
    agent = PPOAgent("t", asym_params())
    assert agent.has_central_value
    assert not agent.has_value_loss
    state = agent.init_state()
    assert state.cv_params is not None
    cv_params_before = jax.device_get(state.cv_params)
    fn = agent.make_train_fn()
    state, m = fn(state)
    assert "cval_loss" in m
    assert np.isfinite(float(m["cval_loss"]))
    # c_loss excluded from the actor update when central value owns it
    assert float(m["c_loss"]) == 0.0
    # cv params actually moved
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        cv_params_before, jax.device_get(state.cv_params),
    )
    assert max(jax.tree.leaves(diffs)) > 0


def test_asymmetric_rnn_learns():
    """Central value net with its OWN recurrent core (central_value.py:
    100-107, 189-203) alongside a recurrent actor — the memory task with a
    central state (configs/test/test_rnn_multidiscrete_asymmetric analog).
    MemoryEnv hides the goal after step 1: only memory can solve it."""
    # the proven memory-task recipe (test_ppo_rnn.test_rnn_memory_task_
    # learns) with the central-value critic switched on
    params = asym_params(
        env_name="test_env",
        env_config={"use_central_value": True, "hide_object": True,
                    "apply_dist_reward": True},
        num_actors=64, horizon_length=64, minibatch_size=1024,
        seq_length=8, mini_epochs=4, learning_rate=5e-4,
        lr_schedule=None, tau=0.9, clip_value=False, entropy_coef=0.005,
        normalize_input=False, normalize_value=False,
    )
    params["network"] = {
        "name": "actor_critic", "separate": False,
        "mlp": {"units": [64], "activation": "relu",
                "initializer": {"name": "default"}},
        "rnn": {"name": "lstm", "units": 64, "layers": 1},
        "space": {"discrete": {}},
    }
    params["config"]["central_value_config"]["network"] = {
        "name": "actor_critic", "central_value": True,
        "mlp": {"units": [64], "activation": "relu",
                "initializer": {"name": "default"}},
        "rnn": {"name": "lstm", "units": 64, "layers": 1},
    }
    params["config"]["central_value_config"]["minibatch_size"] = 1024
    agent = PPOAgent("t", params)
    assert agent.is_rnn and agent.cv_is_rnn
    state = agent.init_state()
    assert state.cv_rnn_states is not None
    fn = agent.make_train_fn()
    m = None
    for _ in range(150):
        state, m = fn(state)
    assert np.isfinite(float(m["cval_loss"]))
    # starts at ~ -3.0 (random-walk distance penalty); clear learning
    assert float(m["mean_rewards"][0]) > -1.5
    assert float(m["mean_lengths"]) < 19.5


def test_asymmetric_cartpole_learns():
    """Velocity-masked CartPole is a POMDP: a memoryless policy plateaus
    around ~44 (measured). The gate checks clear learning above the random
    baseline (~20) with the central-value critic seeing full state."""
    agent = PPOAgent("t", asym_params())
    state = agent.init_state()
    fn = agent.make_train_fn()
    m = None
    for _ in range(100):
        state, m = fn(state)
    assert float(m["mean_rewards"][0]) > 35.0
