"""Multi-agent PPO tests: flattened agents-minor batch, shared per-env done,
per-env episode stats, central value over joint state."""

import numpy as np
import jax
import jax.numpy as jnp

from rl_games_tpu.envs.registry import create_vec_env
from rl_games_tpu.algos.ppo import PPOAgent


def test_multiagent_vecenv_contract():
    env = create_vec_env("cooperative_gather", 4)
    assert env.num_agents == 3
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs["obs"].shape == (12, 2)       # N*A rows
    assert obs["states"].shape == (12, 6)    # joint state per row
    state, obs, rew, done, infos = env.step(state, jnp.zeros((12, 1)))
    assert rew.shape == (12,)
    assert done.shape == (12,)
    # per-env done shared across that env's agent rows
    d = np.asarray(done).reshape(4, 3)
    assert (d == d[:, :1]).all()


def ma_params(**over):
    cfg = {
        "env_name": "cooperative_gather", "num_actors": 8,
        "horizon_length": 16, "minibatch_size": 128, "mini_epochs": 2,
        "learning_rate": 5e-4, "lr_schedule": "adaptive",
        "kl_threshold": 0.008, "e_clip": 0.2, "clip_value": True,
        "gamma": 0.99, "tau": 0.95, "critic_coef": 1.0,
        "entropy_coef": 0.0, "grad_norm": 1.0, "truncate_grads": True,
        "normalize_advantage": True, "normalize_input": False,
        "normalize_value": False, "value_bootstrap": True, "seed": 5,
        "bounds_loss_coef": 0.0001,
    }
    cfg.update(over)
    return {
        "algo": {"name": "a2c_continuous"},
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [32, 32], "activation": "elu",
                    "initializer": {"name": "default"}},
            "space": {"continuous": {
                "mu_activation": "None", "sigma_activation": "None",
                "mu_init": {"name": "default"},
                "sigma_init": {"name": "const_initializer", "val": 0.0},
                "fixed_sigma": True}},
        },
        "config": cfg,
    }


def test_multiagent_ppo_learns():
    agent = PPOAgent("t", ma_params())
    assert agent.num_agents == 3
    assert agent.batch_size == 16 * 8 * 3
    state = agent.init_state()
    fn = agent.make_train_fn()
    m = None
    for _ in range(120):
        state, m = fn(state)
    # random ~ -0.7*64 steps; near-optimal approaches small negative values
    assert float(m["mean_rewards"][0]) > -20.0


def test_multiagent_central_value():
    p = ma_params()
    p["config"]["central_value_config"] = {
        "learning_rate": 5e-4, "mini_epochs": 2, "minibatch_size": 128,
        "clip_value": True, "normalize_input": False,
        "network": {
            "name": "actor_critic", "central_value": True,
            "mlp": {"units": [32], "activation": "elu",
                    "initializer": {"name": "default"}},
        },
    }
    agent = PPOAgent("t", p)
    state = agent.init_state()
    fn = agent.make_train_fn()
    state, m = fn(state)
    assert np.isfinite(float(m["cval_loss"]))
