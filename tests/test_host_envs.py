"""Host-env (gymnasium) bridge tests: 4-tuple contract, PPO and SAC host
rollout paths (the reference's Ray/envpool-style host loop)."""

import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")

from rl_games_tpu.envs.host.gymnasium_env import GymnasiumVecEnv
from rl_games_tpu.algos.ppo import PPOAgent
from rl_games_tpu.algos.sac import SACAgent


def test_gymnasium_vecenv_contract():
    env = GymnasiumVecEnv("CartPole-v1", 4, seed=0)
    obs = env.reset()
    assert obs.shape == (4, 4) and obs.dtype == np.float32
    obs, rewards, dones, infos = env.step(np.zeros(4, np.int64))
    assert rewards.shape == (4,) and dones.shape == (4,)
    assert "time_outs" in infos
    info = env.get_env_info()
    assert info.action_space.n == 2
    env.close()


def test_gymnasium_truncation_sets_time_outs():
    env = GymnasiumVecEnv("Pendulum-v1", 2, seed=0)
    env.reset()
    for _ in range(200):
        obs, rewards, dones, infos = env.step(np.zeros((2, 1), np.float32))
    assert dones.all()
    assert infos["time_outs"].all()
    assert "final_observation" in infos
    env.close()


def test_ppo_host_path_learns_cartpole():
    params = {
        "algo": {"name": "a2c_discrete"},
        "model": {"name": "discrete_a2c"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [32, 32], "activation": "elu",
                    "initializer": {"name": "default"}},
            "space": {"discrete": {}},
        },
        "config": {
            "env_name": "CartPole-v1", "vecenv_type": "GYMNASIUM",
            "num_actors": 8, "horizon_length": 32, "minibatch_size": 128,
            "mini_epochs": 4, "learning_rate": 3e-4,
            "lr_schedule": "adaptive", "kl_threshold": 0.008,
            "e_clip": 0.2, "clip_value": True, "gamma": 0.99, "tau": 0.95,
            "critic_coef": 1.0, "entropy_coef": 0.01, "grad_norm": 1.0,
            "truncate_grads": True, "normalize_advantage": True,
            "normalize_input": True, "normalize_value": True,
            "value_bootstrap": True, "seed": 7,
            "env_config": {"seed": 7},
        },
    }
    agent = PPOAgent("t", params)
    assert agent.is_host_env
    state = agent.init_state()
    fn = agent.make_train_fn()
    m = None
    for _ in range(60):
        state, m = fn(state)
    assert float(m["mean_rewards"][0]) > 60.0  # random ~20
    assert int(m["frame"]) == 60 * 8 * 32


def test_sac_host_path_runs():
    params = {
        "algo": {"name": "sac"},
        "model": {"name": "soft_actor_critic"},
        "network": {
            "name": "soft_actor_critic", "separate": True,
            "mlp": {"units": [32, 32], "activation": "relu",
                    "initializer": {"name": "default"}},
            "log_std_bounds": [-5, 2],
        },
        "config": {
            "env_name": "Pendulum-v1", "vecenv_type": "GYMNASIUM",
            "num_actors": 4, "num_steps_per_episode": 4, "batch_size": 64,
            "replay_buffer_size": 10000, "num_warmup_steps": 1,
            "utd_ratio": 0.5, "gamma": 0.99, "init_alpha": 1.0,
            "alpha_lr": 5e-3, "actor_lr": 3e-4, "critic_lr": 3e-4,
            "critic_tau": 0.005, "learnable_temperature": True,
            "normalize_input": True, "value_bootstrap": True, "seed": 7,
            "env_config": {"seed": 7},
        },
    }
    agent = SACAgent("t", params)
    assert agent.is_host_env
    state = agent.init_state()
    fn = agent.make_train_fn()
    for _ in range(4):
        state, m = fn(state)
    assert int(state.update_counter) > 0
    assert np.isfinite(float(m["critic_loss"]))
    from rl_games_tpu.algos.sac import replay_size

    assert int(replay_size(state.replay)) == 4 * 4 * 4
