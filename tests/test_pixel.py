"""Pixel-path end-to-end: PPO with a conv torso learns the device-resident
PixelCatcher env (the Atari/envpool role — reference proves its conv nets on
ALE, docs/ENVPOOL.md:65-66; here the pixels never leave the accelerator)."""

import jax
import jax.numpy as jnp
import numpy as np

from rl_games_tpu.algos.ppo import PPOAgent, meters_mean
from rl_games_tpu.envs.jax.pixel import PixelCatcher


def catcher_params(**config_overrides):
    cfg = {
        "env_name": "PixelCatcher-v0", "num_actors": 64,
        "horizon_length": 34, "minibatch_size": 1088, "mini_epochs": 2,
        "learning_rate": 1e-3, "lr_schedule": "adaptive",
        "kl_threshold": 0.008, "e_clip": 0.2, "clip_value": True,
        "gamma": 0.99, "tau": 0.95, "critic_coef": 1.0,
        "entropy_coef": 0.01, "grad_norm": 1.0, "truncate_grads": True,
        "normalize_advantage": True, "normalize_input": True,
        "normalize_value": True, "value_bootstrap": True, "seed": 11,
    }
    cfg.update(config_overrides)
    return {
        "algo": {"name": "a2c_discrete"},
        "model": {"name": "discrete_a2c"},
        "network": {
            "name": "actor_critic", "separate": False,
            "cnn": {
                "type": "conv2d", "activation": "elu",
                "initializer": {"name": "default"},
                "convs": [
                    {"filters": 8, "kernel_size": 4, "strides": 2,
                     "padding": 0},
                    {"filters": 16, "kernel_size": 3, "strides": 2,
                     "padding": 0},
                ],
            },
            "mlp": {"units": [64], "activation": "elu",
                    "initializer": {"name": "default"}},
            "space": {"discrete": {}},
        },
        "config": cfg,
    }


def test_env_render_and_episode():
    env = PixelCatcher()
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    assert obs.shape == (16, 16, 1)
    assert float(obs.max()) == 1.0  # ball pixel
    assert float(obs.sum()) == 1.0 + 0.5 * 3  # ball + 3 paddle pixels
    # run straight down: terminates on the paddle row with reward ±1
    total = 0.0
    for _ in range(20):
        state, obs, reward, terminated, _ = env.step(
            state, jnp.int32(1), key
        )
        total += float(reward)
        if bool(terminated):
            break
    assert bool(terminated)
    assert total in (1.0, -1.0)


def test_pixel_ppo_learns_catch():
    agent = PPOAgent("pixel_test", catcher_params())
    state = agent.init_state()
    fn = agent.make_train_fn()
    m = None
    for _ in range(60):
        state, m = fn(state)
    mean_r = float(np.asarray(meters_mean(state.game_rewards)).reshape(-1)[0])
    # random play ~= -0.6; a working conv torso clears +0.8 easily
    assert mean_r > 0.8, f"pixel PPO failed to learn: mean reward {mean_r}"
