"""Device-resident env tests: dynamics vs gymnasium, autoreset, time_outs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rl_games_tpu.envs.jax.base import JaxVecEnv
from rl_games_tpu.envs.jax.classic import CartPole, Pendulum
from rl_games_tpu.envs.jax.test_envs import MemoryEnv, AsymmetricEnv
from rl_games_tpu.envs.registry import create_vec_env, ENV_CONFIGURATIONS


def test_cartpole_matches_gymnasium():
    gymnasium = pytest.importorskip("gymnasium")
    genv = gymnasium.make("CartPole-v1")
    genv.reset(seed=0)
    # force a known state
    state = np.asarray([0.01, -0.02, 0.03, 0.04], np.float32)
    genv.unwrapped.state = state

    jenv = CartPole()
    from rl_games_tpu.envs.jax.classic import ArrayState

    estate = ArrayState(x=jnp.asarray(state))
    for action in [0, 1, 1, 0, 1]:
        gobs, grew, gterm, gtrunc, _ = genv.step(action)
        estate, jobs, jrew, jterm, _ = jenv.step(
            estate, jnp.int32(action), jax.random.PRNGKey(0)
        )
        np.testing.assert_allclose(np.asarray(jobs), gobs, rtol=1e-4, atol=1e-5)
        assert float(jrew) == grew
        assert bool(jterm) == gterm


def test_pendulum_matches_gymnasium():
    gymnasium = pytest.importorskip("gymnasium")
    genv = gymnasium.make("Pendulum-v1")
    genv.reset(seed=0)
    genv.unwrapped.state = np.asarray([0.3, -0.5])

    jenv = Pendulum()
    from rl_games_tpu.envs.jax.classic import ArrayState

    estate = ArrayState(x=jnp.asarray([0.3, -0.5], jnp.float32))
    for u in [0.5, -1.0, 2.0]:
        gobs, grew, *_ = genv.step(np.asarray([u], np.float32))
        estate, jobs, jrew, *_ = jenv.step(
            estate, jnp.asarray([u]), jax.random.PRNGKey(0)
        )
        np.testing.assert_allclose(np.asarray(jobs), gobs, rtol=1e-4, atol=1e-5)
        assert float(jrew) == pytest.approx(float(grew), rel=1e-4)


def test_vecenv_autoreset_and_timeouts():
    env = JaxVecEnv(Pendulum(), num_envs=4, max_episode_steps=5)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 3)
    for t in range(4):
        state, obs, rew, done, info = env.step(state, jnp.zeros((4, 1)))
        assert not bool(done.any())
    state, obs, rew, done, info = env.step(state, jnp.zeros((4, 1)))
    assert bool(done.all())
    assert bool(info["time_outs"].all())  # truncation, not termination
    # steps reset → next step is not done
    state, obs, rew, done, info = env.step(state, jnp.zeros((4, 1)))
    assert not bool(done.any())


def test_vecenv_step_is_jittable_and_scannable():
    env = JaxVecEnv(CartPole(), num_envs=8)
    state, obs = env.reset(jax.random.PRNGKey(0))

    def roll(state, _):
        actions = jnp.zeros(8, jnp.int32)
        state, obs, rew, done, info = env.step(state, actions)
        return state, (rew, done)

    final, (rews, dones) = jax.jit(
        lambda s: jax.lax.scan(roll, s, None, length=30)
    )(state)
    assert rews.shape == (30, 8)
    # pushing left constantly must terminate within 30 steps and autoreset
    assert bool(dones.any())


def test_memory_env_reachable():
    env = JaxVecEnv(MemoryEnv(max_steps=21), num_envs=2)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, 6)
    # on reset the goal is visible
    assert np.all(np.abs(np.asarray(obs[:, 2:4])).sum(-1) > 0)
    state, obs, rew, done, info = env.step(state, jnp.zeros(2, jnp.int32))
    # after first step the goal is hidden
    np.testing.assert_allclose(np.asarray(obs[:, 2:4]), 0.0)


def test_asymmetric_env_dict_obs():
    env = JaxVecEnv(AsymmetricEnv(), num_envs=3)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert set(obs.keys()) == {"obs", "states"}
    np.testing.assert_allclose(np.asarray(obs["obs"][:, 1]), 0.0)  # vel masked
    state, obs, rew, done, info = env.step(state, jnp.zeros(3, jnp.int32))
    assert obs["states"].shape == (3, 4)


def test_registry():
    assert "CartPole-v1" in ENV_CONFIGURATIONS
    env = create_vec_env("Pendulum-v1", 6)
    state, obs = env.reset(jax.random.PRNGKey(1))
    assert obs.shape == (6, 3)


def test_arm2d_learns_reaching():
    """Arm2D (brax ur5e-class reach task): PPO cuts the mean distance
    penalty — per-episode reward must clearly improve over training."""
    from rl_games_tpu.algos.ppo import PPOAgent

    params = {
        "algo": {"name": "a2c_continuous"},
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [64, 64], "activation": "elu",
                    "initializer": {"name": "default"}},
            "space": {"continuous": {
                "mu_activation": "None", "sigma_activation": "None",
                "mu_init": {"name": "default"},
                "sigma_init": {"name": "const_initializer", "val": 0.0},
                "fixed_sigma": True,
            }},
        },
        "config": {
            "env_name": "Arm2D", "num_actors": 64, "horizon_length": 32,
            "minibatch_size": 512, "mini_epochs": 4, "learning_rate": 1e-3,
            "lr_schedule": "adaptive", "kl_threshold": 0.008,
            "e_clip": 0.2, "clip_value": True, "gamma": 0.99, "tau": 0.95,
            "critic_coef": 2.0, "entropy_coef": 0.0, "grad_norm": 1.0,
            "truncate_grads": True, "normalize_advantage": True,
            "normalize_input": True, "normalize_value": True,
            "bounds_loss_coef": 0.0001, "seed": 11,
        },
    }
    agent = PPOAgent("arm", params)
    state = agent.init_state()
    fn = agent.make_train_fn()
    first = None
    m = None
    for i in range(40):
        state, m = fn(state)
        if i == 4:
            first = float(m["mean_rewards"][0])
    last = float(m["mean_rewards"][0])
    assert last > first + 15.0, (first, last)


def test_grasp2d_learns_pick_and_place():
    """Grasp2D (brax 'grasp' claw task analog): PPO visibly improves —
    approach/grasp shaping drives reward up from the random baseline."""
    from rl_games_tpu.algos.ppo import PPOAgent

    params = {
        "algo": {"name": "a2c_continuous"},
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [64, 64], "activation": "elu",
                    "initializer": {"name": "default"}},
            "space": {"continuous": {
                "mu_activation": "None", "sigma_activation": "None",
                "mu_init": {"name": "default"},
                "sigma_init": {"name": "const_initializer", "val": 0.0},
                "fixed_sigma": True,
            }},
        },
        "config": {
            "env_name": "Grasp2D", "num_actors": 64, "horizon_length": 32,
            "minibatch_size": 512, "mini_epochs": 4, "learning_rate": 1e-3,
            "lr_schedule": "adaptive", "kl_threshold": 0.008,
            "e_clip": 0.2, "clip_value": True, "gamma": 0.99, "tau": 0.95,
            "critic_coef": 2.0, "entropy_coef": 0.0, "grad_norm": 1.0,
            "truncate_grads": True, "normalize_advantage": True,
            "normalize_input": True, "normalize_value": True,
            "bounds_loss_coef": 0.0001, "seed": 5,
        },
    }
    agent = PPOAgent("grasp", params)
    state = agent.init_state()
    fn = agent.make_train_fn()
    first = None
    m = None
    for i in range(50):
        state, m = fn(state)
        if i == 9:  # first full episodes land after 200 env steps
            first = float(m["mean_rewards"][0])
    last = float(m["mean_rewards"][0])
    assert last > first + 20.0, (first, last)


def test_player_runs_dict_obs_env():
    """BasePlayer on a genuine dict observation space (custom-network
    contract): the {'obs','states'} unwrap guard must not swallow real
    dict obs (reference players run these through the same model path)."""
    from rl_games_tpu.common.player import PpoPlayer

    params = {
        "algo": {"name": "a2c_discrete"},
        "model": {"name": "discrete_a2c"},
        "network": {"name": "testnet_dict", "with_aux_loss": False,
                    "mlp": {"units": [16, 16]}},
        "config": {
            "env_name": "test_dict_obs_env", "num_actors": 4,
            "normalize_input": False, "normalize_value": False,
            "player": {"games_num": 4, "num_actors": 4},
            "seed": 3, "import_modules": ["rl_games_tpu.models.test_network"],
        },
    }
    for module in params["config"]["import_modules"]:
        __import__(module)
    player = PpoPlayer(params)
    reward = player.run(games_num=4)
    assert np.isfinite(float(reward))
