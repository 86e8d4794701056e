"""Native C++ threaded env stepper tests: build, dynamics parity with the
JAX twins, autoreset contract, throughput sanity, PPO integration."""

import numpy as np
import pytest

try:
    from rl_games_tpu.envs.host.cpuenv import CpuVecEnv, load_library

    load_library()
    HAVE_NATIVE = True
except Exception as e:  # pragma: no cover - toolchain missing
    HAVE_NATIVE = False
    NATIVE_ERR = e

pytestmark = pytest.mark.skipif(
    not HAVE_NATIVE, reason="native toolchain unavailable"
)


def test_cartpole_contract_and_autoreset():
    env = CpuVecEnv("CartPole-v1", 8, seed=0)
    obs = env.reset()
    assert obs.shape == (8, 4)
    info = env.get_env_info()
    assert info.action_space.n == 2
    total_dones = 0
    for _ in range(600):  # > max_steps forces truncation at least
        obs, rew, done, infos = env.step(np.zeros(8, np.float32))
        assert rew.shape == (8,)
        total_dones += int(done.sum())
        if done.any():
            # same_step: returned obs is the fresh episode (within init range)
            assert np.abs(obs[done]).max() < 0.06
            # final obs is the pre-reset state (out of init range on term)
            assert "final_observation" in infos
    assert total_dones > 0
    env.close()


def test_pendulum_matches_jax_dynamics():
    """C++ and pure-JAX Pendulum twins must integrate identically."""
    import jax, jax.numpy as jnp
    from rl_games_tpu.envs.jax.classic import Pendulum, ArrayState

    env = CpuVecEnv("Pendulum-v1", 1, seed=3)
    obs = env.reset()
    th = np.arctan2(obs[0, 1], obs[0, 0])
    thdot = obs[0, 2]

    jenv = Pendulum()
    estate = ArrayState(x=jnp.asarray([th, thdot], jnp.float32))
    for u in [0.3, -1.5, 2.0, 0.0]:
        cobs, crew, cdone, _ = env.step(np.asarray([[u]], np.float32))
        estate, jobs, jrew, jdone, _ = jenv.step(
            estate, jnp.asarray([u]), jax.random.PRNGKey(0)
        )
        np.testing.assert_allclose(cobs[0], np.asarray(jobs), rtol=1e-4,
                                   atol=1e-5)
        assert float(crew[0]) == pytest.approx(float(jrew), rel=1e-4)
    env.close()


def test_threaded_stepping_scales_and_is_deterministic():
    e1 = CpuVecEnv("Pendulum-v1", 32, seed=11, num_threads=1)
    e4 = CpuVecEnv("Pendulum-v1", 32, seed=11, num_threads=4)
    o1, o4 = e1.reset(), e4.reset()
    np.testing.assert_allclose(o1, o4)  # per-env rng streams, thread-count
    for _ in range(50):
        a = np.random.default_rng(0).normal(size=(32, 1)).astype(np.float32)
        r1 = e1.step(a)
        r4 = e4.step(a)
        np.testing.assert_allclose(r1[0], r4[0])
        np.testing.assert_allclose(r1[1], r4[1])
    e1.close()
    e4.close()


def test_ppo_trains_on_native_env():
    from rl_games_tpu.algos.ppo import PPOAgent

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
            "env_name": "CartPole-v1", "vecenv_type": "CPUENV",
            "num_actors": 16, "horizon_length": 32, "minibatch_size": 256,
            "mini_epochs": 4, "learning_rate": 3e-4,
            "lr_schedule": "adaptive", "kl_threshold": 0.008,
            "e_clip": 0.2, "clip_value": True, "gamma": 0.99, "tau": 0.95,
            "critic_coef": 1.0, "entropy_coef": 0.01, "grad_norm": 1.0,
            "truncate_grads": True, "normalize_advantage": True,
            "normalize_input": True, "normalize_value": True,
            "value_bootstrap": True, "seed": 7,
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


def test_acrobot_matches_gymnasium_dynamics():
    """Native Acrobot-v1 vs gymnasium, same start state, same actions."""
    gymnasium = pytest.importorskip("gymnasium")
    from rl_games_tpu.envs.host.cpuenv import CpuVecEnv

    env = CpuVecEnv("Acrobot-v1", 1, seed=3)
    obs = env.reset()
    g = gymnasium.make("Acrobot-v1").unwrapped
    g.reset(seed=0)
    # write the native env's start state into gymnasium
    th1 = np.arctan2(obs[0, 1], obs[0, 0])
    th2 = np.arctan2(obs[0, 3], obs[0, 2])
    g.state = np.array([th1, th2, obs[0, 4], obs[0, 5]], np.float64)
    for t in range(40):
        a = t % 3
        obs, rew, dones, infos = env.step(np.asarray([[a]], np.float32))
        gobs, grew, gterm, gtrunc, _ = g.step(a)
        np.testing.assert_allclose(obs[0], gobs, rtol=2e-3, atol=2e-3)
        assert rew[0] == grew
        if dones[0] or gterm:
            assert bool(dones[0]) == bool(gterm)
            break


def test_mountaincar_continuous_matches_gymnasium():
    gymnasium = pytest.importorskip("gymnasium")
    from rl_games_tpu.envs.host.cpuenv import CpuVecEnv

    env = CpuVecEnv("MountainCarContinuous-v0", 1, seed=3)
    obs = env.reset()
    info = env.get_env_info()
    assert info.action_space.low == -1.0 and info.action_space.high == 1.0
    g = gymnasium.make("MountainCarContinuous-v0").unwrapped
    g.reset(seed=0)
    g.state = np.array(obs[0], np.float64)
    for t in range(60):
        a = np.sin(0.3 * t)
        obs, rew, dones, infos = env.step(np.asarray([[a]], np.float32))
        gobs, grew, gterm, *_ = g.step(np.asarray([a], np.float32))
        np.testing.assert_allclose(obs[0], gobs, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(rew[0], grew, rtol=1e-4, atol=1e-5)


def test_hopper2d_steps_and_terminates():
    from rl_games_tpu.envs.host.cpuenv import CpuVecEnv

    env = CpuVecEnv("Hopper2D-v0", 4, seed=0)
    obs = env.reset()
    assert obs.shape == (4, 5)
    saw_done = False
    for _ in range(400):
        # zero thrust → the hopper collapses and crashes
        obs, rew, dones, infos = env.step(
            np.tile(np.asarray([[-1.0, 0.0]], np.float32), (4, 1))
        )
        if dones.any():
            saw_done = True
            break
    assert saw_done
