"""Ant2D device-physics tests: energy sanity, stability, contract, learning
signal direction."""

import numpy as np
import jax
import jax.numpy as jnp

from rl_games_tpu.envs.jax.ant2d import (
    Ant2D,
    Ant2DState,
    kinetic_energy,
    potential_energy,
    NQ,
)
from rl_games_tpu.envs.jax.base import JaxVecEnv


def test_energy_functions():
    q = jnp.zeros(NQ).at[1].set(0.5)
    qd = jnp.zeros(NQ)
    assert float(kinetic_energy(q, qd)) == 0.0
    qd2 = qd.at[0].set(1.0)  # translate everything at 1 m/s
    total_mass = 1.0 + 8 * 0.15
    np.testing.assert_allclose(
        float(kinetic_energy(q, qd2)), 0.5 * total_mass, rtol=1e-5
    )
    # potential energy increases with height
    q_hi = q.at[1].set(1.0)
    assert float(potential_energy(q_hi)) > float(potential_energy(q))


def test_mass_matrix_positive_definite():
    rng = np.random.default_rng(0)
    for _ in range(5):
        q = jnp.asarray(rng.normal(size=NQ), jnp.float32)
        M = jax.hessian(kinetic_energy, argnums=1)(q, jnp.zeros(NQ))
        eigs = np.linalg.eigvalsh(np.asarray(M))
        assert eigs.min() > 0
        np.testing.assert_allclose(np.asarray(M), np.asarray(M).T, atol=1e-5)


def test_rollout_stable_no_nans():
    env = JaxVecEnv(Ant2D(), num_envs=16)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (16, 26)

    def roll(state, key):
        def step(carry, _):
            s, k = carry
            k, ak = jax.random.split(k)
            a = jax.random.uniform(ak, (16, 8), jnp.float32, -1.0, 1.0)
            s, o, r, d, i = env.step(s, a)
            return (s, k), (o, r)

        (state, _), (obss, rews) = jax.lax.scan(
            step, (state, key), None, length=100
        )
        return obss, rews

    obss, rews = jax.jit(roll)(state, jax.random.PRNGKey(1))
    assert not bool(jnp.isnan(obss).any())
    assert not bool(jnp.isnan(rews).any())
    assert float(jnp.abs(rews).max()) < 50.0  # bounded rewards


def test_standing_still_beats_falling():
    """Zero torque from the init pose should keep the ant alive (alive bonus
    accrues) for a while — contacts must support the body."""
    env = JaxVecEnv(Ant2D(), num_envs=8)
    state, obs = env.reset(jax.random.PRNGKey(2))
    alive_steps = 0
    for _ in range(50):
        state, obs, rew, done, info = env.step(state, jnp.zeros((8, 8)))
        if not bool(done.any()):
            alive_steps += 1
    assert alive_steps > 30


def test_cheetah2d_learns():
    """Cheetah2D (locomotion2d.py — the brax halfcheetah analog on the
    same Lagrangian-autodiff machinery) learns forward locomotion."""
    from rl_games_tpu.algos.ppo import PPOAgent

    params = {
        "algo": {"name": "a2c_continuous"},
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [64, 32], "activation": "elu",
                    "initializer": {"name": "default"}},
            "space": {"continuous": {
                "mu_activation": "None", "sigma_activation": "None",
                "mu_init": {"name": "default"},
                "sigma_init": {"name": "const_initializer", "val": 0.0},
                "fixed_sigma": True}},
        },
        "config": {
            "env_name": "Cheetah2D", "num_actors": 64,
            "horizon_length": 16, "minibatch_size": 256, "mini_epochs": 4,
            "learning_rate": 3e-4, "lr_schedule": "adaptive",
            "kl_threshold": 0.008, "e_clip": 0.2, "clip_value": True,
            "gamma": 0.99, "tau": 0.95, "critic_coef": 2.0,
            "entropy_coef": 0.0, "grad_norm": 1.0, "truncate_grads": True,
            "normalize_advantage": True, "normalize_input": True,
            "normalize_value": True, "bounds_loss_coef": 0.0001,
            "value_bootstrap": True, "seed": 7,
        },
    }
    agent = PPOAgent("t", params)
    state = agent.init_state()
    fn = agent.make_train_fn()
    m = None
    for _ in range(90):
        state, m = fn(state)
    # random flailing hovers near the alive bonus; learned gait moves
    assert float(m["mean_rewards"][0]) > 40.0


def test_walker2d_balance_improves():
    """Walker2D (upright planar biped): staying up is the task — episode
    length is the balance signal."""
    from rl_games_tpu.algos.ppo import PPOAgent

    params = {
        "algo": {"name": "a2c_continuous"},
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [64, 32], "activation": "elu",
                    "initializer": {"name": "default"}},
            "space": {"continuous": {
                "mu_activation": "None", "sigma_activation": "None",
                "mu_init": {"name": "default"},
                "sigma_init": {"name": "const_initializer", "val": 0.0},
                "fixed_sigma": True}},
        },
        "config": {
            "env_name": "Walker2D", "num_actors": 64,
            "horizon_length": 16, "minibatch_size": 256, "mini_epochs": 4,
            "learning_rate": 3e-4, "lr_schedule": "adaptive",
            "kl_threshold": 0.008, "e_clip": 0.2, "clip_value": True,
            "gamma": 0.99, "tau": 0.95, "critic_coef": 2.0,
            "entropy_coef": 0.0, "grad_norm": 1.0, "truncate_grads": True,
            "normalize_advantage": True, "normalize_input": True,
            "normalize_value": True, "bounds_loss_coef": 0.0001,
            "value_bootstrap": True, "seed": 7,
        },
    }
    agent = PPOAgent("t", params)
    state = agent.init_state()
    fn = agent.make_train_fn()
    m = None
    for _ in range(100):
        state, m = fn(state)
    assert float(m["mean_lengths"]) > 45.0  # untrained topples in ~25 steps
    assert float(m["mean_rewards"][0]) > 40.0


def test_factor_scheme_matches_energy_autodiff():
    """Production factors (lagrangian_factors_2d: M = JᵀWJ with
    constant-basis tangent passes) equal the energy-autodiff forms
    (hessian mass matrix, jvp-of-grad Coriolis) — same contract as the 3D
    tests (tests/test_ant3d.py)."""
    import numpy as np

    from rl_games_tpu.envs.jax.ant2d import (
        _MASSES, _INERTIAS, GRAVITY, NQ, _link_frames, kinetic_energy,
        potential_energy,
    )
    from rl_games_tpu.envs.jax.lagrangian import lagrangian_factors_2d

    rng = np.random.default_rng(3)
    for _ in range(4):
        q = jnp.asarray(rng.normal(size=NQ) * 0.3, jnp.float32)
        qd = jnp.asarray(rng.normal(size=NQ) * 0.5, jnp.float32)
        M_ref = jax.hessian(kinetic_energy, argnums=1)(q, qd)
        dTdqd = lambda qq, qqd: jax.grad(kinetic_energy, argnums=1)(qq, qqd)
        cor = jax.jvp(lambda qq: dTdqd(qq, qd), (q,), (qd,))[1]
        bias_ref = (
            cor
            - jax.grad(kinetic_energy, argnums=0)(q, qd)
            + jax.grad(potential_energy)(q)
        )
        M, bias, cj, feet0 = lagrangian_factors_2d(
            _link_frames, _MASSES, _INERTIAS, q, qd, GRAVITY
        )
        np.testing.assert_allclose(
            np.asarray(M), np.asarray(M_ref), rtol=2e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(bias), np.asarray(bias_ref), rtol=2e-3, atol=2e-4
        )
        cj_ref = jax.jacobian(lambda qq: _link_frames(qq)[2])(q)
        np.testing.assert_allclose(
            np.asarray(cj), np.asarray(cj_ref), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(feet0), np.asarray(_link_frames(q)[2]),
            rtol=1e-5, atol=1e-6,
        )
