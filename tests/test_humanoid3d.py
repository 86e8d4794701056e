"""Humanoid3D device-physics tests: energy sanity, mass-matrix
conditioning, standing stability, contract (test_ant3d.py pattern)."""

import numpy as np
import jax
import jax.numpy as jnp

from rl_games_tpu.envs.jax.humanoid3d import (
    Humanoid3D,
    NQ,
    NU,
    _MASSES,
    _init_q,
    _link_frames,
    kinetic_energy,
    potential_energy,
)
from rl_games_tpu.envs.jax.base import JaxVecEnv


def test_energy_functions():
    q = _init_q()
    qd = jnp.zeros(NQ)
    assert float(kinetic_energy(q, qd)) == 0.0
    # pure translation: T = 1/2 m_total v² in every direction
    total_mass = float(jnp.sum(_MASSES))
    for axis in range(3):
        qd2 = qd.at[axis].set(1.0)
        np.testing.assert_allclose(
            float(kinetic_energy(q, qd2)), 0.5 * total_mass, rtol=1e-5
        )
    assert float(potential_energy(q.at[2].add(0.5))) > float(
        potential_energy(q)
    )


def test_init_pose_feet_on_ground():
    q = _init_q()
    pts = _link_frames(q)[2]
    # all 4 contact points at or slightly above the ground, none below
    assert float(pts[:, 2].min()) > 0.0
    assert float(pts[:, 2].min()) < 0.02
    # left/right symmetry of the pose
    np.testing.assert_allclose(
        np.asarray(pts[0:2, 2]), np.asarray(pts[2:4, 2]), atol=1e-6
    )


def test_jacobian_factors_match_energy_autodiff():
    """Production dynamics (lagrangian.lagrangian_factors) vs the
    energy-autodiff form (test_ant3d.py analog)."""
    from rl_games_tpu.envs.jax.humanoid3d import (
        GRAVITY,
        _INERTIAS,
    )
    from rl_games_tpu.envs.jax.lagrangian import lagrangian_factors

    rng = np.random.default_rng(1)
    for _ in range(3):
        q = jnp.asarray(rng.normal(size=NQ) * 0.25, jnp.float32)
        qd = jnp.asarray(rng.normal(size=NQ) * 0.5, jnp.float32)
        M_ref = jax.hessian(kinetic_energy, argnums=1)(q, qd)
        dTdqd = lambda qq, qqd: jax.grad(kinetic_energy, argnums=1)(qq, qqd)
        cor = jax.jvp(lambda qq: dTdqd(qq, qd), (q,), (qd,))[1]
        bias_ref = (
            cor
            - jax.grad(kinetic_energy, argnums=0)(q, qd)
            + jax.grad(potential_energy)(q)
        )
        M, bias, cj, pts0 = lagrangian_factors(
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
            np.asarray(pts0), np.asarray(_link_frames(q)[2]),
            rtol=1e-5, atol=1e-6,
        )


def test_mass_matrix_positive_definite():
    rng = np.random.default_rng(0)
    for _ in range(5):
        q = jnp.asarray(rng.normal(size=NQ) * 0.25, jnp.float32)
        M = jax.hessian(kinetic_energy, argnums=1)(q, jnp.zeros(NQ))
        eigs = np.linalg.eigvalsh(np.asarray(M))
        assert eigs.min() > 0
        np.testing.assert_allclose(np.asarray(M), np.asarray(M).T, atol=1e-5)


def test_rollout_stable_no_nans():
    env = JaxVecEnv(Humanoid3D(), num_envs=16)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (16, 41)

    def roll(state, key):
        def step(carry, _):
            s, k = carry
            k, ak = jax.random.split(k)
            a = jax.random.uniform(ak, (16, NU), jnp.float32, -1.0, 1.0)
            s, o, r, d, i = env.step(s, a)
            return (s, k), (o, r)

        (state, _), (obss, rews) = jax.lax.scan(
            step, (state, key), None, length=100
        )
        return obss, rews

    obss, rews = jax.jit(roll)(state, jax.random.PRNGKey(1))
    assert not bool(jnp.isnan(obss).any())
    assert not bool(jnp.isnan(rews).any())
    assert float(jnp.abs(rews).max()) < 50.0


def test_standing_still_survives():
    """Zero torque from the init pose: the heel/toe contacts + joint
    limits must support the body for a while (it should not instantly
    collapse or explode)."""
    env = JaxVecEnv(Humanoid3D(), num_envs=8)
    state, obs = env.reset(jax.random.PRNGKey(2))

    def roll(state):
        def step(carry, _):
            s = carry
            s, o, r, d, i = env.step(s, jnp.zeros((8, NU)))
            return s, d

        return jax.lax.scan(step, state, None, length=60)

    _, dones = jax.jit(roll)(state)
    alive_steps = int((~dones.any(axis=1)).sum())
    assert alive_steps > 30
