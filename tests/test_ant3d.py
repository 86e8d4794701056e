"""Ant3D device-physics tests: 3D energy sanity, mass-matrix conditioning,
rotational-KE identity, stability, contract."""

import numpy as np
import jax
import jax.numpy as jnp

from rl_games_tpu.envs.jax.ant3d import (
    Ant3D,
    KNEE_INIT,
    LINK_L,
    NQ,
    TORSO_I,
    kinetic_energy,
    potential_energy,
)
from rl_games_tpu.envs.jax.base import JaxVecEnv


def _stand_q():
    return (
        jnp.zeros(NQ)
        .at[2]
        .set(LINK_L * float(jnp.sin(KNEE_INIT)) + 0.01)
        .at[7::2]
        .set(KNEE_INIT)
    )


def test_energy_functions():
    q = _stand_q()
    qd = jnp.zeros(NQ)
    assert float(kinetic_energy(q, qd)) == 0.0
    # pure translation: T = 1/2 m_total v² in every direction
    total_mass = 1.0 + 8 * 0.15
    for axis in range(3):
        qd2 = qd.at[axis].set(1.0)
        np.testing.assert_allclose(
            float(kinetic_energy(q, qd2)), 0.5 * total_mass, rtol=1e-5
        )
    # potential energy increases with height
    assert float(potential_energy(q.at[2].add(0.5))) > float(
        potential_energy(q)
    )


def test_rotational_ke_isotropic_identity():
    """Pure yaw spin about the torso center: the torso's share of T must be
    exactly 1/2·I·ω² (the ‖Ṙ‖²_F = 2|ω|² identity), plus the legs' orbital
    + spin terms which must make T grow quadratically in ω."""
    q = _stand_q()
    w = 2.0
    t1 = float(kinetic_energy(q, jnp.zeros(NQ).at[5].set(1.0)))
    t2 = float(kinetic_energy(q, jnp.zeros(NQ).at[5].set(w)))
    np.testing.assert_allclose(t2, w**2 * t1, rtol=1e-5)
    assert t1 > 0.5 * TORSO_I  # torso spin + leg terms


def test_euler_matrix_orthonormal():
    from rl_games_tpu.envs.jax.lagrangian import euler_zyx, stack_mat

    rng = np.random.default_rng(3)
    for _ in range(5):
        rpy = jnp.asarray(rng.uniform(-1.0, 1.0, size=3), jnp.float32)
        R = np.asarray(stack_mat([euler_zyx(rpy[0], rpy[1], rpy[2])])[0])
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)


def test_jacobian_factors_match_energy_autodiff():
    """The production dynamics path (lagrangian.lagrangian_factors:
    M = JᵀWJ, bias = JᵀW·J̇q̇ + ∇V) must equal the energy-autodiff form
    (hessian M, jvp-of-grad Coriolis) it replaced for speed
    (docs/PERF.md)."""
    from rl_games_tpu.envs.jax.ant3d import (
        GRAVITY,
        _MASSES,
        _INERTIAS,
        _link_frames,
    )
    from rl_games_tpu.envs.jax.lagrangian import lagrangian_factors

    rng = np.random.default_rng(1)
    for _ in range(3):
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
        # attitudes within the healthy band (|roll|,|pitch| < 0.9)
        q = jnp.asarray(rng.normal(size=NQ) * 0.3, jnp.float32)
        M = jax.hessian(kinetic_energy, argnums=1)(q, jnp.zeros(NQ))
        eigs = np.linalg.eigvalsh(np.asarray(M))
        assert eigs.min() > 0
        np.testing.assert_allclose(np.asarray(M), np.asarray(M).T, atol=1e-5)


def test_rollout_stable_no_nans():
    env = JaxVecEnv(Ant3D(), num_envs=16)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (16, 33)

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
    assert float(jnp.abs(rews).max()) < 50.0


def test_standing_still_beats_falling():
    """Zero torque from the init pose keeps most ants alive for a while —
    the 3D contacts must support the body."""
    env = JaxVecEnv(Ant3D(), num_envs=8)
    state, obs = env.reset(jax.random.PRNGKey(2))

    def roll(state):
        def step(carry, _):
            s = carry
            s, o, r, d, i = env.step(s, jnp.zeros((8, 8)))
            return s, d

        return jax.lax.scan(step, state, None, length=50)

    _, dones = jax.jit(roll)(state)
    alive_steps = int((~dones.any(axis=1)).sum())
    assert alive_steps > 30
