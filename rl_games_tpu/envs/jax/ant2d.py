"""Ant2D — a device-resident articulated-locomotion environment.

The framework's on-device physics workload, standing in for the reference's
Brax Ant benchmark (docs/BRAX.md; the image ships neither brax nor MJX).
A planar quadruped: free-floating torso (3 DOF: x, z, pitch) + 4 legs x 2
links (8 actuated hinges) = 11 generalized coordinates.

The dynamics are *derived, not hand-coded*: kinetic and potential energy are
written as plain JAX functions of (q, qdot) and the equations of motion come
from autodiff —

    M(q)        = d²T/dqdot²          (jax.hessian)
    bias(q,qd)  = d/dt(dT/dqdot) - dT/dq + dV/dq   (jvp of jacobian)
    qddot       = solve(M, tau + J_cᵀ f_contact - bias - damping)

Ground contact is a penalty spring-damper on each foot with Coulomb-style
tangential friction. Everything is pure jnp → vmaps over thousands of envs
and steps inside the rollout scan; the MXU sees an 11x11 solve + jacobians
per env per substep.

Reward mirrors MuJoCo/Brax Ant: forward velocity + alive bonus − control
cost; terminates when the torso falls.
"""

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from rl_games_tpu.envs.jax.base import JaxEnv
from rl_games_tpu.envs.jax.lagrangian import lagrangian_factors_2d
from rl_games_tpu.envs.spaces import Box, EnvInfo

# ---------------------------------------------------------------------------
# Morphology: torso + 4 legs x (hip link, knee link), planar
# ---------------------------------------------------------------------------

NQ = 11  # x, z, pitch, 4 x (hip, knee)
N_LEGS = 4
TORSO_M = 1.0
TORSO_I = 0.05
LINK_M = 0.15
LINK_L = 0.28
LINK_I = LINK_M * LINK_L**2 / 12.0
# hip attachment points along the torso (local x offsets)
HIP_X = jnp.asarray([-0.25, -0.08, 0.08, 0.25])
GRAVITY = 9.81
DT = 0.02
SUBSTEPS = 4
JOINT_DAMPING = 0.08
TORQUE_SCALE = 2.2
K_GROUND = 900.0
D_GROUND = 9.0
MU_FRICTION = 0.9
JOINT_LIMIT = 1.2  # rad, soft


def _link_frames(q):
    """Positions/orientations of all 9 bodies' centers + the 4 foot tips.

    Vectorized over legs (no Python unroll — keeps the op count, and with it
    every autodiff pass through here, ~4x smaller).
    Body order: torso, 4 thighs, 4 shins. Returns
    (coms [9, 2], angles [9], feet [4, 2]).
    """
    th = q[2]
    torso = q[0:2]
    hip_q = q[3::2]  # [4]
    knee_q = q[4::2]  # [4]
    ca, sa = jnp.cos(th), jnp.sin(th)
    anchors = torso[None, :] + HIP_X[:, None] * jnp.stack([ca, sa])[None, :]
    a1 = th + hip_q  # thigh hangs downward at this angle from -z
    dir1 = jnp.stack([jnp.sin(a1), -jnp.cos(a1)], axis=-1)  # [4, 2]
    thigh_com = anchors + 0.5 * LINK_L * dir1
    knees = anchors + LINK_L * dir1
    a2 = a1 + knee_q
    dir2 = jnp.stack([jnp.sin(a2), -jnp.cos(a2)], axis=-1)
    shin_com = knees + 0.5 * LINK_L * dir2
    feet = knees + LINK_L * dir2
    coms = jnp.concatenate([torso[None, :], thigh_com, shin_com], axis=0)
    angles = jnp.concatenate([th[None], a1, a2])
    return coms, angles, feet


_MASSES = jnp.asarray([TORSO_M] + [LINK_M] * (2 * N_LEGS))
_INERTIAS = jnp.asarray([TORSO_I] + [LINK_I] * (2 * N_LEGS))


def kinetic_energy(q, qd):
    """T(q, qd) = 1/2 Σ m v² + 1/2 Σ I ω².

    Body velocities come from a single jvp through the kinematics (one
    forward+tangent pass) rather than materializing full jacobians — every
    derivative taken OF this function (mass-matrix hessian, Coriolis jvp,
    dT/dq) then differentiates a cheap primal, which is where the physics
    throughput comes from.
    """
    _, (vcoms, vangles, _) = jax.jvp(_link_frames, (q,), (qd,))
    return 0.5 * jnp.sum(_MASSES[:, None] * vcoms * vcoms) + 0.5 * jnp.sum(
        _INERTIAS * vangles * vangles
    )


def potential_energy(q):
    coms, _, _ = _link_frames(q)
    return GRAVITY * jnp.sum(_MASSES * coms[:, 1])


def _chol_factor(M):
    """Fully-unrolled Cholesky of the NQ x NQ mass matrix, in scalar form.

    XLA's batched `Cholesky` op lowers to a sequential blocked loop that is
    catastrophically slow for tiny matrices on TPU (measured 10.2 ms for
    8192 x 11 x 11 vs 0.8 ms for this unrolled form — it was ~95% of the
    whole PPO epoch). Unrolling over the static NQ=11 turns the factorization
    into ~n^3/6 pure scalar madds that vmap into [B]-vector VPU ops and fuse
    with the surrounding physics.

    Returns (L, inv_diag): L as a list-of-lists of per-env scalars (lower
    triangle, L[i][j] for j<=i) and the reciprocal diagonal.
    """
    n = M.shape[-1]
    L = [[None] * n for _ in range(n)]
    inv_d = [None] * n
    for j in range(n):
        s = M[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[j][j] = d
        inv_d[j] = 1.0 / d
        for i in range(j + 1, n):
            t = M[i, j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * inv_d[j]
    return L, inv_d


def _chol_solve(chol, b):
    """Unrolled forward/backward substitution: solves L L^T x = b."""
    L, inv_d = chol
    n = len(inv_d)
    y = [None] * n
    for i in range(n):
        t = b[i]
        for k in range(i):
            t = t - L[i][k] * y[k]
        y[i] = t * inv_d[i]
    x = [None] * n
    for i in reversed(range(n)):
        t = y[i]
        for k in range(i + 1, n):
            t = t - L[k][i] * x[k]
        x[i] = t * inv_d[i]
    return jnp.stack(x)


def _step_factors(q, qd):
    """Heavy, slowly-varying terms computed ONCE per control step:

    chol(M(q)), bias, the foot jacobian + foot points. M is frozen across
    the integration substeps (it varies on joint-motion timescales, not
    the 5 ms substep), so each substep is a cheap forward-substitution
    instead of a fresh second-derivative pass + solve. Factors come from
    the planar Jacobian point-mass form (lagrangian.lagrangian_factors_2d
    — constant-basis tangent passes, no jax.hessian); equivalence with
    the energy-autodiff form is asserted in tests/test_ant2d.py.
    """
    M, bias, feet_jac, feet0 = lagrangian_factors_2d(
        _link_frames, _MASSES, _INERTIAS, q, qd, GRAVITY
    )
    cho = _chol_factor(M + 1e-6 * jnp.eye(NQ))
    return cho, bias, feet_jac, feet0


def _substep_qdd(q, qd, tau_joints, cho, bias, feet_jac, feet):
    """Cheap per-substep forces (contacts, damping, limits) + cho_solve.

    ``feet`` are advanced by the caller with the frozen jacobian
    (feet0 + J·(q − q0)) instead of re-running the kinematics each
    substep (ant3d._substep_qdd note)."""
    tau = jnp.zeros(NQ).at[3:].set(TORQUE_SCALE * tau_joints)
    tau = tau.at[3:].add(-JOINT_DAMPING * qd[3:])
    joint_q = q[3:]
    limit_force = -8.0 * (
        jnp.maximum(joint_q - JOINT_LIMIT, 0.0)
        + jnp.minimum(joint_q + JOINT_LIMIT, 0.0)
    )
    tau = tau.at[3:].add(limit_force)

    # foot contacts: penalty normal + Coulomb-style tangential friction
    feet_vel = feet_jac @ qd  # [4, 2]
    depth = jnp.maximum(-feet[:, 1], 0.0)
    in_contact = depth > 0.0
    fn_mag = K_GROUND * depth - D_GROUND * feet_vel[:, 1] * in_contact
    fn_mag = jnp.maximum(fn_mag, 0.0) * in_contact
    ft = -MU_FRICTION * fn_mag * jnp.tanh(feet_vel[:, 0] * 10.0)
    f_contact = jnp.stack([ft, fn_mag], axis=-1)  # [4, 2]
    tau_contact = jnp.einsum("fcq,fc->q", feet_jac, f_contact)

    rhs = tau + tau_contact - bias
    return _chol_solve(cho, rhs)


@struct.dataclass
class Ant2DState:
    q: jnp.ndarray
    qd: jnp.ndarray
    last_x: jnp.ndarray


class Ant2D(JaxEnv):
    """Planar quadruped locomotion. obs 26, act 8, episode 1000 steps."""

    max_episode_steps = 1000
    OBS_DIM = 26  # z, pitch(sin,cos), 8 joints, 11 velocities, 4 contacts

    def env_info(self):
        return EnvInfo(
            observation_space=Box(shape=(self.OBS_DIM,)),
            action_space=Box(shape=(2 * N_LEGS,), low=-1.0, high=1.0),
        )

    def _obs(self, state: Ant2DState):
        q, qd = state.q, state.qd
        _, _, feet = _link_frames(q)
        contacts = (feet[:, 1] < 0.005).astype(jnp.float32)
        return jnp.concatenate(
            [
                q[1:2],                      # torso height
                jnp.stack([jnp.sin(q[2]), jnp.cos(q[2])]),
                q[3:],                       # joint angles
                jnp.clip(qd, -10.0, 10.0),   # all velocities
                contacts,
            ]
        )

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        q = jnp.zeros(NQ)
        q = q.at[1].set(LINK_L * 1.6)  # torso height: legs slightly bent
        q = q.at[3:].set(
            jnp.tile(jnp.asarray([0.25, -0.5]), N_LEGS)
            + 0.08 * jax.random.normal(k1, (2 * N_LEGS,))
        )
        qd = 0.02 * jax.random.normal(k2, (NQ,))
        state = Ant2DState(q=q, qd=qd, last_x=q[0])
        return state, self._obs(state)

    def step(self, estate: Ant2DState, action, key):
        action = jnp.clip(action, -1.0, 1.0)
        q, qd = estate.q, estate.qd
        h = DT / SUBSTEPS
        q0 = q
        cho, bias, feet_jac, feet0 = _step_factors(q, qd)

        def substep(carry, _):
            q, qd = carry
            feet = feet0 + feet_jac @ (q - q0)
            qdd = _substep_qdd(q, qd, action, cho, bias, feet_jac, feet)
            qd = jnp.clip(qd + h * qdd, -50.0, 50.0)
            q = q + h * qd
            return (q, qd), None

        (q, qd), _ = jax.lax.scan(substep, (q, qd), None, length=SUBSTEPS)

        fwd_vel = (q[0] - estate.last_x) / DT
        ctrl_cost = 0.25 * jnp.sum(jnp.square(action))
        alive = 0.5
        reward = fwd_vel + alive - ctrl_cost

        torso_low = q[1] < 0.12
        flipped = jnp.abs(q[2]) > 1.3
        terminated = torso_low | flipped

        state = Ant2DState(q=q, qd=qd, last_x=q[0])
        return state, self._obs(state), reward, terminated, {}
