"""Ant3D — a full 3D device-resident quadruped-locomotion environment.

The 3D counterpart of Ant2D (ant2d.py) and the direct analog of the
reference's Brax/MuJoCo Ant benchmark workload (reference docs/BRAX.md:20,
envs/brax.py; the image ships neither brax nor MJX): a free-floating torso
(6 DOF: x, y, z, roll, pitch, yaw) with 4 legs x (hip swing + knee bend)
= 8 actuated hinges, 14 generalized coordinates total, with 3D ground
contacts under all four feet.

Same derive-don't-hand-code scheme as Ant2D — the equations of motion come
from autodiff of plain-JAX energy functions:

    M(q)        = d²T/dqdot²                        (jax.hessian)
    bias(q,qd)  = d/dt(dT/dqdot) - dT/dq + dV/dq    (jvp of grad)
    qddot       = chol_solve(M, tau + J_cᵀ f_contact - bias - damping)

Rotational kinetic energy uses the SO(3) identity ‖Ṙ‖²_F = 2|ω|², exact
for the (isotropic-inertia) spheres/stubby links used here, so T stays a
plain function of (q, qd) and the whole Lagrangian pipeline is unchanged
from the planar case. Base orientation is parameterized by z-y-x Euler
angles; the gimbal singularity at pitch = ±π/2 is unreachable because the
episode terminates (unhealthy) at |pitch| > 0.9 rad, exactly as MuJoCo Ant
terminates on torso attitude/height.

The 14x14 mass-matrix solve uses the same fully-unrolled scalar Cholesky
as Ant2D (never feed batched tiny linear algebra to XLA's decomposition
ops on TPU — docs/PERF.md).

Reward mirrors MuJoCo/Brax Ant: forward (x) velocity + alive bonus
- control cost; terminates when the torso falls or tips over.
"""

import math

import jax
import jax.numpy as jnp
from flax import struct

from rl_games_tpu.envs.jax.base import JaxEnv
from rl_games_tpu.envs.jax.ant2d import _chol_factor, _chol_solve
from rl_games_tpu.envs.jax.lagrangian import (
    euler_zyx,
    lagrangian_factors,
    mat_mul,
    mat_vec,
    rot_y,
    rot_z,
    stack_mat,
    stack_vec,
    v_add,
    v_scale,
)
from rl_games_tpu.envs.spaces import Box, EnvInfo

# ---------------------------------------------------------------------------
# Morphology: spherical torso + 4 legs x (thigh, shin), full 3D
# ---------------------------------------------------------------------------

NQ = 14  # x, y, z, roll, pitch, yaw, 4 x (hip, knee)
N_LEGS = 4
TORSO_M = 1.0
TORSO_I = 0.05
TORSO_R = 0.25  # hip anchors sit on this radius
LINK_M = 0.15
LINK_L = 0.28
LINK_I = LINK_M * LINK_L**2 / 12.0
# leg azimuths in the torso frame (front-left, back-left, back-right,
# front-right — the MuJoCo Ant layout)
# plain Python floats: consumed as trace-time constants by the scalar-form
# kinematics (a jnp constant would need a concretizing readback mid-trace)
LEG_AZIMUTH = tuple(f * math.pi for f in (0.25, 0.75, 1.25, 1.75))
GRAVITY = 9.81
DT = 0.02
SUBSTEPS = 4
JOINT_DAMPING = 0.08
TORQUE_SCALE = 2.2
K_GROUND = 900.0
D_GROUND = 9.0
MU_FRICTION = 0.9
# per-joint soft limits: hips swing +-0.7 rad, knees bend 0.25..1.45 rad
# below horizontal (MuJoCo Ant's hip +-30deg / ankle 30-70deg ranges,
# widened slightly for the soft-penalty formulation)
JOINT_LO = jnp.tile(jnp.asarray([-0.7, 0.25]), N_LEGS)
JOINT_HI = jnp.tile(jnp.asarray([0.7, 1.45]), N_LEGS)
KNEE_INIT = 0.9


def _link_frames(q):
    """COM positions + orientations of all 9 bodies and the 4 foot tips.

    Body order: torso, 4 thighs, 4 shins. Thighs extend horizontally
    outward (torso frame) at azimuth LEG_AZIMUTH + hip_q; shins continue
    in the same vertical plane, tilted knee_q below horizontal. Returns
    (coms [9, 3], Rs [9, 3, 3], feet [4, 3]).

    Written in SCALAR form — tuples of per-env scalars, unrolled over
    legs, arrays stacked only at the end — so every batched intermediate
    is a full [B] vector on TPU (lagrangian.py module docstring; the
    vectorized-over-legs form put 3- and 4-wide dims in the 128-lane
    axis and was ~40× slower end-to-end).
    """
    pos = (q[0], q[1], q[2])
    R = euler_zyx(q[3], q[4], q[5])

    thigh_coms, shin_coms, thigh_Rs, shin_Rs, feet = [], [], [], [], []
    for leg in range(N_LEGS):
        az = LEG_AZIMUTH[leg]
        hip, knee = q[6 + 2 * leg], q[7 + 2 * leg]
        gam = az + hip
        cg, sg = jnp.cos(gam), jnp.sin(gam)
        ck, sk = jnp.cos(knee), jnp.sin(knee)
        d1 = (cg, sg, 0.0)            # thigh dir, torso frame
        d2 = (ck * cg, ck * sg, -sk)  # shin dir
        d1w = mat_vec(R, d1)
        d2w = mat_vec(R, d2)
        anchor = v_add(pos, v_scale(TORSO_R, d1w))
        thigh_coms.append(v_add(anchor, v_scale(0.5 * LINK_L, d1w)))
        knee_p = v_add(anchor, v_scale(LINK_L, d1w))
        shin_coms.append(v_add(knee_p, v_scale(0.5 * LINK_L, d2w)))
        feet.append(v_add(knee_p, v_scale(LINK_L, d2w)))
        # world-from-link: thigh = R @ Rz(gam), shin = thigh_R @ Ry(-knee).
        # The MINUS sign keeps the shin's body frame consistent with its
        # direction vector d2: rot_y(a) maps e_x to (cos a, 0, +sin a) in
        # the thigh frame while d2 tilts to -z for positive knee — with
        # +knee the shin frame would pitch opposite to the shin itself,
        # flipping the knee's rotational-inertia coupling sign in T(q, qd)
        thigh_R = mat_mul(R, rot_z(gam))
        thigh_Rs.append(thigh_R)
        shin_Rs.append(mat_mul(thigh_R, rot_y(-knee)))

    coms = stack_vec([pos] + thigh_coms + shin_coms)
    Rs = stack_mat([R] + thigh_Rs + shin_Rs)
    return coms, Rs, stack_vec(feet)


_MASSES = jnp.asarray([TORSO_M] + [LINK_M] * (2 * N_LEGS))
_INERTIAS = jnp.asarray([TORSO_I] + [LINK_I] * (2 * N_LEGS))


def kinetic_energy(q, qd):
    """T(q, qd) = 1/2 Σ m |v|² + 1/4 Σ I ‖Ṙ‖²_F.

    The Frobenius form is the isotropic-inertia rotational energy:
    ‖Ṙ‖²_F = ‖ω̂‖²_F = 2|ω|² for R ∈ SO(3), so 1/4·I·‖Ṙ‖² = 1/2·I·|ω|².
    One jvp through the kinematics gives all body velocities (same scheme
    as ant2d.kinetic_energy — every autodiff pass differentiates a cheap
    primal)."""
    _, (vcoms, Rdots, _) = jax.jvp(_link_frames, (q,), (qd,))
    return 0.5 * jnp.sum(
        _MASSES[:, None] * vcoms * vcoms
    ) + 0.25 * jnp.sum(_INERTIAS[:, None, None] * Rdots * Rdots)


def potential_energy(q):
    coms, _, _ = _link_frames(q)
    return GRAVITY * jnp.sum(_MASSES * coms[:, 2])


def _step_factors(q, qd):
    """chol(M(q)), bias, foot jacobian + foot points — computed once per
    control step and frozen across integration substeps
    (ant2d._step_factors scheme).

    Uses the Jacobian point-mass formulation (lagrangian.py: M = JᵀWJ,
    bias = JᵀW·J̇q̇ + ∇V from ONE jacfwd + one jvp-of-jvp) instead of
    jax.hessian of the energy — the hessian lowering alone cost 23 ms for
    8192 envs on TPU, the entire control step (docs/PERF.md). Equivalence
    with the energy form is asserted in tests/test_ant3d.py."""
    M, bias, feet_jac, feet0 = lagrangian_factors(
        _link_frames, _MASSES, _INERTIAS, q, qd, GRAVITY
    )
    cho = _chol_factor(M + 1e-6 * jnp.eye(NQ))
    return cho, bias, feet_jac, feet0


def _substep_qdd(q, qd, tau_joints, cho, bias, feet_jac, feet):
    """Per-substep forces (3D contacts, damping, joint limits) + solve.

    ``feet`` are the current foot positions — the caller advances them
    with the frozen jacobian (feet0 + J·(q − q0)), consistent with the
    frozen-factor integration scheme and first-order exact over a
    substep's |Δq| ~ 1e-2 rad; re-running the full kinematics here cost
    one extra primal per substep (4/control step) for sub-1e-4 effect
    on the penalty contact forces."""
    tau = jnp.zeros(NQ).at[6:].set(TORQUE_SCALE * tau_joints)
    tau = tau.at[6:].add(-JOINT_DAMPING * qd[6:])
    joint_q = q[6:]
    limit_force = -8.0 * (
        jnp.maximum(joint_q - JOINT_HI, 0.0)
        + jnp.minimum(joint_q - JOINT_LO, 0.0)
    )
    tau = tau.at[6:].add(limit_force)

    # foot contacts: penalty normal (z) + Coulomb-style tangential friction
    # in the ground plane
    feet_vel = feet_jac @ qd  # [4, 3]
    depth = jnp.maximum(-feet[:, 2], 0.0)
    in_contact = depth > 0.0
    fn_mag = K_GROUND * depth - D_GROUND * feet_vel[:, 2] * in_contact
    fn_mag = jnp.maximum(fn_mag, 0.0) * in_contact
    ft = -MU_FRICTION * fn_mag[:, None] * jnp.tanh(feet_vel[:, :2] * 10.0)
    f_contact = jnp.concatenate([ft, fn_mag[:, None]], axis=-1)  # [4, 3]
    tau_contact = jnp.einsum("fcq,fc->q", feet_jac, f_contact)

    rhs = tau + tau_contact - bias
    return _chol_solve(cho, rhs)


@struct.dataclass
class Ant3DState:
    q: jnp.ndarray
    qd: jnp.ndarray
    last_x: jnp.ndarray


class Ant3D(JaxEnv):
    """3D quadruped locomotion. obs 33, act 8, episode 1000 steps."""

    max_episode_steps = 1000
    # z, orientation 6D (first two R columns), 8 joints, 14 velocities,
    # 4 contacts
    OBS_DIM = 33

    def env_info(self):
        return EnvInfo(
            observation_space=Box(shape=(self.OBS_DIM,)),
            action_space=Box(shape=(2 * N_LEGS,), low=-1.0, high=1.0),
        )

    def _obs(self, state: Ant3DState):
        q, qd = state.q, state.qd
        _, Rs, feet = _link_frames(q)
        R = Rs[0]
        contacts = (feet[:, 2] < 0.005).astype(jnp.float32)
        return jnp.concatenate(
            [
                q[2:3],                       # torso height
                R[:, 0], R[:, 1],             # orientation (6D rotation rep)
                q[6:],                        # joint angles
                jnp.clip(qd, -10.0, 10.0),    # all velocities
                contacts,
            ]
        )

    def reset(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        q = jnp.zeros(NQ)
        # feet at z = base_z - L*sin(knee): start just touching the ground
        q = q.at[2].set(LINK_L * jnp.sin(KNEE_INIT) + 0.01)
        q = q.at[6:].set(
            jnp.tile(jnp.asarray([0.0, KNEE_INIT]), N_LEGS)
            + 0.08 * jax.random.normal(k1, (2 * N_LEGS,))
        )
        q = q.at[3:6].add(0.02 * jax.random.normal(k3, (3,)))
        qd = 0.02 * jax.random.normal(k2, (NQ,))
        state = Ant3DState(q=q, qd=qd, last_x=q[0])
        return state, self._obs(state)

    def step(self, estate: Ant3DState, action, key):
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
        alive = 1.0
        reward = fwd_vel + alive - ctrl_cost

        torso_low = q[2] < 0.11
        # tipping over also keeps pitch far from the +-pi/2 Euler
        # singularity (see module docstring)
        tipped = (jnp.abs(q[3]) > 0.9) | (jnp.abs(q[4]) > 0.9)
        terminated = torso_low | tipped

        state = Ant3DState(q=q, qd=qd, last_x=q[0])
        return state, self._obs(state), reward, terminated, {}
