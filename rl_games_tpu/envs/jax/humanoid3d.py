"""Humanoid3D — a full 3D device-resident biped-locomotion environment.

The 3D biped counterpart of Ant3D (ant3d.py) and the direct analog of the
reference's Brax/MuJoCo Humanoid benchmark workload (reference
docs/BRAX.md:22, envs/brax.py; the image ships neither brax nor MJX): a
free-floating pelvis (6 DOF) + 2-DOF abdomen carrying the torso, two
3-DOF legs (hip pitch + hip roll + knee) ending in heel/toe ground
contacts, and two 2-DOF arms (shoulder pitch + elbow) for balance
momentum — 12 actuated hinges, 18 generalized coordinates, 10 bodies,
4 contact points.

Same derive-don't-hand-code scheme as Ant2D/Ant3D — equations of motion
from autodiff of plain-JAX energy functions:

    M(q)        = d²T/dqdot²                        (jax.hessian)
    bias(q,qd)  = d/dt(dT/dqdot) - dT/dq + dV/dq    (jvp of grad)
    qddot       = chol_solve(M, tau + J_cᵀ f_contact - bias - damping)

Rotational kinetic energy uses the SO(3) identity ‖Ṙ‖²_F = 2|ω|²
(isotropic link inertias), so T stays a plain function of (q, qd). Pelvis
orientation is z-y-x Euler; the gimbal singularity at pitch = ±π/2 is
unreachable because the episode terminates (unhealthy) at |pitch| > 0.8,
exactly as MuJoCo Humanoid terminates on torso height/attitude.

The 18x18 mass-matrix solve reuses Ant2D's fully-unrolled scalar Cholesky
(never feed batched tiny linear algebra to XLA's decomposition ops on
TPU — docs/PERF.md).

Reward mirrors MuJoCo Humanoid-v5 (gymnasium humanoid_v5.py defaults):
1.25 x forward (x) velocity + 5.0 alive bonus - 0.1 x ctrl cost;
terminates when the pelvis drops or the trunk tips over.
"""

import jax
import jax.numpy as jnp
from flax import struct

from rl_games_tpu.envs.jax.ant2d import _chol_factor, _chol_solve
from rl_games_tpu.envs.jax.lagrangian import (
    euler_zyx,
    lagrangian_factors,
    mat_mul,
    mat_vec,
    rot_x,
    rot_y,
    stack_mat,
    stack_vec,
    v_add,
    v_scale,
)
from rl_games_tpu.envs.jax.base import JaxEnv
from rl_games_tpu.envs.spaces import Box, EnvInfo

# ---------------------------------------------------------------------------
# Morphology: pelvis (root) + torso via 2-DOF abdomen, 2 legs, 2 arms
# ---------------------------------------------------------------------------

NQ = 18  # x y z, roll pitch yaw, ab_pitch ab_roll, 2x(hip_p hip_r knee),
#          2x(shoulder_p elbow)
NU = 12  # actuated = q[6:]
N_CONTACTS = 4  # heel + toe per foot

PELVIS_M, PELVIS_I = 3.0, 0.06
TORSO_M, TORSO_I = 3.0, 0.08
TORSO_Z = 0.25  # abdomen joint -> torso COM offset
THIGH_M, THIGH_L = 0.8, 0.34
SHIN_M, SHIN_L = 0.5, 0.30
UARM_M, UARM_L = 0.25, 0.26
FARM_M, FARM_L = 0.15, 0.24
HIP_Y = 0.10  # lateral hip offset from pelvis center
SH_Y, SH_Z = 0.18, 0.12  # shoulder anchor in torso frame
TOE_L, HEEL_L = 0.12, 0.06

GRAVITY = 9.81
DT = 0.02
SUBSTEPS = 4
JOINT_DAMPING = 0.15
# per-joint torque gears: abdomen x2, per leg (hip_p, hip_r, knee) x2,
# per arm (shoulder_p, elbow) x2 — legs strongest, arms light
GEAR = jnp.asarray([3.0, 3.0, 4.0, 2.5, 4.0, 4.0, 2.5, 4.0, 1.2, 1.0, 1.2, 1.0])
K_GROUND = 1500.0
D_GROUND = 14.0
MU_FRICTION = 1.0
LIMIT_K = 20.0
# soft joint limits, same order as GEAR
JOINT_LO = jnp.asarray(
    [-0.5, -0.4, -0.9, -0.4, 0.0, -0.9, -0.4, 0.0, -1.2, 0.0, -1.2, 0.0]
)
JOINT_HI = jnp.asarray(
    [0.6, 0.4, 1.1, 0.4, 1.8, 1.1, 0.4, 1.8, 1.2, 1.8, 1.2, 1.8]
)
HIP_P_INIT = 0.12
KNEE_INIT = 0.25
ELBOW_INIT = 0.3

_MASSES = jnp.asarray(
    [PELVIS_M, TORSO_M, THIGH_M, THIGH_M, SHIN_M, SHIN_M, UARM_M, UARM_M,
     FARM_M, FARM_M]
)
_INERTIAS = jnp.asarray(
    [PELVIS_I, TORSO_I]
    + [THIGH_M * THIGH_L**2 / 12.0] * 2
    + [SHIN_M * SHIN_L**2 / 12.0] * 2
    + [UARM_M * UARM_L**2 / 12.0] * 2
    + [FARM_M * FARM_L**2 / 12.0] * 2
)


def _link_frames(q):
    """COM positions + orientations of the 10 bodies and the 4 foot
    contact points (heelL, toeL, heelR, toeR).

    Body order: pelvis, torso, thighL, thighR, shinL, shinR, uarmL,
    uarmR, farmL, farmR. Legs hang from hip anchors at pelvis ± HIP_Y;
    positive hip_pitch swings the leg forward (+x), positive knee bends
    the shin backward; the rigid foot extends TOE_L forward / HEEL_L
    backward along the shin frame's x axis. Arms hang from the torso's
    shoulder anchors; positive elbow bends the forearm forward.
    Returns (coms [10, 3], Rs [10, 3, 3], contacts [4, 3]).

    Written in SCALAR form — tuples of per-env scalars, arrays stacked
    only at the end — so every batched intermediate is a full [B] vector
    on TPU (lagrangian.py module docstring; ant3d._link_frames note).
    """
    pos = (q[0], q[1], q[2])
    R_p = euler_zyx(q[3], q[4], q[5])
    R_t = mat_mul(R_p, mat_mul(rot_y(q[6]), rot_x(q[7])))
    torso_com = v_add(pos, mat_vec(R_t, (0.0, 0.0, TORSO_Z)))

    down = (0.0, 0.0, -1.0)
    fwd = (1.0, 0.0, 0.0)

    def _leg(side, hp, hr, kn):
        anchor = v_add(pos, mat_vec(R_p, (0.0, side * HIP_Y, 0.0)))
        R_hr = mat_mul(R_p, rot_x(hr))
        R_th = mat_mul(R_hr, rot_y(hp))
        R_sh = mat_mul(R_hr, rot_y(hp - kn))
        d_th = mat_vec(R_th, down)
        d_sh = mat_vec(R_sh, down)
        thigh_com = v_add(anchor, v_scale(0.5 * THIGH_L, d_th))
        knee = v_add(anchor, v_scale(THIGH_L, d_th))
        shin_com = v_add(knee, v_scale(0.5 * SHIN_L, d_sh))
        ankle = v_add(knee, v_scale(SHIN_L, d_sh))
        f_dir = mat_vec(R_sh, fwd)
        heel = v_add(ankle, v_scale(-HEEL_L, f_dir))
        toe = v_add(ankle, v_scale(TOE_L, f_dir))
        return thigh_com, shin_com, R_th, R_sh, heel, toe

    thL, shL, RthL, RshL, heL, toL = _leg(1.0, q[8], q[9], q[10])
    thR, shR, RthR, RshR, heR, toR = _leg(-1.0, q[11], q[12], q[13])

    def _arm(side, sp, el):
        anchor = v_add(torso_com, mat_vec(R_t, (0.0, side * SH_Y, SH_Z)))
        R_ua = mat_mul(R_t, rot_y(sp))
        R_fa = mat_mul(R_t, rot_y(sp + el))
        d_ua = mat_vec(R_ua, down)
        d_fa = mat_vec(R_fa, down)
        uarm_com = v_add(anchor, v_scale(0.5 * UARM_L, d_ua))
        elbow = v_add(anchor, v_scale(UARM_L, d_ua))
        farm_com = v_add(elbow, v_scale(0.5 * FARM_L, d_fa))
        return uarm_com, farm_com, R_ua, R_fa

    uaL, faL, RuaL, RfaL = _arm(1.0, q[14], q[15])
    uaR, faR, RuaR, RfaR = _arm(-1.0, q[16], q[17])

    coms = stack_vec(
        [pos, torso_com, thL, thR, shL, shR, uaL, uaR, faL, faR]
    )
    Rs = stack_mat(
        [R_p, R_t, RthL, RthR, RshL, RshR, RuaL, RuaR, RfaL, RfaR]
    )
    contacts = stack_vec([heL, toL, heR, toR])
    return coms, Rs, contacts


def kinetic_energy(q, qd):
    """T(q, qd) = 1/2 Σ m |v|² + 1/4 Σ I ‖Ṙ‖²_F (ant3d.kinetic_energy
    scheme — one jvp through the kinematics gives all body velocities)."""
    _, (vcoms, Rdots, _) = jax.jvp(_link_frames, (q,), (qd,))
    return 0.5 * jnp.sum(
        _MASSES[:, None] * vcoms * vcoms
    ) + 0.25 * jnp.sum(_INERTIAS[:, None, None] * Rdots * Rdots)


def potential_energy(q):
    coms, _, _ = _link_frames(q)
    return GRAVITY * jnp.sum(_MASSES * coms[:, 2])


def _step_factors(q, qd):
    """chol(M(q)), bias, contact jacobian + contact points — once per
    control step, frozen across integration substeps. Jacobian point-mass
    formulation (lagrangian.py; no jax.hessian — see ant3d._step_factors
    and docs/PERF.md). Equivalence with the energy-autodiff form is
    asserted in tests/test_humanoid3d.py."""
    M, bias, contact_jac, pts0 = lagrangian_factors(
        _link_frames, _MASSES, _INERTIAS, q, qd, GRAVITY
    )
    cho = _chol_factor(M + 1e-6 * jnp.eye(NQ))
    return cho, bias, contact_jac, pts0


def _substep_qdd(q, qd, action, cho, bias, contact_jac, pts):
    """Per-substep forces (3D heel/toe contacts, damping, joint limits).

    ``pts`` are the current contact points, advanced by the caller with
    the frozen jacobian (pts0 + J·(q − q0)) instead of re-running the
    full kinematics each substep (ant3d._substep_qdd note)."""
    tau = jnp.zeros(NQ).at[6:].set(GEAR * action)
    tau = tau.at[6:].add(-JOINT_DAMPING * qd[6:])
    joint_q = q[6:]
    limit_force = -LIMIT_K * (
        jnp.maximum(joint_q - JOINT_HI, 0.0)
        + jnp.minimum(joint_q - JOINT_LO, 0.0)
    )
    tau = tau.at[6:].add(limit_force)

    pts_vel = contact_jac @ qd  # [4, 3]
    depth = jnp.maximum(-pts[:, 2], 0.0)
    in_contact = depth > 0.0
    fn_mag = K_GROUND * depth - D_GROUND * pts_vel[:, 2] * in_contact
    fn_mag = jnp.maximum(fn_mag, 0.0) * in_contact
    ft = -MU_FRICTION * fn_mag[:, None] * jnp.tanh(pts_vel[:, :2] * 10.0)
    f_contact = jnp.concatenate([ft, fn_mag[:, None]], axis=-1)
    tau_contact = jnp.einsum("fcq,fc->q", contact_jac, f_contact)

    rhs = tau + tau_contact - bias
    return _chol_solve(cho, rhs)


@struct.dataclass
class Humanoid3DState:
    q: jnp.ndarray
    qd: jnp.ndarray
    last_x: jnp.ndarray


def _init_q():
    """Nominal slightly-knees-bent standing pose with both feet touching."""
    q = jnp.zeros(NQ)
    # legs: hip pitched forward HIP_P_INIT, knee bent KNEE_INIT
    for base in (8, 11):
        q = q.at[base].set(HIP_P_INIT).at[base + 2].set(KNEE_INIT)
    q = q.at[15].set(ELBOW_INIT).at[17].set(ELBOW_INIT)
    # pelvis height: put the lowest contact point just at the ground
    lowest = jnp.min(_link_frames(q)[2][:, 2])
    return q.at[2].add(-lowest + 0.005)


class Humanoid3D(JaxEnv):
    """3D biped locomotion. obs 41, act 12, episode 1000 steps."""

    max_episode_steps = 1000
    # z, pelvis orientation 6D (first two R columns), 12 joints,
    # 18 velocities, 4 contacts
    OBS_DIM = 41

    def env_info(self):
        return EnvInfo(
            observation_space=Box(shape=(self.OBS_DIM,)),
            action_space=Box(shape=(NU,), low=-1.0, high=1.0),
        )

    def _obs(self, state: Humanoid3DState):
        q, qd = state.q, state.qd
        _, Rs, pts = _link_frames(q)
        R = Rs[0]
        contacts = (pts[:, 2] < 0.005).astype(jnp.float32)
        return jnp.concatenate(
            [
                q[2:3],                     # pelvis height
                R[:, 0], R[:, 1],           # orientation (6D rotation rep)
                q[6:],                      # joint angles
                jnp.clip(qd, -10.0, 10.0),  # all velocities
                contacts,
            ]
        )

    def reset(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        q = _init_q()
        q = q.at[6:].add(0.03 * jax.random.normal(k1, (NU,)))
        q = q.at[3:6].add(0.01 * jax.random.normal(k3, (3,)))
        qd = 0.01 * jax.random.normal(k2, (NQ,))
        state = Humanoid3DState(q=q, qd=qd, last_x=q[0])
        return state, self._obs(state)

    def step(self, estate: Humanoid3DState, action, key):
        action = jnp.clip(action, -1.0, 1.0)
        q, qd = estate.q, estate.qd
        h = DT / SUBSTEPS
        q0 = q
        cho, bias, contact_jac, pts0 = _step_factors(q, qd)

        def substep(carry, _):
            q, qd = carry
            pts = pts0 + contact_jac @ (q - q0)
            qdd = _substep_qdd(q, qd, action, cho, bias, contact_jac, pts)
            qd = jnp.clip(qd + h * qdd, -50.0, 50.0)
            q = q + h * qd
            return (q, qd), None

        (q, qd), _ = jax.lax.scan(substep, (q, qd), None, length=SUBSTEPS)

        fwd_vel = (q[0] - estate.last_x) / DT
        ctrl_cost = 0.1 * jnp.sum(jnp.square(action))
        reward = 1.25 * fwd_vel + 5.0 - ctrl_cost

        pelvis_low = q[2] < 0.42
        # tipping over also keeps pitch far from the ±π/2 Euler
        # singularity (see module docstring)
        tipped = (jnp.abs(q[3]) > 0.8) | (jnp.abs(q[4]) > 0.8)
        terminated = pelvis_low | tipped

        state = Humanoid3DState(q=q, qd=qd, last_x=q[0])
        return state, self._obs(state), reward, terminated, {}
