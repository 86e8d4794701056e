"""Parameterized planar legged locomotion — the morphology-generalized
sibling of ant2d.py (same Lagrangian-autodiff dynamics recipe: M(q) from a
hessian of the kinetic energy, bias terms from jvp/grad, unrolled Cholesky
solve, penalty-spring contacts).

Morphologies stand in for the reference's brax family (envs/brax.py;
configs/brax/*): `Cheetah2D` is a planar biped with long sprinter legs (the
brax halfcheetah analog), registered as the `Cheetah2D` env.
"""

import jax
import jax.numpy as jnp
from flax import struct

from rl_games_tpu.envs.jax.ant2d import _chol_factor, _chol_solve
from rl_games_tpu.envs.jax.lagrangian import lagrangian_factors_2d
from rl_games_tpu.envs.jax.base import JaxEnv
from rl_games_tpu.envs.spaces import Box, EnvInfo

GRAVITY = 9.81


@struct.dataclass
class WalkerState:
    q: jnp.ndarray
    qd: jnp.ndarray
    last_x: jnp.ndarray


class PlanarWalker(JaxEnv):
    """Free torso (x, z, pitch) + N legs x (hip, knee) hinges.

    All morphology constants are static Python values, so each instance
    traces into its own specialized XLA program; the autodiff chain
    (hessian → mass matrix, jvp → Coriolis) follows ant2d.py exactly.
    """

    max_episode_steps = 1000

    def __init__(self, hip_x, link_l=0.28, link_m=0.15, torso_m=1.0,
                 torso_i=0.05, torque_scale=2.2, dt=0.02, substeps=4,
                 joint_damping=0.08, k_ground=900.0, d_ground=9.0,
                 mu_friction=0.9, joint_limit=1.2, alive_bonus=0.5,
                 ctrl_cost=0.25, init_height_factor=1.6,
                 crash_height=0.12, crash_pitch=1.3):
        self.hip_x = jnp.asarray(hip_x, jnp.float32)
        self.n_legs = len(hip_x)
        self.nq = 3 + 2 * self.n_legs
        self.link_l = float(link_l)
        self.torque_scale = float(torque_scale)
        self.dt = float(dt)
        self.substeps = int(substeps)
        self.joint_damping = float(joint_damping)
        self.k_ground = float(k_ground)
        self.d_ground = float(d_ground)
        self.mu_friction = float(mu_friction)
        self.joint_limit = float(joint_limit)
        self.alive_bonus = float(alive_bonus)
        self.ctrl_cost = float(ctrl_cost)
        self.init_height = float(init_height_factor) * self.link_l
        self.crash_height = float(crash_height)
        self.crash_pitch = float(crash_pitch)
        link_i = link_m * link_l**2 / 12.0
        self.masses = jnp.asarray(
            [torso_m] + [link_m] * (2 * self.n_legs), jnp.float32
        )
        self.inertias = jnp.asarray(
            [torso_i] + [link_i] * (2 * self.n_legs), jnp.float32
        )
        self.obs_dim = 3 + 2 * self.n_legs + self.nq + self.n_legs

    # -- dynamics (ant2d.py recipe, morphology-parameterized) ---------------
    def _link_frames(self, q):
        th = q[2]
        torso = q[0:2]
        hip_q = q[3::2]
        knee_q = q[4::2]
        ca, sa = jnp.cos(th), jnp.sin(th)
        anchors = (
            torso[None, :] + self.hip_x[:, None] * jnp.stack([ca, sa])[None, :]
        )
        a1 = th + hip_q
        dir1 = jnp.stack([jnp.sin(a1), -jnp.cos(a1)], axis=-1)
        thigh_com = anchors + 0.5 * self.link_l * dir1
        knees = anchors + self.link_l * dir1
        a2 = a1 + knee_q
        dir2 = jnp.stack([jnp.sin(a2), -jnp.cos(a2)], axis=-1)
        shin_com = knees + 0.5 * self.link_l * dir2
        feet = knees + self.link_l * dir2
        coms = jnp.concatenate([torso[None, :], thigh_com, shin_com], axis=0)
        angles = jnp.concatenate([th[None], a1, a2])
        return coms, angles, feet

    def _kinetic_energy(self, q, qd):
        _, (vcoms, vangles, _) = jax.jvp(self._link_frames, (q,), (qd,))
        return 0.5 * jnp.sum(
            self.masses[:, None] * vcoms * vcoms
        ) + 0.5 * jnp.sum(self.inertias * vangles * vangles)

    def _potential_energy(self, q):
        coms, _, _ = self._link_frames(q)
        return GRAVITY * jnp.sum(self.masses * coms[:, 1])

    def _step_factors(self, q, qd):
        # planar Jacobian point-mass factors (ant2d._step_factors note)
        M, bias, feet_jac, feet0 = lagrangian_factors_2d(
            self._link_frames, self.masses, self.inertias, q, qd, GRAVITY
        )
        cho = _chol_factor(M + 1e-6 * jnp.eye(self.nq))
        return cho, bias, feet_jac, feet0

    def _substep_qdd(self, q, qd, tau_joints, cho, bias, feet_jac, feet):
        tau = jnp.zeros(self.nq).at[3:].set(self.torque_scale * tau_joints)
        tau = tau.at[3:].add(-self.joint_damping * qd[3:])
        joint_q = q[3:]
        limit_force = -8.0 * (
            jnp.maximum(joint_q - self.joint_limit, 0.0)
            + jnp.minimum(joint_q + self.joint_limit, 0.0)
        )
        tau = tau.at[3:].add(limit_force)

        feet_vel = feet_jac @ qd
        depth = jnp.maximum(-feet[:, 1], 0.0)
        in_contact = depth > 0.0
        fn_mag = (
            self.k_ground * depth - self.d_ground * feet_vel[:, 1] * in_contact
        )
        fn_mag = jnp.maximum(fn_mag, 0.0) * in_contact
        ft = -self.mu_friction * fn_mag * jnp.tanh(feet_vel[:, 0] * 10.0)
        f_contact = jnp.stack([ft, fn_mag], axis=-1)
        tau_contact = jnp.einsum("fcq,fc->q", feet_jac, f_contact)
        rhs = tau + tau_contact - bias
        return _chol_solve(cho, rhs)

    # -- env API ------------------------------------------------------------
    def env_info(self):
        return EnvInfo(
            observation_space=Box(shape=(self.obs_dim,)),
            action_space=Box(shape=(2 * self.n_legs,), low=-1.0, high=1.0),
        )

    def _obs(self, state: WalkerState):
        q, qd = state.q, state.qd
        _, _, feet = self._link_frames(q)
        contacts = (feet[:, 1] < 0.005).astype(jnp.float32)
        return jnp.concatenate(
            [
                q[1:2],
                jnp.stack([jnp.sin(q[2]), jnp.cos(q[2])]),
                q[3:],
                jnp.clip(qd, -10.0, 10.0),
                contacts,
            ]
        )

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        q = jnp.zeros(self.nq)
        q = q.at[1].set(self.init_height)
        q = q.at[3:].set(
            jnp.tile(jnp.asarray([0.25, -0.5]), self.n_legs)
            + 0.08 * jax.random.normal(k1, (2 * self.n_legs,))
        )
        qd = 0.02 * jax.random.normal(k2, (self.nq,))
        state = WalkerState(q=q, qd=qd, last_x=q[0])
        return state, self._obs(state)

    def step(self, estate: WalkerState, action, key):
        action = jnp.clip(action, -1.0, 1.0)
        q, qd = estate.q, estate.qd
        h = self.dt / self.substeps
        q0 = q
        cho, bias, feet_jac, feet0 = self._step_factors(q, qd)

        def substep(carry, _):
            q, qd = carry
            feet = feet0 + feet_jac @ (q - q0)
            qdd = self._substep_qdd(q, qd, action, cho, bias, feet_jac, feet)
            qd = jnp.clip(qd + h * qdd, -50.0, 50.0)
            q = q + h * qd
            return (q, qd), None

        (q, qd), _ = jax.lax.scan(substep, (q, qd), None, length=self.substeps)

        fwd_vel = (q[0] - estate.last_x) / self.dt
        ctrl = self.ctrl_cost * jnp.sum(jnp.square(action))
        reward = fwd_vel + self.alive_bonus - ctrl

        crashed = (q[1] < self.crash_height) | (
            jnp.abs(q[2]) > self.crash_pitch
        )
        state = WalkerState(q=q, qd=qd, last_x=q[0])
        return state, self._obs(state), reward, crashed, {}


def Walker2D():
    """Planar upright biped (the brax humanoid-class balance+walk analog):
    short hip spacing, strict pitch limit — staying upright is part of the
    task, unlike the sprawling Ant2D."""
    return PlanarWalker(
        hip_x=[-0.08, 0.08],
        link_l=0.35,
        link_m=0.18,
        torso_m=1.5,
        torso_i=0.1,
        torque_scale=2.6,
        joint_limit=1.2,
        alive_bonus=1.0,
        ctrl_cost=0.15,
        init_height_factor=1.75,
        crash_height=0.45,
        crash_pitch=0.7,
    )


def Cheetah2D():
    """Planar sprinter biped (the brax halfcheetah analog): two long legs
    at the torso ends, higher torque, laxer pitch limit."""
    return PlanarWalker(
        hip_x=[-0.5, 0.5],
        link_l=0.4,
        link_m=0.2,
        torso_m=1.2,
        torso_i=0.12,
        torque_scale=3.0,
        joint_limit=1.4,
        alive_bonus=0.3,
        ctrl_cost=0.1,
        crash_pitch=1.6,
    )
