"""Device-resident planar arm reaching — the brax arm-task analog.

The reference's brax family includes fixed-base arm tasks (configs/brax/
ppo_ur5e.yaml: a UR5e reach task where reward = -distance(end-effector,
target); envs/brax.py reaches it through the jax<->torch dlpack bridge).
``Arm2D`` is the in-tree analog on the same Lagrangian-autodiff machinery
as ant2d/locomotion2d: an N-link torque-controlled planar arm, fixed base,
per-episode random target, reward = -distance + reach bonus - ctrl cost.

No contacts — the dynamics are exactly M(q)·qdd = tau - bias with M from a
hessian of the kinetic energy and bias terms from jvp/grad, solved with the
unrolled Cholesky (ant2d._chol_*). Whole env lives in jit: vmapped over the
env axis inside the rollout scan (SURVEY §2.6 actor-parallelism row).
"""

import jax
import jax.numpy as jnp
from flax import struct

from rl_games_tpu.envs.jax.ant2d import _chol_factor, _chol_solve
from rl_games_tpu.envs.jax.base import JaxEnv
from rl_games_tpu.envs.spaces import Box, EnvInfo

GRAVITY = 9.81


@struct.dataclass
class ArmState:
    q: jnp.ndarray       # [n] joint angles
    qd: jnp.ndarray      # [n]
    target: jnp.ndarray  # [2]


class Arm2D(JaxEnv):
    """N-link planar reacher (brax ur5e-class task)."""

    max_episode_steps = 150

    def __init__(self, n_links=3, link_l=0.35, link_m=0.4,
                 torque_scale=6.0, dt=0.02, substeps=4, joint_damping=0.35,
                 ctrl_cost=0.05, reach_radius=0.08, reach_bonus=2.0,
                 gravity=True):
        self.n = int(n_links)
        self.link_l = float(link_l)
        self.torque_scale = float(torque_scale)
        self.dt = float(dt)
        self.substeps = int(substeps)
        self.joint_damping = float(joint_damping)
        self.ctrl_cost = float(ctrl_cost)
        self.reach_radius = float(reach_radius)
        self.reach_bonus = float(reach_bonus)
        self.g = GRAVITY if gravity else 0.0
        link_i = link_m * link_l**2 / 12.0
        self.masses = jnp.full((self.n,), link_m, jnp.float32)
        self.inertias = jnp.full((self.n,), link_i, jnp.float32)
        self.reach = self.n * self.link_l
        # obs: [sin q, cos q, qd, target, ee, target - ee]
        self.obs_dim = 3 * self.n + 6

    # -- kinematics / dynamics (ant2d recipe, fixed base) ---------------
    def _frames(self, q):
        angles = jnp.cumsum(q)
        dirs = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)
        joints = jnp.concatenate(
            [jnp.zeros((1, 2)), jnp.cumsum(self.link_l * dirs, axis=0)]
        )
        coms = joints[:-1] + 0.5 * self.link_l * dirs
        ee = joints[-1]
        return coms, angles, ee

    def _kinetic_energy(self, q, qd):
        _, (vcoms, vangles, _) = jax.jvp(self._frames, (q,), (qd,))
        return 0.5 * jnp.sum(
            self.masses[:, None] * vcoms * vcoms
        ) + 0.5 * jnp.sum(self.inertias * vangles * vangles)

    def _potential_energy(self, q):
        coms, _, _ = self._frames(q)
        return self.g * jnp.sum(self.masses * coms[:, 1])

    def _qdd(self, q, qd, action):
        ke = self._kinetic_energy
        M = jax.hessian(ke, argnums=1)(q, qd)
        dTdqd = lambda qq, qqd: jax.grad(ke, argnums=1)(qq, qqd)
        coriolis = jax.jvp(lambda qq: dTdqd(qq, qd), (q,), (qd,))[1]
        grav = jax.grad(self._potential_energy)(q)
        dTdq = jax.grad(ke, argnums=0)(q, qd)
        bias = coriolis - dTdq + grav
        tau = self.torque_scale * action - self.joint_damping * qd
        cho = _chol_factor(M + 1e-6 * jnp.eye(self.n))
        return _chol_solve(cho, tau - bias)

    # -- env API --------------------------------------------------------
    def env_info(self):
        return EnvInfo(
            observation_space=Box(shape=(self.obs_dim,)),
            action_space=Box(shape=(self.n,), low=-1.0, high=1.0),
        )

    def _obs(self, state: ArmState):
        _, _, ee = self._frames(state.q)
        return jnp.concatenate(
            [
                jnp.sin(state.q),
                jnp.cos(state.q),
                jnp.clip(state.qd, -20.0, 20.0),
                state.target,
                ee,
                state.target - ee,
            ]
        )

    def _sample_target(self, key):
        kr, ka = jax.random.split(key)
        r = jax.random.uniform(
            kr, (), minval=0.3 * self.reach, maxval=0.95 * self.reach
        )
        a = jax.random.uniform(ka, (), minval=0.0, maxval=2.0 * jnp.pi)
        return r * jnp.stack([jnp.cos(a), jnp.sin(a)])

    def reset(self, key):
        kq, kt = jax.random.split(key)
        q = 0.1 * jax.random.normal(kq, (self.n,))
        state = ArmState(
            q=q, qd=jnp.zeros(self.n), target=self._sample_target(kt)
        )
        return state, self._obs(state)

    def step(self, estate: ArmState, action, key):
        action = jnp.clip(action, -1.0, 1.0)
        q, qd = estate.q, estate.qd
        h = self.dt / self.substeps

        def substep(carry, _):
            q, qd = carry
            qdd = self._qdd(q, qd, action)
            qd = jnp.clip(qd + h * qdd, -30.0, 30.0)
            q = q + h * qd
            return (q, qd), None

        (q, qd), _ = jax.lax.scan(substep, (q, qd), None, length=self.substeps)
        state = ArmState(q=q, qd=qd, target=estate.target)
        _, _, ee = self._frames(q)
        dist = jnp.linalg.norm(state.target - ee)
        reward = (
            -dist
            + self.reach_bonus * (dist < self.reach_radius)
            - self.ctrl_cost * jnp.sum(jnp.square(action))
        )
        return state, self._obs(state), reward, jnp.asarray(False), {}
