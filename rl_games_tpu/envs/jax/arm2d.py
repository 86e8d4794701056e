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


@struct.dataclass
class GraspState:
    q: jnp.ndarray        # [n] joint angles
    qd: jnp.ndarray       # [n]
    obj: jnp.ndarray      # [2] object position
    objd: jnp.ndarray     # [2] object velocity
    target: jnp.ndarray   # [2] place target
    held: jnp.ndarray     # [] bool — object latched to the gripper


class Grasp2D(Arm2D):
    """Planar pick-and-place (brax 'grasp' task analog: a claw must grab an
    object and move it to a target, configs/brax/ppo_grasp.yaml).

    Same Lagrangian arm as Arm2D plus a free object: the last action channel
    is the gripper; closing it within ``grab_radius`` of the object latches
    the object to the end effector (kinematic grasp — the brax env's claw
    contact role), opening releases it into free fall. Reward shapes
    approach → grasp → carry: -dist(ee, obj) while free,
    -dist(obj, target) + carry bonus while held, + place bonus when the
    held object reaches the target.
    """

    max_episode_steps = 200

    def __init__(self, grab_radius=0.12, place_radius=0.1,
                 carry_bonus=0.5, place_bonus=4.0, **kw):
        super().__init__(**kw)
        self.grab_radius = float(grab_radius)
        self.place_radius = float(place_radius)
        self.carry_bonus = float(carry_bonus)
        self.place_bonus = float(place_bonus)
        # obs: arm (sin q, cos q, qd) + ee + obj + objd + target + held
        self.obs_dim = 3 * self.n + 9

    def env_info(self):
        return EnvInfo(
            observation_space=Box(shape=(self.obs_dim,)),
            # n joint torques + 1 gripper channel
            action_space=Box(shape=(self.n + 1,), low=-1.0, high=1.0),
        )

    def _obs(self, state: GraspState):
        _, _, ee = self._frames(state.q)
        return jnp.concatenate(
            [
                jnp.sin(state.q),
                jnp.cos(state.q),
                jnp.clip(state.qd, -20.0, 20.0),
                ee,
                state.obj - ee,
                jnp.clip(state.objd, -10.0, 10.0),
                state.target - state.obj,
                state.held.astype(jnp.float32)[None],
            ]
        )

    @property
    def _floor(self):
        # virtual table comfortably inside the workspace so dropped
        # objects stay reachable
        return -0.5 * self.reach

    def reset(self, key):
        kq, ko, kt = jax.random.split(key, 3)
        q = 0.1 * jax.random.normal(kq, (self.n,))
        # object rests on the table at a random reachable x
        ox = jax.random.uniform(
            ko, (), minval=-0.7 * self.reach, maxval=0.7 * self.reach
        )
        obj = jnp.stack([ox, jnp.asarray(self._floor)])
        # place target in the reachable upper half-plane
        target = self._sample_target(kt)
        target = target.at[1].set(jnp.abs(target[1]))
        state = GraspState(
            q=q, qd=jnp.zeros(self.n), obj=obj, objd=jnp.zeros(2),
            target=target, held=jnp.asarray(False),
        )
        return state, self._obs(state)

    def step(self, estate: GraspState, action, key):
        action = jnp.clip(action, -1.0, 1.0)
        tau_a, grip = action[: self.n], action[self.n]
        q, qd = estate.q, estate.qd
        h = self.dt / self.substeps

        def substep(carry, _):
            q, qd = carry
            qdd = self._qdd(q, qd, tau_a)
            qd = jnp.clip(qd + h * qdd, -30.0, 30.0)
            q = q + h * qd
            return (q, qd), None

        (q, qd), _ = jax.lax.scan(substep, (q, qd), None, length=self.substeps)
        _, _, ee = self._frames(q)

        # grasp latch: closing the gripper near the object grabs it;
        # opening releases it (kinematic — the claw-contact role)
        near = jnp.linalg.norm(estate.obj - ee) < self.grab_radius
        want_hold = grip > 0.0
        held = want_hold & (estate.held | near)
        # held object rides the end effector; free object is a point mass
        # under gravity, resting on the virtual table at y = -reach
        free_objd = estate.objd + self.dt * jnp.asarray([0.0, -self.g])
        free_obj = estate.obj + self.dt * free_objd
        floor = self._floor
        bounced = free_obj[1] < floor
        free_obj = free_obj.at[1].max(floor)
        free_objd = jnp.where(
            bounced, free_objd * jnp.asarray([0.8, 0.0]), free_objd
        )
        obj = jnp.where(held, ee, free_obj)
        objd = jnp.where(held, jnp.zeros(2), free_objd)

        d_obj = jnp.linalg.norm(obj - ee)
        d_target = jnp.linalg.norm(obj - estate.target)
        placed = held & (d_target < self.place_radius)
        reward = (
            jnp.where(held, -d_target + self.carry_bonus, -d_obj)
            + self.place_bonus * placed
            - self.ctrl_cost * jnp.sum(jnp.square(tau_a))
        )
        state = GraspState(
            q=q, qd=qd, obj=obj, objd=objd, target=estate.target, held=held,
        )
        return state, self._obs(state), reward, jnp.asarray(False), {}
