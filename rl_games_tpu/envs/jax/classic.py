"""Pure-JAX classic-control environments (device-resident).

Dynamics match gymnasium's CartPole-v1 / Pendulum-v1 / Acrobot-v1 /
MountainCarContinuous-v0 so reward scales and learning curves are directly
comparable with the reference's host-env runs (the reference registers these
through env_configurations.py:198-331; here they live on the accelerator and
step inside the rollout scan).
"""

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from rl_games_tpu.envs.jax.base import JaxEnv
from rl_games_tpu.envs.spaces import Box, Discrete, EnvInfo


@struct.dataclass
class ArrayState:
    x: jnp.ndarray


class CartPole(JaxEnv):
    """CartPole-v1: state = [x, x_dot, theta, theta_dot], reward 1/step."""

    max_episode_steps = 500

    GRAVITY = 9.8
    MASSCART = 1.0
    MASSPOLE = 0.1
    TOTAL_MASS = MASSCART + MASSPOLE
    LENGTH = 0.5
    POLEMASS_LENGTH = MASSPOLE * LENGTH
    FORCE_MAG = 10.0
    TAU = 0.02
    THETA_LIMIT = 12 * 2 * math.pi / 360
    X_LIMIT = 2.4

    def env_info(self):
        return EnvInfo(
            observation_space=Box(shape=(4,)),
            action_space=Discrete(n=2),
        )

    def reset(self, key):
        x = jax.random.uniform(key, (4,), jnp.float32, -0.05, 0.05)
        return ArrayState(x=x), x

    def step(self, estate, action, key):
        x, x_dot, theta, theta_dot = estate.x
        force = jnp.where(action == 1, self.FORCE_MAG, -self.FORCE_MAG)
        costheta = jnp.cos(theta)
        sintheta = jnp.sin(theta)
        temp = (
            force + self.POLEMASS_LENGTH * theta_dot**2 * sintheta
        ) / self.TOTAL_MASS
        thetaacc = (self.GRAVITY * sintheta - costheta * temp) / (
            self.LENGTH
            * (4.0 / 3.0 - self.MASSPOLE * costheta**2 / self.TOTAL_MASS)
        )
        xacc = temp - self.POLEMASS_LENGTH * thetaacc * costheta / self.TOTAL_MASS
        x = x + self.TAU * x_dot
        x_dot = x_dot + self.TAU * xacc
        theta = theta + self.TAU * theta_dot
        theta_dot = theta_dot + self.TAU * thetaacc
        new = jnp.stack([x, x_dot, theta, theta_dot])
        terminated = (
            (jnp.abs(x) > self.X_LIMIT) | (jnp.abs(theta) > self.THETA_LIMIT)
        )
        reward = jnp.float32(1.0)
        return ArrayState(x=new), new, reward, terminated, {}


class Pendulum(JaxEnv):
    """Pendulum-v1: obs [cos, sin, thdot], continuous torque in [-2, 2]."""

    max_episode_steps = 200

    MAX_SPEED = 8.0
    MAX_TORQUE = 2.0
    DT = 0.05
    G = 10.0
    M = 1.0
    L = 1.0

    def env_info(self):
        return EnvInfo(
            observation_space=Box(shape=(3,)),
            action_space=Box(shape=(1,), low=-2.0, high=2.0),
        )

    def _obs(self, th, thdot):
        return jnp.stack([jnp.cos(th), jnp.sin(th), thdot])

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        th = jax.random.uniform(k1, (), jnp.float32, -jnp.pi, jnp.pi)
        thdot = jax.random.uniform(k2, (), jnp.float32, -1.0, 1.0)
        state = ArrayState(x=jnp.stack([th, thdot]))
        return state, self._obs(th, thdot)

    def step(self, estate, action, key):
        th, thdot = estate.x
        u = jnp.clip(action[0], -self.MAX_TORQUE, self.MAX_TORQUE)

        def angle_normalize(a):
            return ((a + jnp.pi) % (2 * jnp.pi)) - jnp.pi

        costs = (
            angle_normalize(th) ** 2 + 0.1 * thdot**2 + 0.001 * u**2
        )
        newthdot = thdot + (
            3.0 * self.G / (2.0 * self.L) * jnp.sin(th)
            + 3.0 / (self.M * self.L**2) * u
        ) * self.DT
        newthdot = jnp.clip(newthdot, -self.MAX_SPEED, self.MAX_SPEED)
        newth = th + newthdot * self.DT
        state = ArrayState(x=jnp.stack([newth, newthdot]))
        return (
            state,
            self._obs(newth, newthdot),
            -costs,
            jnp.bool_(False),
            {},
        )


class MountainCarContinuous(JaxEnv):
    """MountainCarContinuous-v0."""

    max_episode_steps = 999

    def env_info(self):
        return EnvInfo(
            observation_space=Box(shape=(2,)),
            action_space=Box(shape=(1,), low=-1.0, high=1.0),
        )

    def reset(self, key):
        pos = jax.random.uniform(key, (), jnp.float32, -0.6, -0.4)
        s = jnp.stack([pos, jnp.float32(0.0)])
        return ArrayState(x=s), s

    def step(self, estate, action, key):
        position, velocity = estate.x
        force = jnp.clip(action[0], -1.0, 1.0)
        velocity = velocity + force * 0.0015 - 0.0025 * jnp.cos(3 * position)
        velocity = jnp.clip(velocity, -0.07, 0.07)
        position = jnp.clip(position + velocity, -1.2, 0.6)
        velocity = jnp.where(
            (position <= -1.2) & (velocity < 0), 0.0, velocity
        )
        terminated = (position >= 0.45) & (velocity >= 0.0)
        reward = jnp.where(terminated, 100.0, 0.0) - 0.1 * force**2
        s = jnp.stack([position, velocity])
        return ArrayState(x=s), s, reward, terminated, {}
