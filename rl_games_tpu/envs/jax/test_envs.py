"""Device-resident test environments.

JAX analogs of the reference fixtures (rl_games/envs/test/):
  * MemoryEnv — the RNN credit-assignment task (rnn_env.py:5-158): a goal
    position is shown for the first steps then hidden; the agent must walk to
    it from memory. Validates recurrent policies end-to-end.
  * AsymmetricEnv — velocity-masked observations with full state for the
    central-value critic (test_asymmetric_env.py:6-55), built on the JAX
    CartPole dynamics.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from rl_games_tpu.envs.jax.base import JaxEnv
from rl_games_tpu.envs.jax.classic import CartPole
from rl_games_tpu.envs.spaces import (
    Box, Discrete, DictSpace, EnvInfo, MultiDiscrete,
)


@struct.dataclass
class MemoryState:
    pos: jnp.ndarray  # [2] int32
    goal: jnp.ndarray  # [2] int32
    steps: jnp.ndarray  # () int32


class MemoryEnv(JaxEnv):
    """Goal hidden after `show_time` steps (hide_object=True); reward 1 on
    reaching it. Discrete(4) moves in +-x / +-y after step 1.

    Flag-parameterized like the reference TestRNNEnv (rnn_env.py:5-50):
      * multi_discrete_space — Tuple(Discrete(2), Discrete(3)) actions
        (head 0: +x/-x, head 1: +y/-y/no-op; rnn_env.py:86-97)
      * multi_head_value — value_size 2 with vector reward [win, dist]
        (rnn_env.py:18-23, 105-119)
      * use_central_value — {'obs','states'} wrapper, state never hides
        the goal (rnn_env.py:139-148)
    """

    def __init__(self, max_steps=21, hide_object=True, min_dist=2, max_dist=8,
                 apply_dist_reward=False, multi_discrete_space=False,
                 multi_head_value=False, use_central_value=False):
        self.max_steps = max_steps
        self.hide_object = hide_object
        self.min_dist = min_dist
        self.max_dist = max_dist
        self.apply_dist_reward = apply_dist_reward
        self.multi_discrete_space = multi_discrete_space
        self.multi_head_value = multi_head_value
        self.use_central_value = use_central_value
        self.max_episode_steps = max_steps

    def env_info(self):
        action_space = (
            MultiDiscrete(nvec=(2, 3))
            if self.multi_discrete_space
            else Discrete(n=4)
        )
        return EnvInfo(
            observation_space=Box(shape=(6,)),
            action_space=action_space,
            state_space=Box(shape=(6,)) if self.use_central_value else None,
            value_size=2 if self.multi_head_value else 1,
        )

    def _obs(self, state: MemoryState):
        show = jnp.where(
            self.hide_object & (state.steps > 0), 0.0, 1.0
        )
        goal_obs = state.goal.astype(jnp.float32) * show
        return jnp.concatenate(
            [
                state.pos.astype(jnp.float32),
                goal_obs,
                jnp.stack([show, state.steps.astype(jnp.float32)]),
            ]
        )

    def _state_obs(self, state: MemoryState):
        """Central-value state: goal always visible (rnn_env.py:139-141)."""
        return jnp.concatenate(
            [
                state.pos.astype(jnp.float32),
                state.goal.astype(jnp.float32),
                jnp.stack(
                    [jnp.ones(()), state.steps.astype(jnp.float32)]
                ),
            ]
        )

    def _wrap(self, obs, state):
        if self.use_central_value:
            return {"obs": obs, "states": self._state_obs(state)}
        return obs

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        rand_dir = 1 - 2 * jax.random.randint(k1, (2,), 0, 2)
        dist = jax.random.randint(k2, (2,), self.min_dist, self.max_dist + 1)
        state = MemoryState(
            pos=jnp.zeros(2, jnp.int32),
            goal=(rand_dir * dist).astype(jnp.int32),
            steps=jnp.zeros((), jnp.int32),
        )
        # reference reset obs always shows the goal with flags [1, 0]
        obs = jnp.concatenate(
            [
                jnp.zeros(2, jnp.float32),
                state.goal.astype(jnp.float32),
                jnp.asarray([1.0, 0.0]),
            ]
        )
        return state, self._wrap(obs, state)

    def _delta(self, action):
        if self.multi_discrete_space:
            a0, a1 = action[0], action[1]
            return jnp.stack(
                [
                    jnp.where(a0 == 0, 1, 0) - jnp.where(a0 == 1, 1, 0),
                    jnp.where(a1 == 0, 1, 0) - jnp.where(a1 == 1, 1, 0),
                ]
            ).astype(jnp.int32)
        return jnp.stack(
            [
                jnp.where(action == 0, 1, 0) - jnp.where(action == 1, 1, 0),
                jnp.where(action == 2, 1, 0) - jnp.where(action == 3, 1, 0),
            ]
        ).astype(jnp.int32)

    def step(self, estate: MemoryState, action, key):
        steps = estate.steps + 1
        # moves only allowed after step 1 (rnn_env.py:74-84)
        can_move = steps > 1
        pos = estate.pos + jnp.where(can_move, self._delta(action), 0)
        state = MemoryState(pos=pos, goal=estate.goal, steps=steps)
        dist = pos - estate.goal
        reached = (dist**2).sum() < 1
        win_reward = jnp.where(reached, 1.0, 0.0)
        dist_reward = jnp.where(
            self.apply_dist_reward,
            -0.1 * jnp.abs(dist).sum() / self.max_dist,
            0.0,
        )
        if self.multi_head_value:
            reward = jnp.stack([win_reward, dist_reward])
        else:
            reward = win_reward + dist_reward
        terminated = reached
        return state, self._wrap(self._obs(state), state), reward, terminated, {
            "scores": jnp.where(reached, 1.0, 0.0)
        }


class DictObsMemoryEnv(MemoryEnv):
    """MemoryEnv with Dict observations {'pos': 2, 'info': 4 (+ aux_target)}
    (the reference's multi_obs_space variant, rnn_env.py:31-45)."""

    def __init__(self, aux_loss=False, **kw):
        super().__init__(**kw)
        self.aux_loss = aux_loss

    def env_info(self):
        from rl_games_tpu.envs.spaces import DictSpace

        spaces = {"pos": Box(shape=(2,)), "info": Box(shape=(4,))}
        if self.aux_loss:
            spaces["aux_target"] = Box(shape=(1,))
        return EnvInfo(
            observation_space=DictSpace.create(spaces),
            action_space=Discrete(n=4),
        )

    def _split(self, obs, state=None):
        out = {"pos": obs[:2], "info": obs[2:]}
        if self.aux_loss:
            if state is None:
                target = jnp.zeros(1)
            else:
                bound = self.max_dist - self.min_dist
                target = (
                    ((state.goal - state.pos) ** 2).sum(keepdims=True)
                    / bound**2
                ).astype(jnp.float32)
            out["aux_target"] = target
        return out

    def reset(self, key):
        state, obs = super().reset(key)
        return state, self._split(obs, state)

    def step(self, estate, action, key):
        state, obs, reward, terminated, info = super().step(
            estate, action, key
        )
        return state, self._split(obs, state), reward, terminated, info


class MaskedMemoryEnv(MemoryEnv):
    """MemoryEnv variant with action masking: moves along an axis are only
    valid while the agent hasn't overshot past +-max_dist on it — exercises
    the CategoricalMasked path end-to-end (the role SMAC plays for the
    reference, envs/smac_env.py:6-107)."""

    has_action_masks = True

    def action_masks(self, estate: MemoryState):
        pos = estate.pos
        lim = self.max_dist
        return jnp.stack(
            [
                pos[0] < lim,   # +x
                pos[0] > -lim,  # -x
                pos[1] < lim,   # +y
                pos[1] > -lim,  # -y
            ]
        )


class AsymmetricEnv(JaxEnv):
    """CartPole with velocity components masked from the actor obs; the full
    state goes to the central-value critic via obs dict {'obs','states'}."""

    def __init__(self):
        self.inner = CartPole()
        self.max_episode_steps = self.inner.max_episode_steps
        # MaskVelocityWrapper mask for CartPole (wrappers.py:581-601)
        self.mask = jnp.asarray([1.0, 0.0, 1.0, 0.0])

    def env_info(self):
        return EnvInfo(
            observation_space=Box(shape=(4,)),
            action_space=Discrete(n=2),
            state_space=Box(shape=(4,)),
        )

    def reset(self, key):
        estate, obs = self.inner.reset(key)
        return estate, {"obs": obs * self.mask, "states": obs}

    def step(self, estate, action, key):
        estate, obs, reward, terminated, info = self.inner.step(
            estate, action, key
        )
        return (
            estate,
            {"obs": obs * self.mask, "states": obs},
            reward,
            terminated,
            info,
        )


class ContinuousAsymmetricEnv(JaxEnv):
    """Pendulum with the angular-velocity component masked from the actor
    obs; the full state reaches the central-value critic via the
    {'obs','states'} dict (the continuous sibling of AsymmetricEnv — the
    reference's TestAsymmetricCritic fixture role,
    envs/test/test_asymmetric_env.py:6 bound by
    configs/test/test_asymmetric_continuous.yaml)."""

    def __init__(self):
        from rl_games_tpu.envs.jax.classic import Pendulum

        self.inner = Pendulum()
        self.max_episode_steps = self.inner.max_episode_steps
        self.mask = jnp.asarray([1.0, 1.0, 0.0])

    def env_info(self):
        inner = self.inner.env_info()
        return EnvInfo(
            observation_space=inner.observation_space,
            action_space=inner.action_space,
            state_space=inner.observation_space,
        )

    def reset(self, key):
        estate, obs = self.inner.reset(key)
        return estate, {"obs": obs * self.mask, "states": obs}

    def step(self, estate, action, key):
        estate, obs, reward, terminated, info = self.inner.step(
            estate, action, key
        )
        return (
            estate,
            {"obs": obs * self.mask, "states": obs},
            reward,
            terminated,
            info,
        )
