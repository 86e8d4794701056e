"""Device-resident vectorized environment core.

This is the TPU-native answer to the reference's vec-env layer: where the
reference fans envs out to Ray actors / envpool threads / GPU sims behind
IVecEnv.step (common/vecenv.py:181-366), environments here are pure JAX
functions living on the accelerator, `vmap`-batched over an env axis and
stepped *inside* the jitted rollout scan — zero host↔device traffic.

A `JaxEnv` defines single-environment pure dynamics:

    env_info() -> EnvInfo                       (static spaces)
    reset(key) -> (estate, obs)
    step(estate, action, key) -> (estate, obs, reward, terminated, info)

`JaxVecEnv` vmaps it, adds time-limit truncation and in-step autoreset
(done → the returned obs is the next episode's first obs, matching the
Isaac/Brax convention the reference trains against), and reports
`time_outs` for value bootstrap (a2c_common.py:813-814).
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from rl_games_tpu.envs.spaces import EnvInfo


class JaxEnv:
    """Single-environment pure dynamics. Subclasses are stateless."""

    max_episode_steps: Optional[int] = None
    has_action_masks: bool = False

    def env_info(self) -> EnvInfo:
        raise NotImplementedError

    def reset(self, key) -> Tuple[Any, Any]:
        raise NotImplementedError

    def step(self, estate, action, key):
        raise NotImplementedError

    def action_masks(self, estate):
        """Per-env valid-action mask [num_actions] (IVecEnv
        get_action_masks, common/ivecenv.py:24-26)."""
        raise NotImplementedError


@struct.dataclass
class VecEnvState:
    estate: Any  # batched per-env state pytree
    key: jax.Array
    steps: jnp.ndarray  # [N] int32 steps-in-episode


class JaxVecEnv:
    """Batched autoresetting wrapper around a JaxEnv.

    step(state, actions) -> (state, obs, rewards [N, value_size], dones [N],
    infos) — the reference 4-tuple contract (common/ivecenv.py:12-20) with
    infos = {'time_outs': [N] bool}; everything stays on device and is
    jit/scan-safe.
    """

    def __init__(self, env: JaxEnv, num_envs: int,
                 max_episode_steps: Optional[int] = None):
        self.env = env
        self.num_envs = num_envs
        self.max_episode_steps = (
            max_episode_steps
            if max_episode_steps is not None
            else env.max_episode_steps
        )

    def get_env_info(self) -> EnvInfo:
        return self.env.env_info()

    @property
    def has_action_masks(self) -> bool:
        return self.env.has_action_masks

    def get_action_masks(self, state: "VecEnvState"):
        """Batched valid-action masks [N, num_actions] (jit/scan-safe)."""
        return jax.vmap(self.env.action_masks)(state.estate)

    # -- IVecEnv parity surface (common/ivecenv.py:24-36) -------------------
    def get_env_state(self, state: "VecEnvState"):
        """Checkpointable env state (curricula). The device path stores the
        whole VecEnvState inside the TrainState, so checkpoints carry it
        automatically; this accessor exists for API parity."""
        return state

    def set_env_state(self, state, env_state):
        return env_state

    def set_train_info(self, frames, metrics):
        """Curriculum hook: on-device envs receive difficulty through their
        estate pytree instead; host envs may override."""

    def set_weights(self, indices, weights):
        """Self-play opponent update hook; env-specific envs override."""
        raise NotImplementedError(
            "this environment does not support self-play weight injection"
        )

    def reset(self, key) -> Tuple[VecEnvState, Any]:
        keys = jax.random.split(key, self.num_envs + 1)
        estate, obs = jax.vmap(self.env.reset)(keys[1:])
        state = VecEnvState(
            estate=estate,
            key=keys[0],
            steps=jnp.zeros(self.num_envs, jnp.int32),
        )
        return state, obs

    def _env_step(self, state: VecEnvState, actions, step_keys):
        """Vmapped env step; subclasses thread extra per-step inputs here
        (e.g. the self-play opponent's actions) without forking the
        autoreset/truncation/final-obs contract below."""
        return jax.vmap(self.env.step)(state.estate, actions, step_keys)

    def _next_state(self, state: VecEnvState, estate, key, steps):
        """Rebuild the vec-env state; subclasses carry extra fields."""
        return VecEnvState(estate=estate, key=key, steps=steps)

    def step(self, state: VecEnvState, actions):
        key, step_key, reset_key = jax.random.split(state.key, 3)
        step_keys = jax.random.split(step_key, self.num_envs)
        estate, obs, reward, terminated, info = self._env_step(
            state, actions, step_keys
        )
        steps = state.steps + 1
        terminated = terminated.astype(bool)
        if self.max_episode_steps is not None:
            truncated = steps >= self.max_episode_steps
        else:
            truncated = jnp.zeros_like(terminated)
        done = terminated | truncated
        time_outs = truncated & (~terminated)

        # in-step autoreset: where done, swap in a fresh episode
        reset_keys = jax.random.split(reset_key, self.num_envs)
        r_estate, r_obs = jax.vmap(self.env.reset)(reset_keys)

        def pick(new, old):
            d = done.reshape(done.shape + (1,) * (old.ndim - 1))
            return jnp.where(d, new, old)

        final_obs = obs  # the TRUE final observation, pre-autoreset
        estate = jax.tree.map(pick, r_estate, estate)
        obs = jax.tree.map(pick, r_obs, obs)
        steps = jnp.where(done, 0, steps)

        new_state = self._next_state(state, estate, key, steps)
        infos = dict(info or {})
        infos["time_outs"] = time_outs
        # same_step-style final-obs passthrough (the reference reads
        # infos['final_observation'] for replay writes, sac_agent.py:601-662)
        infos["final_observation"] = final_obs
        return new_state, obs, reward, done, infos
