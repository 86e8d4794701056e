"""Multi-agent device-resident environments.

The reference's multi-agent path (SMAC / MultiWalker, envs/smac_env.py,
envs/multiwalker.py) presents N_envs x N_agents as one flattened batch of
num_actors * num_agents rows with a shared per-env done (a2c_common.py:
825-827: env_done_indices = all_done_indices[::num_agents]). Here a
MultiAgentJaxEnv defines per-env dynamics over an agents axis and
MultiAgentJaxVecEnv vmaps + flattens it into the same contract, fully
jit/scan-safe.
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from rl_games_tpu.envs.jax.base import JaxEnv, JaxVecEnv, VecEnvState
from rl_games_tpu.envs.spaces import Box, Discrete, EnvInfo


class MultiAgentJaxEnv(JaxEnv):
    """Per-env multi-agent dynamics: obs/actions/rewards carry a leading
    agents axis; done is per env (shared)."""

    num_agents: int = 1


class MultiAgentJaxVecEnv(JaxVecEnv):
    """Flattens [N, A, ...] → [N*A, ...] rows (agents-minor, matching the
    reference's batch layout)."""

    def __init__(self, env: MultiAgentJaxEnv, num_envs: int,
                 max_episode_steps: Optional[int] = None):
        super().__init__(env, num_envs, max_episode_steps)
        self.num_agents = env.num_agents

    def _flatten(self, x):
        return jax.tree.map(
            lambda v: v.reshape((self.num_envs * self.num_agents,) + v.shape[2:]),
            x,
        )

    def reset(self, key):
        state, obs = super().reset(key)
        return state, self._flatten(obs)

    def step(self, state: VecEnvState, actions):
        actions = jax.tree.map(
            lambda a: a.reshape((self.num_envs, self.num_agents) + a.shape[1:]),
            actions,
        )
        state, obs, rewards, done, infos = super().step(state, actions)
        obs = self._flatten(obs)
        rewards = rewards.reshape(self.num_envs * self.num_agents)
        done_rows = jnp.repeat(done, self.num_agents)
        infos = dict(infos)
        infos["time_outs"] = jnp.repeat(infos["time_outs"], self.num_agents)
        infos["final_observation"] = self._flatten(infos["final_observation"])
        return state, obs, rewards, done_rows, infos


# ---------------------------------------------------------------------------
# Cooperative test env (the MultiWalker/test-fixture role,
# envs/multiwalker.py:6-81): A point-mass agents on a line must meet at the
# centroid of their (per-episode random) targets; shared reward; the central
# state sees every agent's position+target.
# ---------------------------------------------------------------------------


@struct.dataclass
class GatherState:
    pos: jnp.ndarray  # [A]
    targets: jnp.ndarray  # [A]
    steps: jnp.ndarray


class CooperativeGather(MultiAgentJaxEnv):
    """Each agent sees only its own position and target; the shared reward
    is -mean(|pos - target|), so agents must act simultaneously."""

    num_agents = 3
    max_episode_steps = 64

    def env_info(self):
        a = self.num_agents
        return EnvInfo(
            observation_space=Box(shape=(2,)),
            action_space=Box(shape=(1,), low=-1.0, high=1.0),
            state_space=Box(shape=(2 * a,)),
            agents=a,
        )

    def _obs(self, s: GatherState):
        per_agent = jnp.stack([s.pos, s.targets], axis=-1)  # [A, 2]
        central = jnp.concatenate([s.pos, s.targets])  # [2A]
        return {
            "obs": per_agent,
            "states": jnp.broadcast_to(
                central, (self.num_agents,) + central.shape
            ),
        }

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        pos = jax.random.uniform(k1, (self.num_agents,), jnp.float32, -1.0, 1.0)
        targets = jax.random.uniform(
            k2, (self.num_agents,), jnp.float32, -1.0, 1.0
        )
        s = GatherState(pos=pos, targets=targets, steps=jnp.zeros((), jnp.int32))
        return s, self._obs(s)

    def step(self, estate: GatherState, action, key):
        # action [A, 1]
        pos = jnp.clip(estate.pos + 0.1 * action[:, 0], -2.0, 2.0)
        s = GatherState(pos=pos, targets=estate.targets, steps=estate.steps + 1)
        dist = jnp.abs(pos - estate.targets).mean()
        reward = jnp.broadcast_to(-dist, (self.num_agents,))
        reached = dist < 0.05
        return s, self._obs(s), reward, reached, {}
