"""Self-play device environment: competitive foraging with an embedded
opponent policy.

The reference closes the self-play loop through RayWorker.set_weights
(common/vecenv.py:141-152): the manager pushes the learner's weights into
worker processes that run the opponent. The TPU-native equivalent keeps the
opponent's parameters ON DEVICE as part of the vec-env state: per-env
parameter pytrees (stacked over the env axis) that the embedded policy
applies inside the jitted step, and that `set_weights(indices, ...)`
overwrites for a rotating subset of envs (SelfPlayManager,
algos_torch/self_play_manager.py).

Game: two players race to a food dot in a [-1,1]^2 arena. Both seats see
the same observation layout ([own_pos, other_pos, food], 6-dim) and move
continuously, so the learner's actor weights drop straight into the
opponent seat. Per-step reward is the zero-sum closeness differential plus
a terminal bonus for reaching the food first — against a fresh (random)
opponent the task is easy; every weight push makes the opponent forage as
well as the learner did, so the curve visibly re-arms.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from rl_games_tpu.envs.jax.base import JaxEnv, JaxVecEnv, VecEnvState
from rl_games_tpu.envs.spaces import Box, EnvInfo


@struct.dataclass
class ForageState:
    self_pos: jnp.ndarray  # [2]
    opp_pos: jnp.ndarray  # [2]
    food: jnp.ndarray  # [2]


@struct.dataclass
class SelfPlayVecEnvState:
    estate: Any
    key: jax.Array
    steps: jnp.ndarray
    opp_weights: Any = None  # per-env stacked {params, norm} pytree


STEP_SIZE = 0.12
CATCH_RADIUS = 0.15


class CompetitiveForage(JaxEnv):
    """Two-seat foraging race; the opponent seat runs an embedded policy."""

    max_episode_steps = 64
    OBS_DIM = 6

    def env_info(self):
        return EnvInfo(
            observation_space=Box(shape=(self.OBS_DIM,)),
            action_space=Box(shape=(2,), low=-1.0, high=1.0),
        )

    @staticmethod
    def obs_for(me, other, food):
        return jnp.concatenate([me, other - me, food - me])

    def reset(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        state = ForageState(
            self_pos=jax.random.uniform(k1, (2,), minval=-1.0, maxval=1.0),
            opp_pos=jax.random.uniform(k2, (2,), minval=-1.0, maxval=1.0),
            food=jax.random.uniform(k3, (2,), minval=-0.7, maxval=0.7),
        )
        return state, self.obs_for(state.self_pos, state.opp_pos, state.food)

    def step(self, estate: ForageState, action, key, opp_action):
        """Both seats move simultaneously; `opp_action` is computed by the
        vec wrapper from the embedded per-env opponent weights."""
        action = jnp.clip(action, -1.0, 1.0)
        opp_action = jnp.clip(opp_action, -1.0, 1.0)
        self_pos = jnp.clip(estate.self_pos + STEP_SIZE * action, -1.0, 1.0)
        opp_pos = jnp.clip(estate.opp_pos + STEP_SIZE * opp_action, -1.0, 1.0)
        d_self = jnp.linalg.norm(self_pos - estate.food)
        d_opp = jnp.linalg.norm(opp_pos - estate.food)
        self_reach = d_self < CATCH_RADIUS
        opp_reach = d_opp < CATCH_RADIUS
        reward = (
            0.1 * (d_opp - d_self)
            + jnp.where(self_reach, 1.0, 0.0)
            - jnp.where(opp_reach, 1.0, 0.0)
        )
        terminated = self_reach | opp_reach
        state = ForageState(self_pos=self_pos, opp_pos=opp_pos,
                            food=estate.food)
        obs = self.obs_for(self_pos, opp_pos, state.food)
        return state, obs, reward, terminated, {
            "scores": jnp.where(self_reach & ~opp_reach, 1.0, 0.0)
        }


class SelfPlayJaxVecEnv(JaxVecEnv):
    """JaxVecEnv whose step drives the opponent seat from per-env embedded
    weights carried in the vec-env state (the RayWorker.set_weights
    analog, common/vecenv.py:141-152)."""

    def __init__(self, env: CompetitiveForage, num_envs: int,
                 max_episode_steps: Optional[int] = None):
        super().__init__(env, num_envs, max_episode_steps)
        self._model = None

    # -- wiring --------------------------------------------------------------
    def bind_policy(self, model):
        """Late-bound by the agent once its model exists: the opponent seat
        applies the SAME architecture the learner trains."""
        self._model = model

    def init_opponent(self, env_state: VecEnvState, weights) -> "SelfPlayVecEnvState":
        """Install initial opponent weights (broadcast per env)."""
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(
                x[None], (self.num_envs,) + x.shape
            ).copy() if hasattr(x, "shape") else x,
            weights,
        )
        return SelfPlayVecEnvState(
            estate=env_state.estate,
            key=env_state.key,
            steps=env_state.steps,
            opp_weights=stacked,
        )

    def set_weights(self, indices, weights, env_state=None):
        """Push weights into the opponent slots of `indices` (self-play
        manager protocol). Returns the updated env state."""
        if env_state is None:
            raise ValueError(
                "device self-play env needs env_state= to push weights into"
            )
        idx = jnp.asarray(indices)
        new = jax.tree.map(
            lambda cur, w: cur.at[idx].set(w) if hasattr(cur, "at") else cur,
            env_state.opp_weights,
            weights,
        )
        return env_state.replace(opp_weights=new)

    # -- stepping ------------------------------------------------------------
    def _opp_actions(self, state: "SelfPlayVecEnvState"):
        assert self._model is not None, "bind_policy was never called"
        est = state.estate

        def one(weights, est_i):
            obs = CompetitiveForage.obs_for(
                est_i.opp_pos, est_i.self_pos, est_i.food
            )
            res = self._model.forward_play(
                weights["params"], weights["norm"], jax.random.PRNGKey(0),
                obs[None], deterministic=True,
            )
            return res["actions"][0]

        return jax.vmap(one)(state.opp_weights, est)

    def reset(self, key):
        state, obs = super().reset(key)
        return SelfPlayVecEnvState(
            estate=state.estate, key=state.key, steps=state.steps,
            opp_weights=None,
        ), obs

    # step() itself is inherited: only the vmapped env call (opponent
    # actions threaded in) and the state rebuild (opp_weights carried)
    # differ — the autoreset/truncation/final-obs contract lives once in
    # JaxVecEnv.step (base.py)
    def _env_step(self, state: "SelfPlayVecEnvState", actions, step_keys):
        opp_actions = self._opp_actions(state)
        return jax.vmap(self.env.step)(
            state.estate, actions, step_keys, opp_actions
        )

    def _next_state(self, state: "SelfPlayVecEnvState", estate, key, steps):
        return SelfPlayVecEnvState(
            estate=estate, key=key, steps=steps,
            opp_weights=state.opp_weights,
        )
