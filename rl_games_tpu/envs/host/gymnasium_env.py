"""Host-side gymnasium vectorized environments.

Re-design of rl_games/common/gymnasium_vecenv.py: wraps
gymnasium.vector.{Sync,Async}VectorEnv behind the reference's 4-tuple vec-env
contract — step(actions) -> (obs, rewards, dones, infos) with
dones = terminated | truncated and infos['time_outs'] carrying truncation
(common/ivecenv.py:12-20) — plus space conversion into the framework's
lightweight space descriptions. Declares `autoreset_mode='next_step'`
(gymnasium 1.x vector default): the row following a done is the new
episode's reset row.

This is the non-jittable path: the trainer runs a host rollout loop against
it (the analog of the reference's Ray/envpool path) while GAE and the update
remain compiled.
"""

import os
from typing import Optional

import numpy as np

from rl_games_tpu.envs.spaces import Box, Discrete, DictSpace, EnvInfo, MultiDiscrete


def convert_space(space):
    import gymnasium as gym

    if isinstance(space, gym.spaces.Box):
        # keep per-dimension bounds when they are not uniform — collapsing
        # to scalars would mis-scale actions for envs with asymmetric or
        # per-dim action ranges (SAC action_scale/bias, PPO rescale)
        low, high = np.asarray(space.low), np.asarray(space.high)
        return Box(
            shape=tuple(space.shape),
            low=float(low.flat[0]) if np.all(low == low.flat[0])
            else low.astype(np.float32),
            high=float(high.flat[0]) if np.all(high == high.flat[0])
            else high.astype(np.float32),
        )
    if isinstance(space, gym.spaces.Discrete):
        return Discrete(n=int(space.n))
    if isinstance(space, gym.spaces.MultiDiscrete):
        return MultiDiscrete(nvec=tuple(int(n) for n in space.nvec))
    if isinstance(space, gym.spaces.Dict):
        return DictSpace.create(
            {k: convert_space(v) for k, v in space.spaces.items()}
        )
    raise ValueError(f"unsupported gymnasium space: {space}")


class _ThreadedSameStepVec:
    """In-process THREADED vectorization — the envpool role for arbitrary
    gymnasium envs (reference: envs/envpool.py:1-139 gets this from
    envpool's C++ thread pool; MuJoCo/classic-control cores release the
    GIL inside their C step, so a persistent thread pool parallelizes
    them without envpool's per-env process or IPC cost — measured 1.7x
    over SyncVectorEnv stepping Walker2d-v5 x64 on a 4-core host).

    Semantics are SAME_STEP autoreset exactly like the reference's
    RayWorker (common/vecenv.py:70-178): on done the worker thread
    resets in place, the returned row is the fresh episode's first obs,
    and the true final obs travels in infos['final_obs']. Speaks the
    slice of the gym.vector API the bridge consumes (single_*_space,
    reset(seed), 5-tuple step, .envs, close)."""

    def __init__(self, thunks, num_threads):
        from concurrent.futures import ThreadPoolExecutor

        self.envs = [t() for t in thunks]
        self.single_observation_space = self.envs[0].observation_space
        self.single_action_space = self.envs[0].action_space
        n = len(self.envs)
        k = max(1, min(int(num_threads), n))
        bounds = np.linspace(0, n, k + 1).astype(int)
        self._blocks = [
            range(bounds[i], bounds[i + 1])
            for i in range(k)
            if bounds[i] < bounds[i + 1]
        ]
        self._pool = ThreadPoolExecutor(len(self._blocks))

    def reset(self, seed=None):
        obs = [
            e.reset(seed=None if seed is None else seed + i)[0]
            for i, e in enumerate(self.envs)
        ]
        return self._stack(obs), {}

    @staticmethod
    def _stack(rows):
        if isinstance(rows[0], dict):
            return {
                k: _ThreadedSameStepVec._stack([r[k] for r in rows])
                for k in rows[0]
            }
        return np.stack(rows)

    def step(self, actions):
        n = len(self.envs)
        obs = [None] * n
        rewards = np.zeros(n, np.float64)
        terminated = np.zeros(n, bool)
        truncated = np.zeros(n, bool)
        final = [None] * n

        def run_block(idx):
            for i in idx:
                o, r, te, tr, _ = self.envs[i].step(actions[i])
                rewards[i] = r
                terminated[i] = te
                truncated[i] = tr
                if te or tr:
                    final[i] = o
                    o = self.envs[i].reset()[0]
                obs[i] = o

        # list() propagates worker exceptions
        list(self._pool.map(run_block, self._blocks))
        infos = {}
        if any(f is not None for f in final):
            fo = np.empty(n, object)
            for i, f in enumerate(final):
                fo[i] = f
            infos["final_obs"] = fo
        return self._stack(obs), rewards, terminated, truncated, infos

    def close(self):
        self._pool.shutdown(wait=False)
        for e in self.envs:
            e.close()


class GymnasiumVecEnv:
    """gymnasium_vecenv.py:100-258 equivalent (single-agent path).

    Default autoreset is SAME_STEP (reset-on-done): the reference's
    RayWorker resets inside the worker on done (common/vecenv.py:70-178),
    so the row following a done is always a fresh episode's first row and
    the PPO dataset never contains post-done garbage rows. The true final
    observation is surfaced per done row via infos['final_observation']
    (SAC replay writes bootstrap from it). Pass
    ``autoreset_mode='next_step'`` for envpool-style semantics (the SAC
    trainer handles both; the PPO host path requires same_step)."""

    is_host_env = True

    def __init__(self, env_id: str, num_actors: int, *, use_async: bool = False,
                 num_threads: int = 0,
                 seed: Optional[int] = None, wrappers=None,
                 autoreset_mode: str = "same_step", **env_kwargs):
        import gymnasium as gym

        self.num_envs = num_actors
        self.env_id = env_id
        self.autoreset_mode = autoreset_mode

        def make(i):
            def thunk():
                env = gym.make(env_id, **env_kwargs)
                for w in wrappers or []:
                    env = w(env)
                return env

            return thunk

        if num_threads and use_async:
            raise ValueError(
                "env_config: pick one of num_threads (in-process thread "
                "pool) or use_async (process-per-env) vectorization"
            )
        if num_threads:
            if autoreset_mode != "same_step":
                raise ValueError(
                    "num_threads vectorization implements same_step "
                    "(reset-on-done) autoreset only"
                )
            if num_threads < 0:  # -1 = auto: one thread per host core
                num_threads = os.cpu_count() or 1
            self.env = _ThreadedSameStepVec(
                [make(i) for i in range(num_actors)], num_threads
            )
        else:
            gym_mode = (
                gym.vector.AutoresetMode.SAME_STEP
                if autoreset_mode == "same_step"
                else gym.vector.AutoresetMode.NEXT_STEP
            )
            cls = (
                gym.vector.AsyncVectorEnv if use_async
                else gym.vector.SyncVectorEnv
            )
            self.env = cls(
                [make(i) for i in range(num_actors)], autoreset_mode=gym_mode
            )
        self.seed = seed
        self._action_is_discrete = isinstance(
            self.env.single_action_space, gym.spaces.Discrete
        )
        low = getattr(self.env.single_action_space, "low", None)
        high = getattr(self.env.single_action_space, "high", None)
        self._action_low = None if low is None else np.asarray(low, np.float32)
        self._action_high = None if high is None else np.asarray(high, np.float32)
        # episode limit from the registry spec (robust for Sync and Async)
        try:
            self.max_episode_steps = gym.spec(env_id).max_episode_steps
        except Exception:
            self.max_episode_steps = None

    def get_env_info(self) -> EnvInfo:
        return EnvInfo(
            observation_space=convert_space(self.env.single_observation_space),
            action_space=convert_space(self.env.single_action_space),
        )

    @staticmethod
    def _cast(obs):
        """Dict obs pass through per-key; uint8 image obs stay uint8 (the
        trainer casts on device, a2c_common.py:540-575), the rest float32."""
        if isinstance(obs, dict):
            return {k: GymnasiumVecEnv._cast(v) for k, v in obs.items()}
        a = np.asarray(obs)
        return a if a.dtype == np.uint8 else a.astype(np.float32)

    def reset(self):
        obs, _ = self.env.reset(seed=self.seed)
        return self._cast(obs)

    def step(self, actions):
        actions = np.asarray(actions)
        if self._action_is_discrete:
            actions = actions.astype(np.int64)
        elif self._action_low is not None:
            actions = np.clip(
                actions.astype(np.float32), self._action_low, self._action_high
            )
        obs, rewards, terminated, truncated, infos = self.env.step(actions)
        dones = np.logical_or(terminated, truncated)
        out_infos = {
            "time_outs": np.logical_and(truncated, ~terminated),
        }
        # final observation on done rows: in gymnasium 1.x NEXT_STEP
        # autoreset the returned obs at the done step IS the true final obs
        # (the reset happens on the following, to-be-skipped step); same_step
        # wrappers surface it via infos instead
        final = None
        for key in ("final_obs", "final_observation"):
            if key in infos:
                final = infos[key]
                break
        obs = self._cast(obs)
        if final is not None and not isinstance(obs, dict):
            final_obs = np.array(obs, copy=True)
            for i, f in enumerate(final):
                if f is not None:
                    final_obs[i] = f
            out_infos["final_observation"] = final_obs
        elif final is not None and isinstance(obs, dict):
            final_obs = {k: np.array(v, copy=True) for k, v in obs.items()}
            for i, f in enumerate(final):
                if f is not None:
                    for k in final_obs:
                        final_obs[k][i] = f[k]
            out_infos["final_observation"] = final_obs
        elif dones.any():
            out_infos["final_observation"] = obs
        return (
            obs,
            np.asarray(rewards, np.float32),
            dones,
            out_infos,
        )

    def supports_action_masks(self) -> bool:
        """Capability probe for the trainer's init-time use_action_masks
        check: masks need sync vectorization (async sub-envs live in other
        processes) and sub-envs that expose get_action_mask."""
        return hasattr(self.env, "envs") and all(
            hasattr(e.unwrapped, "get_action_mask") for e in self.env.envs
        )

    def get_action_masks(self):
        """RayWorker.get_action_mask analog (common/vecenv.py:132-139):
        collect per-env masks from sub-envs that expose get_action_mask
        (sync vectorization only)."""
        if not hasattr(self.env, "envs"):
            raise ValueError(
                "use_action_masks requires sync vectorization "
                "(env_config use_async: False): AsyncVectorEnv sub-envs "
                "are in other processes and unreachable for masks"
            )
        return np.stack(
            [e.unwrapped.get_action_mask() for e in self.env.envs]
        )

    def set_weights(self, indices, weights):
        """RayWorker.set_weights analog (common/vecenv.py:141-152): push
        opponent policy weights into the underlying envs for self-play.
        Sub-envs that don't implement ``set_weights`` are skipped."""
        import jax

        w = jax.device_get(weights)
        if hasattr(self.env, "envs"):
            # sync vectorization: selective per-index push, unwrapping the
            # gymnasium wrapper chain to the first set_weights provider
            for i in indices:
                target = self.env.envs[i]
                while target is not None and not hasattr(
                    target, "set_weights"
                ):
                    target = getattr(target, "env", None)
                if target is not None:
                    target.set_weights(w)
        else:
            # async (process-per-env) vectorization has no per-index call
            # surface: broadcast, mirroring the reference's common case of
            # pushing to every worker (vecenv.py:154-162)
            self.env.call("set_weights", w)

    def close(self):
        self.env.close()
