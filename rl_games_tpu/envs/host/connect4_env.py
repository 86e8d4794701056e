"""Connect-Four self-play host environment (pettingzoo.classic).

The reference's ma/ppo_connect4_self_play*.yaml configs bind an out-of-tree
``connect4_env`` (the env module is absent from the reference repo — the
configs are dangling there); this adapter makes the family runnable: the
learner plays one seat of ``connect_four_v3``, the other seat is an embedded
opponent policy fed by SelfPlayManager through the RayWorker-style
``set_weights(indices, weights)`` surface (common/vecenv.py:141-152,
algos_torch/self_play_manager.py).

Semantics:
- single-agent view: obs = the current player's (6,7,2) board planes
  (pettingzoo gives own pieces in plane 0, so both seats share one network);
  ``get_action_masks()`` exposes the legal-column mask
  (use_action_masks: True in the configs);
- the learner's seat alternates every episode so value estimates see both
  first- and second-move positions;
- opponent moves: masked-categorical samples from the pushed policy
  (batched across envs, grouped by weight version); uniform-random over
  legal columns until the first push (env_config random_agent analog);
- same_step autoreset with infos['final_observation'], win=+1/loss=-1/draw=0
  rewards from the pettingzoo scoring.
"""

from typing import Optional

import numpy as np

from rl_games_tpu.envs.spaces import Box, Discrete, EnvInfo


class Connect4SelfPlayVecEnv:
    is_host_env = True
    autoreset_mode = "same_step"

    def __init__(self, num_actors: int, *, network_params: dict = None,
                 seed: Optional[int] = None, deterministic_opponent=False,
                 **_):
        from pettingzoo.classic import connect_four_v3

        self.num_envs = num_actors
        self.seed = seed
        self.deterministic_opponent = deterministic_opponent
        self.envs = [connect_four_v3.env() for _ in range(num_actors)]
        self.ep_count = np.zeros(num_actors, np.int64)
        self.learner_seat = [None] * num_actors  # 'player_0' / 'player_1'
        self._obs = np.zeros((num_actors, 6, 7, 2), np.float32)
        self._masks = np.ones((num_actors, 7), np.bool_)
        # opponent policy: per-env weight slot + version tag (0 = random)
        self._opp_weights = [None] * num_actors
        self._opp_version = np.zeros(num_actors, np.int64)
        self._next_version = 1
        self._model = None
        self._network_params = network_params
        self._forward = None
        self._rng = np.random.default_rng(seed)
        self._opp_key = None

    # -- model plumbing (opponent forward built from the same network
    # config the learner trains — the reference env loaded its config_path
    # the same way) ----------------------------------------------------
    def _ensure_model(self):
        if self._forward is not None:
            return
        import jax
        import jax.numpy as jnp

        from rl_games_tpu.models import model_builder

        if self._network_params is None:
            raise ValueError(
                "connect4 opponent needs env_config['network_params'] "
                "(the training config's params dict) to build its policy"
            )
        self._model = model_builder.ModelBuilder().load(
            self._network_params,
            actions_num=7,
            input_shape=(6, 7, 2),
            value_size=1,
            normalize_input=self._network_params["config"].get(
                "normalize_input", False
            ),
            normalize_value=False,
            obs_shape=(6, 7, 2),
        )
        model = self._model
        det = self.deterministic_opponent

        def fwd(params, norm, key, obs, masks):
            out = model.forward_play(
                params, norm, key, obs, seq_length=1,
                action_masks=masks, deterministic=det,
            )
            return out["actions"]

        self._forward = jax.jit(fwd)
        self._opp_key = jax.random.PRNGKey(
            0 if self.seed is None else self.seed
        )

    # -- per-env helpers ----------------------------------------------
    def _observe(self, i):
        env = self.envs[i]
        od = env.observe(self.learner_seat[i])
        self._obs[i] = np.asarray(od["observation"], np.float32)
        self._masks[i] = np.asarray(od["action_mask"], bool)

    def _opponent_of(self, i):
        return (
            "player_1" if self.learner_seat[i] == "player_0" else "player_0"
        )

    def _reset_one(self, i):
        env = self.envs[i]
        seed = (
            None if self.seed is None
            else int(self.seed + i + 1000003 * self.ep_count[i])
        )
        env.reset(seed=seed)
        self.learner_seat[i] = (
            "player_0" if self.ep_count[i] % 2 == 0 else "player_1"
        )
        self.ep_count[i] += 1
        if env.agent_selection != self.learner_seat[i]:
            # learner has the second move: opponent opens
            self._opponent_move([i])
        self._observe(i)

    def _random_action(self, mask):
        legal = np.nonzero(mask)[0]
        return int(self._rng.choice(legal))

    def _opponent_move(self, idxs):
        """Advance the opponent seat in every env in ``idxs`` (games must
        be live and waiting on the opponent). Batched per weight version."""
        by_version = {}
        for i in idxs:
            by_version.setdefault(int(self._opp_version[i]), []).append(i)
        for version, group in by_version.items():
            if version == 0:
                for i in group:
                    od = self.envs[i].observe(self._opponent_of(i))
                    act = self._random_action(
                        np.asarray(od["action_mask"], bool)
                    )
                    self.envs[i].step(act)
                continue
            import jax

            self._ensure_model()
            obs = np.stack([
                np.asarray(
                    self.envs[i].observe(self._opponent_of(i))["observation"],
                    np.float32,
                )
                for i in group
            ])
            masks = np.stack([
                np.asarray(
                    self.envs[i].observe(self._opponent_of(i))["action_mask"],
                    bool,
                )
                for i in group
            ])
            w = self._opp_weights[group[0]]
            self._opp_key, sub = jax.random.split(self._opp_key)
            acts = np.asarray(
                self._forward(w["params"], w["norm"], sub, obs, masks)
            )
            for i, a in zip(group, acts):
                self.envs[i].step(int(a))

    @staticmethod
    def _game_over(env):
        return not env.agents or all(env.terminations.values()) or all(
            env.truncations.values()
        )

    # -- vec-env surface ----------------------------------------------
    def get_env_info(self) -> EnvInfo:
        return EnvInfo(
            observation_space=Box(shape=(6, 7, 2), low=0.0, high=1.0),
            action_space=Discrete(n=7),
        )

    def get_action_masks(self):
        return self._masks.copy()

    def reset(self):
        for i in range(self.num_envs):
            self._reset_one(i)
        return self._obs.copy()

    def step(self, actions):
        actions = np.asarray(actions).reshape(-1)
        rewards = np.zeros(self.num_envs, np.float32)
        dones = np.zeros(self.num_envs, bool)
        final_obs = np.array(self._obs, copy=True)

        # 1) learner moves everywhere
        for i, env in enumerate(self.envs):
            env.step(int(actions[i]))
            if self._game_over(env):
                rewards[i] = float(
                    env.rewards.get(self.learner_seat[i], 0.0)
                )
                dones[i] = True

        # 2) opponent answers in live games (batched)
        live = [i for i in range(self.num_envs) if not dones[i]]
        if live:
            self._opponent_move(live)
            for i in live:
                env = self.envs[i]
                if self._game_over(env):
                    rewards[i] = float(
                        env.rewards.get(self.learner_seat[i], 0.0)
                    )
                    dones[i] = True

        # 3) observe / autoreset
        for i in range(self.num_envs):
            if dones[i]:
                od = self.envs[i].observe(self.learner_seat[i])
                final_obs[i] = np.asarray(od["observation"], np.float32)
                self._reset_one(i)
            else:
                self._observe(i)

        infos = {
            "time_outs": np.zeros(self.num_envs, bool),
            "scores": rewards.copy(),
        }
        if dones.any():
            infos["final_observation"] = final_obs
        return self._obs.copy(), rewards, dones, infos

    def set_weights(self, indices, weights):
        """SelfPlayManager push (RayWorker.set_weights analog): install the
        learner's current policy as the opponent for the given env
        indices."""
        import jax

        w = jax.device_get(
            {"params": weights["params"], "norm": weights["norm"]}
        )
        version = self._next_version
        self._next_version += 1
        for i in np.asarray(indices).reshape(-1):
            i = int(i) % self.num_envs
            self._opp_weights[i] = w
            self._opp_version[i] = version

    def close(self):
        for env in self.envs:
            env.close()
