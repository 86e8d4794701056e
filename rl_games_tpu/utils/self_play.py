"""Self-play manager.

Port of rl_games/algos_torch/self_play_manager.py:3-32: once the agent's
recent mean score (or reward) beats ``update_score`` over ``games_to_check``
episodes, push the current policy weights into a rotating subset of
opponent envs via ``vec_env.set_weights`` and clear episode stats.
"""

import numpy as np


class SelfPlayManager:
    def __init__(self, config: dict, writer=None):
        self.config = config
        self.writer = writer
        self.update_score = config["update_score"]
        self.games_to_check = config["games_to_check"]
        self.check_scores = config.get("check_scores", False)
        self.env_update_num = config.get("env_update_num", 1)
        self.env_indexes = np.arange(self.env_update_num)
        self.updates_num = 0

    def update(self, algo, state, metrics):
        """Returns (pushed, state): True when weights were pushed (stats
        should be cleared); device self-play envs carry the opponent
        weights in the train state's env_state, so the push returns an
        updated state."""
        self.updates_num += 1
        key = "mean_scores" if self.check_scores else "mean_rewards"
        games = int(metrics.get("games_played", 0))
        if games < self.games_to_check:
            return False, state
        value = metrics.get(key)
        if value is None:
            return False, state
        mean_score = float(np.asarray(value).reshape(-1)[0])
        if mean_score <= self.update_score:
            return False, state
        print(
            f"self-play: mean {key} {mean_score:.3f} > {self.update_score} "
            "— updating opponent weights"
        )
        if self.writer is not None:
            self.writer.add_scalar(
                "selfplay/iters_update_weigths",
                self.updates_num,
                int(metrics["frame"]),
            )
        weights = algo.get_weights(state)
        env_state = getattr(state, "env_state", None)
        try:
            new_es = algo.vec_env.set_weights(
                self.env_indexes, weights, env_state=env_state
            )
        except TypeError:
            # host-env protocol: the env owns the opponent (RayWorker
            # set_weights, common/vecenv.py:141-152)
            algo.vec_env.set_weights(self.env_indexes, weights)
            new_es = None
        if new_es is not None:
            state = state.replace(env_state=new_es)
        self.env_indexes = (self.env_indexes + 1) % algo.num_actors
        self.updates_num = 0
        return True, state
