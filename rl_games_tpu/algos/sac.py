"""SAC on TPU: off-policy twin-critic training as one compiled program.

Re-design of rl_games/algos_torch/sac_agent.py (852 LoC host loop) into a
jitted epoch: `lax.scan` over `num_steps_per_episode` env steps, each step
writing its transition into a device-resident ring replay buffer and running
the UTD inner update loop (`num_updates_per_step` gradient steps) inline.

Functional parity pieces:
  * twin-critic TD target min(Q1',Q2') − α·logπ with value-bootstrap-at-
    truncation (update_critic, sac_agent.py:391-423; truncated rows store
    done=False with the TRUE final obs so the 1-step bootstrap is correct,
    :601-662)
  * delayed actor + learnable-α update every `policy_frequency` critic
    updates (:425-461, :490), α floored by min_alpha=0.01 (:216,439)
  * env-space log-prob change of variables (log π_env = log π_norm −
    Σ log action_scale, :381-389)
  * Polyak target update every step (:463-474)
  * warmup epochs with uniform random actions and no updates (:664-745)
  * obs normalizer fed exactly once per fresh frame, never from replays
    (:365-373, 714-716)
  * UTD ratio accounting (utd_ratio × num_actors, :34-44)
"""

import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from rl_games_tpu.algos.ppo import Meters, meters_init, meters_mean, meters_update
from rl_games_tpu.common.tr_helpers import build_reward_shaper
from rl_games_tpu.envs import registry as env_registry
from rl_games_tpu.envs.spaces import Box, obs_shape_of
from rl_games_tpu.models.sac import SACActor, SACDoubleCritic, build_sac_networks
from rl_games_tpu.ops.running_stats import (
    rms_init,
    rms_normalize,
    rms_update_from_batch,
)


# ---------------------------------------------------------------------------
# Device-resident ring replay buffer (VectorizedReplayBuffer,
# common/experience.py:207-323): vectorized batched add with wraparound,
# uniform sampling, truncated column.
# ---------------------------------------------------------------------------


@struct.dataclass
class ReplayBuffer:
    obses: jnp.ndarray
    next_obses: jnp.ndarray
    actions: jnp.ndarray
    rewards: jnp.ndarray  # [cap, 1]
    dones: jnp.ndarray  # [cap, 1] — hard terminations only
    truncated: jnp.ndarray  # [cap, 1]
    idx: jnp.ndarray  # () int32 write cursor
    full: jnp.ndarray  # () bool


def replay_init(capacity: int, obs_shape, action_dim: int) -> ReplayBuffer:
    return ReplayBuffer(
        obses=jnp.zeros((capacity,) + tuple(obs_shape), jnp.float32),
        next_obses=jnp.zeros((capacity,) + tuple(obs_shape), jnp.float32),
        actions=jnp.zeros((capacity, action_dim), jnp.float32),
        rewards=jnp.zeros((capacity, 1), jnp.float32),
        dones=jnp.zeros((capacity, 1), jnp.bool_),
        truncated=jnp.zeros((capacity, 1), jnp.bool_),
        idx=jnp.zeros((), jnp.int32),
        full=jnp.zeros((), jnp.bool_),
    )


def replay_add(buf: ReplayBuffer, obs, action, reward, next_obs, done,
               truncated, valid=None) -> ReplayBuffer:
    """Vectorized add with wraparound (experience.py:237-262).

    `valid` masks rows out of the write entirely (the next_step autoreset
    garbage-row skip, sac_agent.py:601-662): invalid rows neither consume a
    slot nor advance the cursor.
    """
    n = obs.shape[0]
    cap = buf.obses.shape[0]
    if valid is None:
        pos = (buf.idx + jnp.arange(n)) % cap
        n_written = jnp.asarray(n, jnp.int32)
    else:
        valid = valid.astype(jnp.int32)
        slot = jnp.cumsum(valid) - 1
        pos = (buf.idx + slot) % cap
        pos = jnp.where(valid.astype(bool), pos, cap)  # dropped via mode=drop
        n_written = valid.sum()
    return buf.replace(
        obses=buf.obses.at[pos].set(obs, mode="drop"),
        next_obses=buf.next_obses.at[pos].set(next_obs, mode="drop"),
        actions=buf.actions.at[pos].set(action, mode="drop"),
        rewards=buf.rewards.at[pos].set(reward.reshape(n, 1), mode="drop"),
        dones=buf.dones.at[pos].set(done.reshape(n, 1), mode="drop"),
        truncated=buf.truncated.at[pos].set(
            truncated.reshape(n, 1), mode="drop"
        ),
        idx=(buf.idx + n_written) % cap,
        full=buf.full | (buf.idx + n_written >= cap),
    )


def replay_size(buf: ReplayBuffer) -> jnp.ndarray:
    cap = buf.obses.shape[0]
    return jnp.where(buf.full, cap, buf.idx)


def replay_sample(buf: ReplayBuffer, key, batch_size: int):
    """Uniform sample (experience.py:264-296)."""
    size = jnp.maximum(replay_size(buf), 1)
    idx = jax.random.randint(key, (batch_size,), 0, size)
    return (
        buf.obses[idx],
        buf.actions[idx],
        buf.rewards[idx],
        buf.next_obses[idx],
        buf.dones[idx],
        buf.truncated[idx],
    )


_METRIC_KEYS = (
    "critic_loss", "critic1_loss", "critic2_loss", "actor_loss", "entropy",
    "alpha_loss", "actor_updated",
)


def _zero_metrics():
    return {k: jnp.zeros(()) for k in _METRIC_KEYS}


# ---------------------------------------------------------------------------
# Train state
# ---------------------------------------------------------------------------


@struct.dataclass
class SACTrainState:
    actor_params: Any
    critic_params: Any
    critic_target_params: Any
    log_alpha: jnp.ndarray
    actor_opt: Any
    critic_opt: Any
    alpha_opt: Any
    obs_rms: Any  # RunningMeanStdState | None
    replay: ReplayBuffer
    env_state: Any
    obs: Any
    rng: jax.Array
    epoch: jnp.ndarray
    frame: jnp.ndarray
    update_counter: jnp.ndarray
    current_rewards: jnp.ndarray
    current_lengths: jnp.ndarray
    game_rewards: Meters
    game_lengths: Meters


class SACAgent:
    """SAC trainer over device-resident envs (sac_agent.py:SACAgent)."""

    def __init__(self, base_name: str, params: dict, vec_env=None):
        self.base_name = base_name
        self.full_params = params
        config = params["config"]
        self.config = config

        self.num_actors = config["num_actors"]
        if vec_env is not None:
            self.vec_env = vec_env
        else:
            self.vec_env = env_registry.create_vec_env(
                config["env_name"], self.num_actors,
                vecenv_type=config.get("vecenv_type"),
                **config.get("env_config", {})
            )
        self.is_host_env = bool(getattr(self.vec_env, "is_host_env", False))
        info = self.vec_env.get_env_info()
        self.env_info = info
        space = info.action_space
        assert isinstance(space, Box), "SAC requires a continuous action space"
        self.action_dim = space.shape[0]
        self.obs_shape = obs_shape_of(info.observation_space)

        # --- config (sac_agent.py:20-120) ----------------------------------
        self.gamma = config.get("gamma", 0.99)
        self.critic_tau = float(config.get("critic_tau", 0.005))
        self.num_steps_per_episode = config.get("num_steps_per_episode", 1)
        utd_ratio = config.get("utd_ratio", None)
        if utd_ratio is not None:
            self.num_updates_per_step = max(1, round(utd_ratio * self.num_actors))
        else:
            self.num_updates_per_step = config.get("num_updates_per_step", 1)
        num_warmup_frames = config.get("num_warmup_frames", None)
        if num_warmup_frames is not None:
            frames_per_epoch = self.num_actors * self.num_steps_per_episode
            self.num_warmup_steps = int(
                np.ceil(num_warmup_frames / frames_per_epoch)
            )
        else:
            self.num_warmup_steps = config.get("num_warmup_steps", 1000)
        self.batch_size = config["batch_size"]
        self.init_alpha = float(config["init_alpha"])
        self.learnable_temperature = config["learnable_temperature"]
        self.replay_buffer_size = config["replay_buffer_size"]
        # UTD updates additionally wait for one full batch of real rows in
        # the ring: with the reference's sample-with-replacement semantics
        # (experience.py:264-296) an emptier buffer would be legal, but it
        # only ever arises on resume from a replay-stripped checkpoint,
        # where updating against a handful of fresh rows corrupts the critic
        self.replay_min_fill = min(self.batch_size, self.replay_buffer_size)
        # after a replay-STRIPPED resume the one-batch floor above is not
        # enough: resuming UTD updates against a few hundred fresh,
        # correlated rows corrupts the critic (observed live: a 5.3k-reward
        # Humanoid seed collapsed to ~1.1k after a mid-run resume). On such
        # resumes the gate is raised to 5% of the ring (configurable) so
        # the buffer re-fills with on-policy data from the restored actor
        # before updating resumes; frames keep counting, so the budget
        # stays honest. Fresh runs are unaffected (reference parity).
        self.replay_resume_min_fill = int(config.get(
            "replay_resume_min_fill",
            max(self.replay_min_fill, self.replay_buffer_size // 20),
        ))
        self._update_min_fill = self.replay_min_fill
        # full replay buffer in checkpoints is opt-in (the reference stores
        # it optionally, sac_agent.py:312-313; it is multi-GB for MuJoCo
        # obs dims and dominates checkpoint time when on)
        self.save_replay_buffer = config.get("replay_buffer_checkpoint", False)
        self.normalize_input = config.get("normalize_input", False)
        self.policy_frequency = config.get("policy_frequency", 2)
        self.critic_grad_clip = config.get("critic_grad_clip", 5.0)
        self.value_bootstrap = config.get("value_bootstrap", True)
        self.target_entropy = config.get("target_entropy_coef", 1.0) * (
            -self.action_dim
        )
        self.min_alpha = 0.01
        self.actor_lr = float(config["actor_lr"])
        self.critic_lr = float(config["critic_lr"])
        self.alpha_lr = float(config["alpha_lr"])
        self.max_epochs = config.get("max_epochs", -1)
        self.max_frames = max(config.get("max_frames", -1), config.get("max_steps", -1))
        if self.max_frames > 2**31 - 1:
            # in-state frame counter is int32 (x64 globally disabled)
            raise ValueError(
                f"max_frames {self.max_frames} exceeds the int32 frame "
                "counter (2^31-1 ≈ 2.1e9); split the run into resumed "
                "segments (the checkpoint carries epoch/frame meta)"
            )
        self.games_to_track = config.get("games_to_track", 100)
        self.save_freq = config.get("save_frequency", 0)
        self.save_best_after = config.get("save_best_after", 100)
        self.score_to_win = config.get("score_to_win", None)
        self.seed = config.get("seed", 7)
        self.rewards_shaper = build_reward_shaper(config)
        self.num_frames_per_epoch = self.num_actors * self.num_steps_per_episode

        # env action bounds (sac_agent.py:85-98)
        self.action_low = np.asarray(space.low, np.float32)
        self.action_high = np.asarray(space.high, np.float32)
        self.action_scale = (self.action_high - self.action_low) / 2.0
        self.action_bias = (self.action_high + self.action_low) / 2.0
        self.log_action_scale_sum = float(
            np.log(np.maximum(self.action_scale, 1e-8)).sum()
        )

        # --- networks ------------------------------------------------------
        self.actor, self.critic = build_sac_networks(
            params["network"], self.action_dim
        )

        # --- optimizers ----------------------------------------------------
        self.actor_tx = optax.adam(self.actor_lr, eps=1e-8)
        critic_chain = []
        if self.critic_grad_clip > 0:
            critic_chain.append(optax.clip_by_global_norm(self.critic_grad_clip))
        critic_chain.append(optax.adam(self.critic_lr, eps=1e-8))
        self.critic_tx = optax.chain(*critic_chain)
        self.alpha_tx = optax.adam(self.alpha_lr, eps=1e-8)

    # ------------------------------------------------------------------
    def init_state(self, seed: Optional[int] = None) -> SACTrainState:
        seed = self.seed if seed is None else seed
        rng = jax.random.PRNGKey(seed)
        rng, env_key, a_key, c_key = jax.random.split(rng, 4)
        if self.is_host_env:
            env_state = None
            obs = jax.tree.map(jnp.asarray, self.vec_env.reset())
        else:
            env_state, obs = self.vec_env.reset(env_key)
        example = obs["obs"] if isinstance(obs, dict) else obs
        actor_params = self.actor.init(a_key, example)
        dummy_action = jnp.zeros((example.shape[0], self.action_dim))
        critic_params = self.critic.init(c_key, example, dummy_action)
        critic_target_params = jax.tree.map(jnp.copy, critic_params)
        obs_rms = rms_init(self.obs_shape) if self.normalize_input else None
        state = SACTrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            critic_target_params=critic_target_params,
            log_alpha=jnp.asarray(np.log(self.init_alpha), jnp.float32),
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            alpha_opt=self.alpha_tx.init(jnp.zeros((), jnp.float32)),
            obs_rms=obs_rms,
            replay=replay_init(
                self.replay_buffer_size, self.obs_shape, self.action_dim
            ),
            env_state=env_state,
            obs=obs,
            rng=rng,
            epoch=jnp.zeros((), jnp.int32),
            frame=jnp.zeros((), jnp.int32),
            update_counter=jnp.zeros((), jnp.int32),
            current_rewards=jnp.zeros((self.num_actors, 1), jnp.float32),
            current_lengths=jnp.zeros(self.num_actors, jnp.float32),
            game_rewards=meters_init(self.games_to_track, 1),
            game_lengths=meters_init(self.games_to_track, 1),
        )
        return jax.tree.map(lambda x: jnp.array(x, copy=True), state)

    # ------------------------------------------------------------------
    def _preproc_obs(self, obs_rms, obs):
        if obs_rms is None:
            return obs
        return rms_normalize(obs_rms, obs)

    def _actor_obs(self, obs):
        return obs["obs"] if isinstance(obs, dict) else obs

    def _rescale(self, actions):
        """[-1,1] → env bounds, clamped (sac_agent.py:375-379)."""
        a = actions * self.action_scale + self.action_bias
        return jnp.clip(a, self.action_low, self.action_high)

    def _env_log_prob(self, logp_norm):
        """sac_agent.py:381-389."""
        return logp_norm - self.log_action_scale_sum

    # -- updates -----------------------------------------------------------
    def _alpha(self, log_alpha):
        return jnp.exp(log_alpha)

    def _update_critic(self, state: SACTrainState, key, obs, action, reward,
                       next_obs, not_done):
        obs_n = self._preproc_obs(state.obs_rms, obs)
        next_obs_n = self._preproc_obs(state.obs_rms, next_obs)

        mu, std = self.actor.apply(state.actor_params, next_obs_n)
        next_action, pre = SACActor.sample(key, mu, std)
        log_prob = self._env_log_prob(
            SACActor.log_prob(next_action, mu, std, pre)
        )[:, None]
        next_action_rescaled = self._rescale(next_action)
        tq1, tq2 = self.critic.apply(
            state.critic_target_params, next_obs_n, next_action_rescaled
        )
        alpha = self._alpha(state.log_alpha)
        target_v = jnp.minimum(tq1, tq2) - alpha * log_prob
        target_q = reward + not_done * self.gamma * target_v
        target_q = jax.lax.stop_gradient(target_q)

        def loss_fn(cp):
            q1, q2 = self.critic.apply(cp, obs_n, action)
            c1 = jnp.square(q1 - target_q).mean()
            c2 = jnp.square(q2 - target_q).mean()
            return 0.5 * (c1 + c2), (c1, c2)

        (c_loss, (c1, c2)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.critic_params
        )
        updates, critic_opt = self.critic_tx.update(
            grads, state.critic_opt, state.critic_params
        )
        critic_params = optax.apply_updates(state.critic_params, updates)
        state = state.replace(critic_params=critic_params, critic_opt=critic_opt)
        return state, (c_loss, c1, c2)

    def _update_actor_and_alpha(self, state: SACTrainState, key, obs):
        obs_n = self._preproc_obs(state.obs_rms, obs)
        alpha_now = self._alpha(state.log_alpha)

        def actor_loss_fn(ap):
            mu, std = self.actor.apply(ap, obs_n)
            action, pre = SACActor.sample(key, mu, std)
            log_prob = self._env_log_prob(
                SACActor.log_prob(action, mu, std, pre)
            )[:, None]
            q1, q2 = self.critic.apply(
                state.critic_params, obs_n, self._rescale(action)
            )
            q = jnp.minimum(q1, q2)
            a_loss = (
                jnp.maximum(alpha_now, self.min_alpha) * log_prob - q
            ).mean()
            return a_loss, log_prob

        (a_loss, log_prob), a_grads = jax.value_and_grad(
            actor_loss_fn, has_aux=True
        )(state.actor_params)
        updates, actor_opt = self.actor_tx.update(
            a_grads, state.actor_opt, state.actor_params
        )
        actor_params = optax.apply_updates(state.actor_params, updates)
        entropy = -log_prob.mean()

        log_alpha, alpha_opt = state.log_alpha, state.alpha_opt
        alpha_loss = jnp.zeros(())
        if self.learnable_temperature:
            target_term = jax.lax.stop_gradient(
                -log_prob - self.target_entropy
            )

            def alpha_loss_fn(la):
                return (jnp.exp(la) * target_term).mean()

            alpha_loss, al_grad = jax.value_and_grad(alpha_loss_fn)(log_alpha)
            al_updates, alpha_opt = self.alpha_tx.update(al_grad, alpha_opt)
            log_alpha = optax.apply_updates(log_alpha, al_updates)

        state = state.replace(
            actor_params=actor_params,
            actor_opt=actor_opt,
            log_alpha=log_alpha,
            alpha_opt=alpha_opt,
        )
        return state, (a_loss, entropy, alpha_loss)

    def _soft_update(self, state: SACTrainState) -> SACTrainState:
        """Polyak lerp (sac_agent.py:463-474)."""
        tau = self.critic_tau
        new_target = jax.tree.map(
            lambda t, s: t + tau * (s - t),
            state.critic_target_params,
            state.critic_params,
        )
        return state.replace(critic_target_params=new_target)

    def _update(self, state: SACTrainState, key):
        """One gradient update (sac_agent.py:476-499)."""
        k_sample, k_critic, k_actor = jax.random.split(key, 3)
        obs, action, reward, next_obs, done, _trunc = replay_sample(
            state.replay, k_sample, self.batch_size
        )
        not_done = 1.0 - done.astype(jnp.float32)
        state, (c_loss, c1, c2) = self._update_critic(
            state, k_critic, obs, action, reward, next_obs, not_done
        )
        state = state.replace(update_counter=state.update_counter + 1)

        do_actor = (state.update_counter % self.policy_frequency) == 0

        def with_actor(s):
            s, (a_loss, entropy, alpha_loss) = self._update_actor_and_alpha(
                s, k_actor, obs
            )
            return s, (a_loss, entropy, alpha_loss)

        def without_actor(s):
            return s, (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))

        state, (a_loss, entropy, alpha_loss) = jax.lax.cond(
            do_actor, with_actor, without_actor, state
        )
        state = self._soft_update(state)
        metrics = {
            "critic_loss": c_loss,
            "critic1_loss": c1,
            "critic2_loss": c2,
            "actor_loss": a_loss,
            "entropy": entropy,
            "alpha_loss": alpha_loss,
            "actor_updated": do_actor.astype(jnp.float32),
        }
        return state, metrics

    # -- epoch -------------------------------------------------------------
    def train_epoch(self, state: SACTrainState):
        """play_steps (sac_agent.py:664-745): env steps + inline UTD updates."""
        warmup = state.epoch < self.num_warmup_steps

        def env_step(state: SACTrainState):
            rng, a_key, u_key = jax.random.split(state.rng, 3)
            obs_vec = self._actor_obs(state.obs)
            obs_n = self._preproc_obs(state.obs_rms, obs_vec)
            mu, std = self.actor.apply(state.actor_params, obs_n)
            sampled, _ = SACActor.sample(a_key, mu, std)
            random_actions = jax.random.uniform(
                u_key, sampled.shape, jnp.float32, -1.0, 1.0
            )
            norm_actions = jnp.where(warmup, random_actions, sampled)
            env_actions = self._rescale(norm_actions)

            env_state, next_obs, rewards, dones, infos = self.vec_env.step(
                state.env_state, env_actions
            )
            rewards = rewards.reshape(self.num_actors).astype(jnp.float32)
            shaped = self.rewards_shaper(rewards)
            time_outs = infos["time_outs"]
            final_obs_vec = self._actor_obs(infos["final_observation"])
            next_obs_vec = self._actor_obs(next_obs)

            # replay write (sac_agent.py:601-662): next_obs = TRUE final obs;
            # truncation stores done=False so the TD target bootstraps
            if self.value_bootstrap:
                hard_done = dones & (~time_outs)
            else:
                hard_done = dones
            replay = replay_add(
                state.replay, obs_vec, env_actions, shaped, final_obs_vec,
                hard_done, time_outs,
            )

            # normalizer sees each fresh frame exactly once (:714-716)
            obs_rms = state.obs_rms
            if self.normalize_input:
                obs_rms = rms_update_from_batch(obs_rms, next_obs_vec)

            # episode accounting
            cur_r = state.current_rewards + rewards[:, None]
            cur_len = state.current_lengths + 1.0
            done_mask = dones.astype(bool)
            m_r = meters_update(state.game_rewards, cur_r, done_mask)
            m_len = meters_update(
                state.game_lengths, cur_len[:, None], done_mask
            )
            nd = 1.0 - dones.astype(jnp.float32)
            state = state.replace(
                env_state=env_state,
                obs=next_obs,
                rng=rng,
                replay=replay,
                obs_rms=obs_rms,
                frame=state.frame + self.num_actors,
                current_rewards=cur_r * nd[:, None],
                current_lengths=cur_len * nd,
                game_rewards=m_r,
                game_lengths=m_len,
            )
            return state

        def step(carry, _):
            state, sums, n_updates = carry
            state = env_step(state)

            def do_updates(state):
                def one_update(s, _):
                    rng, k = jax.random.split(s.rng)
                    s = s.replace(rng=rng)
                    s, m = self._update(s, k)
                    return s, m

                state, ms = jax.lax.scan(
                    one_update, state, None,
                    length=self.num_updates_per_step,
                )
                return (
                    state,
                    jax.tree.map(lambda x: jnp.sum(x, axis=0), ms),
                    jnp.asarray(self.num_updates_per_step, jnp.float32),
                )

            def no_updates(state):
                return state, _zero_metrics(), jnp.zeros(())

            can_update = (~warmup) & (
                replay_size(state.replay) >= self._update_min_fill
            )
            state, step_sums, step_n = jax.lax.cond(
                can_update, do_updates, no_updates, state
            )
            sums = jax.tree.map(jnp.add, sums, step_sums)
            return (state, sums, n_updates + step_n), None

        (state, sums, n_updates), _ = jax.lax.scan(
            step, (state, _zero_metrics(), jnp.zeros(())), None,
            length=self.num_steps_per_episode,
        )
        state = state.replace(epoch=state.epoch + 1)

        # epoch-MEAN losses, like the reference's per-epoch averaging over
        # all updates (sac_agent.py:673-745, 789-790); actor-side losses
        # average over the updates where the delayed actor actually ran
        n_any = jnp.maximum(n_updates, 1.0)
        n_actor = jnp.maximum(sums["actor_updated"], 1.0)
        metrics = {
            k: sums[k] / (n_actor if k in ("actor_loss", "entropy",
                                           "alpha_loss") else n_any)
            for k in _METRIC_KEYS if k != "actor_updated"
        }
        metrics["actor_updated"] = sums["actor_updated"]

        out = dict(metrics)
        out["alpha"] = self._alpha(state.log_alpha)
        out["mean_rewards"] = meters_mean(state.game_rewards)
        out["mean_lengths"] = meters_mean(state.game_lengths)[0]
        out["games_played"] = state.game_rewards.count
        out["frame"] = state.frame
        out["epoch"] = state.epoch
        out["replay_size"] = replay_size(state.replay)
        return state, out

    def make_train_fn(self, mesh=None, donate: bool = True):
        if self.is_host_env:
            if mesh is not None:
                import warnings

                warnings.warn(
                    "make_train_fn(mesh=...) with a host-stepped env: the "
                    "mesh is ignored — host envs run the single-process "
                    "split-placement path. Shard across processes with "
                    "jax.distributed + one env pool per process instead.",
                    UserWarning,
                    stacklevel=2,
                )
            return self.host_train_epoch
        donate_args = (0,) if donate else ()
        if mesh is None:
            # fresh lambda: avoid jax's bound-method trace cache serving
            # stale baked-in constants after set_param mutations
            return jax.jit(
                lambda s: self.train_epoch(s), donate_argnums=donate_args
            )

        # SPMD SAC over the mesh — beyond the reference, whose SAC is
        # single-GPU (sac_agent.py has no DDP path): env batch AND replay
        # capacity shard over 'data', params replicate; the logical
        # program (global-uniform sampling, batched writes) is unchanged,
        # so 1-chip == N-chip by construction (tests/test_sac.py)
        from rl_games_tpu.parallel.mesh import sac_state_shardings

        cache = {}

        def wrapper(state):
            if "fn" not in cache:
                shardings = sac_state_shardings(state, mesh)
                cache["fn"] = jax.jit(
                    lambda s: self.train_epoch(s),
                    in_shardings=(shardings,),
                    out_shardings=(shardings, None),
                    donate_argnums=donate_args,
                )
                state = jax.device_put(state, shardings)
            return cache["fn"](state)

        return wrapper

    # ------------------------------------------------------------------
    # host-env path (the reference's envpool/gymnasium SAC loop: env steps
    # on the host, acting + replay ingest + UTD updates compiled)
    # ------------------------------------------------------------------
    def _make_host_fns(self):
        def act(actor_params, obs_rms, key, obs, warmup):
            obs_n = self._preproc_obs(obs_rms, obs)
            mu, std = self.actor.apply(actor_params, obs_n)
            k1, k2 = jax.random.split(key)
            sampled, _ = SACActor.sample(k1, mu, std)
            random_actions = jax.random.uniform(
                k2, sampled.shape, jnp.float32, -1.0, 1.0
            )
            norm_actions = jnp.where(warmup, random_actions, sampled)
            return self._rescale(norm_actions)

        def ingest_and_update(state, obs_vec, env_actions, shaped, final_obs,
                              hard_done, time_outs, next_obs_vec, rewards,
                              dones, valid):
            replay = replay_add(
                state.replay, obs_vec, env_actions, shaped, final_obs,
                hard_done, time_outs, valid=valid,
            )
            obs_rms = state.obs_rms
            if self.normalize_input:
                obs_rms = rms_update_from_batch(obs_rms, next_obs_vec)
            cur_r = state.current_rewards + rewards[:, None]
            cur_len = state.current_lengths + 1.0
            done_mask = dones.astype(bool)
            m_r = meters_update(state.game_rewards, cur_r, done_mask)
            m_len = meters_update(
                state.game_lengths, cur_len[:, None], done_mask
            )
            nd = 1.0 - dones.astype(jnp.float32)
            state = state.replace(
                replay=replay, obs_rms=obs_rms,
                frame=state.frame + self.num_actors,
                current_rewards=cur_r * nd[:, None],
                current_lengths=cur_len * nd,
                game_rewards=m_r, game_lengths=m_len,
            )

            warmup = state.epoch < self.num_warmup_steps

            def do_updates(state):
                def one_update(s, _):
                    rng, k = jax.random.split(s.rng)
                    s = s.replace(rng=rng)
                    s, m = self._update(s, k)
                    return s, m

                state, ms = jax.lax.scan(
                    one_update, state, None,
                    length=self.num_updates_per_step,
                )
                return (
                    state,
                    jax.tree.map(lambda x: jnp.sum(x, axis=0), ms),
                    jnp.asarray(self.num_updates_per_step, jnp.float32),
                )

            can_update = (~warmup) & (
                replay_size(state.replay) >= self._update_min_fill
            )
            state, step_sums, step_n = jax.lax.cond(
                can_update, do_updates,
                lambda s: (s, _zero_metrics(), jnp.zeros(())), state,
            )
            return state, (step_sums, step_n)

        def ingest_update_act(state, obs_vec, env_actions, shaped, final_obs,
                              hard_done, time_outs, next_obs_vec, rewards,
                              dones, valid, warmup):
            """ONE dispatch per env step: ingest the PREVIOUS transition,
            run the UTD updates, then act on the current obs with the
            updated params. Under a remote relay each dispatch costs a
            ~30 ms round trip, so the act/ingest split of the naive loop
            dominated wall time; the fusion preserves the reference's
            ordering exactly (updates from transition t-1 always happened
            before acting at t, sac_agent.py:664-745)."""
            state, sums_n = ingest_and_update(
                state, obs_vec, env_actions, shaped, final_obs, hard_done,
                time_outs, next_obs_vec, rewards, dones, valid,
            )
            rng, akey = jax.random.split(state.rng)
            state = state.replace(rng=rng, obs=next_obs_vec)
            actions = act(
                state.actor_params, state.obs_rms, akey,
                self._actor_obs(next_obs_vec), warmup,
            )
            return state, sums_n, actions

        def first_act(state, warmup):
            rng, akey = jax.random.split(state.rng)
            state = state.replace(rng=rng)
            actions = act(
                state.actor_params, state.obs_rms, akey,
                self._actor_obs(state.obs), warmup,
            )
            return state, actions

        # no donation: the pending transition's obs_vec aliases the previous
        # state.obs buffer, so donating state could invalidate it
        return jax.jit(ingest_update_act), jax.jit(first_act)

    def host_train_epoch(self, state: SACTrainState):
        if not hasattr(self, "_host_fns"):
            self._host_fns = self._make_host_fns()
        if not hasattr(self, "_pending"):
            # NOT reset when _host_fns is invalidated (set_param): the
            # pending transition must survive a re-jit or it is silently
            # dropped from replay
            self._pending = None
        ingest_update_act, first_act = self._host_fns

        # epoch-mean accumulation across the env-step loop (the reference
        # averages every update's losses over the epoch,
        # sac_agent.py:673-745)
        epoch_sums = _zero_metrics()
        epoch_n = jnp.zeros(())
        warmup = jnp.asarray(int(state.epoch) < self.num_warmup_steps)
        autoreset_mode = getattr(self.vec_env, "autoreset_mode", "same_step")
        if not hasattr(self, "_host_prev_dones"):
            self._host_prev_dones = np.zeros(self.num_actors, bool)
        for _ in range(self.num_steps_per_episode):
            if self._pending is None:
                state, env_actions = first_act(state, warmup)
            else:
                state, (step_sums, step_n), env_actions = ingest_update_act(
                    state, *self._pending, warmup
                )
                epoch_sums = jax.tree.map(jnp.add, epoch_sums, step_sums)
                epoch_n = epoch_n + step_n
            next_obs, rewards, dones, infos = self.vec_env.step(
                np.asarray(env_actions)
            )
            obs_vec = self._actor_obs(state.obs)
            rewards = jnp.asarray(rewards, jnp.float32).reshape(self.num_actors)
            shaped = self.rewards_shaper(rewards)
            dones_j = jnp.asarray(dones)
            time_outs = jnp.asarray(infos.get("time_outs", np.zeros_like(dones)))
            final_obs = jnp.asarray(
                infos.get("final_observation", next_obs), jnp.float32
            )
            next_obs_j = jnp.asarray(next_obs, jnp.float32)
            if self.value_bootstrap:
                hard_done = dones_j & (~time_outs)
            else:
                hard_done = dones_j
            # next_step autoreset: the row FOLLOWING a done is the reset
            # garbage row — skip its replay write (sac_agent.py:601-662)
            if autoreset_mode == "next_step":
                valid = jnp.asarray(~self._host_prev_dones)
                self._host_prev_dones = np.asarray(dones)
            else:
                valid = jnp.ones(self.num_actors, bool)
            self._pending = (
                obs_vec, env_actions, shaped, final_obs, hard_done,
                time_outs, next_obs_j, rewards, dones_j, valid,
            )

        state = state.replace(epoch=state.epoch + 1)
        if float(epoch_n) > 0:
            n_actor = jnp.maximum(epoch_sums["actor_updated"], 1.0)
            metrics = {
                k: epoch_sums[k] / (
                    n_actor if k in ("actor_loss", "entropy", "alpha_loss")
                    else epoch_n
                )
                for k in _METRIC_KEYS if k != "actor_updated"
            }
            metrics["actor_updated"] = epoch_sums["actor_updated"]
            self._last_host_metrics = metrics
        else:
            # warmup / first epoch: no updates ran — keep the previous
            # epoch's means for off-cadence logging
            metrics = self._last_host_metrics = getattr(
                self, "_last_host_metrics", _zero_metrics()
            )
        out = dict(metrics)
        out["alpha"] = self._alpha(state.log_alpha)
        out["mean_rewards"] = meters_mean(state.game_rewards)
        out["mean_lengths"] = meters_mean(state.game_lengths)[0]
        out["games_played"] = state.game_rewards.count
        out["frame"] = state.frame
        out["epoch"] = state.epoch
        out["replay_size"] = replay_size(state.replay)
        return state, out

    def get_weights(self, state: SACTrainState):
        return {
            "actor_params": state.actor_params,
            "critic_params": state.critic_params,
            "obs_rms": state.obs_rms,
        }

    def get_full_state_weights(self, state: SACTrainState,
                               last_mean_rewards: float = -100500.0) -> dict:
        """sac_agent.py:295-315 analog (replay optional via
        replay_buffer_checkpoint)."""
        return {
            "state": self._ckpt_state(state),
            "weights": self.get_weights(state),
            "epoch": int(state.epoch),
            "frame": int(state.frame),
            "last_mean_rewards": last_mean_rewards,
        }

    def set_full_state_weights(self, state: SACTrainState, full: dict,
                               set_epoch: bool = True) -> SACTrainState:
        new = full["state"]
        if new.replay.obses.shape[0] != state.replay.obses.shape[0]:
            new = new.replace(replay=state.replay)
        if not set_epoch:
            new = new.replace(epoch=state.epoch, frame=state.frame)
        return new

    def set_weights(self, state: SACTrainState, weights) -> SACTrainState:
        return state.replace(
            actor_params=weights["actor_params"],
            critic_params=weights["critic_params"],
            obs_rms=weights["obs_rms"],
        )

    # get_param / set_param (BaseAlgorithm, interfaces/base_algorithm.py:
    # 5-49). gamma/critic_tau are baked into the compiled epoch: mutation
    # marks the program stale and the jitted fns are rebuilt lazily.
    _STATIC_PARAMS = ("gamma", "critic_tau")

    def get_param(self, param_name: str, state=None):
        if param_name in self._STATIC_PARAMS:
            return getattr(self, param_name)
        if param_name == "tau":
            return self.critic_tau
        raise NotImplementedError(f"Can't get param {param_name}")

    def set_param(self, param_name: str, value, state=None):
        if param_name == "tau":
            param_name = "critic_tau"
        if param_name in self._STATIC_PARAMS:
            setattr(self, param_name, float(value))
            if hasattr(self, "_host_fns"):
                del self._host_fns
            self._program_stale = True
            return state
        raise NotImplementedError(f"No param found for {param_name}")

    def reset_optimizer(self, state: SACTrainState) -> SACTrainState:
        return state.replace(
            actor_opt=self.actor_tx.init(state.actor_params),
            critic_opt=self.critic_tx.init(state.critic_params),
            alpha_opt=self.alpha_tx.init(
                jnp.zeros((), jnp.float32)
            ),
        )

    def _ckpt_state(self, state: SACTrainState) -> SACTrainState:
        """State as checkpointed: replay stripped to a 1-slot stub unless
        `replay_buffer_checkpoint` is on."""
        if self.save_replay_buffer:
            return state
        return state.replace(
            replay=replay_init(1, self.obs_shape, self.action_dim)
        )

    def _restore(self, checkpoint: str, state: SACTrainState):
        from rl_games_tpu.utils import checkpoint as ckpt

        payload = ckpt.read_payload(checkpoint)
        meta = payload.get("meta", {})
        if meta.get("has_replay", True):
            return ckpt.load_checkpoint(checkpoint, state, payload=payload)
        # replay was stripped at save time: restore everything else and
        # keep the fresh (empty) buffer — and raise the update gate to
        # replay_resume_min_fill so UTD updates stay paused until the ring
        # re-fills with enough on-policy rows from the restored actor
        # (updating after one batch corrupts the critic; see __init__)
        self._update_min_fill = min(
            self.replay_resume_min_fill, self.replay_buffer_size
        )
        stripped = state.replace(
            replay=replay_init(1, self.obs_shape, self.action_dim)
        )
        loaded, meta = ckpt.load_checkpoint(checkpoint, stripped,
                                            payload=payload)
        return loaded.replace(replay=state.replay), meta

    # ------------------------------------------------------------------
    # host train loop (sac_agent.py:753-852)
    # ------------------------------------------------------------------
    def train(self, mesh=None, checkpoint=None, stop_fn=None, writer=None,
              max_epochs=None):
        from rl_games_tpu.utils import checkpoint as ckpt
        from rl_games_tpu.utils.writer import create_writer

        config = self.config
        experiment_name = config.get("name", self.base_name)
        train_dir = config.get("train_dir", "runs")
        nn_dir = os.path.join(train_dir, experiment_name, "nn")
        summaries_dir = os.path.join(train_dir, experiment_name, "summaries")
        os.makedirs(nn_dir, exist_ok=True)

        state = self.init_state()
        last_mean_rewards = -100500.0
        if checkpoint:
            if checkpoint.endswith((".pth", ".pt")):
                # reference torch SAC checkpoint: import weights +
                # normalizer as a warm start (utils/torch_import)
                from rl_games_tpu.utils import torch_import as ti

                raw = ti.load_torch_checkpoint_raw(checkpoint)
                if "model" in raw and "actor" not in raw:
                    raw = raw["model"]
                a, c, t, rms = ti.convert_sac_weights(
                    raw, state.actor_params, state.critic_params,
                    state.critic_target_params, state.obs_rms,
                )
                state = state.replace(
                    actor_params=a, critic_params=c,
                    critic_target_params=(
                        t if t is not None else state.critic_target_params
                    ),
                    obs_rms=rms,
                )
                if raw.get("log_alpha") is not None:
                    state = state.replace(
                        log_alpha=jnp.asarray(
                            np.asarray(raw["log_alpha"]), jnp.float32
                        ).reshape(()),
                    )
            else:
                state, meta = self._restore(checkpoint, state)
                last_mean_rewards = meta.get(
                    "last_mean_rewards", last_mean_rewards
                )
        if writer is None:
            writer = create_writer(summaries_dir)
        train_fn = self.make_train_fn(mesh=mesh)
        max_epochs = self.max_epochs if max_epochs is None else max_epochs

        # metrics are read back to the host only every `log_interval`
        # epochs — under a remote relay each device_get costs a ~30 ms
        # round trip, which would dominate epochs that are only a few ms
        # of device/env time. Epoch/frame counters advance
        # deterministically, so loop control stays host-side.
        log_interval = max(1, int(config.get("log_interval", 1)))
        epoch_num = int(jax.device_get(state.epoch))
        frame = epoch_num * self.num_frames_per_epoch

        start_time = time.perf_counter()
        t_last_log = start_time
        ep_last_log = epoch_num
        best_path = os.path.join(nn_dir, experiment_name + ".ckpt")
        while True:
            if getattr(self, "_program_stale", False):
                train_fn = self.make_train_fn(mesh=mesh)
                self._program_stale = False
            state, metrics_dev = train_fn(state)
            epoch_num += 1
            frame += self.num_frames_per_epoch
            total_time = time.perf_counter() - start_time

            will_exit = (
                (max_epochs > 0 and epoch_num >= max_epochs)
                or (self.max_frames > 0 and frame >= self.max_frames)
            )
            do_log = (epoch_num % log_interval == 0) or will_exit
            stop_requested = False
            if not do_log:
                mean_rewards = None
                if stop_fn is not None and stop_fn(self):
                    stop_requested = will_exit = do_log = True
            if do_log:
                metrics = jax.device_get(metrics_dev)
                now = time.perf_counter()
                # divide by the ACTUAL epochs since the last log — an early
                # log (will_exit/stop_fn) covers fewer than log_interval
                fps = (
                    (epoch_num - ep_last_log) * self.num_frames_per_epoch
                    / max(now - t_last_log, 1e-9)
                )
                t_last_log = now
                ep_last_log = epoch_num
                games_played = int(metrics["games_played"])
                mean_rewards = (
                    float(metrics["mean_rewards"][0]) if games_played else None
                )
                for key in ("critic_loss", "actor_loss", "entropy", "alpha",
                            "alpha_loss", "critic1_loss", "critic2_loss"):
                    writer.add_scalar(
                        f"losses/{key}", float(metrics[key]), frame
                    )
                writer.add_scalar("performance/step_fps", fps, frame)
                if mean_rewards is not None:
                    writer.add_scalar("rewards/step", mean_rewards, frame)
                    writer.add_scalar("rewards/iter", mean_rewards, epoch_num)
                    writer.add_scalar(
                        "episode_lengths/step",
                        float(metrics["mean_lengths"]), frame,
                    )
                if config.get("print_stats", True):
                    print(
                        f"fps: {fps:.0f} epoch: {epoch_num} frames: {frame}"
                        + (
                            f" rew: {mean_rewards:.2f}"
                            if mean_rewards is not None
                            else ""
                        ),
                        flush=True,
                    )

            meta = {
                "last_mean_rewards": last_mean_rewards,
                "epoch": epoch_num,
                "frame": frame,
                "has_replay": self.save_replay_buffer,
            }
            if self.save_freq > 0 and epoch_num % self.save_freq == 0:
                ckpt.save_checkpoint(
                    os.path.join(
                        nn_dir, f"last_{experiment_name}_ep_{epoch_num}.ckpt"
                    ),
                    self._ckpt_state(state), meta,
                    weights=self.get_weights(state),
                )
            if (
                mean_rewards is not None
                and epoch_num >= self.save_best_after
                and mean_rewards > last_mean_rewards
            ):
                last_mean_rewards = mean_rewards
                meta["last_mean_rewards"] = last_mean_rewards
                ckpt.save_checkpoint(
                    best_path, self._ckpt_state(state), meta,
                    weights=self.get_weights(state),
                )
                if (
                    self.score_to_win is not None
                    and mean_rewards > self.score_to_win
                ):
                    print("Maximum reward achieved. Network won!")
                    break
            should_exit = will_exit
            if max_epochs > 0 and epoch_num >= max_epochs:
                print("MAX EPOCHS NUM!")
            if self.max_frames > 0 and frame >= self.max_frames:
                print("MAX FRAMES NUM!")
            if (
                not stop_requested
                and do_log
                and stop_fn is not None
                and stop_fn(self)
            ):
                stop_requested = True
            if stop_requested:
                should_exit = True
            if should_exit:
                ckpt.save_checkpoint(
                    os.path.join(
                        nn_dir, f"last_{experiment_name}_ep_{epoch_num}.ckpt"
                    ),
                    self._ckpt_state(state), meta,
                    weights=self.get_weights(state),
                )
                break

        writer.flush()
        self.last_state = state
        return last_mean_rewards, epoch_num
