"""PPO on TPU: the whole epoch is one compiled SPMD program.

The reference's host-driven epoch (a2c_common.py: play_steps :787-850 +
train_epoch :1241-1307) becomes a single jitted function over an immutable
train-state pytree:

    rollout  = lax.scan(policy_step ∘ env_step, carry, horizon)   # on device
    gae      = ops.gae.compute_gae (Pallas kernel on TPU)
    updates  = fori(mini_epochs) { scan(minibatches) { grad step } }

Functional equivalents preserved for learning-curve parity (SURVEY.md §7):
exact loss family (a2c_continuous.py:97-133), value-bootstrap-at-timeout
reward patch (a2c_common.py:813-814), RunningMeanStd semantics incl. the
value-normalizer update-from-values + freeze (a2c_common.py:1325-1332),
advantage normalization (:1334-1349), adaptive-KL LR with 'legacy'
(per-minibatch, incl. mu/sigma writeback a2c_common.py:1280) and 'standard'
(per-miniepoch) schedule types, episode reward/length meters
(torch_ext.AverageMeter :319-345), and the epoch/frame bookkeeping.

Data parallelism: `make_train_fn(mesh)` jits the same program with the env
axis sharded over 'data' and params replicated — XLA inserts the gradient
all-reduce the reference does by hand (a2c_common.py:362-378).
"""

import functools
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from rl_games_tpu.common.tr_helpers import (
    build_reward_shaper,
    rescale_actions,
    swap_and_flatten01,
)
from rl_games_tpu.envs import registry as env_registry
from rl_games_tpu.envs.spaces import Box, actions_num_of, obs_shape_of
from rl_games_tpu.models import model_builder, models as M
from rl_games_tpu.ops import losses as L
from rl_games_tpu.ops import masked as MK
from rl_games_tpu.ops.gae import compute_gae
from rl_games_tpu.ops.running_stats import (
    generalized_moving_stats_init,
    generalized_moving_stats_normalize,
    generalized_moving_stats_update,
)
from rl_games_tpu.ops.schedulers import build_scheduler


# ---------------------------------------------------------------------------
# Functional AverageMeter (torch_ext.py:319-345): ring mean over the last
# `games_to_track` completed episodes.
# ---------------------------------------------------------------------------


@struct.dataclass
class Meters:
    buf: jnp.ndarray  # [capacity, width]
    ptr: jnp.ndarray  # () int32
    count: jnp.ndarray  # () int32 — total filled, clamped to capacity


def meters_init(capacity: int, width: int) -> Meters:
    return Meters(
        buf=jnp.zeros((capacity, width), jnp.float32),
        ptr=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


def meters_update(m: Meters, values: jnp.ndarray, mask: jnp.ndarray) -> Meters:
    """Scatter completed-episode rows (mask=True) into the ring buffer."""
    cap = m.buf.shape[0]
    mask_i = mask.astype(jnp.int32)
    slot = jnp.cumsum(mask_i) - 1  # position among done rows
    pos = (m.ptr + slot) % cap
    pos = jnp.where(mask, pos, cap)  # out-of-range rows are dropped
    buf = m.buf.at[pos].set(values.astype(jnp.float32), mode="drop")
    n = mask_i.sum()
    return Meters(
        buf=buf, ptr=(m.ptr + n) % cap, count=jnp.minimum(m.count + n, cap)
    )


def meters_mean(m: Meters) -> jnp.ndarray:
    cap = m.buf.shape[0]
    idx = jnp.arange(cap)[:, None]
    valid = (idx < m.count).astype(jnp.float32)
    total = jnp.maximum(m.count.astype(jnp.float32), 1.0)
    return (m.buf * valid).sum(0) / total


# ---------------------------------------------------------------------------
# Train state
# ---------------------------------------------------------------------------


@struct.dataclass
class PPOTrainState:
    params: Any
    opt_state: Any
    norm: M.NormState
    adv_rms: Any  # GeneralizedMovingStatsState | None
    lr: jnp.ndarray
    entropy_coef: jnp.ndarray
    epoch: jnp.ndarray  # () int32
    frame: jnp.ndarray  # () int32
    rng: jax.Array
    env_state: Any
    obs: Any
    dones: jnp.ndarray  # [N] float32 — dones entering the next step
    current_rewards: jnp.ndarray  # [N, value_size]
    current_shaped_rewards: jnp.ndarray
    current_lengths: jnp.ndarray  # [N]
    game_rewards: Meters
    game_shaped_rewards: Meters
    game_lengths: Meters
    rnn_states: Any = None  # tuple of [layers, N, units] | None
    cv_params: Any = None  # central value net (asymmetric actor-critic)
    cv_opt: Any = None
    cv_norm: Any = None
    cv_rnn_states: Any = None  # central value net's own RNN states
    game_scores: Any = None  # Meters over infos['scores'] at episode end
    rnd_target: Any = None  # RND curiosity: frozen target net params
    rnd_pred: Any = None  # RND predictor params (trained per epoch)
    rnd_opt: Any = None
    rnd_rms: Any = None  # RND's own obs normalizer state


class PPOAgent:
    """PPO trainer (continuous + discrete/multi-discrete) over device envs.

    `params` is the reference YAML `params:` dict (algo/model/network/config).
    An already-built vec env may be injected via `vec_env` (the fake-env
    testing seam, sac_agent.py:166-171 / a2c_common.py:131-136 analog).
    """

    def __init__(self, base_name: str, params: dict, vec_env=None):
        self.base_name = base_name
        self.full_params = params
        config = params["config"]
        self.config = config

        # --- env ----------------------------------------------------------
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
        self.value_size = info.value_size
        self.num_agents = info.agents
        self.observation_space = info.observation_space
        self.action_space = info.action_space
        self.obs_shape = obs_shape_of(info.observation_space)
        self.actions_num = actions_num_of(info.action_space)

        self.is_continuous = isinstance(info.action_space, Box)

        # --- config (a2c_common.py:137-330) -------------------------------
        self.horizon_length = config["horizon_length"]
        self.seq_length = config.get("seq_length", 4)
        self.batch_size = self.horizon_length * self.num_actors * self.num_agents
        if "minibatch_size" not in config and "minibatch_size_per_env" not in config:
            raise ValueError(
                "Config must include 'minibatch_size' or 'minibatch_size_per_env'"
            )
        self.minibatch_size = config.get(
            "minibatch_size",
            self.num_actors * config.get("minibatch_size_per_env", 0),
        )
        if self.minibatch_size <= 0:
            raise ValueError("'minibatch_size' must be > 0")
        if self.batch_size % self.minibatch_size != 0:
            raise ValueError(
                f"batch_size ({self.batch_size}) must be divisible by "
                f"minibatch_size ({self.minibatch_size})"
            )
        self.num_minibatches = self.batch_size // self.minibatch_size
        self.mini_epochs_num = config["mini_epochs"]

        self.e_clip = config["e_clip"]
        self.clip_value = config["clip_value"]
        self.gamma = config["gamma"]
        self.tau = config["tau"]
        self.ppo = config.get("ppo", True)
        self.critic_coef = config["critic_coef"]
        self.entropy_coef_init = config["entropy_coef"]
        self.bounds_loss_coef = config.get("bounds_loss_coef", None)
        # 'bound' (squared excess beyond +-1.1) or 'regularisation' (sum of
        # squared mus) — a2c_continuous.py:238-253
        self.bound_loss_type = config.get("bound_loss_type", "bound")
        self.grad_norm = config["grad_norm"]
        self.truncate_grads = config.get("truncate_grads", False)
        self.normalize_advantage = config["normalize_advantage"]
        self.normalize_rms_advantage = config.get("normalize_rms_advantage", False)
        self.normalize_input = config["normalize_input"]
        self.normalize_value = config.get("normalize_value", False)
        self.freeze_critic = config.get("freeze_critic", False)
        self.value_bootstrap = config.get("value_bootstrap", True)
        # host-rollout inference placement (common/host_inference.py):
        # auto = host CPU backend when the accelerator is remote
        self.host_inference = config.get("host_inference_device", "auto")
        self.use_smooth_clamp = config.get("use_smooth_clamp", False)
        self.use_diagnostics = config.get("use_diagnostics", False)
        # soft augmentation: KL-consistency aux loss on transformed obs
        # (common/transforms/soft_augmentation.py; features.soft_augmentation)
        soft_aug_cfg = (config.get("features") or {}).get("soft_augmentation")
        self.soft_aug = None
        self.soft_aug_coef = 0.0
        if soft_aug_cfg:
            from rl_games_tpu.common.transforms import build_transform

            self.soft_aug = build_transform(soft_aug_cfg.get("transform", {}))
            self.soft_aug_coef = float(soft_aug_cfg.get("aug_coef", 0.001))
        # RND curiosity (rnd_config — the historical schema the reference
        # still ships in configs/smac/v1/3m_torch_sparse.yaml:58-78 but
        # whose builder class is absent from its tree; models/rnd.py)
        rnd_cfg = config.get("rnd_config")
        self.rnd = None
        if rnd_cfg:
            from rl_games_tpu.models.rnd import RNDCuriosity

            self.rnd = RNDCuriosity(rnd_cfg["network"])
            self.rnd_scale = float(rnd_cfg.get("scale_value", 1.0))
            self.rnd_lr = float(rnd_cfg.get("learning_rate", 5e-4))
            self.rnd_mini_epochs = int(rnd_cfg.get("mini_epochs", 1))
            self.rnd_minibatch = int(
                rnd_cfg.get("minibatch_size") or self.minibatch_size
            )
            self.rnd_tx = optax.adam(self.rnd_lr)
            if rnd_cfg.get("episodic") or rnd_cfg.get("gamma"):
                print(
                    "rnd_config: 'episodic'/'gamma' accepted but folded — "
                    "the intrinsic reward joins the shaped reward before "
                    "GAE (single advantage head) rather than getting a "
                    "separate episodic return"
                )
        self.adv_rms_momentum = config.get("adv_rms_momentum", 0.5)
        self._observer = (config.get("features") or {}).get("observer")
        self._rollout_time = None  # calibrated under use_diagnostics
        self._last_timing = None  # host-path real split
        self._program_stale = False  # set_param touched a baked-in constant
        # bf16 compute for the minibatch fwd/bwd with fp32 master params —
        # the reference's autocast policy (a2c_continuous.py:172-178,
        # torch_ext.default_mixed_precision). Default off: TPUs already run
        # f32 matmuls through bf16 MXU passes, so this trades precision for
        # bandwidth only when explicitly requested.
        self.mixed_precision = config.get("mixed_precision", False)
        self.weight_decay = config.get("weight_decay", 0.0)
        self.learning_rate = float(config["learning_rate"])
        self.schedule_type = config.get("schedule_type", "legacy")
        self.max_epochs = config.get("max_epochs", -1)
        self.max_frames = max(config.get("max_frames", -1), config.get("max_steps", -1))
        self.games_to_track = config.get("games_to_track", 100)
        self.clip_actions = config.get("clip_actions", True)
        self.use_action_masks = config.get("use_action_masks", False)
        # multi-agent: episode stats count each ENV once, at its first agent
        # row (env_done_indices = all_done_indices[::num_agents],
        # a2c_common.py:825-827)
        if self.num_agents > 1:
            n_rows = self.num_actors * self.num_agents
            self._env_rows = (
                jnp.arange(n_rows) % self.num_agents == 0
            )
        else:
            self._env_rows = None
        self.save_freq = config.get("save_frequency", 0)
        self.save_best_after = config.get("save_best_after", 100)
        self.score_to_win = config.get("score_to_win", None)
        self.seed = config.get("seed", 7)

        self.scheduler = build_scheduler(
            {**config, "max_epochs": self.max_epochs,
             "max_frames": self.max_frames},
            self.learning_rate,
        )
        if self.max_frames > 2**31 - 1:
            # the in-state frame counter is int32 (device-friendly; x64 is
            # globally disabled): frame-based budgets past 2^31 would wrap
            raise ValueError(
                f"max_frames {self.max_frames} exceeds the int32 frame "
                "counter (2^31-1 ≈ 2.1e9); split the run into resumed "
                "segments (the checkpoint carries epoch/frame meta)"
            )
        self.rewards_shaper = build_reward_shaper(config)

        # --- model --------------------------------------------------------
        builder = model_builder.ModelBuilder()
        model_obs_shape = self.obs_shape
        if isinstance(model_obs_shape, dict) and "obs" in model_obs_shape:
            model_obs_shape = model_obs_shape["obs"]
        self.model = builder.load(
            params,
            actions_num=self.actions_num,
            input_shape=model_obs_shape,
            value_size=self.value_size,
            normalize_input=self.normalize_input,
            normalize_value=self.normalize_value,
            obs_shape=self.obs_shape,
        )

        # self-play device envs apply the learner's own architecture on
        # the opponent seat (envs/jax/selfplay.py)
        if hasattr(self.vec_env, "bind_policy"):
            self.vec_env.bind_policy(self.model)

        # --- central value (asymmetric actor-critic, central_value.py) -----
        self.central_value_config = config.get("central_value_config", None)
        self.has_central_value = self.central_value_config is not None
        if self.has_central_value:
            cv_cfg = self.central_value_config
            state_space = info.state_space or info.observation_space
            self.state_shape = obs_shape_of(state_space)
            from rl_games_tpu.models.models import ModelCentralValue
            from rl_games_tpu.models.network_builder import A2CNetwork

            cv_net_params = dict(cv_cfg["network"])
            cv_net_params["central_value"] = True
            self.cv_model = ModelCentralValue(
                A2CNetwork.create(
                    cv_net_params,
                    actions_num=None,
                    input_shape=self.state_shape,
                    value_size=self.value_size,
                ),
                normalize_input=cv_cfg.get("normalize_input", False),
                normalize_value=self.normalize_value,
                value_size=self.value_size,
                obs_shape=self.state_shape,
            )
            self.cv_lr = float(cv_cfg["learning_rate"])
            self.cv_mini_epochs = cv_cfg["mini_epochs"]
            self.cv_minibatch_size = cv_cfg.get(
                "minibatch_size",
                self.num_actors * cv_cfg.get("minibatch_size_per_env", 0),
            )
            if self.cv_minibatch_size <= 0:
                raise ValueError(
                    "central_value_config needs 'minibatch_size' or "
                    "'minibatch_size_per_env' > 0 (central_value.py:65-74)"
                )
            # non-dividing minibatch: the tail rows are dropped each epoch,
            # matching the reference's PPODataset len = batch // minibatch
            self.cv_num_minibatches = max(
                1, self.batch_size // self.cv_minibatch_size
            )
            self.cv_clip_value = cv_cfg.get("clip_value", True)
            self.cv_e_clip = cv_cfg.get("e_clip", 0.2)
            cv_chain = []
            if cv_cfg.get("truncate_grads", False):
                cv_chain.append(
                    optax.clip_by_global_norm(cv_cfg.get("grad_norm", 1.0))
                )
            cv_chain.append(optax.adam(self.cv_lr, eps=1e-8))
            self.cv_tx = optax.chain(*cv_chain)
        # with a central value net the actor model's own value head carries no
        # loss (a2c_continuous.py:75)
        self.has_value_loss = not self.has_central_value
        if config.get("use_action_masks", False) and self.is_host_env:
            if not hasattr(self.vec_env, "get_action_masks"):
                raise ValueError(
                    "use_action_masks requires the host vec env to expose "
                    "get_action_masks() (IVecEnv surface, "
                    "common/ivecenv.py:24-26)"
                )
            probe = getattr(self.vec_env, "supports_action_masks", None)
            if probe is not None and not probe():
                raise ValueError(
                    "use_action_masks: this vec env cannot serve masks "
                    "(async vectorization, or sub-envs without "
                    "get_action_mask) — see GymnasiumVecEnv."
                    "supports_action_masks"
                )
        if (
            self.is_host_env
            and getattr(self.vec_env, "autoreset_mode", "same_step")
            == "next_step"
        ):
            # next_step autoreset injects a post-done garbage row (stale
            # final obs + no-op action + zero reward) into the on-policy
            # dataset; the reference avoids it by resetting inside the
            # worker (RayWorker, common/vecenv.py:70-178). Use same_step.
            raise ValueError(
                "PPO host rollout requires same_step autoreset "
                "(reset-on-done); construct the vec env with "
                "autoreset_mode='same_step'"
            )

        # --- RNN wiring (a2c_common.py:229-240, 507-529) --------------------
        self.is_rnn = self.model.is_rnn()
        # the central value net keeps its own parallel RNN machinery
        # (central_value.py:100-107, 189-203)
        self.cv_is_rnn = self.has_central_value and self.cv_model.is_rnn()
        self.any_rnn = self.is_rnn or self.cv_is_rnn
        self.zero_rnn_on_done = config.get("zero_rnn_on_done", True)
        # reference default: NO minibatch permutation (datasets.py permute
        # flag from config['permute_batches'], RNN minibatches always ordered)
        self.permute_batches = config.get("permute_batches", False) and not self.any_rnn
        if self.any_rnn:
            if self.horizon_length % self.seq_length != 0:
                raise ValueError(
                    "horizon_length must be divisible by seq_length"
                )
            if self.minibatch_size % self.seq_length != 0:
                raise ValueError(
                    "minibatch_size must be divisible by seq_length"
                )
            self.num_windows = self.horizon_length // self.seq_length
            self.games_num = self.minibatch_size // self.seq_length
        if self.cv_is_rnn:
            if self.cv_minibatch_size % self.seq_length != 0:
                raise ValueError(
                    "central value minibatch_size must be divisible by "
                    "seq_length"
                )
            self.cv_games_num = self.cv_minibatch_size // self.seq_length

        # --- optimizer (torch fused Adam analog: clip → wd → adam; the lr
        # lives in the train state so schedulers can run inside jit) --------
        self.tx = self._build_tx()

        self._train_epoch_jit = None

    def _build_tx(self):
        """clip → weight decay → adam — one definition so __init__ and
        _rebuild_stale_program (PBT set_param on grad_norm) can never
        drift apart."""
        chain = []
        if self.truncate_grads:
            chain.append(optax.clip_by_global_norm(self.grad_norm))
        if self.weight_decay > 0:
            chain.append(optax.add_decayed_weights(self.weight_decay))
        chain.append(optax.scale_by_adam(eps=1e-8))
        chain.append(optax.scale(-1.0))
        return optax.chain(*chain)

    # ------------------------------------------------------------------
    # state construction
    # ------------------------------------------------------------------
    def init_state(self, seed: Optional[int] = None) -> PPOTrainState:
        seed = self.seed if seed is None else seed
        rng = jax.random.PRNGKey(seed)
        rng, env_key, model_key = jax.random.split(rng, 3)
        if self.is_host_env:
            env_state = None
            obs = jax.tree.map(jnp.asarray, self.vec_env.reset())
        else:
            env_state, obs = self.vec_env.reset(env_key)
        example_obs = self._actor_obs(obs)
        n_envs = self.num_actors * self.num_agents
        rnn_states = (
            self.model.get_default_rnn_state(n_envs) if self.is_rnn else None
        )
        params, norm = self.model.init(
            model_key, example_obs, rnn_states=rnn_states
        )
        opt_state = self.tx.init(params)
        cv_params = cv_opt = cv_norm = cv_rnn_states = None
        if self.has_central_value:
            cv_key = jax.random.fold_in(model_key, 1)
            if self.cv_is_rnn:
                cv_rnn_states = self.cv_model.get_default_rnn_state(n_envs)
            cv_params, cv_norm = self.cv_model.init(
                cv_key, obs["states"], rnn_states=cv_rnn_states
            )
            cv_opt = self.cv_tx.init(cv_params)
        if hasattr(self.vec_env, "init_opponent") and env_state is not None:
            # install the initial opponent weights (selfplay.py)
            env_state = self.vec_env.init_opponent(
                env_state, {"params": params, "norm": norm}
            )
        n = self.num_actors * self.num_agents
        v = self.value_size
        adv_rms = (
            generalized_moving_stats_init(())
            if self.normalize_rms_advantage else None
        )
        rnd_target = rnd_pred = rnd_opt = rnd_rms = None
        if self.rnd is not None:
            from rl_games_tpu.ops.running_stats import rms_init

            rnd_obs = self._actor_obs(obs)
            if isinstance(rnd_obs, dict):
                raise ValueError(
                    "rnd_config supports flat observation spaces"
                )
            rnd_key = jax.random.fold_in(model_key, 2)
            rnd_target, rnd_pred = self.rnd.init(rnd_key, rnd_obs)
            rnd_opt = self.rnd_tx.init(rnd_pred)
            rnd_rms = rms_init(rnd_obs.shape[1:])
        state = PPOTrainState(
            params=params,
            opt_state=opt_state,
            norm=norm,
            adv_rms=adv_rms,
            lr=jnp.asarray(self.learning_rate, jnp.float32),
            entropy_coef=jnp.asarray(self.entropy_coef_init, jnp.float32),
            epoch=jnp.zeros((), jnp.int32),
            frame=jnp.zeros((), jnp.int32),
            rng=rng,
            env_state=env_state,
            obs=obs,
            dones=jnp.ones(n, jnp.float32),  # a2c_common: initial dones = ones
            current_rewards=jnp.zeros((n, v), jnp.float32),
            current_shaped_rewards=jnp.zeros((n, v), jnp.float32),
            current_lengths=jnp.zeros(n, jnp.float32),
            game_rewards=meters_init(self.games_to_track, v),
            game_shaped_rewards=meters_init(self.games_to_track, v),
            game_lengths=meters_init(self.games_to_track, 1),
            rnn_states=rnn_states,
            cv_params=cv_params,
            cv_opt=cv_opt,
            cv_norm=cv_norm,
            cv_rnn_states=cv_rnn_states,
            game_scores=meters_init(self.games_to_track, 1),
            rnd_target=rnd_target,
            rnd_pred=rnd_pred,
            rnd_opt=rnd_opt,
            rnd_rms=rnd_rms,
        )
        # distinct buffers per leaf — XLA dedupes equal constants, and an
        # aliased pair would break jit donation ("donate the same buffer
        # twice")
        return jax.tree.map(lambda x: jnp.array(x, copy=True), state)

    # ------------------------------------------------------------------
    # pieces of the epoch program
    # ------------------------------------------------------------------
    def _actor_obs(self, obs):
        """The actor's input: the 'obs' entry of the {'obs','states'}
        asymmetric wrapper; a genuine dict observation space (custom
        networks) passes through whole."""
        if isinstance(obs, dict) and set(obs.keys()) <= {"obs", "states"}:
            return obs["obs"]
        return obs

    def _env_actions(self, actions):
        """Clip/rescale continuous actions for the env (a2c_common:1224-1234)."""
        if not self.is_continuous:
            return actions
        space = self.action_space
        a = jnp.clip(actions, -1.0, 1.0) if self.clip_actions else actions
        low = jnp.asarray(space.low, jnp.float32)
        high = jnp.asarray(space.high, jnp.float32)
        # low/high may independently be scalars or per-dim arrays
        if np.isfinite(space.low).all() and np.isfinite(space.high).all():
            return rescale_actions(low, high, a)
        return a

    def _rollout(self, state: PPOTrainState):
        """lax.scan over horizon (play_steps / play_steps_rnn,
        a2c_common.py:787-939). RNN mode is a nested scan over
        [num_windows, seq_length] with hidden-state snapshots at window
        starts; done-zeroing happens inside the recurrent core via the
        stored per-step done flags, which reproduces the reference's
        post-step zeroing (:899-904) at both rollout and update time."""
        params, norm = state.params, state.norm

        def step(carry, _):
            (env_state, obs, dones, rng, cur_r, cur_sr, cur_len,
             m_r, m_sr, m_len, m_sc, rnn_states, cv_rnn_states) = carry
            rng, akey = jax.random.split(rng)
            mask_kwargs = {}
            if self.use_action_masks:
                # get_masked_action_values (a2c_common.py:793-797)
                mask_kwargs["action_masks"] = self.vec_env.get_action_masks(
                    env_state
                )
            res = self.model.forward_play(
                params, norm, akey, self._actor_obs(obs),
                rnn_states=rnn_states,
                dones=dones if (self.is_rnn and self.zero_rnn_on_done) else None,
                seq_length=1,
                **mask_kwargs,
            )
            new_rnn_states = res["rnn_states"] if self.is_rnn else None
            new_cv_rnn_states = None
            if self.has_central_value:
                # values come from the central net (get_action_values,
                # a2c_common.py:460-470); its own RNN states advance in
                # parallel (pre/post_step_rnn, central_value.py:189-203)
                cv_res = self.cv_model.forward_play(
                    state.cv_params, state.cv_norm, akey, obs["states"],
                    rnn_states=cv_rnn_states,
                    dones=dones
                    if (self.cv_is_rnn and self.zero_rnn_on_done)
                    else None,
                    seq_length=1,
                )
                res["values"] = cv_res["values"]
                if self.cv_is_rnn:
                    new_cv_rnn_states = cv_res["rnn_states"]
            env_state2, next_obs, rewards, new_dones, infos = self.vec_env.step(
                env_state, self._env_actions(res["actions"])
            )
            if rewards.ndim == 1:
                rewards = rewards[:, None]
            rewards = rewards.astype(jnp.float32)
            shaped = self.rewards_shaper(rewards)
            values = res["values"]
            if self.value_bootstrap:
                shaped = shaped + self.gamma * values * infos[
                    "time_outs"
                ].astype(jnp.float32)[:, None]

            # episode accounting (a2c_common.py:820-834)
            cur_r = cur_r + rewards
            cur_sr = cur_sr + shaped
            cur_len = cur_len + 1.0
            done_mask = new_dones.astype(bool)
            if self._env_rows is not None:
                done_mask = done_mask & self._env_rows
            m_r = meters_update(m_r, cur_r, done_mask)
            m_sr = meters_update(m_sr, cur_sr, done_mask)
            m_len = meters_update(m_len, cur_len[:, None], done_mask)
            if "scores" in infos:
                # DefaultAlgoObserver score extraction at done rows
                # (algo_observer.py:29-92), device-side
                m_sc = meters_update(
                    m_sc,
                    infos["scores"].astype(jnp.float32).reshape(-1, 1),
                    done_mask,
                )
            not_done = 1.0 - new_dones.astype(jnp.float32)
            cur_r = cur_r * not_done[:, None]
            cur_sr = cur_sr * not_done[:, None]
            cur_len = cur_len * not_done

            out = {
                "obses": obs,
                "dones": dones,
                "actions": res["actions"],
                "values": values,
                "neglogpacs": res["neglogpacs"],
                "rewards": shaped,
            }
            if self.has_central_value:
                out["states"] = obs["states"]
            if self.is_continuous:
                out["mus"] = res["mus"]
                out["sigmas"] = res["sigmas"]
            if self.use_action_masks:
                out["action_masks"] = mask_kwargs["action_masks"]
            carry = (
                env_state2, next_obs, new_dones.astype(jnp.float32), rng,
                cur_r, cur_sr, cur_len, m_r, m_sr, m_len, m_sc,
                new_rnn_states, new_cv_rnn_states,
            )
            return carry, out

        carry0 = (
            state.env_state, state.obs, state.dones, state.rng,
            state.current_rewards, state.current_shaped_rewards,
            state.current_lengths, state.game_rewards,
            state.game_shaped_rewards, state.game_lengths, state.game_scores,
            state.rnn_states, state.cv_rnn_states,
        )

        if self.any_rnn:
            # nested scan: snapshot hidden states at each window start
            # (play_steps_rnn, a2c_common.py:857-860; the cv net snapshots
            # its own states in parallel, central_value.py:189-203)
            def window(carry, _):
                snapshot = (carry[-2], carry[-1])
                carry, traj_w = jax.lax.scan(
                    step, carry, None, length=self.seq_length
                )
                return carry, (snapshot, traj_w)

            carry, (snapshots, traj) = jax.lax.scan(
                window, carry0, None, length=self.num_windows
            )
            rnn_snapshots = snapshots
            # traj leaves: [W, seq, N, ...] → [T, N, ...]
            traj = jax.tree.map(
                lambda x: x.reshape((self.horizon_length,) + x.shape[2:]), traj
            )
        else:
            rnn_snapshots = None
            carry, traj = jax.lax.scan(
                step, carry0, None, length=self.horizon_length
            )

        (env_state, obs, dones, rng, cur_r, cur_sr, cur_len,
         m_r, m_sr, m_len, m_sc, rnn_states, cv_rnn_states) = carry

        # bootstrap values for the final obs (get_values, a2c_common:474-483)
        rng, vkey = jax.random.split(rng)
        if self.has_central_value:
            last_values = self.cv_model.forward_play(
                state.cv_params, state.cv_norm, vkey, obs["states"],
                rnn_states=cv_rnn_states,
                dones=dones
                if (self.cv_is_rnn and self.zero_rnn_on_done)
                else None,
                seq_length=1,
            )["values"]
        else:
            last_values = self.model.forward_play(
                params, norm, vkey, self._actor_obs(obs),
                rnn_states=rnn_states,
                dones=dones if (self.is_rnn and self.zero_rnn_on_done) else None,
                seq_length=1,
            )["values"]

        state = state.replace(
            env_state=env_state, obs=obs, dones=dones, rng=rng,
            current_rewards=cur_r, current_shaped_rewards=cur_sr,
            current_lengths=cur_len, game_rewards=m_r,
            game_shaped_rewards=m_sr, game_lengths=m_len,
            game_scores=m_sc, rnn_states=rnn_states,
            cv_rnn_states=cv_rnn_states,
        )
        return state, traj, last_values, rnn_snapshots

    def _prepare_dataset(self, state: PPOTrainState, traj, last_values,
                         rnn_snapshots=None):
        """GAE + dataset assembly (a2c_common.py:836-849, 1309-1370)."""
        mb_values = traj["values"]  # [T, N, V] (denormalized)
        mb_rewards = traj["rewards"]
        mb_dones = traj["dones"]  # [T, N] dones entering step t
        fdones = state.dones

        if self.rnd is not None:
            # intrinsic reward joins the shaped reward before GAE
            # (models/rnd.py; rnd_config.scale_value)
            from rl_games_tpu.ops.running_stats import (
                rms_normalize, rms_update_from_batch,
            )

            obs_tn = self._actor_obs(traj["obses"])  # [T, N, D]
            flat = obs_tn.reshape(-1, obs_tn.shape[-1])
            rnd_rms = rms_update_from_batch(state.rnd_rms, flat)
            obs_n = rms_normalize(rnd_rms, flat)
            intr = self.rnd.intrinsic(state.rnd_target, state.rnd_pred, obs_n)
            intr = intr.reshape(mb_rewards.shape[:2])
            mb_rewards = mb_rewards + self.rnd_scale * intr[..., None]
            state = state.replace(rnd_rms=rnd_rms)

        mb_advs = compute_gae(
            mb_rewards, mb_values, mb_dones, last_values, fdones,
            self.gamma, self.tau,
        )
        mb_returns = mb_advs + mb_values

        dataset = {
            k: jax.tree.map(swap_and_flatten01, v) for k, v in traj.items()
        }
        returns = swap_and_flatten01(mb_returns)
        values = dataset.pop("values")
        advantages = returns - values  # [B, V]

        norm = state.norm
        if self.normalize_input:
            norm = M.update_obs_stats(norm, self._actor_obs(dataset["obses"]))
        cv_norm = state.cv_norm
        # value-normalizer parity: the reference runs TWO sequential
        # train-mode forwards — value_mean_std(values) then
        # value_mean_std(returns) (a2c_common.py:1325-1332) — so stats
        # advance from both batches and returns normalize with the
        # post-values stats; freeze_critic switches to eval mode (:1324)
        if self.has_central_value:
            # the value normalizer lives on the central net
            # (a2c_continuous.py:73); its obs normalizer sees states
            if self.cv_model.normalize_input:
                cv_norm = M.update_obs_stats(cv_norm, dataset["states"])
            if self.normalize_value:
                if not self.freeze_critic:
                    cv_norm = M.update_value_stats(cv_norm, values)
                values = M.normalize_values(cv_norm, values)
                if not self.freeze_critic:
                    cv_norm = M.update_value_stats(cv_norm, returns)
                returns = M.normalize_values(cv_norm, returns)
        elif self.normalize_value:
            if not self.freeze_critic:
                norm = M.update_value_stats(norm, values)
            values = M.normalize_values(norm, values)
            if not self.freeze_critic:
                norm = M.update_value_stats(norm, returns)
            returns = M.normalize_values(norm, returns)

        advantages = advantages.sum(axis=1)  # [B] (a2c_common:1334)
        adv_rms = state.adv_rms
        if self.normalize_advantage:
            if self.normalize_rms_advantage:
                # the reference's GeneralizedMovingStats('mean_std',
                # decay=momentum): EMA of mean and E[x^2] from zero, var
                # floored at 1/max^2, normalized output clamped to +-5
                # (a2c_common.py:342-344, moving_mean_std.py:50-126)
                adv_rms = generalized_moving_stats_update(
                    adv_rms, advantages, decay=self.adv_rms_momentum
                )
                advantages = generalized_moving_stats_normalize(
                    adv_rms, advantages, decay=self.adv_rms_momentum
                )
            else:
                advantages = L.normalize_advantage(advantages)

        dataset["old_values"] = values
        dataset["returns"] = returns
        dataset["advantages"] = advantages
        dataset["old_logp_actions"] = dataset.pop("neglogpacs")
        state = state.replace(norm=norm, adv_rms=adv_rms, cv_norm=cv_norm)

        def to_dataset_states(snaps):
            # snapshots [W, layers, N, units] → [layers, N*W, units]; the
            # env-major flatten means global sequence s = (env e)*W + w,
            # matching the reference's permute(1,2,0,3).reshape
            # (a2c_common.py:932-937)
            return tuple(
                x.transpose(1, 2, 0, 3).reshape(
                    x.shape[1], x.shape[2] * x.shape[0], x.shape[3]
                )
                for x in snaps
            )

        rnn_dataset_states = cv_rnn_dataset_states = None
        if self.any_rnn:
            actor_snaps, cv_snaps = rnn_snapshots
            if self.is_rnn:
                rnn_dataset_states = to_dataset_states(actor_snaps)
            if self.cv_is_rnn:
                cv_rnn_dataset_states = to_dataset_states(cv_snaps)
        return state, dataset, (rnn_dataset_states, cv_rnn_dataset_states)

    def _loss_and_kl(self, params, norm, mb, entropy_coef, mb_key=None):
        """Loss assembly (a2c_continuous.py:97-133 / a2c_discrete.py:116-190)."""
        if mb_key is not None:
            aug_key, entropy_key = jax.random.split(mb_key)
        else:
            aug_key = entropy_key = None
        if self.mixed_precision:
            # bf16 network compute; losses/stats stay f32 (bf16 keeps f32's
            # exponent range, so no loss scaling — same as torch autocast)
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x,
                params,
            )
        rnn_kwargs = {}
        if self.is_rnn:
            rnn_kwargs = dict(
                rnn_states=mb["rnn_states"],
                dones=mb["dones"] if self.zero_rnn_on_done else None,
                seq_length=self.seq_length,
            )
        if self.use_action_masks:
            rnn_kwargs["action_masks"] = mb["action_masks"]
        if entropy_key is not None and getattr(
            self.model, "sampled_entropy", False
        ):
            # tanh policy: entropy is a single-sample MC estimate — give it
            # FRESH noise per minibatch (the reference rsamples per update,
            # models.py:351-407); a frozen key would bias the entropy grad
            rnn_kwargs["entropy_key"] = entropy_key
        res = self.model.forward_train(
            params, norm, self._actor_obs(mb["obses"]), mb["actions"],
            **rnn_kwargs,
        )
        if self.mixed_precision:
            res = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x,
                res,
            )
        actor_loss_fn = (
            L.smoothed_actor_loss if self.use_smooth_clamp else L.actor_loss
        )
        a_loss = actor_loss_fn(
            mb["old_logp_actions"], res["prev_neglogp"], mb["advantages"],
            self.ppo, self.e_clip,
        )
        if self.has_value_loss:
            if "value_logits" in res:
                # twohot head: cross-entropy against the two-hot encoding
                # of symlog returns — NOT clipped MSE on the decoded value
                # (TwoHotEncodedValue.loss, common/layers/value.py:33-38)
                from rl_games_tpu.models.distributions import (
                    symlog, twohot_log_prob,
                )
                c_loss = -twohot_log_prob(
                    res["value_logits"], symlog(mb["returns"][..., 0])
                )
            else:
                c_loss = L.critic_loss(
                    mb["old_values"], res["values"], self.e_clip,
                    mb["returns"], self.clip_value,
                )
        else:
            # central value net owns the value loss (a2c_continuous.py:75)
            c_loss = jnp.zeros_like(res["values"])
        entropy = res["entropy"]
        if self.is_continuous and self.bounds_loss_coef is not None:
            if self.bound_loss_type == "regularisation":
                b_loss = L.reg_loss(res["mus"])
            else:
                b_loss = L.bound_loss(res["mus"])
        else:
            b_loss = jnp.zeros_like(a_loss)
        a_loss_m = a_loss.mean()
        c_loss_m = c_loss.mean()
        entropy_m = entropy.mean()
        b_loss_m = b_loss.mean()
        bounds_coef = self.bounds_loss_coef or 0.0
        total = (
            a_loss_m
            + 0.5 * self.critic_coef * c_loss_m
            - entropy_coef * entropy_m
            + bounds_coef * b_loss_m
        )
        # aux-loss hook: custom networks may emit an 'aux_losses' dict
        # (get_aux_loss, a2c_continuous.py:194-202)
        for v in (res.get("aux_losses") or {}).values():
            total = total + v.mean()
        if self.soft_aug is not None and aug_key is not None:
            # soft augmentation (soft_augmentation.py:18-31): KL between
            # the (detached) policy on the original obs and the policy on
            # augmented obs, plus a value-consistency MSE
            aug_obs = self.soft_aug(aug_key, self._actor_obs(mb["obses"]))
            q = self.model.forward_train(
                params, norm, aug_obs, mb["actions"], **rnn_kwargs
            )
            sg = jax.lax.stop_gradient
            if self.is_continuous:
                aug_kl = self.model.kl(
                    sg(res["mus"]), sg(res["sigmas"]), q["mus"], q["sigmas"]
                ).mean()
            else:
                aug_kl = self.model.kl(sg(res["logits"]), q["logits"]).mean()
            v_cons = (
                0.5 * jnp.square(sg(res["values"]) - q["values"])
            ).sum(-1).mean()
            total = total + self.soft_aug_coef * (aug_kl + v_cons)
        if self.is_continuous:
            kl = self.model.kl(
                res["mus"], res["sigmas"], mb["mus"], mb["sigmas"]
            ).mean()
        else:
            kl = (
                0.5
                * jnp.square(mb["old_logp_actions"] - res["prev_neglogp"]).mean()
            )
        clip_frac = MK.policy_clip_fraction(
            res["prev_neglogp"], mb["old_logp_actions"], self.e_clip
        )
        aux = {
            "a_loss": a_loss_m,
            "c_loss": c_loss_m,
            "entropy": entropy_m,
            "b_loss": b_loss_m,
            "kl": kl,
            "clip_frac": clip_frac,
        }
        if self.is_continuous:
            aux["mus"] = res["mus"]
            aux["sigmas"] = res["sigmas"]
        return total, aux

    def _update(self, state: PPOTrainState, dataset, rnn_dataset_states=None):
        """Minibatch epochs (train_epoch, a2c_common.py:1269-1302).

        Minibatch selection follows the reference dataset exactly
        (datasets.py): ordered contiguous slices by default, optional
        whole-batch permutation per mini-epoch when `permute_batches` (non-RNN
        only), and ordered whole-sequence groups in RNN mode with hidden-state
        slices along the sequence axis (:63-73).
        """
        legacy = self.schedule_type == "legacy"

        def slice_mb(ds, sel):
            if self.permute_batches:
                return jax.tree.map(lambda x: x[sel], ds)
            mb = jax.tree.map(
                lambda x: jax.lax.dynamic_slice_in_dim(
                    x, sel, self.minibatch_size, axis=0
                ),
                ds,
            )
            return mb

        def minibatch_step(carry, xs):
            sel, mb_key = xs
            params, opt_state, ds, lr, ec = carry
            mb = slice_mb(ds, sel)
            if self.is_rnn:
                gstart = sel // self.seq_length
                mb["rnn_states"] = tuple(
                    jax.lax.dynamic_slice_in_dim(
                        s, gstart, self.games_num, axis=1
                    )
                    for s in rnn_dataset_states
                )

            grad_fn = jax.value_and_grad(
                lambda p: self._loss_and_kl(p, state.norm, mb, ec, mb_key),
                has_aux=True,
            )
            (_, aux), grads = grad_fn(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = optax.apply_updates(params, updates)

            if self.is_continuous and legacy:
                # mu/sigma writeback for 'legacy' (datasets.py:33-43)
                if self.permute_batches:
                    new_mus = ds["mus"].at[sel].set(aux["mus"])
                    new_sigmas = ds["sigmas"].at[sel].set(aux["sigmas"])
                else:
                    new_mus = jax.lax.dynamic_update_slice_in_dim(
                        ds["mus"], aux["mus"], sel, axis=0
                    )
                    new_sigmas = jax.lax.dynamic_update_slice_in_dim(
                        ds["sigmas"], aux["sigmas"], sel, axis=0
                    )
                ds = {**ds, "mus": new_mus, "sigmas": new_sigmas}
            if legacy:
                lr, ec = self.scheduler.update(
                    lr, ec, state.epoch, state.frame, aux["kl"]
                )
            metrics = {
                k: aux[k]
                for k in ("a_loss", "c_loss", "entropy", "b_loss", "kl",
                          "clip_frac")
            }
            return (params, opt_state, ds, lr, ec), metrics

        starts = jnp.arange(self.num_minibatches) * self.minibatch_size

        def mini_epoch(ep, carry):
            params, opt_state, ds, lr, ec, rng, metrics_acc = carry
            if self.permute_batches:
                rng, pkey = jax.random.split(rng)
                perm = jax.random.permutation(pkey, self.batch_size)
                sels = perm.reshape(self.num_minibatches, self.minibatch_size)
            else:
                sels = starts
            rng, mbk = jax.random.split(rng)
            mb_keys = jax.random.split(mbk, self.num_minibatches)
            (params, opt_state, ds, lr, ec), ms = jax.lax.scan(
                minibatch_step, (params, opt_state, ds, lr, ec),
                (sels, mb_keys),
            )
            ep_kl = ms["kl"].mean()
            if not legacy:
                lr, ec = self.scheduler.update(
                    lr, ec, state.epoch, state.frame, ep_kl
                )
            diag = metrics_acc.pop("_diag", None)
            metrics_acc = jax.tree.map(
                lambda acc, m: acc + m.mean() / self.mini_epochs_num,
                metrics_acc,
                ms,
            )
            if diag is not None:
                # per-miniepoch diagnostics (PpoDiagnostics,
                # diagnostics.py:18-60): clip-frac and kl per mini-epoch
                diag = {
                    "kl": diag["kl"].at[ep].set(ms["kl"].mean()),
                    "clip_frac": diag["clip_frac"].at[ep].set(
                        ms["clip_frac"].mean()
                    ),
                }
                metrics_acc["_diag"] = diag
            return (params, opt_state, ds, lr, ec, rng, metrics_acc)

        metrics0 = {
            k: jnp.zeros((), jnp.float32)
            for k in ("a_loss", "c_loss", "entropy", "b_loss", "kl", "clip_frac")
        }
        if self.use_diagnostics:
            metrics0["_diag"] = {
                "kl": jnp.zeros(self.mini_epochs_num, jnp.float32),
                "clip_frac": jnp.zeros(self.mini_epochs_num, jnp.float32),
            }
        carry = (
            state.params, state.opt_state, dataset, state.lr,
            state.entropy_coef, state.rng, metrics0,
        )
        params, opt_state, dataset, lr, ec, rng, metrics = jax.lax.fori_loop(
            0, self.mini_epochs_num, mini_epoch, carry
        )
        state = state.replace(
            params=params, opt_state=opt_state, lr=lr, entropy_coef=ec, rng=rng
        )
        return state, metrics

    def _update_rnd(self, state: PPOTrainState, dataset):
        """Train the RND predictor on this rollout's observations
        (rnd_config.mini_epochs × minibatch_size; models/rnd.py). A
        non-dividing minibatch drops the batch tail each mini-epoch — the
        same convention as the reference's PPODataset (len = batch //
        minibatch)."""
        from rl_games_tpu.ops.running_stats import rms_normalize

        obs = self._actor_obs(dataset["obses"])
        obs_n = rms_normalize(state.rnd_rms, obs.reshape(-1, obs.shape[-1]))
        B = obs_n.shape[0]
        mb = min(self.rnd_minibatch, B)
        num_mb = max(B // mb, 1)

        def minibatch_step(carry, start):
            pred, opt = carry
            rows = jax.lax.dynamic_slice_in_dim(obs_n, start * mb, mb)
            loss, grads = jax.value_and_grad(self.rnd.loss)(
                pred, state.rnd_target, rows
            )
            updates, opt = self.rnd_tx.update(grads, opt, pred)
            pred = optax.apply_updates(pred, updates)
            return (pred, opt), loss

        carry = (state.rnd_pred, state.rnd_opt)
        all_losses = []
        for _ in range(self.rnd_mini_epochs):
            carry, losses = jax.lax.scan(
                minibatch_step, carry, jnp.arange(num_mb)
            )
            all_losses.append(losses)
        pred, opt = carry
        state = state.replace(rnd_pred=pred, rnd_opt=opt)
        return state, jnp.mean(jnp.stack(all_losses))

    def _update_central_value(self, state: PPOTrainState, dataset,
                              cv_rnn_dataset_states=None):
        """Central value net training (central_value.py:246-339); in RNN
        mode minibatches are whole-sequence groups with their own
        hidden-state slices (central_value.py:100-107)."""
        cv_minibatches = self.cv_num_minibatches

        def minibatch_step(carry, start):
            cv_params, cv_opt = carry
            cols = {
                "states": dataset["states"],
                "old_values": dataset["old_values"],
                "returns": dataset["returns"],
            }
            if self.cv_is_rnn:
                cols["dones"] = dataset["dones"]
            mb = jax.tree.map(
                lambda x: jax.lax.dynamic_slice_in_dim(
                    x, start, self.cv_minibatch_size, axis=0
                ),
                cols,
            )
            rnn_kwargs = {}
            if self.cv_is_rnn:
                gstart = start // self.seq_length
                rnn_kwargs = dict(
                    rnn_states=tuple(
                        jax.lax.dynamic_slice_in_dim(
                            x, gstart, self.cv_games_num, axis=1
                        )
                        for x in cv_rnn_dataset_states
                    ),
                    dones=mb["dones"] if self.zero_rnn_on_done else None,
                    seq_length=self.seq_length,
                )

            def loss_fn(p):
                res = self.cv_model.forward_train(
                    p, state.cv_norm, mb["states"], **rnn_kwargs
                )
                if "value_logits" in res:
                    # twohot head (common/layers/value.py:33-38)
                    from rl_games_tpu.models.distributions import (
                        symlog, twohot_log_prob,
                    )
                    loss = -twohot_log_prob(
                        res["value_logits"], symlog(mb["returns"][..., 0])
                    )
                else:
                    loss = L.critic_loss(
                        mb["old_values"], res["values"], self.cv_e_clip,
                        mb["returns"], self.cv_clip_value,
                    )
                return loss.mean()

            loss, grads = jax.value_and_grad(loss_fn)(cv_params)
            updates, cv_opt = self.cv_tx.update(grads, cv_opt, cv_params)
            cv_params = optax.apply_updates(cv_params, updates)
            return (cv_params, cv_opt), loss

        starts = jnp.tile(
            jnp.arange(cv_minibatches) * self.cv_minibatch_size,
            self.cv_mini_epochs,
        )
        (cv_params, cv_opt), losses = jax.lax.scan(
            minibatch_step, (state.cv_params, state.cv_opt), starts
        )
        state = state.replace(cv_params=cv_params, cv_opt=cv_opt)
        return state, losses.mean()

    def _finish_epoch(self, state: PPOTrainState, traj, last_values,
                      rnn_snapshots, update_meters: bool = False):
        """prepare_dataset → central value → minibatch updates → counters.

        `update_meters=True` is the host-rollout path: episode meters are
        folded in here from the trajectory (the device path updates them
        inside the rollout scan)."""
        if update_meters:
            env_rewards = traj.pop("env_rewards")  # [T, N, V] raw rewards
            shaped_rewards = traj["rewards"]
            # dones produced BY step t = stored dones shifted by one, with
            # the post-rollout dones as the last element
            dones_next = jnp.concatenate(
                [traj["dones"][1:], state.dones[None]], axis=0
            )

            def meter_step(carry, inp):
                cur_r, cur_sr, cur_len, m_r, m_sr, m_len = carry
                rew, srew, dn = inp
                cur_r = cur_r + rew
                cur_sr = cur_sr + srew
                cur_len = cur_len + 1.0
                mask = dn.astype(bool)
                if self._env_rows is not None:
                    mask = mask & self._env_rows
                m_r = meters_update(m_r, cur_r, mask)
                m_sr = meters_update(m_sr, cur_sr, mask)
                m_len = meters_update(m_len, cur_len[:, None], mask)
                nd = 1.0 - dn.astype(jnp.float32)
                return (
                    cur_r * nd[:, None], cur_sr * nd[:, None], cur_len * nd,
                    m_r, m_sr, m_len,
                ), None

            carry0 = (
                state.current_rewards, state.current_shaped_rewards,
                state.current_lengths, state.game_rewards,
                state.game_shaped_rewards, state.game_lengths,
            )
            (cur_r, cur_sr, cur_len, m_r, m_sr, m_len), _ = jax.lax.scan(
                meter_step, carry0, (env_rewards, shaped_rewards, dones_next)
            )
            state = state.replace(
                current_rewards=cur_r, current_shaped_rewards=cur_sr,
                current_lengths=cur_len, game_rewards=m_r,
                game_shaped_rewards=m_sr, game_lengths=m_len,
            )

        state, dataset, (rnn_ds_states, cv_rnn_ds_states) = (
            self._prepare_dataset(state, traj, last_values, rnn_snapshots)
        )
        cval_loss = None
        # freeze_critic skips central-value training entirely
        # (central_value.py:253-255); the value-normalizer freeze happens
        # in _prepare_dataset (a2c_common.py:1324)
        if self.has_central_value and not self.freeze_critic:
            state, cval_loss = self._update_central_value(
                state, dataset, cv_rnn_ds_states
            )
        rnd_loss = None
        if self.rnd is not None:
            state, rnd_loss = self._update_rnd(state, dataset)
        state, metrics = self._update(state, dataset, rnn_ds_states)
        metrics = dict(metrics)
        if rnd_loss is not None:
            metrics["rnd_loss"] = rnd_loss
        # PpoDiagnostics explained variance (diagnostics.py:18-60)
        metrics["explained_variance"] = MK.explained_variance(
            dataset["old_values"].reshape(-1), dataset["returns"].reshape(-1)
        )
        if self.use_diagnostics and "_diag" in metrics:
            # normalizer state diagnostics (diagnostics.py:41-55)
            if self.normalize_input and not isinstance(state.norm.obs, dict):
                metrics["_diag"]["obs_rms_mean"] = state.norm.obs.mean.mean()
                metrics["_diag"]["obs_rms_var"] = state.norm.obs.var.mean()
            if self.normalize_value and state.norm.value is not None:
                metrics["_diag"]["value_rms_mean"] = state.norm.value.mean.mean()
                metrics["_diag"]["value_rms_var"] = state.norm.value.var.mean()
        if cval_loss is not None:
            metrics["cval_loss"] = cval_loss
        state = state.replace(
            epoch=state.epoch + 1,
            frame=state.frame + self.batch_size,
        )
        metrics = dict(metrics)
        metrics["lr"] = state.lr
        metrics["e_clip"] = jnp.asarray(self.e_clip, jnp.float32)
        metrics["entropy_coef"] = state.entropy_coef
        metrics["mean_rewards"] = meters_mean(state.game_rewards)
        metrics["mean_shaped_rewards"] = meters_mean(state.game_shaped_rewards)
        metrics["mean_lengths"] = meters_mean(state.game_lengths)[0]
        metrics["games_played"] = state.game_rewards.count
        if state.game_scores is not None:
            metrics["mean_scores"] = meters_mean(state.game_scores)[0]
        metrics["frame"] = state.frame
        metrics["epoch"] = state.epoch
        return state, metrics

    def train_epoch(self, state: PPOTrainState):
        """One full PPO epoch: rollout → GAE → minibatch updates (device)."""
        state, traj, last_values, rnn_snapshots = self._rollout(state)
        return self._finish_epoch(state, traj, last_values, rnn_snapshots)

    # ------------------------------------------------------------------
    # host-env rollout path (the reference's Ray/envpool/gymnasium analog:
    # env stepping on the host, policy inference + GAE + update compiled)
    # ------------------------------------------------------------------
    def _make_host_fns(self):
        def policy_step(params, norm, cv_params, cv_norm, key, obs, dones,
                        rnn_states, cv_rnn_states, action_masks=None):
            mask_kwargs = (
                {} if action_masks is None
                else {"action_masks": action_masks}
            )
            res = self.model.forward_play(
                params, norm, key, self._actor_obs(obs),
                rnn_states=rnn_states,
                dones=dones if (self.is_rnn and self.zero_rnn_on_done) else None,
                seq_length=1,
                **mask_kwargs,
            )
            res = dict(res)
            if self.has_central_value:
                # asymmetric host envs emit {'obs','states'}; values come
                # from the central net (a2c_common.py:460-470)
                cv_res = self.cv_model.forward_play(
                    cv_params, cv_norm, key, obs["states"],
                    rnn_states=cv_rnn_states,
                    dones=dones
                    if (self.cv_is_rnn and self.zero_rnn_on_done)
                    else None,
                    seq_length=1,
                )
                res["values"] = cv_res["values"]
                res["cv_rnn_states"] = cv_res["rnn_states"]
            res["env_actions"] = self._env_actions(res["actions"])
            return res

        from rl_games_tpu.common.host_inference import resolve_rollout_device

        self._rollout_dev = resolve_rollout_device(self.host_inference)
        if self._rollout_dev is not None:
            print(
                f"host rollout inference on {self._rollout_dev} "
                f"(host_inference_device={self.host_inference}); "
                "update epoch stays on the default backend"
            )
        return jax.jit(policy_step), jax.jit(
            functools.partial(self._finish_epoch, update_meters=True),
            static_argnames=(),
        )

    def host_train_epoch(self, state: PPOTrainState):
        """Host rollout loop (play_steps against a non-jittable vec env)."""
        if not hasattr(self, "_host_fns"):
            self._host_fns = self._make_host_fns()
        policy_step, finish = self._host_fns

        from rl_games_tpu.common.host_inference import device_ctx
        from rl_games_tpu.common.obs_utils import to_device_obs

        dev = self._rollout_dev
        if dev is not None:
            # split placement (common/host_inference.py): ONE
            # accelerator→host round trip per epoch (params + carried
            # state sync to the CPU backend) instead of two per env step
            (params, norm, cv_params, cv_norm, obs, dones, rnn_states,
             cv_rnn_states, rng) = jax.device_put(
                (state.params, state.norm, state.cv_params, state.cv_norm,
                 state.obs, jnp.asarray(state.dones), state.rnn_states,
                 state.cv_rnn_states, state.rng), dev)
        else:
            params, norm = state.params, state.norm
            cv_params, cv_norm = state.cv_params, state.cv_norm
            obs = state.obs
            dones = jnp.asarray(state.dones)
            rnn_states = state.rnn_states
            cv_rnn_states = state.cv_rnn_states
            rng = state.rng
        traj_steps = []
        snapshots = []
        cv_snapshots = []
        step_time = 0.0  # pure env-step time (a2c_common.py:806-810)
        t_play0 = time.perf_counter()
        with device_ctx(dev):
            for t in range(self.horizon_length):
                if self.any_rnn and t % self.seq_length == 0:
                    snapshots.append(rnn_states)
                    cv_snapshots.append(cv_rnn_states)
                rng, akey = jax.random.split(rng)
                masks = None
                if self.use_action_masks:
                    # get_masked_action_values over the host boundary
                    # (a2c_discrete.py:92-114; RayWorker.get_action_mask)
                    masks = jnp.asarray(self.vec_env.get_action_masks())
                res = policy_step(
                    params, norm, cv_params, cv_norm,
                    akey, obs, dones, rnn_states, cv_rnn_states, masks,
                )
                actions_np = np.asarray(res["env_actions"])
                t0 = time.perf_counter()
                next_obs, rewards, new_dones, infos = self.vec_env.step(
                    actions_np
                )
                step_time += time.perf_counter() - t0
                if self._observer is not None:
                    # per-step observer hooks fire where infos are
                    # host-visible (algo_observer.py:6-26; a2c_common
                    # play_steps)
                    self._observer.process_infos(
                        infos, np.nonzero(np.asarray(new_dones))[0]
                    )
                    self._observer.after_steps()
                rewards = np.asarray(rewards, np.float32)
                if rewards.ndim == 1:
                    rewards = rewards[:, None]
                values = res["values"]
                shaped = np.asarray(self.rewards_shaper(jnp.asarray(rewards)))
                if self.value_bootstrap and "time_outs" in infos:
                    shaped = shaped + self.gamma * np.asarray(values) * (
                        np.asarray(infos["time_outs"], np.float32)[:, None]
                    )
                step_out = {
                    "obses": obs,
                    "dones": dones,
                    "actions": res["actions"],
                    "values": values,
                    "neglogpacs": res["neglogpacs"],
                    "rewards": jnp.asarray(shaped),
                    "env_rewards": jnp.asarray(rewards),
                }
                if self.is_continuous:
                    step_out["mus"] = res["mus"]
                    step_out["sigmas"] = res["sigmas"]
                if self.has_central_value:
                    step_out["states"] = obs["states"]
                if self.use_action_masks:
                    step_out["action_masks"] = masks
                traj_steps.append(step_out)
                obs = to_device_obs(next_obs)
                dones = jnp.asarray(new_dones, jnp.float32)
                if self.is_rnn:
                    rnn_states = res["rnn_states"]
                if self.cv_is_rnn:
                    cv_rnn_states = res["cv_rnn_states"]

            rng, vkey = jax.random.split(rng)
            last = policy_step(
                params, norm, cv_params, cv_norm,
                vkey, obs, dones, rnn_states, cv_rnn_states,
            )
            last_values = last["values"]

            traj = jax.tree.map(lambda *xs: jnp.stack(xs), *traj_steps)
            rnn_snapshots = None
            if self.any_rnn:
                rnn_snapshots = (
                    jax.tree.map(lambda *xs: jnp.stack(xs), *snapshots)
                    if self.is_rnn else None,
                    jax.tree.map(lambda *xs: jnp.stack(xs), *cv_snapshots)
                    if self.cv_is_rnn else None,
                )

        if dev is not None:
            # ONE host→accelerator transfer: rollout products + carried
            # state rejoin the compiled update epoch's device
            (traj, last_values, rnn_snapshots, obs, dones, rnn_states,
             cv_rnn_states, rng) = jax.device_put(
                (traj, last_values, rnn_snapshots, obs, dones, rnn_states,
                 cv_rnn_states, rng), jax.devices()[0])

        state = state.replace(
            obs=obs, dones=dones, rng=rng, rnn_states=rnn_states,
            cv_rnn_states=cv_rnn_states,
        )
        play_time = time.perf_counter() - t_play0
        out = finish(state, traj, last_values, rnn_snapshots)
        # the reference's three-way timing split (a2c_common.py:399-404):
        # step (pure env) / play (env + inference) / update
        self._last_timing = {"step_time": step_time, "play_time": play_time}
        return out

    # ------------------------------------------------------------------
    # compiled entry points
    # ------------------------------------------------------------------
    def make_train_fn(self, mesh=None, donate: bool = True):
        """jit the epoch; with a mesh, shard the env axis over 'data'.

        Under a mesh this is the TPU answer to the reference's DDP setup
        (torchrun env vars + manual flat-bucket grad all-reduce,
        a2c_common.py:362-378): the batch axis is sharded, params are
        replicated, and XLA inserts the gradient psum over ICI.
        """
        donate_args = (0,) if donate else ()
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
        if mesh is None:
            # fresh lambda per call: bound methods hash equal across
            # accesses, so jitting self.train_epoch directly would let
            # jax's trace cache serve a jaxpr with STALE baked-in
            # constants after set_param mutations
            return jax.jit(
                lambda s: self.train_epoch(s), donate_argnums=donate_args
            )

        from rl_games_tpu.parallel.mesh import ppo_state_shardings

        cache = {}

        def wrapper(state):
            if "fn" not in cache:
                shardings = ppo_state_shardings(state, mesh)
                cache["fn"] = jax.jit(
                    lambda s: self.train_epoch(s),
                    in_shardings=(shardings,),
                    out_shardings=(shardings, None),
                    donate_argnums=donate_args,
                )
                cache["shardings"] = shardings
                state = jax.device_put(state, shardings)
            return cache["fn"](state)

        return wrapper

    # ------------------------------------------------------------------
    # weights / full-state surface (BaseAlgorithm contract,
    # interfaces/base_algorithm.py:5-49)
    # ------------------------------------------------------------------
    def _calibrate_rollout_time(self, state) -> float:
        """Time a jitted rollout-only program once (use_diagnostics device
        path) so the reference's step/inference/update fps split
        (a2c_common.py:399-404) can be reported for the fused epoch."""
        ro = jax.jit(
            lambda s: jax.tree.leaves(self._rollout(s)[1])[0].sum()
        )
        float(ro(state))  # compile + warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(ro(state))
            best = min(best, time.perf_counter() - t0)
        return best

    def clear_stats(self, state: PPOTrainState) -> PPOTrainState:
        """Reset episode meters + accumulators (algo.clear_stats,
        a2c_common.py:645-648) — e.g. after a self-play opponent push so the
        threshold re-arms on fresh games."""
        n = self.num_actors * self.num_agents
        v = self.value_size
        return state.replace(
            current_rewards=jnp.zeros((n, v), jnp.float32),
            current_shaped_rewards=jnp.zeros((n, v), jnp.float32),
            current_lengths=jnp.zeros(n, jnp.float32),
            game_rewards=meters_init(self.games_to_track, v),
            game_shaped_rewards=meters_init(self.games_to_track, v),
            game_lengths=meters_init(self.games_to_track, 1),
            game_scores=meters_init(self.games_to_track, 1),
        )

    def get_weights(self, state: PPOTrainState):
        """Model weights + normalizer stats (a2c_common.py:690-710)."""
        return {"params": state.params, "norm": state.norm}

    def set_weights(self, state: PPOTrainState, weights) -> PPOTrainState:
        return state.replace(params=weights["params"], norm=weights["norm"])

    def get_full_state_weights(self, state: PPOTrainState,
                               last_mean_rewards: float = -100500.0) -> dict:
        """The full resumable training state (a2c_common.py:650-668): the
        TrainState pytree already carries params, optimizer state,
        normalizers, counters, meters, and — for device envs — the env
        state; host-env state is fetched via the IVecEnv surface."""
        out = {
            "state": state,
            "weights": self.get_weights(state),
            "epoch": int(state.epoch),
            "frame": int(state.frame),
            "last_mean_rewards": last_mean_rewards,
        }
        if self.is_host_env and hasattr(self.vec_env, "get_env_state"):
            out["env_state"] = self.vec_env.get_env_state()
        return out

    def set_full_state_weights(self, state: PPOTrainState, full: dict,
                               set_epoch: bool = True) -> PPOTrainState:
        """a2c_common.py:670-688: restore everything; `set_epoch=False`
        keeps the current counters (PBT warm-start semantics)."""
        new = full["state"]
        if not set_epoch:
            new = new.replace(epoch=state.epoch, frame=state.frame)
        if (
            self.is_host_env
            and full.get("env_state") is not None
            and hasattr(self.vec_env, "set_env_state")
        ):
            self.vec_env.set_env_state(full["env_state"])
        return new

    # ------------------------------------------------------------------
    # get_param / set_param (a2c_common.py:725-772) — the PBT / external
    # controller surface. Params that live in the TrainState (lr,
    # entropy_coef) mutate the state; params baked into the compiled
    # program (gamma, tau, e_clip, ...) set the attribute and mark the
    # program stale — train() re-jits before the next epoch.
    # ------------------------------------------------------------------
    _STATIC_PARAMS = (
        "grad_norm", "critic_coef", "bounds_loss_coef", "gamma", "tau",
        "mini_epochs_num", "e_clip",
    )

    def get_param(self, param_name: str, state: Optional[PPOTrainState] = None):
        if param_name in self._STATIC_PARAMS:
            return getattr(self, param_name)
        if param_name == "learning_rate":
            return float(state.lr) if state is not None else self.learning_rate
        if param_name == "entropy_coef":
            return (
                float(state.entropy_coef)
                if state is not None
                else self.entropy_coef_init
            )
        if param_name == "kl_threshold":
            return self.config.get("kl_threshold")
        raise NotImplementedError(f"Can't get param {param_name}")

    def set_param(self, param_name: str, value,
                  state: Optional[PPOTrainState] = None):
        """Returns the (possibly updated) state."""
        if param_name in self._STATIC_PARAMS:
            setattr(self, param_name, value)
            self._program_stale = True
            return state
        if param_name == "learning_rate":
            if self.config.get("lr_schedule") == "adaptive":
                raise NotImplementedError(
                    "Can't directly mutate LR on this schedule"
                )
            self.learning_rate = float(value)
            if state is not None:
                return state.replace(lr=jnp.asarray(value, jnp.float32))
            return state
        if param_name == "entropy_coef":
            self.entropy_coef_init = float(value)
            if state is not None:
                return state.replace(
                    entropy_coef=jnp.asarray(value, jnp.float32)
                )
            return state
        if param_name == "kl_threshold":
            if self.config.get("lr_schedule") != "adaptive":
                raise NotImplementedError(
                    "Can't mutate kl threshold on this schedule"
                )
            self.config["kl_threshold"] = float(value)
            self.scheduler = build_scheduler(
                {**self.config,
                 "max_epochs": self.max_epochs if self.max_epochs > 0 else
                 self.config.get("max_epochs", 1000000)},
                self.learning_rate,
            )
            self._program_stale = True
            return state
        raise NotImplementedError(f"No param found for {param_name}")

    def override_sigma(self, state: PPOTrainState, sigma: float):
        """--sigma CLI override (_override_sigma, torch_runner.py:52-60)."""
        from rl_games_tpu.common.obs_utils import (
            fill_sigma_leaves, sigma_override_blocked,
        )

        blocked = sigma_override_blocked(
            self.is_continuous, self.full_params.get("network", {})
        )
        if blocked:
            print(blocked)
            return state
        return state.replace(params=fill_sigma_leaves(state.params, sigma))

    def restore_central_value_only(self, checkpoint: str,
                                   state: PPOTrainState) -> PPOTrainState:
        """load_critic_only (torch_runner.py:46-49): warm-start just the
        central-value net from a checkpoint."""
        if not self.has_central_value:
            raise ValueError(
                "Loading critic only works only for asymmetric actor critic"
            )
        from rl_games_tpu.utils import checkpoint as ckpt

        loaded, _ = ckpt.load_checkpoint(checkpoint, state)
        return state.replace(
            cv_params=loaded.cv_params,
            cv_opt=loaded.cv_opt,
            cv_norm=loaded.cv_norm,
        )

    def reset_optimizer(self, state: PPOTrainState) -> PPOTrainState:
        """Fresh Adam moments. Used on PBT in-process adoption — carrying
        the laggard's moments against the leader's weights is wrong (the
        reference avoids it by full process restart, pbt.py:129-272)."""
        new = {"opt_state": self.tx.init(state.params)}
        if self.has_central_value:
            new["cv_opt"] = self.cv_tx.init(state.cv_params)
        return state.replace(**new)

    def _rebuild_stale_program(self):
        """Re-derive everything that bakes static params in: the optimizer
        chain (grad_norm) and the jitted epoch programs."""
        self.tx = self._build_tx()
        if hasattr(self, "_host_fns"):
            del self._host_fns
        self._program_stale = False

    # ------------------------------------------------------------------
    # host train loop (ContinuousA2CBase.train, a2c_common.py:1372-1492)
    # ------------------------------------------------------------------
    def train(
        self,
        mesh=None,
        checkpoint: Optional[str] = None,
        stop_fn=None,
        writer=None,
        max_epochs: Optional[int] = None,
        sigma: Optional[float] = None,
        load_critic_only: bool = False,
    ):
        from rl_games_tpu.utils import checkpoint as ckpt
        from rl_games_tpu.utils.writer import create_writer, write_ppo_stats

        config = self.config
        experiment_name = config.get(
            "name", config.get("full_experiment_name", self.base_name)
        )
        train_dir = config.get("train_dir", "runs")
        experiment_dir = os.path.join(train_dir, experiment_name)
        nn_dir = os.path.join(experiment_dir, "nn")
        summaries_dir = os.path.join(experiment_dir, "summaries")
        os.makedirs(nn_dir, exist_ok=True)

        state = self.init_state()
        last_mean_rewards = -100500.0  # reference sentinel
        if checkpoint:
            if load_critic_only:
                # critic warm-start (torch_runner.py:46-49)
                state = self.restore_central_value_only(checkpoint, state)
            elif checkpoint.endswith((".pth", ".pt")):
                # reference torch checkpoint: import weights + normalizers
                # as a warm start (utils/torch_import)
                from rl_games_tpu.utils.torch_import import (
                    import_a2c_checkpoint,
                )

                p, n = import_a2c_checkpoint(
                    checkpoint, state.params, state.norm,
                    self.full_params["network"], self.obs_shape,
                )
                state = state.replace(params=p, norm=n)
            else:
                state, meta = ckpt.load_checkpoint(checkpoint, state)
                last_mean_rewards = meta.get(
                    "last_mean_rewards", last_mean_rewards
                )
        if sigma is not None:
            state = self.override_sigma(state, sigma)

        if writer is None:
            writer = create_writer(summaries_dir)
        interval_writer = None
        pbt_cfg_dict = self.config.get("pbt") or {}
        if pbt_cfg_dict.get("enabled"):
            # PBT-scale runs throttle TB writes (auto-enable, the
            # reference's a2c_common.py:326-328)
            from rl_games_tpu.utils.writer import IntervalSummaryWriter

            # reference keys (summaries_interval_sec_min/max,
            # defer_summaries_sec) live in the top-level config
            interval_writer = IntervalSummaryWriter(writer, self.config)
            writer = interval_writer
        self.writer = writer
        observer = (self.config.get("features") or {}).get("observer")
        if observer is not None:
            observer.before_init(
                self.base_name, self.config, experiment_name
            )
            observer.after_init(self)
        # self-play (a2c_common has_self_play_config path) and PBT wiring
        self_play_manager = None
        if self.config.get("self_play_config"):
            from rl_games_tpu.utils.self_play import SelfPlayManager

            self_play_manager = SelfPlayManager(
                self.config["self_play_config"], writer
            )
        pbt_manager = None
        if pbt_cfg_dict.get("enabled"):
            from rl_games_tpu.utils.pbt import PbtCfg, PbtManager

            pbt_cfg = PbtCfg.from_dict(pbt_cfg_dict)
            if not pbt_cfg.directory:
                pbt_cfg.directory = train_dir
            pbt_manager = PbtManager(
                pbt_cfg,
                {
                    "learning_rate": self.learning_rate,
                    "entropy_coef": self.entropy_coef_init,
                },
            )
        train_fn = self.make_train_fn(mesh=mesh)
        max_epochs = self.max_epochs if max_epochs is None else max_epochs

        if (
            self.use_diagnostics
            and not self.is_host_env
            and self._rollout_time is None
        ):
            self._rollout_time = self._calibrate_rollout_time(state)

        # metrics reach the host only every `log_interval` epochs: under a
        # remote relay a device_get costs a ~30 ms round trip, which would
        # dominate fused epochs that take ~10 ms of device time. Loop
        # control stays host-side (epoch/frame advance deterministically).
        log_interval = max(1, int(config.get("log_interval", 1)))
        epoch_num = int(jax.device_get(state.epoch))
        frame = epoch_num * self.batch_size

        start_time = time.perf_counter()
        t_last_log = start_time
        ep_last_log = epoch_num
        best_path = os.path.join(nn_dir, experiment_name + ".ckpt")
        while True:
            # curriculum hook, called per epoch like the reference's
            # train_epoch (a2c_common.py:636); device envs take difficulty
            # through their state pytree instead, host envs may override
            if self.is_host_env and hasattr(self.vec_env, "set_train_info"):
                self.vec_env.set_train_info(frame, self)
            state, metrics_dev = train_fn(state)
            epoch_num += 1
            frame += self.batch_size
            will_exit = (
                (max_epochs > 0 and epoch_num >= max_epochs)
                or (self.max_frames > 0 and frame >= self.max_frames)
            )
            # stop_fn is consulted every epoch regardless of log cadence
            # (the reference checks its stop condition per-epoch;
            # torch_runner.py:63-95)
            stop_requested = stop_fn is not None and stop_fn(self)
            do_log = (
                (epoch_num % log_interval == 0) or will_exit or stop_requested
            )
            save_due = (
                self.save_freq > 0 and epoch_num % self.save_freq == 0
            )
            # self-play/PBT decide per-epoch in the reference and need fresh
            # metrics, so their presence forces a device fetch even on
            # non-log epochs.
            need_metrics = (
                do_log
                or self_play_manager is not None
                or pbt_manager is not None
            )
            if not (need_metrics or save_due):
                if self._program_stale:
                    self._rebuild_stale_program()
                    train_fn = self.make_train_fn(mesh=mesh)
                continue
            total_time = time.perf_counter() - start_time
            if not need_metrics:
                meta = {
                    "last_mean_rewards": last_mean_rewards,
                    "epoch": epoch_num,
                    "frame": frame,
                }
                ckpt.save_checkpoint(
                    os.path.join(
                        nn_dir, f"last_{experiment_name}_ep_{epoch_num}.ckpt"
                    ),
                    state, meta, weights=self.get_weights(state),
                )
                if self._program_stale:
                    self._rebuild_stale_program()
                    train_fn = self.make_train_fn(mesh=mesh)
                continue
            metrics = jax.device_get(metrics_dev)
            if do_log:
                now = time.perf_counter()
                # divide by the ACTUAL epochs since the last log — an early
                # log (will_exit/stop_fn) covers fewer than log_interval
                epoch_time = (now - t_last_log) / max(
                    epoch_num - ep_last_log, 1
                )
                t_last_log = now
                ep_last_log = epoch_num
                fps_total = self.batch_size / max(epoch_time, 1e-9)
                timing = getattr(self, "_last_timing", None)
                if timing is not None:
                    # host path: exact split (a2c_common.py:399-404)
                    fps_step = self.batch_size / max(
                        timing["step_time"], 1e-9
                    )
                    fps_inference = self.batch_size / max(
                        timing["play_time"], 1e-9
                    )
                elif self._rollout_time is not None:
                    # device path: rollout time calibrated once against a
                    # jitted rollout-only program (the fused epoch cannot be
                    # timed from inside); env vs inference is not separable
                    fps_inference = fps_step = self.batch_size / max(
                        self._rollout_time, 1e-9
                    )
                else:
                    fps_inference = fps_step = fps_total
                write_ppo_stats(
                    writer, metrics, frame, epoch_num, total_time, fps_total,
                    fps_step, self.value_size, fps_inference=fps_inference,
                )
                writer.add_scalar(
                    "info/explained_variance",
                    float(metrics["explained_variance"]), frame,
                )
                diag = metrics.get("_diag")
                if diag is not None:
                    for i in range(self.mini_epochs_num):
                        writer.add_scalar(
                            f"diagnostics/kl/{i}", float(diag["kl"][i]),
                            frame,
                        )
                        writer.add_scalar(
                            f"diagnostics/clip_frac/{i}",
                            float(diag["clip_frac"][i]), frame,
                        )
                    for k in ("obs_rms_mean", "obs_rms_var",
                              "value_rms_mean", "value_rms_var"):
                        if k in diag:
                            writer.add_scalar(
                                f"diagnostics/{k}", float(diag[k]), frame
                            )
                if observer is not None:
                    observer.after_epoch(metrics)
                    observer.after_print_stats(frame, epoch_num, total_time)
                if interval_writer is not None:
                    interval_writer.tick()
                if config.get("print_stats", True):
                    print(
                        f"fps total: {fps_total:.0f} epoch: {epoch_num}"
                        + (f"/{max_epochs}" if max_epochs > 0 else "")
                        + f" frames: {frame}"
                        + (
                            f" rew: {float(metrics['mean_rewards'][0]):.2f}"
                            if int(metrics.get("games_played", 0)) > 0
                            else ""
                        )
                    )
            if self_play_manager is not None:
                pushed, state = self_play_manager.update(self, state, metrics)
                if pushed:
                    # re-arm the threshold on fresh games
                    # (self_play_manager.py: algo.clear_stats())
                    state = self.clear_stats(state)
                    if observer is not None:
                        observer.after_clear_stats()
            if pbt_manager is not None:
                state = pbt_manager.step(self, state, metrics)
            if self._program_stale:
                # set_param mutated a constant baked into the compiled
                # epoch (gamma, e_clip, ...) — re-jit before the next one
                self._rebuild_stale_program()
                train_fn = self.make_train_fn(mesh=mesh)

            games_played = int(metrics.get("games_played", 0))
            mean_rewards = (
                float(metrics["mean_rewards"][0]) if games_played else None
            )
            meta = {
                "last_mean_rewards": last_mean_rewards,
                "epoch": epoch_num,
                "frame": frame,
            }

            if save_due:
                ckpt.save_checkpoint(
                    os.path.join(
                        nn_dir, f"last_{experiment_name}_ep_{epoch_num}.ckpt"
                    ),
                    state,
                    meta,
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
                    best_path, state, meta, weights=self.get_weights(state)
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
            if stop_requested:
                print("Custom stop condition met!")
                should_exit = True
            if should_exit:
                ckpt.save_checkpoint(
                    os.path.join(
                        nn_dir,
                        f"last_{experiment_name}_ep_{epoch_num}_rew_"
                        f"{mean_rewards if mean_rewards is not None else 0:.2f}.ckpt",
                    ),
                    state,
                    meta,
                    weights=self.get_weights(state),
                )
                break

        writer.flush()
        self.last_state = state
        return last_mean_rewards, epoch_num
