"""Players: inference/evaluation loops.

Re-design of rl_games/common/player.py (BasePlayer.run :274-393) +
algos_torch/players.py for device-resident envs: the evaluation loop is a
jitted lax.scan stepping the vectorized env with deterministic (or sampled)
actions, collecting completed-episode returns in a ring meter until
``games_num`` episodes finish.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rl_games_tpu.algos.ppo import Meters, meters_init, meters_mean, meters_update
from rl_games_tpu.common import obs_utils
from rl_games_tpu.common.tr_helpers import rescale_actions
from rl_games_tpu.envs import registry as env_registry
from rl_games_tpu.envs.spaces import Box, actions_num_of, obs_shape_of
from rl_games_tpu.models import model_builder
from rl_games_tpu.utils import checkpoint as ckpt


class BasePlayer:
    def __init__(self, params, vec_env=None):
        self.params = params
        config = params["config"]
        self.config = config
        player_cfg = config.get("player", {}) or {}
        self.player_cfg = player_cfg
        self.num_actors = player_cfg.get("num_actors", config.get("num_actors", 16))
        self.games_num = player_cfg.get("games_num", 200)
        self.max_steps = player_cfg.get("max_steps", 27000)
        self.deterministic = player_cfg.get(
            "deterministic", player_cfg.get("determenistic", True)
        )
        self.seed = config.get("seed", 7)
        # masked-action inference (players.py get_masked_action, the
        # reference's use_action_masks play path)
        self.use_action_masks = config.get("use_action_masks", False)

        if vec_env is not None:
            self.vec_env = vec_env
        else:
            self.vec_env = env_registry.create_vec_env(
                config["env_name"], self.num_actors,
                vecenv_type=config.get("vecenv_type"),
                **config.get("env_config", {})
            )
        info = self.vec_env.get_env_info()
        self.env_info = info
        self.value_size = info.value_size
        self.obs_shape = obs_shape_of(info.observation_space)
        self.actions_num = actions_num_of(info.action_space)
        self.is_continuous = isinstance(info.action_space, Box)

        self.model = model_builder.ModelBuilder().load(
            params,
            actions_num=self.actions_num,
            input_shape=self.obs_shape
            if not (isinstance(self.obs_shape, dict)
                    and "obs" in self.obs_shape)
            else self.obs_shape["obs"],
            value_size=self.value_size,
            normalize_input=config.get("normalize_input", False),
            normalize_value=config.get("normalize_value", False),
            obs_shape=self.obs_shape,
        )
        self.is_host_env = bool(getattr(self.vec_env, "is_host_env", False))
        self.host_inference = config.get("host_inference_device", "auto")
        rng = jax.random.PRNGKey(self.seed)
        if self.is_host_env:
            obs = self._to_device_obs(self.vec_env.reset())
        else:
            _, obs = self.vec_env.reset(rng)
        example = self._actor_obs(obs)
        self.net_params, self.norm = self.model.init(rng, example)
        # self-play device envs late-bind the opponent-seat architecture
        # (envs/jax/selfplay.py bind_policy) — mirror the trainer's wiring
        # (algos/ppo.py:316-317) so --play works on self-play envs
        if hasattr(self.vec_env, "bind_policy"):
            self.vec_env.bind_policy(self.model)

    def restore(self, checkpoint_path: str):
        """players.py:71-79 — load model weights from a training checkpoint.
        Reference torch checkpoints (.pth/.pt) import transparently
        (utils/torch_import)."""
        if checkpoint_path.endswith((".pth", ".pt")):
            from rl_games_tpu.utils.torch_import import import_a2c_checkpoint

            self.net_params, self.norm = import_a2c_checkpoint(
                checkpoint_path, self.net_params, self.norm,
                self.params["network"], self.obs_shape,
            )
            return
        example = {"params": self.net_params, "norm": self.norm}
        payload, _ = ckpt.load_checkpoint_weights(checkpoint_path, example)
        self.net_params = payload["params"]
        self.norm = payload["norm"]

    def make_export_policy(self):
        """Deterministic obs → env-space action closure for --export
        (utils/export; normalizers + action rescale baked in)."""
        from rl_games_tpu.utils.export import make_deterministic_policy_fn

        return make_deterministic_policy_fn(
            self.model, self.net_params, self.norm,
            self.env_info.action_space if self.is_continuous else None,
        )

    def _actor_obs(self, obs):
        """Same guard as the trainer (algos/ppo.py _actor_obs): only the
        {'obs','states'} asymmetric wrapper unwraps — a genuine dict
        observation space passes through whole (custom networks)."""
        if isinstance(obs, dict) and set(obs.keys()) <= {"obs", "states"}:
            return obs["obs"]
        return obs

    @staticmethod
    def _to_device_obs(o):
        return obs_utils.to_device_obs(o)

    def override_sigma(self, sigma: float):
        """--sigma at play time (_override_sigma, torch_runner.py:52-60)."""
        blocked = obs_utils.sigma_override_blocked(
            self.is_continuous, self.params.get("network", {})
        )
        if blocked:
            print(blocked)
            return
        self.net_params = obs_utils.fill_sigma_leaves(self.net_params, sigma)

    def _env_actions(self, actions):
        if not self.is_continuous:
            return actions
        space = self.env_info.action_space
        a = jnp.clip(actions, -1.0, 1.0)
        if np.isfinite(space.low).all() and np.isfinite(space.high).all():
            return rescale_actions(
                np.asarray(space.low), np.asarray(space.high), a
            )
        return a

    # -- evaluation mode (player.py:119-156): watch a directory for fresh
    # training checkpoints and hot-reload weights between rollout chunks --
    def maybe_load_new_checkpoint(self):
        import glob
        import os

        dir_to_monitor = self.player_cfg.get("dir_to_monitor")
        if not dir_to_monitor:
            return False
        ckpts = sorted(
            glob.glob(os.path.join(dir_to_monitor, "*.ckpt")),
            key=os.path.getmtime,
        )
        if not ckpts:
            return False
        latest = ckpts[-1]
        mtime = os.path.getmtime(latest)
        if getattr(self, "_last_ckpt", None) == (latest, mtime):
            return False
        try:
            # tolerate partial/corrupt files: retry logic inside, and any
            # failure leaves current weights in place (player.py:137-156)
            self.restore(latest)
            self._last_ckpt = (latest, mtime)
            print(f"evaluation: reloaded checkpoint {latest}")
            return True
        except Exception as e:
            print(f"evaluation: failed to load {latest}: {e}")
            return False

    def _move_host_params(self, dev):
        """Relocate policy weights for host-side inference
        (common/host_inference.py); SACPlayer overrides with its own
        param set."""
        self.net_params, self.norm = jax.device_put(
            (self.net_params, self.norm), dev
        )

    def _host_run(self, games_num: int, act_fn):
        """Host-env evaluation loop (the reference player runs everywhere,
        common/player.py:274-393): jitted policy inference, non-jittable
        env stepping, episode accounting on the host. Inference runs on
        the host CPU backend when the default backend is a remote
        accelerator (common/host_inference.py) — per-step dispatch
        latency, not compute, dominates eval through a relay."""
        from rl_games_tpu.common.host_inference import (
            device_ctx, resolve_rollout_device,
        )

        dev = resolve_rollout_device(
            getattr(self, "host_inference", "auto")
        )
        if dev is not None:
            self._move_host_params(dev)
        with device_ctx(dev):
            obs = self._to_device_obs(self.vec_env.reset())
            n = self.num_actors
            cur = np.zeros((n, self.value_size), np.float32)
            returns = []
            rng = jax.random.PRNGKey(self.seed + 1)
            steps = 0
            while len(returns) < games_num and steps < self.max_steps:
                rng, akey = jax.random.split(rng)
                if self.use_action_masks:
                    actions = act_fn(
                        akey, obs,
                        jnp.asarray(self.vec_env.get_action_masks()),
                    )
                else:
                    actions = act_fn(akey, obs)
                next_obs, rewards, dones, infos = self.vec_env.step(
                    np.asarray(actions)
                )
                rewards = np.asarray(rewards, np.float32).reshape(n, -1)
                cur += rewards
                for i in np.nonzero(np.asarray(dones))[0]:
                    returns.append(cur[i].copy())
                    cur[i] = 0.0
                obs = self._to_device_obs(next_obs)
                steps += 1
        mean_reward = float(np.mean([r[0] for r in returns])) if returns else 0.0
        print(f"av reward: {mean_reward:.2f} games played: {len(returns)}")
        return mean_reward

    # -- the two action seams subclasses override (SACPlayer) -------------
    def _play_actions(self, key, obs, env_state=None):
        """env-space actions for the DEVICE eval loop (jit-traced)."""
        mask_kwargs = {}
        if self.use_action_masks:
            mask_kwargs["action_masks"] = self.vec_env.get_action_masks(
                env_state
            )
        res = self.model.forward_play(
            self.net_params, self.norm, key, self._actor_obs(obs),
            deterministic=self.deterministic, **mask_kwargs,
        )
        return self._env_actions(res["actions"])

    def _make_host_act(self):
        """(key, obs[, masks]) -> env actions closure for the host loop."""
        def fwd(p, nm, k, o, masks=None):
            kwargs = {} if masks is None else {"action_masks": masks}
            return self._env_actions(
                self.model.forward_play(
                    p, nm, k, self._actor_obs(o),
                    deterministic=self.deterministic, **kwargs,
                )["actions"]
            )

        jit_act = jax.jit(fwd)
        return lambda k, o, *m: jit_act(self.net_params, self.norm, k, o, *m)

    def run(self, games_num: Optional[int] = None, **_):
        games_num = games_num or self.games_num
        if self.player_cfg.get("evaluation"):
            self.maybe_load_new_checkpoint()
        if self.is_host_env:
            return self._host_run(games_num, self._make_host_act())
        return self._device_run(games_num)

    def _device_run(self, games_num: int):
        """Jitted device eval: one lax.scan over steps, meters on device.
        Shared by every player — subclasses only override _play_actions."""
        rng = jax.random.PRNGKey(self.seed + 1)
        rng, ekey = jax.random.split(rng)
        env_state, obs = self.vec_env.reset(ekey)
        if hasattr(self.vec_env, "init_opponent"):
            # self-play eval defaults to a mirror match: the restored
            # checkpoint fills every opponent seat (the trainer's env_state
            # carries trained opponents; a fresh player env has none)
            env_state = self.vec_env.init_opponent(
                env_state, {"params": self.net_params, "norm": self.norm}
            )
        n = self.num_actors
        meters = meters_init(max(games_num, 1), self.value_size)

        def step(carry, _):
            env_state, obs, rng, cur_rew, meters = carry
            rng, akey = jax.random.split(rng)
            env_state, obs, rewards, dones, infos = self.vec_env.step(
                env_state, self._play_actions(akey, obs, env_state)
            )
            if rewards.ndim == 1:
                rewards = rewards[:, None]
            cur_rew = cur_rew + rewards
            meters = meters_update(meters, cur_rew, dones.astype(bool))
            cur_rew = cur_rew * (1.0 - dones.astype(jnp.float32))[:, None]
            return (env_state, obs, rng, cur_rew, meters), dones.sum()

        steps_needed = min(
            self.max_steps,
            (self.vec_env.max_episode_steps or 1000)
            * (games_num // n + 2),
        )

        @jax.jit
        def rollout(carry):
            return jax.lax.scan(step, carry, None, length=steps_needed)

        carry = (env_state, obs, rng, jnp.zeros((n, self.value_size)), meters)
        carry, dones_per_step = rollout(carry)
        meters = carry[4]
        games_played = int(meters.count)
        mean_reward = float(meters_mean(meters)[0]) if games_played else 0.0
        print(
            f"av reward: {mean_reward:.2f} games played: {games_played}"
        )
        return mean_reward


class PpoPlayer(BasePlayer):
    pass


class SACPlayer(BasePlayer):
    """SAC evaluation (players.py SACPlayer): deterministic action =
    tanh(mu) rescaled to env bounds."""

    def override_sigma(self, sigma: float):
        """--sigma is a fixed-sigma A2C knob; the SAC actor has no sigma
        parameter to overwrite. The reference no-ops with a message
        (torch_runner.py:52-60 hasattr guard) — match that, instead of
        crashing on BasePlayer's net_params."""
        print("Cannot set new sigma: SAC policy has no fixed sigma parameter")

    def __init__(self, params, vec_env=None):
        from rl_games_tpu.models.sac import build_sac_networks
        from rl_games_tpu.ops.running_stats import rms_init

        self.params = params
        config = params["config"]
        self.config = config
        player_cfg = config.get("player", {}) or {}
        self.player_cfg = player_cfg
        self.num_actors = player_cfg.get("num_actors", config.get("num_actors", 16))
        self.games_num = player_cfg.get("games_num", 200)
        self.max_steps = player_cfg.get("max_steps", 27000)
        self.deterministic = player_cfg.get("deterministic", True)
        self.seed = config.get("seed", 7)
        self.use_action_masks = False  # SAC is continuous-only

        if vec_env is not None:
            self.vec_env = vec_env
        else:
            self.vec_env = env_registry.create_vec_env(
                config["env_name"], self.num_actors,
                vecenv_type=config.get("vecenv_type"),
                **config.get("env_config", {})
            )
        info = self.vec_env.get_env_info()
        self.env_info = info
        self.value_size = info.value_size
        self.obs_shape = obs_shape_of(info.observation_space)
        self.action_dim = info.action_space.shape[0]
        self.is_continuous = True
        space = info.action_space
        self.action_scale = (np.asarray(space.high) - np.asarray(space.low)) / 2.0
        self.action_bias = (np.asarray(space.high) + np.asarray(space.low)) / 2.0

        self.actor, _ = build_sac_networks(params["network"], self.action_dim)
        self.is_host_env = bool(getattr(self.vec_env, "is_host_env", False))
        rng = jax.random.PRNGKey(self.seed)
        if self.is_host_env:
            obs = self._to_device_obs(self.vec_env.reset())
        else:
            _, obs = self.vec_env.reset(rng)
        example = self._actor_obs(obs)
        self.actor_params = self.actor.init(rng, example)
        self.host_inference = config.get("host_inference_device", "auto")
        self.obs_rms = (
            rms_init(self.obs_shape)
            if config.get("normalize_input", False)
            else None
        )

    def restore(self, checkpoint_path: str):
        if checkpoint_path.endswith((".pth", ".pt")):
            # reference SAC torch checkpoint (utils/torch_import)
            from rl_games_tpu.utils import torch_import as ti

            raw = ti.load_torch_checkpoint_raw(checkpoint_path)
            if "model" in raw and "actor" not in raw:
                raw = raw["model"]
            new_actor, _, _, new_rms = ti.convert_sac_weights(
                raw, self.actor_params, None, None, self.obs_rms,
            )
            self.actor_params = new_actor
            self.obs_rms = new_rms
            return
        example = {
            "actor_params": self.actor_params,
            "critic_params": None,
            "obs_rms": self.obs_rms,
        }
        payload, _ = ckpt.load_checkpoint_weights(checkpoint_path, example)
        self.actor_params = payload["actor_params"]
        self.obs_rms = payload["obs_rms"]

    def make_export_policy(self):
        """Deterministic SAC policy for --export: normalize → actor mu →
        tanh → rescale to env bounds."""
        from rl_games_tpu.ops.running_stats import rms_normalize

        def policy(obs_vec):
            if self.obs_rms is not None:
                obs_vec = rms_normalize(self.obs_rms, obs_vec)
            mu, _ = self.actor.apply(self.actor_params, obs_vec)
            return jnp.clip(
                jnp.tanh(mu) * self.action_scale + self.action_bias,
                self.env_info.action_space.low,
                self.env_info.action_space.high,
            )

        return policy

    def _sac_actions(self, akey, obs_vec):
        from rl_games_tpu.models.sac import SACActor
        from rl_games_tpu.ops.running_stats import rms_normalize

        if self.obs_rms is not None:
            obs_vec = rms_normalize(self.obs_rms, obs_vec)
        mu, std = self.actor.apply(self.actor_params, obs_vec)
        if self.deterministic:
            actions = jnp.tanh(mu)
        else:
            actions, _ = SACActor.sample(akey, mu, std)
        return jnp.clip(
            actions * self.action_scale + self.action_bias,
            self.env_info.action_space.low,
            self.env_info.action_space.high,
        )

    # the shared BasePlayer loops drive these two seams
    def _play_actions(self, key, obs, env_state=None):
        return self._sac_actions(key, self._actor_obs(obs))

    def _make_host_act(self):
        self.value_size = 1
        return jax.jit(lambda k, o: self._sac_actions(k, self._actor_obs(o)))

    def _move_host_params(self, dev):
        self.actor_params, self.obs_rms = jax.device_put(
            (self.actor_params, self.obs_rms), dev
        )
