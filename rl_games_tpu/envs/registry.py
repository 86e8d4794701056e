"""Environment registries.

Mirrors the reference's two-level registry design
(env_configurations.py:363-371 + vecenv.py:368-417): env-name → creator
returning a vec env, and vecenv-type → constructor. The device path ('JAX')
returns a JaxVecEnv; the host path ('GYMNASIUM') wraps gymnasium vector envs.
"""

from typing import Any, Callable, Dict

from rl_games_tpu.envs.jax.base import JaxVecEnv
from rl_games_tpu.envs.jax import classic

ENV_CONFIGURATIONS: Dict[str, dict] = {}
VECENV_TYPES: Dict[str, Callable] = {}


def register(name: str, config: dict):
    """env_configurations.register (:363-371): {'vecenv_type', 'env_creator'}."""
    ENV_CONFIGURATIONS[name] = config


def register_vecenv_type(name: str, func: Callable):
    """vecenv.register (:368-374)."""
    VECENV_TYPES[name] = func


def create_vec_env(env_name: str, num_actors: int, vecenv_type: str = None,
                   **kwargs):
    """vecenv.create_vec_env (:379-391).

    Unregistered env names bind on the fly when a vecenv_type is given
    (the reference registers config-driven envs the same way,
    torch_runner.py:156-162); unknown names default to the GYMNASIUM host
    path, which covers the reference's gym env zoo (MuJoCo, classic
    control, ...)."""
    if env_name in ENV_CONFIGURATIONS:
        cfg = dict(ENV_CONFIGURATIONS[env_name])
        vtype = vecenv_type or cfg.get("vecenv_type", "JAX")
    else:
        cfg = {}
        vtype = vecenv_type or "GYMNASIUM"
    cfg.setdefault("env_id", env_name)
    return VECENV_TYPES[vtype](cfg, num_actors, **kwargs)


def get_env_info(env) -> dict:
    """env_configurations.get_env_info (:333-352) equivalent."""
    info = env.get_env_info()
    return {
        "observation_space": info.observation_space,
        "action_space": info.action_space,
        "state_space": info.state_space,
        "agents": info.agents,
        "value_size": info.value_size,
    }


def _create_jax_vecenv(cfg, num_actors, **kwargs):
    kwargs.pop("seed", None)  # device envs seed via the agent's PRNG key
    if "env_creator" not in cfg:
        raise ValueError(
            "JAX-family vecenv types need an 'env_creator': register the "
            "env name first (envs.registry.register(name, {'vecenv_type': "
            "'JAX', 'env_creator': ...})); on-the-fly binding by "
            "vecenv_type alone only works for host backends that resolve "
            "the name themselves (GYMNASIUM/DMCONTROL/...)"
        )
    env = cfg["env_creator"](**{**cfg.get("env_config", {}), **kwargs})
    return JaxVecEnv(
        env, num_actors, max_episode_steps=cfg.get("max_episode_steps")
    )


def _create_gymnasium_vecenv(cfg, num_actors, **kwargs):
    from rl_games_tpu.envs.host.gymnasium_env import GymnasiumVecEnv

    return GymnasiumVecEnv(
        cfg["env_id"], num_actors, **{**cfg.get("env_config", {}), **kwargs}
    )


def _create_cpu_vecenv(cfg, num_actors, **kwargs):
    from rl_games_tpu.envs.host.cpuenv import CpuVecEnv

    return CpuVecEnv(
        cfg["env_id"], num_actors, **{**cfg.get("env_config", {}), **kwargs}
    )


register_vecenv_type("JAX", _create_jax_vecenv)
register_vecenv_type("GYMNASIUM", _create_gymnasium_vecenv)
register_vecenv_type("CPUENV", _create_cpu_vecenv)

# --- built-in device-resident envs (the analog of env_configurations.py's
# built-in table) ---

register("CartPole-v1", {"vecenv_type": "JAX", "env_creator": classic.CartPole})
register("Pendulum-v1", {"vecenv_type": "JAX", "env_creator": classic.Pendulum})
register(
    "MountainCarContinuous-v0",
    {"vecenv_type": "JAX", "env_creator": classic.MountainCarContinuous},
)


def _create_ant2d():
    from rl_games_tpu.envs.jax.ant2d import Ant2D

    return Ant2D()


register("Ant2D", {"vecenv_type": "JAX", "env_creator": _create_ant2d})


def _create_ant3d():
    from rl_games_tpu.envs.jax.ant3d import Ant3D

    return Ant3D()


register("Ant3D", {"vecenv_type": "JAX", "env_creator": _create_ant3d})


def _create_humanoid3d():
    from rl_games_tpu.envs.jax.humanoid3d import Humanoid3D

    return Humanoid3D()


register(
    "Humanoid3D", {"vecenv_type": "JAX", "env_creator": _create_humanoid3d}
)


def _create_cheetah2d():
    from rl_games_tpu.envs.jax.locomotion2d import Cheetah2D

    return Cheetah2D()


register("Cheetah2D", {"vecenv_type": "JAX", "env_creator": _create_cheetah2d})


def _create_walker2d():
    from rl_games_tpu.envs.jax.locomotion2d import Walker2D

    return Walker2D()


register("Walker2D", {"vecenv_type": "JAX", "env_creator": _create_walker2d})


def _create_arm2d(**kwargs):
    from rl_games_tpu.envs.jax.arm2d import Arm2D

    return Arm2D(**kwargs)


register("Arm2D", {"vecenv_type": "JAX", "env_creator": _create_arm2d})


def _create_grasp2d(**kwargs):
    from rl_games_tpu.envs.jax.arm2d import Grasp2D

    return Grasp2D(**kwargs)


register("Grasp2D", {"vecenv_type": "JAX", "env_creator": _create_grasp2d})


def _create_pixel_catcher(**kwargs):
    from rl_games_tpu.envs.jax.pixel import PixelCatcher

    return PixelCatcher(**kwargs)


# device-resident pixel env: the in-tree CNN-path learning fixture (the
# Atari/envpool role for images; envs/jax/pixel.py)
register(
    "PixelCatcher-v0",
    {"vecenv_type": "JAX", "env_creator": _create_pixel_catcher},
)


def _create_device_pong(**kwargs):
    from rl_games_tpu.envs.jax.pong import DevicePong

    return DevicePong(**kwargs)


# the Atari-Pong-class benchmark env (envs/jax/pong.py): first-to-21
# scoring on an 84x84 on-device frame — the headline row analog of the
# reference's envpool Pong-v5 (docs/ENVPOOL.md:65)
register(
    "DevicePong-v0",
    {"vecenv_type": "JAX", "env_creator": _create_device_pong},
)


def _create_device_breakout(**kwargs):
    from rl_games_tpu.envs.jax.breakout import DeviceBreakout

    return DeviceBreakout(**kwargs)


# the Atari-Breakout-class benchmark env (envs/jax/breakout.py): 6x12
# brick wall with ALE row scoring, 5 lives, board refill — the second
# Atari headline row analog (docs/ENVPOOL.md:66)
register(
    "DeviceBreakout-v0",
    {"vecenv_type": "JAX", "env_creator": _create_device_breakout},
)

# --- named gym-id builtins (the reference's env_configurations table,
# env_configurations.py:198-331; unknown names also fall back to the
# GYMNASIUM host bridge, so these rows document the supported zoo) ---
for _gym_id in (
    "LunarLander-v3",
    "LunarLanderContinuous-v3",
    "BipedalWalker-v3",
    "BipedalWalkerHardcore-v3",
    "CarRacing-v3",
    "Acrobot-v1",
    "MountainCar-v0",
    "Ant-v5",
    "HalfCheetah-v5",
    "Hopper-v5",
    "Humanoid-v5",
    "Walker2d-v5",
    "Reacher-v5",
):
    register(_gym_id, {"vecenv_type": "GYMNASIUM"})

# native C++ stepper exclusives (no gymnasium analog)
register("Hopper2D-v0", {"vecenv_type": "CPUENV"})


def _create_dmcontrol_vecenv(cfg, num_actors, **kwargs):
    from rl_games_tpu.envs.host.dm_control_env import create_dmcontrol_vecenv

    return create_dmcontrol_vecenv(cfg, num_actors, **kwargs)


register_vecenv_type("DMCONTROL", _create_dmcontrol_vecenv)

# the reference's dm_control zoo (configs/dm_control/*.yaml reach these
# envpool ids through Envpool(flatten_obs=True); here they bind to the
# in-tree dm_control suite adapter)
for _dmc_id in (
    "AcrobotSwingup-v1", "BallInCupCatch-v1", "CartpoleBalance-v1",
    "CartpoleSwingup-v1", "CheetahRun-v1", "FishSwim-v1", "HopperHop-v1",
    "HopperStand-v1", "HumanoidRun-v1", "HumanoidStand-v1",
    "HumanoidWalk-v1", "ManipulatorBringBall-v1", "PendulumSwingup-v1",
    "ReacherEasy-v1", "ReacherHard-v1", "WalkerRun-v1", "WalkerStand-v1",
    "WalkerWalk-v1",
):
    register(_dmc_id, {"vecenv_type": "DMCONTROL"})


# external-simulator bindings the reference reaches through out-of-image
# packages (envpool C++, StarCraft II, MuJoCo-Warp, ManiSkill, MyoSuite,
# brax, minigrid): registered so their configs resolve to a clear error
# naming the missing dependency instead of a gym.make failure
# (the reference fails the same way at its lazy imports,
# vecenv.py:196-219 / envs/*.py import sites)
def _missing_sim(name, package, hint=""):
    def create(cfg, num_actors, **kwargs):
        raise ImportError(
            f"env '{name}' needs the external '{package}' simulator, which "
            f"is not in this image. The config schema and network build are "
            f"covered by tests/test_ref_configs.py.{hint}"
        )

    return create


for _sim_name, _pkg, _hint in (
    ("smac", "SMAC (StarCraft II)",
     " Masked multi-agent machinery runs on the device fixtures "
     "(cooperative_gather, test_masked_env)."),
    ("smac_cnn", "SMAC (StarCraft II)", ""),
    ("smac_v2", "SMACv2 (StarCraft II)", ""),
    ("maniskill", "mani_skill", ""),
    ("myo_gym", "myosuite", ""),
    ("envpool", "envpool",
     " The GYMNASIUM / CPUENV / DMCONTROL backends cover its env zoo "
     "in-tree."),
    ("brax", "brax",
     " The device-resident JAX envs (Ant2D, Cheetah2D, Walker2D) are the "
     "in-tree brax-class analogs."),
    ("minigrid", "minigrid", ""),
):
    _vt = f"_MISSING_{_sim_name.upper()}"
    register_vecenv_type(_vt, _missing_sim(_sim_name, _pkg, _hint))
    register(_sim_name, {"vecenv_type": _vt})

for _mjlab_task in ("mjlab_go1_velocity", "mjlab_g1_velocity",
                    "mjlab_lift_cube_yam", "mjlab_wujihand_reorient",
                    "mjlab"):
    _vt = f"_MISSING_{_mjlab_task.upper()}"
    register_vecenv_type(_vt, _missing_sim(_mjlab_task, "mjlab (MuJoCo-Warp)"))
    register(_mjlab_task, {"vecenv_type": _vt})


def _create_multiagent_vecenv(cfg, num_actors, **kwargs):
    from rl_games_tpu.envs.jax.multiagent import MultiAgentJaxVecEnv

    kwargs.pop("seed", None)
    env = cfg["env_creator"](**{**cfg.get("env_config", {}), **kwargs})
    return MultiAgentJaxVecEnv(
        env, num_actors, max_episode_steps=cfg.get("max_episode_steps")
    )


register_vecenv_type("JAX_MULTIAGENT", _create_multiagent_vecenv)


def _create_coop_gather():
    from rl_games_tpu.envs.jax.multiagent import CooperativeGather

    return CooperativeGather()


register(
    "cooperative_gather",
    {"vecenv_type": "JAX_MULTIAGENT", "env_creator": _create_coop_gather},
)


def _create_test_env(name="TestRnnEnv-v0", multi_obs_space=False,
                     aux_loss=False, **kwargs):
    """The reference's `test_env` binding (env_configurations.py): one
    flag-parameterized fixture env; reference env_config keys pass
    through (hide_object, min_dist, max_dist, apply_dist_reward,
    multi_discrete_space, multi_head_value, use_central_value)."""
    from rl_games_tpu.envs.jax import test_envs

    kwargs.pop("seed", None)
    if multi_obs_space:
        kwargs.pop("use_central_value", None)
        return test_envs.DictObsMemoryEnv(aux_loss=aux_loss, **kwargs)
    return test_envs.MemoryEnv(**kwargs)


def _create_masked_velocity_vecenv(cfg, num_actors, **kwargs):
    """CartPoleMaskedVelocity-v1 — CartPole with velocity obs zeroed
    (env_configurations.py + wrappers.MaskVelocityWrapper :581-601)."""
    from functools import partial

    from rl_games_tpu.envs.host.gymnasium_env import GymnasiumVecEnv
    from rl_games_tpu.envs.host.wrappers import MaskVelocityWrapper

    wrapper = partial(MaskVelocityWrapper, name="CartPole-v1")
    return GymnasiumVecEnv(
        "CartPole-v1", num_actors, wrappers=[wrapper],
        **{**cfg.get("env_config", {}), **kwargs},
    )


register(
    "CartPoleMaskedVelocity-v1",
    {"vecenv_type": "MASKED_VELOCITY_CARTPOLE"},
)
register_vecenv_type(
    "MASKED_VELOCITY_CARTPOLE", _create_masked_velocity_vecenv
)


def _atari_ale_id(name: str) -> str:
    """Map reference-era Atari ids — 'BreakoutNoFrameskip-v4' (gym),
    'Breakout-v5' (envpool) — to the installed ale_py registrations
    ('ALE/Breakout-v5')."""
    if name.startswith("ALE/"):
        return name
    base = name
    for suffix in ("NoFrameskip-v4", "Deterministic-v4", "-v4", "-v5", "-v0"):
        if base.endswith(suffix):
            base = base[: -len(suffix)]
            break
    return f"ALE/{base}-v5"


def _create_atari_vecenv(cfg, num_actors, **kwargs):
    """Deepmind-wrapped Atari over the gymnasium bridge (the reference's
    atari factory fns, common/wrappers.py:663-721; requires ale_py).

    Reference atari configs put the gym id in env_config['name'] and the
    wrapper knobs (skip, episode_life, ...) alongside it
    (configs/atari/ppo_breakout.yaml) — honor both here."""
    import functools

    from rl_games_tpu.envs.host.gymnasium_env import GymnasiumVecEnv
    from rl_games_tpu.envs.host.wrappers import wrap_deepmind

    try:
        import ale_py
        import gymnasium as gym

        gym.register_envs(ale_py)
    except ImportError as e:
        raise ImportError(
            "Atari envs need the ale_py package (not present in this "
            "image); the config and wrapper stack are ready for it"
        ) from e

    name = kwargs.pop("name", None) or cfg["env_id"]
    wrap_kwargs = {
        k: kwargs.pop(k)
        for k in ("skip", "episode_life", "clip_rewards", "frame_stack",
                  "scale", "warp")
        if k in kwargs
    }
    kwargs.setdefault(
        "wrappers", [functools.partial(wrap_deepmind, **wrap_kwargs)]
    )
    # ALE v5 ids frameskip internally and default to sticky actions; the
    # reference's NoFrameskip-v4 semantics are frameskip=1 (MaxAndSkipEnv
    # does the skipping) with sticky actions off
    kwargs.setdefault("frameskip", 1)
    kwargs.setdefault("repeat_action_probability", 0.0)
    return GymnasiumVecEnv(_atari_ale_id(name), num_actors, **kwargs)


register_vecenv_type("ATARI", _create_atari_vecenv)


def _create_multiwalker_vecenv(cfg, num_actors, **kwargs):
    """PettingZoo SISL multiwalker (the reference's multiwalker_env binding,
    env_configurations.py + envs/multiwalker.py)."""
    from rl_games_tpu.envs.host.pettingzoo_env import MultiWalkerVecEnv

    merged = {**cfg.get("env_config", {}), **kwargs}
    merged.pop("env_name", None)
    return MultiWalkerVecEnv(num_actors, **merged)


register("multiwalker_env", {"vecenv_type": "MULTIWALKER"})
register_vecenv_type("MULTIWALKER", _create_multiwalker_vecenv)


def _create_connect4_vecenv(cfg, num_actors, **kwargs):
    """Connect-four self-play over pettingzoo.classic (the reference's
    ma/ppo_connect4_self_play.yaml 'connect4_env' binding — whose env
    module is absent from the reference tree; runnable here). The opponent
    network is built from env_config['config_path'] (the training YAML,
    mirroring the reference config's own key) or an injected
    'network_params' dict."""
    import os

    from rl_games_tpu.envs.host.connect4_env import Connect4SelfPlayVecEnv

    merged = {**cfg.get("env_config", {}), **kwargs}
    for k in ("name", "env_name", "self_play", "is_human", "random_agent"):
        merged.pop(k, None)
    network_params = merged.pop("network_params", None)
    config_path = merged.pop("config_path", None)
    if network_params is None and config_path:
        import yaml

        path = config_path
        if not os.path.exists(path):
            repo_root = os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            )
            path = os.path.join(repo_root, config_path)
        with open(path) as f:
            network_params = yaml.safe_load(f)["params"]
    return Connect4SelfPlayVecEnv(
        num_actors, network_params=network_params, **merged
    )


register("connect4_env", {"vecenv_type": "CONNECT4"})
register_vecenv_type("CONNECT4", _create_connect4_vecenv)


def _create_selfplay_vecenv(cfg, num_actors, **kwargs):
    """Self-play device env (embedded opponent weights; the
    RayWorker.set_weights analog). Same contract as _create_jax_vecenv:
    env_config/kwargs feed the env constructor, max_episode_steps is
    honored, and other JAX_SELFPLAY registrations supply env_creator."""
    from rl_games_tpu.envs.jax.selfplay import (
        CompetitiveForage, SelfPlayJaxVecEnv,
    )

    kwargs.pop("seed", None)  # device envs seed via the agent's PRNG key
    creator = cfg.get("env_creator", CompetitiveForage)
    env = creator(**{**cfg.get("env_config", {}), **kwargs})
    return SelfPlayJaxVecEnv(
        env, num_actors, max_episode_steps=cfg.get("max_episode_steps")
    )


register("competitive_forage", {"vecenv_type": "JAX_SELFPLAY"})
register_vecenv_type("JAX_SELFPLAY", _create_selfplay_vecenv)


def register_test_envs():
    from rl_games_tpu.envs.jax import test_envs

    register(
        "test_env",
        {"vecenv_type": "JAX", "env_creator": _create_test_env},
    )
    register(
        "test_rnn_env",
        {"vecenv_type": "JAX", "env_creator": test_envs.MemoryEnv},
    )
    register(
        "test_asymmetric_env",
        {"vecenv_type": "JAX", "env_creator": test_envs.AsymmetricEnv},
    )
    register(
        "test_masked_env",
        {"vecenv_type": "JAX", "env_creator": test_envs.MaskedMemoryEnv},
    )
    register(
        "test_dict_obs_env",
        {"vecenv_type": "JAX", "env_creator": test_envs.DictObsMemoryEnv},
    )
    register(
        "test_asymmetric_continuous_env",
        {
            "vecenv_type": "JAX",
            "env_creator": test_envs.ContinuousAsymmetricEnv,
        },
    )


try:  # keep test envs always available, like rl_games.envs.test
    register_test_envs()
except ImportError:
    pass
