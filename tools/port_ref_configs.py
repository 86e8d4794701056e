"""Port the reference's YAML config zoo into rl_games_tpu/configs/ref/.

The schema maps field-for-field (README: config surface parity); this tool
rewrites only the ENV BINDING — the reference reaches envs through
Ray/envpool/brax backends, this framework through its GYMNASIUM host bridge,
the native CPUENV stepper, or device-resident JAX envs — plus drops
torch-only toggles. Hyperparameters are preserved verbatim: they carry the
learning-curve parity.

Run from the repo root:  python tools/port_ref_configs.py
"""

import os

import yaml

REF = "/root/reference/rl_games/configs"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "rl_games_tpu", "configs", "ref")

# torch/infra-only keys with no analog here
DROP_CONFIG_KEYS = ("multi_gpu", "device", "ppo_device", "population_based_training",
                    "pbt_idx", "zero_rnn_on_done")
DROP_PARAM_KEYS = ("torch_threads", "device", "devices")

# families: (subdir, filenames, transform kind)
PORTS = {
    "mujoco": [
        ("ant.yaml", "gym"), ("ant_envpool.yaml", "gym"), ("ant_ray.yaml", "gym"),
        ("halfcheetah.yaml", "gym"), ("halfcheetah_envpool.yaml", "gym"),
        ("halfcheetah_ray.yaml", "gym"),
        ("hopper.yaml", "gym"), ("hopper_envpool.yaml", "gym"),
        ("humanoid.yaml", "gym"), ("humanoid_envpool.yaml", "gym"),
        ("humanoid_ray.yaml", "gym"),
        ("sac_ant.yaml", "gym"), ("sac_ant_envpool.yaml", "gym"),
        ("sac_ant_tuned.yaml", "gym"),
        ("sac_halfcheetah.yaml", "gym"), ("sac_halfcheetah_envpool.yaml", "gym"),
        ("sac_humanoid.yaml", "gym"), ("sac_humanoid_envpool.yaml", "gym"),
        ("walker2d.yaml", "gym"), ("walker2d_envpool.yaml", "gym"),
    ],
    "test": [
        ("test_discrete.yaml", "test"),
        ("test_rnn.yaml", "test"),
        ("test_rnn_multidiscrete.yaml", "test"),
        ("test_rnn_multidiscrete_mhv.yaml", "test"),
        ("test_discrete_multidiscrete_mhv.yaml", "test"),
        ("test_asymmetric_continuous.yaml", "test_asym_cont"),
        ("test_asymmetric_discrete.yaml", "test"),
        ("test_asymmetric_discrete_mhv.yaml", "test"),
        ("test_discrite_testnet_aux_loss.yaml", "test_auxnet"),
        ("test_asymmetric_discrete_mhv_mops.yaml", "test_mops"),
        ("test_ppo_walker_truncated_time.yaml", "gym"),
    ],
    "atari": [
        ("ppo_breakout.yaml", "atari"), ("ppo_breakout_envpool.yaml", "atari"),
        ("ppo_breakout_torch_impala.yaml", "atari"),
        ("ppo_gopher.yaml", "atari"), ("ppo_pacman_torch.yaml", "atari"),
        ("ppo_pacman_torch_rnn.yaml", "atari"),
        ("ppo_pong.yaml", "atari"), ("ppo_pong_envpool.yaml", "atari"),
        ("ppo_pong_envpool_resnet.yaml", "atari"),
        ("ppo_pong_gymnasium.yaml", "atari"),
        ("ppo_space_invaders_resnet.yaml", "atari"),
        ("ppo_space_invaders_torch.yaml", "atari"),
    ],
    "brax": [
        ("ppo_ant.yaml", "ant2d"), ("sac_ant.yaml", "ant2d"),
        ("ppo_halfcheetah.yaml", "cheetah2d"),
        ("ppo_humanoid.yaml", "walker2d"),
        ("sac_humanoid.yaml", "walker2d"),
        ("ppo_ur5e.yaml", "arm2d"), ("ppo_grasp.yaml", "grasp2d"),
    ],
    # external-simulator families (StarCraft II, MuJoCo-Warp, ManiSkill,
    # MyoSuite, minigrid, brax arm tasks): hyperparameter/network schemas
    # port verbatim ('keep'); the smoke test builds + forwards the network
    # at representative shapes (the simulators are not in this image)
    "smac/v1": [
        (f, "keep") for f in (
            "10m_vs_11m_torch.yaml", "27m_vs_30m_cv.yaml",
            "27m_vs_30m_torch.yaml", "2m_vs_1z.yaml", "2m_vs_1z_torch.yaml",
            "2s_vs_1c.yaml", "3m_cnn_torch.yaml", "3m_torch.yaml",
            "3m_torch_cv.yaml", "3m_torch_cv_joint.yaml",
            "3m_torch_cv_rnn.yaml", "3m_torch_rnn.yaml", "3m_torch_sa.yaml",
            "3m_torch_sparse.yaml", "3s5z_vs_3s6z_torch.yaml",
            "3s5z_vs_3s6z_torch_cv.yaml", "3s_vs_4z.yaml", "3s_vs_5z.yaml",
            "3s_vs_5z_cv.yaml", "3s_vs_5z_cv_rnn.yaml",
            "3s_vs_5z_torch_lstm.yaml", "3s_vs_5z_torch_lstm2.yaml",
            "5m_vs_6m_rnn.yaml", "5m_vs_6m_rnn_cv.yaml", "5m_vs_6m_sa.yaml",
            "5m_vs_6m_torch.yaml", "6h_vs_8z_torch.yaml",
            "6h_vs_8z_torch_cv.yaml", "8m_torch.yaml", "8m_torch_cv.yaml",
            "MMM2_torch.yaml", "corridor_torch.yaml",
            "corridor_torch_cv.yaml",
        )
    ],
    "smac/v1/runs": [
        (f, "keep") for f in (
            "2c_vs_64zg.yaml", "2c_vs_64zg_neg.yaml", "2s3z.yaml",
            "2s3z_neg.yaml", "2s_vs_1c.yaml", "2s_vs_1c_neg.yaml",
            "3s5z.yaml", "3s5z_neg.yaml", "3s_vs_5z.yaml",
            "3s_vs_5z_neg.yaml", "3s_vs_5z_neg_joint.yaml", "6h_vs_8z.yaml",
            "6h_vs_8z_neg.yaml", "6h_vs_8z_rnn.yaml", "MMM2.yaml",
            "MMM2_conv1d.yaml", "MMM2_neg.yaml", "MMM2_rnn.yaml",
            "bane_vs_bane.yaml", "bane_vs_bane_neg.yaml", "corridor_cv.yaml",
            "corridor_cv_neg.yaml",
        )
    ],
    "smac/v2": [
        ("protos_5_v_5.yaml", "keep"), ("terran_5_v_5.yaml", "keep"),
        ("zerg_5_v_5.yaml", "keep"),
    ],
    "minigrid": [
        ("lava_rnn_img.yaml", "keep"), ("minigrid_rnn_img.yaml", "keep"),
    ],
    "mjlab": [
        ("ppo_g1_velocity.yaml", "keep"), ("ppo_go1_velocity.yaml", "keep"),
        ("ppo_lift_cube_yam.yaml", "keep"),
        ("ppo_wujihand_reorient.yaml", "keep"),
    ],
    "maniskill": [
        ("ppo_ant.yaml", "keep"), ("ppo_pick_cube_state.yaml", "keep"),
    ],
    "ma": [
        ("ppo_connect4_self_play.yaml", "connect4"),
        ("ppo_connect4_self_play_resnet.yaml", "connect4"),
    ],
    "pufferlib": [
        # the reference's pufferlib backend is a process-pool around the
        # same gym ids; the host bridge plays that role here
        ("ppo_cartpole.yaml", "gym"),
        ("ppo_bipedal_walker.yaml", "gym"),
        ("ppo_bipedal_walker_hardcore.yaml", "gym"),
    ],
    "dm_control": [
        ("acrobot_swingup.yaml", "dmc"), ("ball_in_cup.yaml", "dmc"),
        ("cartpole.yaml", "dmc"), ("cartpole_balance.yaml", "dmc"),
        ("cheetah_walk.yaml", "dmc"), ("fish_swim.yaml", "dmc"),
        ("hopper_hop.yaml", "dmc"), ("hopper_stand.yaml", "dmc"),
        ("humanoid_run.yaml", "dmc"), ("humanoid_stand.yaml", "dmc"),
        ("humanoid_walk.yaml", "dmc"), ("manipulator_bringball.yaml", "dmc"),
        ("pendulum_swingup.yaml", "dmc"), ("walker_run.yaml", "dmc"),
        ("walker_stand.yaml", "dmc"), ("walker_walk.yaml", "dmc"),
    ],
    "": [
        ("carracing_ppo.yaml", "gym"),
        ("ppo_cartpole.yaml", "gym"),
        ("ppo_pendulum.yaml", "gym"),
        ("ppo_lunar.yaml", "gym"),
        ("ppo_lunar_discrete.yaml", "gym"),
        ("ppo_lunar_continiuos_torch.yaml", "gym"),
        ("ppo_walker.yaml", "gym"),
        ("ppo_walker_rnn.yaml", "gym"),
        ("ppo_walker_hardcore.yaml", "gym"),
        ("ppo_continuous.yaml", "gym"),
        ("ppo_continuous_lstm.yaml", "gym"),
        ("ppo_cartpole_masked_velocity_rnn.yaml", "masked_velocity"),
        ("sac_pendulum.yaml", "gym"),
        ("ppo_multiwalker.yaml", "multiwalker"),
        ("ppo_pendulum_torch.yaml", "gym"),
        ("ppo_reacher.yaml", "gym"),
        ("ppo_myo.yaml", "keep"),
        ("ppo_smac.yaml", "keep"),
    ],
}

# dead-backend gym ids -> the installed gymnasium generation's
GYM_ID_MAP = {
    "ReacherPyBulletEnv-v0": "Reacher-v5",  # pybullet -> MuJoCo analog
}

ATARI_ID_MAP = {
    "BreakoutNoFrameskip-v4": "ALE/Breakout-v5",
    "PongNoFrameskip-v4": "ALE/Pong-v5",
    "MsPacmanNoFrameskip-v4": "ALE/MsPacman-v5",
    "GopherNoFrameskip-v4": "ALE/Gopher-v5",
    "SpaceInvadersNoFrameskip-v4": "ALE/SpaceInvaders-v5",
}


def port_one(src, kind):
    with open(src) as f:
        d = yaml.safe_load(f)
    p = d["params"]
    cfg = p["config"]
    for k in DROP_PARAM_KEYS:
        p.pop(k, None)
    for k in DROP_CONFIG_KEYS:
        cfg.pop(k, None)
    env_cfg = cfg.get("env_config") or {}
    player = cfg.get("player") or {}
    player.pop("render", None)

    env_name = str(cfg.get("env_name", "")).strip()
    if kind == "keep":
        pass  # external-simulator binding preserved verbatim
    elif kind == "gym":
        # backend names (gymnasium/envpool/ray wrappers) carry the real id
        # in env_config (as env_name or name); direct gym ids stay as-is
        gym_id = (
            env_cfg.pop("env_name", None)
            or env_cfg.pop("env_id", None)
            or env_cfg.pop("name", None)
        )
        if gym_id:
            cfg["env_name"] = gym_id
        cfg["env_name"] = GYM_ID_MAP.get(cfg["env_name"], cfg["env_name"])
        cfg["vecenv_type"] = "GYMNASIUM"
        # the reference's envpool backend is a C++ THREAD-POOL stepper
        # (envs/envpool.py): map it to the bridge's in-process threaded
        # vectorization (num_threads -1 = one thread per host core)
        if env_name == "envpool":
            env_cfg["num_threads"] = -1
        # envpool-only env kwargs: use_contact_force maps to gymnasium's
        # include_cfrc_ext_in_observation (the published SAC Ant band
        # depends on it — reference sac_ant_envpool.yaml comment)
        if "use_contact_force" in env_cfg:
            env_cfg["include_cfrc_ext_in_observation"] = env_cfg.pop(
                "use_contact_force"
            )
        for k in ("steps_limit", "flat_observation"):
            env_cfg.pop(k, None)
        # pufferlib backend knobs: process-parallel stepping maps to the
        # host bridge's AsyncVectorEnv option
        if env_cfg.pop("backend", None) == "Multiprocessing":
            env_cfg["use_async"] = True
        env_cfg.pop("num_workers", None)
        env_cfg.pop("backend_kwargs", None)
        # v3/v4 MuJoCo ids -> v5 (the installed gymnasium generation)
        for old, new in (("-v3", "-v5"), ("-v4", "-v5")):
            if cfg["env_name"].endswith(old) and any(
                m in cfg["env_name"]
                for m in ("Ant", "HalfCheetah", "Hopper", "Humanoid",
                          "Walker2d", "Reacher", "Swimmer")
            ):
                cfg["env_name"] = cfg["env_name"][: -len(old)] + new
    elif kind == "test":
        cfg["env_name"] = "test_env"
        env_cfg.pop("name", None)
        if env_cfg.pop("env_name", "").startswith("TestAsymmetric"):
            # the reference's LunarLander-wrapping asymmetric fixture maps
            # to the flag-parameterized memory env with a central state
            env_cfg.pop("wrapped_env_name", None)
            env_cfg.pop("apply_mask", None)
            env_cfg["use_central_value"] = True
            env_cfg.setdefault("hide_object", False)
    elif kind == "test_asym_cont":
        # continuous asymmetric fixture: velocity-masked Pendulum with the
        # full state to the central critic (test_envs.ContinuousAsymmetricEnv,
        # the reference's TestAsymmetricCritic role)
        cfg["env_name"] = "test_asymmetric_continuous_env"
        cfg.pop("vecenv_type", None)
        env_cfg = {}
    elif kind == "test_mops":
        # multi-obs-space fixture: the reference's custom 'testnet' dict-obs
        # network maps to the in-tree testnet_dict plugin; the dict-obs
        # memory env has no central state, so the central-value block drops
        # (the reference's own env only emits one when use_central_value)
        cfg["env_name"] = "test_dict_obs_env"
        env_cfg = {}
        cfg.pop("central_value_config", None)
        p["network"] = {"name": "testnet_dict"}
        cfg["import_modules"] = ["rl_games_tpu.models.test_network"]
    elif kind == "test_auxnet":
        cfg["env_name"] = "test_dict_obs_env"
        env_cfg = {"aux_loss": True}
        p["network"] = {"name": "testnet_aux_loss"}
        cfg["import_modules"] = ["rl_games_tpu.models.test_network"]
    elif kind == "dmc":
        # envpool-style ids in env_config['env_name'] ('WalkerWalk-v1') or
        # shimmy-style ('dm_control/cartpole-balance-v0'); both resolve in
        # envs/host/dm_control_env.resolve_task
        cfg["env_name"] = env_cfg.pop("env_name")
        cfg["vecenv_type"] = "DMCONTROL"
        env_cfg.pop("flatten_obs", None)
        # the reference reaches dm_control through envpool's C++ thread
        # pool too — same threaded-stepper mapping as the mujoco family
        env_cfg["num_threads"] = -1
    elif kind == "connect4":
        # env module is out-of-tree in the reference; binds to the
        # pettingzoo connect_four_v3 self-play adapter here. config_path
        # points at the ported YAML so the embedded opponent builds the
        # same network (the reference config carries its own path the
        # same way).
        env_cfg.pop("name", None)
        env_cfg["config_path"] = (
            "rl_games_tpu/configs/ref/ma/" + os.path.basename(src)
        )
        if p.get("network", {}).get("name") == "connect4net":
            # the reference's out-of-tree custom net, in-tree here as a
            # plugin module (models/connect4_network.py)
            cfg["import_modules"] = ["rl_games_tpu.models.connect4_network"]
    elif kind == "multiwalker":
        # binds to the in-tree pettingzoo adapter; env_config keys
        # (central_value, use_prev_actions, apply_agent_ids) pass through.
        # use_experimental_cv is a torch-only toggle
        cfg.pop("use_experimental_cv", None)
    elif kind == "atari":
        # gym-style configs carry the id in env_config['name']
        # (configs/atari/ppo_breakout.yaml), envpool-style in
        # env_config['env_name'] (ppo_breakout_envpool.yaml)
        gym_id = (
            env_cfg.pop("name", None)
            or env_cfg.pop("env_name", None)
            or env_name
        )
        cfg["env_name"] = ATARI_ID_MAP.get(gym_id, gym_id)
        cfg["vecenv_type"] = "ATARI"
        # envpool wrapper knob name -> the deepmind stack's
        env_cfg.pop("has_lives", None)
        if "episodic_life" in env_cfg:
            env_cfg["episode_life"] = env_cfg.pop("episodic_life")
        for k in ("stack_num", "gray_scale", "use_combined_action"):
            env_cfg.pop(k, None)
    elif kind == "ant2d":
        cfg["env_name"] = "Ant2D"
        cfg.pop("vecenv_type", None)
        env_cfg = {}
    elif kind == "cheetah2d":
        cfg["env_name"] = "Cheetah2D"
        cfg.pop("vecenv_type", None)
        env_cfg = {}
    elif kind == "arm2d":
        # brax ur5e = fixed-base arm reach task -> the planar arm device
        # env on the same Lagrangian machinery (envs/jax/arm2d.py)
        cfg["env_name"] = "Arm2D"
        cfg.pop("vecenv_type", None)
        env_cfg = {}
    elif kind == "grasp2d":
        # brax grasp = claw pick-and-place -> the planar grasp device env
        cfg["env_name"] = "Grasp2D"
        cfg.pop("vecenv_type", None)
        env_cfg = {}
    elif kind == "walker2d":
        # brax humanoid's balance-class role maps to the planar upright
        # biped (locomotion2d.Walker2D)
        cfg["env_name"] = "Walker2D"
        cfg.pop("vecenv_type", None)
        env_cfg = {}
    elif kind == "masked_velocity":
        cfg["env_name"] = "CartPoleMaskedVelocity-v1"
        cfg.pop("vecenv_type", None)
    # legacy model/schema names: the pre-1.0 *_lstm model variants fold
    # into the base model + an rnn network block
    LEGACY_MODELS = {
        "continuous_a2c_lstm_logstd": "continuous_a2c_logstd",
        "continuous_a2c_lstm": "continuous_a2c",
        "discrete_a2c_lstm": "discrete_a2c",
        "multi_discrete_a2c_lstm": "multi_discrete_a2c",
    }
    model_name = p.get("model", {}).get("name")
    if model_name in LEGACY_MODELS:
        p["model"]["name"] = LEGACY_MODELS[model_name]
        lstm = p["network"].pop("lstm", None)
        if lstm and "rnn" not in p["network"]:
            p["network"]["rnn"] = {
                "name": "lstm", "units": lstm.get("units", 128), "layers": 1,
            }
    if env_cfg:
        cfg["env_config"] = env_cfg
    elif "env_config" in cfg:
        del cfg["env_config"]
    return d


def main():
    count = 0
    for family, files in PORTS.items():
        outdir = os.path.join(OUT, family) if family else OUT
        os.makedirs(outdir, exist_ok=True)
        for fname, kind in files:
            src = os.path.join(REF, family, fname) if family else os.path.join(REF, fname)
            d = port_one(src, kind)
            if d is None:
                continue
            rel = os.path.relpath(src, "/root/reference")
            header = (
                f"# Ported from the reference config {rel} — hyperparameters\n"
                f"# preserved verbatim; env binding mapped to this framework's\n"
                f"# backends (tools/port_ref_configs.py).\n"
            )
            out = os.path.join(outdir, fname)
            with open(out, "w") as f:
                f.write(header + yaml.safe_dump(d, sort_keys=False))
            count += 1
    # smac v2 auxiliary env-parameter files (unit/position distributions the
    # v2 training configs point at) — schema data, re-emitted with headers
    ec_src = os.path.join(REF, "smac", "v2", "env_configs")
    ec_out = os.path.join(OUT, "smac", "v2", "env_configs")
    os.makedirs(ec_out, exist_ok=True)
    for fname in sorted(os.listdir(ec_src)):
        with open(os.path.join(ec_src, fname)) as f:
            data = yaml.safe_load(f)
        header = (
            f"# SMACv2 env-parameter file (reference "
            f"rl_games/configs/smac/v2/env_configs/{fname}) — capability/"
            f"position distribution data consumed by the smac_v2 binding.\n"
        )
        with open(os.path.join(ec_out, fname), "w") as f:
            f.write(header + yaml.safe_dump(data, sort_keys=False))
        count += 1
    print(f"ported {count} configs -> {OUT}")


if __name__ == "__main__":
    main()
