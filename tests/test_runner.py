"""Runner / config / checkpoint / player end-to-end tests (tiny real runs,
SURVEY.md §4 technique 1)."""

import os

import numpy as np
import pytest
import yaml

from rl_games_tpu.runner import Runner


def load_cfg(name):
    path = os.path.join(
        os.path.dirname(__file__), "..", "rl_games_tpu", "configs", name
    )
    with open(path) as f:
        return yaml.safe_load(f)


def shrink(cfg, tmp_path, max_epochs=3):
    c = cfg["params"]["config"]
    c["num_actors"] = 4
    c["horizon_length"] = 8
    c["minibatch_size"] = 16
    c["mini_epochs"] = 2
    c["max_epochs"] = max_epochs
    c["save_best_after"] = 1
    c["save_frequency"] = 0
    c["score_to_win"] = 100500
    c["train_dir"] = str(tmp_path)
    c["print_stats"] = False
    return cfg


def test_runner_train_cartpole(tmp_path):
    cfg = shrink(load_cfg("ppo_cartpole.yaml"), tmp_path)
    runner = Runner()
    runner.load(cfg)
    best, epochs = runner.run({"train": True})
    assert epochs == 3
    # final checkpoint written
    nn_dir = os.path.join(str(tmp_path), "cartpole_ppo", "nn")
    assert any(f.endswith(".ckpt") for f in os.listdir(nn_dir))


def test_checkpoint_roundtrip_and_resume(tmp_path):
    cfg = shrink(load_cfg("ppo_pendulum.yaml"), tmp_path, max_epochs=2)
    runner = Runner()
    runner.load(cfg)
    runner.run({"train": True})
    nn_dir = os.path.join(str(tmp_path), "pendulum_ppo", "nn")
    ckpts = [f for f in os.listdir(nn_dir) if f.startswith("last_")]
    assert ckpts
    ckpt_path = os.path.join(nn_dir, ckpts[0])

    # restore into a fresh agent: params identical, counters preserved
    from rl_games_tpu.utils.checkpoint import load_checkpoint
    import jax

    agent = runner.create_agent()
    example = agent.init_state()
    state, meta = load_checkpoint(ckpt_path, example)
    assert int(state.epoch) == 2
    assert meta["epoch"] == 2
    # params differ from fresh init (training moved them)
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.params,
        example.params,
    )
    assert max(jax.tree.leaves(diffs)) > 0

    # resuming training from the checkpoint works
    best, epochs = runner.run({"train": True, "checkpoint": ckpt_path})
    assert epochs >= 2


def test_player_restores_and_runs(tmp_path):
    cfg = shrink(load_cfg("ppo_cartpole.yaml"), tmp_path, max_epochs=2)
    cfg["params"]["config"]["player"] = {
        "games_num": 8, "num_actors": 4, "deterministic": True,
    }
    runner = Runner()
    runner.load(cfg)
    runner.run({"train": True})
    nn_dir = os.path.join(str(tmp_path), "cartpole_ppo", "nn")
    ckpt_path = os.path.join(
        nn_dir, [f for f in os.listdir(nn_dir) if f.startswith("last_")][0]
    )
    reward = runner.run({"play": True, "checkpoint": ckpt_path})
    assert np.isfinite(reward)
    assert reward > 0  # cartpole reward is always positive


def test_seed_minus_one_randomizes():
    cfg = load_cfg("ppo_cartpole.yaml")
    cfg["params"]["seed"] = -1
    runner = Runner()
    runner.load(cfg)
    assert runner.seed != -1


def test_evaluation_mode_checkpoint_watch(tmp_path):
    """player 'evaluation' mode reloads the newest checkpoint from
    dir_to_monitor (player.py:119-156)."""
    import time

    cfg = shrink(load_cfg("ppo_cartpole.yaml"), tmp_path, max_epochs=2)
    runner = Runner()
    runner.load(cfg)
    runner.run({"train": True})
    nn_dir = os.path.join(str(tmp_path), "cartpole_ppo", "nn")

    cfg2 = shrink(load_cfg("ppo_cartpole.yaml"), tmp_path, max_epochs=2)
    cfg2["params"]["config"]["player"] = {
        "games_num": 4, "num_actors": 4, "deterministic": True,
        "evaluation": True, "dir_to_monitor": nn_dir,
    }
    runner2 = Runner()
    runner2.load(cfg2)
    player = runner2.create_player()
    assert player.maybe_load_new_checkpoint()  # picks up the fresh ckpt
    assert not player.maybe_load_new_checkpoint()  # no newer one
    reward = player.run()
    assert np.isfinite(reward)


def _stop_immediately(algo):
    """Target for the stop_fn import-path test."""
    return True


def test_stop_fn_resolution_from_config(tmp_path):
    """Config stop_fn as 'module:function' string resolves and fires
    (torch_runner.py:63-95)."""
    cfg = shrink(load_cfg("ppo_cartpole.yaml"), tmp_path, max_epochs=50)
    cfg["params"]["config"]["stop_fn"] = "test_runner:_stop_immediately"
    runner = Runner()
    runner.load(cfg)
    _, epochs = runner.run({"train": True})
    assert epochs == 1  # stopped after the first epoch


def test_stop_fn_fires_on_non_log_epoch(tmp_path):
    """stop_fn is consulted every epoch, not every log_interval epochs —
    the reference checks its stop condition per-epoch regardless of the
    logging cadence."""
    cfg = shrink(load_cfg("ppo_cartpole.yaml"), tmp_path, max_epochs=50)
    cfg["params"]["config"]["stop_fn"] = "test_runner:_stop_immediately"
    cfg["params"]["config"]["log_interval"] = 10
    runner = Runner()
    runner.load(cfg)
    _, epochs = runner.run({"train": True})
    assert epochs == 1  # not delayed until epoch 10


def test_sigma_override_train_and_play(tmp_path):
    """--sigma fills the fixed-sigma parameter (torch_runner.py:52-60)."""
    import jax

    cfg = shrink(load_cfg("ppo_pendulum.yaml"), tmp_path, max_epochs=1)
    runner = Runner()
    runner.load(cfg)
    agent = runner.create_agent()
    state = agent.init_state()
    state = agent.override_sigma(state, -1.5)
    sigmas = [
        np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]
        if getattr(path[-1], "key", None) == "sigma"
    ]
    assert sigmas and all(np.allclose(s, -1.5) for s in sigmas)

    player = runner.create_player()
    player.override_sigma(-0.5)
    sigmas = [
        np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            player.net_params
        )[0]
        if getattr(path[-1], "key", None) == "sigma"
    ]
    assert sigmas and all(np.allclose(s, -0.5) for s in sigmas)


def test_load_critic_only(tmp_path):
    """Critic warm-start restores ONLY the central-value net
    (torch_runner.py:46-49)."""
    import jax
    from rl_games_tpu.algos.ppo import PPOAgent
    from rl_games_tpu.utils import checkpoint as ckpt
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_central_value import asym_params

    agent = PPOAgent("t", asym_params())
    state = agent.init_state()
    fn = agent.make_train_fn(donate=False)
    trained, _ = fn(state)
    path = os.path.join(str(tmp_path), "cv.ckpt")
    ckpt.save_checkpoint(path, trained, {})

    fresh = agent.init_state(seed=123)
    warm = agent.restore_central_value_only(path, fresh)
    # cv params match the checkpoint...
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(warm.cv_params)[0]),
        np.asarray(jax.tree.leaves(trained.cv_params)[0]),
    )
    # ...actor params stay fresh
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(warm.params)[0]),
        np.asarray(jax.tree.leaves(fresh.params)[0]),
    )


def test_max_frames_stops_training(tmp_path):
    """max_frames semantics (reference tests/test_critical_fixes.py:77-86):
    training stops once the frame counter reaches max_frames, even with
    max_epochs far larger."""
    cfg = shrink(load_cfg("ppo_cartpole.yaml"), tmp_path, max_epochs=50)
    # 4 actors x 8 horizon = 32 frames/epoch -> 3 epochs
    cfg["params"]["config"]["max_frames"] = 96
    runner = Runner()
    runner.load(cfg)
    _, epochs = runner.run({"train": True})
    assert epochs == 3


def test_best_watermark_preserved_on_resume(tmp_path):
    """Best-reward watermark survives checkpoint resume (reference
    tests/test_critical_fixes.py:169-179): restoring must carry
    last_mean_rewards forward, not reset it to the sentinel."""
    cfg = shrink(load_cfg("ppo_cartpole.yaml"), tmp_path, max_epochs=4)
    runner = Runner()
    runner.load(cfg)
    best1, epochs1 = runner.run({"train": True})
    assert epochs1 == 4
    assert best1 > 0  # cartpole rewards are positive; some episodes finished

    nn_dir = os.path.join(str(tmp_path), "cartpole_ppo", "nn")
    ckpt_path = os.path.join(
        nn_dir, [f for f in os.listdir(nn_dir) if f.startswith("last_")][0]
    )
    # resume at max_epochs: the loop exits immediately and returns the
    # RESTORED watermark — the sentinel (-100500) would mean it was lost
    best2, epochs2 = runner.run({"train": True, "checkpoint": ckpt_path})
    assert epochs2 >= 4
    assert best2 >= best1


def test_adaptive_lr_anneals(tmp_path):
    """Adaptive-KL schedule regression (reference
    tests/test_critical_fixes.py:89-115): with a tiny kl_threshold the LR
    must shrink from its configured value within a few epochs."""
    cfg = shrink(load_cfg("ppo_pendulum.yaml"), tmp_path, max_epochs=3)
    c = cfg["params"]["config"]
    c["lr_schedule"] = "adaptive"
    c["kl_threshold"] = 1e-8
    runner = Runner()
    runner.load(cfg)
    agent = runner.create_agent()
    state = agent.init_state()
    fn = agent.make_train_fn(donate=False)
    for _ in range(3):
        state, metrics = fn(state)
    assert float(metrics["lr"]) < float(c["learning_rate"])
