"""SAC tests: replay-buffer semantics (the reference's fake-env test matrix,
tests/test_sac_correctness.py), update math, and a tiny learning run."""

import os

import numpy as np
import pytest
import yaml
import jax
import jax.numpy as jnp

from rl_games_tpu.algos.sac import (
    SACAgent,
    replay_init,
    replay_add,
    replay_sample,
    replay_size,
)


def load_cfg():
    path = os.path.join(
        os.path.dirname(__file__), "..", "rl_games_tpu", "configs",
        "sac_pendulum.yaml",
    )
    with open(path) as f:
        return yaml.safe_load(f)


def small_cfg(**over):
    cfg = load_cfg()
    c = cfg["params"]["config"]
    c.update(
        num_actors=4, num_steps_per_episode=4, batch_size=32,
        replay_buffer_size=1000, num_warmup_steps=2, utd_ratio=0.5,
        max_epochs=3, print_stats=False,
    )
    c.update(over)
    return cfg


# ------------------------------------------------------------------- replay
def test_replay_wraparound():
    """experience.py:237-262 wraparound (reference test :289-349)."""
    buf = replay_init(10, (2,), 1)
    for i in range(4):  # 4 adds x 3 rows = 12 > capacity 10
        obs = jnp.full((3, 2), float(i))
        buf = replay_add(
            buf, obs, jnp.zeros((3, 1)), jnp.zeros(3), obs + 0.5,
            jnp.zeros(3, bool), jnp.zeros(3, bool),
        )
    assert int(replay_size(buf)) == 10
    assert bool(buf.full)
    assert int(buf.idx) == 2
    # oldest rows (first add) overwritten by the fourth add
    np.testing.assert_allclose(np.asarray(buf.obses[0]), 3.0)
    np.testing.assert_allclose(np.asarray(buf.obses[1]), 3.0)
    np.testing.assert_allclose(np.asarray(buf.obses[2]), 0.0)


def test_replay_sample_only_valid_rows():
    buf = replay_init(100, (1,), 1)
    obs = jnp.arange(5, dtype=jnp.float32).reshape(5, 1)
    buf = replay_add(
        buf, obs, jnp.zeros((5, 1)), jnp.arange(5.0), obs,
        jnp.zeros(5, bool), jnp.zeros(5, bool),
    )
    o, a, r, no, d, t = replay_sample(buf, jax.random.PRNGKey(0), 64)
    assert np.asarray(o).max() < 5  # never samples uninitialized rows
    assert o.shape == (64, 1) and r.shape == (64, 1)


def test_replay_stores_true_final_obs_and_bootstrap_flags():
    """Truncation rows must store done=False + true final obs
    (test_sac_correctness.py:185-412 semantics)."""
    cfg = small_cfg(num_warmup_steps=1000)  # stay in warmup: no updates
    agent = SACAgent("t", cfg["params"])
    # pendulum truncates at 200 steps; run enough epochs to cross it
    state = agent.init_state()
    fn = agent.make_train_fn()
    for _ in range(51):  # 51 * 4 steps = 204 > 200
        state, m = fn(state)
    size = int(replay_size(state.replay))
    assert size == 51 * 4 * 4
    trunc = np.asarray(state.replay.truncated[:size, 0])
    dones = np.asarray(state.replay.dones[:size, 0])
    assert trunc.sum() == 4  # each env truncated exactly once
    assert dones.sum() == 0  # pendulum never hard-terminates
    # the truncation row's next_obs must be a valid obs (cos^2+sin^2=1),
    # i.e. the TRUE final obs, not a reset marker
    rows = np.where(trunc)[0]
    next_obs = np.asarray(state.replay.next_obses[rows])
    np.testing.assert_allclose(
        next_obs[:, 0] ** 2 + next_obs[:, 1] ** 2, 1.0, rtol=1e-5
    )


# ------------------------------------------------------------------- update
def test_warmup_no_updates_then_updates():
    cfg = small_cfg(num_warmup_steps=2)
    agent = SACAgent("t", cfg["params"])
    state = agent.init_state()
    fn = agent.make_train_fn()
    state, m = fn(state)  # epoch 0 < 2: warmup
    assert int(state.update_counter) == 0
    assert float(m["critic_loss"]) == 0.0
    state, m = fn(state)  # epoch 1 < 2: warmup
    assert int(state.update_counter) == 0
    state, m = fn(state)  # epoch 2: updates begin
    expected = agent.num_updates_per_step * agent.num_steps_per_episode
    assert int(state.update_counter) == expected
    assert float(m["critic_loss"]) > 0.0


def test_target_network_polyak():
    cfg = small_cfg(num_warmup_steps=0)
    agent = SACAgent("t", cfg["params"])
    state = agent.init_state()
    # target == critic at init
    for a, b in zip(
        jax.tree.leaves(state.critic_params),
        jax.tree.leaves(state.critic_target_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    fn = agent.make_train_fn()
    state, _ = fn(state)
    state, _ = fn(state)  # 2nd epoch: ring reaches replay_min_fill (32 rows)
    # after updates: target moved but not equal to critic
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree.leaves(state.critic_params),
            jax.tree.leaves(state.critic_target_params),
        )
    ]
    assert max(diffs) > 0


def test_alpha_learns():
    cfg = small_cfg(num_warmup_steps=0, learnable_temperature=True)
    agent = SACAgent("t", cfg["params"])
    state = agent.init_state()
    fn = agent.make_train_fn()
    la0 = float(state.log_alpha)
    for _ in range(5):
        state, m = fn(state)
    assert float(state.log_alpha) != la0
    assert float(m["alpha"]) > 0


def test_sac_pendulum_improves():
    cfg = load_cfg()
    c = cfg["params"]["config"]
    c.update(
        num_actors=16, num_steps_per_episode=8, batch_size=256,
        replay_buffer_size=50000, num_warmup_steps=5, utd_ratio=0.5,
        print_stats=False,
    )
    agent = SACAgent("t", cfg["params"])
    state = agent.init_state()
    fn = agent.make_train_fn()
    for _ in range(250):
        state, m = fn(state)
    # random pendulum policy ~ -1200; near-optimal is ~ -150
    assert float(m["mean_rewards"][0]) > -400.0


def test_sac_runner_and_player(tmp_path):
    from rl_games_tpu.runner import Runner

    cfg = small_cfg(max_epochs=3, save_best_after=1)
    cfg["params"]["config"]["train_dir"] = str(tmp_path)
    runner = Runner()
    runner.load(cfg)
    best, epochs = runner.run({"train": True})
    assert epochs == 3
    nn_dir = os.path.join(str(tmp_path), "pendulum_sac", "nn")
    ckpts = [f for f in os.listdir(nn_dir) if f.endswith(".ckpt")]
    assert ckpts
    reward = runner.run(
        {"play": True, "checkpoint": os.path.join(nn_dir, ckpts[0])}
    )
    assert np.isfinite(reward)


def test_sac_multichip_matches_single_chip():
    """SAC over the mesh (beyond the reference, whose SAC is single-GPU):
    env batch + replay capacity shard over 'data'; the logical program is
    unchanged so 1-chip == N-chip."""
    from rl_games_tpu.parallel.mesh import create_mesh

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    # sizes divisible by the 4-way mesh
    cfg1 = small_cfg(replay_buffer_size=1024, num_warmup_steps=1)
    cfgN = small_cfg(replay_buffer_size=1024, num_warmup_steps=1)

    a1 = SACAgent("t", cfg1["params"])
    aN = SACAgent("t", cfgN["params"])
    s1 = a1.init_state()
    sN = aN.init_state()
    f1 = a1.make_train_fn(donate=False)
    mesh = create_mesh(jax.devices()[:4])
    fN = aN.make_train_fn(mesh=mesh, donate=False)
    for _ in range(3):
        s1, m1 = f1(s1)
        sN, mN = fN(sN)
    np.testing.assert_allclose(
        float(m1["critic_loss"]), float(mN["critic_loss"]), rtol=1e-3,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        float(m1["actor_loss"]), float(mN["actor_loss"]), rtol=1e-3,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(jax.device_get(sN.log_alpha)),
        np.asarray(jax.device_get(s1.log_alpha)), rtol=1e-4,
    )


def test_sac_benchmark_harness_probe_and_report(tmp_path):
    """The benchmark harness's probe and report paths (the reference
    unit-tests its own harness, tests/test_sac_correctness.py:769-807)."""
    import importlib.util
    import json as _json

    spec = importlib.util.spec_from_file_location(
        "sac_benchmark",
        os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                     "sac_benchmark.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    assert bench.score_points([]) is None
    pts = [(i, float(i)) for i in range(20)]
    assert bench.score_points(pts) == np.mean(range(10, 20))

    rec = bench.run_one("pendulum", seed=3, probe=True,
                        train_dir=str(tmp_path))
    assert rec["env"] == "pendulum" and rec["score"] is not None
    out = tmp_path / "res.jsonl"
    with open(out, "w") as f:
        f.write(_json.dumps(rec) + "\n")
        f.write(_json.dumps({**rec, "seed": 4, "score": rec["score"] + 1}) + "\n")
    by_env = bench.report(str(out))
    assert len(by_env["pendulum"]) == 2


def test_epoch_metrics_are_epoch_means():
    """train_epoch reports epoch-MEAN losses over every update (reference
    sac_agent.py:673-745 averaging), with actor-side losses averaged over
    the delayed-actor updates that actually ran; actor_updated reports the
    count of actor updates this epoch."""
    cfg = small_cfg(num_warmup_steps=0, utd_ratio=2.0,
                    num_steps_per_episode=4, policy_frequency=2)
    agent = SACAgent("t", cfg["params"])
    state = agent.init_state()
    fn = agent.make_train_fn(donate=False)
    for _ in range(3):  # fill replay past replay_min_fill (= batch_size)
        state, m = fn(state)
    # utd 2.0 x 4 actors = 8 updates per env step x 4 steps = 32 updates;
    # policy_frequency 2 -> 16 actor runs
    assert int(m["actor_updated"]) == 16
    for k in ("critic_loss", "critic1_loss", "critic2_loss", "actor_loss",
              "entropy", "alpha_loss"):
        assert np.isfinite(float(m[k])), k
    # actor_loss is a mean over actor updates, not a zero-diluted mean:
    # rebuilding with policy_frequency 1 must not change its scale wildly
    cfg2 = small_cfg(num_warmup_steps=0, utd_ratio=2.0,
                     num_steps_per_episode=4, policy_frequency=1)
    agent2 = SACAgent("t", cfg2["params"])
    s2 = agent2.init_state()
    fn2 = agent2.make_train_fn(donate=False)
    for _ in range(3):
        s2, m2 = fn2(s2)
    assert int(m2["actor_updated"]) == 32


def test_stripped_resume_raises_update_gate(tmp_path):
    """Resume from a replay-stripped checkpoint must NOT resume UTD
    updates after one batch of fresh rows — the raised
    replay_resume_min_fill gate keeps updates paused until the ring
    re-fills (a mid-run Humanoid resume that updated immediately
    collapsed 5.3k reward to ~1.1k; algos/sac.py _restore)."""
    from rl_games_tpu.utils import checkpoint as ckpt

    cfg = small_cfg(num_warmup_steps=1, replay_buffer_size=1000,
                    batch_size=32)
    agent = SACAgent("t", cfg["params"])
    state = agent.init_state()
    fn = agent.make_train_fn()
    for _ in range(4):
        state, m = fn(state)
    assert int(state.update_counter) > 0  # trained past warmup
    path = str(tmp_path / "sac_stripped.ckpt")
    ckpt.save_checkpoint(
        path, agent._ckpt_state(state),
        meta={"epoch": int(state.epoch), "frame": int(state.frame),
              "has_replay": agent.save_replay_buffer},
        weights=agent.get_weights(state),
    )

    fresh = SACAgent("t2", cfg["params"])
    assert fresh._update_min_fill == fresh.replay_min_fill
    restored, _ = fresh._restore(path, fresh.init_state())
    # gate raised to the resume floor (5% of ring, >= one batch)
    assert fresh._update_min_fill == min(
        fresh.replay_resume_min_fill, fresh.replay_buffer_size
    )
    assert fresh._update_min_fill >= fresh.replay_min_fill
    # replay came back EMPTY (stripped), counters restored
    assert int(replay_size(restored.replay)) == 0
    assert int(restored.epoch) == int(state.epoch)

    # updates stay paused during the refill window even though
    # epoch > warmup and one batch of rows lands immediately
    fn2 = fresh.make_train_fn()
    before = int(restored.update_counter)
    restored, m = fn2(restored)
    rows = int(replay_size(restored.replay))
    assert rows < fresh._update_min_fill  # still refilling
    assert int(restored.update_counter) == before  # no updates ran
    # ... and resume once the ring crosses the raised floor
    while int(replay_size(restored.replay)) < fresh._update_min_fill:
        restored, m = fn2(restored)
    restored, m = fn2(restored)
    assert int(restored.update_counter) > before


def test_resume_min_fill_config_override():
    cfg = small_cfg(replay_resume_min_fill=64, replay_buffer_size=1000)
    agent = SACAgent("t", cfg["params"])
    assert agent.replay_resume_min_fill == 64
