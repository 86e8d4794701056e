"""Multi-seed vmapped training (utils/multiseed.py): k seeds as one
compiled program — per-seed math matches running each seed alone, and the
stacked run learns. No reference analog (SURVEY §4: the reference's
benchmark harness shells out one process per seed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rl_games_tpu.algos.ppo import PPOAgent
from rl_games_tpu.utils.multiseed import MultiSeedTrainer
from test_ppo import cartpole_params


def test_multiseed_matches_single_seed():
    """Each seed's trajectory through 3 vmapped epochs equals the same
    seed trained alone (same jitted math, batched over the seed axis)."""
    seeds = [3, 9]
    agent = PPOAgent("t", cartpole_params())
    ms = MultiSeedTrainer(agent, seeds)
    stacked = ms.init_state()
    fn = ms.make_train_fn(donate=False)
    metrics_stacked = None
    for _ in range(3):
        stacked, metrics_stacked = fn(stacked)

    for i, seed in enumerate(seeds):
        solo_agent = PPOAgent("t", cartpole_params())
        solo = solo_agent.init_state(seed=seed)
        solo_fn = solo_agent.make_train_fn(donate=False)
        m = None
        for _ in range(3):
            solo, m = solo_fn(solo)
        np.testing.assert_allclose(
            float(metrics_stacked["a_loss"][i]), float(m["a_loss"]),
            rtol=2e-4, atol=2e-5,
        )
        np.testing.assert_allclose(
            float(metrics_stacked["c_loss"][i]), float(m["c_loss"]),
            rtol=2e-4, atol=2e-5,
        )
        got = ms.state_for_seed(stacked, i)
        for a, b in zip(jax.tree.leaves(got.params),
                        jax.tree.leaves(solo.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5)


def test_multiseed_learns_and_slices_checkpointable_state():
    seeds = [5, 11, 17]
    agent = PPOAgent("t", cartpole_params())
    ms = MultiSeedTrainer(agent, seeds)
    stacked = ms.init_state()
    fn = ms.train_fn()
    m = None
    for _ in range(60):
        stacked, m = fn(stacked)
    rewards = np.asarray(m["mean_rewards"])[:, 0]
    assert rewards.shape == (3,)
    assert (rewards > 60.0).all(), rewards
    # sliced state has single-seed shapes (checkpoint/player compatible)
    solo_shape = jax.tree.map(lambda x: x.shape, agent.init_state(seed=5))
    sliced_shape = jax.tree.map(
        lambda x: x.shape, ms.state_for_seed(stacked, 1)
    )
    assert solo_shape == sliced_shape


def test_multiseed_rejects_host_envs():
    params = cartpole_params()
    params["config"]["vecenv_type"] = "GYMNASIUM"
    agent = PPOAgent("t", params)
    if not agent.is_host_env:
        pytest.skip("CartPole resolved to a device env in this registry")
    with pytest.raises(ValueError):
        MultiSeedTrainer(agent, [1, 2])


def test_runner_multiseed_cli_path(tmp_path):
    """`--seeds a,b` through the Runner: trains both seeds in one program,
    writes per-seed single-seed-compatible checkpoints that the standard
    player restores."""
    import os
    import yaml

    from rl_games_tpu.runner import Runner

    path = os.path.join(os.path.dirname(__file__), "..", "rl_games_tpu",
                        "configs", "ppo_cartpole.yaml")
    with open(path) as f:
        cfg = yaml.safe_load(f)
    c = cfg["params"]["config"]
    c.update(num_actors=4, horizon_length=8, minibatch_size=16,
             mini_epochs=2, max_epochs=3, train_dir=str(tmp_path),
             log_interval=1, print_stats=False)
    c["player"] = {"games_num": 4, "num_actors": 4, "deterministic": True}
    runner = Runner()
    runner.load(cfg)
    paths = runner.run({"train": True, "seeds": "3,9"})
    assert len(paths) == 2
    for p in paths:
        assert os.path.exists(p)
    reward = runner.run({"play": True, "checkpoint": paths[0]})
    assert float(reward) > 0


def test_multiseed_sac_device_path(tmp_path):
    """SAC's device train_epoch is pure state->(state, metrics) too, so
    --seeds covers the off-policy family (per-seed replay rings stack
    under vmap: memory scales by k)."""
    import os
    import yaml

    from rl_games_tpu.runner import Runner

    path = os.path.join(os.path.dirname(__file__), "..", "rl_games_tpu",
                        "configs", "sac_pendulum.yaml")
    with open(path) as f:
        cfg = yaml.safe_load(f)
    c = cfg["params"]["config"]
    c.update(num_actors=4, num_steps_per_episode=4, batch_size=32,
             replay_buffer_size=1000, num_warmup_steps=2, utd_ratio=0.5,
             max_epochs=4, train_dir=str(tmp_path), log_interval=2,
             print_stats=False)
    runner = Runner()
    runner.load(cfg)
    paths = runner.run({"train": True, "seeds": "2,4"})
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)


def test_population_pbt_adoption_and_mutation():
    """On-device PBT (PopulationTrainer): a laggard below the band adopts
    the leader's weights+normalizer with a fresh optimizer, meters reset,
    and in-state hyperparams mutate within the configured range."""
    import random

    from rl_games_tpu.utils.multiseed import PopulationTrainer

    agent = PPOAgent("t", cartpole_params())
    tr = PopulationTrainer(agent, [1, 2, 3], threshold_std=0.1,
                           threshold_abs=0.05, mutation_rate=1.0,
                           change_range=(1.2, 1.2))
    stacked = tr.init_state()
    fn = tr.make_train_fn(donate=False)
    stacked, m = fn(stacked)  # fill meters with some games
    fake = {
        "mean_rewards": np.asarray([[200.0], [100.0], [10.0]]),
        "games_played": np.asarray([5, 5, 5]),
    }
    random.seed(0)
    out, events = tr.pbt_step(stacked, fake)
    assert len(events) == 1 and events[0]["dst"] == 3 and events[0]["src"] == 1
    # laggard (index 2) now carries the leader's (index 0) weights
    for a, b in zip(jax.tree.leaves(jax.tree.map(lambda x: x[2], out.params)),
                    jax.tree.leaves(jax.tree.map(lambda x: x[0], out.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # meters reset on the adopter only
    assert int(out.game_rewards.count[2]) == 0
    # mutation: x1.2 either way of the leader's lr
    lr_src, lr_dst = float(out.lr[0]), float(out.lr[2])
    assert np.isclose(lr_dst, lr_src * 1.2) or np.isclose(lr_dst, lr_src / 1.2)
    # non-adopters untouched
    assert float(out.lr[1]) == float(stacked.lr[1])


def test_runner_multiseed_with_pbt_block(tmp_path):
    import os
    import yaml

    from rl_games_tpu.runner import Runner

    path = os.path.join(os.path.dirname(__file__), "..", "rl_games_tpu",
                        "configs", "ppo_cartpole.yaml")
    with open(path) as f:
        cfg = yaml.safe_load(f)
    c = cfg["params"]["config"]
    c.update(num_actors=4, horizon_length=8, minibatch_size=16,
             mini_epochs=2, max_epochs=6, train_dir=str(tmp_path),
             log_interval=2, print_stats=False)
    c["pbt"] = {"interval_steps": 64, "threshold_std": 0.1,
                "threshold_abs": 0.05, "mutation_rate": 0.5}
    runner = Runner()
    runner.load(cfg)
    paths = runner.run({"train": True, "seeds": "1,2,3"})
    assert len(paths) == 3 and all(os.path.exists(p) for p in paths)


def test_multiseed_mesh_shards_seed_axis():
    """--seeds over a mesh: whole seeds land on chips (dim 0 = seed axis
    over 'data', zero collective traffic) and the math matches the
    unsharded stack."""
    from rl_games_tpu.parallel.mesh import create_mesh

    seeds = [1, 2, 3, 4, 5, 6, 7, 8]
    agent = PPOAgent("t", cartpole_params())
    ms = MultiSeedTrainer(agent, seeds)
    stacked = ms.init_state()
    plain_fn = ms.make_train_fn(donate=False)
    mesh = create_mesh(jax.devices()[:8])
    mesh_fn = ms.make_train_fn(donate=False, mesh=mesh)
    s1, m1 = plain_fn(stacked)
    s2, m2 = mesh_fn(stacked)
    np.testing.assert_allclose(np.asarray(m1["a_loss"]),
                               np.asarray(m2["a_loss"]), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(m1["mean_rewards"]),
                               np.asarray(m2["mean_rewards"]), rtol=1e-5)
    with pytest.raises(ValueError):
        MultiSeedTrainer(agent, [1, 2, 3]).make_train_fn(mesh=mesh)


def test_runner_multiseed_rejects_checkpoint_and_sigma(tmp_path):
    import os
    import yaml

    from rl_games_tpu.runner import Runner

    path = os.path.join(os.path.dirname(__file__), "..", "rl_games_tpu",
                        "configs", "ppo_cartpole.yaml")
    with open(path) as f:
        cfg = yaml.safe_load(f)
    cfg["params"]["config"]["train_dir"] = str(tmp_path)
    runner = Runner()
    runner.load(cfg)
    with pytest.raises(ValueError):
        runner.run({"train": True, "seeds": "1,2", "checkpoint": "x.ckpt"})
    with pytest.raises(ValueError):
        runner.run({"train": True, "seeds": "1,2", "sigma": 0.5})


def test_multiseed_composes_with_rnn_and_central_value():
    """--seeds composes with the RNN and asymmetric central-value paths:
    every per-seed substate (rnn carries, cv nets) rides the stacked
    TrainState pytree."""
    from test_ppo_rnn import rnn_params
    from test_central_value import asym_params

    for params in (rnn_params(), asym_params()):
        agent = PPOAgent("t", params)
        ms = MultiSeedTrainer(agent, [1, 2])
        stacked = ms.init_state()
        fn = ms.make_train_fn(donate=False)
        stacked, m = fn(stacked)
        assert np.isfinite(float(m["a_loss"][0]))
        assert m["a_loss"].shape == (2,)
