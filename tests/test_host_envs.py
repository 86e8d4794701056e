"""Host-env (gymnasium) bridge tests: 4-tuple contract, PPO and SAC host
rollout paths (the reference's Ray/envpool-style host loop)."""

import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")

from rl_games_tpu.envs.host.gymnasium_env import GymnasiumVecEnv
from rl_games_tpu.algos.ppo import PPOAgent
from rl_games_tpu.algos.sac import SACAgent


def test_gymnasium_vecenv_contract():
    env = GymnasiumVecEnv("CartPole-v1", 4, seed=0)
    obs = env.reset()
    assert obs.shape == (4, 4) and obs.dtype == np.float32
    obs, rewards, dones, infos = env.step(np.zeros(4, np.int64))
    assert rewards.shape == (4,) and dones.shape == (4,)
    assert "time_outs" in infos
    info = env.get_env_info()
    assert info.action_space.n == 2
    env.close()


def test_gymnasium_truncation_sets_time_outs():
    env = GymnasiumVecEnv("Pendulum-v1", 2, seed=0)
    env.reset()
    for _ in range(200):
        obs, rewards, dones, infos = env.step(np.zeros((2, 1), np.float32))
    assert dones.all()
    assert infos["time_outs"].all()
    assert "final_observation" in infos
    env.close()


def test_ppo_host_path_learns_cartpole():
    params = {
        "algo": {"name": "a2c_discrete"},
        "model": {"name": "discrete_a2c"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [32, 32], "activation": "elu",
                    "initializer": {"name": "default"}},
            "space": {"discrete": {}},
        },
        "config": {
            "env_name": "CartPole-v1", "vecenv_type": "GYMNASIUM",
            "num_actors": 8, "horizon_length": 32, "minibatch_size": 128,
            "mini_epochs": 4, "learning_rate": 3e-4,
            "lr_schedule": "adaptive", "kl_threshold": 0.008,
            "e_clip": 0.2, "clip_value": True, "gamma": 0.99, "tau": 0.95,
            "critic_coef": 1.0, "entropy_coef": 0.01, "grad_norm": 1.0,
            "truncate_grads": True, "normalize_advantage": True,
            "normalize_input": True, "normalize_value": True,
            "value_bootstrap": True, "seed": 7,
            "env_config": {"seed": 7},
        },
    }
    agent = PPOAgent("t", params)
    assert agent.is_host_env
    state = agent.init_state()
    fn = agent.make_train_fn()
    m = None
    for _ in range(60):
        state, m = fn(state)
    assert float(m["mean_rewards"][0]) > 60.0  # random ~20
    assert int(m["frame"]) == 60 * 8 * 32


def test_threaded_vecenv_matches_sync():
    """num_threads vectorization (in-process thread pool, the envpool
    role) is semantics-identical to SyncVectorEnv same_step: same
    per-env seeding, reset-on-done rows, final_observation, time_outs."""
    sync = GymnasiumVecEnv("CartPole-v1", 4, seed=11)
    thr = GymnasiumVecEnv("CartPole-v1", 4, seed=11, num_threads=3)
    o_s, o_t = sync.reset(), thr.reset()
    np.testing.assert_array_equal(o_s, o_t)
    rng = np.random.default_rng(0)
    saw_done = False
    for _ in range(80):
        a = rng.integers(0, 2, size=4)
        obs_s, r_s, d_s, i_s = sync.step(a)
        obs_t, r_t, d_t, i_t = thr.step(a)
        np.testing.assert_array_equal(obs_s, obs_t)
        np.testing.assert_array_equal(r_s, r_t)
        np.testing.assert_array_equal(d_s, d_t)
        np.testing.assert_array_equal(i_s["time_outs"], i_t["time_outs"])
        if d_s.any():
            saw_done = True
            np.testing.assert_array_equal(
                i_s["final_observation"], i_t["final_observation"]
            )
    assert saw_done
    sync.close()
    thr.close()


def test_threaded_vecenv_rejects_bad_combos():
    with pytest.raises(ValueError):
        GymnasiumVecEnv("CartPole-v1", 2, num_threads=2, use_async=True)
    with pytest.raises(ValueError):
        GymnasiumVecEnv(
            "CartPole-v1", 2, num_threads=2, autoreset_mode="next_step"
        )


def test_ppo_host_inference_device_cpu_matches_default():
    """host_inference_device: cpu relocates rollout inference to the host
    CPU backend (params sync once per epoch, one transfer back,
    common/host_inference.py); on the same backend the split-placement
    path must be bit-identical to all-default-device dispatch."""
    def make_params(pref):
        return {
            "algo": {"name": "a2c_discrete"},
            "model": {"name": "discrete_a2c"},
            "network": {
                "name": "actor_critic", "separate": False,
                "mlp": {"units": [32], "activation": "elu",
                        "initializer": {"name": "default"}},
                "space": {"discrete": {}},
            },
            "config": {
                "env_name": "CartPole-v1", "vecenv_type": "GYMNASIUM",
                "num_actors": 4, "horizon_length": 16,
                "minibatch_size": 32, "mini_epochs": 2,
                "learning_rate": 3e-4, "e_clip": 0.2, "clip_value": True,
                "gamma": 0.99,
                "tau": 0.95, "critic_coef": 1.0, "entropy_coef": 0.01,
                "grad_norm": 1.0, "truncate_grads": True,
                "normalize_advantage": True,
                "normalize_input": True, "normalize_value": True,
                "value_bootstrap": True, "seed": 3,
                "env_config": {"seed": 3},
                "host_inference_device": pref,
            },
        }

    def run(pref):
        agent = PPOAgent("t", make_params(pref))
        state = agent.init_state()
        fn = agent.make_train_fn()
        m = None
        for _ in range(3):
            state, m = fn(state)
        return m

    m_cpu = run("cpu")
    m_def = run("default")
    for k in ("mean_rewards", "a_loss", "c_loss", "entropy", "kl"):
        np.testing.assert_array_equal(
            np.asarray(m_cpu[k]), np.asarray(m_def[k]), err_msg=k
        )


def test_host_player_inference_device_cpu():
    """The host eval loop under forced host-CPU inference still plays
    (params relocate via _move_host_params before the first act)."""
    from rl_games_tpu.common.player import PpoPlayer

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
            "env_name": "CartPole-v1", "vecenv_type": "GYMNASIUM",
            "num_actors": 2, "host_inference_device": "cpu",
            "seed": 5, "env_config": {"seed": 5},
            "player": {"games_num": 3, "deterministic": True},
        },
    }
    p = PpoPlayer(params)
    reward = p.run(games_num=3)
    assert reward > 0.0


def test_gymnasium_same_step_resets_on_done():
    """Default autoreset is same_step: the obs returned on a done row is the
    NEW episode's reset obs, the true final obs travels in infos
    (reference RayWorker reset-on-done, common/vecenv.py:70-178)."""
    env = GymnasiumVecEnv("CartPole-v1", 2, seed=0)
    assert env.autoreset_mode == "same_step"
    env.reset()
    # constant push → pole falls in well under 100 steps
    saw_done = False
    for _ in range(100):
        obs, rewards, dones, infos = env.step(np.ones(2, np.int64))
        if dones.any():
            saw_done = True
            i = int(np.nonzero(dones)[0][0])
            final = infos["final_observation"][i]
            # final obs is out-of-bounds (that's why it terminated);
            # returned obs is a fresh reset (near upright, inside bounds)
            assert np.abs(final[2]) > 0.2
            assert np.abs(obs[i][2]) < 0.1
            break
    assert saw_done
    env.close()


class _FakeSameStepEnv:
    """Deterministic fake host env (the reference's fake-env test discipline,
    tests/test_sac_correctness.py:27-183): obs = [env_id, episode, step] so
    dataset rows are exactly checkable; staggered episode lengths."""

    is_host_env = True
    autoreset_mode = "same_step"
    max_episode_steps = 100

    def __init__(self, lengths):
        self.lengths = np.asarray(lengths)
        self.n = len(lengths)
        self.step_count = np.zeros(self.n, np.int64)
        self.episode = np.zeros(self.n, np.int64)

    def get_env_info(self):
        from rl_games_tpu.envs.spaces import Box, EnvInfo

        return EnvInfo(
            observation_space=Box(shape=(3,)),
            action_space=Box(shape=(1,), low=-1.0, high=1.0),
        )

    def _obs(self):
        return np.stack(
            [np.arange(self.n), self.episode, self.step_count], -1
        ).astype(np.float32)

    def reset(self):
        return self._obs()

    def step(self, actions):
        self.step_count += 1
        done = self.step_count >= self.lengths
        final = self._obs()
        rewards = np.ones(self.n, np.float32)
        self.episode[done] += 1
        self.step_count[done] = 0
        infos = {
            "time_outs": np.zeros(self.n, bool),
            "final_observation": final,
        }
        return self._obs(), rewards, done, infos


def test_ppo_host_dataset_has_no_garbage_rows():
    """Byte-check: every stored row after a done is a fresh episode's step-0
    row — no stale-final-obs/no-op rows enter the dataset (the reference
    avoids them via RayWorker reset-on-done; next_step autoreset without
    masking would inject them)."""
    import jax.numpy as jnp

    vec_env = _FakeSameStepEnv([3, 5, 4, 7])
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
                "fixed_sigma": True,
            }},
        },
        "config": {
            "env_name": "fake", "num_actors": 4, "horizon_length": 16,
            "minibatch_size": 32, "mini_epochs": 1, "learning_rate": 1e-4,
            "e_clip": 0.2, "clip_value": False, "gamma": 0.99, "tau": 0.95,
            "critic_coef": 1.0, "entropy_coef": 0.0, "grad_norm": 1.0,
            "normalize_advantage": True, "normalize_input": False,
            "value_bootstrap": False, "seed": 3,
        },
    }
    agent = PPOAgent("t", params, vec_env=vec_env)
    state = agent.init_state()

    captured = {}
    policy_step, finish = agent._make_host_fns()

    def capture_finish(state, traj, last_values, rnn_snapshots):
        captured["traj"] = traj
        return finish(state, traj, last_values, rnn_snapshots)

    agent._host_fns = (policy_step, capture_finish)
    state, _ = agent.host_train_epoch(state)

    obses = np.asarray(captured["traj"]["obses"])  # [T, N, 3]
    dones = np.asarray(captured["traj"]["dones"])  # [T, N]
    T = obses.shape[0]
    for t in range(T):
        for i in range(4):
            if dones[t, i] == 1.0:
                # the row entered after a done must be a fresh reset row
                assert obses[t, i, 2] == 0.0, (t, i, obses[t, i])
    # episodes advance: env 0 has length 3 → step column cycles 0,1,2
    assert obses[:, 0, 2].max() == 2.0
    # rewards on every row are real env rewards (no zero reset rows)
    assert (np.asarray(captured["traj"]["rewards"]) != 0).all()


def test_ppo_host_rejects_next_step_autoreset():
    env = GymnasiumVecEnv(
        "CartPole-v1", 2, seed=0, autoreset_mode="next_step"
    )
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
            "env_name": "CartPole-v1", "num_actors": 2,
            "horizon_length": 8, "minibatch_size": 16, "mini_epochs": 1,
            "learning_rate": 1e-4, "e_clip": 0.2, "clip_value": False,
            "gamma": 0.99, "tau": 0.95, "critic_coef": 1.0,
            "entropy_coef": 0.0, "grad_norm": 1.0,
            "normalize_advantage": True, "normalize_input": False, "seed": 3,
        },
    }
    with pytest.raises(ValueError, match="same_step"):
        PPOAgent("t", params, vec_env=env)
    env.close()


def test_ppo_player_runs_host_env():
    from rl_games_tpu.common.player import PpoPlayer

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
            "env_name": "CartPole-v1", "vecenv_type": "GYMNASIUM",
            "num_actors": 2, "seed": 3, "normalize_input": False,
            "player": {"games_num": 3, "max_steps": 300},
            "env_config": {"seed": 3},
        },
    }
    player = PpoPlayer(params)
    assert player.is_host_env
    reward = player.run()
    assert reward > 0.0  # CartPole always accrues reward


def test_sac_player_runs_host_env():
    from rl_games_tpu.common.player import SACPlayer

    params = {
        "algo": {"name": "sac"},
        "model": {"name": "soft_actor_critic"},
        "network": {
            "name": "soft_actor_critic", "separate": True,
            "mlp": {"units": [16], "activation": "relu",
                    "initializer": {"name": "default"}},
            "log_std_bounds": [-5, 2],
        },
        "config": {
            "env_name": "Pendulum-v1", "vecenv_type": "GYMNASIUM",
            "num_actors": 2, "seed": 3, "normalize_input": False,
            "player": {"games_num": 2, "max_steps": 450},
            "env_config": {"seed": 3},
        },
    }
    player = SACPlayer(params)
    assert player.is_host_env
    reward = player.run()
    assert reward < 0.0  # Pendulum rewards are negative


def test_sac_host_path_runs():
    params = {
        "algo": {"name": "sac"},
        "model": {"name": "soft_actor_critic"},
        "network": {
            "name": "soft_actor_critic", "separate": True,
            "mlp": {"units": [32, 32], "activation": "relu",
                    "initializer": {"name": "default"}},
            "log_std_bounds": [-5, 2],
        },
        "config": {
            "env_name": "Pendulum-v1", "vecenv_type": "GYMNASIUM",
            # batch 32: the replay_min_fill gate opens once 32 real rows
            # are in the ring (epoch 2), so updates are observable by epoch 4
            "num_actors": 4, "num_steps_per_episode": 4, "batch_size": 32,
            "replay_buffer_size": 10000, "num_warmup_steps": 1,
            "utd_ratio": 0.5, "gamma": 0.99, "init_alpha": 1.0,
            "alpha_lr": 5e-3, "actor_lr": 3e-4, "critic_lr": 3e-4,
            "critic_tau": 0.005, "learnable_temperature": True,
            "normalize_input": True, "value_bootstrap": True, "seed": 7,
            "env_config": {"seed": 7},
        },
    }
    agent = SACAgent("t", params)
    assert agent.is_host_env
    state = agent.init_state()
    fn = agent.make_train_fn()
    for _ in range(4):
        state, m = fn(state)
    assert int(state.update_counter) > 0
    assert np.isfinite(float(m["critic_loss"]))
    from rl_games_tpu.algos.sac import replay_size

    # the fused host step ingests transition t-1 together with acting at t
    # (one dispatch per env step), so the newest transition is still
    # pending: 16 steps taken -> 15 ingested x 4 actors
    assert int(replay_size(state.replay)) == (4 * 4 - 1) * 4


class _FakeAsymHostEnv:
    """Host env with {'obs','states'} asymmetric observations."""

    is_host_env = True
    autoreset_mode = "same_step"
    max_episode_steps = 20

    def __init__(self, n):
        self.n = n
        self.t = np.zeros(n, np.int64)

    def get_env_info(self):
        from rl_games_tpu.envs.spaces import Box, EnvInfo

        return EnvInfo(
            observation_space=Box(shape=(3,)),
            action_space=Box(shape=(1,), low=-1.0, high=1.0),
            state_space=Box(shape=(5,)),
        )

    def _make(self):
        obs = np.stack(
            [np.arange(self.n), self.t, np.sin(self.t)], -1
        ).astype(np.float32)
        states = np.concatenate(
            [obs, np.cos(self.t)[:, None], (self.t % 5)[:, None]], -1
        ).astype(np.float32)
        return {"obs": obs, "states": states}

    def reset(self):
        return self._make()

    def step(self, actions):
        self.t += 1
        done = self.t >= 8
        rewards = np.sin(0.3 * self.t).astype(np.float32)
        final = self._make()
        self.t[done] = 0
        infos = {
            "time_outs": np.zeros(self.n, bool),
            "final_observation": final,
        }
        return self._make(), rewards, done, infos


def test_ppo_host_central_value_trains():
    """Asymmetric actor-critic over a host env: {'obs','states'} flow
    through the host rollout into the central-value update (the guard
    from round 1 is gone)."""
    vec_env = _FakeAsymHostEnv(4)
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
                "fixed_sigma": True,
            }},
        },
        "config": {
            "env_name": "fake", "num_actors": 4, "horizon_length": 16,
            "minibatch_size": 32, "mini_epochs": 1, "learning_rate": 1e-3,
            "e_clip": 0.2, "clip_value": False, "gamma": 0.99, "tau": 0.95,
            "critic_coef": 1.0, "entropy_coef": 0.0, "grad_norm": 1.0,
            "normalize_advantage": True, "normalize_input": False,
            "normalize_value": False, "value_bootstrap": False, "seed": 3,
            "central_value_config": {
                "learning_rate": 1e-3, "mini_epochs": 1,
                "minibatch_size": 32, "clip_value": False,
                "normalize_input": False,
                "network": {
                    "name": "actor_critic", "central_value": True,
                    "mlp": {"units": [16], "activation": "elu",
                            "initializer": {"name": "default"}},
                },
            },
        },
    }
    import jax
    from rl_games_tpu.algos.ppo import PPOAgent

    agent = PPOAgent("t", params, vec_env=vec_env)
    assert agent.has_central_value and agent.is_host_env
    state = agent.init_state()
    cv_before = jax.device_get(state.cv_params)
    fn = agent.make_train_fn()
    for _ in range(3):
        state, m = fn(state)
    assert "cval_loss" in m and np.isfinite(float(m["cval_loss"]))
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        cv_before, jax.device_get(state.cv_params),
    )
    assert max(jax.tree.leaves(diffs)) > 0


def test_gymnasium_set_weights_reaches_sub_envs():
    """GymnasiumVecEnv.set_weights pushes opponent weights into the
    selected sub-envs through the wrapper chain (RayWorker.set_weights,
    common/vecenv.py:141-152)."""
    import gymnasium as gym
    import numpy as np

    from rl_games_tpu.envs.host.gymnasium_env import GymnasiumVecEnv

    class _OpponentEnv(gym.Env):
        observation_space = gym.spaces.Box(-1, 1, (2,), np.float32)
        action_space = gym.spaces.Discrete(2)

        def __init__(self):
            self.received = None

        def set_weights(self, weights):
            self.received = weights

        def reset(self, *, seed=None, options=None):
            return np.zeros(2, np.float32), {}

        def step(self, action):
            return np.zeros(2, np.float32), 0.0, False, False, {}

    gym.register(id="SetWeightsProbe-v0", entry_point=_OpponentEnv)
    try:
        env = GymnasiumVecEnv("SetWeightsProbe-v0", 3)
        env.set_weights([0, 2], {"w": np.ones(4)})
        received = [e.unwrapped.received for e in env.env.envs]
        assert received[0] is not None and received[2] is not None
        assert received[1] is None
        np.testing.assert_array_equal(received[0]["w"], np.ones(4))
    finally:
        del gym.registry["SetWeightsProbe-v0"]


def test_multiwalker_vecenv_rows_and_autoreset():
    """PettingZoo multiwalker adapter: agents-minor row layout, per-row
    central states, same_step reset-on-done with time_outs + final rows
    (reference envs/multiwalker.py + RayWorker reset semantics,
    common/vecenv.py:105-116)."""
    pytest.importorskip("pettingzoo")
    from rl_games_tpu.envs.host.pettingzoo_env import MultiWalkerVecEnv

    env = MultiWalkerVecEnv(
        2, central_value=True, apply_agent_ids=True, seed=3, max_cycles=2,
    )
    info = env.get_env_info()
    assert info.agents == 3
    core = env.state_dim // 3
    assert info.observation_space.shape == (core + 3,)
    assert info.state_space.shape == (3 * core,)

    obs = env.reset()
    assert obs["obs"].shape == (6, core + 3)
    assert obs["states"].shape == (6, 3 * core)
    # agent-id one-hots in agents-minor order
    np.testing.assert_allclose(obs["obs"][:3, core:], np.eye(3))
    # per-row states identical within an env, differing across envs
    np.testing.assert_allclose(obs["states"][0], obs["states"][2])

    acts = np.zeros((6, env.action_dim), np.float32)
    for t in range(2):
        obs, rewards, dones, infos = env.step(acts)
        assert rewards.shape == (6,)
        assert dones.shape == (6,)
        if dones.any():
            break
    assert dones.all(), "episode must end within max_cycles"
    # time_outs only ever marks done rows (trunc & ~term)
    assert infos["time_outs"].dtype == bool
    assert not np.any(infos["time_outs"] & ~dones)
    assert infos["final_observation"]["obs"].shape == (6, core + 3)
    # post-done obs is the fresh episode's first rows, not the final rows
    assert not np.allclose(
        obs["obs"], infos["final_observation"]["obs"]
    )
    env.close()


def test_connect4_selfplay_env_masks_and_weight_push():
    """Connect4 self-play adapter: legal-move masks, ±1 terminal rewards,
    seat alternation, and the SelfPlayManager weight-push path driving a
    real policy opponent (reference ma/ppo_connect4_self_play.yaml's env
    contract; the reference's own env module is out-of-tree)."""
    pytest.importorskip("pettingzoo")
    import yaml

    from rl_games_tpu.envs.host.connect4_env import Connect4SelfPlayVecEnv

    with open(
        "rl_games_tpu/configs/ref/ma/ppo_connect4_self_play.yaml"
    ) as f:
        net_params = yaml.safe_load(f)["params"]

    env = Connect4SelfPlayVecEnv(3, network_params=net_params, seed=11)
    info = env.get_env_info()
    assert info.observation_space.shape == (6, 7, 2)
    assert info.action_space.n == 7

    obs = env.reset()
    assert obs.shape == (3, 6, 7, 2)
    # seats alternate per episode: env 0 opens, so after its first reset
    # the learner moved first; force episodes to conclude under random
    # play and check rewards land in {-1, 0, 1}
    rng = np.random.default_rng(0)
    saw_done = False
    for t in range(60):
        masks = env.get_action_masks()
        assert masks.shape == (3, 7) and masks.any(axis=1).all()
        acts = np.array(
            [rng.choice(np.nonzero(m)[0]) for m in masks]
        )
        obs, rewards, dones, infos = env.step(acts)
        assert set(np.unique(rewards)).issubset({-1.0, 0.0, 1.0})
        if dones.any():
            saw_done = True
            assert "final_observation" in infos
    assert saw_done, "random play must finish games within 60 plies"

    # push learner weights as opponent (builds the model, batched forward)
    import jax
    from rl_games_tpu.models import model_builder

    model = model_builder.ModelBuilder().load(
        net_params, actions_num=7, input_shape=(6, 7, 2), value_size=1,
        normalize_input=False, normalize_value=False, obs_shape=(6, 7, 2),
    )
    params, norm = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 6, 7, 2), np.float32)
    )
    env.set_weights([0, 1], {"params": params, "norm": norm})
    assert env._opp_version[0] > 0 and env._opp_version[2] == 0
    # mixed random/policy opponents step without error
    for t in range(8):
        masks = env.get_action_masks()
        acts = np.array(
            [rng.choice(np.nonzero(m)[0]) for m in masks]
        )
        obs, rewards, dones, infos = env.step(acts)
    env.close()


def test_ppo_player_masked_connect4():
    """--play path on the masked connect4 self-play env: the player must
    sample only legal columns (players.py get_masked_action role) and
    complete games (an illegal move would crash pettingzoo)."""
    pytest.importorskip("pettingzoo")
    import yaml

    from rl_games_tpu.common.player import PpoPlayer

    with open(
        "rl_games_tpu/configs/ref/ma/ppo_connect4_self_play.yaml"
    ) as f:
        params = yaml.safe_load(f)["params"]
    cfg = params["config"]
    cfg["num_actors"] = 2
    cfg["player"] = {
        "games_num": 3, "max_steps": 200, "deterministic": False,
    }
    player = PpoPlayer(params)
    assert player.is_host_env and player.use_action_masks
    reward = player.run()
    assert -1.0 <= reward <= 1.0


def test_host_env_mesh_warns_and_is_ignored():
    """make_train_fn(mesh=...) on a host-stepped env: the mesh cannot apply
    (host envs run the single-process split-placement path) — the user is
    warned instead of silently getting a no-op (algos/ppo.py make_train_fn)."""
    import warnings

    from rl_games_tpu.parallel.mesh import create_mesh

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
            "env_name": "CartPole-v1", "vecenv_type": "GYMNASIUM",
            "num_actors": 4, "horizon_length": 8, "minibatch_size": 32,
            "mini_epochs": 1, "learning_rate": 3e-4, "e_clip": 0.2,
            "clip_value": True, "gamma": 0.99, "tau": 0.95,
            "critic_coef": 1.0, "entropy_coef": 0.0, "grad_norm": 1.0,
            "truncate_grads": True, "normalize_advantage": True,
            "normalize_input": False, "normalize_value": False,
            "value_bootstrap": False, "seed": 3, "env_config": {"seed": 3},
        },
    }
    agent = PPOAgent("t_mesh_warn", params)
    assert agent.is_host_env
    mesh = create_mesh()
    with pytest.warns(UserWarning, match="mesh is ignored"):
        fn = agent.make_train_fn(mesh=mesh)
    assert fn == agent.host_train_epoch
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no warning without a mesh
        agent.make_train_fn()
