"""SAC replay-content correctness with deterministic fake host envs — the
reference's fake-env test discipline (tests/test_sac_correctness.py:27-183):
obs encode [env_id, episode, step] so every replay row is byte-checkable;
staggered episode lengths pin the autoreset semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rl_games_tpu.algos.sac import SACAgent, replay_size
from rl_games_tpu.envs.spaces import Box, EnvInfo


class _FakeHostEnv:
    """Deterministic staggered-episode host env. obs = [env_id, episode,
    step]; reward = 100*env_id + step; episode i of env e ends (terminates)
    after lengths[e] steps. Supports both autoreset modes:

    * same_step: done row returns the NEW episode's reset obs, true final
      obs in infos['final_observation'] (reference RayWorker / gymnasium
      SAME_STEP).
    * next_step: done row returns the TRUE final obs; the FOLLOWING step
      ignores the action, resets, returns reset obs with reward 0
      (gymnasium 1.x default; the row the trainer must skip).
    """

    is_host_env = True
    max_episode_steps = 1000

    def __init__(self, lengths, autoreset_mode="same_step", truncate=False):
        self.lengths = np.asarray(lengths)
        self.autoreset_mode = autoreset_mode
        self.truncate = truncate  # episode ends count as truncations
        self.n = len(lengths)
        self.step_count = np.zeros(self.n, np.int64)
        self.episode = np.zeros(self.n, np.int64)
        self.pending_reset = np.zeros(self.n, bool)

    def get_env_info(self):
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
        rewards = np.zeros(self.n, np.float32)
        if self.autoreset_mode == "next_step":
            # envs flagged pending reset ignore the action and reset
            resetting = self.pending_reset.copy()
            self.episode[resetting] += 1
            self.step_count[resetting] = 0
            self.pending_reset[resetting] = False
            stepping = ~resetting
        else:
            stepping = np.ones(self.n, bool)

        self.step_count[stepping] += 1
        rewards[stepping] = (
            100.0 * np.arange(self.n)[stepping] + self.step_count[stepping]
        )
        done = (self.step_count >= self.lengths) & stepping
        final = self._obs()  # obs after stepping, pre-reset

        if self.autoreset_mode == "same_step":
            self.episode[done] += 1
            self.step_count[done] = 0
        else:
            self.pending_reset |= done

        time_outs = done & self.truncate
        infos = {
            "time_outs": time_outs,
            "final_observation": final,
        }
        return self._obs(), rewards, done, infos


def _agent(vec_env, **over):
    cfg = {
        "env_name": "fake", "num_actors": vec_env.n,
        "num_steps_per_episode": 1, "batch_size": 8,
        "replay_buffer_size": 4096, "num_warmup_steps": 10**9,
        "utd_ratio": None, "num_updates_per_step": 1, "gamma": 0.99,
        "init_alpha": 1.0, "alpha_lr": 1e-3, "actor_lr": 1e-3,
        "critic_lr": 1e-3, "critic_tau": 0.005,
        "learnable_temperature": True, "normalize_input": True,
        "value_bootstrap": True, "seed": 3,
    }
    cfg.update(over)
    params = {
        "algo": {"name": "sac"},
        "model": {"name": "soft_actor_critic"},
        "network": {
            "name": "soft_actor_critic", "separate": True,
            "mlp": {"units": [16], "activation": "relu",
                    "initializer": {"name": "default"}},
            "log_std_bounds": [-5, 2],
        },
        "config": cfg,
    }
    return SACAgent("t", params, vec_env=vec_env)


def _run_epochs(agent, state, n):
    fn = agent.make_train_fn()
    for _ in range(n):
        state, m = fn(state)
    return state, m


def _replay_rows(state):
    n = int(replay_size(state.replay))
    return (
        np.asarray(state.replay.obses[:n]),
        np.asarray(state.replay.next_obses[:n]),
        np.asarray(state.replay.rewards[:n, 0]),
        np.asarray(state.replay.dones[:n, 0]),
        np.asarray(state.replay.truncated[:n, 0]),
    )


def _check_rows(obs, nxt, rew, dones):
    """Byte-level invariants that pin autoreset correctness."""
    for i in range(len(obs)):
        env_id, ep, step = obs[i]
        n_env, n_ep, n_step = nxt[i]
        # no cross-episode rows: next_obs continues the SAME episode
        assert n_env == env_id, (i, obs[i], nxt[i])
        assert n_ep == ep, f"cross-episode row {i}: {obs[i]} -> {nxt[i]}"
        assert n_step == step + 1, (i, obs[i], nxt[i])
        # reward matches the transition exactly (no zero reset-row rewards)
        assert rew[i] == 100.0 * env_id + step + 1, (i, obs[i], rew[i])


def test_same_step_replay_contents_exact():
    """Every replay row is a true within-episode transition with the TRUE
    final obs on done rows (reference :375-412)."""
    env = _FakeHostEnv([3, 5, 4, 7], autoreset_mode="same_step")
    agent = _agent(env)
    state = agent.init_state()
    state, _ = _run_epochs(agent, state, 20)
    obs, nxt, rew, dones, trunc = _replay_rows(state)
    assert len(obs) == 4 * (20 - 1)  # one transition pending in the pipeline
    _check_rows(obs, nxt, rew, dones)
    # termination rows: step reaches the episode length and done=True
    for i in np.nonzero(dones)[0]:
        env_id = int(obs[i][0])
        assert nxt[i][2] == env.lengths[env_id]


def test_staggered_next_step_skips_reset_rows():
    """next_step autoreset: the row following each done is a reset garbage
    row and must NOT enter replay (reference :351-412); staggered lengths
    make the skips land on different steps per env."""
    env = _FakeHostEnv([3, 5, 4, 7], autoreset_mode="next_step")
    agent = _agent(env)
    state = agent.init_state()
    state, _ = _run_epochs(agent, state, 24)
    obs, nxt, rew, dones, trunc = _replay_rows(state)
    assert len(obs) > 0
    _check_rows(obs, nxt, rew, dones)
    # rows were actually skipped: fewer than actors x ingested steps
    assert len(obs) < 4 * 23


def test_truncation_rows_bootstrap_not_done():
    """Truncated rows store done=False with the true final obs so the TD
    target bootstraps (reference :201-214)."""
    env = _FakeHostEnv([3, 5], autoreset_mode="same_step", truncate=True)
    agent = _agent(env)
    state = agent.init_state()
    state, _ = _run_epochs(agent, state, 12)
    obs, nxt, rew, dones, trunc = _replay_rows(state)
    assert trunc.sum() > 0
    # value_bootstrap: truncation-only episode ends never store done=True
    assert dones.sum() == 0


def test_normalizer_counts_each_frame_once():
    """The obs normalizer sees each fresh frame exactly once, never replay
    samples (reference :707-767)."""
    env = _FakeHostEnv([100, 100], autoreset_mode="same_step")
    agent = _agent(env, num_steps_per_episode=2)
    state = agent.init_state()
    c0 = int(state.obs_rms.count)
    n_epochs = 7
    state, _ = _run_epochs(agent, state, n_epochs)
    # pipelined host step: one transition pending -> (steps-1) ingested
    steps_ingested = n_epochs * 2 - 1
    assert int(state.obs_rms.count) - c0 == 2 * steps_ingested


def test_utd_accounting():
    """update_counter advances by num_updates_per_step per ingested env
    step once warmup ends (reference :609-620)."""
    env = _FakeHostEnv([100, 100, 100, 100], autoreset_mode="same_step")
    agent = _agent(
        env, num_warmup_steps=3, utd_ratio=0.5, num_steps_per_episode=1,
        batch_size=4,
    )
    assert agent.num_updates_per_step == 2  # 0.5 * 4 actors
    state = agent.init_state()
    state, _ = _run_epochs(agent, state, 10)
    # ingest at epoch e carries the transition from epoch e-1; updates are
    # gated on warmup at ingest time (epochs 4..10 ingest post-warmup)
    expected_update_steps = 10 - 3
    assert int(state.update_counter) == 2 * expected_update_steps


def test_set_param_preserves_pending_transition():
    """set_param invalidates the jitted host fns (gamma is baked into the
    compiled program) but must NOT drop the pipelined pending transition:
    every env step still lands in replay exactly once."""
    env = _FakeHostEnv([100, 100], autoreset_mode="same_step")
    agent = _agent(env, num_steps_per_episode=2)
    state = agent.init_state()
    state, _ = _run_epochs(agent, state, 5)
    state = agent.set_param("gamma", 0.95, state)
    state, _ = _run_epochs(agent, state, 5)
    obs, nxt, rew, dones, trunc = _replay_rows(state)
    # 10 epochs x 2 steps, one transition still pending in the pipeline
    assert len(obs) == 2 * (10 * 2 - 1)
    _check_rows(obs, nxt, rew, dones)


def test_resume_from_stripped_replay_pauses_updates(tmp_path):
    """Regression: resuming from a replay-stripped checkpoint (the default,
    replay_buffer_checkpoint=False) restores epoch >> warmup, so without a
    fill gate the agent would immediately run UTD updates against a
    near-empty fresh ring. The gate must hold updates until the resume
    floor of real rows has been re-collected (sac.py:_restore; the floor
    defaults to 5% of the ring — pinned to one batch here via
    replay_resume_min_fill so the row arithmetic below stays exact;
    tests/test_sac.py::test_stripped_resume_raises_update_gate covers the
    raised default)."""
    from rl_games_tpu.utils import checkpoint as ckpt

    env = _FakeHostEnv([1000, 1000])
    agent = _agent(env, num_warmup_steps=2, batch_size=8)
    state = agent.init_state()
    state, _ = _run_epochs(agent, state, 8)  # past warmup: updates running
    assert int(state.update_counter) > 0

    path = str(tmp_path / "sac.ckpt")
    ckpt.save_checkpoint(
        path, agent._ckpt_state(state),
        {"has_replay": agent.save_replay_buffer},
        weights=agent.get_weights(state),
    )

    env2 = _FakeHostEnv([1000, 1000])
    agent2 = _agent(env2, num_warmup_steps=2, batch_size=8,
                    replay_resume_min_fill=8)
    state2 = agent2.init_state()
    state2, _meta = agent2._restore(path, state2)
    assert int(replay_size(state2.replay)) == 0   # ring is fresh
    assert int(state2.epoch) == int(state.epoch)  # counters restored
    upd0 = int(state2.update_counter)

    fn = agent2.make_train_fn()
    # first epoch only primes the act/ingest pipeline; the next three ingest
    # 2, 4, 6 rows — all below min fill (batch_size=8): updates stay paused
    for _ in range(4):
        state2, _ = fn(state2)
        assert int(state2.update_counter) == upd0
    state2, _ = fn(state2)  # ingest #4: ring reaches 8 rows, gate opens
    assert int(state2.update_counter) > upd0
