"""Host wrapper-stack tests against a synthetic image env (no ale_py in the
image; the wrappers are env-agnostic)."""

import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

from rl_games_tpu.envs.host import wrappers as W


class FakeImageEnv(gym.Env):
    """64x48 RGB frames encoding the step counter; 'lives' supported."""

    def __init__(self, episode_len=20, lives=3):
        self.observation_space = gym.spaces.Box(
            0, 255, shape=(48, 64, 3), dtype=np.uint8
        )
        self.action_space = gym.spaces.Discrete(4)
        self.episode_len = episode_len
        self._lives = lives
        self.t = 0

    def lives(self):
        return self._lives

    def reset(self, **kwargs):
        self.t = 0
        self._lives = 3
        return self._frame(), {}

    def _frame(self):
        return np.full((48, 64, 3), self.t % 256, np.uint8)

    def step(self, action):
        self.t += 1
        if self.t % 7 == 0:
            self._lives -= 1
        terminated = self._lives <= 0 or self.t >= self.episode_len
        return self._frame(), float(self.t), terminated, False, {}


def test_warp_frame_and_stack():
    env = W.FrameStack(W.WarpFrame(FakeImageEnv()), 4)
    obs, _ = env.reset()
    assert obs.shape == (84, 84, 4)
    obs, r, term, trunc, info = env.step(0)
    assert obs.shape == (84, 84, 4)
    assert obs.dtype == np.uint8


def test_max_and_skip_accumulates_reward():
    env = W.MaxAndSkipEnv(FakeImageEnv(), skip=4)
    env.reset()
    obs, reward, *_ = env.step(0)
    assert reward == 1 + 2 + 3 + 4  # rewards accumulate over skipped frames


def test_clip_reward():
    env = W.ClipRewardEnv(FakeImageEnv())
    env.reset()
    _, r, *_ = env.step(0)
    assert r == 1.0  # sign(1)


def test_episodic_life():
    env = W.EpisodicLifeEnv(FakeImageEnv(episode_len=100))
    env.reset()
    terms = []
    for _ in range(16):
        _, _, terminated, truncated, _ = env.step(0)
        terms.append(terminated)
        if terminated:
            env.reset()
    assert any(terms)  # life loss at t=7 surfaces as termination


def test_time_limit_time_outs():
    env = W.TimeLimit(FakeImageEnv(episode_len=1000), max_episode_steps=5)
    env.reset()
    for i in range(5):
        _, _, terminated, truncated, info = env.step(0)
    assert truncated and info.get("time_outs")


def test_mask_velocity():
    cart = gym.make("CartPole-v1")
    env = W.MaskVelocityWrapper(cart, "CartPole-v1")
    obs, _ = env.reset(seed=0)
    assert obs[1] == 0.0 and obs[3] == 0.0
    with pytest.raises(ValueError):
        W.MaskVelocityWrapper(cart, "NotAnEnv-v0")


def test_full_deepmind_stack():
    env = W.wrap_deepmind(FakeImageEnv(episode_len=200))
    obs, _ = env.reset()
    assert obs.shape == (84, 84, 4)
    for _ in range(6):
        obs, r, term, trunc, _ = env.step(0)
        assert abs(r) <= 1.0
        if term or trunc:
            env.reset()


def test_frame_stack_flat_mode():
    env = W.FrameStack(
        gym.make("CartPole-v1"), k=3, flat=True
    )
    obs, _ = env.reset(seed=0)
    assert obs.shape == (12,)
