"""Device-resident pixel environment: the CNN-path learning fixture.

The reference proves its conv torsos end-to-end on Atari through envpool /
ALE (configs/atari/*, docs/ENVPOOL.md:65-66) — an external C++ simulator
this image does not carry. The TPU-native replacement keeps the *pixels on
the accelerator*: a tiny catch game whose observation is rendered as a
float image inside the jitted step, so the full pixel → conv torso → PPO
update path runs as one compiled program (no host round trips, no uint8
staging). Atari-class wrappers + the ATARI vecenv binding remain ready for
ale_py (envs/host/wrappers.py, envs/registry.py).

Game (the classic DeepMind "Catch" probe task): a ball falls one row per
step from a random top column; a 3-pixel paddle on the bottom row moves
left/stay/right. Episode ends when the ball reaches the paddle row —
reward +1 if the paddle overlaps the ball, else -1. Random play scores
≈ -0.6; a working conv torso reaches ≥ +0.9 in a few hundred epochs.
"""

import jax
import jax.numpy as jnp
from flax import struct

from rl_games_tpu.envs.jax.base import JaxEnv
from rl_games_tpu.envs.spaces import Box, Discrete, EnvInfo


@struct.dataclass
class CatchState:
    ball_row: jnp.ndarray  # int32 scalar
    ball_col: jnp.ndarray  # int32 scalar
    paddle_col: jnp.ndarray  # int32 scalar


class PixelCatcher(JaxEnv):
    """Catch on an HxWx1 float image rendered on device each step."""

    HEIGHT = 16
    WIDTH = 16
    PADDLE_HALF = 1  # paddle spans paddle_col ± 1

    max_episode_steps = HEIGHT + 1

    def env_info(self):
        return EnvInfo(
            observation_space=Box(
                shape=(self.HEIGHT, self.WIDTH, 1), low=0.0, high=1.0
            ),
            action_space=Discrete(n=3),
        )

    def _render(self, state: CatchState) -> jnp.ndarray:
        rows = jnp.arange(self.HEIGHT)[:, None]
        cols = jnp.arange(self.WIDTH)[None, :]
        ball = (rows == state.ball_row) & (cols == state.ball_col)
        paddle = (rows == self.HEIGHT - 1) & (
            jnp.abs(cols - state.paddle_col) <= self.PADDLE_HALF
        )
        img = jnp.where(ball, 1.0, 0.0) + jnp.where(paddle, 0.5, 0.0)
        return img[..., None].astype(jnp.float32)

    def reset(self, key):
        k1, k2 = jax.random.split(key)
        state = CatchState(
            ball_row=jnp.zeros((), jnp.int32),
            ball_col=jax.random.randint(k1, (), 0, self.WIDTH),
            paddle_col=jax.random.randint(
                k2, (), self.PADDLE_HALF, self.WIDTH - self.PADDLE_HALF
            ),
        )
        return state, self._render(state)

    def step(self, estate: CatchState, action, key):
        move = jnp.asarray(action, jnp.int32) - 1  # {0,1,2} -> {-1,0,+1}
        paddle_col = jnp.clip(
            estate.paddle_col + move,
            self.PADDLE_HALF,
            self.WIDTH - 1 - self.PADDLE_HALF,
        )
        ball_row = estate.ball_row + 1
        state = CatchState(
            ball_row=ball_row, ball_col=estate.ball_col, paddle_col=paddle_col
        )
        terminated = ball_row >= self.HEIGHT - 1
        caught = jnp.abs(estate.ball_col - paddle_col) <= self.PADDLE_HALF
        reward = jnp.where(
            terminated, jnp.where(caught, 1.0, -1.0), 0.0
        ).astype(jnp.float32)
        return state, self._render(state), reward, terminated, {}
