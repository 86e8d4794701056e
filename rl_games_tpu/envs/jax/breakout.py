"""Device-resident Breakout: the second Atari-class pixel benchmark env.

The reference's second Atari headline row is "Breakout score 400+ in
~15 min" (docs/ENVPOOL.md:66, configs/atari/ppo_breakout_envpool.yaml) on
the external envpool/ALE emulator, which this image does not carry. This
env is the TPU-native stand-in, built with every lesson from DevicePong
(envs/jax/pong.py — the design findings are documented in docs/ATARI.md):

- ALE-Breakout scoring: a 6-row x 12-column brick wall; rows score
  (top->bottom) 7,7,4,4,1,1 per brick, so a full board is 312 points and
  "400+" means clearing more than one board. The board REFILLS when
  cleared, exactly like ALE serving a fresh wall.
- 5 lives (ALE Breakout's life counter): losing the ball costs a life,
  the ball re-serves; the episode ends when lives run out. Life loss
  itself scores 0 (ALE semantics; the reference trains with
  reward_shaper min/max clipping on brick rewards only).
- Observation: 84x84x2 frame stack (current + previous decision frame)
  rendered inside the jitted step — the channel form survives per-pixel
  normalizer clamping (pong.py module docstring).
- frame_skip=2 MaxAndSkipEnv semantics, Discrete(3) {left, stay, right}.
- Paddle-position spin control with capped outgoing |vy| and |vx|: the
  contact offset steers the ball (the skill mechanism for tunneling into
  the wall), and the caps keep every trajectory coverable by the paddle
  speed — returns are skill, never an uncatchable-ball lottery
  (the DevicePong OPP_VY_MAX finding, applied to geometry here).

Reward scale: the per-brick row values are emitted raw (1/4/7) and the
shipped config trains on them unshaped with normalize_value — the
episode return IS the ALE game score, so the trainer's score meter and
deterministic playback read directly against the reference's "400+" row
(no clipped-vs-raw bookkeeping split). The env also accumulates the
score in its state for the on-screen score bar.
"""

import jax
import jax.numpy as jnp
from flax import struct

from rl_games_tpu.envs.jax.base import JaxEnv
from rl_games_tpu.envs.spaces import Box, Discrete, EnvInfo

N_ROWS = 6
N_COLS = 12
# ALE Breakout row scoring, top row first
ROW_VALUES = (7.0, 7.0, 4.0, 4.0, 1.0, 1.0)
BOARD_SCORE = float(sum(v * N_COLS for v in ROW_VALUES))  # 312


@struct.dataclass
class BreakoutState:
    ball_x: jnp.ndarray   # f32 scalars, pixels
    ball_y: jnp.ndarray   # y grows DOWNWARD (row index); paddle at bottom
    vel_x: jnp.ndarray
    vel_y: jnp.ndarray
    prev_bx: jnp.ndarray  # previous decision's render state (frame stack)
    prev_by: jnp.ndarray
    prev_px: jnp.ndarray
    paddle_x: jnp.ndarray
    bricks: jnp.ndarray     # [N_ROWS, N_COLS] bool alive mask
    prev_bricks: jnp.ndarray
    lives: jnp.ndarray      # int32, starts at 5
    score: jnp.ndarray      # f32 unclipped game score
    serve_pending: jnp.ndarray  # bool: ball dead, serves next substep


class DeviceBreakout(JaxEnv):
    """ALE-Breakout-class brick game on an 84x84x2 frame stack.

    Geometry (84x84, y down): brick wall rows occupy y in
    [WALL_TOP, WALL_TOP + N_ROWS*BRICK_H); the paddle line is at
    y = PADDLE_PLANE near the bottom; side/top walls reflect.
    """

    H = 84
    W = 84
    WALL_TOP = 14.0          # below the 2 score rows + a gap
    BRICK_H = 4.0
    BRICK_W = 7.0            # 12 * 7 = 84 exactly
    PADDLE_HALF = 6.0        # paddle spans center ± 6 px
    PADDLE_SPEED = 3.0       # px per physics frame
    PADDLE_PLANE = 78.0
    BALL_SPEED = 2.2         # constant |v| magnitude (ALE's ball doesn't
                             # accelerate per hit until brick-count stages)
    VY_MIN = 1.1             # steering cap: |vx| <= sqrt(s^2 - VY_MIN^2),
                             # so the ball always makes vertical progress
    LIVES = 5
    WIN_SCORE = None

    # a full clear of two boards at ~1 brick per ~30 frames needs ~15k
    # physics frames; 5 lives of play bound well under this
    max_episode_steps = 8192

    def __init__(self, frame_skip: int = 2):
        self.frame_skip = int(frame_skip)
        self.max_episode_steps = 16384 // self.frame_skip

    def env_info(self):
        return EnvInfo(
            observation_space=Box(shape=(self.H, self.W, 2), low=0.0,
                                  high=1.0),
            action_space=Discrete(n=3),
        )

    # -- serve ----------------------------------------------------------
    def _serve(self, key):
        """Ball appears above the paddle moving DOWN at a random angle
        (ALE serves from the wall side; serving low keeps the first
        bounce a player action)."""
        kx, ka = jax.random.split(key)
        bx = jax.random.uniform(kx, (), minval=20.0, maxval=64.0)
        vx = jax.random.uniform(ka, (), minval=-1.2, maxval=1.2)
        vy = jnp.sqrt(self.BALL_SPEED**2 - vx * vx)
        return bx, jnp.float32(50.0), vx.astype(jnp.float32), vy

    def reset(self, key):
        bx, by, vx, vy = self._serve(key)
        bricks = jnp.ones((N_ROWS, N_COLS), bool)
        c = jnp.float32(self.W / 2)
        state = BreakoutState(
            ball_x=bx, ball_y=by, vel_x=vx, vel_y=vy,
            prev_bx=bx, prev_by=by, prev_px=c,
            paddle_x=c, bricks=bricks, prev_bricks=bricks,
            lives=jnp.int32(self.LIVES), score=jnp.float32(0.0),
            serve_pending=jnp.bool_(False),
        )
        return state, self._render(state)

    # -- render ---------------------------------------------------------
    def _frame(self, ball_x, ball_y, paddle_x, bricks, lives,
               score) -> jnp.ndarray:
        rows = jnp.arange(self.H, dtype=jnp.float32)[:, None]
        cols = jnp.arange(self.W, dtype=jnp.float32)[None, :]
        img = jnp.zeros((self.H, self.W), jnp.float32)
        # status strip: lives as 3-px blocks from the left, score bar
        # (score/BOARD_SCORE of the width) on row 1 — ALE draws both
        img = jnp.where(
            (rows < 1.0) & (cols < 3.0 * lives), 0.25, img
        )
        img = jnp.where(
            (rows >= 1.0) & (rows < 2.0)
            & (cols < self.W * score / (2.0 * BOARD_SCORE)),
            0.25, img,
        )
        # brick wall: brick (r, c) alive -> its 4x7 cell lit at 0.6
        r_idx = jnp.clip(
            ((rows - self.WALL_TOP) / self.BRICK_H).astype(jnp.int32),
            0, N_ROWS - 1,
        )
        c_idx = jnp.clip(
            (cols / self.BRICK_W).astype(jnp.int32), 0, N_COLS - 1
        )
        in_wall = (rows >= self.WALL_TOP) & (
            rows < self.WALL_TOP + N_ROWS * self.BRICK_H
        )
        alive = bricks[r_idx, c_idx]
        img = jnp.where(in_wall & alive, 0.6, img)
        # paddle + ball
        img = jnp.where(
            (jnp.abs(rows - self.PADDLE_PLANE - 1.0) <= 1.0)
            & (jnp.abs(cols - paddle_x) <= self.PADDLE_HALF),
            0.8, img,
        )
        img = jnp.where(
            (jnp.abs(rows - ball_y) <= 1.0) & (jnp.abs(cols - ball_x) <= 1.0),
            1.0, img,
        )
        return img

    def _render(self, s: BreakoutState) -> jnp.ndarray:
        now = self._frame(s.ball_x, s.ball_y, s.paddle_x, s.bricks,
                          s.lives, s.score)
        prev = self._frame(s.prev_bx, s.prev_by, s.prev_px, s.prev_bricks,
                           s.lives, s.score)
        return jnp.stack([now, prev], axis=-1)

    # -- dynamics -------------------------------------------------------
    def step(self, s: BreakoutState, action, key):
        """frame_skip physics substeps per decision (MaxAndSkipEnv);
        rewards accumulate, termination latches (pong.py:step)."""
        keys = jax.random.split(key, self.frame_skip)
        # frame-stack channel 1 = entity positions the policy saw last
        # decision; its lives/score status-strip pixels render CURRENT
        # values (static within a decision — intentional, learning-neutral)
        prev = (s.ball_x, s.ball_y, s.paddle_x, s.bricks)
        reward = jnp.float32(0.0)
        terminated = jnp.bool_(False)
        for i in range(self.frame_skip):
            s2, r, t = self._substep(s, action, keys[i])
            # post-terminal substeps are frozen (no state integration, no
            # reward): the no-post-terminal-reward invariant is structural,
            # not dependent on serve geometry (round-4 advisory)
            s = jax.tree.map(
                lambda new, old: jnp.where(terminated, old, new), s2, s
            )
            reward = reward + jnp.where(terminated, 0.0, r)
            terminated = terminated | t
        s = s.replace(prev_bx=prev[0], prev_by=prev[1], prev_px=prev[2],
                      prev_bricks=prev[3])
        return s, self._render(s), reward, terminated, {}

    def _substep(self, s: BreakoutState, action, key):
        move = (jnp.asarray(action, jnp.int32) - 1).astype(jnp.float32)
        paddle_x = jnp.clip(
            s.paddle_x + move * self.PADDLE_SPEED,
            self.PADDLE_HALF, self.W - 1 - self.PADDLE_HALF,
        )

        # pending serve (after a life loss): place a fresh ball this
        # substep instead of integrating the dead one
        sx, sy, svx, svy = self._serve(key)
        bx0 = jnp.where(s.serve_pending, sx, s.ball_x)
        by0 = jnp.where(s.serve_pending, sy, s.ball_y)
        vx = jnp.where(s.serve_pending, svx, s.vel_x)
        vy = jnp.where(s.serve_pending, svy, s.vel_y)

        bx = bx0 + vx
        by = by0 + vy

        # side walls
        lo, hi = jnp.float32(0.0), jnp.float32(self.W - 1)
        bx = jnp.where(bx < lo, -bx, bx)
        vx = jnp.where(bx0 + vx < lo, -vx, vx)
        over_r = bx > hi
        bx = jnp.where(over_r, 2.0 * hi - bx, bx)
        vx = jnp.where(over_r, -vx, vx)
        # ceiling (below the 2-row status strip)
        top = jnp.float32(2.0)
        hit_top = by < top
        by = jnp.where(hit_top, 2.0 * top - by, by)
        vy = jnp.where(hit_top, -vy, vy)

        # paddle bounce: position-controlled steering with capped |vx|
        # (see module docstring); the ball must be moving down and cross
        # the paddle plane with paddle overlap
        crossed = (by0 <= self.PADDLE_PLANE) & (by >= self.PADDLE_PLANE)
        hit_paddle = crossed & (vy > 0) & (
            jnp.abs(bx - paddle_x) <= self.PADDLE_HALF + 1.0
        )
        offset = jnp.clip(
            (bx - paddle_x) / self.PADDLE_HALF, -1.0, 1.0
        )
        new_vx = offset * jnp.sqrt(
            self.BALL_SPEED**2 - self.VY_MIN**2
        )
        new_vy = -jnp.sqrt(self.BALL_SPEED**2 - new_vx * new_vx)
        by = jnp.where(hit_paddle, 2.0 * self.PADDLE_PLANE - by, by)
        vx = jnp.where(hit_paddle, new_vx, vx)
        vy = jnp.where(hit_paddle, new_vy, vy)

        # brick collision at the ball's new cell (one brick per substep:
        # the ball moves <3 px per frame, under one 4x7 cell)
        r_idx = ((by - self.WALL_TOP) / self.BRICK_H).astype(jnp.int32)
        c_idx = (bx / self.BRICK_W).astype(jnp.int32)
        in_wall = (r_idx >= 0) & (r_idx < N_ROWS)
        c_idx = jnp.clip(c_idx, 0, N_COLS - 1)
        r_safe = jnp.clip(r_idx, 0, N_ROWS - 1)
        brick_alive = s.bricks[r_safe, c_idx] & in_wall
        bricks = s.bricks.at[r_safe, c_idx].set(
            jnp.where(brick_alive, False, s.bricks[r_safe, c_idx])
        )
        row_vals = jnp.asarray(ROW_VALUES, jnp.float32)
        brick_reward = jnp.where(brick_alive, row_vals[r_safe], 0.0)
        # brick bounce: reflection axis from the entry direction. Same brick
        # row but a different column means the ball came through a side face
        # -> flip vx; any row change is a top/bottom face -> flip vy (the
        # dominant ALE behavior; corner entries, where both indices change,
        # also flip vy). Per-substep motion is bounded under one 4x7 cell,
        # so the pre-step cell is adjacent and the comparison is exact.
        r_prev = ((by0 - self.WALL_TOP) / self.BRICK_H).astype(jnp.int32)
        c_prev = (bx0 / self.BRICK_W).astype(jnp.int32)
        c_raw = (bx / self.BRICK_W).astype(jnp.int32)
        side_entry = brick_alive & (r_prev == r_idx) & (c_prev != c_raw)
        vx = jnp.where(side_entry, -vx, vx)
        vy = jnp.where(brick_alive & ~side_entry, -vy, vy)

        # board cleared -> fresh wall (ALE serves a new board)
        cleared = ~bricks.any()
        bricks = jnp.where(cleared, jnp.ones_like(bricks), bricks)

        # ball below the paddle line and not caught -> life lost
        lost_ball = (by > jnp.float32(self.H - 1)) & ~hit_paddle
        lives = s.lives - lost_ball.astype(jnp.int32)
        terminated = lives <= 0

        score = s.score + brick_reward
        state = s.replace(
            ball_x=jnp.where(lost_ball, jnp.float32(self.W / 2), bx),
            ball_y=jnp.where(lost_ball, jnp.float32(50.0), by),
            vel_x=jnp.where(lost_ball, jnp.float32(0.0), vx),
            vel_y=jnp.where(lost_ball, jnp.float32(0.0), vy),
            paddle_x=paddle_x, bricks=bricks,
            lives=lives, score=score,
            # served this substep -> cleared; lost this substep -> set
            serve_pending=lost_ball,
        )
        return state, brick_reward, terminated
