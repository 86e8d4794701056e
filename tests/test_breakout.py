"""DeviceBreakout (envs/jax/breakout.py): the Atari-Breakout-class env.

Pins the semantics behind the reference's second Atari headline row
(docs/ENVPOOL.md:66 — "Breakout 400+", ALE row scoring, 5 lives, board
refill), plus the existence proof that a scripted ball-tracker reaches
400+ class scores while a passive paddle bleeds lives."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from rl_games_tpu.envs.jax.breakout import (
    BOARD_SCORE, N_COLS, N_ROWS, ROW_VALUES, BreakoutState, DeviceBreakout,
)
from rl_games_tpu.envs import registry

CFG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "rl_games_tpu", "configs", "ppo_breakout_device.yaml",
)


def test_reset_render_and_registry():
    venv = registry.create_vec_env("DeviceBreakout-v0", num_actors=3)
    info = venv.get_env_info()
    assert info.observation_space.shape == (84, 84, 2)
    assert info.action_space.n == 3
    state, obs = venv.reset(jax.random.PRNGKey(0))
    assert obs.shape == (3, 84, 84, 2)
    # full wall lit at 0.6: 6 rows x 4 px x 84 cols
    assert int((np.asarray(obs[0, :, :, 0]) == 0.6).sum()) == 6 * 4 * 84
    # frame stack starts [now, now]
    np.testing.assert_array_equal(np.asarray(obs[0, ..., 0]),
                                  np.asarray(obs[0, ..., 1]))
    state, obs, rew, done, infos = venv.step(state, jnp.ones(3, jnp.int32))
    assert rew.shape == (3,) and "time_outs" in infos


def _state(env, **kw):
    base = dict(
        ball_x=42.0, ball_y=50.0, vel_x=0.0, vel_y=2.2,
        prev_bx=42.0, prev_by=50.0, prev_px=42.0,
        paddle_x=42.0, bricks=jnp.ones((N_ROWS, N_COLS), bool),
        lives=5, score=0.0, serve_pending=False,
    )
    base.update(kw)
    out = {}
    for k, v in base.items():
        if k in ("bricks",):
            out[k] = jnp.asarray(v, bool)
        elif k == "prev_bricks":
            out[k] = jnp.asarray(v, bool)
        elif k == "lives":
            out[k] = jnp.int32(v)
        elif k == "serve_pending":
            out[k] = jnp.bool_(v)
        else:
            out[k] = jnp.float32(v)
    out.setdefault("prev_bricks", out["bricks"])
    return BreakoutState(**out)


def test_brick_hit_scores_removes_reflects():
    env = DeviceBreakout(frame_skip=1)
    # ball moving up into the bottom brick row (rows 36-38 -> row index 5,
    # value 1); column 6 covers x in [42, 49)
    s = _state(env, ball_x=44.0, ball_y=39.0, vel_x=0.0, vel_y=-2.2)
    s2, _, r, term, _ = env.step(s, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(r) == 1.0
    assert not bool(s2.bricks[5, 6])
    assert float(s2.vel_y) > 0  # reflected down
    assert float(s2.score) == 1.0
    # top row is worth 7
    s = _state(env, ball_x=44.0, ball_y=19.0, vel_x=0.0, vel_y=-2.2)
    s2, _, r, *_ = env.step(s, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(r) == ROW_VALUES[0] == 7.0


def test_brick_side_entry_reflects_horizontally():
    env = DeviceBreakout(frame_skip=1)
    # ball moving horizontally inside the bottom brick row (y=37 -> row 5),
    # crossing the column-6 -> column-7 boundary at x=49: a side-face hit
    # must flip vx (not vy) so the ball cannot tunnel sideways along a row
    s = _state(env, ball_x=47.5, ball_y=37.0, vel_x=2.2, vel_y=0.0)
    s2, _, r, term, _ = env.step(s, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(r) == 1.0
    assert not bool(s2.bricks[5, 7])
    assert float(s2.vel_x) < 0  # horizontal reflection
    assert float(s2.vel_y) == 0.0  # vertical velocity untouched


def test_paddle_bounce_steers():
    env = DeviceBreakout(frame_skip=1)
    # ball falling onto the right paddle edge: reflects up with positive vx
    s = _state(env, ball_x=47.0, ball_y=77.0, vel_x=0.0, vel_y=2.2,
               paddle_x=42.0)
    s2, _, r, term, _ = env.step(s, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(s2.vel_y) < 0
    assert float(s2.vel_x) > 0.5
    # speed magnitude is conserved
    sp = float(jnp.sqrt(s2.vel_x**2 + s2.vel_y**2))
    assert abs(sp - env.BALL_SPEED) < 1e-5


def test_life_loss_and_termination():
    env = DeviceBreakout(frame_skip=1)
    # ball past the paddle with nobody home
    s = _state(env, ball_x=10.0, ball_y=82.5, vel_x=0.0, vel_y=2.2,
               paddle_x=70.0, lives=2)
    s2, _, r, term, _ = env.step(s, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(r) == 0.0  # ALE: losing a life scores 0
    assert int(s2.lives) == 1
    assert bool(s2.serve_pending)
    assert not bool(term)
    # next substep serves a fresh ball
    s3, _, _, _, _ = env.step(s2, jnp.int32(1), jax.random.PRNGKey(1))
    assert not bool(s3.serve_pending)
    assert float(s3.vel_y) != 0.0
    # last life -> terminated
    s = _state(env, ball_x=10.0, ball_y=82.5, vel_x=0.0, vel_y=2.2,
               paddle_x=70.0, lives=1)
    s2, _, _, term, _ = env.step(s, jnp.int32(1), jax.random.PRNGKey(0))
    assert bool(term) and int(s2.lives) == 0


def test_board_refill_on_clear():
    env = DeviceBreakout(frame_skip=1)
    bricks = jnp.zeros((N_ROWS, N_COLS), bool).at[5, 6].set(True)
    s = _state(env, ball_x=44.0, ball_y=39.0, vel_x=0.0, vel_y=-2.2,
               bricks=bricks, score=BOARD_SCORE - 1.0)
    s2, _, r, term, _ = env.step(s, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(r) == 1.0
    assert bool(s2.bricks.all())  # fresh wall
    assert float(s2.score) == BOARD_SCORE
    assert not bool(term)


def test_tracker_scores_400_class_while_passive_dies():
    """Existence proof for the 400+ row: a scripted ball-tracking paddle
    keeps the ball alive and clears boards (scores beyond one board's 312
    inside 3k decisions), while the passive paddle bleeds lives."""
    env = DeviceBreakout()
    N = 16
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    estate, _ = jax.vmap(env.reset)(keys)

    def body(carry, t):
        estate, key = carry
        key, sk = jax.random.split(key)
        sks = jax.random.split(sk, N)
        d = estate.ball_x - estate.paddle_x
        act = jnp.where(d > 1.0, 2, jnp.where(d < -1.0, 0, 1)).astype(
            jnp.int32)
        estate, _, r, term, _ = jax.vmap(env.step)(estate, act, sks)
        rk = jax.random.split(jax.random.fold_in(key, t), N)
        re_, _ = jax.vmap(env.reset)(rk)
        pick = lambda new, old: jnp.where(
            term.reshape(term.shape + (1,) * (old.ndim - 1)), new, old)
        estate = jax.tree.map(pick, re_, estate)
        return (estate, key), r.sum()

    (estate, _), rews = jax.lax.scan(
        body, (estate, jax.random.PRNGKey(1)), jnp.arange(2500))
    scores = np.asarray(estate.score)
    assert float(np.max(scores)) > 312, (
        f"tracker should clear a board, max score {scores.max()}"
    )
    assert float(rews.sum()) / N > 300

    # passive paddle: lives drain
    keys = jax.random.split(jax.random.PRNGKey(5), 8)
    estate, _ = jax.vmap(env.reset)(keys)
    key = jax.random.PRNGKey(6)
    dead = 0
    for t in range(600):
        key, sk = jax.random.split(key)
        sks = jax.random.split(sk, 8)
        estate, _, r, term, _ = jax.vmap(env.step)(
            estate, jnp.ones(8, jnp.int32), sks)
        dead += int(np.asarray(term).sum())
        rk = jax.random.split(jax.random.fold_in(key, t), 8)
        re_, _ = jax.vmap(env.reset)(rk)
        pick = lambda new, old: jnp.where(
            jnp.asarray(term).reshape((-1,) + (1,) * (old.ndim - 1)),
            new, old)
        estate = jax.tree.map(pick, re_, estate)
    assert dead >= 10


def test_breakout_config_builds_and_trains_one_epoch():
    from rl_games_tpu.runner import Runner

    with open(CFG) as f:
        doc = yaml.safe_load(f)
    runner = Runner()
    runner.load(doc)
    cfg = runner.params["config"]
    cfg.update(max_epochs=1, num_actors=8, horizon_length=8,
               minibatch_size=32, mini_epochs=1, save_frequency=0,
               print_stats=False)
    agent = runner.create_agent()
    state = agent.init_state()
    fn = agent.make_train_fn()
    state, metrics = fn(state)
    assert np.isfinite(float(metrics["a_loss"]))
    assert np.isfinite(float(metrics["c_loss"]))
