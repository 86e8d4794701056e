"""DevicePong (envs/jax/pong.py): the Atari-Pong-class headline env.

Covers the semantics the reference's envpool Pong row depends on
(docs/ENVPOOL.md:65 — first-to-21, ±1 per point, 84x84 pixel obs): render
contents, wall/paddle bounce, scoring + re-serve, win termination, and —
critically — that the scripted opponent is beatable by edge-aim play (the
policy PPO must discover) and beats a passive agent."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from rl_games_tpu.envs.jax.pong import DevicePong, PongState
from rl_games_tpu.envs import registry

CFG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "rl_games_tpu", "configs", "ppo_pong_device.yaml",
)


def test_reset_and_render():
    env = DevicePong()
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (84, 84, 2)
    assert float(obs.min()) == 0.0 and float(obs.max()) == 1.0
    # ball at center, both paddles drawn at 0.75, no score bars yet
    assert float(obs[42, 42, 0]) == 1.0
    assert float(jnp.abs(obs[:2]).sum()) == 0.0
    assert float((obs == 0.75).sum()) > 0
    # at reset the frame stack is [now, now]
    assert float(jnp.abs(obs[..., 0] - obs[..., 1]).max()) == 0.0


def test_registry_binding():
    venv = registry.create_vec_env("DevicePong-v0", num_actors=4)
    info = venv.get_env_info()
    assert info.observation_space.shape == (84, 84, 2)
    assert info.action_space.n == 3
    state, obs = venv.reset(jax.random.PRNGKey(1))
    assert obs.shape == (4, 84, 84, 2)
    state, obs, rew, done, infos = venv.step(
        state, jnp.ones(4, jnp.int32)
    )
    assert rew.shape == (4,) and "time_outs" in infos


def _state(**kw):
    base = dict(
        ball_x=42.0, ball_y=42.0, vel_x=2.0, vel_y=0.0,
        prev_bx=42.0, prev_by=42.0, prev_ay=42.0, prev_oy=42.0,
        agent_y=42.0, opp_y=42.0,
        agent_score=0, opp_score=0,
    )
    base.update(kw)
    return PongState(**{
        k: (jnp.int32(v) if k.endswith("score") else jnp.float32(v))
        for k, v in base.items()
    })


def test_wall_bounce():
    env = DevicePong(frame_skip=1)
    s = _state(ball_y=1.0, vel_y=-2.0, vel_x=0.5)
    s2, *_ = env.step(s, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(s2.ball_y) == 1.0  # reflected off y=0
    assert float(s2.vel_y) == 2.0


def test_agent_paddle_bounce_and_spin():
    env = DevicePong(frame_skip=1)
    # ball arrives at the agent plane 3 px above the paddle center: bounce
    # with upward spin proportional to the contact offset
    s = _state(ball_x=79.0, ball_y=45.0, vel_x=2.0, vel_y=0.0, agent_y=42.0)
    s2, _, r, term, _ = env.step(s, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(r) == 0.0
    assert float(s2.vel_x) < 0  # reflected back
    assert abs(float(s2.vel_x)) == jnp.float32(2.0) * jnp.float32(1.05)
    assert float(s2.vel_y) == (45.0 - 42.0) / 4.0 * 3.0  # spin


def test_opponent_miss_scores_and_reserves():
    env = DevicePong(frame_skip=1)
    # ball crossing the opponent plane far from its paddle -> agent point
    s = _state(ball_x=4.0, ball_y=70.0, vel_x=-2.0, vel_y=0.0, opp_y=10.0)
    steps = 0
    r_total = 0.0
    while steps < 5:
        s, _, r, term, _ = env.step(s, jnp.int32(1), jax.random.PRNGKey(7))
        r_total += float(r)
        steps += 1
        if r_total != 0.0:
            break
    assert r_total == 1.0
    assert int(s.agent_score) == 1 and int(s.opp_score) == 0
    assert float(s.ball_x) == 42.0  # re-served from center
    assert float(s.vel_x) < 0  # toward the loser (the opponent receives)
    assert not bool(term)


def test_win_terminates_episode():
    env = DevicePong(frame_skip=1)
    s = _state(ball_x=4.0, ball_y=70.0, vel_x=-2.0, vel_y=0.0, opp_y=10.0,
               agent_score=20)
    for _ in range(5):
        s, _, r, term, _ = env.step(s, jnp.int32(1), jax.random.PRNGKey(3))
        if float(r) != 0.0:
            break
    assert int(s.agent_score) == 21
    assert bool(term)


def _scripted_rollout(offset, n_envs=16, steps=1500, seed=0, frame_skip=1):
    """Vectorized rollout of a ball-tracking policy aiming `offset` px off
    the paddle center (edge hits impart spin the opponent cannot track)."""
    env = DevicePong(frame_skip=frame_skip)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_envs)
    estate, _ = jax.vmap(env.reset)(keys)

    def body(carry, t):
        estate, key = carry
        key, sk = jax.random.split(key)
        sks = jax.random.split(sk, n_envs)
        d = estate.ball_y + offset - estate.agent_y
        act = jnp.where(d > 0.5, 2, jnp.where(d < -0.5, 0, 1)).astype(
            jnp.int32)
        estate, _, r, term, _ = jax.vmap(env.step)(estate, act, sks)
        a_win = term & (estate.agent_score >= env.WIN_SCORE)
        o_win = term & (estate.opp_score >= env.WIN_SCORE)
        rk = jax.random.split(jax.random.fold_in(key, t), n_envs)
        r_estate, _ = jax.vmap(env.reset)(rk)
        pick = lambda new, old: jnp.where(
            term.reshape(term.shape + (1,) * (old.ndim - 1)), new, old)
        estate = jax.tree.map(pick, r_estate, estate)
        return (estate, key), (r.sum(), a_win.sum(), o_win.sum())

    (_, _), (rews, awins, owins) = jax.lax.scan(
        body, (estate, jax.random.PRNGKey(seed + 1)), jnp.arange(steps))
    return float(rews.sum()), int(awins.sum()), int(owins.sum())


def test_opponent_beatable_by_edge_aim():
    # aiming 3.5 px off-center produces |vy| the 1.15-px/step opponent
    # cannot cover: the scripted edge-aimer must dominate (the existence
    # proof that PPO's target policy scores 20+). A 21-0 rout takes ~2.4k
    # steps, so run past that horizon to see complete wins.
    net, a_wins, o_wins = _scripted_rollout(offset=3.5, steps=3500)
    assert net > 300, f"edge-aim tracker should rack up points, got {net}"
    assert o_wins == 0
    assert a_wins >= 5


def test_frame_skip_accumulates_and_latches():
    """frame_skip=N runs N physics substeps per decision (MaxAndSkipEnv
    semantics): the reward of a point scored mid-block survives to the
    block result, termination latches, and max_episode_steps rescales."""
    env1 = DevicePong(frame_skip=1)
    env4 = DevicePong(frame_skip=4)
    assert env4.max_episode_steps == 8192 // 4
    assert DevicePong().max_episode_steps == 8192 // 2  # shipped default
    # same start state, deterministic physics up to the re-serve: 4 single
    # steps with the same action reach the same score as one skip-4 step
    # (ball at x=8 moving -2: the point lands on the 4th substep)
    s0 = _state(ball_x=8.0, ball_y=70.0, vel_x=-2.0, vel_y=0.0, opp_y=10.0)
    s4, _, r4, t4, _ = env4.step(s0, jnp.int32(1), jax.random.PRNGKey(9))
    s1 = s0
    r_acc = 0.0
    for k in jax.random.split(jax.random.PRNGKey(9), 4):
        s1, _, r, t, _ = env1.step(s1, jnp.int32(1), k)
        r_acc += float(r)
    assert float(r4) == r_acc == 1.0
    assert int(s4.agent_score) == int(s1.agent_score) == 1
    # termination latches across the block boundary
    sw = _state(ball_x=8.0, ball_y=70.0, vel_x=-2.0, vel_y=0.0, opp_y=10.0,
                agent_score=20)
    _, _, rw, tw, _ = env4.step(sw, jnp.int32(1), jax.random.PRNGKey(9))
    assert float(rw) == 1.0 and bool(tw)


def test_frame_stack_encodes_velocity_direction():
    """Channel 1 is the PREVIOUS decision's frame: mirror-image states
    with opposite ball velocity render identical current channels but
    different previous channels — direction is channel-separable (and
    survives a saturating per-pixel normalizer, unlike an intensity
    trail; envs/jax/pong.py module docstring)."""
    env = DevicePong(frame_skip=2)
    s0 = _state(ball_x=40.0, ball_y=30.0, vel_x=2.0, vel_y=0.0)
    s1 = _state(ball_x=48.0, ball_y=30.0, vel_x=-2.0, vel_y=0.0)
    k = jax.random.PRNGKey(0)
    n0, o0, *_ = env.step(s0, jnp.int32(1), k)
    n1, o1, *_ = env.step(s1, jnp.int32(1), k)
    # both balls end at x=44: identical current frames away from the
    # opponent plane (the scripted opponent reacts to inbound vs outbound,
    # so its own paddle differs — crop it out)
    np.testing.assert_array_equal(np.asarray(o0[:, 10:, 0]),
                                  np.asarray(o1[:, 10:, 0]))
    # previous frames differ (ball was at 40 vs 44)
    assert float(jnp.abs(o0[..., 1] - o1[..., 1]).sum()) > 0
    assert float(n0.prev_bx) == 40.0 and float(n1.prev_bx) == 48.0


def test_opponent_beatable_at_default_frame_skip():
    # the shipped default is frame_skip 2 (4 px paddle moves per
    # decision): edge-aim play must still dominate at that granularity
    net, a_wins, o_wins = _scripted_rollout(
        offset=3.5, steps=1800, frame_skip=2)
    assert net > 100, f"skip-2 edge-aimer should win points, got {net}"
    assert o_wins == 0


def test_passive_agent_loses():
    net, a_wins, o_wins = _scripted_rollout(offset=0.0, steps=300)
    # a plain tracker is roughly break-even-or-better; a passive agent
    # (simulated by tracking a fixed far point) must lose
    env = DevicePong()
    keys = jax.random.split(jax.random.PRNGKey(5), 8)
    estate, _ = jax.vmap(env.reset)(keys)
    total = 0.0
    key = jax.random.PRNGKey(6)
    for _ in range(400):
        key, sk = jax.random.split(key)
        sks = jax.random.split(sk, 8)
        estate, _, r, term, _ = jax.vmap(env.step)(
            estate, jnp.ones(8, jnp.int32), sks)
        total += float(r.sum())
    assert total < -20, f"passive agent should bleed points, got {total}"


def test_pong_config_builds_and_trains_one_epoch():
    """The shipped ppo_pong_device.yaml loads through the Runner, builds the
    nature-CNN agent, and completes a (shrunk) jitted epoch with finite
    losses — the same smoke contract as the ref-config zoo."""
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


def test_spin_caps_agent_and_opponent():
    """Outgoing spin is clamped: the hit window extends 1 px past the
    paddle edge, so uncapped spin reached 1.25x BALL_VY_MAX; the
    opponent's cap is lower still (OPP_VY_MAX) so its returns are always
    coverable — losses are skill, never an ace lottery (class docstring)."""
    env = DevicePong(frame_skip=1)
    # agent hit at the very edge of the window (offset +5): vy capped at 3.0
    s = _state(ball_x=79.0, ball_y=47.0, vel_x=2.0, vel_y=0.0, agent_y=42.0)
    s2, *_ = env.step(s, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(s2.vel_x) < 0
    assert float(s2.vel_y) == env.BALL_VY_MAX
    # opponent hit at its window edge: vy capped at OPP_VY_MAX
    s = _state(ball_x=5.0, ball_y=47.0, vel_x=-2.0, vel_y=0.0, opp_y=42.0)
    s2, *_ = env.step(s, jnp.int32(1), jax.random.PRNGKey(0))
    assert float(s2.vel_x) > 0
    assert float(s2.vel_y) == env.OPP_VY_MAX
