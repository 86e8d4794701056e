"""Unit tests for running stats, losses, schedulers, masked utils,
distributions — validated against torch reference math where available."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rl_games_tpu.ops import losses, masked, divergence
from rl_games_tpu.ops.running_stats import (
    rms_init,
    rms_normalize,
    rms_denormalize,
    rms_update_from_batch,
    moving_init,
    moving_update,
    moving_normalize,
)
from rl_games_tpu.ops.schedulers import (
    AdaptiveScheduler,
    LinearScheduler,
    IdentityScheduler,
    build_scheduler,
)
from rl_games_tpu.models import distributions as D


# ---------------------------------------------------------------- running stats
def test_rms_converges_to_batch_stats():
    rng = np.random.default_rng(0)
    data = (rng.normal(size=(50, 64, 7)) * 3.0 + 2.5).astype(np.float32)
    state = rms_init(7)
    for batch in data:
        state = rms_update_from_batch(state, jnp.asarray(batch))
    np.testing.assert_allclose(
        np.asarray(state.mean), data.reshape(-1, 7).mean(0), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(state.var), data.reshape(-1, 7).var(0), rtol=5e-2, atol=5e-2
    )


def test_rms_normalize_denormalize_roundtrip():
    state = rms_init(4)
    state = rms_update_from_batch(
        state, jnp.asarray(np.random.default_rng(1).normal(size=(256, 4)), jnp.float32)
    )
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 4)), jnp.float32)
    y = rms_normalize(state, x)
    assert float(jnp.abs(y).max()) <= 5.0  # clamp (running_mean_std.py:111-113)
    x2 = rms_denormalize(state, y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-3, atol=1e-3)


def test_rms_masked_update_ignores_masked_rows():
    state_a = rms_init(3)
    state_b = rms_init(3)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(10, 3)), jnp.float32)
    garbage = jnp.concatenate([x, 1e6 * jnp.ones((5, 3))], axis=0)
    mask = jnp.concatenate([jnp.ones(10), jnp.zeros(5)])
    state_a = rms_update_from_batch(state_a, x)
    state_b = rms_update_from_batch(state_b, garbage, mask=mask)
    np.testing.assert_allclose(
        np.asarray(state_a.mean), np.asarray(state_b.mean), rtol=1e-4, atol=1e-5
    )


def test_moving_stats():
    state = moving_init(2)
    x = jnp.ones((16, 2)) * 4.0
    for _ in range(400):
        state = moving_update(state, x, decay=0.98)
    np.testing.assert_allclose(np.asarray(state.mean), [4.0, 4.0], atol=1e-2)
    y = moving_normalize(state, x)
    assert np.all(np.abs(np.asarray(y)) < 0.2)


# ---------------------------------------------------------------------- losses
def test_actor_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    old_nl = rng.normal(size=100).astype(np.float32)
    new_nl = old_nl + rng.normal(size=100).astype(np.float32) * 0.2
    adv = rng.normal(size=100).astype(np.float32)

    got = np.asarray(losses.actor_loss(old_nl, new_nl, adv, True, 0.2))
    t_old, t_new, t_adv = map(torch.tensor, (old_nl, new_nl, adv))
    ratio = torch.exp(t_old - t_new)
    surr1 = t_adv * ratio
    surr2 = t_adv * torch.clamp(ratio, 0.8, 1.2)
    expected = torch.max(-surr1, -surr2).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_critic_loss_clipping():
    vp = jnp.asarray([1.0, 1.0])
    v = jnp.asarray([2.0, 1.05])
    ret = jnp.asarray([0.0, 0.0])
    out = losses.critic_loss(vp, v, 0.2, ret, clip_value=True)
    # clipped pred = 1.2 for the first, so loss = max(4.0, 1.44) = 4.0
    np.testing.assert_allclose(np.asarray(out), [4.0, 1.1025], rtol=1e-5)
    out2 = losses.critic_loss(vp, v, 0.2, ret, clip_value=False)
    np.testing.assert_allclose(np.asarray(out2), [4.0, 1.1025], rtol=1e-5)


def test_bound_loss():
    mu = jnp.asarray([[0.0, 1.2, -1.3]])
    out = losses.bound_loss(mu, soft_bound=1.1)
    np.testing.assert_allclose(
        np.asarray(out), [(1.2 - 1.1) ** 2 + (1.3 - 1.1) ** 2], rtol=1e-5
    )


def test_normalize_advantage_matches_torch_std():
    torch = pytest.importorskip("torch")
    adv = np.random.default_rng(5).normal(size=33).astype(np.float32)
    got = np.asarray(losses.normalize_advantage(jnp.asarray(adv)))
    t = torch.tensor(adv)
    expected = ((t - t.mean()) / (t.std() + 1e-8)).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_smooth_clamp_bounds():
    x = jnp.linspace(-3, 3, 101)
    y = losses.smooth_clamp(x, 0.8, 1.2)
    assert float(y.min()) >= 0.8 - 1e-5 and float(y.max()) <= 1.2 + 1e-5


# ---------------------------------------------------------------- divergences
def test_kl_normal_zero_for_identical():
    mu = jnp.ones((4, 3))
    sigma = jnp.full((4, 3), 0.5)
    kl = divergence.d_kl_normal((mu, sigma), (mu, sigma))
    np.testing.assert_allclose(np.asarray(kl), np.zeros(4), atol=1e-6)


def test_kl_discrete_matches_manual():
    logits_p = jax.nn.log_softmax(jnp.asarray([[1.0, 2.0, 0.5]]))
    logits_q = jax.nn.log_softmax(jnp.asarray([[0.2, 1.0, 1.5]]))
    kl = float(divergence.d_kl_discrete(logits_p, logits_q)[0])
    p = np.exp(np.asarray(logits_p[0]))
    expected = float((p * (np.asarray(logits_p[0]) - np.asarray(logits_q[0]))).sum())
    assert abs(kl - expected) < 1e-5
    assert kl > 0


# ----------------------------------------------------------------- schedulers
def test_adaptive_scheduler_bands():
    s = AdaptiveScheduler(kl_threshold=0.01, min_lr=1e-6, max_lr=1e-2)
    lr, _ = s.update(1e-4, 0.0, 0, 0, jnp.asarray(0.05))
    assert float(lr) == pytest.approx(1e-4 / 1.5)
    lr, _ = s.update(1e-4, 0.0, 0, 0, jnp.asarray(0.001))
    assert float(lr) == pytest.approx(1.5e-4)
    lr, _ = s.update(1e-4, 0.0, 0, 0, jnp.asarray(0.01))
    assert float(lr) == pytest.approx(1e-4)
    # clamps
    lr, _ = s.update(1e-6, 0.0, 0, 0, jnp.asarray(1.0))
    assert float(lr) == pytest.approx(1e-6)


def test_linear_scheduler_anneal():
    s = LinearScheduler(start_lr=1e-3, min_lr=1e-5, max_steps=100, use_epochs=True)
    lr0, _ = s.update(0, 0.0, jnp.asarray(0), 0, 0.0)
    lr50, _ = s.update(0, 0.0, jnp.asarray(50), 0, 0.0)
    lr200, _ = s.update(0, 0.0, jnp.asarray(200), 0, 0.0)
    assert float(lr0) == pytest.approx(1e-3)
    assert float(lr50) == pytest.approx(1e-5 + (1e-3 - 1e-5) * 0.5)
    assert float(lr200) == pytest.approx(1e-5)


def test_build_scheduler():
    assert isinstance(build_scheduler({}, 1e-4), IdentityScheduler)
    assert isinstance(
        build_scheduler({"lr_schedule": "adaptive", "kl_threshold": 0.02}, 1e-4),
        AdaptiveScheduler,
    )
    assert isinstance(
        build_scheduler({"lr_schedule": "linear", "max_epochs": 10}, 1e-4),
        LinearScheduler,
    )
    # reference rule (a2c_common.py:199-217): max_epochs == -1 falls back
    # to FRAME-based over max_frames; neither set -> identity
    s = build_scheduler(
        {"lr_schedule": "linear", "max_epochs": -1, "max_frames": 10_000_000},
        1e-4,
    )
    assert isinstance(s, LinearScheduler)
    assert not s.use_epochs and s.max_steps == 10_000_000
    # mid-anneal lr at half the frame budget, NOT collapsed to min_lr
    lr, _ = s.update(1e-4, 0.0, jnp.asarray(3), jnp.asarray(5_000_000), 0.0)
    assert abs(float(lr) - (1e-6 + (1e-4 - 1e-6) * 0.5)) < 1e-9
    assert isinstance(
        build_scheduler(
            {"lr_schedule": "linear", "max_epochs": -1, "max_frames": -1},
            1e-4,
        ),
        IdentityScheduler,
    )


# --------------------------------------------------------------------- masked
def test_explained_variance():
    y = jnp.asarray(np.random.default_rng(6).normal(size=500).astype(np.float32))
    assert float(masked.explained_variance(y, y)) == pytest.approx(1.0, abs=1e-5)
    noise = y + 0.1 * jnp.asarray(
        np.random.default_rng(7).normal(size=500).astype(np.float32)
    )
    ev = float(masked.explained_variance(noise, y))
    assert 0.9 < ev <= 1.0


def test_clip_fraction():
    old_nl = jnp.zeros(4)
    new_nl = jnp.asarray([0.0, -0.5, 0.5, 0.01])  # ratios: 1, e^.5, e^-.5, ~0.99
    frac = float(masked.policy_clip_fraction(new_nl, old_nl, 0.2))
    assert frac == pytest.approx(0.5)


# -------------------------------------------------------------- distributions
def test_normal_neglogp_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(8)
    x = rng.normal(size=(16, 6)).astype(np.float32)
    mu = rng.normal(size=(16, 6)).astype(np.float32)
    logstd = rng.normal(size=(16, 6)).astype(np.float32) * 0.3
    std = np.exp(logstd)
    got = np.asarray(D.normal_neglogp(x, mu, std, logstd))
    dist = torch.distributions.Normal(torch.tensor(mu), torch.tensor(std))
    expected = (-dist.log_prob(torch.tensor(x)).sum(-1)).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)
    ent = np.asarray(D.normal_entropy(jnp.asarray(logstd)))
    expected_ent = dist.entropy().sum(-1).numpy()
    np.testing.assert_allclose(ent, expected_ent, rtol=1e-4, atol=1e-4)


def test_categorical_masked():
    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    mask = jnp.asarray([[1, 0, 1, 0]])
    lp = D.categorical_log_probs(logits, mask)
    probs = np.exp(np.asarray(lp[0]))
    assert probs[1] < 1e-6 and probs[3] < 1e-6
    assert probs.sum() == pytest.approx(1.0, abs=1e-5)
    # sampling never picks masked actions
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    samples = np.asarray(
        jax.vmap(lambda k: D.categorical_sample(k, logits[0], mask[0]))(keys)
    )
    assert set(samples.tolist()) <= {0, 2}
    ent = float(D.categorical_entropy(logits, mask)[0])
    p0 = probs[0] / probs.sum()
    expected_ent = -(p0 * np.log(p0) + (1 - p0) * np.log(1 - p0))
    assert ent == pytest.approx(expected_ent, abs=1e-4)


def test_squashed_normal_logp_matches_torch_tanh_transform():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(9)
    mu = rng.normal(size=(8, 3)).astype(np.float32) * 0.5
    std = np.exp(rng.normal(size=(8, 3)).astype(np.float32) * 0.2)
    pre = (mu + std * rng.normal(size=(8, 3))).astype(np.float32)
    action = np.tanh(pre)
    got = np.asarray(D.squashed_normal_logp(action, mu, std, pre_tanh=pre))

    base = torch.distributions.Normal(torch.tensor(mu), torch.tensor(std))
    tdist = torch.distributions.TransformedDistribution(
        base, [torch.distributions.TanhTransform(cache_size=1)]
    )
    expected = tdist.log_prob(torch.tensor(action)).sum(-1).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-3)


def test_sigma_parametrization():
    raw = jnp.asarray([-10.0, 0.0, 5.0])
    sigma, logstd = D.apply_sigma_parametrization(
        raw, parametrization="exp", logstd_bounds=(-5.0, 2.0)
    )
    np.testing.assert_allclose(
        np.asarray(sigma), np.exp([-5.0, 0.0, 2.0]), rtol=1e-5
    )
    sigma2, logstd2 = D.apply_sigma_parametrization(
        raw, parametrization="softplus", min_sigma=0.01
    )
    assert np.all(np.asarray(sigma2) >= 0.01)
    np.testing.assert_allclose(np.asarray(logstd2), np.log(np.asarray(sigma2)), rtol=1e-3)


def test_twohot_roundtrip():
    bins = jnp.linspace(-5.0, 5.0, 33)
    x = jnp.asarray([-4.2, 0.0, 1.7, 4.9])
    enc = D.twohot_encode(x, bins)
    np.testing.assert_allclose(np.asarray(enc.sum(-1)), np.ones(4), rtol=1e-5)
    decoded = np.asarray((enc * bins).sum(-1))
    np.testing.assert_allclose(decoded, np.asarray(x), atol=1e-5)


def test_symlog_symexp_roundtrip():
    x = jnp.asarray([-100.0, -1.0, 0.0, 2.5, 1000.0])
    np.testing.assert_allclose(
        np.asarray(D.symexp(D.symlog(x))), np.asarray(x), rtol=1e-4
    )


def test_random_shift_transform():
    import jax
    from rl_games_tpu.common.transforms import random_shift

    key = jax.random.PRNGKey(0)
    obs = jax.random.normal(key, (4, 8, 8, 3))
    out = random_shift(key, obs, pad=2)
    assert out.shape == obs.shape
    # shifted crops draw from the padded original's value range
    assert float(jnp.abs(out).max()) <= float(jnp.abs(obs).max()) + 1e-6


def test_generalized_moving_stats_variants():
    """moving_mean_std.py:7-139 impl family."""
    import numpy as onp
    from rl_games_tpu.ops.running_stats import (
        generalized_moving_stats_init,
        generalized_moving_stats_normalize,
        generalized_moving_stats_update,
    )

    rng = onp.random.RandomState(0)
    x = jnp.asarray(rng.normal(3.0, 2.0, size=(512, 4)).astype("float32"))
    for impl in ("mean_std", "mean_std_corr", "min_max", "perc_ema",
                 "perc_ema_corr"):
        st = generalized_moving_stats_init((4,) if "mean" in impl else ())
        for _ in range(50):
            st = generalized_moving_stats_update(st, x, impl=impl, decay=0.9)
        y = generalized_moving_stats_normalize(st, x, impl=impl, decay=0.9)
        assert onp.isfinite(onp.asarray(y)).all(), impl
        if impl.startswith("mean_std"):
            # converged EMA ≈ true moments → normalized ~N(0,1)
            assert abs(float(y.mean())) < 0.2, impl
            assert abs(float(y.std()) - 1.0) < 0.2, impl
        else:
            # scale-family: normalized into a bounded range
            assert float(jnp.abs(y).max()) <= 5.0 + 1e-6, impl
    # denorm inverts
    st = generalized_moving_stats_init((4,))
    st = generalized_moving_stats_update(st, x, impl="mean_std", decay=0.5)
    y = generalized_moving_stats_normalize(st, x[:8], impl="mean_std")
    x2 = generalized_moving_stats_normalize(
        st, y, impl="mean_std", denorm=True
    )
    mask = onp.abs(onp.asarray(y)) < 4.9  # unclamped entries invert exactly
    onp.testing.assert_allclose(
        onp.asarray(x2)[mask], onp.asarray(x[:8])[mask], rtol=1e-4, atol=1e-4
    )


def test_twohot_log_prob_matches_torch_reference_formula():
    """twohot_log_prob follows the reference TwoHotDist.log_prob
    (distributions.py:80-93) including its width convention
    (range/255, NOT the exact bucket width range/254) — cross-checked
    through torch.distributions.OneHotCategorical."""
    torch = pytest.importorskip("torch")
    import numpy as onp
    from rl_games_tpu.models import distributions as D

    rng = onp.random.RandomState(1)
    logits = rng.normal(size=(32, 255)).astype("float32")
    targets = rng.uniform(-19.5, 19.5, size=(32,)).astype("float32")

    t_logits = torch.tensor(logits)
    dist = torch.distributions.OneHotCategorical(logits=t_logits)
    buckets = torch.linspace(-20.0, 20.0, steps=255)
    width = (buckets[-1] - buckets[0]) / 255
    x = (torch.tensor(targets) - buckets[0]) / width
    lo = torch.clip(x.to(torch.int64), min=0, max=253)
    hi = lo + 1
    w_lo, w_hi = torch.abs(x - hi), torch.abs(x - lo)
    lp_lo = dist.log_prob(
        torch.nn.functional.one_hot(lo, num_classes=255).float()
    )
    lp_hi = dist.log_prob(
        torch.nn.functional.one_hot(hi, num_classes=255).float()
    )
    expected = (w_lo * lp_lo + w_hi * lp_hi).numpy()

    got = onp.asarray(D.twohot_log_prob(jnp.asarray(logits),
                                        jnp.asarray(targets)))
    onp.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_twohot_value_logits_reach_the_loss():
    """The twohot value head's logits flow through forward_train so the
    PPO critic loss trains the distribution, not an MSE on the decoded
    value (common/layers/value.py:33-38)."""
    from rl_games_tpu.models import model_builder

    params = {
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": False,
            "value_head": "twohot",
            "space": {"continuous": {
                "mu_activation": "None", "sigma_activation": "None",
                "mu_init": {"name": "default"},
                "sigma_init": {"name": "const_initializer", "val": 0.0},
                "fixed_sigma": True,
            }},
            "mlp": {"units": [16], "activation": "relu",
                    "initializer": {"name": "default"}},
        },
    }
    model = model_builder.ModelBuilder().load(
        params, actions_num=2, input_shape=(3,), value_size=1,
        normalize_input=False, normalize_value=False,
    )
    net_params, norm = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)))
    res = model.forward_train(
        net_params, norm, jnp.zeros((4, 3)), jnp.zeros((4, 2))
    )
    assert "value_logits" in res
    assert res["value_logits"].shape == (4, 255)


def test_categorical_q_projection_matches_reference_loop():
    """C51 distr_projection vs a numpy oracle of the reference's per-atom
    scatter loop (rl_games/common/categorical.py:11-51), incl. terminal
    rows and boundary-clipped atoms."""
    from rl_games_tpu.ops.categorical import CategoricalQ

    rng = np.random.RandomState(3)
    B, A = 64, 51
    v_min, v_max, gamma = -10.0, 10.0, 0.9
    logits = rng.randn(B, A)
    next_distr = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    rewards = rng.uniform(-15, 15, B)  # some beyond [v_min, v_max]
    # exact-bin rewards exercise the u == l branch
    rewards[:8] = np.linspace(v_min, v_max, 8)
    dones = rng.rand(B) < 0.3

    # numpy oracle of the reference algorithm
    delta_z = (v_max - v_min) / (A - 1)
    expected = np.zeros_like(next_distr, dtype=np.float32)
    for atom in range(A):
        tz = np.clip(rewards + (v_min + atom * delta_z) * gamma, v_min, v_max)
        b = (tz - v_min) / delta_z
        lo, up = np.floor(b).astype(int), np.ceil(b).astype(int)
        eq = up == lo
        expected[eq, lo[eq]] += next_distr[eq, atom]
        ne = ~eq
        expected[ne, lo[ne]] += next_distr[ne, atom] * (up - b)[ne]
        expected[ne, up[ne]] += next_distr[ne, atom] * (b - lo)[ne]
    if dones.any():
        expected[dones] = 0.0
        tz = np.clip(rewards[dones], v_min, v_max)
        b = (tz - v_min) / delta_z
        lo, up = np.floor(b).astype(int), np.ceil(b).astype(int)
        rows = np.where(dones)[0]
        eq = up == lo
        expected[rows[eq], lo[eq]] = 1.0
        expected[rows[~eq], lo[~eq]] = (up - b)[~eq]
        expected[rows[~eq], up[~eq]] = (b - lo)[~eq]

    cq = CategoricalQ(A, v_min, v_max)
    got = np.asarray(jax.jit(cq.distr_projection)(
        jnp.asarray(next_distr), jnp.asarray(rewards), jnp.asarray(dones),
        gamma,
    ))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)
