"""Policy distributions: diagonal Gaussian, tanh-squashed Gaussian, masked
categorical, multi-discrete, and two-hot encodings.

Own implementations (no torch/distrax); math mirrors the reference:
  * Gaussian neglogp / entropy — rl_games/algos_torch/models.py:345-348,
    :227-230 (analytic KL lives in ops.divergence).
  * CategoricalMasked — rl_games/common/extensions/distributions.py:23-44.
  * SquashedNormal (SAC) — rl_games/algos_torch/sac_helper.py:7-55.
  * NormalTanhDistribution (Brax-style) — rl_games/algos_torch/models.py:486-562.
  * TwoHotDist — rl_games/common/extensions/distributions.py:62-93.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


# ---------------------------------------------------------------------------
# Diagonal Gaussian
# ---------------------------------------------------------------------------


def normal_neglogp(x, mean, std, logstd):
    """Exact reference formula (models.py:345-348), summed over action dim."""
    return (
        0.5 * jnp.square((x - mean) / std).sum(axis=-1)
        + 0.5 * _LOG_2PI * x.shape[-1]
        + logstd.sum(axis=-1)
    )


def normal_entropy(logstd):
    """Gaussian entropy summed over action dim (models.py:227)."""
    return (0.5 + 0.5 * _LOG_2PI + logstd).sum(axis=-1)


def normal_sample(key, mean, std):
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def apply_sigma_parametrization(
    raw,
    *,
    parametrization: str = "exp",
    min_sigma: float = 0.0,
    logstd_bounds=None,
):
    """Map the sigma head's raw output to (sigma, logstd).

    Port of models.py:266-286: 'exp' (optionally clamped / floored) or
    'softplus' (+ floor); logstd is recomputed from the final sigma so
    log-probs stay consistent.
    """
    if parametrization == "softplus":
        sigma = jax.nn.softplus(raw) + min_sigma
        return sigma, jnp.log(sigma)
    if logstd_bounds is not None:
        raw = jnp.clip(raw, logstd_bounds[0], logstd_bounds[1])
    sigma = jnp.exp(raw)
    if min_sigma > 0:
        sigma = sigma + min_sigma
        return sigma, jnp.log(sigma)
    return sigma, raw


# ---------------------------------------------------------------------------
# Categorical (with optional action masking)
# ---------------------------------------------------------------------------

_MASK_FILL = -1e8  # reference uses torch.finfo.min-ish -1e8 fill


def masked_logits(logits, mask: Optional[jnp.ndarray]):
    """Fill masked-out actions with a large negative (distributions.py:27-31)."""
    if mask is None:
        return logits
    return jnp.where(mask.astype(bool), logits, _MASK_FILL)


def categorical_log_probs(logits, mask: Optional[jnp.ndarray] = None):
    return jax.nn.log_softmax(masked_logits(logits, mask), axis=-1)


def categorical_neglogp(logits, actions, mask: Optional[jnp.ndarray] = None):
    logp = categorical_log_probs(logits, mask)
    act = actions.astype(jnp.int32)
    return -jnp.take_along_axis(logp, act[..., None], axis=-1).squeeze(-1)


def categorical_entropy(logits, mask: Optional[jnp.ndarray] = None):
    """Masked entropy: masked actions contribute zero (distributions.py:33-44)."""
    logp = categorical_log_probs(logits, mask)
    p = jnp.exp(logp)
    p_logp = p * logp
    if mask is not None:
        p_logp = jnp.where(mask.astype(bool), p_logp, 0.0)
    return -p_logp.sum(axis=-1)


def categorical_sample(key, logits, mask: Optional[jnp.ndarray] = None):
    return jax.random.categorical(key, masked_logits(logits, mask), axis=-1)


# ---------------------------------------------------------------------------
# Tanh-squashed Gaussian — SAC flavor (sac_helper.py TanhTransform caching)
# ---------------------------------------------------------------------------


def _atanh(x):
    return 0.5 * (jnp.log1p(x) - jnp.log1p(-x))


def squashed_normal_sample(key, mu, std):
    """rsample + tanh; returns (action, pre_tanh)."""
    pre = mu + std * jax.random.normal(key, mu.shape, mu.dtype)
    return jnp.tanh(pre), pre


def squashed_normal_logp(action, mu, std, pre_tanh=None, *, eps: float = 1e-6):
    """log pi(a) with tanh change-of-variables, summed over action dim.

    log|det J| = sum log(1 - tanh(u)^2); computed in the stable softplus form
    2*(log2 - u - softplus(-2u)) as torch's TanhTransform does
    (sac_helper.py:30-55).
    """
    if pre_tanh is None:
        clipped = jnp.clip(action, -1.0 + eps, 1.0 - eps)
        pre_tanh = _atanh(clipped)
    logstd = jnp.log(std)
    base = -(
        0.5 * jnp.square((pre_tanh - mu) / std) + 0.5 * _LOG_2PI + logstd
    )
    log_det = 2.0 * (math.log(2.0) - pre_tanh - jax.nn.softplus(-2.0 * pre_tanh))
    return (base - log_det).sum(axis=-1)


# ---------------------------------------------------------------------------
# NormalTanhDistribution — Brax-style (models.py:486-562)
# ---------------------------------------------------------------------------


class NormalTanhDistribution:
    """Policy with softplus-scaled std and tanh bijector (models.py:501-562)."""

    def __init__(self, loc, scale_raw, min_std: float = 0.001, var_scale: float = 1.0):
        self.loc = loc
        self.scale = (jax.nn.softplus(scale_raw) + min_std) * var_scale

    def sample(self, key):
        pre = self.loc + self.scale * jax.random.normal(key, self.loc.shape)
        return jnp.tanh(pre), pre

    def mode(self):
        return jnp.tanh(self.loc)

    def log_prob(self, action, pre_tanh=None):
        return squashed_normal_logp(action, self.loc, self.scale, pre_tanh)

    def entropy(self, key):
        """Sampled entropy with log-det correction (models.py:544-556)."""
        base_entropy = 0.5 + 0.5 * _LOG_2PI + jnp.log(self.scale)
        pre = self.loc + self.scale * jax.random.normal(key, self.loc.shape)
        log_det = 2.0 * (math.log(2.0) - pre - jax.nn.softplus(-2.0 * pre))
        return (base_entropy + log_det).sum(axis=-1)


# ---------------------------------------------------------------------------
# Two-hot / symlog (DreamerV3-style value targets)
# Reference: distributions.py:62-93, algos_torch/layers.py:59-82.
# ---------------------------------------------------------------------------


def symlog(x):
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def symexp(x):
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)


def twohot_encode(x, bins):
    """Encode scalars into two-hot weight vectors over `bins` (sorted 1D)."""
    x = jnp.clip(x, bins[0], bins[-1])
    idx_hi = jnp.clip(jnp.searchsorted(bins, x), 1, len(bins) - 1)
    idx_lo = idx_hi - 1
    lo, hi = bins[idx_lo], bins[idx_hi]
    w_hi = (x - lo) / jnp.maximum(hi - lo, 1e-8)
    w_lo = 1.0 - w_hi
    return _scatter_twohot(x.shape, len(bins), idx_lo, idx_hi, w_lo, w_hi)


def _scatter_twohot(shape, n_bins, idx_lo, idx_hi, w_lo, w_hi):
    one_lo = jax.nn.one_hot(idx_lo, n_bins) * w_lo[..., None]
    one_hi = jax.nn.one_hot(idx_hi, n_bins) * w_hi[..., None]
    return one_lo + one_hi


def twohot_decode(logits, bins):
    probs = jax.nn.softmax(logits, axis=-1)
    return (probs * bins).sum(axis=-1)


# the reference TwoHotDist's fixed bucket grid (distributions.py:72):
# 255 bins over [-20, 20] in symlog space
TWOHOT_BINS = jnp.linspace(-20.0, 20.0, 255)


def twohot_log_prob(logits, targets, bins=None):
    """TwoHotDist.log_prob (distributions.py:80-93): interpolated log-prob
    of scalar `targets` under the categorical over `bins`."""
    bins = TWOHOT_BINS if bins is None else bins
    width = (bins[-1] - bins[0]) / len(bins)
    x = (targets - bins[0]) / width
    lo = jnp.clip(x.astype(jnp.int32), 0, len(bins) - 2)
    hi = lo + 1
    w_lo = jnp.abs(x - hi)
    w_hi = jnp.abs(x - lo)
    logp = jax.nn.log_softmax(logits, axis=-1)
    lo_lp = jnp.take_along_axis(logp, lo[..., None], axis=-1)[..., 0]
    hi_lp = jnp.take_along_axis(logp, hi[..., None], axis=-1)[..., 0]
    return w_lo * lo_lp + w_hi * hi_lp


class OneHotDist:
    """Straight-through one-hot categorical (reference OneHotDist,
    distributions.py:47-58): samples flow gradients through the softmax
    probs (torch's OneHotCategoricalStraightThrough rsample), while mode()
    uses the reference's own identity-through-LOGITS trick
    (`_mode.detach() + logits - logits.detach()`, :56-58)."""

    def __init__(self, logits, unimix_ratio: float = 0.0):
        if unimix_ratio > 0.0:
            probs = jax.nn.softmax(logits, axis=-1)
            probs = (
                probs * (1.0 - unimix_ratio) + unimix_ratio / probs.shape[-1]
            )
            logits = jnp.log(probs)
        self.logits = logits

    def _straight_through(self, hard):
        probs = jax.nn.softmax(self.logits, axis=-1)
        return jax.lax.stop_gradient(hard - probs) + probs

    def mode(self):
        hard = jax.nn.one_hot(
            jnp.argmax(self.logits, axis=-1), self.logits.shape[-1]
        )
        # identity gradient w.r.t. the raw logits (reference :56-58), NOT
        # the softmax Jacobian — near-deterministic distributions keep
        # full-magnitude mode gradients
        return (
            jax.lax.stop_gradient(hard - self.logits) + self.logits
        )

    def sample(self, key):
        idx = jax.random.categorical(key, self.logits, axis=-1)
        hard = jax.nn.one_hot(idx, self.logits.shape[-1])
        return self._straight_through(hard)

    def log_prob(self, one_hot):
        return (jax.nn.log_softmax(self.logits, axis=-1) * one_hot).sum(-1)
