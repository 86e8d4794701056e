"""PPO/SAC loss functions, functional jnp ports of the reference math.

Reference: rl_games/common/common_losses.py (actor/critic/smooth-clamp/
decoupled losses) and rl_games/algos_torch/a2c_continuous.py:97-133,238-253
(loss assembly, bounds loss).
"""

import math

import jax.numpy as jnp


def critic_loss(value_preds, values, e_clip: float, returns, clip_value: bool):
    """Clipped value loss (common_losses.py:7-29). Returns per-element loss."""
    if clip_value:
        delta = values - value_preds
        value_pred_clipped = value_preds + jnp.clip(delta, -e_clip, e_clip)
        value_losses = jnp.square(values - returns)
        value_losses_clipped = jnp.square(value_pred_clipped - returns)
        return jnp.maximum(value_losses, value_losses_clipped)
    return jnp.square(returns - values)


def smooth_clamp(x, mi: float, mx: float):
    """Sigmoid-smoothed clamp (common_losses.py:32-38)."""
    return 1.0 / (1.0 + jnp.exp((-(x - mi) / (mx - mi) + 0.5) * 4.0)) * (mx - mi) + mi


def actor_loss(
    old_neglogp, neglogp, advantage, is_ppo: bool, e_clip: float
):
    """PPO clipped surrogate (common_losses.py:64-82). Per-element loss."""
    if is_ppo:
        ratio = jnp.exp(old_neglogp - neglogp)
        surr1 = advantage * ratio
        surr2 = advantage * jnp.clip(ratio, 1.0 - e_clip, 1.0 + e_clip)
        return jnp.maximum(-surr1, -surr2)
    return neglogp * advantage


def smoothed_actor_loss(
    old_neglogp, neglogp, advantage, is_ppo: bool, e_clip: float
):
    """Smooth-clamp surrogate variant (common_losses.py:41-61)."""
    if is_ppo:
        ratio = jnp.exp(old_neglogp - neglogp)
        surr1 = advantage * ratio
        surr2 = advantage * smooth_clamp(ratio, 1.0 - e_clip, 1.0 + e_clip)
        return jnp.maximum(-surr1, -surr2)
    return neglogp * advantage


def decoupled_actor_loss(
    behavior_neglogp, neglogp, proxy_neglogp, advantage, e_clip: float
):
    """Decoupled (proxy) PPO actor loss (common_losses.py:85-109)."""
    logratio = proxy_neglogp - neglogp
    pg1 = -advantage * jnp.exp(behavior_neglogp - neglogp)
    clipped_logratio = jnp.clip(
        logratio, math.log(1.0 - e_clip), math.log(1.0 + e_clip)
    )
    pg2 = -advantage * jnp.exp(clipped_logratio - proxy_neglogp + behavior_neglogp)
    return jnp.maximum(pg1, pg2)


def bound_loss(mu, soft_bound: float = 1.1):
    """Action-bounds penalty on the raw mu (a2c_continuous.py:244-253).

    Per-element squared excess beyond +-soft_bound, summed over actions.
    """
    mu_loss_high = jnp.square(jnp.clip(mu - soft_bound, 0.0, None))
    mu_loss_low = jnp.square(jnp.clip(mu + soft_bound, None, 0.0))
    return (mu_loss_high + mu_loss_low).sum(axis=-1)


def reg_loss(mu):
    """L2 regularization on mu (a2c_continuous.py:238-242)."""
    return jnp.square(mu).sum(axis=-1)


def normalize_advantage(advantage):
    """(adv - mean) / (std + 1e-8) (common_losses.py:112-118).

    Matches torch .std() which uses the unbiased (ddof=1) estimator.
    """
    mean = advantage.mean()
    n = advantage.size
    std = jnp.sqrt(advantage.var() * n / max(n - 1, 1)) + 1e-8
    return (advantage - mean) / std


def ppo_total_loss(a_loss, c_loss, entropy, b_loss, critic_coef, entropy_coef,
                   bounds_loss_coef):
    """Scalar loss assembly (a2c_continuous.py:97-133):
    a + 0.5*critic_coef*c - entropy_coef*entropy + bounds_loss_coef*b."""
    return (
        a_loss
        + 0.5 * critic_coef * c_loss
        - entropy_coef * entropy
        + bounds_loss_coef * b_loss
    )
