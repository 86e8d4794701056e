"""KL divergences for adaptive-LR scheduling.

Reference: rl_games/common/divergence.py.
"""

import jax.numpy as jnp


def d_kl_discrete(p_logits, q_logits):
    """Categorical KL(p||q) from *log-probabilities* (divergence.py:6-13).

    Like the reference, inputs must already be normalized log-probs.
    """
    logits_diff = p_logits - q_logits
    p_probs = jnp.exp(p_logits)
    return (p_probs * logits_diff).sum(-1)


def d_kl_discrete_list(p_list, q_list):
    """Summed KL over a multi-discrete head list (divergence.py:16-20)."""
    total = 0.0
    for p, q in zip(p_list, q_list):
        total = total + d_kl_discrete(p, q)
    return total


def d_kl_normal(p, q):
    """Diagonal-Gaussian KL(p||q); p/q = (mean, sigma) (divergence.py:22-29)."""
    p_mean, p_sigma = p
    q_mean, q_sigma = q
    mean_diff = jnp.square((q_mean - p_mean) / q_sigma)
    var_ratio = jnp.square(p_sigma / q_sigma)
    d_kl = 0.5 * (var_ratio + mean_diff - 1.0 - jnp.log(var_ratio))
    return d_kl.sum(-1)


def policy_kl_approx(new_neglogp, old_neglogp):
    """Discrete PPO KL approximation 0.5*mean((dlogp)^2)
    (a2c_discrete.py:192-196)."""
    return 0.5 * jnp.square(old_neglogp - new_neglogp)
