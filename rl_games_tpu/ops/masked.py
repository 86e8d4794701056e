"""Masked statistics and diagnostics utilities.

Reference: rl_games/algos_torch/torch_ext.py:157-220 (apply_masks, masked
mean/var, explained variance, policy clip fraction).
"""

from typing import Optional

import jax.numpy as jnp


def masked_mean(x, mask):
    """Sum(x*mask)/sum(mask) (torch_ext.py:178-181)."""
    m = mask.astype(jnp.float32)
    return (x * m).sum() / jnp.maximum(m.sum(), 1.0)


def masked_mean_var(x, mask):
    """Per-feature masked mean and (biased) variance (torch_ext.py:178-188)."""
    m = mask.astype(jnp.float32)
    m_exp = m.reshape(m.shape + (1,) * (x.ndim - m.ndim))
    total = jnp.maximum(m.sum(), 1.0)
    mean = (x * m_exp).sum(axis=0) / total
    var = (jnp.square(x - mean) * m_exp).sum(axis=0) / total
    return mean, var


def apply_masks(losses, mask: Optional[jnp.ndarray] = None):
    """Mean each loss under an optional mask (torch_ext.py:157-166).

    ``losses`` is a list of per-element loss arrays; returns list of scalars
    plus the sum of mask (or batch size) used.
    """
    if mask is not None:
        m = mask.astype(jnp.float32)
        total = jnp.maximum(m.sum(), 1.0)
        return [(l * m).sum() / total for l in losses]
    return [l.mean() for l in losses]


def explained_variance(y_pred, y_true, mask: Optional[jnp.ndarray] = None):
    """1 - Var[y-ypred]/Var[y] (torch_ext.py:190-208)."""
    if mask is not None:
        m = mask.astype(jnp.float32)
        total = jnp.maximum(m.sum(), 1.0)
        my = (y_true * m).sum() / total
        var_y = (jnp.square(y_true - my) * m).sum() / total
        diff = y_true - y_pred
        md = (diff * m).sum() / total
        var_d = (jnp.square(diff - md) * m).sum() / total
    else:
        var_y = y_true.var()
        var_d = (y_true - y_pred).var()
    return 1.0 - var_d / jnp.maximum(var_y, 1e-8)


def policy_clip_fraction(new_neglogp, old_neglogp, e_clip, mask=None):
    """Fraction of ratios clipped (torch_ext.py:210-220)."""
    ratio = jnp.exp(old_neglogp - new_neglogp)
    clipped = (jnp.abs(ratio - 1.0) > e_clip).astype(jnp.float32)
    if mask is not None:
        return masked_mean(clipped, mask)
    return clipped.mean()
