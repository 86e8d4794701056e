"""Small helpers shared by the trainers and the players.

Kept in one place so the host rollout loop, BasePlayer and PPOAgent cannot
drift apart (they previously carried near-identical copies).
"""
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def to_device_obs(o: Any):
    """Host obs → device arrays. Dict obs pass through per-key; uint8 image
    obs cast to f32 — the reference's obs casting (a2c_common.py:540-575),
    applied identically at train and play time so inference sees one dtype.
    """
    return jax.tree.map(
        lambda x: jnp.asarray(x).astype(jnp.float32)
        if np.asarray(x).dtype == np.uint8
        else jnp.asarray(x),
        o,
    )


def sigma_override_blocked(is_continuous: bool,
                           network_cfg: dict) -> Optional[str]:
    """Why --sigma cannot apply, or None if it can (_override_sigma,
    torch_runner.py:52-60)."""
    if not is_continuous:
        return "Cannot set new sigma: action space is not continuous"
    fixed = (
        (network_cfg or {})
        .get("space", {})
        .get("continuous", {})
        .get("fixed_sigma", True)
    )
    if not fixed:
        return "Cannot set new sigma because fixed_sigma is False"
    return None


def fill_sigma_leaves(params: Any, sigma: float):
    """Fill every fixed-sigma parameter leaf with a constant — the raw
    'sigma' leaf is what the parametrization (exp/softplus) consumes,
    matching the reference's net.sigma.fill_()."""

    def repl(path, leaf):
        last = path[-1]
        key = getattr(last, "key", getattr(last, "name", None))
        if key == "sigma":
            return jnp.full_like(leaf, float(sigma))
        return leaf

    return jax.tree_util.tree_map_with_path(repl, params)
