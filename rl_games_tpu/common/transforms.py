"""Dataset transforms for soft augmentation.

Functional analogs of rl_games/common/transforms/transforms.py (the
reference's ImageDatasetTransform = replication-pad 4 + random crop, i.e.
the DrQ random-shift augmentation) in pure JAX, plus a vector-obs gaussian
variant so the consistency loss applies beyond image envs.
"""

import jax
import jax.numpy as jnp


def random_shift(key, obs, pad: int = 4):
    """DrQ-style random shift for [B, H, W, C] images: replication-pad by
    `pad`, crop back at a per-sample random offset (transforms.py:
    ImageDatasetTransform)."""
    b, h, w, c = obs.shape
    padded = jnp.pad(
        obs, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge"
    )
    k1, k2 = jax.random.split(key)
    ys = jax.random.randint(k1, (b,), 0, 2 * pad + 1)
    xs = jax.random.randint(k2, (b,), 0, 2 * pad + 1)

    def crop(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (h, w, c))

    return jax.vmap(crop)(padded, ys, xs)


def gaussian_noise(key, obs, std: float = 0.05):
    """Additive gaussian noise for vector observations."""
    return obs + std * jax.random.normal(key, obs.shape, obs.dtype)


def build_transform(cfg: dict):
    """name → transform fn taking (key, obs)."""
    name = cfg.get("name", "random_shift")
    if name in ("random_shift", "image"):
        pad = int(cfg.get("pad", 4))
        return lambda key, obs: random_shift(key, obs, pad)
    if name == "gaussian_noise":
        std = float(cfg.get("std", 0.05))
        return lambda key, obs: gaussian_noise(key, obs, std)
    raise ValueError(f"unknown soft-augmentation transform: {name}")
