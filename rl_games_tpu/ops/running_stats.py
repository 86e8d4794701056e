"""Running mean/std normalization as a functional pytree.

Mirrors the reference's RunningMeanStd (rl_games/algos_torch/running_mean_std.py:
20-115): Welford/Chan parallel moment merge, clamp to +-5 after normalize,
denorm mode for value heads, ``norm_only`` variant, per-channel mode for image
observations, and a dict-observation variant (RunningMeanStdObs, :117-128)
realized by tree-mapping over a dict of states.

The reference keeps float64 stats with an int64 count; TPUs run fp32-first, so
stats are float32 with an int32 count (exact up to 2^31 frames) and the merge
is done in the numerically stable parallel-Welford form.
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningMeanStdState:
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray  # int32 scalar


def rms_init(shape: Sequence[int]) -> RunningMeanStdState:
    shape = tuple(shape) if not isinstance(shape, int) else (shape,)
    return RunningMeanStdState(
        mean=jnp.zeros(shape, jnp.float32),
        var=jnp.ones(shape, jnp.float32),
        count=jnp.ones((), jnp.int32),
    )


def rms_update(
    state: RunningMeanStdState,
    batch_mean: jnp.ndarray,
    batch_var: jnp.ndarray,
    batch_count,
) -> RunningMeanStdState:
    """Chan et al. parallel moment merge (reference :75-88)."""
    count_f = state.count.astype(jnp.float32)
    batch_count_f = jnp.asarray(batch_count, jnp.float32)
    tot = count_f + batch_count_f
    delta = batch_mean - state.mean
    new_mean = state.mean + delta * batch_count_f / tot
    m_a = state.var * count_f
    m_b = batch_var * batch_count_f
    m2 = m_a + m_b + jnp.square(delta) * count_f * batch_count_f / tot
    return RunningMeanStdState(
        mean=new_mean,
        var=m2 / tot,
        count=state.count + jnp.asarray(batch_count, jnp.int32),
    )


def _batch_axes(x: jnp.ndarray, stat_ndim: int) -> Tuple[int, ...]:
    """Leading axes of x that are reduced into the stats."""
    return tuple(range(x.ndim - stat_ndim))


def rms_update_from_batch(
    state: RunningMeanStdState,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> RunningMeanStdState:
    """Fold one batch of observations into the running stats.

    ``x`` has shape [..., *stat_shape]; all leading axes are batch. With a
    mask (shape = batch axes), masked rows do not contribute (reference
    torch_ext.get_mean_var_with_masks used at running_mean_std.py:92-94).
    The reference counts ``input.size(0)`` samples per update; here the count
    is the full (or masked) batch element count.
    """
    axes = _batch_axes(x, state.mean.ndim)
    x = x.astype(jnp.float32)
    if mask is None:
        batch_mean = x.mean(axis=axes)
        batch_var = x.var(axis=axes)
        batch_count = 1
        for a in axes:
            batch_count *= x.shape[a]
        batch_count = jnp.asarray(batch_count, jnp.float32)
    else:
        m = mask.astype(jnp.float32)
        m_exp = m.reshape(m.shape + (1,) * state.mean.ndim)
        total = jnp.maximum(m.sum(), 1.0)
        batch_mean = (x * m_exp).sum(axis=axes) / total
        batch_var = (jnp.square(x - batch_mean) * m_exp).sum(axis=axes) / total
        batch_count = total
    return rms_update(state, batch_mean, batch_var, batch_count)


def rms_normalize(
    state: RunningMeanStdState,
    x: jnp.ndarray,
    *,
    norm_only: bool = False,
    clamp: float = 5.0,
) -> jnp.ndarray:
    """Normalize (reference :104-114): (x - mean)/sqrt(var+eps), clamp +-5."""
    eps = 1e-05
    std = jnp.sqrt(state.var + eps)
    if norm_only:
        return x / std
    y = (x - state.mean) / std
    return jnp.clip(y, -clamp, clamp)


def rms_denormalize(
    state: RunningMeanStdState, x: jnp.ndarray, *, clamp: float = 5.0
) -> jnp.ndarray:
    """Denorm mode (reference :104-107): clamp, then y*sqrt(var+eps)+mean."""
    eps = 1e-05
    y = jnp.clip(x, -clamp, clamp)
    return jnp.sqrt(state.var + eps) * y + state.mean


def rms_init_obs(shapes) -> dict:
    """Dict-observation variant: one state per key (reference :117-128)."""
    return {k: rms_init(v) for k, v in shapes.items()}


def rms_normalize_obs(states: dict, obs: dict, **kw) -> dict:
    return {k: rms_normalize(states[k], v, **kw) for k, v in obs.items()}


def rms_update_obs(states: dict, obs: dict, mask=None) -> dict:
    return {k: rms_update_from_batch(states[k], v, mask) for k, v in obs.items()}


# ---------------------------------------------------------------------------
# EMA-family moving statistics (reference rl_games/algos_torch/moving_mean_std.py)
# used for `normalize_rms_advantage`.
# ---------------------------------------------------------------------------


@struct.dataclass
class MovingMeanStdState:
    mean: jnp.ndarray
    var: jnp.ndarray
    step: jnp.ndarray  # int32, for zero-debias


def moving_init(shape) -> MovingMeanStdState:
    shape = tuple(shape) if not isinstance(shape, int) else (shape,)
    return MovingMeanStdState(
        mean=jnp.zeros(shape, jnp.float32),
        var=jnp.ones(shape, jnp.float32),
        step=jnp.zeros((), jnp.int32),
    )


def moving_update(
    state: MovingMeanStdState, x: jnp.ndarray, decay: float = 0.99
) -> MovingMeanStdState:
    """EMA mean/var update over all leading batch axes (moving_mean_std.py:32-60)."""
    axes = _batch_axes(x, state.mean.ndim)
    x = x.astype(jnp.float32)
    batch_mean = x.mean(axis=axes)
    batch_var = x.var(axis=axes)
    new_mean = decay * state.mean + (1.0 - decay) * batch_mean
    new_var = decay * state.var + (1.0 - decay) * batch_var
    return MovingMeanStdState(mean=new_mean, var=new_var, step=state.step + 1)


def moving_normalize(state: MovingMeanStdState, x: jnp.ndarray) -> jnp.ndarray:
    eps = 1e-05
    return (x - state.mean) / jnp.sqrt(state.var + eps)


# ---------------------------------------------------------------------------
# GeneralizedMovingStats — the full impl family (moving_mean_std.py:7-139):
# 'mean_std' (+ '_corr' zero-debias), 'min_max', 'perc_ema' (+ '_corr'),
# normalizing to (x - offset) / invscale clamped to ±5, denorm inverse.
# ---------------------------------------------------------------------------


@struct.dataclass
class GeneralizedMovingStatsState:
    low: jnp.ndarray   # mean for mean_std impls; low/offset otherwise
    high: jnp.ndarray  # E[x²] for mean_std impls; high otherwise
    step: jnp.ndarray  # int32 — drives the '_corr' zero-debias


def generalized_moving_stats_init(shape) -> GeneralizedMovingStatsState:
    shape = tuple(shape) if not isinstance(shape, int) else (shape,)
    return GeneralizedMovingStatsState(
        low=jnp.zeros(shape, jnp.float32),
        high=jnp.zeros(shape, jnp.float32),
        # step starts at 1 (moving_mean_std.py:25,29,39 uses torch.ones), so
        # after k updates the '_corr' debias is 1 - decay^(k+1)
        step=jnp.ones((), jnp.int32),
    )


def generalized_moving_stats_update(
    state: GeneralizedMovingStatsState,
    x: jnp.ndarray,
    impl: str = "mean_std",
    decay: float = 0.99,
    perclo: float = 0.05,
    perchi: float = 0.95,
) -> GeneralizedMovingStatsState:
    """_update_stats (moving_mean_std.py:107-126)."""
    m = decay
    x = x.astype(jnp.float32)
    axes = _batch_axes(x, state.low.ndim)
    if impl == "off":
        return state
    if impl in ("mean_std", "mean_std_corr"):
        x_mean = x.mean(axis=axes)
        x_sqr = (x * x).mean(axis=axes)
        return GeneralizedMovingStatsState(
            low=m * state.low + (1 - m) * x_mean,
            high=m * state.high + (1 - m) * x_sqr,
            step=state.step + 1,
        )
    if impl == "min_max":
        low, high = x.min(), x.max()
        return GeneralizedMovingStatsState(
            low=m * state.low + (1 - m) * jnp.minimum(state.low, low),
            high=m * state.high + (1 - m) * jnp.maximum(state.high, high),
            step=state.step + 1,
        )
    if impl in ("perc_ema", "perc_ema_corr"):
        low = jnp.quantile(x, perclo)
        high = jnp.quantile(x, perchi)
        return GeneralizedMovingStatsState(
            low=m * state.low + (1 - m) * low,
            high=m * state.high + (1 - m) * high,
            step=state.step + 1,
        )
    raise NotImplementedError(impl)


def generalized_moving_stats_get(
    state: GeneralizedMovingStatsState,
    impl: str = "mean_std",
    decay: float = 0.99,
    max_scale: float = 1e5,
    eps: float = 0.0,
):
    """_get_stats (moving_mean_std.py:50-79) → (offset, invscale)."""
    if impl == "off":
        return 0.0, 1.0
    if impl in ("mean_std", "mean_std_corr"):
        corr = (
            1.0 - decay ** state.step.astype(jnp.float32)
            if impl == "mean_std_corr"
            else 1.0
        )
        mean = state.low / jnp.maximum(corr, 1e-8) if impl == "mean_std_corr" else state.low
        sqrs = state.high / jnp.maximum(corr, 1e-8) if impl == "mean_std_corr" else state.high
        var = sqrs - jnp.square(mean)
        std = jnp.sqrt(jnp.maximum(var, 1.0 / max_scale**2) + eps)
        return mean, std
    if impl in ("min_max", "perc_ema", "perc_ema_corr"):
        lo, hi = state.low, state.high
        if impl == "perc_ema_corr":
            corr = jnp.maximum(
                1.0 - decay ** state.step.astype(jnp.float32), 1e-8
            )
            lo, hi = lo / corr, hi / corr
        invscale = jnp.maximum(hi - lo, 1.0 / max_scale)
        return lo, invscale
    raise NotImplementedError(impl)


def generalized_moving_stats_normalize(
    state: GeneralizedMovingStatsState, x, impl="mean_std", decay=0.99,
    denorm=False,
):
    offset, invscale = generalized_moving_stats_get(state, impl, decay)
    if denorm:
        return x * invscale + offset
    return jnp.clip((x - offset) / invscale, -5.0, 5.0)
