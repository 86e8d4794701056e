"""Prioritized experience replay, TPU-native.

Re-design of rl_games/common/experience.py:89-205 (PrioritizedReplayBuffer
over Sum/MinSegmentTree, :9-87 ReplayBuffer). The reference's segment trees
exist to make host-side prefix-sum sampling O(log N); on TPU the idiomatic
form is a dense priority array with one fused vector pass per op:

* sampling: ``jax.random.categorical`` over log-priorities (Gumbel-max) —
  proportional-with-replacement, the same target distribution as the
  reference's stratified prefix-sum draw (:126-134), without host loops;
* importance weights: the (N * P(i))^-beta / max_weight formula (:166-180)
  computed in one vectorized expression (max_weight from the min priority);
* priority updates: a scatter (:184-205).

Everything is a pure function over a pytree state and jit/scan-compatible;
adds are batched (vectorized actors), like the ring replay the SAC trainer
uses (algos/sac.py). The uniform VectorizedReplayBuffer analog lives there;
this module is the legacy prioritized surface (kept by the reference for
external consumers; its own SAC does not use it).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PrioritizedReplayState:
    obses: jnp.ndarray
    actions: jnp.ndarray
    rewards: jnp.ndarray
    next_obses: jnp.ndarray
    dones: jnp.ndarray
    p_alpha: jnp.ndarray        # [capacity] priority**alpha (0 = empty slot)
    max_priority: jnp.ndarray   # scalar f32, raw (pre-alpha) watermark
    idx: jnp.ndarray            # int32 next write position
    size: jnp.ndarray           # int32 current fill


def prioritized_init(
    capacity: int, obs_shape, action_shape
) -> PrioritizedReplayState:
    """experience.py:93-117 (__init__); max_priority starts at 1.0."""
    obs_shape = tuple(obs_shape)
    action_shape = tuple(action_shape)
    return PrioritizedReplayState(
        obses=jnp.zeros((capacity,) + obs_shape, jnp.float32),
        actions=jnp.zeros((capacity,) + action_shape, jnp.float32),
        rewards=jnp.zeros((capacity,), jnp.float32),
        next_obses=jnp.zeros((capacity,) + obs_shape, jnp.float32),
        dones=jnp.zeros((capacity,), jnp.bool_),
        p_alpha=jnp.zeros((capacity,), jnp.float32),
        max_priority=jnp.ones((), jnp.float32),
        idx=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def prioritized_add(
    state: PrioritizedReplayState,
    obs, action, reward, next_obs, done,
    alpha: float = 0.6,
) -> PrioritizedReplayState:
    """Batched add (leading axis = actors); new rows enter at the current
    max priority so they are sampled at least once (experience.py:119-124).
    Wraparound drops the oldest rows, as the ring index passes them."""
    obs = jnp.atleast_2d(jnp.asarray(obs, jnp.float32))
    n = obs.shape[0]
    capacity = state.p_alpha.shape[0]
    rows = (state.idx + jnp.arange(n)) % capacity
    return state.replace(
        obses=state.obses.at[rows].set(obs),
        actions=state.actions.at[rows].set(
            jnp.asarray(action, jnp.float32).reshape(
                (n,) + state.actions.shape[1:]
            )
        ),
        rewards=state.rewards.at[rows].set(
            jnp.asarray(reward, jnp.float32).reshape(n)
        ),
        next_obses=state.next_obses.at[rows].set(
            jnp.asarray(next_obs, jnp.float32).reshape(
                (n,) + state.next_obses.shape[1:]
            )
        ),
        dones=state.dones.at[rows].set(jnp.asarray(done).reshape(n)),
        p_alpha=state.p_alpha.at[rows].set(state.max_priority ** alpha),
        idx=(state.idx + n) % capacity,
        size=jnp.minimum(state.size + n, capacity),
    )


def prioritized_sample(
    state: PrioritizedReplayState, key, batch_size: int, beta: float
) -> Tuple[dict, jnp.ndarray, jnp.ndarray]:
    """Proportional sample + importance weights + indexes
    (experience.py:136-182). Returns ({obs, action, reward, next_obs,
    done}, weights, idxes); weights are normalized so the lowest-priority
    row has weight 1 (max_weight, :172-180)."""
    # empty slots carry p_alpha=0 -> log 0 = -inf -> never sampled
    logits = jnp.log(jnp.maximum(state.p_alpha, 1e-30))
    logits = jnp.where(state.p_alpha > 0, logits, -jnp.inf)
    # jit-safe analog of the reference's error on an empty tree: with no
    # positive priority (empty / not-yet-filled buffer), fall back to
    # uniform over the first max(size,1) rows with unit weights instead
    # of arbitrary indexes and 0/0 = NaN weights — callers still gate on
    # fill level, this only removes the silent-NaN failure mode
    any_mass = state.p_alpha.sum() > 0
    size_f = jnp.maximum(state.size.astype(jnp.float32), 1.0)
    uniform = jax.random.randint(
        key, (batch_size,), 0, jnp.maximum(state.size, 1)
    )
    idxes = jnp.where(
        any_mass,
        jax.random.categorical(key, logits, shape=(batch_size,)),
        uniform,
    )
    p_total = jnp.maximum(state.p_alpha.sum(), 1e-30)
    p_sample = jnp.maximum(state.p_alpha[idxes], 1e-30) / p_total
    p_min = jnp.min(
        jnp.where(state.p_alpha > 0, state.p_alpha, jnp.inf)
    ) / p_total
    max_weight = (p_min * size_f) ** (-beta)
    weights = (p_sample * size_f) ** (-beta) / max_weight
    weights = jnp.where(any_mass, weights, jnp.ones_like(weights))
    batch = {
        "obs": state.obses[idxes],
        "action": state.actions[idxes],
        "reward": state.rewards[idxes],
        "next_obs": state.next_obses[idxes],
        "done": state.dones[idxes],
    }
    return batch, weights, idxes


def prioritized_update(
    state: PrioritizedReplayState, idxes, priorities, alpha: float = 0.6
) -> PrioritizedReplayState:
    """Scatter fresh TD-error priorities and advance the max-priority
    watermark (experience.py:184-205).

    Priorities are floored at 1e-6: the reference enforces
    ``assert priority > 0`` (experience.py:199) because a zero priority
    would make the slot indistinguishable from the empty-slot sentinel
    (p_alpha == 0) and permanently exclude a live transition from
    sampling; inside jit a clamp replaces the assert."""
    priorities = jnp.maximum(jnp.asarray(priorities, jnp.float32), 1e-6)
    return state.replace(
        p_alpha=state.p_alpha.at[jnp.asarray(idxes)].set(
            priorities ** alpha
        ),
        max_priority=jnp.maximum(state.max_priority, priorities.max()),
    )
