"""Prioritized replay (common/experience.py) — behavior pinned against the
reference PrioritizedReplayBuffer semantics (experience.py:89-205)."""

import jax
import jax.numpy as jnp
import numpy as np

from rl_games_tpu.common.experience import (
    PrioritizedReplayState,
    prioritized_add,
    prioritized_init,
    prioritized_sample,
    prioritized_update,
)


def _fill(state, n, alpha=0.6, start=0):
    for i in range(start, start + n):
        state = prioritized_add(
            state,
            np.full((1, 2), float(i)),
            np.zeros((1, 1)),
            np.asarray([float(i)]),
            np.full((1, 2), float(i) + 0.5),
            np.asarray([False]),
            alpha=alpha,
        )
    return state


def test_sampling_is_proportional_to_priority_alpha():
    """_sample_proportional draws index i with prob p_i^alpha / sum
    (experience.py:126-134)."""
    alpha = 1.0
    state = _fill(prioritized_init(4, (2,), (1,)), 4, alpha=alpha)
    state = prioritized_update(
        state, np.arange(4), np.asarray([1.0, 2.0, 4.0, 8.0]), alpha=alpha
    )
    _, _, idxes = prioritized_sample(
        state, jax.random.PRNGKey(0), 20000, beta=0.4
    )
    freq = np.bincount(np.asarray(idxes), minlength=4) / 20000
    np.testing.assert_allclose(freq, np.array([1, 2, 4, 8]) / 15, atol=0.02)


def test_importance_weights_formula_and_normalization():
    """weights = (N * P(i))^-beta / max_weight; the min-priority row has
    weight exactly 1 (experience.py:166-180)."""
    alpha, beta = 1.0, 0.5
    state = _fill(prioritized_init(4, (2,), (1,)), 4, alpha=alpha)
    ps = np.asarray([1.0, 2.0, 4.0, 8.0])
    state = prioritized_update(state, np.arange(4), ps, alpha=alpha)
    batch, weights, idxes = prioritized_sample(
        state, jax.random.PRNGKey(1), 256, beta=beta
    )
    idxes, weights = np.asarray(idxes), np.asarray(weights)
    p = ps / ps.sum()
    expected = (4 * p[idxes]) ** (-beta) / (4 * p[0]) ** (-beta)
    np.testing.assert_allclose(weights, expected, rtol=1e-5)
    assert weights.max() <= 1.0 + 1e-6
    # sampled rows decode to their stored transitions
    np.testing.assert_allclose(
        np.asarray(batch["obs"])[:, 0], idxes.astype(np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(batch["reward"]), idxes.astype(np.float32)
    )


def test_new_rows_enter_at_max_priority_and_wrap():
    """add() assigns max_priority^alpha to fresh rows (experience.py:
    119-124); the ring overwrites the oldest rows on wraparound."""
    alpha = 0.6
    state = _fill(prioritized_init(4, (2,), (1,)), 4, alpha=alpha)
    state = prioritized_update(
        state, np.arange(4), np.asarray([0.1, 0.1, 0.1, 5.0]), alpha=alpha
    )
    assert float(state.max_priority) == 5.0
    state = _fill(state, 2, alpha=alpha, start=4)  # overwrite rows 0,1
    np.testing.assert_allclose(
        np.asarray(state.p_alpha[:2]), np.full(2, 5.0 ** alpha), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(state.obses[0]), [4.0, 4.0])
    assert int(state.size) == 4 and int(state.idx) == 2


def test_partial_fill_never_samples_empty_slots_and_jits():
    state = _fill(prioritized_init(8, (2,), (1,)), 3)

    @jax.jit
    def draw(state, key):
        return prioritized_sample(state, key, 64, beta=0.4)

    _, _, idxes = draw(state, jax.random.PRNGKey(2))
    assert int(np.asarray(idxes).max()) < 3


def test_zero_priority_update_keeps_row_sampleable():
    """A 0.0 TD-error priority must not turn a live row into the
    empty-slot sentinel (p_alpha == 0 is 'never sample'): the reference
    asserts priority > 0 (experience.py:199); prioritized_update clamps
    instead, so the row stays reachable."""
    state = _fill(prioritized_init(4, (2,), (1,)), 4)
    state = prioritized_update(
        state, np.arange(4), np.zeros(4)  # all-zero TD errors
    )
    assert float(np.asarray(state.p_alpha).min()) > 0.0
    _, _, idxes = prioritized_sample(
        state, jax.random.PRNGKey(0), 256, beta=0.4
    )
    # clamped rows sample uniformly; none became the empty sentinel
    assert set(np.asarray(idxes).tolist()) == {0, 1, 2, 3}
