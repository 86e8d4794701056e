"""Generalized Advantage Estimation on TPU.

Semantics match the reference's GAE (rl_games/triton_kernels/gae_kernel.py:16-79,
rl_games/common/a2c_common.py:595-600):

    for t in reversed(range(T)):
        nextnonterminal = 1 - (dones[t+1] if t < T-1 else last_dones)
        nextvalues     = values[t+1] if t < T-1 else last_values
        delta  = rewards[t] + gamma * nextvalues * nextnonterminal - values[t]
        adv[t] = lastgaelam = delta + gamma * lam * nextnonterminal * lastgaelam

Shapes (same as the reference's Triton kernel):
    rewards, values: [T, N, V]   (V = value_size, typically 1)
    dones:           [T, N]      (dones *entering* step t)
    last_values:     [N, V]
    last_dones:      [N]
Returns advantages [T, N, V].

Three backends:
  * ``gae_scan``        — `lax.scan` reverse recurrence (the simple reference).
  * ``gae_associative`` — `lax.associative_scan` formulation: adv is a
                          first-order linear recurrence a_t = d_t + c_t a_{t+1},
                          O(log T) depth on the VPU.
  * ``gae_pallas``      — Pallas TPU kernel: one in-kernel backward sweep per
                          128-lane block of (env, value) columns, the TPU
                          analog of the reference's single-launch Triton kernel.

``compute_gae`` dispatches: Pallas on TPU, associative scan otherwise; the
environment variable ``RLG_TPU_GAE_BACKEND`` in {scan, associative, pallas}
overrides (the analog of the reference's RLG_NO_TRITON kill switch,
rl_games/triton_config.py:9-17).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shifted_next(values, dones, last_values, last_dones):
    """next_values[t] = values[t+1] (last row: last_values); same for dones."""
    next_values = jnp.concatenate([values[1:], last_values[None]], axis=0)
    next_dones = jnp.concatenate(
        [dones[1:], last_dones[None].astype(dones.dtype)], axis=0
    )
    next_nonterminal = 1.0 - next_dones.astype(values.dtype)
    return next_values, next_nonterminal


def gae_scan(rewards, values, dones, last_values, last_dones, gamma, lam):
    """Reverse `lax.scan` GAE — numerically exact reference implementation."""
    next_values, next_nonterminal = _shifted_next(
        values, dones, last_values, last_dones
    )
    nnt = next_nonterminal[..., None]  # [T, N, 1] broadcasts over V
    deltas = rewards + gamma * next_values * nnt - values

    def step(lastgaelam, inp):
        delta_t, nnt_t = inp
        adv_t = delta_t + gamma * lam * nnt_t * lastgaelam
        return adv_t, adv_t

    init = jnp.zeros_like(last_values)
    _, advs = jax.lax.scan(step, init, (deltas, nnt), reverse=True)
    return advs


def gae_associative(rewards, values, dones, last_values, last_dones, gamma, lam):
    """GAE via `lax.associative_scan` (O(log T) depth).

    a_t = d_t + c_t * a_{t+1} with c_t = gamma*lam*nextnonterminal_t. Reversing
    time gives the forward recurrence y_s = d_s + c_s * y_{s-1}, whose prefix
    solution is an associative scan over pairs (c, d) with combine
    (c1,d1)*(c2,d2) = (c1*c2, c2*d1 + d2).
    """
    next_values, next_nonterminal = _shifted_next(
        values, dones, last_values, last_dones
    )
    nnt = next_nonterminal[..., None]
    deltas = rewards + gamma * next_values * nnt - values
    coeffs = jnp.broadcast_to(gamma * lam * nnt, deltas.shape)

    def combine(a, b):
        c1, d1 = a
        c2, d2 = b
        return c1 * c2, c2 * d1 + d2

    c_rev = coeffs[::-1]
    d_rev = deltas[::-1]
    _, y_rev = jax.lax.associative_scan(combine, (c_rev, d_rev), axis=0)
    return y_rev[::-1]


def _gae_pallas_kernel(rew_ref, val_ref, nnt_ref, lastval_ref, adv_ref, *, gamma, lam):
    """In-kernel backward sweep over the horizon for one 2D column block.

    Block shapes: rew/val/nnt/adv = [T, BN] (VMEM); lastval = [1, BN].
    Carry = (lastgaelam, next_value) kept as (1, BN) 2D rows — Mosaic
    requires >=2D vector layouts, 1D row vectors fail layout assignment.
    """
    T = rew_ref.shape[0]

    def body(i, carry):
        lastgaelam, next_val = carry
        t = T - 1 - i
        nnt_t = nnt_ref[pl.ds(t, 1), :]
        val_t = val_ref[pl.ds(t, 1), :]
        delta = rew_ref[pl.ds(t, 1), :] + gamma * next_val * nnt_t - val_t
        lastgaelam = delta + gamma * lam * nnt_t * lastgaelam
        adv_ref[pl.ds(t, 1), :] = lastgaelam
        return lastgaelam, val_t

    zero = jnp.zeros_like(lastval_ref[:, :])
    jax.lax.fori_loop(0, T, body, (zero, lastval_ref[:, :]))


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def gae_pallas(
    rewards, values, dones, last_values, last_dones, gamma, lam, *, interpret=False,
    block_n=512,
):
    """Pallas TPU GAE. Folds (env, value) into a lane axis, pads to 128."""
    T, N, V = rewards.shape
    M = N * V
    Mp = _round_up(max(M, 128), 128)
    bn = min(block_n, Mp)
    # block must divide padded width
    while Mp % bn:
        bn //= 2
    f32 = jnp.float32

    def fold(x):  # [T, N, V] -> [T, Mp]
        x = x.reshape(T, M).astype(f32)
        return jnp.pad(x, ((0, 0), (0, Mp - M)))

    next_values, next_nonterminal = _shifted_next(
        values, dones, last_values, last_dones
    )
    del next_values  # the kernel re-derives next value from its carry
    nnt = jnp.broadcast_to(next_nonterminal[..., None], (T, N, V))

    rew_f = fold(rewards)
    val_f = fold(values)
    nnt_f = fold(nnt)
    lastval_f = jnp.pad(
        last_values.reshape(1, M).astype(f32), ((0, 0), (0, Mp - M))
    )

    grid = (Mp // bn,)
    col_spec = pl.BlockSpec((T, bn), lambda j: (0, j), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM)

    advs = pl.pallas_call(
        functools.partial(_gae_pallas_kernel, gamma=float(gamma), lam=float(lam)),
        grid=grid,
        in_specs=[col_spec, col_spec, col_spec, row_spec],
        out_specs=col_spec,
        out_shape=jax.ShapeDtypeStruct((T, Mp), f32),
        interpret=interpret,
    )(rew_f, val_f, nnt_f, lastval_f)

    return advs[:, :M].reshape(T, N, V).astype(rewards.dtype)


_BACKENDS = {
    "scan": gae_scan,
    "associative": gae_associative,
    "pallas": gae_pallas,
}


def compute_gae(rewards, values, dones, last_values, last_dones, gamma, lam):
    """Dispatching GAE (reference: triton_kernels/gae_kernel.py:124-146).

    Pallas on TPU, associative scan elsewhere; env var RLG_TPU_GAE_BACKEND
    in {scan, associative, pallas} forces a backend.
    """
    backend = os.environ.get("RLG_TPU_GAE_BACKEND", "")
    if backend not in _BACKENDS:
        backend = "pallas" if jax.default_backend() == "tpu" else "associative"
    return _BACKENDS[backend](
        rewards, values, dones, last_values, last_dones, gamma, lam
    )


def discounted_returns(rewards, dones, last_values, last_dones, gamma):
    """Plain discounted return R_t = r_t + gamma * (1 - done_{t+1}) * R_{t+1}.

    Equivalent to GAE with lam=1 minus-values trick avoided; used by tests and
    n-step style estimators. Shapes as compute_gae, last bootstrap from
    last_values.
    """
    zeros = jnp.zeros_like(rewards)
    advs = gae_scan(rewards, zeros, dones, last_values, last_dones, gamma, 1.0)
    # with values==0 the recurrence returns exactly the bootstrapped return sum
    return advs
