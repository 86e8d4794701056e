"""Shared Lagrangian-dynamics factor computation for the 3D device envs.

For kinematics x(q) stacking body COMs and rotation-matrix entries, with
kinetic energy T = ½ ẋᵀWẋ (point masses m_b on COMs, isotropic-inertia
weights I_b/2 on the R entries — the ‖Ṙ‖²_F = 2|ω|² identity, see
ant3d.kinetic_energy), the Euler-Lagrange equations are exactly

    M(q) q̈ + b(q, q̇) = τ,   M = Jᵀ W J,   b = Jᵀ W a + ∇V

where J = ∂x/∂q and a = J̇ q̇ is the coordinate acceleration at q̈ = 0
(d/dt(∂T/∂q̇) − ∂T/∂q = Jᵀ W ẍ = Jᵀ W (J q̈ + J̇ q̇) — the classical
point-mass/Jacobian form). Gravity needs no autodiff either:
V = g Σ m_b z_b ⟹ ∇V = g · (m-weighted z-rows of J).

TPU shape discipline (the point of this module): the naive forms —
`jax.hessian` of the energy, or `jax.jacfwd` of the kinematics — compile
to batched intermediates like [B, nq, 3, 3] whose tiny trailing dims land
in the 128-wide vector lanes (3/128 ≈ 2% utilization); measured 23 ms and
7.5 ms respectively for the whole factor set at B=8192 on one v5e chip,
i.e. the entire control step. This module instead

  * requires the env's `link_frames_fn` to be written in SCALAR form
    (tuples of per-env scalars, stacked into arrays only at the very
    end), so every batched intermediate is a full [B] vector — the same
    rule as the unrolled scalar Cholesky (ant2d._chol_factor,
    docs/PERF.md), generalized to the whole dynamics pipeline;
  * takes Jacobian columns with a Python loop of `jax.linearize` tangent
    calls (nq separate all-scalar tangent passes; one primal), never
    `jax.jacfwd` (whose stacked-basis vmap would re-introduce a tiny
    [B, nq] tangent dim);
  * assembles M, bias entrywise as [B, ncoord]-wide dot products.

Numerical equivalence with the energy-autodiff form (hessian M,
jvp-of-grad Coriolis) is asserted in tests/test_ant3d.py /
test_humanoid3d.py.
"""

import jax
import jax.numpy as jnp
import numpy as np


# --- 3x3 tuple-matrix helpers for scalar-form kinematics ------------------
# Working on nested tuples of per-env scalars keeps every batched
# intermediate [B]-shaped under the outer vmap (see module docstring).

def mat_mul(A, B):
    """3x3 @ 3x3 on nested tuples of scalars."""
    return tuple(
        tuple(sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3))
        for i in range(3)
    )


def mat_vec(A, v):
    """3x3 @ 3-vector on tuples of scalars."""
    return tuple(sum(A[i][k] * v[k] for k in range(3)) for i in range(3))


def v_add(a, b):
    return tuple(x + y for x, y in zip(a, b))


def v_scale(s, a):
    return tuple(s * x for x in a)


def euler_zyx(roll, pitch, yaw):
    """World-from-body R = Rz(yaw) @ Ry(pitch) @ Rx(roll) as a scalar
    tuple (standard ZYX Euler formulas)."""
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    return (
        (cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr),
        (sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr),
        (-sp, cp * sr, cp * cr),
    )


def rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return ((1.0, 0.0, 0.0), (0.0, c, -s), (0.0, s, c))


def rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return ((c, 0.0, -s), (0.0, 1.0, 0.0), (s, 0.0, c))


def rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return ((c, -s, 0.0), (s, c, 0.0), (0.0, 0.0, 1.0))


def stack_vec(vs):
    """List of 3-tuples of scalars -> [len(vs), 3] array."""
    return jnp.stack([jnp.stack(jnp.broadcast_arrays(*v)) for v in vs])


def stack_mat(Rs):
    """List of 3x3 tuples of scalars -> [len(Rs), 3, 3] array."""
    return jnp.stack(
        [
            jnp.stack([jnp.stack(jnp.broadcast_arrays(*row)) for row in Rm])
            for Rm in Rs
        ]
    )


def lagrangian_factors(link_frames_fn, masses, inertias, q, qd, gravity=9.81):
    """M, bias, contact jacobian + primal contact points for one env.

    link_frames_fn(q) -> (coms [nb,3], Rs [nb,3,3], contacts [nc,3]),
    written in scalar form (see module docstring); masses/inertias: [nb].
    Returns (M [nq,nq], bias [nq], contact_jac [nc,3,nq], contacts [nc,3]);
    bias includes ∇V for gravity along -z. The primal contact points come
    free from the linearize pass — envs that freeze these factors across
    integration substeps (ant3d/humanoid3d._step_factors) advance the
    contact points by the SAME first-order model, contacts0 + J·(q − q0),
    instead of re-running the full kinematics every substep.
    """
    nq = q.shape[-1]

    def flatten(coms, Rs):
        return jnp.concatenate([coms.reshape(-1), Rs.reshape(-1)])

    wvec = jnp.concatenate(
        [jnp.repeat(masses, 3), jnp.repeat(0.5 * inertias, 9)]
    )
    nb = masses.shape[0]
    gvec = jnp.zeros(12 * nb).at[jnp.arange(nb) * 3 + 2].set(
        gravity * masses
    )

    # J columns: one linearize, nq all-scalar tangent passes. The basis
    # rows are NUMPY constants, not traced arrays: each tangent input
    # enters the jaxpr as a literal 0.0/1.0 scalar, so XLA's algebraic
    # simplifier deletes the zero chains — a joint column's tangent pass
    # then only computes its own leg's kinematics (structural sparsity
    # for free, no hand-coded Jacobian).
    (_, _, contacts0), lin = jax.linearize(link_frames_fn, q)
    basis = np.eye(nq, dtype=np.float32)
    us, con_cols = [], []
    for i in range(nq):
        tc, tR, tcon = lin(basis[i])
        us.append(flatten(tc, tR))
        con_cols.append(tcon)

    # a = J̇ q̇: second directional derivative of the kinematics along q̇.
    vel = lambda qq: jax.jvp(link_frames_fn, (qq,), (qd,))[1]
    _, (ac, aR, _) = jax.jvp(vel, (q,), (qd,))
    bvec = wvec * flatten(ac, aR) + gvec

    wus = [wvec * u for u in us]
    rows = [[None] * nq for _ in range(nq)]
    for i in range(nq):
        for j in range(i, nq):
            m_ij = jnp.sum(wus[i] * us[j], axis=-1)
            rows[i][j] = m_ij
            rows[j][i] = m_ij
    M = jnp.stack([jnp.stack(r) for r in rows])
    bias = jnp.stack([jnp.sum(bvec * u, axis=-1) for u in us])
    contact_jac = jnp.stack(con_cols, axis=-1)  # [nc, 3, nq]
    return M, bias, contact_jac, contacts0


def lagrangian_factors_2d(link_frames_fn, masses, inertias, q, qd,
                          gravity=9.81):
    """Planar variant of `lagrangian_factors` for the 2D envs.

    link_frames_fn(q) -> (coms [nb,2], angles [nb], contacts [nc,2]);
    kinetic energy T = ½ Σ m|v_com|² + ½ Σ I ω̇² means the flattened
    kinematics vector is x = [coms…, angles…] with weights
    [m,m per com, I per angle], and the same identities hold:
    M = JᵀWJ, bias = JᵀW·J̇q̇ + ∇V (∇V = g · m-weighted y-rows of J).
    Basis rows are numpy constants so XLA deletes the zero-tangent
    chains (the sparsity note on `lagrangian_factors`). Returns
    (M [nq,nq], bias [nq], contact_jac [nc,2,nq], contacts [nc,2]).
    """
    nq = q.shape[-1]

    def flatten(coms, angles):
        return jnp.concatenate([coms.reshape(-1), angles])

    wvec = jnp.concatenate([jnp.repeat(masses, 2), inertias])
    nb = masses.shape[0]
    gvec = jnp.zeros(3 * nb).at[jnp.arange(nb) * 2 + 1].set(
        gravity * masses
    )

    (_, _, contacts0), lin = jax.linearize(link_frames_fn, q)
    basis = np.eye(nq, dtype=np.float32)
    us, con_cols = [], []
    for i in range(nq):
        tc, ta, tcon = lin(basis[i])
        us.append(flatten(tc, ta))
        con_cols.append(tcon)

    vel = lambda qq: jax.jvp(link_frames_fn, (qq,), (qd,))[1]
    _, (ac, aa, _) = jax.jvp(vel, (q,), (qd,))
    bvec = wvec * flatten(ac, aa) + gvec

    wus = [wvec * u for u in us]
    rows = [[None] * nq for _ in range(nq)]
    for i in range(nq):
        for j in range(i, nq):
            m_ij = jnp.sum(wus[i] * us[j], axis=-1)
            rows[i][j] = m_ij
            rows[j][i] = m_ij
    M = jnp.stack([jnp.stack(r) for r in rows])
    bias = jnp.stack([jnp.sum(bvec * u, axis=-1) for u in us])
    contact_jac = jnp.stack(con_cols, axis=-1)  # [nc, 2, nq]
    return M, bias, contact_jac, contacts0
