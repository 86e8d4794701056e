"""C51 categorical distributional-RL projection, TPU-native.

Functional parity target: the reference's ``CategoricalQ.distr_projection``
(rl_games/common/categorical.py:4-51) — the Categorical Algorithm from
"A Distributional Perspective on RL" (Bellemare et al. 2017). The reference
is a host-side numpy loop over atoms with scatter-adds; on TPU the same
projection is expressed densely: every (sample, source-atom) pair splits
its mass between its floor/ceil target bins, and the scatter becomes a
batched matmul against a one-hot projection tensor — no data-dependent
indexing, fully vmappable/jittable, MXU-friendly for large batches.

Semantics pinned by tests/test_ops.py against a numpy oracle of the
reference loop, including the done-row branch (terminal transitions
collapse to a delta at the clipped reward) and the exact eq/ne floor-ceil
mass-split convention.

Op-level component with no trainer consumer — deliberately mirroring the
reference, where CategoricalQ is likewise a legacy DQN remnant no
algorithm imports (SURVEY.md §2 #43); it ships so a distributional-value
extension has the projection ready-made.
"""

import jax.numpy as jnp


class CategoricalQ:
    """Projection helper for an n-atom categorical value distribution.

    Matches the reference constructor surface (n_atoms, v_min, v_max);
    ``distr_projection`` is a pure jittable function of its arguments.
    """

    def __init__(self, n_atoms, v_min, v_max):
        self.n_atoms = int(n_atoms)
        self.v_min = float(v_min)
        self.v_max = float(v_max)
        self.delta_z = (self.v_max - self.v_min) / (self.n_atoms - 1)

    def _project_values(self, z):
        """Split unit mass at values z [..., A] onto the atom grid.

        Returns weights [..., A, A]: w[..., j, k] = mass that a unit at
        z[..., j] deposits on atom k, using the reference's floor/ceil
        convention (u == l puts everything on l; otherwise (u - b) on l
        and (b - l) on u; reference categorical.py:21-31).
        """
        tz = jnp.clip(z, self.v_min, self.v_max)
        b = (tz - self.v_min) / self.delta_z
        l = jnp.floor(b)
        u = jnp.ceil(b)
        atom_idx = jnp.arange(self.n_atoms, dtype=b.dtype)  # [A] target bins
        onehot_l = (l[..., None] == atom_idx).astype(b.dtype)  # [..., A, A]
        onehot_u = (u[..., None] == atom_idx).astype(b.dtype)
        eq = (u == l)[..., None].astype(b.dtype)
        w_l = jnp.where(eq > 0, onehot_l, onehot_l * (u - b)[..., None])
        w_u = jnp.where(eq > 0, jnp.zeros_like(onehot_u),
                        onehot_u * (b - l)[..., None])
        return w_l + w_u

    def distr_projection(self, next_distr, rewards, dones, gamma):
        """Project gamma-shrunk next-state distributions through rewards.

        next_distr: [B, A] probabilities; rewards: [B]; dones: [B] bool;
        gamma: scalar. Returns [B, A] projected target distribution
        (reference categorical.py:11-51).
        """
        next_distr = jnp.asarray(next_distr, jnp.float32)
        rewards = jnp.asarray(rewards, jnp.float32)
        dones = jnp.asarray(dones, bool)
        atoms = self.v_min + self.delta_z * jnp.arange(
            self.n_atoms, dtype=jnp.float32
        )
        # Non-terminal: each source atom j lands at r + gamma * z_j.
        z = rewards[:, None] + gamma * atoms[None, :]           # [B, A]
        w = self._project_values(z)                             # [B, A, A]
        proj = jnp.einsum("ba,bak->bk", next_distr, w)
        # Terminal: all mass at the clipped reward itself.
        w_done = self._project_values(rewards)                  # [B, A]
        return jnp.where(dones[:, None], w_done, proj)
