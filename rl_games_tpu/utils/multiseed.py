"""Multi-seed training as ONE compiled device program.

No reference analog: the reference trains one seed per process (its SAC
benchmark harness shells out N processes, benchmarks/sac_benchmark.py).
On TPU the whole PPO epoch is a pure function of the TrainState pytree
(algos/ppo.py train_epoch), so k seeds train simultaneously as
``jit(vmap(train_epoch))`` over a stacked state — the physics, rollouts
and updates of all seeds batch together on the MXU/VPU, turning a k-seed
benchmark matrix into roughly the wall-clock of one run whenever one seed
leaves the chip underutilized.

Device-env path only (host envs step outside jit and cannot vmap); both
algorithm families work (PPO and SAC — a SAC stack vmaps the per-seed
replay rings too, so device memory scales by k).
Checkpoints interoperate with single-seed training: ``state_for_seed``
slices one seed's TrainState out of the stack, and the standard
player/checkpoint machinery consumes it unchanged.

Used by benchmarks/multiseed_ppo.py and the `--seeds` CLI flag.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


class MultiSeedTrainer:
    """vmap-over-seeds wrapper around a device-env PPOAgent (or any agent
    whose train_epoch is state -> (state, metrics))."""

    def __init__(self, agent, seeds: Sequence[int]):
        if getattr(agent, "is_host_env", False):
            raise ValueError(
                "multi-seed vmapped training needs a device env; host envs "
                "step outside jit (use one process per seed there, like the "
                "reference's benchmark harness)."
            )
        self.agent = agent
        self.seeds = list(seeds)
        if len(self.seeds) < 1:
            raise ValueError("need at least one seed")
        self._fn = None

    def init_state(self):
        """Stack per-seed TrainStates along a leading seed axis."""
        states = [self.agent.init_state(seed=s) for s in self.seeds]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    def make_train_fn(self, donate: bool = True):
        donate_args = (0,) if donate else ()
        # fresh lambda per call — same stale-trace-cache defense as
        # PPOAgent.make_train_fn
        return jax.jit(
            jax.vmap(lambda s: self.agent.train_epoch(s)),
            donate_argnums=donate_args,
        )

    def train_fn(self):
        if self._fn is None:
            self._fn = self.make_train_fn()
        return self._fn

    def epoch(self, stacked_state):
        """One epoch for every seed; metrics leaves gain a [k] seed axis."""
        return self.train_fn()(stacked_state)

    def state_for_seed(self, stacked_state, index: int):
        """Slice seed `index`'s TrainState (single-seed checkpoint shape)."""
        return jax.tree.map(lambda x: x[index], stacked_state)

    def frames_per_epoch(self) -> int:
        a = self.agent
        steps = getattr(a, "horizon_length", None) or getattr(
            a, "num_steps_per_episode", 1
        )
        return a.num_actors * getattr(a, "num_agents", 1) * steps
