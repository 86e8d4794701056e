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

    def make_train_fn(self, donate: bool = True, mesh=None):
        """jit(vmap(epoch)); with a mesh, shard the SEED axis over 'data'.

        Multi-seed data parallelism is embarrassingly parallel: every leaf
        of the stacked state carries the seed axis in dim 0, so sharding
        dim 0 over 'data' places whole seeds on chips with ZERO collective
        traffic (cf. single-seed runs, which shard the env axis and psum
        gradients — parallel/mesh.py)."""
        donate_args = (0,) if donate else ()
        # fresh lambda per call — same stale-trace-cache defense as
        # PPOAgent.make_train_fn
        fn = jax.vmap(lambda s: self.agent.train_epoch(s))
        if mesh is None:
            return jax.jit(fn, donate_argnums=donate_args)

        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        if len(self.seeds) % n_dev:
            raise ValueError(
                f"--seeds over a mesh needs len(seeds) divisible by the "
                f"mesh size: {len(self.seeds)} seeds on {n_dev} devices"
            )
        seed_shard = NamedSharding(mesh, P("data"))
        cache = {}

        def wrapper(stacked):
            if "fn" not in cache:
                shardings = jax.tree.map(lambda _: seed_shard, stacked)
                cache["fn"] = jax.jit(
                    fn,
                    in_shardings=(shardings,),
                    out_shardings=(shardings, None),
                    donate_argnums=donate_args,
                )
                stacked = jax.device_put(stacked, shardings)
            return cache["fn"](stacked)

        return wrapper

    def train_fn(self, mesh=None):
        # cache keyed on the mesh: a no-mesh warmup call must not pin the
        # unsharded program for a later mesh=... caller (or vice versa)
        if self._fn is None or getattr(self, "_fn_mesh", None) is not mesh:
            self._fn = self.make_train_fn(mesh=mesh)
            self._fn_mesh = mesh
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


class PopulationTrainer(MultiSeedTrainer):
    """On-device population-based training: the population IS the vmapped
    seed axis. The reference's PBT (common/pbt/) coordinates N OS processes
    through filesystem checkpoints and os.execv restarts; here the whole
    population trains as one compiled program and exploit/explore is cheap
    host-side tree surgery on the stacked TrainState — laggards (below the
    reference's band rule, utils/pbt.classify) adopt a random leader's
    weights + normalizers with a fresh optimizer, and mutate the
    hyperparameters that live IN the TrainState (lr, entropy_coef) with
    the reference's mutate_float steps (pbt/mutation.py:35-54). Meters
    reset on adoption (clear_stats) so the band re-evaluates on fresh
    games, mirroring the reference's restart-from-checkpoint semantics.
    """

    def __init__(self, agent, seeds: Sequence[int], *,
                 threshold_std: float = 0.10, threshold_abs: float = 0.05,
                 mutation_rate: float = 0.8,
                 change_range=(1.1, 1.5)):
        super().__init__(agent, seeds)
        self.threshold_std = float(threshold_std)
        self.threshold_abs = float(threshold_abs)
        self.mutation_rate = float(mutation_rate)
        self.change_range = tuple(change_range)

    def _maybe_mutate(self, value: float) -> float:
        import random as _random

        from rl_games_tpu.utils.pbt import mutate_float

        if _random.random() > self.mutation_rate:
            return value
        return mutate_float(value, *self.change_range)

    def pbt_step(self, stacked_state, metrics):
        """One exploit/explore pass. Returns (state, events); events is a
        list of {'dst','src','lr','entropy_coef'} adoption records."""
        import numpy as np
        import random as _random

        from rl_games_tpu.utils.pbt import classify

        games = metrics.get("games_played")
        scores = np.asarray(metrics["mean_rewards"])[:, 0]
        if games is not None and (np.asarray(games) <= 0).any():
            return stacked_state, []  # some member has no completed games
        leader_cut, laggard_cut = classify(
            scores, self.threshold_std, self.threshold_abs
        )
        leaders = np.where(scores >= leader_cut)[0]
        laggards = np.where(scores <= laggard_cut)[0]
        if len(leaders) == 0 or len(laggards) == 0:
            return stacked_state, []
        events = []
        for dst in laggards.tolist():
            src = int(_random.choice(leaders.tolist()))
            member = self.state_for_seed(stacked_state, dst)
            donor_params = jax.tree.map(
                lambda x: x[src], stacked_state.params
            )
            repl = dict(
                params=donor_params,
                norm=jax.tree.map(lambda x: x[src], stacked_state.norm),
                opt_state=self.agent.tx.init(donor_params),
                lr=jnp.asarray(
                    self._maybe_mutate(float(stacked_state.lr[src])),
                    jnp.float32,
                ),
                entropy_coef=jnp.asarray(
                    self._maybe_mutate(
                        float(stacked_state.entropy_coef[src])
                    ),
                    jnp.float32,
                ),
            )
            if stacked_state.cv_params is not None:
                donor_cv = jax.tree.map(
                    lambda x: x[src], stacked_state.cv_params
                )
                repl.update(
                    cv_params=donor_cv,
                    cv_norm=jax.tree.map(
                        lambda x: x[src], stacked_state.cv_norm
                    ),
                    cv_opt=self.agent.cv_tx.init(donor_cv),
                )
            member = self.agent.clear_stats(member.replace(**repl))
            stacked_state = jax.tree.map(
                lambda full, one: full.at[dst].set(one),
                stacked_state, member,
            )
            events.append({
                "dst": self.seeds[dst], "src": self.seeds[src],
                "lr": float(repl["lr"]),
                "entropy_coef": float(repl["entropy_coef"]),
            })
        return stacked_state, events
