"""Device-mesh utilities: the framework's answer to the reference's NCCL layer.

The reference wires torch.distributed by hand at three sites (SURVEY.md §2.6:
init a2c_common.py:109, grad allreduce :362-378, scalar broadcast :433-441).
Here one SPMD program runs on a `jax.sharding.Mesh`: env-batch leaves carry
PartitionSpec('data'), params/optimizer/normalizer stats are replicated, and
XLA emits the psum over ICI for gradients while replicated scalars need no
broadcast at all. The mesh keeps a second, currently-unused 'model' axis name
reserved so a future tensor-parallel axis composes without renaming.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import tree_map_with_path


def create_mesh(
    devices: Optional[Sequence] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


# fields of PPOTrainState whose leading axis is the env axis
_PPO_DATA_FIELDS = (
    "env_state",
    "obs",
    "dones",
    "current_rewards",
    "current_shaped_rewards",
    "current_lengths",
)


def _path_has(path, name: str) -> bool:
    return any(getattr(p, "name", None) == name for p in path)


def ppo_state_shardings(state, mesh: Mesh):
    """Build a sharding pytree for a PPOTrainState: env axis → P('data'),
    everything else (params, opt state, normalizers, meters, scalars)
    replicated."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    rnn = NamedSharding(mesh, P(None, "data"))  # [layers, N, units]

    def pick(path, leaf):
        top = getattr(path[0], "name", None)
        if top in _PPO_DATA_FIELDS:
            # the vec-env's PRNG key and any scalar bookkeeping stay replicated
            if _path_has(path, "key") or np.ndim(leaf) == 0:
                return repl
            return data
        if top in ("rnn_states", "cv_rnn_states"):
            return rnn  # [layers, N_envs, units]: per-env state on 'data'
        return repl

    return tree_map_with_path(pick, state)


# fields of SACTrainState with a leading env axis; the replay ring buffer
# shards its CAPACITY axis so each chip holds a slice — the logical program
# (global-uniform sampling, global batched writes) is unchanged, XLA inserts
# the cross-chip gathers, so 1-chip == N-chip by construction
_SAC_DATA_FIELDS = (
    "env_state",
    "obs",
    "current_rewards",
    "current_lengths",
    "replay",
)


def sac_state_shardings(state, mesh: Mesh):
    """Shardings for a SACTrainState: env batch + replay capacity over
    'data'; params/targets/opts/normalizers/meters replicated."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def pick(path, leaf):
        top = getattr(path[0], "name", None)
        if top in _SAC_DATA_FIELDS:
            if _path_has(path, "key") or np.ndim(leaf) == 0:
                return repl
            return data
        return repl

    return tree_map_with_path(pick, state)


def replicated_shardings(tree, mesh: Mesh):
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda _: repl, tree)


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Multi-host setup: the torchrun/NCCL-env-var analog (SURVEY.md §2.6).

    On TPU pods the runtime autodetects everything — call with no arguments
    on every host before building the mesh; `create_mesh(jax.devices())`
    then spans the pod slice and the same jitted epoch runs across hosts
    with gradient psums on ICI and host-local env shards feeding the 'data'
    axis. Explicit arguments cover CPU/GPU clusters.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()
