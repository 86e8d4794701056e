"""Population-Based Training over a shared-filesystem protocol.

Re-design of rl_games/common/pbt/ (pbt.py, mutation.py, pbt_cfg.py): N
independent training processes coordinate only through checkpoint files in a
shared workspace. Every ``interval_steps`` frames each member saves
{weights, score, params}; underperformers (score below the population band)
load a random leader's weights, mutate selected hyperparameters
multiplicatively, and restart. The band rule is the reference's:
leaders  score > max(mean + k*std, mean + abs_margin),
laggards score < min(mean - k*std, mean - abs_margin).

Restart strategy: hyperparameters that live in the compiled train state
(learning rate, entropy coef) and all model weights are swapped in-process;
a config-level mutation (gamma etc.) re-execs the process with ``key=value``
argv overrides like the reference (pbt.py:129-272). On a TPU pod, one
population member maps to one pod slice / job; the filesystem protocol is
unchanged.
"""

import os
import pickle
import random
import sys
import time
from dataclasses import dataclass, field, fields
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Mutations (common/pbt/mutation.py)
# ---------------------------------------------------------------------------


def mutate_float(x: float, change_min: float = 1.1, change_max: float = 1.5):
    k = random.uniform(change_min, change_max)
    return x / k if random.random() < 0.5 else x * k


def mutate_discount(x: float, **kwargs):
    """Mutate (1 - gamma) with conservative [1.1, 1.2] steps."""
    inv = 1.0 - x
    return 1.0 - mutate_float(inv, change_min=1.1, change_max=1.2)


MUTATION_FUNCS: Dict[str, Callable] = {
    "mutate_float": mutate_float,
    "mutate_discount": mutate_discount,
}


def mutate(params: Dict[str, Any], mutations: Dict[str, str],
           mutation_rate: float, change_range: Tuple[float, float]):
    """mutation.py:35-54: per-key coin-flip mutation."""
    cmin, cmax = change_range
    out = {}
    for name, val in params.items():
        fn_name = mutations.get(name)
        if fn_name is None or random.random() > mutation_rate:
            out[name] = val
            continue
        fn = MUTATION_FUNCS.get(fn_name)
        if fn is None:
            raise KeyError(f"Unknown mutation function: {fn_name!r}")
        out[name] = fn(val, change_min=cmin, change_max=cmax)
    return out


# ---------------------------------------------------------------------------
# Config (common/pbt/pbt_cfg.py)
# ---------------------------------------------------------------------------


@dataclass
class PbtCfg:
    enabled: bool = False
    policy_idx: int = 0
    num_policies: int = 8
    directory: str = ""
    workspace: str = "pbt_workspace"
    objective: str = "mean_rewards"
    interval_steps: int = 100_000
    threshold_std: float = 0.10
    threshold_abs: float = 0.05
    mutation_rate: float = 0.25
    change_range: Tuple[float, float] = (1.1, 2.0)
    mutation: Dict[str, str] = field(default_factory=dict)
    restart_with_execv: bool = False

    def __post_init__(self):
        self.change_range = tuple(self.change_range)

    @classmethod
    def from_dict(cls, d: dict):
        known = {f.name for f in fields(cls)}
        unknown = sorted(set(d) - known)
        if unknown:
            print(f"PbtCfg: ignoring unknown config keys {unknown}")
        return cls(**{k: v for k, v in d.items() if k in known})


# ---------------------------------------------------------------------------
# Population coordination
# ---------------------------------------------------------------------------


def _member_path(workspace: str, idx: int) -> str:
    return os.path.join(workspace, f"policy_{idx:03d}.pbt")


def save_member(workspace: str, idx: int, score: float, frame: int,
                weights: Any, params: Dict[str, Any]):
    os.makedirs(workspace, exist_ok=True)
    payload = {
        "score": float(score),
        "frame": int(frame),
        "weights": weights,
        "params": dict(params),
        "time": time.time(),
    }
    tmp = _member_path(workspace, idx) + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, _member_path(workspace, idx))


def load_population(workspace: str, num_policies: int):
    """Read every member's latest record; missing/corrupt members → None."""
    members = []
    for i in range(num_policies):
        path = _member_path(workspace, i)
        try:
            with open(path, "rb") as f:
                members.append(pickle.load(f))
        except Exception:
            members.append(None)
    return members


def classify(scores, threshold_std: float, threshold_abs: float):
    """Return (leader_cut, laggard_cut) from the band rule (pbt_cfg.py:10-16)."""
    s = np.asarray(scores, np.float64)
    mean, std = s.mean(), s.std()
    leader_cut = max(mean + threshold_std * std, mean + threshold_abs)
    laggard_cut = min(mean - threshold_std * std, mean - threshold_abs)
    return leader_cut, laggard_cut


class PbtManager:
    """Per-member PBT driver; call `step(algo, state, metrics)` each epoch."""

    def __init__(self, cfg: PbtCfg, mutable_params: Dict[str, Any],
                 restart_fn: Optional[Callable] = None):
        self.cfg = cfg
        self.mutable_params = dict(mutable_params)
        self.last_interval = 0
        self.restart_fn = restart_fn or self._default_restart
        root = cfg.directory or "."
        self.workspace = os.path.join(root, cfg.workspace)

    def _default_restart(self, new_params: Dict[str, Any]):
        """Re-exec with key=value overrides (pbt.py:129-272 behavior)."""
        argv = [sys.executable] + sys.argv + [
            f"{k}={v}" for k, v in new_params.items()
        ]
        os.execv(sys.executable, argv)

    def step(self, algo, state, metrics):
        """Save own record at each interval; maybe adopt a leader."""
        frame = int(metrics["frame"])
        if frame - self.last_interval < self.cfg.interval_steps:
            return state
        self.last_interval = frame
        objective = metrics.get(self.cfg.objective, metrics.get("mean_rewards"))
        score = float(np.asarray(objective).reshape(-1)[0])
        save_member(
            self.workspace, self.cfg.policy_idx, score, frame,
            algo.get_weights(state), self.mutable_params,
        )
        members = load_population(self.workspace, self.cfg.num_policies)
        valid = [(i, m) for i, m in enumerate(members) if m is not None]
        if len(valid) < max(2, self.cfg.num_policies // 2):
            return state
        scores = [m["score"] for _, m in valid]
        leader_cut, laggard_cut = classify(
            scores, self.cfg.threshold_std, self.cfg.threshold_abs
        )
        if score >= laggard_cut:
            return state
        leaders = [
            (i, m) for i, m in valid
            if m["score"] > leader_cut and i != self.cfg.policy_idx
        ]
        if not leaders:
            return state
        li, leader = random.choice(leaders)
        print(
            f"PBT: policy {self.cfg.policy_idx} (score {score:.3f}) adopting "
            f"leader {li} (score {leader['score']:.3f})"
        )
        new_params = mutate(
            leader["params"], self.cfg.mutation, self.cfg.mutation_rate,
            self.cfg.change_range,
        )
        if self.cfg.restart_with_execv:
            self.restart_fn(new_params)
            return state  # unreachable after execv
        # in-process adoption: weights + mutated hyperparameters, routed
        # through the BaseAlgorithm set_param surface (a2c_common.py:
        # 725-772) so config-level params (gamma, tau, e_clip, ...)
        # mutate too — the algo re-jits its epoch when a baked-in
        # constant changes
        state = algo.set_weights(state, leader["weights"])
        if hasattr(algo, "reset_optimizer"):
            # fresh Adam moments for the adopted weights (the reference's
            # execv restart gets this for free)
            state = algo.reset_optimizer(state)
        self.mutable_params = new_params
        for key, value in new_params.items():
            if hasattr(algo, "set_param"):
                try:
                    state = algo.set_param(key, value, state)
                except NotImplementedError:
                    pass
            else:
                import jax.numpy as jnp

                if key == "learning_rate" and hasattr(state, "lr"):
                    state = state.replace(lr=jnp.asarray(value, jnp.float32))
                elif key == "entropy_coef" and hasattr(state, "entropy_coef"):
                    state = state.replace(
                        entropy_coef=jnp.asarray(value, jnp.float32)
                    )
        return state
