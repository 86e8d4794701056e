"""Checkpoint I/O.

Reference semantics (torch_ext.py:54-112, a2c_common.py:650-723): single-file
checkpoints containing the full training state — params, optimizer state,
normalizer stats, epoch/frame counters, best-reward watermark, env state —
with retrying filesystem ops for flaky shared storage.

Here the entire TrainState is one pytree, so a checkpoint is just its
serialized leaves (flax msgpack) plus a small metadata dict. Restore needs an
example state with the same treedef (agent.init_state()), which also gives
the restore-before-compile discipline for free: jit specializes on the
restored shapes.
"""

import os
import pickle
import time
from typing import Any, Callable

import jax
import numpy as np
from flax import serialization


def safe_filesystem_op(func: Callable, *args, num_attempts: int = 5, **kwargs):
    """Retry with backoff (torch_ext.py:54-71)."""
    for attempt in range(num_attempts):
        try:
            return func(*args, **kwargs)
        except Exception:
            if attempt == num_attempts - 1:
                raise
            time.sleep(0.1 * 2**attempt)


def save_checkpoint(path: str, state: Any, meta: dict = None, weights: Any = None):
    """Serialize a train-state pytree (+ metadata) to `path` (atomic).

    `weights` is an optional smaller {'params','norm'} pytree stored alongside
    the full state so players can restore model weights without knowing the
    trainer's state treedef (the reference's get_weights vs
    get_full_state_weights split, a2c_common.py:650-710).
    """
    state_np = jax.device_get(state)
    payload = {
        "state_bytes": serialization.to_bytes(state_np),
        "meta": meta or {},
    }
    if weights is not None:
        payload["weights_bytes"] = serialization.to_bytes(
            jax.device_get(weights)
        )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"

    def write():
        with open(tmp, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)

    safe_filesystem_op(write)


def _read_payload(path: str):
    def read():
        with open(path, "rb") as f:
            return pickle.load(f)

    return safe_filesystem_op(read)


def peek_meta(path: str) -> dict:
    """Read just the metadata dict without restoring the state."""
    return _read_payload(path).get("meta", {})


def read_payload(path: str) -> dict:
    """Read the raw checkpoint payload once; pass it to load_checkpoint via
    `payload=` to avoid a second read+unpickle of a multi-GB file when the
    caller needs meta before choosing the example treedef."""
    return _read_payload(path)


def load_checkpoint(path: str, example_state: Any, payload: dict = None):
    """Restore into the treedef of `example_state`; returns (state, meta)."""
    if payload is None:
        payload = _read_payload(path)
    state = serialization.from_bytes(example_state, payload["state_bytes"])
    return state, payload.get("meta", {})


def load_checkpoint_weights(path: str, example_weights: Any):
    """Restore just the model weights section; returns (weights, meta)."""
    payload = _read_payload(path)
    if "weights_bytes" not in payload:
        raise ValueError(
            f"checkpoint {path} has no weights section; restore the full "
            "train state instead"
        )
    weights = serialization.from_bytes(
        example_weights, payload["weights_bytes"]
    )
    return weights, payload.get("meta", {})
