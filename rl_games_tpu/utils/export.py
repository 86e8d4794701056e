"""Policy export for deployment.

The reference's export story is ONNX via the detectron2-style Schema
flattener (algos_torch/flatten.py + the onnx notebooks): trace the policy to
a deployable artifact with normalization baked in. The JAX-native analog is
`jax.export`: serialize the jitted deterministic policy (obs → action, with
obs normalization and action rescaling folded in) to a portable StableHLO
artifact that any JAX/XLA runtime — or TF/TFLite via stablehlo tooling — can
reload and execute without the framework.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_deterministic_policy_fn(model, net_params, norm,
                                 action_space=None):
    """Closure obs → deterministic env-space action (mu / argmax), with
    normalizers and action rescale folded in (the reference bakes
    running_mean_std into the ONNX graph the same way)."""

    def policy(obs):
        res = model.forward_play(
            net_params, norm, jax.random.PRNGKey(0), obs, deterministic=True
        )
        actions = res["actions"]
        if action_space is not None and hasattr(action_space, "low"):
            low = jnp.asarray(action_space.low, jnp.float32)
            high = jnp.asarray(action_space.high, jnp.float32)
            # low/high may independently be scalar or per-dim arrays
            # (convert_space collapses uniform bounds) — check each alone,
            # a combined np.asarray would be ragged and raise
            if np.all(np.isfinite(action_space.low)) and np.all(
                np.isfinite(action_space.high)
            ):
                a = jnp.clip(actions, -1.0, 1.0)
                actions = a * (high - low) / 2.0 + (high + low) / 2.0
        return actions

    return policy


def export_policy_fn(policy, example_obs) -> bytes:
    """Serialize any obs → action callable to a StableHLO artifact with a
    symbolic batch dimension (serve any batch size)."""
    from jax import export as jax_export

    batch = jax_export.symbolic_shape("b")[0]
    obs_spec = jax.ShapeDtypeStruct(
        (batch,) + tuple(example_obs.shape[1:]), jnp.float32
    )
    exported = jax_export.export(jax.jit(policy))(obs_spec)
    return exported.serialize()


def export_policy(model, net_params, norm, example_obs,
                  action_space=None) -> bytes:
    """Serialize the deterministic policy to a StableHLO artifact."""
    policy = make_deterministic_policy_fn(model, net_params, norm, action_space)
    return export_policy_fn(policy, example_obs)


def load_policy(blob: bytes):
    """Deserialize an exported policy; returns a callable obs → actions."""
    from jax import export as jax_export

    exported = jax_export.deserialize(blob)
    return lambda obs: exported.call(obs)


def save_policy(path: str, model, net_params, norm, example_obs,
                action_space=None):
    blob = export_policy(model, net_params, norm, example_obs, action_space)
    with open(path, "wb") as f:
        f.write(blob)
    return path
