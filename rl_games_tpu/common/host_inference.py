"""Host-side rollout inference: device selection for host-env loops.

Host-env paths (the gymnasium/cpuenv bridges — the reference's Ray/envpool
role, common/vecenv.py:70-178) interleave ONE policy inference per
environment step with non-jittable env stepping. When the accelerator is
remote (TPU pods reached through a PJRT relay/proxy), every dispatch +
readback pays a network round trip: measured ~30 ms through the relay vs
~0.2 ms for the same small-batch policy forward executed on the host CPU
backend — a 150x per-step latency gap that dominates a horizon-128 PPO
rollout (the reference never faces this: its GPU sits on the local PCIe
bus next to the envs, a2c_common.py play_steps :787-850).

The TPU-native answer is a split placement: rollout inference runs on the
HOST's CPU backend (params sync accelerator→host once per epoch — one
round trip instead of 2·horizon), while the compiled GAE+update epoch
stays on the accelerator where the FLOPs are. SAC host training keeps
everything on the accelerator by design: its UTD gradient updates are
fused into the SAME per-step dispatch as acting (algos/sac.py
ingest_update_act), so there is exactly one round trip per env step
already and the update compute must live on the big device.

``host_inference_device`` config values (PPO host path + players):
  auto (default) — host CPU backend when the default backend is an
      accelerator and a CPU backend is registered; no-op otherwise.
  cpu — force the host CPU backend (error if unavailable).
  default — every dispatch on the default backend (useful to A/B).
"""

import contextlib
import os

import jax


def ensure_cpu_platform():
    """Extend ``jax_platforms`` with 'cpu' so host rollouts can run policy
    inference host-side. Must run before JAX initializes its backends
    (the CLI calls it first thing); no-op when JAX_PLATFORMS is unset
    (every platform is already available) or already lists cpu. The
    first-listed platform keeps providing the default backend."""
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in [p.strip() for p in plats.split(",")]:
        try:
            jax.config.update("jax_platforms", plats + ",cpu")
        except Exception:
            pass  # backends already initialized — resolve() falls back


def resolve_rollout_device(preference="auto"):
    """Map a ``host_inference_device`` preference to a jax.Device or None
    (None = keep dispatches on the default backend)."""
    if preference in (None, "default"):
        return None
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        if preference == "cpu":
            raise RuntimeError(
                "host_inference_device: cpu requested but no CPU backend "
                "is registered — set JAX_PLATFORMS to include 'cpu' (the "
                "CLI registers it automatically)"
            )
        return None
    if preference == "cpu":
        return cpu
    if preference != "auto":
        raise ValueError(
            f"host_inference_device: unknown value {preference!r} "
            "(expected auto | cpu | default)"
        )
    return cpu if jax.default_backend() != "cpu" else None


def device_ctx(dev):
    """default-device context for the rollout loop (uncommitted creations
    like jnp.asarray(host_obs) land on the rollout device)."""
    return jax.default_device(dev) if dev is not None else (
        contextlib.nullcontext()
    )
