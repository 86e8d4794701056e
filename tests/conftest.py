"""Test env setup: CPU backend with a virtual 8-device mesh.

Mirrors the multi-node-without-a-cluster approach described in SURVEY.md §4 —
jit-under-mesh tests run against a forced 8-device CPU platform.

The environment may boot the interpreter with a TPU PJRT plugin already
registered via sitecustomize (JAX_PLATFORMS=axon), making env vars set here
too late — so force the platform through jax.config instead, which works as
long as no backend has been initialized yet. Set RLG_TPU_TESTS_ON_TPU=1 to
opt out and run the suite on the real accelerator.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

if os.environ.get("RLG_TPU_TESTS_ON_TPU") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass  # XLA_FLAGS fallback above covers older jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
