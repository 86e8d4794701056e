"""rl_games_tpu — a TPU-native RL training framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Denys88/rl_games
(reference mounted at /root/reference). The reference is a stepwise, host-driven
PyTorch trainer; this framework inverts that into jit-compiled SPMD programs:
rollouts are `lax.scan`s over device-resident vectorized environments, GAE is a
Pallas TPU kernel (or associative scan), and the PPO/SAC updates are fused
on-device minibatch scans over an immutable TrainState pytree. Multi-chip
scaling uses `jax.sharding.Mesh` + jit shardings instead of NCCL process groups.
"""

__version__ = "0.1.0"
