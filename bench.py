"""Benchmark: PPO training throughput (env-steps/s) on one chip.

Runs the full fused training epoch (rollout scan + Pallas GAE + minibatch
updates, all on device) on an Ant-class workload: 8192 device-resident Ant2D
envs (real articulated rigid-body physics — planar quadruped, Lagrangian
dynamics via autodiff, penalty contacts; rl_games_tpu/envs/jax/ant2d.py),
horizon 16, [256,128,64] MLP actor-critic. PPO learns locomotion on this
exact config (reward ~20 → ~1000 in 300 epochs). Prints ONE JSON line.

Baseline: the reference's PPO Brax Ant step throughput, 1,692,066 env-steps/s
on GPU (docs/BRAX.md:20; BASELINE.md).
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_FPS = 1_692_066.0  # reference Brax Ant step fps (docs/BRAX.md:20)


def main():
    from rl_games_tpu.algos.ppo import PPOAgent
    from __graft_entry__ import _flagship_params

    num_actors = 8192
    params = _flagship_params(num_actors=num_actors)
    params["config"]["env_name"] = "Ant2D"
    params["config"]["minibatch_size"] = num_actors * 16 // 4
    params["config"]["mini_epochs"] = 4

    agent = PPOAgent("bench", params)
    state = agent.init_state()
    train_fn = agent.make_train_fn()

    # warmup / compile
    state, metrics = train_fn(state)
    float(metrics["a_loss"])

    # NOTE: epochs are CHAINED (state feeds the next call) with ONE host
    # readback at the end — the readback forces completion of the whole
    # chain (same device stream), so the measurement is honest while not
    # counting the per-call host<->device round-trip latency (~30 ms under
    # the remote-TPU relay) against device throughput.  block_until_ready
    # alone is NOT sufficient under the relay; the scalar D2H transfer is.
    # Median of 3 windows: the chip is sometimes shared with other
    # processes (benchmark jobs, relay traffic); the median sheds a
    # transiently-contended window without inflating the figure. Windows
    # stay 30 epochs long so the one ~30 ms relay readback per window
    # amortizes to ~1 ms/epoch (docs/PERF.md methodology).
    n_epochs = 30
    frames_per_epoch = agent.batch_size
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_epochs):
            state, metrics = train_fn(state)
        float(metrics["a_loss"])
        dt = time.perf_counter() - t0
        rates.append(n_epochs * frames_per_epoch / dt)

    fps = sorted(rates)[1]
    print(
        json.dumps(
            {
                "metric": "ppo_env_steps_per_s_per_chip",
                "value": round(fps, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
