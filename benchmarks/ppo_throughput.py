"""PPO training throughput across the device-env morphology family.

The reference publishes per-env Brax PPO throughput (docs/BRAX.md:20-24):
Ant 1,692,066 / Humanoid 1,244,450 / ur5e 1,116,872 env-steps/s ("step"
column, GPU).  This harness measures the analogous number here — the FULL
fused training epoch (rollout scan + GAE + minibatch updates, one device
program) per morphology class:

  Ant3D      — full-3D 14-DoF quadruped, the direct Brax Ant analog
  Humanoid3D — full-3D 18-DoF biped, the direct Brax Humanoid analog
  Ant2D      — planar quadruped, the Brax Ant analog (bench.py's workload)
  Walker2D   — planar upright biped, the Humanoid analog
  Arm2D      — torque-controlled reacher, the ur5e analog

Method (see docs/PERF.md): epochs are CHAINED (state feeds the next call)
with ONE host readback at the end; the readback fences the chain, so the
per-call relay round-trip (~30 ms) is amortized away and the number is
device throughput, which is what the reference's GPU figure measures.

Usage:  python benchmarks/ppo_throughput.py [--envs Ant2D,Walker2D,Arm2D]
                                            [--num-actors 8192] [--epochs 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# reference docs/BRAX.md:20-24, "step" env-steps/s on GPU
BRAX_STEP_FPS = {
    "Ant3D": ("Brax Ant", 1_692_066.0),
    "Ant2D": ("Brax Ant", 1_692_066.0),
    "Humanoid3D": ("Brax Humanoid", 1_244_450.0),
    "Walker2D": ("Brax Humanoid", 1_244_450.0),
    "Arm2D": ("Brax ur5e", 1_116_872.0),
}


def bench_env(env_name, num_actors, n_epochs):
    from rl_games_tpu.algos.ppo import PPOAgent
    from __graft_entry__ import _flagship_params

    params = _flagship_params(num_actors=num_actors)
    params["config"]["env_name"] = env_name
    params["config"]["minibatch_size"] = num_actors * 16 // 4
    params["config"]["mini_epochs"] = 4

    agent = PPOAgent(f"bench_{env_name}", params)
    state = agent.init_state()
    train_fn = agent.make_train_fn()

    state, metrics = train_fn(state)  # compile + warmup
    float(metrics["a_loss"])

    t0 = time.perf_counter()
    for _ in range(n_epochs):
        state, metrics = train_fn(state)
    float(metrics["a_loss"])  # host readback fences the chain
    dt = time.perf_counter() - t0
    return n_epochs * agent.batch_size / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", default="Ant3D,Humanoid3D,Ant2D,Walker2D,Arm2D")
    ap.add_argument("--num-actors", type=int, default=8192)
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()

    for env_name in args.envs.split(","):
        fps = bench_env(env_name, args.num_actors, args.epochs)
        ref_name, ref_fps = BRAX_STEP_FPS.get(env_name, (None, None))
        row = {
            "env": env_name,
            "env_steps_per_s": round(fps, 1),
            "num_actors": args.num_actors,
        }
        if ref_fps:
            row["reference"] = ref_name
            row["reference_fps"] = ref_fps
            row["vs_reference"] = round(fps / ref_fps, 3)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
