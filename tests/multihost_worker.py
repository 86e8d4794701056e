"""Worker process for the real multi-process distributed tests.

Spawned by tests/test_multihost.py — one OS process per simulated host,
each owning 4 virtual CPU devices; `jax.distributed.initialize` (through
`initialize_multihost`) joins them into one 8-device global mesh with gloo
cross-process collectives. The reference has no analog for this (its
multi-GPU claims are untested, SURVEY.md §4); here the SAME PPO/SAC mesh
path used on TPU pods runs unmodified across process boundaries.
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    world = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))
    sys.path.insert(0, here)

    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from rl_games_tpu.parallel.mesh import create_mesh, initialize_multihost

    rank, nprocs = initialize_multihost(f"localhost:{port}", world, pid)
    assert rank == pid and nprocs == world
    mesh = create_mesh(jax.devices())  # spans all processes

    out = {
        "process_id": pid,
        "num_processes": nprocs,
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
    }

    from test_ppo import cartpole_params

    from rl_games_tpu.algos.ppo import PPOAgent

    agent = PPOAgent("t", cartpole_params(num_actors=16))
    state = agent.init_state()
    fn = agent.make_train_fn(mesh=mesh, donate=False)
    for _ in range(2):
        state, m = fn(state)
    out["ppo"] = {k: float(m[k]) for k in ("a_loss", "c_loss", "kl")}

    from test_sac import small_cfg

    from rl_games_tpu.algos.sac import SACAgent

    cfg = small_cfg(num_actors=8, replay_buffer_size=1024,
                    num_warmup_steps=1)
    sagent = SACAgent("t", cfg["params"])
    sstate = sagent.init_state()
    sfn = sagent.make_train_fn(mesh=mesh, donate=False)
    for _ in range(3):
        sstate, sm = sfn(sstate)
    out["sac"] = {k: float(sm[k]) for k in ("critic_loss", "actor_loss")}

    with open(out_path, "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
