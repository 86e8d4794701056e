"""Real multi-process distributed training test.

The in-process mesh tests (test_ppo.py / test_sac.py) prove the SPMD math
on 8 virtual devices inside ONE process. This goes one step further down
SURVEY.md §2.6's multi-host row: two OS processes (simulated hosts), 4
virtual CPU devices each, joined by `jax.distributed.initialize` with gloo
collectives into one global 8-device mesh — the exact code path a TPU pod
uses across hosts (DCN), where the reference needs torchrun + hand-rolled
NCCL allreduces (a2c_common.py:109,362-378) and ships no test at all for
it (SURVEY.md §4: "no distributed tests").

Asserts: both processes compute identical metrics (replicated outputs
agree across hosts), and the 2-process global program matches the plain
single-process run (multi-host == single-host math).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import jax


def _spawn_worker(pid, world, port, out_path):
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "multihost_worker.py")
    return subprocess.Popen(
        [sys.executable, worker, str(pid), str(world), str(port), out_path],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )


def test_two_process_distributed_matches_single_process(tmp_path):
    port = 29400 + os.getpid() % 1000
    outs = [str(tmp_path / f"proc{i}.json") for i in range(2)]
    procs = [_spawn_worker(i, 2, port, outs[i]) for i in range(2)]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = []
    for path in outs:
        with open(path) as f:
            results.append(json.load(f))

    for i, r in enumerate(results):
        assert r["process_id"] == i
        assert r["num_processes"] == 2
        assert r["global_devices"] == 8
        assert r["local_devices"] == 4

    # replicated outputs must agree bit-for-bit-ish across hosts
    for key in ("ppo", "sac"):
        for metric, v0 in results[0][key].items():
            np.testing.assert_allclose(
                v0, results[1][key][metric], rtol=1e-6,
                err_msg=f"{key}/{metric} differs across processes",
            )

    # multi-host == single-host math (same global batch, no mesh)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_ppo import cartpole_params
    from test_sac import small_cfg

    from rl_games_tpu.algos.ppo import PPOAgent
    from rl_games_tpu.algos.sac import SACAgent

    agent = PPOAgent("t", cartpole_params(num_actors=16))
    state = agent.init_state()
    fn = agent.make_train_fn(donate=False)
    for _ in range(2):
        state, m = fn(state)
    np.testing.assert_allclose(
        results[0]["ppo"]["a_loss"], float(m["a_loss"]), rtol=1e-3,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        results[0]["ppo"]["c_loss"], float(m["c_loss"]), rtol=1e-3,
        atol=1e-5,
    )

    cfg = small_cfg(num_actors=8, replay_buffer_size=1024,
                    num_warmup_steps=1)
    sagent = SACAgent("t", cfg["params"])
    sstate = sagent.init_state()
    sfn = sagent.make_train_fn(donate=False)
    for _ in range(3):
        sstate, sm = sfn(sstate)
    np.testing.assert_allclose(
        results[0]["sac"]["critic_loss"], float(sm["critic_loss"]),
        rtol=1e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        results[0]["sac"]["actor_loss"], float(sm["actor_loss"]),
        rtol=1e-3, atol=1e-5,
    )
