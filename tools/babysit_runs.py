#!/usr/bin/env python
"""Benchmark-run babysitter.

Watches the long training runs listed in RUNS; launches them in priority
order (at most MAX_CONCURRENT at a time, the host has 4 CPUs) and, when
one dies before reaching its completion criterion, relaunches it from its
latest checkpoint (same config, same log, append). Never kills anything —
detection is read-only (/proc cmdline scan); relaunch count is capped to
avoid crash loops. Progress notes go to benchruns/babysitter.log.

Per-run platform: "tpu" runs inherit the default env (axon relay);
"cpu" runs strip PYTHONPATH (sitecustomize forces the relay) and set
JAX_PLATFORMS=cpu — used for the host-env-stepping-bound published-budget
runs where the ~30 ms/step relay round trip, not compute, would dominate
(see docs/PERF.md "Measurement methodology").
"""
import os
import re
import subprocess
import time

REPO = "/root/repo"
LOG = os.path.join(REPO, "benchruns", "babysitter.log")
MAX_CONCURRENT = 3

# name, config, checkpoint, curve log, completion = (kind, target), platform
# Round-4 queue (VERDICT.md next-round items 2-5): below-reference rows
# (BallInCup seeds, Hopper seed), the two missing PPO-MuJoCo rows
# (Ant-v5, HalfCheetah-v5), 4 more DMC tasks, 2 more SAC-Humanoid seeds.
RUNS = [
    ("ballincup_s17", "benchruns/ballincup_seed17.yaml",
     "runs/BallInCupCatch_envpool_s17/nn/BallInCupCatch_envpool_s17.ckpt",
     "docs/dmc_ball_in_cup_seed17_run.log", ("epoch", 4000), "cpu"),
    ("pendulum_swing", "rl_games_tpu/configs/ref/dm_control/pendulum_swingup.yaml",
     "runs/PendulumSwingup_envpool/nn/PendulumSwingup_envpool.ckpt",
     "docs/dmc_pendulum_swingup_run.log", ("epoch", 4000), "cpu"),
    ("ant", "rl_games_tpu/configs/ref/mujoco/ant_envpool.yaml",
     "runs/Ant-v5_envpool/nn/Ant-v5_envpool.ckpt",
     "docs/ppo_ant_envpool_run.log", ("epoch", 2000), "tpu"),
    ("hopper_s31", "benchruns/hopper_seed31.yaml",
     "runs/Hopper-v5_envpool_s31/nn/Hopper-v5_envpool_s31.ckpt",
     "docs/ppo_hopper_envpool_seed31_run.log", ("epoch", 1000), "tpu"),
    ("sac_hum_s23", "benchruns/sac_humanoid_s23.yaml",
     "runs/Humanoid-v5_SAC_s23/nn/Humanoid-v5_SAC_s23.ckpt",
     "docs/sac_humanoid_seed23_run.log", ("frames", 1_000_000), "tpu"),
    ("walker_stand", "rl_games_tpu/configs/ref/dm_control/walker_stand.yaml",
     "runs/WalkerStand_envpool/nn/WalkerStand_envpool.ckpt",
     "docs/dmc_walker_stand_run.log", ("epoch", 4000), "cpu"),
    ("cheetah_run", "rl_games_tpu/configs/ref/dm_control/cheetah_walk.yaml",
     "runs/CheetahRun_envpool/nn/CheetahRun_envpool.ckpt",
     "docs/dmc_cheetah_run_run.log", ("epoch", 4000), "cpu"),
    ("sac_hum_s31", "benchruns/sac_humanoid_s31.yaml",
     "runs/Humanoid-v5_SAC_s31/nn/Humanoid-v5_SAC_s31.ckpt",
     "docs/sac_humanoid_seed31_run.log", ("frames", 1_000_000), "tpu"),
    # resumes the round-3 partial run (epoch ~504, checkpoints under
    # benchruns/hc from that round's train_dir)
    ("halfcheetah", "rl_games_tpu/configs/ref/mujoco/halfcheetah_envpool.yaml",
     "benchruns/hc/HalfCheetah-v5_envpool/nn/HalfCheetah-v5_envpool.ckpt",
     "docs/ppo_halfcheetah_envpool_run.log", ("epoch", 1000), "tpu"),
    ("walker_run", "rl_games_tpu/configs/ref/dm_control/walker_run.yaml",
     "runs/WalkerRun_envpool/nn/WalkerRun_envpool.ckpt",
     "docs/dmc_walker_run_run.log", ("epoch", 4000), "cpu"),
    ("ballincup_s23", "benchruns/ballincup_seed23.yaml",
     "runs/BallInCupCatch_envpool_s23/nn/BallInCupCatch_envpool_s23.ckpt",
     "docs/dmc_ball_in_cup_seed23_run.log", ("epoch", 4000), "cpu"),
    ("hopper_s47", "benchruns/hopper_seed47.yaml",
     "runs/Hopper-v5_envpool_s47/nn/Hopper-v5_envpool_s47.ckpt",
     "docs/ppo_hopper_envpool_seed47_run.log", ("epoch", 1000), "tpu"),
]

MAX_RELAUNCH = 6  # consecutive relaunches WITHOUT progress (crash loop);
# a healthy run that simply outlives its 8h timeout window resets the count
relaunches = {name: 0 for name, *_ in RUNS}
progress_at_relaunch = {name: -1 for name, *_ in RUNS}


def note(msg):
    with open(LOG, "a") as f:
        f.write(f"{time.strftime('%F %T')} {msg}\n")


def last_progress(log_path, kind):
    """Latest epoch or frames figure in the curve log."""
    try:
        with open(log_path, "rb") as f:
            f.seek(max(0, os.path.getsize(log_path) - 65536))
            tail = f.read().decode(errors="replace")
    except OSError:
        return 0
    pat = r"epoch:\s*(\d+)" if kind == "epoch" else r"frames:\s*(\d+)"
    hits = re.findall(pat, tail)
    return int(hits[-1]) if hits else 0


def alive(cfg):
    """True if a REAL trainer process runs this config file.

    Matches only cmdlines that BEGIN with the trainer invocation (python /
    its timeout/setsid wrappers) — interactive shells legitimately carry
    old command text inside eval wrappers and must not count."""
    base = os.path.basename(cfg)
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                argv = f.read().decode(errors="replace").split("\0")
        except OSError:
            continue
        while argv and os.path.basename(argv[0]) in ("setsid", "timeout"):
            argv = argv[2:] if argv[0].endswith("timeout") else argv[1:]
        if not argv or os.path.basename(argv[0]) not in (
            "python", "python3", "python3.12"
        ):
            continue
        cmd = " ".join(argv)
        if base in cmd and "rl_games_tpu" in cmd:
            return True
    return False


def newest_ckpt(ckpt):
    """Most recent .ckpt in the run's nn/ dir (prefer the periodic last_*
    saves over the named best file), falling back to the named path."""
    ckpt_abs = ckpt if ckpt.startswith("/") else os.path.join(REPO, ckpt)
    nn_dir = os.path.dirname(ckpt_abs)
    try:
        cands = [os.path.join(nn_dir, f) for f in os.listdir(nn_dir)
                 if f.endswith(".ckpt")]
    except OSError:
        cands = []
    if not cands:
        return ckpt_abs if os.path.exists(ckpt_abs) else None
    return max(cands, key=os.path.getmtime)


def relaunch(name, cfg, ckpt, log_path, platform):
    cmd = ["setsid", "timeout", "28800", "python", "-m", "rl_games_tpu",
           "--train", "-f", cfg]
    resume = newest_ckpt(ckpt)
    if resume:
        cmd += ["-c", resume]
    env = dict(os.environ)
    if platform == "cpu":
        env.pop("PYTHONPATH", None)
        env["JAX_PLATFORMS"] = "cpu"
    with open(os.path.join(REPO, log_path), "a") as out:
        subprocess.Popen(cmd, cwd=REPO, stdout=out, stderr=subprocess.STDOUT,
                         stdin=subprocess.DEVNULL, start_new_session=True,
                         env=env)
    note(f"relaunched {name} ({relaunches[name]}, {platform}): {' '.join(cmd)}")


def main():
    note("babysitter up")
    while True:
        pending = 0
        # full pass first: count every live run before any launch decision,
        # or late-listed live runs would not count against the cap
        running = sum(1 for _, cfg, *_ in RUNS if alive(cfg))
        for name, cfg, ckpt, log_path, (kind, target), platform in RUNS:
            prog = last_progress(os.path.join(REPO, log_path), kind)
            if prog >= target:
                continue
            pending += 1
            if alive(cfg):
                continue
            if running >= MAX_CONCURRENT:
                continue
            if prog > progress_at_relaunch[name]:
                relaunches[name] = 0  # it advanced: not a crash loop
            if relaunches[name] >= MAX_RELAUNCH:
                note(f"{name} dead at {prog}/{target} but relaunch cap hit")
                continue
            relaunches[name] += 1
            progress_at_relaunch[name] = prog
            relaunch(name, cfg, ckpt, log_path, platform)
            running += 1
        if pending == 0:
            note("all runs complete; exiting")
            return
        time.sleep(600)


if __name__ == "__main__":
    main()
