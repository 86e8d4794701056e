#!/usr/bin/env python
"""Benchmark-run babysitter.

Watches the long training runs listed in RUNS; when one dies before
reaching its completion criterion, relaunches it from its latest
checkpoint (same config, same log, append). Never kills anything —
detection is read-only (/proc cmdline scan); relaunch count is capped
to avoid crash loops. Progress notes go to benchruns/babysitter.log.
"""
import os
import re
import subprocess
import time

REPO = "/root/repo"
LOG = os.path.join(REPO, "benchruns", "babysitter.log")

# name, config, checkpoint, curve log, completion = (kind, target)
RUNS = [
    ("hopper", "rl_games_tpu/configs/ref/mujoco/hopper_envpool.yaml",
     "runs/Hopper-v5_envpool/nn/Hopper-v5_envpool.ckpt",
     "docs/ppo_hopper_envpool_run.log", ("epoch", 1000)),
    ("walker2d", "rl_games_tpu/configs/ref/mujoco/walker2d_envpool.yaml",
     "runs/Walker2d-v5_envpool/nn/Walker2d-v5_envpool.ckpt",
     "docs/ppo_walker2d_envpool_run.log", ("epoch", 1000)),
    ("cart_pub", "benchruns/dmc_cart_published.yaml",
     "/tmp/dmc_runs/CartpoleBalance_published_protocol/nn/CartpoleBalance_published_protocol.ckpt",
     "docs/dmc_cartpole_balance_published_protocol_run.log", ("epoch", 1000)),
    ("walker_walk", "rl_games_tpu/configs/ref/dm_control/walker_walk.yaml",
     "runs/WalkerWalk_envpool/nn/WalkerWalk_envpool.ckpt",
     "docs/dmc_walker_walk_run.log", ("epoch", 4000)),
    ("ball_in_cup", "rl_games_tpu/configs/ref/dm_control/ball_in_cup.yaml",
     "runs/BallInCupCatch_envpool/nn/BallInCupCatch_envpool.ckpt",
     "docs/dmc_ball_in_cup_run.log", ("epoch", 4000)),
    ("humanoid5m", "benchruns/sac_humanoid_5m.yaml",
     "runs/Humanoid-v5_SAC_5M/nn/Humanoid-v5_SAC_5M.ckpt",
     "docs/sac_humanoid_5m_run.log", ("frames", 5_000_000)),
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
    """True if some live process cmdline mentions this config file."""
    base = os.path.basename(cfg)
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode(errors="replace")
        except OSError:
            continue
        if base in cmd and "rl_games_tpu" in cmd and "babysit" not in cmd:
            return True
    return False


def relaunch(name, cfg, ckpt, log_path):
    cmd = ["setsid", "timeout", "28800", "python", "-m", "rl_games_tpu",
           "--train", "-f", cfg]
    if os.path.exists(os.path.join(REPO, ckpt) if not ckpt.startswith("/") else ckpt):
        cmd += ["-c", ckpt]
    with open(os.path.join(REPO, log_path), "a") as out:
        subprocess.Popen(cmd, cwd=REPO, stdout=out, stderr=subprocess.STDOUT,
                         stdin=subprocess.DEVNULL, start_new_session=True)
    note(f"relaunched {name} ({relaunches[name]}): {' '.join(cmd)}")


def main():
    note("babysitter up")
    while True:
        pending = 0
        for name, cfg, ckpt, log_path, (kind, target) in RUNS:
            prog = last_progress(os.path.join(REPO, log_path), kind)
            if prog >= target:
                continue
            pending += 1
            if alive(cfg):
                continue
            if prog > progress_at_relaunch[name]:
                relaunches[name] = 0  # it advanced: not a crash loop
            if relaunches[name] >= MAX_RELAUNCH:
                note(f"{name} dead at {prog}/{target} but relaunch cap hit")
                continue
            relaunches[name] += 1
            progress_at_relaunch[name] = prog
            relaunch(name, cfg, ckpt, log_path)
        if pending == 0:
            note("all runs complete; exiting")
            return
        time.sleep(600)


if __name__ == "__main__":
    main()
