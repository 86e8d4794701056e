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
MAX_CONCURRENT = 3      # cpu lane: host-stepping-bound runs (4 cores)
MAX_TPU_CONCURRENT = 2  # tpu lane: relay-bound runs, little host CPU

# name, config, checkpoint, curve log, completion = (kind, target), platform
# Round-5 queue (VERDICT.md next-round items 1-6): the 5 never-run DMC rows,
# the WalkerRun rescue seed, a WalkerStand closing seed, 3 pre-registered
# consecutive SAC-Humanoid seeds (101/102/103), HumanoidRun (100M-frame
# budget -- runs last; a partial curve is the in-round deliverable).
# Longest-processing-time-first so the 50M/41M-frame humanoid rows start
# in the first wave of MAX_CONCURRENT slots.
RUNS = [
    ("fish_swim", "benchruns/fish_swim_rowstop.yaml",
     "runs/FishSwim_envpool/nn/FishSwim_envpool.ckpt",
     "docs/dmc_fish_swim_run.log", ("epoch", 4000), "cpu"),
    # seed 5 died at 54% of budget with the entropy-collapse signature
    # (entropy -1.4, reward never above 7 -- the WalkerRun seed-5 failure
    # mode; runs/HopperStand_envpool TB); two fresh seeds ran in parallel.
    # Seed 11 reproduced the dead draw (rew 2.46 at 69% of budget, same
    # signature) and was CUT at the session restart -- finishing a dead
    # seed's budget proves nothing; its core goes to humanoid_run instead.
    ("hopper_stand_s17", "benchruns/hopper_stand_s17_rowstop.yaml",
     "runs/HopperStand_envpool_s17/nn/HopperStand_envpool_s17.ckpt",
     "docs/dmc_hopper_stand_s17_run.log", ("epoch", 4000), "cpu"),
    # row-stop fired at ~2M frames but deterministic playback (883.41)
    # sits below WalkerStand's 907 row (train mean > playback on this
    # task) -- continue the same seed on the verbatim no-stop config to
    # push the best-watermark higher, fresh log so the old win line does
    # not mark it complete
    ("walker_stand_s11b", "benchruns/walker_stand_seed11.yaml",
     "runs/WalkerStand_envpool_s11/nn/WalkerStand_envpool_s11.ckpt",
     "docs/dmc_walker_stand_seed11b_run.log", ("epoch", 4000), "cpu"),
    ("sac_hum_s101", "benchruns/sac_humanoid_s101.yaml",
     "runs/Humanoid-v5_SAC_s101/nn/Humanoid-v5_SAC_s101.ckpt",
     "docs/sac_humanoid_seed101_run.log", ("frames", 1_000_000), "tpu"),
    ("sac_hum_s102", "benchruns/sac_humanoid_s102.yaml",
     "runs/Humanoid-v5_SAC_s102/nn/Humanoid-v5_SAC_s102.ckpt",
     "docs/sac_humanoid_seed102_run.log", ("frames", 1_000_000), "tpu"),
    ("sac_hum_s103", "benchruns/sac_humanoid_s103.yaml",
     "runs/Humanoid-v5_SAC_s103/nn/Humanoid-v5_SAC_s103.ckpt",
     "docs/sac_humanoid_seed103_run.log", ("frames", 1_000_000), "tpu"),
    ("humanoid_run", "benchruns/humanoid_run_rowstop.yaml",
     "runs/HumanoidRun_envpool/nn/HumanoidRun_envpool.ckpt",
     "docs/dmc_humanoid_run_run.log", ("frames", 100_000_000), "cpu"),
]

MAX_RELAUNCH = 6  # consecutive relaunches WITHOUT progress (crash loop);
# a healthy run that simply outlives its 8h timeout window resets the count
relaunches = {name: 0 for name, *_ in RUNS}
progress_at_relaunch = {name: -1 for name, *_ in RUNS}


def note(msg):
    with open(LOG, "a") as f:
        f.write(f"{time.strftime('%F %T')} {msg}\n")


def last_progress(log_path, kind, target=None):
    """Latest epoch or frames figure in the curve log; a score_to_win stop
    ("Network won!" -- the row-stop configs set score_to_win at ~110% of the
    published row) counts as reaching the target."""
    try:
        with open(log_path, "rb") as f:
            f.seek(max(0, os.path.getsize(log_path) - 65536))
            tail = f.read().decode(errors="replace")
    except OSError:
        return 0
    if target is not None and "Network won!" in tail:
        return target
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
        running = {p: 0 for p in ("cpu", "tpu")}
        for _, cfg, _, _, _, p in RUNS:
            if alive(cfg):
                running[p] += 1
        caps = {"cpu": MAX_CONCURRENT, "tpu": MAX_TPU_CONCURRENT}
        for name, cfg, ckpt, log_path, (kind, target), platform in RUNS:
            prog = last_progress(os.path.join(REPO, log_path), kind, target)
            if prog >= target:
                continue
            pending += 1
            if alive(cfg):
                continue
            if running[platform] >= caps[platform]:
                continue
            if prog > progress_at_relaunch[name]:
                relaunches[name] = 0  # it advanced: not a crash loop
            if relaunches[name] >= MAX_RELAUNCH:
                note(f"{name} dead at {prog}/{target} but relaunch cap hit")
                continue
            relaunches[name] += 1
            progress_at_relaunch[name] = prog
            relaunch(name, cfg, ckpt, log_path, platform)
            running[platform] += 1
        if pending == 0:
            note("all runs complete; exiting")
            return
        time.sleep(600)


if __name__ == "__main__":
    main()
