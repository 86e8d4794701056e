"""SAC benchmark harness — the reference's benchmarks/sac_benchmark.py
analog: batch-run the SAC MuJoCo configs across seeds, score each run as
the mean of the last 10 logged `rewards/step` points (docs/
SAC_BENCHMARKS.md:3-7 scoring rule), and compare to the published bands.

    python benchmarks/sac_benchmark.py --env halfcheetah --seeds 5 11
    python benchmarks/sac_benchmark.py --env ant --probe   # tiny wiring run
    python benchmarks/sac_benchmark.py --report results.json

Each completed run appends a JSON record to the report file; --report
prints the aggregate table with band comparisons.
"""

import argparse
import json
import os
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# published reference bands (reference benchmarks/sac_benchmark.py:42,
# docs/SAC_BENCHMARKS.md:23-27)
BANDS = {
    "halfcheetah": (10469.0, 1123.0),
    "ant": (4623.0, 984.0),
    "humanoid": (5044.0, 390.0),
}

CONFIGS = {
    "halfcheetah": "rl_games_tpu/configs/sac_halfcheetah.yaml",
    "ant": "rl_games_tpu/configs/sac_ant.yaml",
    "humanoid": "rl_games_tpu/configs/sac_humanoid.yaml",
    "pendulum": "rl_games_tpu/configs/sac_pendulum.yaml",
}


class CaptureWriter:
    """Writer shim: forwards nothing, records rewards/step points."""

    def __init__(self):
        self.points = []

    def add_scalar(self, tag, value, step):
        if tag == "rewards/step":
            self.points.append((int(step), float(value)))

    def flush(self):
        pass

    def close(self):
        pass


def score_points(points, last_n: int = 10):
    """Mean of the last `last_n` rewards/step points (the scoring rule)."""
    if not points:
        return None
    vals = [v for _, v in points[-last_n:]]
    return float(np.mean(vals))


def run_one(env: str, seed: int, probe: bool = False, train_dir: str = None):
    from rl_games_tpu.runner import Runner

    with open(os.path.join(REPO, CONFIGS[env])) as f:
        cfg = yaml.safe_load(f)
    c = cfg["params"]["config"]
    cfg["params"]["seed"] = seed
    c.setdefault("env_config", {})["seed"] = seed
    if train_dir:
        c["train_dir"] = train_dir
    if probe:
        c["max_frames"] = 4000
        c["num_warmup_frames"] = 500
        c["log_interval"] = 5
    c["print_stats"] = not probe

    runner = Runner()
    runner.load(cfg)
    agent = runner.create_agent()
    writer = CaptureWriter()
    agent.train(writer=writer)
    score = score_points(writer.points)
    band = BANDS.get(env)
    record = {
        "env": env,
        "seed": seed,
        "frames": int(c.get("max_frames", -1)),
        "score": score,
        "band_mean": band[0] if band else None,
        "band_std": band[1] if band else None,
        "in_band": (
            bool(band and score is not None and abs(score - band[0]) <= band[1])
            if band
            else None
        ),
    }
    return record


def report(path: str):
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    by_env = {}
    for r in records:
        by_env.setdefault(r["env"], []).append(r["score"])
    for env, scores in sorted(by_env.items()):
        band = BANDS.get(env)
        scores = [s for s in scores if s is not None]
        mean = float(np.mean(scores)) if scores else float("nan")
        std = float(np.std(scores)) if len(scores) > 1 else 0.0
        line = f"{env:12s} {mean:9.1f} ± {std:7.1f}  ({len(scores)} seeds)"
        if band:
            line += f"   reference {band[0]:.0f} ± {band[1]:.0f}"
        print(line)
    return by_env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", choices=sorted(CONFIGS), default=None)
    ap.add_argument("--seeds", type=int, nargs="+", default=[5])
    ap.add_argument("--probe", action="store_true",
                    help="tiny run to validate wiring")
    ap.add_argument("--out", default="benchruns/sac_results.jsonl")
    ap.add_argument("--report", default=None,
                    help="print the aggregate table from a results file")
    ap.add_argument("--train_dir", default="benchruns/runs")
    args = ap.parse_args()

    if args.report:
        report(args.report)
        return
    if args.env is None:
        ap.error("--env is required unless --report is given")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    for seed in args.seeds:
        rec = run_one(args.env, seed, probe=args.probe,
                      train_dir=args.train_dir)
        print(json.dumps(rec))
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
