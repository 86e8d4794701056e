"""CLI launcher: python -m rl_games_tpu --train --file cfg.yaml [...]

Mirrors the reference's runner.py:16-76 argument surface (--train/--play/
--file/--checkpoint/--seed/--num_actors/--sigma/--track/--profile).
"""

import argparse
import os

import yaml


def _enable_compile_cache():
    """Persistent XLA compile cache: without it every CLI invocation
    recompiles its programs from scratch (minutes over a remote-compile
    service). Override the location with RLG_JAX_CACHE_DIR."""
    import jax

    cache_dir = os.environ.get(
        "RLG_JAX_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    # register the host CPU backend next to the accelerator platform
    # BEFORE backends initialize: host-env rollouts run policy inference
    # host-side when the accelerator is remote (common/host_inference.py)
    from rl_games_tpu.common.host_inference import ensure_cpu_platform

    ensure_cpu_platform()
    _enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0, help="random seed override")
    ap.add_argument("-tf", "--tf", action="store_true", help="(ignored; parity)")
    ap.add_argument("-t", "--train", action="store_true")
    ap.add_argument("-p", "--play", action="store_true")
    ap.add_argument("-c", "--checkpoint", type=str, default=None)
    ap.add_argument("-f", "--file", type=str, required=True, help="yaml config")
    ap.add_argument("-na", "--num_actors", type=int, default=0)
    ap.add_argument("--sigma", type=float, default=None)
    ap.add_argument("--seeds", type=str, default=None,
                    help="comma-separated seed list: train every seed "
                         "simultaneously as one compiled vmapped program "
                         "(device envs; PPO and SAC)")
    ap.add_argument("--track", action="store_true", help="wandb tracking")
    ap.add_argument(
        "--wandb-project-name", type=str, default="rl_games_tpu"
    )
    ap.add_argument("--wandb-entity", type=str, default=None)
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax profiler trace")
    ap.add_argument("--export", action="store_true",
                    help="export the policy (-c checkpoint) to a "
                         "deployable StableHLO artifact")
    ap.add_argument("--export-path", type=str, default=None,
                    help="output path for --export "
                         "(default: <checkpoint>.stablehlo)")
    args = vars(ap.parse_args())

    with open(args["file"]) as f:
        config = yaml.safe_load(f)

    if args["num_actors"] > 0:
        config["params"]["config"]["num_actors"] = args["num_actors"]
    if args["seed"] > 0:
        config["params"]["seed"] = args["seed"]
        # seed fans out to the env too (torch_runner.py:196-208)
        config["params"]["config"].setdefault("env_config", {})["seed"] = (
            args["seed"]
        )

    from rl_games_tpu.runner import Runner

    runner = Runner()
    runner.load(config)

    # wandb tracking mirrors runner.py:62-71 (sync_tensorboard so the TB
    # scalar families stream through); the package is optional
    wandb_run = None
    if args["track"]:
        try:
            import wandb

            wandb_run = wandb.init(
                project=args["wandb_project_name"],
                entity=args["wandb_entity"],
                sync_tensorboard=True,
                config=config,
                monitor_gym=True,
                save_code=True,
            )
        except ImportError:
            print("--track requested but wandb is not installed; continuing "
                  "with TensorBoard only")

    if args["profile"]:
        import jax

        with jax.profiler.trace("/tmp/rl_games_tpu_trace"):
            runner.run(args)
        print("profiler trace written to /tmp/rl_games_tpu_trace")
    else:
        runner.run(args)

    if wandb_run is not None:
        wandb_run.finish()


if __name__ == "__main__":
    main()
