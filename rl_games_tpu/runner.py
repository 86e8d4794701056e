"""Runner: config loading, algo/player factories, seeding, orchestration.

Re-design of rl_games/torch_runner.py (Runner, :98-354). Same public API:
``Runner(algo_observer).load(yaml_dict)``, ``.run({'train': True, ...})``,
``.create_player()``; same YAML schema (params.algo.name / model / network /
config). The reference's device plumbing (DDP rank env vars :177-188, TF32
knobs :133-138, torch.compile policy :268-314) is replaced by the mesh: pass
``mesh=`` or let the runner build a ('data',) mesh over all local devices.
Checkpoint restore happens before the first compile by construction
(restore produces the state jit will specialize on).
"""

import copy
import random
from typing import Any, Dict, Optional

import numpy as np

from rl_games_tpu.common.object_factory import ObjectFactory


def _build_ppo(**kwargs):
    from rl_games_tpu.algos.ppo import PPOAgent

    return PPOAgent(**kwargs)


def _build_sac(**kwargs):
    from rl_games_tpu.algos.sac import SACAgent

    return SACAgent(**kwargs)


def _build_ppo_player(**kwargs):
    from rl_games_tpu.common.player import PpoPlayer

    return PpoPlayer(**kwargs)


def _build_sac_player(**kwargs):
    from rl_games_tpu.common.player import SACPlayer

    return SACPlayer(**kwargs)


def _resolve_stop_fn(stop_fn):
    """Accept a callable or a 'pkg.mod:fn' / 'pkg.mod.fn' import path
    (torch_runner.py:63-80)."""
    if stop_fn is None or callable(stop_fn):
        return stop_fn
    if not isinstance(stop_fn, str):
        raise ValueError(
            "'stop_fn' must be callable or 'module:function' string, got "
            f"{type(stop_fn).__name__}"
        )
    import importlib

    if ":" in stop_fn:
        module_path, attr = stop_fn.split(":", 1)
    else:
        module_path, _, attr = stop_fn.rpartition(".")
        if not module_path:
            raise ValueError(
                f"'stop_fn' string must reference a module attribute: {stop_fn!r}"
            )
    fn = getattr(importlib.import_module(module_path), attr)
    if not callable(fn):
        raise ValueError(f"'stop_fn' resolved {stop_fn!r} is not callable")
    return fn


class Runner:
    def __init__(self, algo_observer=None):
        self.algo_factory = ObjectFactory()
        # torch_runner.py:117-127
        self.algo_factory.register_builder("a2c_continuous", _build_ppo)
        self.algo_factory.register_builder("a2c_discrete", _build_ppo)
        self.algo_factory.register_builder("sac", _build_sac)

        self.player_factory = ObjectFactory()
        self.player_factory.register_builder("a2c_continuous", _build_ppo_player)
        self.player_factory.register_builder("a2c_discrete", _build_ppo_player)
        self.player_factory.register_builder("sac", _build_sac_player)

        self.algo_observer = algo_observer
        self.params = None
        self.mesh = None

    # -- config ------------------------------------------------------------
    def load(self, yaml_config: Dict[str, Any]):
        config = copy.deepcopy(yaml_config)
        self.default_config = config["params"]
        self.load_config(copy.deepcopy(self.default_config))

    def load_config(self, params: Dict[str, Any]):
        """torch_runner.py:143-226 (seed fan-out, env overrides)."""
        self.seed = params.get("seed", None)
        if self.seed is None:
            self.seed = int(np.random.randint(0, 2**16))
        if self.seed == -1:
            self.seed = int(np.random.randint(0, 1000000))
        # per-rank seed offset on multi-host meshes (torch_runner.py:186,
        # 207-208): each host trains distinct env shards
        try:
            import jax

            if jax.process_count() > 1:
                self.seed += jax.process_index()
                env_cfg = params["config"].get("env_config")
                if env_cfg and "seed" in env_cfg:
                    env_cfg["seed"] = (
                        int(env_cfg["seed"]) + jax.process_index()
                    )
        except Exception:
            pass
        random.seed(self.seed)
        np.random.seed(self.seed)
        params["config"]["seed"] = self.seed

        self.algo_name = params["algo"]["name"]
        config = params["config"]
        # config-selectable observer (torch_runner.py:163-167)
        if self.algo_observer is None and config.get("algo_observer"):
            from rl_games_tpu.utils.observers import (
                DefaultAlgoObserver, IsaacAlgoObserver,
            )

            self.algo_observer = (
                IsaacAlgoObserver()
                if config["algo_observer"] == "isaac"
                else DefaultAlgoObserver()
            )
        # user modules imported for their registration side effects —
        # custom networks / env plugins (torch_runner.py:152-155)
        for module in config.get("import_modules", []) or []:
            __import__(module)
        config["reward_shaper"] = config.get("reward_shaper", {})
        if "features" not in config:
            config["features"] = {}
        config["features"]["observer"] = self.algo_observer
        self.params = params

    # -- runs ----------------------------------------------------------------
    def create_agent(self, vec_env=None):
        return self.algo_factory.create(
            self.algo_name,
            base_name="run",
            params=self.params,
            vec_env=vec_env,
        )

    def run_train(self, args: Dict[str, Any]):
        """torch_runner.py:233-321."""
        if args.get("seeds"):
            return self.run_train_multiseed(args)
        print("Started to train")
        agent = self.create_agent()
        # stop_fn: programmatic args win over YAML config (torch_runner.py
        # _apply_stop_fn :83-95); strings resolve to import paths
        stop_fn = _resolve_stop_fn(
            args.get("stop_fn") or self.params["config"].get("stop_fn")
        )
        kwargs = {}
        if self.algo_name != "sac":
            if args.get("sigma") is not None:
                kwargs["sigma"] = args["sigma"]
            if args.get("load_critic_only"):
                kwargs["load_critic_only"] = True
        return agent.train(
            mesh=self.mesh,
            checkpoint=args.get("checkpoint"),
            stop_fn=stop_fn,
            **kwargs,
        )

    def run_train_multiseed(self, args: Dict[str, Any]):
        """`--seeds a,b,c`: train every seed simultaneously as ONE compiled
        vmapped program (utils/multiseed.py — no reference analog; its
        benchmark harness shells out one process per seed). Device envs
        only; PPO and SAC. Writes one curve log line per seed per log_interval and a
        single-seed-compatible checkpoint per seed at the end."""
        import os
        import time

        import jax

        from rl_games_tpu.utils import checkpoint as ckpt
        from rl_games_tpu.utils.multiseed import MultiSeedTrainer

        seeds = args["seeds"]
        if isinstance(seeds, str):
            seeds = [int(s) for s in seeds.replace(",", " ").split()]
        if args.get("checkpoint"):
            raise ValueError(
                "--seeds starts every member from its own seeded init; "
                "resuming a population from a single checkpoint is "
                "ambiguous — drop -c, or warm-start one seed per process "
                "with the single-seed path"
            )
        if args.get("sigma") is not None:
            raise ValueError("--sigma is not supported with --seeds")
        print(f"Started to train {len(seeds)} seeds in one program: {seeds}")
        agent = self.create_agent()
        config = self.params["config"]
        pbt_interval_epochs = 0
        if config.get("pbt") and self.algo_name == "sac":
            print(
                "pbt block ignored: on-device PBT mutates TrainState "
                "hyperparameters of the PPO family; SAC seeds train as a "
                "plain multi-seed stack"
            )
        if config.get("pbt") and self.algo_name != "sac":
            # on-device PBT: the population is the seed axis
            # (utils/multiseed.PopulationTrainer)
            from rl_games_tpu.utils.multiseed import PopulationTrainer
            from rl_games_tpu.utils.pbt import PbtCfg

            pcfg = PbtCfg.from_dict(dict(config["pbt"]))
            trainer = PopulationTrainer(
                agent, seeds,
                threshold_std=pcfg.threshold_std,
                threshold_abs=pcfg.threshold_abs,
                mutation_rate=pcfg.mutation_rate,
                change_range=pcfg.change_range,
            )
            pbt_interval_epochs = max(
                1, pcfg.interval_steps // trainer.frames_per_epoch()
            )
            print(
                f"on-device PBT: band exploit every {pbt_interval_epochs} "
                f"epochs over the {len(seeds)}-member vmapped population"
            )
        else:
            trainer = MultiSeedTrainer(agent, seeds)
        stacked = trainer.init_state()
        fn = trainer.train_fn(mesh=self.mesh)

        name = config.get("name", "run")
        # programmatic args win over YAML (same precedence as run_train's
        # stop_fn handling)
        max_epochs = int(
            args.get("max_epochs") or config.get("max_epochs", 0) or 0
        )
        if not max_epochs:
            # SAC configs bound runs by frames (sac_agent.py max_frames)
            max_frames = int(config.get("max_frames", 0))
            if max_frames:
                max_epochs = max(1, max_frames // trainer.frames_per_epoch())
            else:
                max_epochs = 1000
        log_interval = int(config.get("log_interval", 10))
        frames_per_epoch = trainer.frames_per_epoch() * len(seeds)
        nn_dir = os.path.join(config.get("train_dir", "runs"), name, "nn")
        os.makedirs(nn_dir, exist_ok=True)

        start = time.perf_counter()
        metrics = None
        for epoch in range(1, max_epochs + 1):
            stacked, metrics = fn(stacked)
            if pbt_interval_epochs and epoch % pbt_interval_epochs == 0:
                stacked, events = trainer.pbt_step(
                    stacked, jax.device_get(metrics)
                )
                for ev in events:
                    print(
                        f"pbt: seed{ev['dst']} adopts seed{ev['src']} "
                        f"(lr={ev['lr']:.2e} "
                        f"entropy_coef={ev['entropy_coef']:.4f})",
                        flush=True,
                    )
            if epoch % log_interval == 0 or epoch == max_epochs:
                m = jax.device_get(metrics)
                fps = frames_per_epoch * epoch / (
                    time.perf_counter() - start
                )
                played = m.get("games_played")
                rews = " ".join(
                    f"seed{s}: {float(m['mean_rewards'][i][0]):.2f}"
                    if played is None or int(played[i]) > 0
                    else f"seed{s}: n/a"
                    for i, s in enumerate(seeds)
                )
                print(
                    f"fps total: {fps:.0f} epoch: {epoch}/{max_epochs} "
                    f"frames: {frames_per_epoch * epoch} {rews}",
                    flush=True,
                )
        m = jax.device_get(metrics)
        paths = []
        for i, s in enumerate(seeds):
            state_i = trainer.state_for_seed(stacked, i)
            path = os.path.join(nn_dir, f"{name}_seed{s}.ckpt")
            ckpt.save_checkpoint(
                path, state_i,
                meta={
                    "epoch": max_epochs,
                    "frame": trainer.frames_per_epoch() * max_epochs,
                    "last_mean_rewards": float(m["mean_rewards"][i][0]),
                },
                weights=agent.get_weights(state_i),
            )
            paths.append(path)
            print(f"seed {s}: reward {float(m['mean_rewards'][i][0]):.2f} "
                  f"-> {path}")
        return paths

    def create_player(self):
        return self.player_factory.create(
            self.algo_name, params=self.params
        )

    def run_play(self, args: Dict[str, Any]):
        """torch_runner.py:323-334."""
        print("Started to play")
        player = self.create_player()
        checkpoint = args.get("checkpoint")
        if checkpoint:
            player.restore(checkpoint)
        if args.get("sigma") is not None and hasattr(player, "override_sigma"):
            player.override_sigma(args["sigma"])
        return player.run(**args.get("player", {}))

    def run_export(self, args: Dict[str, Any]):
        """Export a trained policy to a deployable StableHLO artifact.

        The reference's deployment story is ONNX tracing via
        algos_torch/flatten.py + the runner notebooks; here it is a
        first-class CLI verb: the deterministic policy (obs → env-space
        action, normalizers and action rescale baked in, symbolic batch
        dim) serializes through jax.export (utils/export.py)."""
        import numpy as np

        from rl_games_tpu.utils.export import export_policy_fn

        checkpoint = args.get("checkpoint")
        if not checkpoint:
            raise ValueError(
                "--export requires -c <checkpoint>: refusing to export a "
                "randomly initialized policy"
            )
        player = self.create_player()
        player.restore(checkpoint)
        if isinstance(player.obs_shape, dict):
            raise ValueError(
                "--export supports flat observation spaces; dict-obs "
                "policies need a custom export closure "
                "(utils/export.make_deterministic_policy_fn)"
            )
        example_obs = np.zeros((1,) + tuple(player.obs_shape), np.float32)
        path = args.get("export_path") or (
            (checkpoint or self.params["config"]["name"]) + ".stablehlo"
        )
        blob = export_policy_fn(player.make_export_policy(), example_obs)
        with open(path, "wb") as f:
            f.write(blob)
        print(f"exported policy to {path}")
        return path

    def run(self, args: Dict[str, Any]):
        if args.get("train"):
            return self.run_train(args)
        elif args.get("play"):
            return self.run_play(args)
        elif args.get("export"):
            return self.run_export(args)
        else:
            return self.run_train(args)

    def reset(self):
        pass
