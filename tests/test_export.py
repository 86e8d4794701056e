"""Policy export/reload roundtrip (the reference's ONNX-export parity,
algos_torch/flatten.py + notebooks) via jax.export / StableHLO."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rl_games_tpu.models.model_builder import ModelBuilder
from rl_games_tpu.utils.export import export_policy, load_policy
from test_networks import mlp_params


def test_export_roundtrip_continuous(tmp_path):
    params = {
        "model": {"name": "continuous_a2c_logstd"},
        "network": mlp_params(),
    }
    model = ModelBuilder().load(
        params, actions_num=3, input_shape=(8,),
        normalize_input=True, normalize_value=True,
    )
    obs = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)), jnp.float32)
    net_params, norm = model.init(jax.random.PRNGKey(0), obs)

    blob = export_policy(model, net_params, norm, obs)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0

    policy = load_policy(blob)
    out = np.asarray(policy(obs))
    expected = np.asarray(
        model.forward_play(
            net_params, norm, jax.random.PRNGKey(0), obs, deterministic=True
        )["actions"]
    )
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)

    # symbolic batch dim: different batch size works on the SAME artifact
    obs2 = jnp.asarray(
        np.random.default_rng(1).normal(size=(9, 8)), jnp.float32
    )
    out2 = np.asarray(policy(obs2))
    assert out2.shape == (9, 3)


def test_export_discrete(tmp_path):
    params = {
        "model": {"name": "discrete_a2c"},
        "network": mlp_params(space="discrete"),
    }
    model = ModelBuilder().load(params, actions_num=5, input_shape=(6,))
    obs = jnp.ones((2, 6))
    net_params, norm = model.init(jax.random.PRNGKey(0), obs)
    policy = load_policy(export_policy(model, net_params, norm, obs))
    actions = np.asarray(policy(obs))
    assert actions.shape == (2,)
    assert actions.dtype in (np.int32, np.int64)


def test_cli_export_verb(tmp_path):
    """--export end-to-end: train 2 epochs, export the checkpoint through
    Runner.run({'export': True}), reload the artifact, and check it
    matches the player's own forward on the same obs (the reference's
    ONNX-notebook flow, as a CLI verb)."""
    from rl_games_tpu.runner import Runner
    from test_runner import load_cfg, shrink

    cfg = shrink(load_cfg("ppo_cartpole.yaml"), tmp_path, max_epochs=2)
    runner = Runner()
    runner.load(cfg)
    runner.run({"train": True})
    nn_dir = tmp_path / "cartpole_ppo" / "nn"
    ckpt = str(next(p for p in nn_dir.iterdir() if p.name.startswith("last_")))

    out = str(tmp_path / "policy.stablehlo")
    path = runner.run({"export": True, "checkpoint": ckpt, "export_path": out})
    assert path == out

    with open(out, "rb") as f:
        policy = load_policy(f.read())

    player = runner.create_player()
    player.restore(ckpt)
    obs = jnp.asarray(
        np.random.default_rng(2).normal(size=(5, 4)), jnp.float32
    )
    got = np.asarray(policy(obs))
    expected = np.asarray(
        player.model.forward_play(
            player.net_params, player.norm, jax.random.PRNGKey(0), obs,
            deterministic=True,
        )["actions"]
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_cli_export_sac(tmp_path):
    """--export on a SAC checkpoint: deterministic tanh(mu) policy with
    obs normalization and action rescale baked into the artifact."""
    import yaml
    from rl_games_tpu.runner import Runner
    from test_runner import load_cfg

    cfg = load_cfg("sac_pendulum.yaml")
    c = cfg["params"]["config"]
    c.update(train_dir=str(tmp_path), max_epochs=2, num_actors=4,
             num_warmup_steps=1, print_stats=False)
    runner = Runner()
    runner.load(cfg)
    runner.run({"train": True})
    nn_dir = tmp_path / "pendulum_sac" / "nn"
    ckpt = str(next(p for p in nn_dir.iterdir() if p.name.startswith("last_")))

    out = str(tmp_path / "sac.stablehlo")
    runner.run({"export": True, "checkpoint": ckpt, "export_path": out})
    with open(out, "rb") as f:
        policy = load_policy(f.read())

    obs = jnp.asarray(
        np.random.default_rng(3).normal(size=(6, 3)), jnp.float32
    )
    acts = np.asarray(policy(obs))
    assert acts.shape == (6, 1)
    # pendulum bounds: env-space actions land in [-2, 2]
    assert np.all(np.abs(acts) <= 2.0 + 1e-6)

    player = runner.create_player()
    player.restore(ckpt)
    expected = np.asarray(player.make_export_policy()(obs))
    np.testing.assert_allclose(acts, expected, rtol=1e-5, atol=1e-6)


def test_rnn_forward_play_without_states():
    """forward_play with rnn_states=None starts from zero states (the
    reference's None defense, network_builder.py:466-478) — the export
    call sites invoke the policy without explicit states."""
    from rl_games_tpu.models.model_builder import ModelBuilder

    params = {
        "model": {"name": "discrete_a2c"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [16], "activation": "relu",
                    "initializer": {"name": "default"}},
            "rnn": {"name": "lstm", "units": 16, "layers": 1},
            "space": {"discrete": {}},
        },
    }
    model = ModelBuilder().load(params, actions_num=2, input_shape=(3,))
    obs = jnp.zeros((4, 3), jnp.float32)
    net_params, norm = model.init(
        jax.random.PRNGKey(0), obs, rnn_states=model.get_default_rnn_state(4)
    )
    out = model.forward_play(net_params, norm, jax.random.PRNGKey(1), obs)
    assert out["actions"].shape == (4,)
    # equals the explicit zero-state forward
    zero_states = model.get_default_rnn_state(4)
    out2 = model.forward_play(
        net_params, norm, jax.random.PRNGKey(1), obs, rnn_states=zero_states
    )
    np.testing.assert_array_equal(np.asarray(out["actions"]),
                                  np.asarray(out2["actions"]))
