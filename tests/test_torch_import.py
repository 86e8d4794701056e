"""Reference-checkpoint import: build the REAL reference torch model from the
same YAML network config, convert its randomly-initialized state dict through
utils/torch_import, and check forward outputs agree to float tolerance.

This is the strongest possible parity proof for the migration path: the
reference's own nn.Modules (algos_torch/network_builder.py) are the oracle.
Skipped when torch or the read-only reference tree is unavailable."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

try:
    from rl_games.algos_torch.model_builder import ModelBuilder as TorchBuilder
except Exception:  # pragma: no cover - reference tree not mounted
    pytest.skip("reference rl_games not importable", allow_module_level=True)

import jax
import jax.numpy as jnp

from rl_games_tpu.models.model_builder import ModelBuilder
from rl_games_tpu.utils.torch_import import (
    convert_a2c_state_dict, flatten_state_dict,
)


def _torch_model(params_cfg, actions_num, input_shape, normalize_input,
                 normalize_value, seed=0):
    torch.manual_seed(seed)
    net = TorchBuilder().load(params_cfg)
    return net.build({
        "actions_num": actions_num, "input_shape": input_shape,
        "num_seqs": 1, "value_size": 1,
        "normalize_value": normalize_value,
        "normalize_input": normalize_input,
    })


def _ours(params_cfg, actions_num, input_shape, normalize_input,
          normalize_value):
    model = ModelBuilder().load(
        params_cfg, actions_num=actions_num, input_shape=input_shape,
        normalize_input=normalize_input, normalize_value=normalize_value,
    )
    obs = jnp.zeros((2,) + tuple(input_shape), jnp.float32)
    net_params, norm = model.init(jax.random.PRNGKey(0), obs)
    return model, net_params, norm


def _torch_eval(tm, obs):
    tm.eval()
    with torch.no_grad():
        return tm({
            "is_train": False, "prev_actions": None,
            "obs": torch.tensor(obs), "rnn_states": None,
        })


def mlp_continuous_cfg():
    return {
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [64, 32], "activation": "elu",
                    "initializer": {"name": "default"}},
            "space": {"continuous": {
                "mu_activation": "None", "sigma_activation": "None",
                "mu_init": {"name": "default"},
                "sigma_init": {"name": "const_initializer", "val": 0.0},
                "fixed_sigma": True}},
        },
    }


def test_import_mlp_continuous_with_normalizers():
    cfg = mlp_continuous_cfg()
    tm = _torch_model(cfg, 3, (8,), True, True)
    # non-trivial stats + sigma so the import is visible in outputs
    with torch.no_grad():
        tm.running_mean_std.running_mean.copy_(
            torch.arange(8, dtype=torch.float64) * 0.3 - 1.0
        )
        tm.running_mean_std.running_var.copy_(
            torch.linspace(0.5, 2.0, 8, dtype=torch.float64)
        )
        tm.running_mean_std.count.fill_(100.0)
        tm.a2c_network.sigma.copy_(torch.tensor([-0.5, 0.1, 0.3]))

    model, net_params, norm = _ours(cfg, 3, (8,), True, True)
    new_params, new_norm = convert_a2c_state_dict(
        flatten_state_dict(tm.state_dict()), net_params, norm,
        cfg["network"], (8,),
    )

    obs = np.random.default_rng(1).normal(size=(5, 8)).astype(np.float32)
    tres = _torch_eval(tm, obs)
    ours = model.forward_play(
        new_params, new_norm, jax.random.PRNGKey(1), jnp.asarray(obs),
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours["mus"]), tres["mus"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["sigmas"]), tres["sigmas"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["values"]), tres["values"].numpy(), atol=1e-5
    )
    # value normalizer stats came over
    np.testing.assert_allclose(
        np.asarray(new_norm.value.mean),
        tm.value_mean_std.running_mean.numpy(), atol=1e-6,
    )


def test_import_separate_mlp_discrete():
    cfg = {
        "model": {"name": "discrete_a2c"},
        "network": {"name": "actor_critic", "separate": True,
                    "mlp": {"units": [32, 16], "activation": "relu",
                            "initializer": {"name": "default"}},
                    "space": {"discrete": {}}},
    }
    tm = _torch_model(cfg, 5, (8,), False, False, seed=3)
    model, net_params, norm = _ours(cfg, 5, (8,), False, False)
    new_params, new_norm = convert_a2c_state_dict(
        flatten_state_dict(tm.state_dict()), net_params, norm,
        cfg["network"], (8,),
    )
    obs = np.random.default_rng(2).normal(size=(7, 8)).astype(np.float32)
    tres = _torch_eval(tm, obs)
    ours = model.forward_play(
        new_params, new_norm, jax.random.PRNGKey(1), jnp.asarray(obs),
        deterministic=True,
    )
    # ours returns normalized log-probs; log_softmax the torch logits
    np.testing.assert_allclose(
        np.asarray(ours["logits"]),
        torch.log_softmax(tres["logits"], dim=-1).numpy(), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours["values"]), tres["values"].numpy(), atol=1e-5
    )


def test_import_cnn_discrete_nchw_flatten_permutation():
    cfg = {
        "model": {"name": "discrete_a2c"},
        "network": {"name": "actor_critic", "separate": False,
                    "cnn": {"type": "conv2d", "activation": "relu",
                            "initializer": {"name": "default"},
                            "convs": [
                                {"filters": 8, "kernel_size": 4,
                                 "strides": 2, "padding": 0},
                                {"filters": 16, "kernel_size": 3,
                                 "strides": 2, "padding": 0}]},
                    "mlp": {"units": [32], "activation": "relu",
                            "initializer": {"name": "default"}},
                    "space": {"discrete": {}}},
    }
    shape = (16, 16, 3)
    tm = _torch_model(cfg, 6, shape, False, False, seed=5)
    model, net_params, norm = _ours(cfg, 6, shape, False, False)
    new_params, new_norm = convert_a2c_state_dict(
        flatten_state_dict(tm.state_dict()), net_params, norm,
        cfg["network"], shape,
    )
    obs = np.random.default_rng(4).normal(size=(3,) + shape).astype(
        np.float32
    )
    tres = _torch_eval(tm, obs)
    ours = model.forward_play(
        new_params, new_norm, jax.random.PRNGKey(1), jnp.asarray(obs),
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours["logits"]),
        torch.log_softmax(tres["logits"], dim=-1).numpy(), atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["values"]), tres["values"].numpy(), atol=1e-4
    )


def test_pth_restore_through_player_and_trainer(tmp_path):
    """End-to-end .pth wiring: the reference checkpoint layout
    ({'model': state_dict, 'epoch', ...}, torch_ext.py:90-92 +
    a2c_common.py:693-696) restores through BasePlayer.restore and as a
    PPO warm start."""
    cfg = mlp_continuous_cfg()
    tm = _torch_model(cfg, 1, (3,), True, True, seed=9)
    path = str(tmp_path / "ref_ckpt.pth")
    torch.save(
        {"model": tm.state_dict(), "epoch": 3, "frame": 96,
         "optimizer": {"ignored": True}, "last_mean_rewards": 1.0},
        path,
    )

    config = {
        "env_name": "Pendulum-v1", "num_actors": 4, "horizon_length": 8,
        "minibatch_size": 32, "mini_epochs": 1, "learning_rate": 3e-4,
        "e_clip": 0.2, "clip_value": True, "gamma": 0.99, "tau": 0.95,
        "critic_coef": 1.0,
        "entropy_coef": 0.0, "grad_norm": 1.0, "truncate_grads": True,
        "normalize_input": True, "normalize_value": True,
        "normalize_advantage": True, "value_bootstrap": True, "seed": 3,
        "player": {"games_num": 2, "max_steps": 16},
    }
    params = {**cfg, "config": config}

    from rl_games_tpu.common.player import PpoPlayer

    player = PpoPlayer(params)
    player.restore(path)
    np.testing.assert_allclose(
        np.asarray(player.net_params["params"]["sigma"]),
        tm.a2c_network.sigma.detach().numpy(), atol=1e-6,
    )

    from rl_games_tpu.algos.ppo import PPOAgent

    agent = PPOAgent("torch_warmstart", params)
    state = agent.init_state()
    from rl_games_tpu.utils.torch_import import import_a2c_checkpoint

    newp, newn = import_a2c_checkpoint(
        path, state.params, state.norm, cfg["network"], agent.obs_shape
    )
    state = state.replace(params=newp, norm=newn)
    fn = agent.make_train_fn()
    state, metrics = fn(state)  # trains from the imported weights
    assert np.isfinite(float(metrics["a_loss"]))


def test_import_sac_checkpoint(tmp_path):
    """SAC: the reference's get_weights sections ({'actor','critic',
    'critic_target','running_mean_std'}, sac_agent.py:274-281) convert, and
    the actor/critic forwards match the reference modules."""
    net_cfg = {"name": "soft_actor_critic", "separate": True,
               "space": {"continuous": None},
               "mlp": {"units": [32, 32], "activation": "relu",
                       "initializer": {"name": "default"}},
               "log_std_bounds": [-5, 2]}
    torch.manual_seed(11)
    tnet = TorchBuilder().load({
        "model": {"name": "soft_actor_critic"}, "network": net_cfg,
    })
    tm = tnet.build({"action_dim": 2, "obs_dim": 6, "actions_num": 2,
                     "input_shape": (6,), "normalize_value": False,
                     "normalize_input": True, "value_size": 1})
    with torch.no_grad():
        tm.running_mean_std.running_mean.copy_(
            torch.arange(6, dtype=torch.float64) * 0.2
        )
        tm.running_mean_std.running_var.copy_(
            torch.linspace(0.4, 1.6, 6, dtype=torch.float64)
        )
        tm.running_mean_std.count.fill_(64.0)
    raw = {
        "actor": tm.sac_network.actor.state_dict(),
        "critic": tm.sac_network.critic.state_dict(),
        "critic_target": tm.sac_network.critic_target.state_dict(),
        "running_mean_std": tm.running_mean_std.state_dict(),
        "log_alpha": torch.tensor(-1.5),
        "epoch": 1,
    }
    path = str(tmp_path / "sac_ref.pth")
    torch.save(raw, path)

    from rl_games_tpu.models.sac import build_sac_networks
    from rl_games_tpu.ops.running_stats import rms_init, rms_normalize
    from rl_games_tpu.utils import torch_import as ti

    actor, critic = build_sac_networks(net_cfg, 2)
    obs0 = jnp.zeros((1, 6), jnp.float32)
    act0 = jnp.zeros((1, 2), jnp.float32)
    ap = actor.init(jax.random.PRNGKey(0), obs0)
    cp = critic.init(jax.random.PRNGKey(0), obs0, act0)
    rms = rms_init((6,))

    loaded = ti.load_torch_checkpoint_raw(path)
    new_a, new_c, new_t, new_rms = ti.convert_sac_weights(
        loaded, ap, cp, cp, rms
    )

    obs = np.random.default_rng(6).normal(size=(4, 6)).astype(np.float32)
    acts = np.random.default_rng(7).uniform(-1, 1, (4, 2)).astype(np.float32)
    tm.eval()  # keep the torch RunningMeanStd from updating itself
    with torch.no_grad():
        tobs = tm.norm_obs(torch.tensor(obs))
        dist = tm.sac_network.actor(tobs)
        tq1, tq2 = tm.sac_network.critic(tobs, torch.tensor(acts))
        gq1, gq2 = tm.sac_network.critic_target(tobs, torch.tensor(acts))

    nobs = rms_normalize(new_rms, jnp.asarray(obs))
    np.testing.assert_allclose(
        np.asarray(nobs), tobs.numpy(), atol=1e-5
    )
    mu, std = actor.apply(new_a, nobs)
    np.testing.assert_allclose(np.asarray(mu), dist.loc.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(std), dist.scale.numpy(), atol=1e-5
    )
    q1, q2 = critic.apply(new_c, nobs, jnp.asarray(acts))
    np.testing.assert_allclose(np.asarray(q1), tq1.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(q2), tq2.numpy(), atol=1e-5)
    t1, t2 = critic.apply(new_t, nobs, jnp.asarray(acts))
    np.testing.assert_allclose(np.asarray(t1), gq1.numpy(), atol=1e-5)

def test_sac_pth_restores_through_player(tmp_path):
    """SACPlayer.restore on a reference-layout .pth (Pendulum dims)."""
    net_cfg = {"name": "soft_actor_critic", "separate": True,
               "space": {"continuous": None},
               "mlp": {"units": [16, 16], "activation": "relu",
                       "initializer": {"name": "default"}},
               "log_std_bounds": [-5, 2]}
    torch.manual_seed(13)
    tnet = TorchBuilder().load({
        "model": {"name": "soft_actor_critic"}, "network": net_cfg,
    })
    tm = tnet.build({"action_dim": 1, "obs_dim": 3, "actions_num": 1,
                     "input_shape": (3,), "normalize_value": False,
                     "normalize_input": True, "value_size": 1})
    path = str(tmp_path / "sac_pendulum.pth")
    torch.save({
        "actor": tm.sac_network.actor.state_dict(),
        "critic": tm.sac_network.critic.state_dict(),
        "critic_target": tm.sac_network.critic_target.state_dict(),
        "running_mean_std": tm.running_mean_std.state_dict(),
    }, path)

    from rl_games_tpu.common.player import SACPlayer

    params = {
        "model": {"name": "soft_actor_critic"}, "network": net_cfg,
        "config": {
            "env_name": "Pendulum-v1", "num_actors": 2,
            "normalize_input": True, "seed": 1,
            "player": {"games_num": 2, "max_steps": 250},
        },
    }
    player = SACPlayer(params)
    player.restore(path)
    with torch.no_grad():
        head_w = next(
            m for m in reversed(list(tm.sac_network.actor.trunk.children()))
            if isinstance(m, torch.nn.Linear)
        ).weight.numpy()
    np.testing.assert_allclose(
        np.asarray(player.actor_params["params"]["head"]["Dense_0"]["kernel"]),
        head_w.T, atol=1e-6,
    )
    reward = player.run()
    assert np.isfinite(reward)


def test_import_multidiscrete_logits_list():
    """Multi-discrete: torch 'logits.<i>' ModuleList → our 'logits_<i>'
    heads (network_builder.py:200-214 multi-discrete branch)."""
    cfg = {
        "model": {"name": "multi_discrete_a2c"},
        "network": {"name": "actor_critic", "separate": False,
                    "mlp": {"units": [16], "activation": "relu",
                            "initializer": {"name": "default"}},
                    "space": {"multi_discrete": {}}},
    }
    tm = _torch_model(cfg, [3, 4], (5,), False, False, seed=7)
    model, net_params, norm = _ours(cfg, [3, 4], (5,), False, False)
    new_params, _ = convert_a2c_state_dict(
        flatten_state_dict(tm.state_dict()), net_params, norm,
        cfg["network"], (5,),
    )
    for i in (0, 1):
        np.testing.assert_allclose(
            np.asarray(
                new_params["params"][f"logits_{i}"]["Dense_0"]["kernel"]
            ),
            tm.state_dict()[f"a2c_network.logits.{i}.weight"].numpy().T,
            atol=1e-6,
        )


def test_import_rejects_unknown_and_mismatched():
    cfg = mlp_continuous_cfg()
    tm = _torch_model(cfg, 3, (8,), False, False)
    model, net_params, norm = _ours(cfg, 3, (8,), False, False)
    sd = flatten_state_dict(tm.state_dict())
    sd["a2c_network.mystery.weight"] = np.zeros((4, 4), np.float32)
    with pytest.raises(ValueError, match="no destination"):
        convert_a2c_state_dict(sd, net_params, norm, cfg["network"], (8,))

    # an RNN tensor in the checkpoint while the target model has no RNN
    # core: unconsumed → hard error (RNN checkpoints for RNN models DO
    # import, test_import_lstm_* below)
    sd = flatten_state_dict(tm.state_dict())
    sd["a2c_network.rnn.rnn.weight_ih_l0"] = np.zeros((4, 4), np.float32)
    with pytest.raises(ValueError, match="no destination"):
        convert_a2c_state_dict(sd, net_params, norm, cfg["network"], (8,))


def test_import_rejects_dropped_obs_normalizer():
    """A checkpoint trained with normalize_input: True imported under a
    config whose model holds no obs normalizer must hard-error — the stats
    would otherwise vanish silently and the policy would see raw obs."""
    cfg = mlp_continuous_cfg()
    tm = _torch_model(cfg, 3, (8,), True, False)
    model, net_params, norm = _ours(cfg, 3, (8,), False, False)
    with pytest.raises(ValueError, match="running_mean_std"):
        convert_a2c_state_dict(
            flatten_state_dict(tm.state_dict()), net_params, norm,
            cfg["network"], (8,),
        )


def test_sac_import_rejects_dropped_obs_normalizer(tmp_path):
    """Same contract on the SAC path: rms section present in the .pth but
    obs_rms=None (normalize_input: False) raises instead of dropping."""
    net_cfg = {"name": "soft_actor_critic", "separate": True,
               "space": {"continuous": None},
               "mlp": {"units": [16], "activation": "relu",
                       "initializer": {"name": "default"}},
               "log_std_bounds": [-5, 2]}
    torch.manual_seed(3)
    tnet = TorchBuilder().load({
        "model": {"name": "soft_actor_critic"}, "network": net_cfg,
    })
    tm = tnet.build({"action_dim": 2, "obs_dim": 6, "actions_num": 2,
                     "input_shape": (6,), "normalize_value": False,
                     "normalize_input": True, "value_size": 1})
    raw = {
        "actor": tm.sac_network.actor.state_dict(),
        "critic": tm.sac_network.critic.state_dict(),
        "running_mean_std": tm.running_mean_std.state_dict(),
    }

    from rl_games_tpu.models.sac import build_sac_networks
    from rl_games_tpu.utils import torch_import as ti

    actor, critic = build_sac_networks(net_cfg, 2)
    obs0 = jnp.zeros((1, 6), jnp.float32)
    act0 = jnp.zeros((1, 2), jnp.float32)
    ap = actor.init(jax.random.PRNGKey(0), obs0)
    cp = critic.init(jax.random.PRNGKey(0), obs0, act0)
    with pytest.raises(ValueError, match="normalize_input"):
        ti.convert_sac_weights(raw, ap, cp, None, None)


# ----------------------------------------------------------------------
# RNN cores (LSTMWithDones/GRUWithDones → scanned flax cells) and
# dict-observation normalizers (RunningMeanStdObs → per-key RMS dict)
# ----------------------------------------------------------------------

def _rnn_parity_roll(tm, model, new_params, new_norm, obs_shape, n_act,
                     kind, layers, units, steps=3, batch=4):
    """Step both models `steps` times threading rnn states; outputs and
    evolved states must agree at every step."""
    t_states = tuple(
        torch.zeros((layers, batch, units))
        for _ in range(2 if kind == "lstm" else 1)
    )
    j_states = tuple(
        jnp.zeros((layers, batch, units), jnp.float32)
        for _ in range(2 if kind == "lstm" else 1)
    )
    rng = np.random.default_rng(17)
    tm.eval()
    for step in range(steps):
        obs = rng.normal(size=(batch,) + tuple(obs_shape)).astype(np.float32)
        with torch.no_grad():
            tres = tm({
                "is_train": False, "prev_actions": None,
                "obs": torch.tensor(obs), "rnn_states": t_states,
                "seq_length": 1,
            })
        ours = model.forward_play(
            new_params, new_norm, jax.random.PRNGKey(step),
            jnp.asarray(obs), rnn_states=j_states, deterministic=True,
        )
        np.testing.assert_allclose(
            np.asarray(ours["mus"]), tres["mus"].numpy(), atol=2e-5,
            err_msg=f"mus diverge at step {step}",
        )
        np.testing.assert_allclose(
            np.asarray(ours["values"]), tres["values"].numpy(), atol=2e-5,
            err_msg=f"values diverge at step {step}",
        )
        t_states = tres["rnn_states"]
        j_states = ours["rnn_states"]
        for ts, js in zip(t_states, j_states):
            np.testing.assert_allclose(
                np.asarray(js), ts.numpy(), atol=2e-5,
                err_msg=f"rnn states diverge at step {step}",
            )


def test_import_lstm_shared_two_layers_with_ln():
    """Shared-trunk 2-layer LSTM with rnn layer_norm: torch's row-blocked
    i,f,g,o gates + summed biases land on the flax per-gate Denses
    (network_builder.py:272-280, recurrent.py:77-80)."""
    cfg = {
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [24], "activation": "elu",
                    "initializer": {"name": "default"}},
            "rnn": {"name": "lstm", "units": 16, "layers": 2,
                    "layer_norm": True},
            "space": {"continuous": {
                "mu_activation": "None", "sigma_activation": "None",
                "mu_init": {"name": "default"},
                "sigma_init": {"name": "const_initializer", "val": 0.0},
                "fixed_sigma": True}},
        },
    }
    tm = _torch_model(cfg, 3, (6,), False, False, seed=21)
    model, net_params, norm = _ours(cfg, 3, (6,), False, False)
    new_params, new_norm = convert_a2c_state_dict(
        flatten_state_dict(tm.state_dict()), net_params, norm,
        cfg["network"], (6,),
    )
    _rnn_parity_roll(tm, model, new_params, new_norm, (6,), 3,
                     "lstm", layers=2, units=16)


def test_import_gru_before_mlp():
    """GRU before the mlp: r,z,n gate split with torch's separate n-gate
    biases preserved (flax GRUCell matches torch's n-gate form exactly)."""
    cfg = {
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [24], "activation": "relu",
                    "initializer": {"name": "default"}},
            "rnn": {"name": "gru", "units": 16, "layers": 1,
                    "before_mlp": True},
            "space": {"continuous": {
                "mu_activation": "None", "sigma_activation": "None",
                "mu_init": {"name": "default"},
                "sigma_init": {"name": "const_initializer", "val": 0.0},
                "fixed_sigma": True}},
        },
    }
    tm = _torch_model(cfg, 2, (5,), False, False, seed=23)
    model, net_params, norm = _ours(cfg, 2, (5,), False, False)
    new_params, new_norm = convert_a2c_state_dict(
        flatten_state_dict(tm.state_dict()), net_params, norm,
        cfg["network"], (5,),
    )
    _rnn_parity_roll(tm, model, new_params, new_norm, (5,), 2,
                     "gru", layers=1, units=16)


def test_import_cnn_lstm_after_mlp():
    """conv torso + mlp + lstm (the reference's atari-rnn shape,
    configs/atari/ppo_pacman_torch_rnn.yaml): the NCHW→NHWC flatten
    permutation stays on the mlp's first Linear, the lstm imports as-is."""
    cfg = {
        "model": {"name": "discrete_a2c"},
        "network": {
            "name": "actor_critic", "separate": False,
            "cnn": {"type": "conv2d", "activation": "relu",
                    "initializer": {"name": "default"},
                    "convs": [
                        {"filters": 8, "kernel_size": 4, "strides": 2,
                         "padding": 0},
                        {"filters": 16, "kernel_size": 3, "strides": 1,
                         "padding": 0}]},
            "mlp": {"units": [32], "activation": "relu",
                    "initializer": {"name": "default"}},
            "rnn": {"name": "lstm", "units": 16, "layers": 1},
            "space": {"discrete": {}},
        },
    }
    shape = (12, 12, 3)
    tm = _torch_model(cfg, 4, shape, False, False, seed=29)
    model, net_params, norm = _ours(cfg, 4, shape, False, False)
    new_params, new_norm = convert_a2c_state_dict(
        flatten_state_dict(tm.state_dict()), net_params, norm,
        cfg["network"], shape,
    )
    t_states = (torch.zeros((1, 3, 16)), torch.zeros((1, 3, 16)))
    j_states = (jnp.zeros((1, 3, 16)), jnp.zeros((1, 3, 16)))
    rng = np.random.default_rng(31)
    tm.eval()
    for step in range(3):
        obs = rng.normal(size=(3,) + shape).astype(np.float32)
        with torch.no_grad():
            tres = tm({
                "is_train": False, "prev_actions": None,
                "obs": torch.tensor(obs), "rnn_states": t_states,
                "seq_length": 1,
            })
        ours = model.forward_play(
            new_params, new_norm, jax.random.PRNGKey(step),
            jnp.asarray(obs), rnn_states=j_states, deterministic=True,
        )
        np.testing.assert_allclose(
            np.asarray(ours["logits"]),
            torch.log_softmax(tres["logits"], dim=-1).numpy(), atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(ours["values"]), tres["values"].numpy(), atol=1e-4
        )
        t_states, j_states = tres["rnn_states"], ours["rnn_states"]


def test_import_dict_obs_normalizer():
    """RunningMeanStdObs (running_mean_std.py:117-128) keys
    ``running_mean_std.running_mean_std.<obs_key>.*`` map onto our per-key
    RMS dict; normalized outputs match the reference module per key."""
    from rl_games.algos_torch.running_mean_std import RunningMeanStdObs

    from rl_games_tpu.models.models import NormState
    from rl_games_tpu.ops.running_stats import rms_init, rms_normalize_obs

    shapes = {"pos": (4,), "goal": (2,)}
    tobs_mod = RunningMeanStdObs(shapes)
    with torch.no_grad():
        tobs_mod.running_mean_std["pos"].running_mean.copy_(
            torch.arange(4, dtype=torch.float64) * 0.5
        )
        tobs_mod.running_mean_std["pos"].running_var.copy_(
            torch.linspace(0.2, 2.0, 4, dtype=torch.float64)
        )
        tobs_mod.running_mean_std["pos"].count.fill_(50.0)
        tobs_mod.running_mean_std["goal"].running_mean.copy_(
            torch.tensor([1.0, -1.0], dtype=torch.float64)
        )
        tobs_mod.running_mean_std["goal"].running_var.copy_(
            torch.tensor([4.0, 0.25], dtype=torch.float64)
        )
        tobs_mod.running_mean_std["goal"].count.fill_(50.0)

    # network body: a plain mlp model (the normalizer section is what this
    # test pins); the sd carries the net tensors + the ModuleDict stats
    cfg = mlp_continuous_cfg()
    tm = _torch_model(cfg, 2, (6,), False, False, seed=37)
    sd = flatten_state_dict(tm.state_dict())
    sd.update({
        f"running_mean_std.{k}": v
        for k, v in flatten_state_dict(tobs_mod.state_dict()).items()
    })

    model, net_params, _ = _ours(cfg, 2, (6,), False, False)
    norm = NormState(obs={k: rms_init(s) for k, s in shapes.items()},
                     value=None)
    _, new_norm = convert_a2c_state_dict(
        sd, net_params, norm, cfg["network"], (6,),
    )

    rng = np.random.default_rng(41)
    obs = {k: rng.normal(size=(5,) + s).astype(np.float32)
           for k, s in shapes.items()}
    tobs_mod.eval()
    with torch.no_grad():
        tref = tobs_mod({k: torch.tensor(v) for k, v in obs.items()})
    ours = rms_normalize_obs(
        new_norm.obs, {k: jnp.asarray(v) for k, v in obs.items()}
    )
    for k in shapes:
        np.testing.assert_allclose(
            np.asarray(ours[k]), tref[k].numpy(), atol=1e-5, err_msg=k
        )


def test_import_d2rl_torso():
    """d2rl concat torso (common/d2rl.py D2RLNet): torch 'linears'
    ModuleList maps onto our D2RLMLP (identical param layout and
    cat[x, input] order), so forwards match directly."""
    cfg = {
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [32, 16], "activation": "relu", "d2rl": True,
                    "initializer": {"name": "default"}},
            "space": {"continuous": {
                "mu_activation": "None", "sigma_activation": "None",
                "mu_init": {"name": "default"},
                "sigma_init": {"name": "const_initializer", "val": 0.0},
                "fixed_sigma": True}},
        },
    }
    tm = _torch_model(cfg, 3, (7,), False, False, seed=43)
    model, net_params, norm = _ours(cfg, 3, (7,), False, False)
    new_params, new_norm = convert_a2c_state_dict(
        flatten_state_dict(tm.state_dict()), net_params, norm,
        cfg["network"], (7,),
    )
    obs = np.random.default_rng(44).normal(size=(6, 7)).astype(np.float32)
    tres = _torch_eval(tm, obs)
    ours = model.forward_play(
        new_params, new_norm, jax.random.PRNGKey(1), jnp.asarray(obs),
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours["mus"]), tres["mus"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["values"]), tres["values"].numpy(), atol=1e-5
    )


def test_import_impala_resnet():
    """Impala tower import (A2CResnetBuilder 'resnet_actor_critic'):
    per-stage ConvBlock + 2 residual blocks map onto our
    ImpalaSequential/ImpalaResidualBlock tree, the flatten permutation
    uses the maxpool arithmetic, and the resnet builder's 'mlp' (not
    'actor_mlp') torch prefix resolves."""
    cfg = {
        "model": {"name": "discrete_a2c"},
        "network": {
            "name": "resnet_actor_critic", "separate": False,
            "cnn": {"permute_input": False, "conv_depths": [8, 16],
                    "activation": "relu",
                    "initializer": {"name": "default"}},
            "mlp": {"units": [32], "activation": "relu",
                    "initializer": {"name": "default"}},
            "space": {"discrete": {}},
        },
    }
    # permute_input False = the torch net consumes channel-first obs
    # (envpool's stacked-frame layout); our framework is NHWC — build the
    # torch oracle at (C,H,W), ours at (H,W,C), feed the same data
    # transposed, and give the importer OUR (H,W,C) shape for the flatten
    # permutation arithmetic
    shape = (16, 16, 3)
    tm = _torch_model(cfg, 5, (3, 16, 16), False, False, seed=51)
    model, net_params, norm = _ours(cfg, 5, shape, False, False)
    new_params, new_norm = convert_a2c_state_dict(
        flatten_state_dict(tm.state_dict()), net_params, norm,
        cfg["network"], shape,
    )
    obs = np.random.default_rng(52).normal(size=(4,) + shape).astype(
        np.float32
    )
    tres = _torch_eval(tm, obs.transpose(0, 3, 1, 2))
    ours = model.forward_play(
        new_params, new_norm, jax.random.PRNGKey(1), jnp.asarray(obs),
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours["logits"]),
        torch.log_softmax(tres["logits"], dim=-1).numpy(), atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["values"]), tres["values"].numpy(), atol=1e-4
    )


def _continuous_space():
    return {"continuous": {
        "mu_activation": "None", "sigma_activation": "None",
        "mu_init": {"name": "default"},
        "sigma_init": {"name": "const_initializer", "val": 0.0},
        "fixed_sigma": True}}


def test_import_normalized_torso_layer_norm():
    """Normalized mlp torso (network.normalization: layer_norm): the torch
    Sequential interleaves LayerNorm entries with the Linears
    (_build_sequential_mlp, reference network_builder.py:105-130) — the
    importer splits them by weight rank and pairs each kind in order."""
    cfg = {
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": False,
            "normalization": "layer_norm",
            "mlp": {"units": [24, 16], "activation": "elu",
                    "initializer": {"name": "default"}},
            "space": _continuous_space(),
        },
    }
    tm = _torch_model(cfg, 3, (7,), False, False, seed=61)
    # make the LayerNorm affine params non-trivial so the import is visible
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.LayerNorm):
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.3, 0.3)
    model, net_params, norm = _ours(cfg, 3, (7,), False, False)
    new_params, new_norm = convert_a2c_state_dict(
        flatten_state_dict(tm.state_dict()), net_params, norm,
        cfg["network"], (7,),
    )
    obs = np.random.default_rng(62).normal(size=(5, 7)).astype(np.float32)
    tres = _torch_eval(tm, obs)
    ours = model.forward_play(
        new_params, new_norm, jax.random.PRNGKey(1), jnp.asarray(obs),
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours["mus"]), tres["mus"].numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(ours["values"]), tres["values"].numpy(), atol=2e-5)


def test_import_normalized_torso_first_layer_only():
    """norm_only_first_layer: exactly one LayerNorm (after the first
    Linear) on both sides; separate trunks exercise actor+critic mlps."""
    cfg = {
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": True,
            "normalization": "layer_norm",
            "mlp": {"units": [24, 16], "activation": "relu",
                    "norm_only_first_layer": True,
                    "initializer": {"name": "default"}},
            "space": _continuous_space(),
        },
    }
    tm = _torch_model(cfg, 2, (6,), False, False, seed=63)
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.LayerNorm):
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.3, 0.3)
    model, net_params, norm = _ours(cfg, 2, (6,), False, False)
    new_params, new_norm = convert_a2c_state_dict(
        flatten_state_dict(tm.state_dict()), net_params, norm,
        cfg["network"], (6,),
    )
    obs = np.random.default_rng(64).normal(size=(4, 6)).astype(np.float32)
    tres = _torch_eval(tm, obs)
    ours = model.forward_play(
        new_params, new_norm, jax.random.PRNGKey(1), jnp.asarray(obs),
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours["mus"]), tres["mus"].numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(ours["values"]), tres["values"].numpy(), atol=2e-5)


def test_import_rnn_concat_input_and_output():
    """rnn concat_input + concat_output on an mlp torso (reference
    network_builder.py:455-457, 484-485: rnn eats cat[mlp_out, obs], the
    heads eat cat[rnn_out, obs]): no new tensors, but every rnn input
    kernel and head kernel widens — import + multi-step parity."""
    cfg = {
        "model": {"name": "continuous_a2c_logstd"},
        "network": {
            "name": "actor_critic", "separate": False,
            "mlp": {"units": [24], "activation": "elu",
                    "initializer": {"name": "default"}},
            "rnn": {"name": "lstm", "units": 16, "layers": 1,
                    "concat_input": True, "concat_output": True},
            "space": _continuous_space(),
        },
    }
    tm = _torch_model(cfg, 3, (6,), False, False, seed=65)
    model, net_params, norm = _ours(cfg, 3, (6,), False, False)
    new_params, new_norm = convert_a2c_state_dict(
        flatten_state_dict(tm.state_dict()), net_params, norm,
        cfg["network"], (6,),
    )
    _rnn_parity_roll(tm, model, new_params, new_norm, (6,), 3,
                     "lstm", layers=1, units=16)


def test_import_impala_bn_zero_init(monkeypatch):
    """Impala tower with use_bn + use_zero_init (the reference's
    library-level ResidualBlock options, network_builder.py:599-611,
    :643-672 — its YAML builder leaves them at defaults, so the oracle
    patches _build_impala to enable them): BatchNorm2d running stats land
    in FrozenBatchNorm mean/var, the conv biases disappear, and each
    residual block's alpha scalar imports."""
    from rl_games.algos_torch import network_builder as ref_nb

    def _build_impala_bn(self, input_shape, depths):
        in_channels = input_shape[0]
        layers = torch.nn.ModuleList()
        for d in depths:
            layers.append(ref_nb.ImpalaSequential(
                in_channels, d, use_bn=True, use_zero_init=True))
            in_channels = d
        return torch.nn.Sequential(*layers)

    monkeypatch.setattr(
        ref_nb.A2CResnetBuilder.Network, "_build_impala", _build_impala_bn
    )
    cfg = {
        "model": {"name": "discrete_a2c"},
        "network": {
            "name": "resnet_actor_critic", "separate": False,
            "cnn": {"permute_input": False, "conv_depths": [8, 16],
                    "activation": "relu", "use_bn": True,
                    "use_zero_init": True,
                    "initializer": {"name": "default"}},
            "mlp": {"units": [32], "activation": "relu",
                    "initializer": {"name": "default"}},
            "space": {"discrete": {}},
        },
    }
    shape = (16, 16, 3)
    tm = _torch_model(cfg, 5, (3, 16, 16), False, False, seed=66)
    # non-trivial running stats + alphas so frozen-stats parity is visible
    gen = torch.Generator().manual_seed(67)
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0.0, 0.5, generator=gen)
                mod.running_var.uniform_(0.5, 2.0, generator=gen)
            if isinstance(mod, ref_nb.ResidualBlock):
                mod.alpha.uniform_(0.3, 0.9, generator=gen)
    model, net_params, norm = _ours(cfg, 5, shape, False, False)
    new_params, new_norm = convert_a2c_state_dict(
        flatten_state_dict(tm.state_dict()), net_params, norm,
        cfg["network"], shape,
    )
    obs = np.random.default_rng(68).normal(size=(4,) + shape).astype(
        np.float32
    )
    tres = _torch_eval(tm, obs.transpose(0, 3, 1, 2))
    ours = model.forward_play(
        new_params, new_norm, jax.random.PRNGKey(1), jnp.asarray(obs),
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours["logits"]),
        torch.log_softmax(tres["logits"], dim=-1).numpy(), atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["values"]), tres["values"].numpy(), atol=1e-4
    )
