"""Custom network + dict observations + aux-loss extension contract
(the reference's TestNet / TestNetWithAuxLoss path)."""

import numpy as np
import jax

import rl_games_tpu.models.test_network  # registers 'testnet_dict'
from rl_games_tpu.algos.ppo import PPOAgent


def dict_params(aux=False):
    return {
        "algo": {"name": "a2c_discrete"},
        "model": {"name": "discrete_a2c"},
        "network": {
            "name": "testnet_dict",
            "with_aux_loss": aux,
            "mlp": {"units": [32, 32]},
        },
        "config": {
            "env_name": "test_dict_obs_env", "num_actors": 8,
            "horizon_length": 16, "minibatch_size": 64, "mini_epochs": 2,
            "learning_rate": 5e-4, "lr_schedule": "None",
            "e_clip": 0.2, "clip_value": True, "gamma": 0.99, "tau": 0.95,
            "critic_coef": 1.0, "entropy_coef": 0.01, "grad_norm": 1.0,
            "truncate_grads": True, "normalize_advantage": True,
            "normalize_input": True, "normalize_value": False,
            "value_bootstrap": True, "seed": 5,
            "env_config": {"aux_loss": aux},
        },
    }


def test_dict_obs_custom_network_trains():
    agent = PPOAgent("t", dict_params())
    state = agent.init_state()
    # dict obs normalizers: one RMS state per key
    assert set(state.norm.obs.keys()) == {"pos", "info"}
    fn = agent.make_train_fn()
    for _ in range(3):
        state, m = fn(state)
    assert np.isfinite(float(m["a_loss"]))
    assert np.isfinite(float(m["kl"]))


def test_aux_loss_flows_into_training():
    agent = PPOAgent("t", dict_params(aux=True))
    state = agent.init_state()
    aux_head_before = jax.device_get(
        state.params["params"]["aux_head"]
    )
    fn = agent.make_train_fn()
    for _ in range(3):
        state, m = fn(state)
    aux_head_after = jax.device_get(state.params["params"]["aux_head"])
    # the aux head only gets gradients through the aux loss
    diff = np.abs(
        np.asarray(aux_head_after["Dense_0"]["kernel"])
        - np.asarray(aux_head_before["Dense_0"]["kernel"])
    ).max()
    assert diff > 0
