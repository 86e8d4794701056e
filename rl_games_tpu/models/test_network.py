"""Example custom network: dict observations + auxiliary losses.

Mirror of the reference's custom-net examples (rl_games/envs/test_network.py:
TestNet consuming Dict obs; TestNetWithAuxLoss whose aux_loss_map feeds the
trainer, consumed at a2c_continuous.py:194-202). Shows the extension contract:

  * a network is any linen module with
      __call__(obs, rnn_states=None, dones=None, seq_length=1) -> dict
    returning the head outputs ('logits' | 'mu'/'sigma_raw', 'value',
    'rnn_states') and optionally 'aux_losses': {name: scalar-able array} —
    the trainer adds their means to the total loss;
  * register it with models.register_network(name, builder) and select it
    with network.name in the YAML.
"""

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from rl_games_tpu.models import layers as L
from rl_games_tpu.models.model_builder import register_network


class TestDictObsNet(nn.Module):
    """Consumes {'pos': [B,2], 'info': [B,4]} dict observations."""

    actions_num: int
    units: Tuple[int, ...] = (32, 32)
    with_aux_loss: bool = False

    def is_rnn(self):
        return False

    def get_default_rnn_state(self, num_seqs):
        return None

    @nn.compact
    def __call__(self, obs, rnn_states=None, dones=None, seq_length=1):
        x = jnp.concatenate([obs["pos"], obs["info"]], axis=-1)
        x = L.MLP(self.units, "relu", name="mlp")(x)
        out = {
            "logits": L.make_dense(self.actions_num, None, name="logits")(x),
            "value": L.make_dense(1, None, name="value")(x),
            "rnn_states": None,
        }
        if self.with_aux_loss:
            # predict the 'aux_target' key, MSE aux loss
            # (TestNetWithAuxLoss, test_network.py:70-120)
            pred = L.make_dense(1, None, name="aux_head")(x)
            target = obs.get("aux_target", jnp.zeros_like(pred))
            out["aux_losses"] = {
                "aux_dist_loss": jnp.square(pred - target).mean()
            }
        return out


def _build_test_dict_net(net_params, *, actions_num, input_shape, value_size=1,
                         **kw):
    return TestDictObsNet(
        actions_num=actions_num,
        units=tuple(net_params.get("mlp", {}).get("units", (32, 32))),
        with_aux_loss=net_params.get("with_aux_loss", False),
    )


def _build_testnet_aux_loss(net_params, **kw):
    """The reference's 'testnet_aux_loss' custom net name
    (envs/test_network.py TestNetWithAuxLoss + its builder)."""
    return _build_test_dict_net({**net_params, "with_aux_loss": True}, **kw)


register_network("testnet_dict", _build_test_dict_net)
register_network("testnet_aux_loss", _build_testnet_aux_loss)
