"""Connect-four residual-tower network ('connect4net').

The reference's ma/ppo_connect4_self_play_resnet.yaml selects a custom
``connect4net`` (``blocks: N``) whose module lived outside the reference
tree (historic rl_games/envs/connect4_network.py — an AlphaZero-style
conv tower with separate policy/value heads). Re-designed here as a linen
module: 3x3 conv stem → N pre-activation residual blocks → 1x1-conv policy
and value heads. GroupNorm replaces the torch BatchNorm (functional,
batch-size independent — the idiomatic choice under jit; the tower depth,
head shapes and ``blocks`` config knob carry the parity).

Registered like any plugin net (import_modules in the YAML, the
torch_runner.py:152-155 mechanism).
"""

from flax import linen as nn
import jax.numpy as jnp

from rl_games_tpu.models.model_builder import register_network


class Connect4Net(nn.Module):
    actions_num: int
    blocks: int = 5
    channels: int = 128
    value_size: int = 1

    def is_rnn(self):
        return False

    def get_default_rnn_state(self, num_seqs):
        return None

    @nn.compact
    def __call__(self, obs, rnn_states=None, dones=None, seq_length=1):
        x = obs  # [B, 6, 7, 2] board planes, NHWC
        x = nn.Conv(self.channels, (3, 3), padding="SAME", name="stem")(x)
        for b in range(self.blocks):
            y = nn.GroupNorm(num_groups=8, name=f"n{b}a")(x)
            y = nn.relu(y)
            y = nn.Conv(
                self.channels, (3, 3), padding="SAME", name=f"c{b}a"
            )(y)
            y = nn.GroupNorm(num_groups=8, name=f"n{b}b")(y)
            y = nn.relu(y)
            y = nn.Conv(
                self.channels, (3, 3), padding="SAME", name=f"c{b}b"
            )(y)
            x = x + y
        x = nn.relu(x)
        p = nn.Conv(2, (1, 1), name="policy_conv")(x)
        p = p.reshape((p.shape[0], -1))
        logits = nn.Dense(self.actions_num, name="policy")(p)
        v = nn.Conv(1, (1, 1), name="value_conv")(x)
        v = v.reshape((v.shape[0], -1))
        v = nn.relu(nn.Dense(self.channels, name="value_hidden")(v))
        value = nn.Dense(self.value_size, name="value")(v)
        return {"logits": logits, "value": value, "rnn_states": None}


def _build_connect4net(net_params, *, actions_num, input_shape, value_size=1,
                       **kw):
    return Connect4Net(
        actions_num=actions_num,
        blocks=int(net_params.get("blocks", 5)),
        channels=int(net_params.get("channels", 128)),
        value_size=value_size,
    )


register_network("connect4net", _build_connect4net)
