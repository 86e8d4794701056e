"""Config-driven actor-critic torsos (flax linen).

Re-design of the reference's NetworkBuilder/A2CBuilder
(rl_games/algos_torch/network_builder.py:211-590): the same YAML `network:`
schema (separate, mlp{units,activation,initializer,d2rl}, cnn{type,convs,...},
rnn{name,units,layers,before_mlp,concat_input,concat_output,layer_norm},
space{continuous|discrete|multi_discrete}, normalization) produces a linen
module whose __call__ takes flat observations (plus optional rnn state/dones)
and returns head outputs. CNN layout is NHWC (TPU/XLA-native) rather than the
reference's NCHW permute.
"""

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl_games_tpu.models import layers as L


def _freeze(obj):
    """Recursively convert dicts/lists from YAML into hashable tuples."""
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


def _thaw(obj):
    if isinstance(obj, tuple) and all(
        isinstance(i, tuple) and len(i) == 2 and isinstance(i[0], str) for i in obj
    ):
        return {k: _thaw(v) for k, v in obj}
    if isinstance(obj, tuple):
        return [_thaw(v) for v in obj]
    return obj


class A2CNetwork(nn.Module):
    """The actor-critic torso (A2CBuilder.Network, network_builder.py:218-540).

    __call__(obs, rnn_states=None, dones=None, seq_length=1) returns a dict:
      continuous     → {'mu', 'sigma_raw', 'value', 'rnn_states'}
      discrete       → {'logits', 'value', 'rnn_states'}
      multi_discrete → {'logits': tuple, 'value', 'rnn_states'}
      central_value  → {'value', 'rnn_states'}

    'sigma_raw' is the raw sigma-head output after sigma_activation; the model
    wrapper applies apply_sigma_parametrization (models.py:266-286).
    """

    params: Any  # frozen network params (use A2CNetwork.create)
    actions_num: Any  # int | tuple (multi-discrete) | None (central value)
    input_shape: Tuple[int, ...]
    value_size: int = 1

    @staticmethod
    def create(params: dict, actions_num, input_shape, value_size=1):
        an = tuple(actions_num) if isinstance(actions_num, (list, tuple)) else actions_num
        return A2CNetwork(
            params=_freeze(params),
            actions_num=an,
            input_shape=tuple(input_shape),
            value_size=value_size,
        )

    # -- config accessors ---------------------------------------------------
    @property
    def cfg(self) -> dict:
        return _thaw(self.params)

    def _space(self, cfg):
        space = cfg.get("space", {})
        if "continuous" in space:
            return "continuous", space["continuous"]
        if "multi_discrete" in space:
            return "multi_discrete", space["multi_discrete"]
        if "discrete" in space:
            return "discrete", space["discrete"]
        return None, {}

    def is_rnn(self) -> bool:
        return "rnn" in self.cfg

    def is_separate_critic(self) -> bool:
        return bool(self.cfg.get("separate", False))

    def get_default_rnn_state(self, num_seqs: int):
        cfg = self.cfg
        if "rnn" not in cfg:
            return None
        rnn = cfg["rnn"]
        states = L.default_rnn_state(
            rnn["name"], rnn["layers"], num_seqs, rnn["units"]
        )
        if cfg.get("separate", False):
            return states + states  # actor states then critic states
        return states

    # -- forward ------------------------------------------------------------
    @nn.compact
    def __call__(self, obs, rnn_states=None, dones=None, seq_length: int = 1):
        cfg = self.cfg
        space_type, space_cfg = self._space(cfg)
        separate = bool(cfg.get("separate", False))
        # resnet-builder extras: reward / last-action fed into the RNN
        # input (A2CResnetBuilder, network_builder.py:729-732, 786-820)
        extra_rnn_in = None
        if isinstance(obs, dict) and "observation" in obs:
            parts = []
            if cfg.get("require_rewards", False):
                parts.append(
                    jnp.reshape(obs["reward"], (-1, 1)).astype(jnp.float32)
                )
            if cfg.get("require_last_actions", False):
                la = obs["last_action"]
                if self.actions_num is not None and jnp.issubdtype(
                    jnp.asarray(la).dtype, jnp.integer
                ):
                    la = jax.nn.one_hot(la, self.actions_num)
                parts.append(jnp.reshape(la, (la.shape[0], -1)))
            if parts:
                extra_rnn_in = jnp.concatenate(parts, axis=-1)
            obs = obs["observation"]
        mlp_cfg = cfg["mlp"]
        units = list(mlp_cfg["units"])
        normalization = cfg.get("normalization", None)
        has_rnn = "rnn" in cfg
        has_cnn = "cnn" in cfg
        central_value = bool(cfg.get("central_value", False)) or space_type is None

        def build_cnn(name):
            cnn = cfg["cnn"]
            if cnn.get("type") == "impala":
                return L.ImpalaCNN(
                    tuple(cnn["conv_depths"]),
                    use_attention=cnn.get("use_attention", False),
                    use_bn=cnn.get("use_bn", False),
                    use_zero_init=cnn.get("use_zero_init", False),
                    name=name,
                )
            return L.CNN(
                convs=tuple(_freeze(c) for c in cnn["convs"]),
                activation=cnn["activation"],
                initializer=cnn.get("initializer"),
                norm_func_name=normalization,
                ctype=cnn.get("type", "conv2d"),
                name=name,
            )

        def build_mlp(name):
            return L.build_mlp(
                tuple(units),
                mlp_cfg["activation"],
                initializer=mlp_cfg.get("initializer"),
                norm_func_name=normalization,
                d2rl=mlp_cfg.get("d2rl", False),
                norm_only_first_layer=mlp_cfg.get("norm_only_first_layer", False),
                name=name,
                fused=mlp_cfg.get("fused", False),
            )

        rnn_cfg = cfg.get("rnn", {})
        rnn_before_mlp = rnn_cfg.get("before_mlp", False)
        rnn_concat_input = rnn_cfg.get("concat_input", False)
        rnn_concat_output = rnn_cfg.get("concat_output", False)
        rnn_ln = rnn_cfg.get("layer_norm", False)

        def apply_rnn(x_in, cnn_out, states, core_name):
            """x_in: [B, F] flat features; returns ([B, F'], new_states)."""
            if extra_rnn_in is not None:
                x_in = jnp.concatenate([x_in, extra_rnn_in], axis=-1)
            batch = x_in.shape[0]
            num_seqs = batch // seq_length
            core = L.RNNCore(
                rnn_cfg["name"], rnn_cfg["units"], rnn_cfg["layers"],
                name=core_name,
            )
            x_seq = x_in.reshape(num_seqs, seq_length, -1)
            d_seq = (
                dones.reshape(num_seqs, seq_length).astype(x_in.dtype)
                if dones is not None
                else None
            )
            out, new_states = core(x_seq, states, d_seq)
            out = out.reshape(batch, -1)
            if rnn_ln:
                out = nn.LayerNorm(epsilon=1e-5, name=core_name + "_ln")(out)
            if rnn_concat_output:
                out = jnp.concatenate([out, cnn_out], axis=-1)
            return out, new_states

        def trunk(x, prefix, states):
            """CNN → (MLP/RNN wiring per config) → features."""
            cnn_out = x
            if has_cnn:
                cnn_out = build_cnn(prefix + "cnn")(x)
            cnn_out = cnn_out.reshape(cnn_out.shape[0], -1)
            out = cnn_out
            new_states = states
            if has_rnn:
                if not rnn_before_mlp:
                    out = build_mlp(prefix + "mlp")(out)
                    if rnn_concat_input:
                        out = jnp.concatenate([out, cnn_out], axis=-1)
                    out, new_states = apply_rnn(out, cnn_out, states, prefix + "rnn")
                else:
                    out, new_states = apply_rnn(cnn_out, cnn_out, states, prefix + "rnn")
                    out = build_mlp(prefix + "mlp")(out)
            else:
                out = build_mlp(prefix + "mlp")(out)
            return out, new_states

        # -- run trunks
        if separate:
            if has_rnn and rnn_states is not None:
                half = len(rnn_states) // 2
                a_states, c_states = rnn_states[:half], rnn_states[half:]
            else:
                a_states = c_states = None
            a_out, a_states = trunk(obs, "actor_", a_states)
            c_out, c_states = trunk(obs, "critic_", c_states)
            new_rnn_states = (
                tuple(a_states) + tuple(c_states) if has_rnn else None
            )
        else:
            a_out, s = trunk(obs, "actor_", rnn_states)
            c_out = a_out
            new_rnn_states = tuple(s) if has_rnn and s is not None else None

        # -- heads
        # value-head types (network_builder.py:200-208 _build_value_layer):
        # 'legacy'/'default' = linear; 'twohot'/'twohot_encoded' = 255-bin
        # DreamerV3-style two-hot head (common/layers/value.py:26-45):
        # logits -> TwoHotDist mode -> symexp
        value_type = cfg.get("value_head", cfg.get("value_type", "legacy"))
        value_act = L.get_activation(cfg.get("value_activation", "None"))
        if value_type in ("twohot", "twohot_encoded"):
            from rl_games_tpu.models.distributions import (
                TWOHOT_BINS, symexp, twohot_decode,
            )

            assert self.value_size == 1, "twohot value head requires value_size 1"
            value_logits = nn.Dense(
                len(TWOHOT_BINS),
                kernel_init=nn.initializers.variance_scaling(
                    0.05**2, "fan_avg", "uniform"  # xavier gain 0.05
                ),
                name="value",
            )(c_out)
            value = symexp(twohot_decode(value_logits, TWOHOT_BINS))[..., None]
            out = {
                "value": value,
                "value_logits": value_logits,
                "rnn_states": new_rnn_states,
            }
            if central_value:
                return out
        else:
            value = value_act(
                L.make_dense(
                    self.value_size, mlp_cfg.get("initializer"), name="value"
                )(c_out)
            )
            out = {"value": value, "rnn_states": new_rnn_states}

        if central_value:
            return out

        if space_type == "discrete":
            out["logits"] = L.make_dense(
                self.actions_num, mlp_cfg.get("initializer")
            )(a_out)
            return out

        if space_type == "multi_discrete":
            out["logits"] = tuple(
                L.make_dense(n, mlp_cfg.get("initializer"), name=f"logits_{i}")(a_out)
                for i, n in enumerate(self.actions_num)
            )
            return out

        # continuous
        mu_act = L.get_activation(space_cfg.get("mu_activation", "None"))
        sigma_act = L.get_activation(space_cfg.get("sigma_activation", "None"))
        mu = mu_act(
            L.make_dense(self.actions_num, space_cfg.get("mu_init"), name="mu")(a_out)
        )
        if space_cfg.get("fixed_sigma", True):
            sigma_init = space_cfg.get("sigma_init", {})
            val = float(sigma_init.get("val", sigma_init.get("value", 0.0)))
            sigma_param = self.param(
                "sigma",
                jax.nn.initializers.constant(val),
                (self.actions_num,),
                jnp.float32,
            )
            sigma_raw = sigma_act(sigma_param) + mu * 0.0
        else:
            # state-dependent sigma head: const init writes the BIAS with
            # zero weights (network_builder.py:14-26)
            sigma_init = space_cfg.get("sigma_init", {})
            if sigma_init.get("name") == "const_initializer":
                val = float(sigma_init.get("val", sigma_init.get("value", 0.0)))
                sigma_dense = nn.Dense(
                    self.actions_num,
                    kernel_init=jax.nn.initializers.zeros,
                    bias_init=jax.nn.initializers.constant(val),
                    name="sigma",
                )
            else:
                sigma_dense = nn.Dense(
                    self.actions_num,
                    kernel_init=L.get_initializer(sigma_init),
                    bias_init=jax.nn.initializers.zeros,
                    name="sigma",
                )
            sigma_raw = sigma_act(sigma_dense(a_out))
        out["mu"] = mu
        out["sigma_raw"] = sigma_raw
        return out
