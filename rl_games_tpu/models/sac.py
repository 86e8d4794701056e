"""SAC networks: tanh-squashed diagonal-Gaussian actor + twin Q critic.

Re-design of the reference's SACBuilder (network_builder.py:919-1081):
  * DiagGaussianActor (:919-944) — MLP trunk → (mu, log_std) chunks, log_std
    constrained by tanh + linear scaling into log_std_bounds, SquashedNormal
    policy over normalized [-1, 1] actions.
  * DoubleQCritic (:947-969) — two independent MLPs on [obs, action].
Actor and critic are separate linen modules so they carry separate param
trees and optimizers (sac_agent.py:118-130); critic_target is a plain copy
of the critic params Polyak-averaged in the train state.
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rl_games_tpu.models import distributions as D
from rl_games_tpu.models import layers as L


class SACActor(nn.Module):
    """DiagGaussianActor (network_builder.py:919-944)."""

    units: Sequence[int]
    activation: str
    actions_num: int
    log_std_bounds: Tuple[float, float] = (-5.0, 2.0)
    initializer: Optional[dict] = None
    norm_func_name: Optional[str] = None
    d2rl: bool = False

    @nn.compact
    def __call__(self, obs):
        x = L.build_mlp(
            tuple(self.units), self.activation, initializer=self.initializer,
            norm_func_name=self.norm_func_name, d2rl=self.d2rl, name="trunk",
        )(obs)
        out = L.make_dense(2 * self.actions_num, self.initializer, name="head")(x)
        mu, log_std = jnp.split(out, 2, axis=-1)
        lo, hi = self.log_std_bounds
        log_std = jnp.tanh(log_std)
        log_std = lo + 0.5 * (hi - lo) * (log_std + 1.0)
        return mu, jnp.exp(log_std)

    @staticmethod
    def sample(key, mu, std):
        """rsample + tanh squash; returns (action in [-1,1], pre_tanh)."""
        return D.squashed_normal_sample(key, mu, std)

    @staticmethod
    def log_prob(action, mu, std, pre_tanh=None):
        return D.squashed_normal_logp(action, mu, std, pre_tanh)


class SACDoubleCritic(nn.Module):
    """DoubleQCritic (network_builder.py:947-969)."""

    units: Sequence[int]
    activation: str
    initializer: Optional[dict] = None
    norm_func_name: Optional[str] = None
    d2rl: bool = False

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)

        def q_net(name):
            def apply(y):
                y = L.build_mlp(
                    tuple(self.units), self.activation,
                    initializer=self.initializer,
                    norm_func_name=self.norm_func_name, d2rl=self.d2rl,
                    name=name + "_trunk",
                )(y)
                return L.make_dense(1, self.initializer, name=name + "_head")(y)

            return apply

        return q_net("Q1")(x), q_net("Q2")(x)


def build_sac_networks(net_params: dict, actions_num: int):
    """Map the reference SAC YAML network schema to (actor, critic) modules."""
    mlp = net_params["mlp"]
    common = dict(
        units=tuple(mlp["units"]),
        activation=mlp["activation"],
        initializer=mlp.get("initializer"),
        norm_func_name=net_params.get("normalization"),
        d2rl=mlp.get("d2rl", False),
    )
    log_std_bounds = tuple(
        net_params.get("log_std_bounds", (-5.0, 2.0))
    )
    actor = SACActor(
        actions_num=actions_num, log_std_bounds=log_std_bounds, **common
    )
    critic = SACDoubleCritic(**common)
    return actor, critic
