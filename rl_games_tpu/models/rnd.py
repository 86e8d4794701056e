"""Random Network Distillation curiosity (a WORKING rnd_curiosity).

The reference registers a ``rnd_curiosity`` network builder
(algos_torch/model_builder.py:23) whose class does not exist in its tree —
instantiating it crashes — yet its config zoo still carries the historical
schema (configs/smac/v1/3m_torch_sparse.yaml:58-78: ``rnd_config`` with
scale_value / mini_epochs / minibatch_size / learning_rate and
``network.mlp.{rnd,net}`` trunks). This module implements that schema for
real: RND (Burda et al. 2018) — a frozen randomly-initialized target MLP
(``mlp.rnd.units``, last entry = embedding size) and a trained predictor
(``mlp.net.units`` hidden layers + a linear head to the embedding); the
per-observation squared prediction error is the intrinsic reward added to
the shaped reward before GAE, and the predictor trains on the rollout's
observations each epoch (algos/ppo.py _update_rnd).

TPU-first: pure functions over param pytrees, everything inside the
compiled epoch (vmap-safe, so --seeds multi-seed covers it too).
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from rl_games_tpu.models import layers as L


class _Predictor(nn.Module):
    """mlp.net trunk + linear head to the target's embedding size."""

    units: Sequence[int]
    emb: int
    activation: str
    initializer: Optional[dict] = None

    @nn.compact
    def __call__(self, x):
        if self.units:
            x = L.build_mlp(tuple(self.units), self.activation,
                            initializer=self.initializer)(x)
        return L.make_dense(self.emb, self.initializer, name="head")(x)


class RNDCuriosity:
    """Target/predictor pair per the historical rnd_config.network schema."""

    def __init__(self, network_cfg: dict):
        mlp = network_cfg["mlp"]
        rnd_units = list(mlp["rnd"]["units"])
        if not rnd_units:
            raise ValueError("rnd_config.network.mlp.rnd.units is empty")
        self.emb = rnd_units[-1]
        self.activation = mlp.get("activation", "elu")
        self.initializer = mlp.get("initializer")
        # target net: hidden layers + the final embedding layer are all
        # rnd.units entries (the historical layout)
        self.target = L.build_mlp(tuple(rnd_units), self.activation,
                                  initializer=self.initializer)
        self.predictor = _Predictor(list(mlp["net"]["units"]), self.emb,
                                    self.activation, self.initializer)

    def init(self, key: jax.Array, example_obs: jnp.ndarray):
        kt, kp = jax.random.split(key)
        target_params = self.target.init(kt, example_obs)
        pred_params = self.predictor.init(kp, example_obs)
        return target_params, pred_params

    def intrinsic(self, target_params, pred_params, obs_n: jnp.ndarray):
        """Per-row squared prediction error [B] (the intrinsic reward and,
        averaged, the predictor's training loss)."""
        t = jax.lax.stop_gradient(self.target.apply(target_params, obs_n))
        p = self.predictor.apply(pred_params, obs_n)
        return jnp.mean((p - t) ** 2, axis=-1)

    def loss(self, pred_params, target_params, obs_n: jnp.ndarray):
        return jnp.mean(self.intrinsic(target_params, pred_params, obs_n))
