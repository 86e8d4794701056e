"""Model wrappers: distribution heads + normalizers over the network torso.

Functional re-design of rl_games/algos_torch/models.py. A Model is a static
(Python-side) object bundling an A2CNetwork linen module with the
normalization/config surface; all methods are pure functions over
(params, norm_state, inputs), so they trace cleanly under jit/scan.

Train-mode forward returns the reference's train dict
({'prev_neglogp','values','entropy','mus','sigmas'|'logits','rnn_states'},
models.py:95-125,313-343); play-mode returns sampled actions, neglogpacs and
denormalized values. Normalizer *statistics updates* are explicit
(`update_norm_stats`) rather than a training-mode side effect, because state
must flow functionally through the jitted epoch.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from rl_games_tpu.models import distributions as D
from rl_games_tpu.models.network_builder import A2CNetwork
from rl_games_tpu.ops import divergence
from rl_games_tpu.ops.running_stats import (
    rms_init,
    rms_init_obs,
    rms_normalize,
    rms_normalize_obs,
    rms_denormalize,
    rms_update_from_batch,
    rms_update_obs,
)


@struct.dataclass
class NormState:
    """Input/value normalizer states (BaseModelNetwork, models.py:16-63)."""

    obs: Any = None  # RunningMeanStdState | {key: RunningMeanStdState} | None
    value: Any = None  # RunningMeanStdState | None


def init_norm_state(obs_shape, value_size, normalize_input, normalize_value):
    obs_norm = None
    if normalize_input:
        if isinstance(obs_shape, dict):
            obs_norm = rms_init_obs(obs_shape)
        else:
            obs_norm = rms_init(obs_shape)
    value_norm = rms_init((value_size,)) if normalize_value else None
    return NormState(obs=obs_norm, value=value_norm)


def norm_obs(norm: NormState, obs):
    """models.py:54-56."""
    if norm.obs is None:
        return obs
    if isinstance(obs, dict):
        return rms_normalize_obs(norm.obs, obs)
    return rms_normalize(norm.obs, obs)


def denorm_value(norm: NormState, value):
    """models.py:58-60."""
    if norm.value is None:
        return value
    return rms_denormalize(norm.value, value)


def update_obs_stats(norm: NormState, obs, mask=None) -> NormState:
    if norm.obs is None:
        return norm
    if isinstance(obs, dict):
        new = rms_update_obs(norm.obs, obs, mask)
    else:
        new = rms_update_from_batch(norm.obs, obs, mask)
    return norm.replace(obs=new)


def update_value_stats(norm: NormState, returns, mask=None) -> NormState:
    if norm.value is None:
        return norm
    return norm.replace(value=rms_update_from_batch(norm.value, returns, mask))


def normalize_values(norm: NormState, x):
    if norm.value is None:
        return x
    return rms_normalize(norm.value, x)


def passthrough_extras(out, result):
    """Forward optional network outputs to the loss assembly: custom-net
    aux losses (a2c_continuous.py:194-202) and the twohot value head's
    logits (common/layers/value.py:33-38 trains on them)."""
    for k in ("aux_losses", "value_logits"):
        if k in out:
            result[k] = out[k]
    return result


class BaseModel:
    """Static model bundle. Subclasses implement forward_train/forward_play."""

    is_continuous = False
    is_discrete = False
    is_multi_discrete = False

    def __init__(
        self,
        network: A2CNetwork,
        *,
        normalize_input: bool = False,
        normalize_value: bool = False,
        value_size: int = 1,
        obs_shape=None,
    ):
        self.network = network
        self.normalize_input = normalize_input
        self.normalize_value = normalize_value
        self.value_size = value_size
        self.obs_shape = obs_shape if obs_shape is not None else network.input_shape

    # -- state construction --------------------------------------------------
    def init(self, key, example_obs, rnn_states=None):
        params = self.network.init(key, example_obs, rnn_states=rnn_states)
        norm = init_norm_state(
            self.obs_shape, self.value_size, self.normalize_input, self.normalize_value
        )
        return params, norm

    def is_rnn(self):
        return self.network.is_rnn()

    def get_default_rnn_state(self, num_seqs):
        return self.network.get_default_rnn_state(num_seqs)

    def apply_network(self, params, norm, obs, rnn_states=None, dones=None, seq_length=1):
        obs_n = norm_obs(norm, obs)
        return self.network.apply(
            params, obs_n, rnn_states=rnn_states, dones=dones, seq_length=seq_length
        )


class ModelA2CContinuousLogStd(BaseModel):
    """'continuous_a2c_logstd' (models.py:289-348): raw sigma head is the
    log-std; apply_sigma_parametrization maps it to (sigma, logstd)."""

    is_continuous = True

    def __init__(self, network, *, space_cfg=None, **kw):
        super().__init__(network, **kw)
        sc = space_cfg or {}
        self.min_sigma = float(sc.get("min_sigma", 0.0))
        self.logstd_bounds = sc.get("logstd_bounds", None)
        self.sigma_parametrization = sc.get("sigma_parametrization", "exp")

    def _dist_params(self, net_out):
        sigma, logstd = D.apply_sigma_parametrization(
            net_out["sigma_raw"],
            parametrization=self.sigma_parametrization,
            min_sigma=self.min_sigma,
            logstd_bounds=self.logstd_bounds,
        )
        return net_out["mu"], sigma, logstd

    def forward_train(
        self, params, norm, obs, prev_actions, rnn_states=None, dones=None, seq_length=1
    ):
        out = self.apply_network(params, norm, obs, rnn_states, dones, seq_length)
        mu, sigma, logstd = self._dist_params(out)
        result = {
            "prev_neglogp": D.normal_neglogp(prev_actions, mu, sigma, logstd),
            "values": out["value"],
            "entropy": D.normal_entropy(logstd),
            "rnn_states": out["rnn_states"],
            "mus": mu,
            "sigmas": sigma,
        }
        return passthrough_extras(out, result)

    def forward_play(
        self, params, norm, key, obs, rnn_states=None, dones=None, seq_length=1,
        deterministic: bool = False,
    ):
        out = self.apply_network(params, norm, obs, rnn_states, dones, seq_length)
        mu, sigma, logstd = self._dist_params(out)
        if deterministic:
            actions = mu
        else:
            actions = D.normal_sample(key, mu, sigma)
        return {
            "neglogpacs": D.normal_neglogp(actions, mu, sigma, logstd),
            "values": denorm_value(norm, out["value"]),
            "actions": actions,
            "rnn_states": out["rnn_states"],
            "mus": mu,
            "sigmas": sigma,
        }

    @staticmethod
    def kl(mu0, sigma0, mu1, sigma1):
        """Analytic Gaussian KL for adaptive LR (a2c_continuous.py:214-218)."""
        return divergence.d_kl_normal((mu0, sigma0), (mu1, sigma1))


class ModelA2CContinuous(BaseModel):
    """'continuous_a2c' (models.py:203-263): sigma head output IS the std
    (after sigma_activation, e.g. softplus)."""

    is_continuous = True

    def _dist_params(self, net_out):
        sigma = net_out["sigma_raw"]
        return net_out["mu"], sigma, jnp.log(sigma)

    forward_train = ModelA2CContinuousLogStd.forward_train
    forward_play = ModelA2CContinuousLogStd.forward_play
    kl = staticmethod(ModelA2CContinuousLogStd.kl)


class ModelA2CContinuousTanh(BaseModel):
    """'continuous_a2c_tanh' (models.py:351-407): Brax-style NormalTanh
    policy — softplus-scaled std, tanh bijector with log-det-corrected
    log-probs, sampled entropy."""

    is_continuous = True
    sampled_entropy = True  # forward_train wants a fresh entropy_key

    def __init__(self, network, *, space_cfg=None, **kw):
        super().__init__(network, **kw)
        sc = space_cfg or {}
        self.min_std = float(sc.get("min_std", 0.001))

    def _dist(self, net_out):
        return D.NormalTanhDistribution(
            net_out["mu"], net_out["sigma_raw"], min_std=self.min_std
        )

    def forward_train(
        self, params, norm, obs, prev_actions, rnn_states=None, dones=None,
        seq_length=1, entropy_key=None,
    ):
        out = self.apply_network(params, norm, obs, rnn_states, dones, seq_length)
        dist = self._dist(out)
        if entropy_key is None:
            # a silent PRNGKey(0) fallback would freeze the entropy noise
            # across every minibatch — the exact bug the trainer threads
            # fresh per-minibatch keys to avoid
            raise ValueError(
                "ModelA2CContinuousTanh.forward_train needs entropy_key "
                "(fresh per minibatch); the sampled-entropy estimate is "
                "biased under a constant key"
            )
        return passthrough_extras(out, {
            "prev_neglogp": -dist.log_prob(prev_actions),
            "values": out["value"],
            "entropy": dist.entropy(entropy_key),
            "rnn_states": out["rnn_states"],
            "mus": dist.loc,
            "sigmas": dist.scale,
        })

    def forward_play(
        self, params, norm, key, obs, rnn_states=None, dones=None,
        seq_length=1, deterministic: bool = False,
    ):
        out = self.apply_network(params, norm, obs, rnn_states, dones, seq_length)
        dist = self._dist(out)
        if deterministic:
            actions = dist.mode()
            pre = dist.loc
        else:
            actions, pre = dist.sample(key)
        return {
            "neglogpacs": -dist.log_prob(actions, pre_tanh=pre),
            "values": denorm_value(norm, out["value"]),
            "actions": actions,
            "rnn_states": out["rnn_states"],
            "mus": dist.loc,
            "sigmas": dist.scale,
        }

    @staticmethod
    def kl(mu0, sigma0, mu1, sigma1):
        # pre-tanh Gaussian KL — the tanh bijector cancels in the KL
        return divergence.d_kl_normal((mu0, sigma0), (mu1, sigma1))


class ModelA2C(BaseModel):
    """'discrete_a2c' (models.py:66-125) with CategoricalMasked support."""

    is_discrete = True

    def forward_train(
        self, params, norm, obs, prev_actions, rnn_states=None, dones=None,
        seq_length=1, action_masks=None,
    ):
        out = self.apply_network(params, norm, obs, rnn_states, dones, seq_length)
        logits = out["logits"]
        result = {
            "prev_neglogp": D.categorical_neglogp(logits, prev_actions, action_masks),
            "values": out["value"],
            "entropy": D.categorical_entropy(logits, action_masks),
            "rnn_states": out["rnn_states"],
            "logits": D.categorical_log_probs(logits, action_masks),
        }
        return passthrough_extras(out, result)

    def forward_play(
        self, params, norm, key, obs, rnn_states=None, dones=None, seq_length=1,
        action_masks=None, deterministic: bool = False,
    ):
        out = self.apply_network(params, norm, obs, rnn_states, dones, seq_length)
        logits = out["logits"]
        if deterministic:
            actions = jnp.argmax(D.masked_logits(logits, action_masks), axis=-1)
        else:
            actions = D.categorical_sample(key, logits, action_masks)
        return {
            "neglogpacs": D.categorical_neglogp(logits, actions, action_masks),
            "values": denorm_value(norm, out["value"]),
            "actions": actions,
            "rnn_states": out["rnn_states"],
            "logits": D.categorical_log_probs(logits, action_masks),
        }

    @staticmethod
    def kl(old_logp, new_logp):
        """models.py:90-93 — categorical KL from log-probs."""
        return divergence.d_kl_discrete(old_logp, new_logp)



def _split_masks(action_masks, n_heads):
    """Per-head mask tuple from None / a tuple / a stacked [B, heads, n]
    array (host envs return one ndarray; `or`-truthiness on arrays raises,
    and indexing a stacked array by head needs axis 1, not 0)."""
    if action_masks is None:
        return (None,) * n_heads
    if isinstance(action_masks, (tuple, list)):
        return tuple(action_masks)
    if action_masks.ndim >= 3 and action_masks.shape[-2] == n_heads:
        return tuple(action_masks[..., i, :] for i in range(n_heads))
    return (action_masks,) * n_heads if n_heads == 1 else tuple(
        action_masks[i] for i in range(n_heads)
    )


class ModelA2CMultiDiscrete(BaseModel):
    """'multi_discrete_a2c' (models.py:128-200): per-head logp summed."""

    is_multi_discrete = True

    def forward_train(
        self, params, norm, obs, prev_actions, rnn_states=None, dones=None,
        seq_length=1, action_masks=None,
    ):
        out = self.apply_network(params, norm, obs, rnn_states, dones, seq_length)
        logits_list = out["logits"]
        masks = _split_masks(action_masks, len(logits_list))
        neglogp = sum(
            D.categorical_neglogp(l, prev_actions[..., i], masks[i])
            for i, l in enumerate(logits_list)
        )
        entropy = sum(
            D.categorical_entropy(l, masks[i]) for i, l in enumerate(logits_list)
        )
        return passthrough_extras(out, {
            "prev_neglogp": neglogp,
            "values": out["value"],
            "entropy": entropy,
            "rnn_states": out["rnn_states"],
            "logits": tuple(
                D.categorical_log_probs(l, masks[i])
                for i, l in enumerate(logits_list)
            ),
        })

    def forward_play(
        self, params, norm, key, obs, rnn_states=None, dones=None, seq_length=1,
        action_masks=None, deterministic: bool = False,
    ):
        out = self.apply_network(params, norm, obs, rnn_states, dones, seq_length)
        logits_list = out["logits"]
        masks = _split_masks(action_masks, len(logits_list))
        keys = jax.random.split(key, len(logits_list))
        actions = []
        neglogp = 0.0
        for i, l in enumerate(logits_list):
            if deterministic:
                a = jnp.argmax(D.masked_logits(l, masks[i]), axis=-1)
            else:
                a = D.categorical_sample(keys[i], l, masks[i])
            neglogp = neglogp + D.categorical_neglogp(l, a, masks[i])
            actions.append(a)
        return {
            "neglogpacs": neglogp,
            "values": denorm_value(norm, out["value"]),
            "actions": jnp.stack(actions, axis=-1),
            "rnn_states": out["rnn_states"],
            "logits": tuple(
                D.categorical_log_probs(l, masks[i])
                for i, l in enumerate(logits_list)
            ),
        }

    @staticmethod
    def kl(old_logp_list, new_logp_list):
        return divergence.d_kl_discrete_list(old_logp_list, new_logp_list)


class ModelCentralValue(BaseModel):
    """'central_value' (models.py:409-448): value-only forward."""

    def forward_train(
        self, params, norm, obs, rnn_states=None, dones=None, seq_length=1
    ):
        out = self.apply_network(params, norm, obs, rnn_states, dones, seq_length)
        return passthrough_extras(
            out, {"values": out["value"], "rnn_states": out["rnn_states"]}
        )

    def forward_play(
        self, params, norm, key, obs, rnn_states=None, dones=None, seq_length=1
    ):
        out = self.apply_network(params, norm, obs, rnn_states, dones, seq_length)
        return {
            "values": denorm_value(norm, out["value"]),
            "rnn_states": out["rnn_states"],
        }
