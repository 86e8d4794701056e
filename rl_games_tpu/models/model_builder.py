"""Model/network registries and builder.

Mirrors rl_games/algos_torch/model_builder.py: two user-extensible name→class
registries (register_network / register_model, :9-13) and
``ModelBuilder.load(params)`` (:56-60) which builds the network torso from
``params['network']`` and wraps it with the model named by
``params['model']['name']``.
"""

from typing import Any, Callable, Dict

from rl_games_tpu.models import models
from rl_games_tpu.models.network_builder import A2CNetwork

NETWORK_REGISTRY: Dict[str, Callable] = {}
MODEL_REGISTRY: Dict[str, Callable] = {}


def register_network(name: str, builder: Callable):
    NETWORK_REGISTRY[name] = builder


def register_model(name: str, builder: Callable):
    MODEL_REGISTRY[name] = builder


def _build_a2c_network(net_params, *, actions_num, input_shape, value_size=1, **kw):
    return A2CNetwork.create(net_params, actions_num, input_shape, value_size)


def _build_resnet_network(net_params, *, actions_num, input_shape, value_size=1, **kw):
    """Impala torso ('resnet_actor_critic', network_builder.py:691-916) —
    expressed through the same A2CNetwork with cnn.type='impala'."""
    p = dict(net_params)
    cnn = dict(p.get("cnn", {}))
    cnn["type"] = "impala"
    p["cnn"] = cnn
    return A2CNetwork.create(p, actions_num, input_shape, value_size)


def _build_rnd_curiosity(net_params, **kw):
    """'rnd_curiosity' (model_builder.py:23): the reference registers this
    name against a class absent from its tree (instantiating it crashes).
    RND is not a policy torso in either framework — it is consumed through
    ``rnd_config`` (models/rnd.py, algos/ppo.py) — so selecting it as
    ``network.name`` gets a clear error instead of an interface crash."""
    raise ValueError(
        "'rnd_curiosity' is not a policy network: configure RND through "
        "config.rnd_config (whose network block models/rnd.RNDCuriosity "
        "consumes); see docs/CONFIG_PARAMETERS.md"
    )


register_network("actor_critic", _build_a2c_network)
register_network("resnet_actor_critic", _build_resnet_network)
register_network("rnd_curiosity", _build_rnd_curiosity)


def _model_factory(model_cls, needs_space=False):
    def build(network_params, *, actions_num, input_shape, value_size=1,
              normalize_input=False, normalize_value=False, obs_shape=None):
        net_builder = NETWORK_REGISTRY[network_params["name"]]
        network = net_builder(
            network_params,
            actions_num=actions_num,
            input_shape=input_shape,
            value_size=value_size,
        )
        kw = dict(
            normalize_input=normalize_input,
            normalize_value=normalize_value,
            value_size=value_size,
            obs_shape=obs_shape,
        )
        if needs_space:
            space = network_params.get("space", {})
            kw["space_cfg"] = space.get("continuous", {})
        return model_cls(network, **kw)

    return build


MODEL_REGISTRY.update(
    {
        "discrete_a2c": _model_factory(models.ModelA2C),
        "multi_discrete_a2c": _model_factory(models.ModelA2CMultiDiscrete),
        "continuous_a2c": _model_factory(models.ModelA2CContinuous),
        "continuous_a2c_logstd": _model_factory(
            models.ModelA2CContinuousLogStd, needs_space=True
        ),
        "continuous_a2c_tanh": _model_factory(
            models.ModelA2CContinuousTanh, needs_space=True
        ),
        "central_value": _model_factory(models.ModelCentralValue),
    }
)


class ModelBuilder:
    """model_builder.py:53-60."""

    def load(self, params: dict, **build_kwargs):
        model_name = params["model"]["name"]
        network_params = dict(params["network"])
        return MODEL_REGISTRY[model_name](network_params, **build_kwargs)
