from rl_games_tpu.models import distributions, layers, models
from rl_games_tpu.models.network_builder import A2CNetwork
from rl_games_tpu.models.model_builder import (
    ModelBuilder,
    register_model,
    register_network,
    MODEL_REGISTRY,
    NETWORK_REGISTRY,
)
