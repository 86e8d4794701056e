from rl_games_tpu.ops.gae import compute_gae, gae_scan, gae_associative, gae_pallas
from rl_games_tpu.ops.running_stats import (
    RunningMeanStdState,
    rms_init,
    rms_update,
    rms_normalize,
    rms_denormalize,
    rms_update_from_batch,
)
from rl_games_tpu.ops import losses, masked, schedulers, divergence
